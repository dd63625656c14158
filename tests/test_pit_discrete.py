"""PIT multi-speaker ASR + discrete-unit ASR (pit_espnet_model.py /
discrete_asr_espnet_model.py analogs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_guided_asr_tpu.models.asr_model import ASRModelConfig
from llm_guided_asr_tpu.models.conformer import ConformerConfig
from llm_guided_asr_tpu.models.transformer_decoder import TransformerDecoderConfig
from llm_guided_asr_tpu.ops.frontend import FrontendConfig


def _tiny_asr_cfg(vocab=8):
    return ASRModelConfig(
        vocab_size=vocab,
        frontend=FrontendConfig(n_fft=256, hop_length=128, n_mels=20),
        normalize="utterance_mvn",
        encoder_type="transformer",
        encoder=ConformerConfig(
            output_size=16, attention_heads=2, linear_units=24, num_blocks=1,
            input_layer="conv2d", use_cnn_module=False,
        ),
        decoder=TransformerDecoderConfig(
            attention_heads=2, linear_units=24, num_blocks=1
        ),
        ctc_weight=0.3,
    )


def test_pit_permutation_invariance():
    """Swapping the reference order must not change the PIT loss
    (PITLossWrapper minimizes over permutations)."""
    from llm_guided_asr_tpu.models.pit_asr import PITASRConfig, PITASRModel

    model = PITASRModel(PITASRConfig(asr=_tiny_asr_cfg(), num_ref=2))
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32)
    slens = jnp.asarray([4000, 3600])
    ta = jnp.asarray([[1, 2, 3], [2, 3, -1]], jnp.int32)
    tla = jnp.asarray([3, 2])
    tb = jnp.asarray([[4, 5, -1], [5, 6, 1]], jnp.int32)
    tlb = jnp.asarray([2, 3])
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        speech, slens, ta, tla, text_spk2=tb, text_spk2_lengths=tlb,
    )
    loss1, stats1, w1 = model.apply(
        variables, speech, slens, ta, tla, text_spk2=tb, text_spk2_lengths=tlb
    )
    loss2, stats2, _ = model.apply(
        variables, speech, slens, tb, tlb, text_spk2=ta, text_spk2_lengths=tla
    )
    assert np.isfinite(float(loss1))
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    assert float(w1) == 2.0


def test_pit_trains_and_decodes_per_speaker():
    from llm_guided_asr_tpu.models.pit_asr import PITASRConfig, PITASRModel

    model = PITASRModel(PITASRConfig(asr=_tiny_asr_cfg(), num_ref=2))
    rng = np.random.default_rng(1)
    speech = jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32)
    slens = jnp.asarray([4000, 4000])
    ta = jnp.asarray([[1, 2, 3], [2, 3, -1]], jnp.int32)
    tla = jnp.asarray([3, 2])
    tb = jnp.asarray([[4, 5, -1], [5, 6, 1]], jnp.int32)
    tlb = jnp.asarray([2, 3])
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        speech, slens, ta, tla, text_spk2=tb, text_spk2_lengths=tlb,
    )

    import optax

    tx = optax.adam(1e-3)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            loss, _, _ = model.apply(
                {"params": p}, speech, slens, ta, tla,
                text_spk2=tb, text_spk2_lengths=tlb,
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    l0 = None
    for i in range(5):
        params, opt, loss = step(params, opt)
        if l0 is None:
            l0 = float(loss)
    assert float(loss) < l0

    # per-speaker encode streams feed the standard beam-search interface
    enc0, lens0 = model.apply({"params": params}, speech, slens, spk=0,
                              method=model.encode)
    enc1, _ = model.apply({"params": params}, speech, slens, spk=1,
                          method=model.encode)
    assert enc0.shape == enc1.shape and enc0.shape[0] == 2
    assert not np.allclose(np.asarray(enc0), np.asarray(enc1))


def test_discrete_asr_forward_and_overfit():
    from llm_guided_asr_tpu.models.discrete_asr import (
        DiscreteASRConfig,
        DiscreteASRModel,
    )

    cfg = DiscreteASRConfig(
        vocab_size=8, src_vocab_size=16, adim=16, heads=2, units=24, elayers=1,
        patch_size=2,
        decoder=TransformerDecoderConfig(attention_heads=2, linear_units=24,
                                         num_blocks=1),
        ctc_weight=0.3,
    )
    model = DiscreteASRModel(cfg)
    units = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8], [2, 4, 6, 8, 1, 3, 0, 0]],
                        jnp.int32)
    ulens = jnp.asarray([8, 6])
    text = jnp.asarray([[1, 2, 3], [4, 5, -1]], jnp.int32)
    tlens = jnp.asarray([3, 2])
    variables = model.init({"params": jax.random.PRNGKey(0)}, units, ulens,
                           text, tlens)
    loss, stats, w = model.apply(variables, units, ulens, text, tlens)
    assert np.isfinite(float(loss)) and float(w) == 2.0
    # patch_size=2 halves the encoder length
    enc, enc_lens = model.apply(variables, units, ulens, method=model.encode)
    assert enc.shape[1] == 4
    np.testing.assert_array_equal(np.asarray(enc_lens), [4, 3])

    import optax

    tx = optax.adam(3e-3)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            loss, _, _ = model.apply({"params": p}, units, ulens, text, tlens)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    l0 = None
    for i in range(8):
        params, opt, loss = step(params, opt)
        if l0 is None:
            l0 = float(loss)
    assert float(loss) < l0


def test_pit_discrete_train_from_yaml(tmp_path):
    """Both tasks train one epoch from YAML via the generic task CLI."""
    import wave

    import yaml

    from llm_guided_asr_tpu.tasks.generic import GenericTask

    rng = np.random.default_rng(3)
    tokens = tmp_path / "tokens.txt"
    tokens.write_text("\n".join(["<blank>", "<unk>", "a", "b", "<sos/eos>"]) + "\n")
    for split in ("train", "valid"):
        d = tmp_path / split
        d.mkdir()
        n = 4 if split == "train" else 2
        with open(d / "wav.scp", "w") as fw, open(d / "text", "w") as ft, \
                open(d / "text_spk2", "w") as ft2, open(d / "units", "w") as fu:
            for i in range(n):
                u = f"utt{i}"
                p = d / f"{u}.wav"
                x = (rng.standard_normal(3200) * 3000).astype(np.int16)
                with wave.open(str(p), "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(16000)
                    w.writeframes(x.tobytes())
                fw.write(f"{u} {p}\n")
                ft.write(f"{u} ab\n")
                ft2.write(f"{u} ba\n")
                fu.write(f"{u} " + " ".join(
                    str(v) for v in rng.integers(0, 16, 8)) + "\n")

    common = {
        "token_list": str(tokens),
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 20},
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 24, "num_blocks": 1,
                         "use_cnn_module": False},
        "decoder_conf": {"attention_heads": 2, "linear_units": 24,
                         "num_blocks": 1},
        "optim": "adam", "optim_conf": {"lr": 0.001}, "scheduler": "none",
        "batch_type": "unsorted", "batch_size": 4, "max_epoch": 1,
        "keep_nbest_models": 1, "log_interval": 50,
        "speech_pad_multiple": 4000, "text_pad_multiple": 4,
    }
    for task, streams in [
        ("pit_asr", lambda d: [
            [str(d / "wav.scp"), "speech", "sound"],
            [str(d / "text"), "text", "text"],
            [str(d / "text_spk2"), "text_spk2", "text"],
        ]),
        ("discrete_asr", lambda d: [
            [str(d / "units"), "speech", "text_int"],
            [str(d / "text"), "text", "text"],
        ]),
    ]:
        exp = tmp_path / f"exp_{task}"
        config = dict(
            common,
            task=task,
            model_conf={"num_ref": 2} if task == "pit_asr"
            else {"src_vocab_size": 16, "adim": 16, "heads": 2, "units": 24,
                  "elayers": 1},
            train_data_path_and_name_and_type=streams(tmp_path / "train"),
            valid_data_path_and_name_and_type=streams(tmp_path / "valid"),
            output_dir=str(exp),
        )
        cfg_file = tmp_path / f"{task}.yaml"
        cfg_file.write_text(yaml.safe_dump(config))
        GenericTask.main(["--config", str(cfg_file)])
        assert (exp / "config.yaml").exists()
