"""Streaming encoder causality, E-Branchformer, MaskCTC."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_guided_asr_tpu.models.asr_model import ASRModelConfig
from llm_guided_asr_tpu.models.conformer import ConformerConfig, make_encoder
from llm_guided_asr_tpu.models.maskctc import MaskCTCModel, maskctc_decode
from llm_guided_asr_tpu.models.transformer_decoder import TransformerDecoderConfig
from llm_guided_asr_tpu.ops.frontend import FrontendConfig


def enc_cfg(**kw):
    base = dict(
        output_size=16, attention_heads=2, linear_units=24, num_blocks=2,
        input_layer="linear", use_cnn_module=False, dropout_rate=0.0,
        positional_dropout_rate=0.0, pos_enc_layer_type="abs_pos",
        selfattention_layer_type="selfattn",
    )
    base.update(kw)
    return ConformerConfig(**base)


def run_encoder(enc_type, cfg, feats, lens, **mkw):
    model = make_encoder(enc_type, cfg, name="enc", **mkw)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats, lens, deterministic=True,
    )
    return model.apply(variables, feats, lens, deterministic=True)


def test_contextual_block_is_block_causal():
    """Changing future blocks must not change earlier block outputs."""
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((1, 80, 20)), jnp.float32)
    lens = jnp.asarray([80])
    cfg = enc_cfg()
    from llm_guided_asr_tpu.models.streaming import ContextualBlockConformerEncoder

    model = ContextualBlockConformerEncoder(cfg, block_size=20, name="enc")
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats, lens, deterministic=True,
    )
    out1, _ = model.apply(variables, feats, lens, deterministic=True)
    # perturb the last block (frames 60-80)
    feats2 = feats.at[:, 60:].set(feats[:, 60:] + 5.0)
    out2, _ = model.apply(variables, feats2, lens, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out1)[:, :60], np.asarray(out2)[:, :60], atol=1e-5
    )
    assert not np.allclose(np.asarray(out1)[:, 60:], np.asarray(out2)[:, 60:])


@pytest.mark.parametrize("enc_type", ["e_branchformer", "branchformer"])
def test_branchformer_encoders_forward(enc_type):
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((2, 30, 20)), jnp.float32)
    lens = jnp.asarray([30, 17])
    cfg = enc_cfg(
        pos_enc_layer_type="rel_pos", selfattention_layer_type="rel_selfattn",
        cnn_module_kernel=7, linear_units=32,
    )
    out, out_lens = run_encoder(enc_type, cfg, feats, lens)
    assert out.shape == (2, 30, 16)
    o = np.asarray(out)
    assert np.all(np.isfinite(o))
    assert np.all(o[1, 17:] == 0.0)


def test_maskctc_forward_and_decode():
    cfg = ASRModelConfig(
        vocab_size=10,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=20),
        normalize="utterance_mvn",
        encoder=enc_cfg(input_layer="conv2d"),
        decoder=TransformerDecoderConfig(attention_heads=2, linear_units=24,
                                         num_blocks=1, dropout_rate=0.0),
        ctc_weight=0.3,
    )
    model = MaskCTCModel(cfg)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((2, 1600)), jnp.float32)
    slens = jnp.asarray([1600, 900])
    text = jnp.asarray([[1, 2, 3], [4, 5, -1]], jnp.int32)
    tlens = jnp.asarray([3, 2])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "mlm": jax.random.PRNGKey(2)},
        speech, slens, text, tlens, deterministic=True,
    )
    loss, stats, _ = model.apply(
        variables, speech, slens, text, tlens, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(3), "mlm": jax.random.PRNGKey(4)},
    )
    assert np.isfinite(float(loss))
    assert "loss_mlm" in stats and "loss_ctc" in stats

    enc, enc_lens = model.apply(variables, speech[:1], slens[:1], method=model.encode)
    tokens, n = maskctc_decode(model, variables, enc, enc_lens, threshold=0.9)
    ids = np.asarray(tokens)[0, : int(n[0])]
    assert np.all(ids < cfg.vocab_size)  # no <mask> left


def test_streaming_speech2text_partial_then_final(tmp_path):
    """Simulated streaming yields partials and a final equal to offline decode."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    # train a tiny model quickly via the existing e2e fixture machinery
    import yaml
    from test_e2e_tiny import TOKEN_LIST, make_corpus

    from llm_guided_asr_tpu.tasks.asr import ASRTask

    root = tmp_path / "c"
    make_corpus(root, n_train=8, n_valid=2)
    (root / "tokens.txt").write_text("\n".join(TOKEN_LIST) + "\n")
    exp = tmp_path / "exp"
    config = {
        "token_type": "char", "token_list": str(root / "tokens.txt"),
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 23},
        "normalize": "utterance_mvn",
        "encoder": "conformer",
        "encoder_conf": {"output_size": 16, "attention_heads": 2, "linear_units": 32,
                         "num_blocks": 1, "use_cnn_module": False, "dropout_rate": 0.0,
                         "positional_dropout_rate": 0.0},
        "decoder_conf": {"attention_heads": 2, "linear_units": 32, "num_blocks": 1,
                         "dropout_rate": 0.0, "positional_dropout_rate": 0.0},
        "model_conf": {"ctc_weight": 0.5},
        "optim": "adam", "optim_conf": {"lr": 0.003}, "scheduler": "none",
        "batch_type": "sorted", "batch_size": 8, "max_epoch": 2,
        "keep_nbest_models": 1, "log_interval": 50,
        "speech_pad_multiple": 4000, "text_pad_multiple": 4,
        "train_data_path_and_name_and_type": [
            [str(root / "train" / "wav.scp"), "speech", "sound"],
            [str(root / "train" / "text"), "text", "text"]],
        "valid_data_path_and_name_and_type": [
            [str(root / "valid" / "wav.scp"), "speech", "sound"],
            [str(root / "valid" / "text"), "text", "text"]],
        "output_dir": str(exp),
    }
    (tmp_path / "t.yaml").write_text(yaml.safe_dump(config))
    ASRTask.main(["--config", str(tmp_path / "t.yaml")])

    from llm_guided_asr_tpu.bin.asr_inference import Speech2Text
    from llm_guided_asr_tpu.bin.asr_inference_streaming import Speech2TextStreaming
    from llm_guided_asr_tpu.data.fileio import SoundScpReader

    reader = SoundScpReader(root / "valid" / "wav.scp")
    uid = next(iter(reader.keys()))
    _, wav = reader[uid]

    kwargs = dict(ctc_weight=1.0, beam_size=1, speech_pad_multiple=4000)
    offline = Speech2Text(exp / "config.yaml", exp / "valid.loss.best.msgpack", **kwargs)
    streaming = Speech2TextStreaming(
        exp / "config.yaml", exp / "valid.loss.best.msgpack",
        chunk_samples=8000, **kwargs,
    )
    partials = streaming.decode_utterance(wav)
    assert len(partials) >= 2  # got intermediate results
    final_text = partials[-1][0][0]
    offline_text = offline(wav)[0][0]
    assert final_text == offline_text


def test_partially_ar_decode_matches_or_beats_maskctc():
    """Partially-AR span decoding runs and fills every mask; scores finite."""
    from llm_guided_asr_tpu.models.maskctc import (
        MaskCTCModel,
        maskctc_decode,
        partially_ar_decode,
    )
    from llm_guided_asr_tpu.ops.frontend import FrontendConfig
    from llm_guided_asr_tpu.models.transformer_decoder import TransformerDecoderConfig

    cfg = ASRModelConfig(
        vocab_size=10,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=20),
        normalize="utterance_mvn",
        encoder=enc_cfg(input_layer="conv2d"),
        decoder=TransformerDecoderConfig(attention_heads=2, linear_units=24,
                                         num_blocks=1, dropout_rate=0.0),
        ctc_weight=0.3,
    )
    model = MaskCTCModel(cfg)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((1, 1600)), jnp.float32)
    slens = jnp.asarray([1600])
    text = jnp.asarray([[1, 2, 3]], jnp.int32)
    tlens = jnp.asarray([3])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, slens, text, tlens, deterministic=True,
    )
    enc, enc_lens = model.apply(variables, speech, slens, method=model.encode)
    toks, n = partially_ar_decode(model, variables, enc, enc_lens,
                                  threshold=0.99, beam_size=3)
    assert toks.shape[0] == 1
    out = np.asarray(toks)[0, : int(n[0])]
    assert np.all(out != model.mask_id)  # every mask filled
    assert np.all((out >= 0) & (out < cfg.vocab_size))
    # same CTC skeleton as maskctc_decode where confident
    toks2, n2 = maskctc_decode(model, variables, enc, enc_lens, threshold=0.99)
    assert int(n2[0]) == int(n[0])


def test_longformer_window_locality():
    """Longformer: frames outside the attention window cannot influence a
    frame's output (1 layer); inside the window they do."""
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((1, 60, 20)), jnp.float32)
    lens = jnp.asarray([60])
    cfg = enc_cfg(num_blocks=1)
    from llm_guided_asr_tpu.models.conformer import LongformerEncoder

    model = LongformerEncoder(cfg, attention_window=5, name="enc")
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats, lens, deterministic=True,
    )
    out1, _ = model.apply(variables, feats, lens, deterministic=True)
    feats2 = feats.at[:, 40:].add(5.0)
    out2, _ = model.apply(variables, feats2, lens, deterministic=True)
    # frames < 35 are > window away from every perturbed frame
    np.testing.assert_allclose(np.asarray(out1)[:, :35], np.asarray(out2)[:, :35],
                               atol=1e-5)
    assert not np.allclose(np.asarray(out1)[:, 36:], np.asarray(out2)[:, 36:])
