"""Whisper fine-tune path (VERDICT r4 weak #5 / next #10).

Reference: whisper encoder/decoder mounted inside ESPnetASRModel
(espnet2/asr/encoder/whisper_encoder.py, decoder/whisper_decoder.py) —
attention CE fine-tune, no CTC head.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llm_guided_asr_tpu.models.ssl_encoders import WhisperEncConfig
from llm_guided_asr_tpu.models.whisper import WhisperASR, WhisperConfig

TINY = WhisperConfig(
    vocab_size=16, d_model=32, decoder_layers=1, decoder_attention_heads=2,
    decoder_ffn_dim=64, max_target_positions=64,
    encoder=WhisperEncConfig(
        d_model=32, encoder_layers=1, encoder_attention_heads=2,
        encoder_ffn_dim=64, num_mel_bins=20, max_source_positions=3001,
    ),
    sot_id=14, eot_id=15,
)


def _batch():
    g = np.random.default_rng(0)
    speech = jnp.asarray(g.standard_normal((2, 4000)), jnp.float32) * 0.1
    sl = jnp.asarray([4000, 3200])
    text = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, -1]], jnp.int32)
    tl = jnp.asarray([4, 3])
    return speech, sl, text, tl


def test_finetune_forward_loss():
    model = WhisperASR(TINY)
    speech, sl, text, tl = _batch()
    v = model.init(jax.random.PRNGKey(0), speech, sl, text, tl)
    loss, stats, w = model.apply(v, speech, sl, text, tl)
    assert np.isfinite(float(loss)) and "acc" in stats


def test_finetune_overfit():
    model = WhisperASR(TINY)
    speech, sl, text, tl = _batch()
    v = model.init(jax.random.PRNGKey(0), speech, sl, text, tl)
    params = v["params"]
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        l, g = jax.value_and_grad(
            lambda q: model.apply({"params": q}, speech, sl, text, tl)[0]
        )(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    first = None
    for _ in range(12):
        params, opt, l = step(params, opt)
        first = float(l) if first is None else first
    assert float(l) < first


def test_decode_after_finetune():
    """BatchBeamSearch (ctc_weight=0) drives the fine-tuned model."""
    from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch

    model = WhisperASR(TINY)
    speech, sl, text, tl = _batch()
    v = model.init(jax.random.PRNGKey(0), speech, sl, text, tl)
    enc, enc_lens = model.apply(v, speech, sl, method=model.encode_speech)
    bs = BatchBeamSearch(
        model, v, vocab_size=TINY.vocab_size, sos=TINY.sot_id,
        eos=TINY.eot_id, beam_size=2, ctc_weight=0.0,
    )
    hyps = bs(enc[:1], enc_lens[:1], maxlenratio=-6.0, nbest=1)
    assert len(hyps) >= 1 and len(hyps[0].yseq) >= 2


def test_task_builder():
    from llm_guided_asr_tpu.tasks.generic import TASK_BUILDERS

    model, names, dummy = TASK_BUILDERS["whisper"]({"model_conf": {
        "vocab_size": 16, "d_model": 32, "encoder_layers": 1,
        "decoder_layers": 1, "attention_heads": 2, "ffn_dim": 64,
        "num_mel_bins": 20, "max_source_positions": 3001,
    }})
    v = model.init(jax.random.PRNGKey(0), *dummy)
    loss, _, _ = model.apply(v, *dummy)
    assert np.isfinite(float(loss))


def test_pretrained_weights_reach_training(tmp_path):
    """The model_name_or_path fine-tune branch must train FROM the HF
    checkpoint: build through the task machinery and assert the variables
    main()/build_model_from_file produce carry the converted HF weights,
    not model.init values."""
    import transformers

    hf_cfg = transformers.WhisperConfig(
        vocab_size=32, d_model=16, encoder_layers=1, decoder_layers=1,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=32, decoder_ffn_dim=32, num_mel_bins=20,
        max_source_positions=1500, max_target_positions=32,
        decoder_start_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    hf = transformers.WhisperModel(hf_cfg)
    ckpt = tmp_path / "tiny_whisper"
    hf.save_pretrained(ckpt)

    from llm_guided_asr_tpu.models.whisper import load_whisper_asr
    from llm_guided_asr_tpu.tasks.generic import (
        _build_whisper,
        _merge_pretrained,
    )

    _, pre_vars, _ = load_whisper_asr(str(ckpt))
    model, batch_args, dummy = _build_whisper(
        {"model_conf": {"model_name_or_path": str(ckpt)}}
    )
    assert getattr(model, "_pretrained_variables", None), \
        "builder must stash the converted HF weights"
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "mask": jax.random.PRNGKey(2)}
    init_vars = dict(model.init(rngs, *dummy, deterministic=True))
    merged = _merge_pretrained(model, init_vars)
    # the merged params are the HF conversion, not the random init
    got = jax.tree_util.tree_leaves(merged["params"])
    want = jax.tree_util.tree_leaves(pre_vars["params"])
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    # and they differ from a fresh init (i.e. the merge did something)
    fresh = jax.tree_util.tree_leaves(init_vars["params"])
    assert any(
        g.shape == f.shape and not np.allclose(np.asarray(g), np.asarray(f))
        for g, f in zip(got, fresh)
    )
