"""Transducer model + WKV kernel tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_guided_asr_tpu.models.transducer import (
    TransducerDecoderConfig,
    TransducerModel,
    TransducerModelConfig,
    transducer_greedy_decode,
)
from llm_guided_asr_tpu.models.conformer import ConformerConfig
from llm_guided_asr_tpu.ops.frontend import FrontendConfig
from llm_guided_asr_tpu.ops.wkv import wkv, wkv_init_state, wkv_scan

VOCAB = 8


def np_wkv(w, u, k, v):
    """Direct port of the reference recurrence math for verification."""
    B, T, C = k.shape
    y = np.zeros((B, T, C))
    aa = np.zeros((B, C))
    bb = np.zeros((B, C))
    pp = np.full((B, C), -1e38)
    for t in range(T):
        ww = u + k[:, t]
        q = np.maximum(pp, ww)
        e1 = np.exp(pp - q)
        e2 = np.exp(ww - q)
        y[:, t] = (e1 * aa + e2 * v[:, t]) / (e1 * bb + e2)
        ww2 = pp + w
        q2 = np.maximum(ww2, k[:, t])
        e1b = np.exp(ww2 - q2)
        e2b = np.exp(k[:, t] - q2)
        aa = e1b * aa + e2b * v[:, t]
        bb = e1b * bb + e2b
        pp = q2
    return y


def test_wkv_scan_matches_reference_math():
    rng = np.random.default_rng(0)
    B, T, C = 2, 7, 5
    w = -np.exp(rng.standard_normal(C)).astype(np.float32)
    u = rng.standard_normal(C).astype(np.float32)
    k = rng.standard_normal((B, T, C)).astype(np.float32)
    v = rng.standard_normal((B, T, C)).astype(np.float32)
    y, _ = wkv_scan(jnp.asarray(w), jnp.asarray(u), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(y), np_wkv(w, u, k, v), rtol=1e-5, atol=1e-5)


def test_wkv_custom_vjp_grads():
    rng = np.random.default_rng(1)
    B, T, C = 1, 4, 3
    w = jnp.asarray(-np.exp(rng.standard_normal(C)).astype(np.float32))
    u = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))

    def f(k):
        return jnp.sum(wkv(w, u, k, v) ** 2)

    g = jax.grad(f)(k)
    # numerical gradient check on one coordinate
    eps = 1e-3
    dk = k.at[0, 1, 2].add(eps)
    num = (f(dk) - f(k)) / eps
    np.testing.assert_allclose(float(g[0, 1, 2]), float(num), rtol=2e-2)


def test_wkv_state_chaining():
    rng = np.random.default_rng(2)
    C = 4
    w = jnp.asarray(-np.exp(rng.standard_normal(C)).astype(np.float32))
    u = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 6, C)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 6, C)).astype(np.float32))
    y_full, _ = wkv_scan(w, u, k, v)
    y1, st = wkv_scan(w, u, k[:, :3], v[:, :3])
    y2, _ = wkv_scan(w, u, k[:, 3:], v[:, 3:], st)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2], axis=1)), np.asarray(y_full), rtol=1e-5
    )


def tiny_transducer_cfg(decoder_type="stateless"):
    return TransducerModelConfig(
        vocab_size=VOCAB,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=20),
        normalize="utterance_mvn",
        encoder=ConformerConfig(
            output_size=16, attention_heads=2, linear_units=24, num_blocks=1,
            use_cnn_module=False,
        ),
        decoder=TransducerDecoderConfig(
            decoder_type=decoder_type, embed_size=16, hidden_size=16, num_layers=1,
        ),
        joint_size=16,
        aux_ctc_weight=0.1,
    )


@pytest.mark.parametrize("decoder_type", ["stateless", "rnn", "rwkv"])
def test_transducer_forward_and_grads(decoder_type):
    cfg = tiny_transducer_cfg(decoder_type)
    model = TransducerModel(cfg)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((2, 1600)), jnp.float32)
    slens = jnp.asarray([1600, 900])
    text = jnp.asarray([[1, 2, 3], [4, 5, -1]], jnp.int32)
    tlens = jnp.asarray([3, 2])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, slens, text, tlens, deterministic=True,
    )
    loss, stats, w = model.apply(variables, speech, slens, text, tlens, deterministic=True)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(stats["loss_rnnt"]))

    g = jax.grad(
        lambda p: model.apply({**variables, "params": p}, speech, slens, text, tlens,
                              deterministic=True)[0]
    )(variables["params"])
    total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_transducer_greedy_decode_runs():
    cfg = tiny_transducer_cfg("stateless")
    model = TransducerModel(cfg)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((2, 1600)), jnp.float32)
    slens = jnp.asarray([1600, 900])
    text = jnp.asarray([[1, 2, 3], [4, 5, -1]], jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, slens, text, jnp.asarray([3, 2]), deterministic=True,
    )
    enc, enc_lens = model.apply(variables, speech, slens, method=model.encode)
    tokens, n = transducer_greedy_decode(model, variables, enc, enc_lens)
    assert tokens.shape[0] == 2
    assert int(n[0]) >= 0 and int(n[0]) <= tokens.shape[1]
    # decoded ids are in-vocab and non-blank
    for b in range(2):
        ids = np.asarray(tokens)[b, : int(n[b])]
        assert np.all((ids > 0) & (ids < VOCAB))


def _overfit(model, variables, speech, slens, text, tlens, steps=120, lr=3e-3):
    import optax

    tx = optax.adam(lr)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        loss, g = jax.value_and_grad(
            lambda p: model.apply({**variables, "params": p}, speech, slens, text,
                                  tlens, deterministic=True)[0]
        )(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(steps):
        params, opt, loss = step(params, opt)
    return {**variables, "params": params}, float(loss)


def test_transducer_beam_recovers_sequences():
    """Beam search on an overfit model recovers the training sequences."""
    from llm_guided_asr_tpu.search.transducer_beam import transducer_beam_decode

    cfg = tiny_transducer_cfg("stateless")
    model = TransducerModel(cfg)
    rng = np.random.default_rng(0)
    # distinguishable inputs: each sequence gets its own random "audio"
    speech = jnp.asarray(rng.standard_normal((3, 1600)), jnp.float32)
    slens = jnp.full((3,), 1600, jnp.int32)
    text = jnp.asarray([[1, 2, 3], [3, 3, 1], [2, 1, 2]], jnp.int32)
    tlens = jnp.full((3,), 3, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, slens, text, tlens, deterministic=True,
    )
    variables, loss = _overfit(model, variables, speech, slens, text, tlens, steps=250)
    assert loss < 0.5, f"failed to overfit: {loss}"
    enc, enc_lens = model.apply(variables, speech, slens, method=model.encode)
    ok = 0
    for b in range(3):
        hyps = transducer_beam_decode(
            model, variables, enc[b : b + 1], enc_lens[b : b + 1], beam_size=4
        )
        if hyps[0].yseq == [int(x) for x in np.asarray(text)[b]]:
            ok += 1
    assert ok >= 2, f"beam decode recovered only {ok}/3"


def test_transducer_overfit_tiny():
    """A few adam steps reduce the RNN-T loss on one batch."""
    import optax

    cfg = tiny_transducer_cfg("stateless")
    model = TransducerModel(cfg)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((2, 1600)), jnp.float32)
    slens = jnp.asarray([1600, 1600])
    text = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32)
    tlens = jnp.asarray([3, 3])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, slens, text, tlens, deterministic=True,
    )
    tx = optax.adam(3e-3)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        loss, g = jax.value_and_grad(
            lambda p: model.apply({**variables, "params": p}, speech, slens, text, tlens,
                                  deterministic=True)[0]
        )(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    params, opt, l0 = step(params, opt)
    for _ in range(10):
        params, opt, l = step(params, opt)
    assert float(l) < float(l0)


def test_transducer_alsd_recovers_sequences():
    """ALSD (align_length_sync_decoding analog) matches the overfit targets
    and agrees with the time-synchronous beam."""
    from llm_guided_asr_tpu.search.transducer_beam import (
        transducer_alsd_decode,
        transducer_beam_decode,
    )

    cfg = tiny_transducer_cfg("stateless")
    model = TransducerModel(cfg)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((3, 1600)), jnp.float32)
    slens = jnp.full((3,), 1600, jnp.int32)
    text = jnp.asarray([[1, 2, 3], [3, 3, 1], [2, 1, 2]], jnp.int32)
    tlens = jnp.full((3,), 3, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, slens, text, tlens, deterministic=True,
    )
    variables, loss = _overfit(model, variables, speech, slens, text, tlens,
                               steps=250)
    assert loss < 0.5
    enc, enc_lens = model.apply(variables, speech, slens, method=model.encode)
    ok = agree = 0
    for b in range(3):
        hyps = transducer_alsd_decode(
            model, variables, enc[b : b + 1], enc_lens[b : b + 1], beam_size=4
        )
        ts_hyps = transducer_beam_decode(
            model, variables, enc[b : b + 1], enc_lens[b : b + 1], beam_size=4
        )
        if hyps[0].yseq == [int(x) for x in np.asarray(text)[b]]:
            ok += 1
        if hyps[0].yseq == ts_hyps[0].yseq:
            agree += 1
    assert ok >= 2, f"ALSD recovered only {ok}/3"
    assert agree >= 2, f"ALSD/TS agreement only {agree}/3"
