"""Fused rel-pos attention kernel vs the dense path (ops/rel_attention.py)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_guided_asr_tpu.models.transformer import _rel_shift
from llm_guided_asr_tpu.ops.rel_attention import (
    rel_attention_pad_pos,
    rel_flash_attention,
)


def dense_rel_attention(qu, qv, k, v, p_dense, kv_valid, sm_scale):
    """The exact dense formulation of RelPositionMultiHeadedAttention
    (models/transformer.py:133) on [B, H, T, dk] operands."""
    t = qu.shape[2]
    ac = jnp.einsum("bhqd,bhkd->bhqk", qu, k)
    bd = jnp.einsum("bhqd,phd->bhqp", qv, jnp.asarray(p_dense))
    bd = _rel_shift(bd, t)
    scores = (ac + bd) * sm_scale
    mask = kv_valid[:, None, None, :] > 0
    scores = jnp.where(mask, scores, -1e30)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


def _setup(b=2, t=40, tp=128, h=2, dk=64, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32) * 0.3
    qu = mk(b, h, tp, dk)
    qv = mk(b, h, tp, dk)
    k = mk(b, h, tp, dk)
    v = mk(b, h, tp, dk)
    p_dense = mk(2 * t - 1, h, dk)  # [2T-1, H, dk] as in the flax module
    lengths = jnp.asarray([t, t - 7])
    kv_valid = (jnp.arange(tp)[None, :] < lengths[:, None]).astype(jnp.int32)
    return qu, qv, k, v, p_dense, kv_valid, lengths, t, tp


def test_forward_matches_dense():
    qu, qv, k, v, p_dense, kv_valid, lengths, t, tp = _setup()
    sm = 1.0 / math.sqrt(qu.shape[-1])
    p_pad = rel_attention_pad_pos(p_dense, t, tp)
    out = rel_flash_attention(qu, qv, k, v, p_pad, kv_valid, sm)

    # the dense reference needs the same relative-index table: the [2T-1]
    # dense table covers |i-j| < T; restrict the comparison to valid rows
    # (i < length) where only |i-j| < T positions are unmasked
    ref = dense_rel_attention(
        qu[:, :, :t], qv[:, :, :t], k[:, :, :t], v[:, :, :t],
        p_dense, kv_valid[:, :t], sm,
    )
    for b in range(qu.shape[0]):
        L = int(lengths[b])
        np.testing.assert_allclose(
            np.asarray(out)[b, :, :L], np.asarray(ref)[b, :, :L],
            rtol=2e-4, atol=2e-5,
        )


def test_gradients_match_dense():
    qu, qv, k, v, p_dense, kv_valid, lengths, t, tp = _setup(seed=1)
    sm = 1.0 / math.sqrt(qu.shape[-1])
    p_pad = rel_attention_pad_pos(p_dense, t, tp)
    rvalid = (jnp.arange(tp)[None, :] < lengths[:, None]).astype(jnp.float32)

    def loss_kernel(qu, qv, k, v, p_pad):
        out = rel_flash_attention(qu, qv, k, v, p_pad, kv_valid, sm)
        # mask junk query rows like the caller does
        return jnp.sum((out * rvalid[:, None, :, None]).astype(jnp.float32) ** 2)

    def loss_dense(qu, qv, k, v, p_dense):
        out = dense_rel_attention(
            qu[:, :, :t], qv[:, :, :t], k[:, :, :t], v[:, :, :t],
            p_dense, kv_valid[:, :t], sm,
        )
        return jnp.sum((out * rvalid[:, None, :t, None]).astype(jnp.float32) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(qu, qv, k, v, p_pad)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3, 4))(
        qu, qv, k, v, p_dense
    )
    names = ["dqu", "dqv", "dk", "dv"]
    for name, a, b_ in zip(names, gk[:4], gd[:4]):
        np.testing.assert_allclose(
            np.asarray(a)[:, :, :t], np.asarray(b_)[:, :, :t],
            rtol=3e-4, atol=3e-4, err_msg=name,
        )
    # dp: kernel's padded layout [H, P, dk] vs dense [2T-1, H, dk] at offset
    dp_k = np.asarray(gk[4])  # [H, P, dk]
    dp_d = np.moveaxis(np.asarray(gd[4]), 1, 0)  # [H, 2T-1, dk]
    off = tp - t
    np.testing.assert_allclose(
        dp_k[:, off: off + 2 * t - 1], dp_d, rtol=3e-4, atol=3e-4,
        err_msg="dp",
    )
    # nothing leaks outside the original table rows
    outside = np.concatenate(
        [dp_k[:, :off].ravel(), dp_k[:, off + 2 * t - 1:].ravel()]
    )
    np.testing.assert_allclose(outside, 0.0, atol=3e-4)


def test_module_fused_matches_dense():
    """Module-level wiring: RelPositionMultiHeadedAttention(impl='fused')
    (padding, pos-table embedding, mask plumbing in models/transformer.py)
    matches impl='dense' on the same params."""
    import flax.linen as nn  # noqa: F401

    from llm_guided_asr_tpu.models.transformer import (
        RelPositionMultiHeadedAttention,
        rel_pos_enc,
    )

    B, T, D, H = 2, 40, 32, 2
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32) * 0.3
    lengths = jnp.asarray([T, T - 9])
    mask = (jnp.arange(T)[None, :] < lengths[:, None])[:, None, :]
    pe = jnp.asarray(rel_pos_enc(T, D))[None]

    outs = {}
    grads = {}
    for impl in ("dense", "fused"):
        mod = RelPositionMultiHeadedAttention(num_heads=H, dropout_rate=0.0,
                                              impl=impl)
        variables = mod.init(jax.random.PRNGKey(0), x, pe, mask, True)

        def loss(x, mod=mod, variables=variables):
            out = mod.apply(variables, x, pe, mask, True)
            valid = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)
            return jnp.sum((out * valid[:, :, None]) ** 2), out

        (l, out), g = jax.value_and_grad(loss, has_aux=True)(x)
        outs[impl] = np.asarray(out)
        grads[impl] = np.asarray(g)
    for b in range(B):
        L = int(lengths[b])
        np.testing.assert_allclose(outs["fused"][b, :L], outs["dense"][b, :L],
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(grads["fused"][b, :L], grads["dense"][b, :L],
                                   rtol=3e-4, atol=3e-4)


def test_full_tp_no_padding():
    """T == Tp == 128 exactly (no padded rows)."""
    qu, qv, k, v, p_dense, kv_valid, lengths, t, tp = _setup(t=128, tp=128, seed=2)
    sm = 1.0 / math.sqrt(qu.shape[-1])
    p_pad = rel_attention_pad_pos(p_dense, t, tp)
    out = rel_flash_attention(qu, qv, k, v, p_pad, kv_valid, sm)
    ref = dense_rel_attention(qu, qv, k, v, p_dense, kv_valid, sm)
    for b in range(2):
        L = int(lengths[b])
        np.testing.assert_allclose(
            np.asarray(out)[b, :, :L], np.asarray(ref)[b, :, :L],
            rtol=2e-4, atol=2e-5,
        )


def _dense_with_mask(qu, qv, k, v, p_dense, kv_valid, sm_scale, keep, rate):
    """Dense rel attention applying the EXACT in-kernel dropout keep mask
    (ops/rel_attention.py dropout_keep_mask) to the prob matrix — lets the
    dropout path be tested for exact parity, not just in expectation."""
    t = qu.shape[2]
    ac = jnp.einsum("bhqd,bhkd->bhqk", qu, k)
    bd = jnp.einsum("bhqd,phd->bhqp", qv, jnp.asarray(p_dense))
    bd = _rel_shift(bd, t)
    scores = (ac + bd) * sm_scale
    mask = kv_valid[:, None, None, :] > 0
    scores = jnp.where(mask, scores, -1e30)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = jnp.where(keep, attn, 0.0) / (1.0 - rate)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


def test_dropout_exact_parity_and_grads():
    """Kernel with dropout == dense path with the same hash mask (fwd+bwd)."""
    from llm_guided_asr_tpu.ops.rel_attention import dropout_keep_mask

    qu, qv, k, v, p_dense, kv_valid, lengths, t, tp = _setup(seed=4)
    b, h = qu.shape[0], qu.shape[1]
    sm = 1.0 / math.sqrt(qu.shape[-1])
    rate = 0.3
    seed = jnp.int32(12345)
    p_pad = rel_attention_pad_pos(p_dense, t, tp)

    # the mask the kernel derives per (head, batch) grid cell, restricted to
    # the unpadded [T, T] window; grid is (H, B)
    keep = np.zeros((b, h, t, t), bool)
    for hi in range(h):
        for bi in range(b):
            keep[bi, hi] = np.asarray(
                dropout_keep_mask(seed, hi, bi, (tp, tp), rate)
            )[:t, :t]
    keep = jnp.asarray(keep)
    rvalid = (jnp.arange(tp)[None, :] < lengths[:, None]).astype(jnp.float32)

    def loss_kernel(qu, qv, k, v, p_pad):
        out = rel_flash_attention(qu, qv, k, v, p_pad, kv_valid, sm,
                                  seed=seed, dropout_rate=rate)
        return jnp.sum((out * rvalid[:, None, :, None]) ** 2), out

    def loss_dense(qu, qv, k, v, p_dense):
        out = _dense_with_mask(
            qu[:, :, :t], qv[:, :, :t], k[:, :, :t], v[:, :, :t],
            p_dense, kv_valid[:, :t], sm, keep, rate,
        )
        return jnp.sum((out * rvalid[:, None, :t, None]) ** 2), out

    (lk, ok), gk = jax.value_and_grad(loss_kernel, argnums=(0, 1, 2, 3, 4),
                                      has_aux=True)(qu, qv, k, v, p_pad)
    (ld, od), gd = jax.value_and_grad(loss_dense, argnums=(0, 1, 2, 3, 4),
                                      has_aux=True)(qu, qv, k, v, p_dense)
    for bi in range(b):
        L = int(lengths[bi])
        np.testing.assert_allclose(np.asarray(ok)[bi, :, :L],
                                   np.asarray(od)[bi, :, :L],
                                   rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(float(lk), float(ld), rtol=3e-4)
    for name, a, b_ in zip(["dqu", "dqv", "dk", "dv"], gk[:4], gd[:4]):
        np.testing.assert_allclose(
            np.asarray(a)[:, :, :t], np.asarray(b_)[:, :, :t],
            rtol=5e-4, atol=5e-4, err_msg=name,
        )
    dp_k = np.asarray(gk[4])
    dp_d = np.moveaxis(np.asarray(gd[4]), 1, 0)
    np.testing.assert_allclose(dp_k[:, tp - t: tp + t - 1], dp_d,
                               rtol=5e-4, atol=5e-4, err_msg="dp")


def test_dropout_mask_statistics():
    """Keep probability ~= 1 - rate; different seeds give different masks."""
    from llm_guided_asr_tpu.ops.rel_attention import dropout_keep_mask

    rate = 0.1
    m1 = np.asarray(dropout_keep_mask(jnp.int32(7), 0, 0, (256, 256), rate))
    m2 = np.asarray(dropout_keep_mask(jnp.int32(8), 0, 0, (256, 256), rate))
    assert abs(m1.mean() - (1 - rate)) < 0.01
    assert abs(m2.mean() - (1 - rate)) < 0.01
    assert (m1 != m2).mean() > 0.05  # seeds decorrelate
    # per-cell decorrelation (head/batch offsets)
    m3 = np.asarray(dropout_keep_mask(jnp.int32(7), 1, 0, (256, 256), rate))
    assert (m1 != m3).mean() > 0.05


def test_module_fused_dropout_train_mode():
    """impl='fused' engages with dropout_rate>0 in train mode: output differs
    across dropout keys, mean over keys approaches the deterministic output,
    and gradients flow."""
    from llm_guided_asr_tpu.models.transformer import (
        RelPositionMultiHeadedAttention,
        rel_pos_enc,
    )

    B, T, D, H = 2, 24, 32, 2
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32) * 0.3
    lengths = jnp.asarray([T, T - 5])
    mask = (jnp.arange(T)[None, :] < lengths[:, None])[:, None, :]
    pe = jnp.asarray(rel_pos_enc(T, D))[None]

    mod = RelPositionMultiHeadedAttention(num_heads=H, dropout_rate=0.4,
                                          impl="fused")
    variables = mod.init(jax.random.PRNGKey(0), x, pe, mask, True)
    det = mod.apply(variables, x, pe, mask, True)

    outs = []
    for s in range(24):
        o = mod.apply(variables, x, pe, mask, False,
                      rngs={"dropout": jax.random.PRNGKey(s)})
        outs.append(np.asarray(o))
    assert not np.allclose(outs[0], outs[1])
    mean = np.mean(outs, axis=0)
    # unbiasedness: E[dropout(attn)] = attn (inverted scaling); wide tol for
    # 24 samples
    err = np.abs(mean - np.asarray(det))[:, : T - 5].mean()
    scale = np.abs(np.asarray(det))[:, : T - 5].mean()
    assert err < 0.35 * scale

    def loss(params):
        o = mod.apply({"params": params}, x, pe, mask, False,
                      rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.sum(o ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_module_fused_dropout_rbg_key():
    """Seed folding works with a typed rbg key (the trainer's default)."""
    from llm_guided_asr_tpu.models.transformer import (
        RelPositionMultiHeadedAttention,
        rel_pos_enc,
    )

    B, T, D, H = 1, 16, 32, 2
    x = jnp.ones((B, T, D), jnp.float32) * 0.1
    mask = jnp.ones((B, 1, T), bool)
    pe = jnp.asarray(rel_pos_enc(T, D))[None]
    mod = RelPositionMultiHeadedAttention(num_heads=H, dropout_rate=0.2,
                                          impl="fused")
    variables = mod.init(jax.random.PRNGKey(0), x, pe, mask, True)
    o = mod.apply(variables, x, pe, mask, False,
                  rngs={"dropout": jax.random.key(3, impl="rbg")})
    assert np.all(np.isfinite(np.asarray(o)))
