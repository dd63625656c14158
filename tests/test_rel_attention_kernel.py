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
