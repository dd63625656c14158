"""Custom-VJP masked batch norm: value + gradient parity vs XLA autodiff."""

import jax
import jax.numpy as jnp
import numpy as np

from llm_guided_asr_tpu.ops.masked_bn import masked_batch_norm


def _ref(x, valid, scale, bias, eps=1e-5):
    """Straight-line autodiff reference (the pre-fusion module body)."""
    m = valid[..., None].astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m), 1.0)
    xf = x.astype(jnp.float32)
    mean = jnp.sum(xf * m, axis=(0, 1)) / n
    var = jnp.sum(((xf - mean) ** 2) * m, axis=(0, 1)) / n
    inv = jax.lax.rsqrt(var + eps)
    return (xf - mean) * inv * scale + bias


def test_forward_matches_reference():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 7, 5)), jnp.float32)
    valid = jnp.asarray(rng.random((3, 7)) > 0.3)
    scale = jnp.asarray(rng.standard_normal(5), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(5), jnp.float32)
    y, mean, var = masked_batch_norm(x, valid, scale, bias)
    np.testing.assert_allclose(y, _ref(x, valid, scale, bias), rtol=1e-5, atol=1e-5)
    m = np.asarray(valid)[..., None]
    np.testing.assert_allclose(
        mean, (np.asarray(x) * m).sum((0, 1)) / m.sum(), rtol=1e-5, atol=1e-6
    )


def test_grads_match_autodiff():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 9, 4)), jnp.float32)
    valid = jnp.asarray(rng.random((2, 9)) > 0.4)
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal(4), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(4), jnp.float32)
    # downstream loss deliberately reads PAD positions too (residual paths
    # after the conv module do not re-mask)
    w = jnp.asarray(rng.standard_normal((2, 9, 4)), jnp.float32)

    def loss_fused(x, scale, bias):
        y, _, _ = masked_batch_norm(x, valid, scale, bias)
        return jnp.sum(y * w) + jnp.sum(jnp.tanh(y))

    def loss_ref(x, scale, bias):
        y = _ref(x, valid, scale, bias)
        return jnp.sum(y * w) + jnp.sum(jnp.tanh(y))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for gf, gr, name in zip(g_fused, g_ref, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(gf, gr, rtol=2e-4, atol=2e-5, err_msg=name)


def test_all_pads_row_is_finite():
    x = jnp.ones((2, 4, 3), jnp.float32)
    valid = jnp.zeros((2, 4), bool)  # degenerate: nothing valid
    y, mean, var = masked_batch_norm(x, valid, jnp.ones(3), jnp.zeros(3))
    assert np.isfinite(np.asarray(y)).all()
    g = jax.grad(lambda x: jnp.sum(masked_batch_norm(x, valid, jnp.ones(3), jnp.zeros(3))[0]))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_module_uses_fused_core_in_training():
    """MaskedBatchNorm training-mode output + running stats unchanged."""
    import flax.linen as nn

    from llm_guided_asr_tpu.models.conformer import MaskedBatchNorm

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 6, 4)), jnp.float32)
    valid = jnp.asarray(rng.random((2, 6)) > 0.3)
    mod = MaskedBatchNorm()
    vs = mod.init(jax.random.PRNGKey(0), x, valid, use_running_average=False)
    y, mut = mod.apply(vs, x, valid, use_running_average=False,
                       mutable=["batch_stats"])
    np.testing.assert_allclose(
        y, _ref(x, valid, jnp.ones(4), jnp.zeros(4)), rtol=1e-5, atol=1e-5
    )
    m = np.asarray(valid)[..., None]
    mean = (np.asarray(x) * m).sum((0, 1)) / m.sum()
    np.testing.assert_allclose(
        mut["batch_stats"]["mean"], 0.1 * mean, rtol=1e-5, atol=1e-6
    )
