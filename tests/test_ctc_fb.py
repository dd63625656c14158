"""Forward-backward CTC loss kernel (ops/ctc_fb.py): value + exact-gradient
parity vs optax autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llm_guided_asr_tpu.ops.ctc_fb import ctc_loss_fb


def _opt_loss(logits, ll, labels, lbl):
    T, N = logits.shape[1], labels.shape[1]
    lp_pad = 1.0 - (jnp.arange(T)[None, :] < ll[:, None]).astype(jnp.float32)
    lab_pad = 1.0 - (jnp.arange(N)[None, :] < lbl[:, None]).astype(jnp.float32)
    labs = jnp.where(jnp.arange(N)[None, :] < lbl[:, None], labels, 0)
    return optax.ctc_loss(logits, lp_pad, labs, lab_pad, blank_id=0)


def test_value_and_grad_match_optax():
    rng = np.random.default_rng(0)
    B, T, V, N = 3, 12, 7, 4
    logits = jnp.asarray(rng.standard_normal((B, T, V)), jnp.float32)
    ll = jnp.asarray([12, 9, 5])
    labels = jnp.asarray([[1, 2, 2, 3], [2, 3, 0, 0], [4, 0, 0, 0]], jnp.int32)
    lbl = jnp.asarray([4, 2, 1])
    np.testing.assert_allclose(
        np.asarray(ctc_loss_fb(logits, ll, labels, lbl)),
        np.asarray(_opt_loss(logits, ll, labels, lbl)), rtol=1e-4, atol=1e-4,
    )
    g_ref = jax.grad(lambda lg: jnp.sum(_opt_loss(lg, ll, labels, lbl)))(logits)
    g_fb = jax.grad(lambda lg: jnp.sum(ctc_loss_fb(lg, ll, labels, lbl)))(logits)
    np.testing.assert_allclose(np.asarray(g_fb), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-5)


def test_repeated_labels_and_single_frame():
    """Repeats force blank transitions; the skip-disallowed path must match."""
    rng = np.random.default_rng(1)
    B, T, V = 2, 10, 5
    logits = jnp.asarray(rng.standard_normal((B, T, V)), jnp.float32)
    labels = jnp.asarray([[2, 2, 2, 0], [1, 1, 0, 0]], jnp.int32)
    ll = jnp.asarray([10, 10])
    lbl = jnp.asarray([3, 2])
    np.testing.assert_allclose(
        np.asarray(ctc_loss_fb(logits, ll, labels, lbl)),
        np.asarray(_opt_loss(logits, ll, labels, lbl)), rtol=1e-4, atol=1e-4,
    )
    g_ref = jax.grad(lambda lg: jnp.sum(_opt_loss(lg, ll, labels, lbl)))(logits)
    g_fb = jax.grad(lambda lg: jnp.sum(ctc_loss_fb(lg, ll, labels, lbl)))(logits)
    np.testing.assert_allclose(np.asarray(g_fb), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-5)


def test_impossible_alignment_is_inf_with_zero_grad():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.standard_normal((1, 3, 5)), jnp.float32)
    labels = jnp.asarray([[1, 2, 3, 4]], jnp.int32)  # needs >= 4 frames
    loss = ctc_loss_fb(logits, jnp.asarray([3]), labels, jnp.asarray([4]))
    assert not np.isfinite(float(loss[0]))
    g = jax.grad(lambda lg: jnp.where(
        jnp.isfinite(ctc_loss_fb(lg, jnp.asarray([3]), labels, jnp.asarray([4]))),
        ctc_loss_fb(lg, jnp.asarray([3]), labels, jnp.asarray([4])), 0.0
    ).sum())(logits)
    assert np.allclose(np.asarray(g), 0.0)


def test_grad_sums_to_zero_over_vocab():
    """softmax - posterior: each valid frame's gradient sums to 0 over V."""
    rng = np.random.default_rng(3)
    B, T, V = 2, 8, 6
    logits = jnp.asarray(rng.standard_normal((B, T, V)), jnp.float32)
    labels = jnp.asarray([[1, 2], [3, 0]], jnp.int32)
    ll = jnp.asarray([8, 5])
    lbl = jnp.asarray([2, 1])
    g = jax.grad(lambda lg: jnp.sum(ctc_loss_fb(lg, ll, labels, lbl)))(logits)
    sums = np.asarray(jnp.sum(g, axis=-1))
    np.testing.assert_allclose(sums, 0.0, atol=1e-4)
    # padded frames get zero grad
    assert np.allclose(np.asarray(g)[1, 5:], 0.0)
