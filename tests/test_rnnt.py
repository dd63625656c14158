"""RNN-T loss vs straightforward numpy lattice DP."""

import jax
import jax.numpy as jnp
import numpy as np

from llm_guided_asr_tpu.ops.rnnt import rnnt_loss


def np_rnnt_ll(logp, labels, T, U, blank=0):
    """Reference O(T*U) sequential DP: returns log P(labels | logp)."""
    alpha = np.full((T, U + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(T):
        for u in range(U + 1):
            if t == 0 and u == 0:
                continue
            cands = []
            if t > 0:
                cands.append(alpha[t - 1, u] + logp[t - 1, u, blank])
            if u > 0:
                cands.append(alpha[t, u - 1] + logp[t, u - 1, labels[u - 1]])
            alpha[t, u] = np.logaddexp.reduce(cands) if cands else -np.inf
    return alpha[T - 1, U] + logp[T - 1, U, blank]


def make_logp(B, T, U, V, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((B, T, U + 1, V)).astype(np.float32)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    return logits, logp


def test_rnnt_loss_matches_numpy():
    B, T, U, V = 2, 5, 3, 6
    logits, logp = make_logp(B, T, U, V)
    labels = np.array([[1, 2, 3], [4, 5, 1]], np.int32)
    t_lens = np.array([5, 4], np.int32)
    u_lens = np.array([3, 2], np.int32)
    loss = float(
        rnnt_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(t_lens), jnp.asarray(u_lens))
    )
    ref = -np.mean([
        np_rnnt_ll(logp[b], labels[b], t_lens[b], u_lens[b]) for b in range(B)
    ])
    np.testing.assert_allclose(loss, ref, rtol=1e-4)


def test_rnnt_loss_grad_finite():
    B, T, U, V = 2, 4, 2, 5
    logits, _ = make_logp(B, T, U, V, seed=1)
    labels = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
    t_lens = jnp.asarray([4, 3], jnp.int32)
    u_lens = jnp.asarray([2, 1], jnp.int32)

    g = jax.grad(
        lambda x: rnnt_loss(x, labels, t_lens, u_lens)
    )(jnp.asarray(logits))
    assert np.all(np.isfinite(np.asarray(g)))
    # grads for padded time frames of example 1 (t=3) must be zero
    assert np.allclose(np.asarray(g)[1, 3], 0.0)


def test_rnnt_degenerate_empty_label():
    # U=0: probability = prod of blanks
    B, T, V = 1, 3, 4
    logits, logp = make_logp(B, T, 0, V, seed=2)
    labels = jnp.zeros((1, 0), jnp.int32)
    # pad labels to width >=1 for the API
    logits_w = np.concatenate([logits, np.zeros((1, T, 1, V), np.float32)], axis=2)
    loss = float(
        rnnt_loss(
            jnp.asarray(logits_w), jnp.zeros((1, 1), jnp.int32),
            jnp.asarray([T]), jnp.asarray([0]),
        )
    )
    ref = -sum(logp[0, t, 0, 0] for t in range(T))
    np.testing.assert_allclose(loss, ref, rtol=1e-4)
