"""CTC loss with a forward-backward custom VJP.

Differentiating optax.ctc_loss's alpha scan with autodiff stores and re-reads
per-step residuals and replays the scan in reverse — measured as the single
most expensive piece of the training step on TPU (the CTC branch's backward
cost ~half the whole fwd+bwd).  The classical alternative (Graves 2006) is
exact and cheap: run the alpha (forward) and beta (backward) recursions, and
the gradient w.r.t. logits is

    dL/dlogits[t, k] = softmax(logits)[t, k] - sum_{s: ext[s]=k} gamma_t(s)

where gamma is the posterior over extended-label states.  Both recursions are
[B, S]-state scans over T (S = 2*N+1 interleaved blanks), so the backward
pass costs the same as the forward — no residual traffic.

Matches espnet2/asr/ctc.py 'builtin' semantics via ops/losses.ctc_loss:
per-example NLL, non-finite examples dropped, batch-mean reduction by the
caller.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG = -1.0e30


def _extend(labels: jnp.ndarray, blank_id: int) -> jnp.ndarray:
    """[B, N] -> [B, 2N+1] blank-interleaved extended labels."""
    b, n = labels.shape
    ext = jnp.full((b, 2 * n + 1), blank_id, labels.dtype)
    return ext.at[:, 1::2].set(labels)


def _fb(lp: jnp.ndarray, logit_lengths, labels, label_lengths, blank_id,
        time_risk: float = 0.0):
    """Run both recursions; return (per-ex loss, gamma posteriors [T, B, S],
    ext labels).

    time_risk > 0 tilts the path distribution with a delay risk
    r(t) = time_risk * t / T charged per frame a path occupies a TOKEN
    state (Bayes-risk CTC in its latency-control use,
    espnet2/asr/bayes_risk_ctc.py / k2 brctc; this formulation penalizes
    late token occupancy rather than grouping by last-emission frame —
    same control knob, simpler risk): training prefers early-emitting
    alignments.  The risk is constant w.r.t. the logits, so the gradient
    identity (softmax - tilted posterior) is unchanged.
    """
    b, t_max, v = lp.shape
    n = labels.shape[1]
    s_max = 2 * n + 1
    labels = jnp.where(
        jnp.arange(n)[None, :] < label_lengths[:, None], labels, 0
    )
    ext = _extend(labels, blank_id)  # [B, S]
    s_len = 2 * label_lengths + 1  # valid states per example

    # emission log-probs per state: [T, B, S]
    em = jnp.moveaxis(
        jax.vmap(lambda lpb, extb: lpb[:, extb])(lp, ext), 1, 0
    )
    if time_risk:
        # delay risk on TOKEN states only (odd s); normalized frame index
        tt = jnp.arange(t_max, dtype=jnp.float32)[:, None, None]
        denom = jnp.maximum(logit_lengths.astype(jnp.float32), 1.0)[None, :, None]
        is_tok = (jnp.arange(s_max) % 2 == 1)[None, None, :]
        em = em - jnp.where(is_tok, time_risk * tt / denom, 0.0)
    sidx = jnp.arange(s_max)[None, :]
    s_valid = sidx < s_len[:, None]
    # skip transition allowed: s >= 2, ext[s] != blank, ext[s] != ext[s-2]
    can_skip = (
        (sidx >= 2)
        & (ext != blank_id)
        & (ext != jnp.pad(ext, ((0, 0), (2, 0)))[:, :s_max])
    )
    t_valid = jnp.arange(t_max)[:, None] < logit_lengths[None, :]  # [T, B]

    # alpha: includes emission at t
    a0 = jnp.where(sidx < 2, em[0], NEG)
    a0 = jnp.where(s_valid, a0, NEG)

    def alpha_step(a_prev, inp):
        em_t, tv = inp  # [B, S], [B]
        stay = a_prev
        prev1 = jnp.pad(a_prev, ((0, 0), (1, 0)), constant_values=NEG)[:, :s_max]
        prev2 = jnp.pad(a_prev, ((0, 0), (2, 0)), constant_values=NEG)[:, :s_max]
        prev2 = jnp.where(can_skip, prev2, NEG)
        a = jnp.logaddexp(jnp.logaddexp(stay, prev1), prev2) + em_t
        a = jnp.where(s_valid, a, NEG)
        a = jnp.where(tv[:, None], a, a_prev)  # freeze past end
        return a, a

    _, alphas = jax.lax.scan(alpha_step, a0, (em[1:], t_valid[1:]))
    alphas = jnp.concatenate([a0[None], alphas], axis=0)  # [T, B, S]

    # beta: includes emission at t (Graves convention where
    # P = sum_s exp(alpha_t + beta_t - em_t) for any valid t)
    t_last = jnp.clip(logit_lengths - 1, 0, t_max - 1)
    em_last = jnp.take_along_axis(
        jnp.moveaxis(em, 0, 1), t_last[:, None, None], axis=1
    )[:, 0]  # [B, S]
    is_final = (sidx == (s_len - 1)[:, None]) | (sidx == (s_len - 2)[:, None])
    bT = jnp.where(is_final & s_valid, em_last, NEG)

    def beta_step(b_next, inp):
        em_t, em_tp1_unused, tv, is_last = inp
        stay = b_next
        nxt1 = jnp.pad(b_next, ((0, 0), (0, 1)), constant_values=NEG)[:, 1:]
        # skip from s to s+2 allowed iff can_skip[s+2]
        nxt2 = jnp.pad(b_next, ((0, 0), (0, 2)), constant_values=NEG)[:, 2:]
        nxt2 = jnp.where(
            jnp.pad(can_skip, ((0, 0), (0, 2)))[:, 2:], nxt2, NEG
        )
        bb = jnp.logaddexp(jnp.logaddexp(stay, nxt1), nxt2) + em_t
        bb = jnp.where(s_valid, bb, NEG)
        # rows where t is the example's last frame re-initialize; rows past
        # the end stay frozen
        bb = jnp.where(is_last[:, None], jnp.where(is_final & s_valid, em_t, NEG), bb)
        bb = jnp.where(tv[:, None], bb, b_next)
        return bb, bb

    # iterate t = T-2 .. 0 feeding beta_{t+1}; em at t
    is_last_row = jnp.arange(t_max)[:, None] == t_last[None, :]  # [T, B]
    _, betas_rev = jax.lax.scan(
        beta_step,
        bT,
        (em[:-1][::-1], em[1:][::-1], t_valid[:-1][::-1], is_last_row[:-1][::-1]),
    )
    betas = jnp.concatenate([betas_rev[::-1], bT[None]], axis=0)  # [T, B, S]
    # row t = t_last holds bT by construction for each example
    betas = jnp.where(is_last_row[..., None], bT[None], betas)

    # total log-prob from alpha at each example's last frame
    a_last = jnp.take_along_axis(
        jnp.moveaxis(alphas, 0, 1), t_last[:, None, None], axis=1
    )[:, 0]  # [B, S]
    logp_total = jax.nn.logsumexp(
        jnp.where(is_final & s_valid, a_last, NEG), axis=-1
    )  # [B]

    gamma = alphas + betas - em - logp_total[None, :, None]  # log posteriors
    return -logp_total, gamma, ext, t_valid


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _ctc_loss_fb_impl(logits, logit_lengths, labels, label_lengths, blank_id,
                      time_risk):
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    loss, _, _, _ = _fb(lp, logit_lengths, labels, label_lengths, blank_id,
                        time_risk)
    return loss


def ctc_loss_fb(
    logits: jnp.ndarray,  # [B, T, V]
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,  # [B, N]
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
    time_risk: float = 0.0,
) -> jnp.ndarray:
    """Per-example CTC NLL [B] (forward-backward, custom gradient).

    Impossible alignments (T < |ext path|) come back as +inf so callers'
    zero_infinity-style isfinite filters drop them.  time_risk > 0 gives
    the Bayes-risk (delay-penalized) variant — see _fb.
    """
    loss = _ctc_loss_fb_impl(logits, logit_lengths, labels,
                             jnp.minimum(label_lengths, labels.shape[1]),
                             blank_id, float(time_risk))
    return jnp.where(loss < 1e29, loss, jnp.inf)


def _fwd(logits, logit_lengths, labels, label_lengths, blank_id, time_risk):
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    loss, gamma, ext, t_valid = _fb(lp, logit_lengths, labels, label_lengths,
                                    blank_id, time_risk)
    # dtype token: residuals must be JAX types, so carry an empty array
    return loss, (lp, gamma, ext, t_valid, loss, jnp.zeros((0,), logits.dtype))




def _bwd(blank_id, time_risk, res, g):
    lp, gamma, ext, t_valid, loss, dtype_token = res
    in_dtype = dtype_token.dtype
    b, t_max, v = lp.shape
    # posterior mass per vocab entry. A scatter-add over lattice states
    # measured ~6 ms/step on v5e (TPU scatters serialize); the same
    # contraction as a batched matmul against the per-example state->vocab
    # one-hot runs on the MXU in <0.1 ms.
    onehot = (ext[:, :, None] == jnp.arange(v)[None, None, :]).astype(jnp.float32)
    post = jnp.einsum(
        "tbs,bsv->btv", jnp.exp(gamma), onehot,
        precision=jax.lax.Precision.HIGHEST,
    )
    grad_lp = jnp.exp(lp) - post  # [B, T, V]
    grad_lp = jnp.where(t_valid.T[:, :, None], grad_lp, 0.0)
    # non-finite example (impossible alignment): zero grad, like zero_infinity
    finite = jnp.isfinite(loss) & (loss < 1e29)
    grad_lp = jnp.where(finite[:, None, None], grad_lp, 0.0)
    grad = grad_lp * g[:, None, None]
    return (grad.astype(in_dtype), None, None, None)


_ctc_loss_fb_impl.defvjp(_fwd, _bwd)
