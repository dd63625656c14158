"""Fused rel-pos self-attention Pallas kernel (Transformer-XL scoring).

The dense rel-pos path (models/transformer.py RelPositionMultiHeadedAttention)
materializes a [B, H, T, 2T-1] position-score tensor and rel-shifts it with
pad/reshape copies; measured fwd+bwd on v5e that costs ~1.2 ms/layer at the
flagship operating point (B=32, T=312, D=256) — +60% over absolute-position
attention, ~14 ms of a 59 ms train step across 12 conformer blocks.

This kernel computes, per (batch, head) grid cell, entirely in VMEM:

    s1 = qu k^T                  (MXU)
    s2 = qv p^T                  (MXU, p = projected rel-pos table)
    bd[i, j] = s2[i, (Tp-1) - i + j]   (barrel-shift, no HBM round trip)
    out = softmax(mask(s1 + bd) * scale) v

The per-row shift uses a log-step barrel shifter over lane rolls
(pltpu.roll + row-bit selects) — O(log T) vector ops instead of the XLA
pad/reshape/slice chain.  The backward recomputes scores in-kernel and
emits dqu, dqv, dk, dv and the (head-shared-over-batch) dp via
sequential-grid accumulation.

Whole-(b,h) tiles keep everything resident for T <= ~768 (the ASR encoder
regime); longer sequences fall back to the dense path at the caller.

Reference semantics: espnet attention.py RelPositionMultiHeadedAttention
(zero_triu=False), numerically identical modulo f32 accumulation order.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _interpret() -> bool:
    """CPU tests run the kernel in interpreter mode (no Mosaic backend)."""
    if os.environ.get("LLMASR_PALLAS_INTERPRET"):
        return True
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:
        return True


def _shift_bd(s2: jnp.ndarray, t: int) -> jnp.ndarray:
    """[T, P] -> [T, T]: bd[i, j] = s2[i, (T-1) - i + j] (espnet rel_shift).

    One strided rotate: tpu.dynamic_rotate natively rolls row i by
    (shift + stride*i), so the whole rel-shift is a single VPU pass —
    result[i, j] = s2[i, (j - shift - i) mod P] with shift = P - (T-1).
    (An earlier version built this from a log2(T)-step chain of masked
    uniform rolls; at [256, 512] f32 those 9 full-tile passes were ~40% of
    the kernel's forward time and ~45% of its backward —
    tools/prof_relattn.py with LLMASR_RELATTN_NOSHIFT=1.)
    """
    if os.environ.get("LLMASR_RELATTN_NOSHIFT"):
        # profiling ablation ONLY (tools/prof_relattn.py): skip the shift
        # to measure its cost — results are WRONG with this set
        return s2[:, :t]
    p = s2.shape[1]
    x = pltpu.roll(s2, shift=(p - (t - 1)) % p, axis=1, stride=1, stride_axis=0)
    return x[:, :t]


def _unshift_bd_rev(dbd: jnp.ndarray, p_len: int, t: int,
                    lo_dtype) -> jnp.ndarray:
    """Adjoint of _shift_bd in LANE-REVERSED coordinates: returns y with
    y[i, j] = ds2[i, P-1-j] where ds2 = scatter of [T, T] dbd into [T, P].

    The inverse permutation needs a roll by MINUS the row index; the
    strided-rotate lowering only allows small non-negative strides
    (intra-vreg shift range < 128, so stride = P-1 for "-i mod P" is
    rejected).  A lane reversal flips the direction: reverse (a matmul
    with the exchange matrix J on the otherwise-idle MXU), then roll right
    by (base + i) with stride 1.  The SECOND reversal is algebraically
    pushed into the consumers instead of paid here: the caller contracts
    y against a pre-reversed position table (dqv = y @ p_rev) and emits
    dp in reversed coordinates, un-flipped once in XLA outside the kernel.
    dbd is cast to ``lo_dtype`` (bf16 in training) before the J matmul —
    the same precision the downstream dqv/dp matmuls already use.
    """
    pad = jnp.zeros((t, p_len - t), lo_dtype)
    x = jnp.concatenate([dbd.astype(lo_dtype), pad], axis=1)
    if os.environ.get("LLMASR_RELATTN_NOSHIFT"):
        return x  # profiling ablation ONLY — see _shift_bd
    ar = jax.lax.broadcasted_iota(jnp.int32, (p_len, p_len), 0)
    ac = jax.lax.broadcasted_iota(jnp.int32, (p_len, p_len), 1)
    jmat = (ar + ac == p_len - 1).astype(lo_dtype)  # J[a, b] = [a == P-1-b]
    xr = jax.lax.dot_general(x, jmat, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    y = pltpu.roll(xr, shift=(p_len - (t - 1)) % p_len, axis=1,
                   stride=1, stride_axis=0)
    return y.astype(lo_dtype)


def _scores(qu, qv, k, p, valid_row, sm_scale, tp):
    # operands stay in their storage dtype (bf16 in training) — the MXU runs
    # bf16 x bf16 -> f32 at full rate, while pre-casting to f32 (the r3
    # kernel) quarters matmul throughput; measured the difference at the op
    # level with tools/prof_relattn.py
    s1 = jax.lax.dot_general(qu, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s2 = jax.lax.dot_general(qv, p, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    bd = _shift_bd(s2, tp)
    scores = (s1 + bd) * sm_scale
    return jnp.where(valid_row > 0, scores, NEG_INF)


def dropout_keep_mask(seed, hi: int, bi: int, shape, rate: float):
    """Deterministic counter-based keep mask (True = keep), P(keep) = 1-rate.

    A stateless xorshift-multiply hash of (seed, head, batch, row, col) —
    chosen over pltpu.prng_random_bits because it runs identically in Mosaic
    AND interpret mode (prng_seed has no CPU lowering), and because being a
    pure function of indices it is trivially re-derived bit-identically in
    the backward kernel.  The trainer already treats dropout RNG quality as
    a perf knob (rbg hardware PRNG, train/trainer.py); a 3-round finalizer
    is well beyond what dropout needs.

    Exposed publicly so tests can reproduce the exact mask.
    """
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = r * jnp.uint32(0x9E3779B1) + c * jnp.uint32(0x85EBCA77)
    cell = jnp.uint32(seed) + jnp.uint32(hi) * jnp.uint32(0x927C1) \
        + jnp.uint32(bi) * jnp.uint32(0x68E31DA5)
    x = x ^ cell
    x = (x ^ (x >> 15)) * jnp.uint32(0x2C1B3C6D)
    x = (x ^ (x >> 12)) * jnp.uint32(0x297A2D39)
    x = x ^ (x >> 15)
    # P(x >= rate * 2^32) = 1 - rate for uniform u32
    return x >= jnp.uint32(min(rate, 1.0) * 4294967296.0)


def _fwd_kernel(seed_ref, qu_ref, qv_ref, k_ref, v_ref, p_ref, valid_ref,
                out_ref, l_ref, m_ref, *, sm_scale: float, dropout_rate: float,
                nb: int):
    """Forward over a block of ``nb`` batch rows per grid program.

    Measured motivation and outcome (tools/prof_relattn.py, B=32 H=4 T=250):
    one (h, b) pair per program ran 719 us/layer fwd while T=500 cost only
    +18% — pointing at per-program overhead.  Blocking nb rows per program
    (and fully unrolling the row loop) measured 586-618 us fwd / 920-941 us
    fwd+bwd — a ~15% gain; the remaining gap to absolute attention (~535 us
    fwd+bwd) is the per-row serial matmul->shift->softmax->matmul dependency
    chain, which neither fewer programs nor row interleaving removed.  Kept
    because it is never slower and shrinks the grid 8x at large B."""
    tp = qu_ref.shape[2]
    p = p_ref[0]
    # program ids read OUTSIDE the fori_loop body: inside, the primitive
    # ends up in the inner jaxpr where interpret mode cannot lower it
    hi = pl.program_id(0)
    bi0 = pl.program_id(1) * nb

    def row(i, carry):
        qu = qu_ref[i, 0]
        qv = qv_ref[i, 0]
        k = k_ref[i, 0]
        v = v_ref[i, 0]
        valid_row = valid_ref[i].reshape(1, tp)

        scores = _scores(qu, qv, k, p, valid_row, sm_scale, tp)
        m = jnp.max(scores, axis=1, keepdims=True)
        e = jnp.exp(scores - m)
        l = jnp.sum(e, axis=1, keepdims=True)
        if dropout_rate > 0.0:
            # attention-prob dropout (espnet attention.py: self.dropout(attn));
            # the l/m residuals describe the *pre-dropout* softmax and stay
            # valid.  The mask is keyed by the TRUE batch index so results
            # are independent of the nb blocking.
            keep = dropout_keep_mask(
                seed_ref[0], hi, bi0 + i, e.shape, dropout_rate,
            )
            e = jnp.where(keep, e, 0.0) / (1.0 - dropout_rate)
        # probs ride the MXU in the storage dtype (the dense path also casts
        # attn to self.dtype before the av einsum)
        out = jax.lax.dot_general(e.astype(v.dtype), v,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32) / l
        out_ref[i, 0] = out.astype(out_ref.dtype)
        l_ref[i, 0] = l  # [Tp, 1]
        m_ref[i, 0] = m
        return carry

    # rolled loop: VMEM temporaries are reused across rows (a full unroll
    # at nb=8/bf16 kept all rows' f32 score temps live — 19.5 MB stack vs
    # the 16 MB limit — and measured no faster; Mosaic only supports
    # unroll=1 or =num_steps)
    jax.lax.fori_loop(0, nb, row, 0)


def _bwd_kernel(seed_ref, qu_ref, qv_ref, k_ref, v_ref, p_ref, prev_ref,
                valid_ref, out_ref, l_ref, m_ref, dout_ref,
                dqu_ref, dqv_ref, dk_ref, dv_ref, dprev_ref, *,
                sm_scale: float, dropout_rate: float, nb: int):
    tp = qu_ref.shape[2]
    p_len = p_ref.shape[1]
    p = p_ref[0]
    p_rev = prev_ref[0]  # p with its position axis flipped (see _vjp_bwd)
    hi = pl.program_id(0)
    bi0 = pl.program_id(1) * nb

    # p is shared across the batch grid axis (innermost, so the per-head
    # block stays resident across consecutive visits): read-modify-write
    # accumulation is race-free; zero it on the first batch cell
    @pl.when(pl.program_id(1) == 0)
    def _init():
        dprev_ref[...] = jnp.zeros_like(dprev_ref)

    def row(i, carry):
        qu = qu_ref[i, 0]
        qv = qv_ref[i, 0]
        k = k_ref[i, 0]
        v = v_ref[i, 0]
        out = out_ref[i, 0].astype(jnp.float32)
        dout = dout_ref[i, 0]
        l = l_ref[i, 0]  # [Tp, 1]
        m = m_ref[i, 0]
        valid_row = valid_ref[i].reshape(1, tp)

        scores = _scores(qu, qv, k, p, valid_row, sm_scale, tp)
        prob = jnp.exp(scores - m) / l  # [T, T] f32
        prob_lo = prob.astype(v.dtype)

        if dropout_rate > 0.0:
            # re-derive the forward's exact keep mask; with dropout the
            # delta = sum(dout*out) shortcut no longer equals
            # rowsum(dprob*prob) so compute it directly
            keep = dropout_keep_mask(
                seed_ref[0], hi, bi0 + i, prob.shape, dropout_rate,
            )
            prob_d = (jnp.where(keep, prob, 0.0)
                      / (1.0 - dropout_rate)).astype(v.dtype)
            dprob = jax.lax.dot_general(dout, v, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            dprob = jnp.where(keep, dprob, 0.0) / (1.0 - dropout_rate)
            delta = jnp.sum(dprob * prob, axis=1, keepdims=True)
            dv = jax.lax.dot_general(prob_d, dout, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        else:
            dprob = jax.lax.dot_general(dout, v, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            delta = jnp.sum(dout.astype(jnp.float32) * out, axis=1,
                            keepdims=True)
            dv = jax.lax.dot_general(prob_lo, dout, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        dscores = (prob * (dprob - delta) * sm_scale)  # [T, T] f32
        ds_lo = dscores.astype(qu.dtype)

        dqu = jax.lax.dot_general(ds_lo, k, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds_lo, qu, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # ds2 arrives lane-REVERSED (ds2_rev[i, j] = ds2[i, P-1-j]); both
        # consumers absorb the flip: dqv contracts against p_rev, and dp is
        # emitted reversed (un-flipped in XLA by _vjp_bwd)
        ds2_rev = _unshift_bd_rev(dscores, p_len, tp, qu.dtype)  # [T, P]
        dqv = jax.lax.dot_general(ds2_rev, p_rev, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dp_rev = jax.lax.dot_general(ds2_rev, qv, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

        dqu_ref[i, 0] = dqu.astype(dqu_ref.dtype)
        dqv_ref[i, 0] = dqv.astype(dqv_ref.dtype)
        dk_ref[i, 0] = dk.astype(dk_ref.dtype)
        dv_ref[i, 0] = dv.astype(dv_ref.dtype)
        dprev_ref[...] += dp_rev[None].astype(dprev_ref.dtype)
        return carry

    jax.lax.fori_loop(0, nb, row, 0)


def _block_rows(b: int, tp: int, dk: int, itemsize: int, n_refs: int) -> int:
    """Batch rows per grid program: largest power-of-two divisor of B, up to
    8, that fits the ~16 MB VMEM budget.

    One (h, b) pair per program measured ~5-6 us of fixed per-grid-step cost
    against <1 us of work at the flagship shapes; batching rows amortizes
    it.  The row-scaled VMEM footprint is n_refs blocks of [nb, tp, dk],
    double-buffered by the pipeline, plus loop temporaries Mosaic keeps on
    the kernel stack (~2x in practice — an f32 forward at nb=8, Tp=384
    compiled to a 21 MB stack against the 16 MB limit), so the row budget
    is kept to 2.5 MB."""
    per_row = n_refs * tp * dk * itemsize
    cap = max(1, 2_500_000 // per_row)
    nb = 1
    while nb < 8 and nb * 2 <= cap and b % (nb * 2) == 0:
        nb *= 2
    return nb


def _specs(tp, p_len, dk, nb):
    # Mosaic requires the last two block dims divisible by (8, 128) or equal
    # to the array dims: kv_valid rides as [B, 1, Tp] and l/m as
    # [B, H, Tp, 1] so every block's trailing dims match the array's.
    # Grid is (H, B/nb) — batch innermost — so the bwd dp block (indexed by
    # the head alone) is revisited on CONSECUTIVE grid steps; accumulation
    # into a non-consecutively-revisited output block is undefined on real
    # TPUs (the pipeline writes the block out between visits).
    qspec = pl.BlockSpec((nb, 1, tp, dk), lambda hi, bi: (bi, hi, 0, 0))
    pspec = pl.BlockSpec((1, p_len, dk), lambda hi, bi: (hi, 0, 0))
    vspec = pl.BlockSpec((nb, 1, tp), lambda hi, bi: (bi, 0, 0))
    lspec = pl.BlockSpec((nb, 1, tp, 1), lambda hi, bi: (bi, hi, 0, 0))
    return qspec, pspec, vspec, lspec


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 8))
def rel_flash_attention(qu, qv, k, v, p, kv_valid, sm_scale: float,
                        seed=None, dropout_rate: float = 0.0):
    """Fused rel-pos attention.

    qu, qv, k, v: [B, H, Tp, dk]  (q + pos_bias_u, q + pos_bias_v, keys,
                  values; Tp padded to a multiple of 128)
    p:            [H, P, dk] projected rel-pos table with the original
                  2T-1 rows embedded so that row (Tp-1) is relative
                  position 0 (see rel_attention_pad_pos)
    kv_valid:     [B, Tp] int/bool key-validity mask
    seed:         int32 scalar/[] array — per-step dropout seed (traced);
                  ignored when dropout_rate == 0
    dropout_rate: static attention-prob dropout rate; the keep mask is a
                  pure hash of (seed, head, batch, i, j), identical across
                  forward and backward (dropout_keep_mask)
    Returns [B, H, Tp, dk] (query rows past the true T hold junk; callers
    mask them as the dense path does).
    """
    out, _, _ = _fwd_call(qu, qv, k, v, p, kv_valid, seed, sm_scale,
                          dropout_rate)
    return out


def _seed_arr(seed):
    if seed is None:
        return jnp.zeros((1,), jnp.int32)
    return jnp.asarray(seed, jnp.int32).reshape(1)


def _fwd_call(qu, qv, k, v, p, kv_valid, seed, sm_scale, dropout_rate):
    b, h, tp, dk = qu.shape
    p_len = p.shape[1]
    nb = _block_rows(b, tp, dk, qu.dtype.itemsize, n_refs=5)
    qspec, pspec, vspec, lspec = _specs(tp, p_len, dk, nb)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out, l, m = pl.pallas_call(
        functools.partial(_fwd_kernel, sm_scale=sm_scale,
                          dropout_rate=dropout_rate, nb=nb),
        grid=(h, b // nb),
        in_specs=[sspec, qspec, qspec, qspec, qspec, pspec, vspec],
        out_specs=[qspec, lspec, lspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, tp, dk), qu.dtype),
            jax.ShapeDtypeStruct((b, h, tp, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, h, tp, 1), jnp.float32),
        ],
        compiler_params=_fwd_params(),
        interpret=_interpret(),
    )(_seed_arr(seed), qu, qv, k, v, p, kv_valid[:, None, :])
    return out, l, m


def _fwd_params():
    # no cross-program accumulation in the forward: both grid dims are
    # embarrassingly parallel, let Mosaic pipeline freely
    if _interpret():
        return None
    return pltpu.CompilerParams(dimension_semantics=("parallel", "parallel"))


def _bwd_params():
    # dp accumulates across the batch (inner) grid axis -> arbitrary
    if _interpret():
        return None
    return pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary"))


def _vjp_fwd(qu, qv, k, v, p, kv_valid, sm_scale, seed, dropout_rate):
    out, l, m = _fwd_call(qu, qv, k, v, p, kv_valid, seed, sm_scale,
                          dropout_rate)
    return out, (qu, qv, k, v, p, kv_valid, seed, out, l, m)


def _vjp_bwd(sm_scale, dropout_rate, res, dout):
    qu, qv, k, v, p, kv_valid, seed, out, l, m = res
    b, h, tp, dk = qu.shape
    p_len = p.shape[1]
    nb = _block_rows(b, tp, dk, qu.dtype.itemsize, n_refs=10)
    qspec, pspec, vspec, lspec = _specs(tp, p_len, dk, nb)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    p_rev = p[:, ::-1, :]  # pre-reversed position table (XLA, cheap)
    dqu, dqv, dk_, dv, dp_rev = pl.pallas_call(
        functools.partial(_bwd_kernel, sm_scale=sm_scale,
                          dropout_rate=dropout_rate, nb=nb),
        grid=(h, b // nb),
        in_specs=[sspec, qspec, qspec, qspec, qspec, pspec, pspec, vspec,
                  qspec, lspec, lspec, qspec],
        out_specs=[qspec, qspec, qspec, qspec, pspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, tp, dk), qu.dtype),
            jax.ShapeDtypeStruct((b, h, tp, dk), qu.dtype),
            jax.ShapeDtypeStruct((b, h, tp, dk), k.dtype),
            jax.ShapeDtypeStruct((b, h, tp, dk), v.dtype),
            jax.ShapeDtypeStruct((h, p_len, dk), jnp.float32),
        ],
        compiler_params=_bwd_params(),
        interpret=_interpret(),
    )(_seed_arr(seed), qu, qv, k, v, p, p_rev, kv_valid[:, None, :],
      out, l, m, dout)
    # dp came back in reversed position coordinates
    return (dqu, dqv, dk_, dv, dp_rev[:, ::-1, :].astype(p.dtype), None, None)


rel_flash_attention.defvjp(_vjp_fwd, _vjp_bwd)


def rel_attention_pad_pos(p: jnp.ndarray, t: int, tp: int) -> jnp.ndarray:
    """Embed the dense path's [2T-1, H, dk] rel-pos projection into the
    kernel's [H, P, dk] padded table.

    The dense path indexes pos row (T-1) - (i - j) (models/transformer.py
    _rel_shift); the kernel indexes (Tp-1) - (i - j), so the original rows
    sit at offset Tp - T.  P is rounded up to a multiple of 128."""
    two_t_1, h, dk = p.shape
    t_orig = (two_t_1 + 1) // 2
    assert t_orig == t, (two_t_1, t)
    p_len = -(-(tp + t) // 128) * 128  # >= (Tp-1) + (T-1) + 1, 128-aligned
    out = jnp.zeros((h, p_len, dk), p.dtype)
    return jax.lax.dynamic_update_slice(
        out, jnp.moveaxis(p, 1, 0), (0, tp - t, 0)
    )
