"""RWKV WKV linear-attention recurrence: Pallas TPU kernel + scan reference.

TPU-native equivalent of the reference's only CUDA kernel
(espnet2/asr_transducer/decoder/modules/rwkv/cuda/wkv_cuda.cu:9-30, JIT-built
via torch.utils.cpp_extension at rwkv/attention.py:139).  The recurrence with
running-max log normalization, per time step t and channel c:

    ww = u + k[t];  q = max(pp, ww); e1 = exp(pp-q); e2 = exp(ww-q)
    y[t] = (e1*aa + e2*v[t]) / (e1*bb + e2)
    ww = pp + w;    q = max(ww, k[t]); e1 = exp(ww-q); e2 = exp(k[t]-q)
    aa = e1*aa + e2*v[t]; bb = e1*bb + e2; pp = q

with w = -exp(time_decay) <= 0 and u = time_first.

Three implementations with identical numerics:
- ``wkv_scan``: lax.scan — differentiable, used for training;
- ``wkv_pallas``: Pallas kernel — the whole [T, C] tile lives in VMEM and the
  time loop runs on-core (one HBM round-trip per sequence instead of per
  step), used on TPU for inference;
- ``wkv``: custom_vjp front door — Pallas forward on TPU, scan-VJP backward.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

WKVState = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # (aa, bb, pp) each [B, C]


def wkv_init_state(batch: int, channels: int) -> WKVState:
    return (
        jnp.zeros((batch, channels), jnp.float32),
        jnp.zeros((batch, channels), jnp.float32),
        jnp.full((batch, channels), -1e38, jnp.float32),
    )


def wkv_scan(
    w: jnp.ndarray,  # [C] (negative decay, = -exp(time_decay))
    u: jnp.ndarray,  # [C]
    k: jnp.ndarray,  # [B, T, C]
    v: jnp.ndarray,  # [B, T, C]
    state: WKVState = None,
) -> Tuple[jnp.ndarray, WKVState]:
    b, t, c = k.shape
    if state is None:
        state = wkv_init_state(b, c)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    def step(carry, kv):
        aa, bb, pp = carry
        kt, vt = kv
        ww = u + kt
        q = jnp.maximum(pp, ww)
        e1 = jnp.exp(pp - q)
        e2 = jnp.exp(ww - q)
        y = (e1 * aa + e2 * vt) / (e1 * bb + e2)
        ww2 = pp + w
        q2 = jnp.maximum(ww2, kt)
        e1b = jnp.exp(ww2 - q2)
        e2b = jnp.exp(kt - q2)
        return (e1b * aa + e2b * vt, e1b * bb + e2b, q2), y

    (aa, bb, pp), ys = jax.lax.scan(
        step, state, (jnp.moveaxis(kf, 1, 0), jnp.moveaxis(vf, 1, 0))
    )
    return jnp.moveaxis(ys, 0, 1).astype(k.dtype), (aa, bb, pp)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _wkv_kernel(w_ref, u_ref, k_ref, v_ref, aa0_ref, bb0_ref, pp0_ref,
                y_ref, aa_ref, bb_ref, pp_ref):
    # blocks: w/u/aa/bb/pp [1, C]; k/v/y [1, T, C]
    t_max = k_ref.shape[1]
    w = w_ref[:]  # [1, C]
    u = u_ref[:]

    def body(t, carry):
        aa, bb, pp = carry
        kt = k_ref[0, t, :][None, :]
        vt = v_ref[0, t, :][None, :]
        ww = u + kt
        q = jnp.maximum(pp, ww)
        e1 = jnp.exp(pp - q)
        e2 = jnp.exp(ww - q)
        y_ref[0, t, :] = ((e1 * aa + e2 * vt) / (e1 * bb + e2))[0]
        ww2 = pp + w
        q2 = jnp.maximum(ww2, kt)
        e1b = jnp.exp(ww2 - q2)
        e2b = jnp.exp(kt - q2)
        return (e1b * aa + e2b * vt, e1b * bb + e2b, q2)

    aa, bb, pp = jax.lax.fori_loop(
        0, t_max, body, (aa0_ref[0], bb0_ref[0], pp0_ref[0])
    )
    aa_ref[0] = aa
    bb_ref[0] = bb
    pp_ref[0] = pp


def wkv_pallas(
    w: jnp.ndarray, u: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    state: WKVState = None,
) -> Tuple[jnp.ndarray, WKVState]:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, c = k.shape
    if state is None:
        state = wkv_init_state(b, c)
    aa0, bb0, pp0 = (s.reshape(b, 1, c) for s in state)
    w2 = jnp.broadcast_to(w.astype(jnp.float32)[None, :], (1, c))
    u2 = jnp.broadcast_to(u.astype(jnp.float32)[None, :], (1, c))

    grid = (b,)
    bspec_c = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bspec_state = pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    kernel = pl.pallas_call(
        _wkv_kernel,
        grid=grid,
        in_specs=[
            bspec_c,  # w
            bspec_c,  # u
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            bspec_state,  # aa0
            bspec_state,  # bb0
            bspec_state,  # pp0
        ],
        out_specs=[
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            bspec_state,
            bspec_state,
            bspec_state,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
    )
    y, aa, bb, pp = kernel(
        w2, u2, k.astype(jnp.float32), v.astype(jnp.float32), aa0, bb0, pp0
    )
    return y.astype(k.dtype), (aa[:, 0], bb[:, 0], pp[:, 0])


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


@jax.custom_vjp
def wkv(w, u, k, v):
    """WKV forward (Pallas on TPU, scan elsewhere); differentiable."""
    if _on_tpu():
        y, _ = wkv_pallas(w, u, k, v)
    else:
        y, _ = wkv_scan(w, u, k, v)
    return y


def _wkv_fwd(w, u, k, v):
    return wkv(w, u, k, v), (w, u, k, v)


def _wkv_bwd(res, g):
    w, u, k, v = res
    _, vjp = jax.vjp(lambda *a: wkv_scan(*a)[0], w, u, k, v)
    return vjp(g)


wkv.defvjp(_wkv_fwd, _wkv_bwd)
