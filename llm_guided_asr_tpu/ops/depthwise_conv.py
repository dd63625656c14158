"""Depthwise 1-D convolution with a decomposed custom VJP.

The conformer conv module's depthwise conv is trivial compute (K shifted
multiply-adds) and the forward grouped conv is fast (17 us at [16, 312, 256]
k=31 on v5e) -- but XLA's *autodiff* gradients for it are catastrophic:
dw 0.69 ms / dx 0.84 ms per layer, 30-40x off memory-bound speed-of-light
and ~1/3 of the whole encoder backward.  Expressing the same math manually
is near-optimal (all measured on v5e):

    dx = depthwise_conv(dy, flip(w))          0.030 ms
    dw[k] = sum_{b,t} dy * shift(x, k)        0.019 ms (K-term unrolled loop)

so the custom VJP below simply rewrites the backward with those ops.  A
Pallas kernel variant was built and measured SLOWER (1.2 ms fwd+bwd: the 31
unaligned sublane slices relayout in VMEM); kept here (_pallas_fwd/_bwd,
enable via LLMASR_DWCONV_PALLAS=1) as the starting point if shapes change.

Layout: x [B, T, C], w [K, C], SAME zero padding (lax convention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _xla_conv(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w[:, None, :], (1,), "SAME",
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c,
    )


def _fwd_kernel(k_size: int, x_ref, w_ref, y_ref):
    t = y_ref.shape[1]
    acc = jnp.zeros(y_ref.shape[1:], jnp.float32)
    for k in range(k_size):
        acc += (
            x_ref[0, k : k + t, :].astype(jnp.float32)
            * w_ref[k, :].astype(jnp.float32)[None, :]
        )
    y_ref[0] = acc.astype(y_ref.dtype)


def _bwd_kernel(k_size: int, pad_r: int, dyp_ref, xp_ref, w_ref, dx_ref, dw_ref):
    from jax.experimental import pallas as pl

    t = dx_ref.shape[1]
    # dx[t] = sum_k dy[t + K-1-k - (K-1)] ... = correlation with flipped w:
    # with dy zero-padded by K-1-K//2 left / K//2 right,
    # dx[t] = sum_k dyp[t + k] * w[K-1-k]
    acc = jnp.zeros(dx_ref.shape[1:], jnp.float32)
    for k in range(k_size):
        acc += (
            dyp_ref[0, k : k + t, :].astype(jnp.float32)
            * w_ref[k_size - 1 - k, :].astype(jnp.float32)[None, :]
        )
    dx_ref[0] = acc.astype(dx_ref.dtype)

    # dw[k] = sum_{b,t} dy[t] * x[t + k - K//2]; xp is x padded by K//2
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dy = dyp_ref[0, pad_r : pad_r + t, :].astype(jnp.float32)
    for k in range(k_size):
        dw_ref[k, :] += jnp.sum(
            dy * xp_ref[0, k : k + t, :].astype(jnp.float32), axis=0
        )


def _pallas_fwd(x, w):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, c = x.shape
    k_size = w.shape[0]
    pad_l = (k_size - 1) // 2  # lax SAME convention (even kernels pad less left)
    pad_r = k_size - 1 - pad_l
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, k_size),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t + k_size - 1, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((k_size, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i: (i, 0, 0)),
    )(xp, w)


def _pallas_bwd(x, w, dy):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, c = x.shape
    k_size = w.shape[0]
    pad_l = (k_size - 1) // 2
    pad_r = k_size - 1 - pad_l
    # dy padded for the flipped correlation; x padded as in forward
    dyp = jnp.pad(dy, ((0, 0), (pad_r, pad_l), (0, 0)))
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))
    dx, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, k_size, pad_r),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, c), x.dtype),
            jax.ShapeDtypeStruct((k_size, c), jnp.float32),
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t + k_size - 1, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, t + k_size - 1, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((k_size, c), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((k_size, c), lambda i: (0, 0)),
        ),
    )(dyp, xp, w)
    return dx, dw.astype(w.dtype)


def _use_pallas(x, w) -> bool:
    import os

    if os.environ.get("LLMASR_DWCONV_PALLAS") != "1":
        return False  # decomposed XLA backward measured faster (module doc)
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    return (
        on_tpu
        and x.shape[-1] % 128 == 0
        and x.dtype in (jnp.float32, jnp.bfloat16)
        and w.shape[0] <= 64
    )


@jax.custom_vjp
def depthwise_conv1d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """[B, T, C], [K, C] -> [B, T, C] depthwise conv, SAME zero padding."""
    if _use_pallas(x, w):
        return _pallas_fwd(x, w)
    return _xla_conv(x, w)


def _vjp_fwd(x, w):
    return depthwise_conv1d(x, w), (x, w)


def _vjp_bwd(res, dy):
    x, w = res
    if _use_pallas(x, w):
        return _pallas_bwd(x, w, dy)
    # XLA fallback: dx = correlation with flipped kernel; dw via einsum
    k_size = w.shape[0]
    pad_l = (k_size - 1) // 2
    if k_size % 2 == 1:
        dx = _xla_conv(dy, w[::-1])
    else:
        # even kernel: SAME pads asymmetrically, so the adjoint needs the
        # mirrored padding done explicitly
        pad_r = k_size - 1 - pad_l
        dyp = jnp.pad(dy, ((0, 0), (pad_r, pad_l), (0, 0)))
        t = x.shape[1]
        dx = sum(
            dyp[:, m : m + t, :] * w[k_size - 1 - m][None, None, :]
            for m in range(k_size)
        )
    xp = jnp.pad(x, ((0, 0), (pad_l, k_size - 1 - pad_l), (0, 0)))
    t = x.shape[1]
    dw = jnp.stack(
        [
            jnp.sum(dy.astype(jnp.float32) * xp[:, k : k + t, :].astype(jnp.float32),
                    axis=(0, 1))
            for k in range(k_size)
        ]
    )
    return dx, dw.astype(w.dtype)


depthwise_conv1d.defvjp(_vjp_fwd, _vjp_bwd)
