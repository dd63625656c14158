"""Masked batch-norm core with a closed-form custom VJP.

The conformer conv module normalizes [B, T, C] activations with
padding-aware batch statistics (reference espnet2 conformer uses torch
BatchNorm1d on packed frames; here pads are masked out of the statistics,
models/conformer.py MaskedBatchNorm).  XLA's autodiff of the masked
two-pass mean/var produces a long chain of full-tensor f32 temporaries and
re-reductions that measured ~5 ms/step across 12 layers on v5e — far off
the roofline for ~2 MB of activations.  This op computes the standard
closed-form batch-norm backward in two fused reductions instead:

  x_hat = (x - mu) * rsqrt(var + eps)
  dgamma = sum_valid(dy * x_hat)        dbeta = sum_valid(dy)
  dx_valid = gamma * inv * (dy - dbeta/n - x_hat * dgamma/n)
  dx_pad   = gamma * inv * dy           (pads don't contribute to stats)

Statistics are per-feature over all VALID (batch, time) positions; pad
positions are still normalized (with the batch stats) so downstream ops
see finite values, matching the reference module's behavior.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


@jax.custom_vjp
def masked_batch_norm(
    x: jnp.ndarray,  # [B, T, C]
    valid: jnp.ndarray,  # [B, T] bool
    scale: jnp.ndarray,  # [C]
    bias: jnp.ndarray,  # [C]
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Training-mode masked BN. Returns (y, mean, var); mean/var feed the
    running-stat update only and carry no gradient."""
    y, mean, var, _ = _fwd_core(x, valid, scale, bias, eps)
    return y, mean, var


def _fwd_core(x, valid, scale, bias, eps):
    m = valid[..., None].astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m), 1.0)
    xf = x.astype(jnp.float32)
    xm = xf * m
    s1 = jnp.sum(xm, axis=(0, 1))
    s2 = jnp.sum(xm * xf, axis=(0, 1))  # mask is idempotent: xm * xf == m*x^2
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    y = (xf - mean) * (inv * scale) + bias
    return y.astype(x.dtype), mean, var, (n, inv)


def _vjp_fwd(x, valid, scale, bias, eps):
    y, mean, var, (n, inv) = _fwd_core(x, valid, scale, bias, eps)
    return (y, mean, var), (x, valid, scale, mean, inv, n)


def _vjp_bwd(res, cts):
    dy_out, _dmean, _dvar = cts  # running-stat outputs carry no gradient
    x, valid, scale, mean, inv, n = res
    m = valid[..., None].astype(jnp.float32)
    dy = dy_out.astype(jnp.float32)
    x_hat = (x.astype(jnp.float32) - mean) * inv
    # every position's y (pads included) reads mean/var/scale/bias, so the
    # reductions run over ALL positions; the mask only gates which x_q feel
    # the gradient flowing back through the statistics
    dbeta = jnp.sum(dy, axis=(0, 1))
    dgamma = jnp.sum(dy * x_hat, axis=(0, 1))
    dx = (scale * inv) * (dy - m * (dbeta / n + x_hat * (dgamma / n)))
    return dx.astype(dy_out.dtype), None, dgamma, dbeta, None


masked_batch_norm.defvjp(_vjp_fwd, _vjp_bwd)
