"""Multichannel speech frontend math: WPE dereverberation + mask-based MVDR.

Rebuild of the reference's multichannel ``Frontend`` used inside
DefaultFrontend (espnet2/asr/frontend/default.py: optional WPE/MVDR between
STFT and log-mel; the underlying DSP lives in espnet2/enh/layers/wpe.py and
espnet2/enh/layers/dnn_beamformer.py):

- ``wpe_dereverb``: iterative weighted prediction-error dereverberation
  (Nara-WPE), vectorized over (batch, frequency) — per-frequency multichannel
  linear prediction with power-normalized least squares.
- ``mvdr_beamform``: mask-driven MVDR — speech/noise PSD matrices from
  time-frequency masks, w = (Phi_n^-1 Phi_s / tr(Phi_n^-1 Phi_s)) e_ref.

Everything is complex64 JAX on static shapes; matrix sizes are tiny
(channels x taps), so the work is batched einsums + solves, which XLA maps
onto the MXU as batched GEMMs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _stack_taps(y: jnp.ndarray, taps: int, delay: int) -> jnp.ndarray:
    """y: [..., C, T] -> delayed tap stack [..., C*taps, T].

    Tap k holds y[t - delay - k] (zeros before signal start).
    """
    outs = []
    for k in range(taps):
        shift = delay + k
        pad = jnp.zeros(y.shape[:-1] + (shift,), y.dtype)
        outs.append(jnp.concatenate([pad, y[..., :-shift]], axis=-1))
    return jnp.concatenate(outs, axis=-2)


def wpe_dereverb(
    y: jnp.ndarray,  # complex [B, F, C, T]
    taps: int = 5,
    delay: int = 3,
    iterations: int = 3,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """WPE dereverberation, returns the filtered signal [B, F, C, T]."""
    x = y

    def one_iter(x, _):
        # power (smoothed over channels) of the current estimate
        power = jnp.mean(jnp.abs(x) ** 2, axis=-2) + eps  # [B, F, T]
        ytil = _stack_taps(y, taps, delay)  # [B, F, C*taps, T]
        # R = ytil diag(1/lambda) ytil^H   [B, F, CT, CT]
        r = jnp.einsum("bfit,bft,bfjt->bfij", ytil, 1.0 / power, ytil.conj())
        # P = ytil diag(1/lambda) y^H      [B, F, CT, C]
        p = jnp.einsum("bfit,bft,bfjt->bfij", ytil, 1.0 / power, y.conj())
        eye = jnp.eye(r.shape[-1], dtype=r.dtype)
        g = jnp.linalg.solve(r + eps * eye, p)  # [B, F, CT, C]
        x_new = y - jnp.einsum("bfic,bfit->bfct", g.conj(), ytil)
        return x_new, None

    x, _ = jax.lax.scan(one_iter, x, None, length=iterations)
    return x


def psd_matrix(
    y: jnp.ndarray,  # complex [B, F, C, T]
    mask: jnp.ndarray,  # [B, F, T] in [0, 1]
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Mask-weighted cross-power spectral density [B, F, C, C]."""
    num = jnp.einsum("bft,bfct,bfdt->bfcd", mask.astype(y.dtype), y, y.conj())
    den = jnp.sum(mask, axis=-1)[:, :, None, None] + eps
    return num / den.astype(y.dtype)


def mvdr_beamform(
    y: jnp.ndarray,  # complex [B, F, C, T]
    mask_speech: jnp.ndarray,  # [B, F, T]
    mask_noise: jnp.ndarray,  # [B, F, T]
    ref_channel: int = 0,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Souden-MVDR enhanced single-channel STFT [B, F, T]."""
    phi_s = psd_matrix(y, mask_speech, eps)
    phi_n = psd_matrix(y, mask_noise, eps)
    c = y.shape[-2]
    eye = jnp.eye(c, dtype=y.dtype)
    num = jnp.linalg.solve(phi_n + eps * eye, phi_s)  # [B, F, C, C]
    trace = jnp.trace(num, axis1=-2, axis2=-1)[..., None]  # [B, F, 1]
    w = num[..., ref_channel] / (trace + eps)  # [B, F, C]
    return jnp.einsum("bfc,bfct->bft", w.conj(), y)
