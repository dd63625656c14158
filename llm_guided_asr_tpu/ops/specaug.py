"""SpecAugment as pure jittable functions of an explicit PRNG key.

Rebuild of espnet2/asr/specaug/specaug.py:10 (TimeWarp layers/time_warp.py:50,
MaskAlongAxis / MaskAlongAxisVariableMaxWidth layers/mask_along_axis.py:71,132).

Everything is static-shape: masks are built with ``broadcasted_iota`` compares
rather than dynamic slicing, so the whole augmentation fuses into a handful of
VPU elementwise ops under jit.  Time warp uses linear resampling (the reference
defaults to bicubic torch.interpolate; linear is an intentional, documented
deviation — it is an *augmentation*, not an inference-path op).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SpecAugConfig:
    apply_time_warp: bool = True
    time_warp_window: int = 5
    apply_freq_mask: bool = True
    freq_mask_width_range: Tuple[int, int] = (0, 20)
    num_freq_mask: int = 2
    apply_time_mask: bool = True
    time_mask_width_range: Optional[Tuple[int, int]] = None
    time_mask_width_ratio_range: Optional[Tuple[float, float]] = None
    num_time_mask: int = 2

    @classmethod
    def from_dict(cls, d: dict) -> "SpecAugConfig":
        d = dict(d)
        d.pop("time_warp_mode", None)  # interpolation mode: always linear here
        for k in ("freq_mask_width_range", "time_mask_width_range", "time_mask_width_ratio_range"):
            if d.get(k) is not None:
                d[k] = tuple(d[k])
        return cls(**d)


def _mask_along_axis(
    key: jax.Array,
    feats: jnp.ndarray,
    widths: jnp.ndarray,
    axis_len: int,
    axis: int,
    num_masks: int,
) -> jnp.ndarray:
    """Apply ``num_masks`` random contiguous zero-masks along ``axis``.

    widths: [B, num_masks] integer mask widths (already sampled).
    """
    b = feats.shape[0]
    key_pos = key
    # Start positions uniform in [0, axis_len - width].
    u = jax.random.uniform(key_pos, (b, num_masks))
    starts = (u * (axis_len - widths + 1).astype(jnp.float32)).astype(jnp.int32)
    pos = jnp.arange(axis_len)  # [L]
    # [B, num_masks, L]: inside any mask?
    inside = (pos[None, None, :] >= starts[..., None]) & (
        pos[None, None, :] < (starts + widths)[..., None]
    )
    masked = jnp.any(inside, axis=1)  # [B, L]
    if axis == 1:  # time
        masked = masked[:, :, None]
    else:  # freq
        masked = masked[:, None, :]
    return jnp.where(masked, 0.0, feats)


def time_warp(
    key: jax.Array, feats: jnp.ndarray, lengths: jnp.ndarray, window: int = 5
) -> jnp.ndarray:
    """Per-utterance random time warp with linear resampling (time_warp.py:50).

    A random center c in [window, len-window) is moved to c + U[-window, window];
    frames are linearly re-sampled on both sides of the split.
    """
    b, t, _ = feats.shape
    k1, k2 = jax.random.split(key)
    lens = lengths.astype(jnp.float32)
    lo = jnp.asarray(float(window))
    hi = jnp.maximum(lens - window, lo + 1.0)
    center = lo + jax.random.uniform(k1, (b,)) * (hi - lo)
    shift = jax.random.uniform(k2, (b,), minval=-float(window), maxval=float(window))
    warped = jnp.clip(center + shift, 1.0, lens - 1.0)

    pos = jnp.arange(t, dtype=jnp.float32)[None, :]  # output frame index
    c = center[:, None]
    w = warped[:, None]
    ln = lens[:, None]
    # piecewise-linear inverse map: out [0,w) <- in [0,c); out [w,len) <- in [c,len)
    src = jnp.where(
        pos < w,
        pos * c / jnp.maximum(w, 1e-6),
        c + (pos - w) * (ln - c) / jnp.maximum(ln - w, 1e-6),
    )
    src = jnp.clip(src, 0.0, t - 1.0)
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, t - 1)
    frac = (src - i0.astype(jnp.float32))[..., None]
    g0 = jnp.take_along_axis(feats, i0[..., None], axis=1)
    g1 = jnp.take_along_axis(feats, i1[..., None], axis=1)
    out = g0 * (1.0 - frac) + g1 * frac
    # only warp valid region; keep padding untouched
    valid = pos < ln
    return jnp.where(valid[..., None], out, feats)


def specaug(
    key: jax.Array,
    feats: jnp.ndarray,
    lengths: jnp.ndarray,
    cfg: SpecAugConfig,
) -> jnp.ndarray:
    """[B, T, F] log-mel -> augmented log-mel (same shape)."""
    b, t, f = feats.shape
    k_warp, k_fw, k_fp, k_tw, k_tp = jax.random.split(key, 5)

    if cfg.apply_time_warp:
        feats = time_warp(k_warp, feats, lengths, cfg.time_warp_window)

    if cfg.apply_freq_mask:
        w0, w1 = cfg.freq_mask_width_range
        widths = jax.random.randint(k_fw, (b, cfg.num_freq_mask), w0, w1 + 1)
        widths = jnp.minimum(widths, f)
        feats = _mask_along_axis(k_fp, feats, widths, f, axis=2, num_masks=cfg.num_freq_mask)

    if cfg.apply_time_mask:
        if cfg.time_mask_width_ratio_range is not None:
            r0, r1 = cfg.time_mask_width_ratio_range
            ratios = jax.random.uniform(
                k_tw, (b, cfg.num_time_mask), minval=r0, maxval=r1
            )
            widths = (ratios * lengths[:, None].astype(jnp.float32)).astype(jnp.int32)
        else:
            w0, w1 = cfg.time_mask_width_range or (0, 40)
            widths = jax.random.randint(k_tw, (b, cfg.num_time_mask), w0, w1 + 1)
        widths = jnp.minimum(widths, t)
        feats = _mask_along_axis(k_tp, feats, widths, t, axis=1, num_masks=cfg.num_time_mask)

    return feats
