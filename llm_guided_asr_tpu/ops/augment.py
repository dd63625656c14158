"""Waveform augmentations: speed perturbation (recipe stage-2 sox analog).

The reference applies sox speed 0.9/1.0/1.1 offline (asr.sh:579
perturb_data_dir_speed); here speed perturbation is linear resampling usable
either offline (numpy, for dataset preparation) or on-the-fly inside the
preprocessor (preprocessor.py speech aug hooks).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def speed_perturb(wav: np.ndarray, factor: float) -> np.ndarray:
    """Resample by 1/factor: factor > 1 -> faster (shorter) audio."""
    if factor == 1.0:
        return wav
    n = len(wav)
    out_n = int(round(n / factor))
    src = np.arange(out_n, dtype=np.float64) * factor
    i0 = np.floor(src).astype(np.int64)
    i1 = np.minimum(i0 + 1, n - 1)
    frac = (src - i0).astype(wav.dtype)
    return wav[i0] * (1 - frac) + wav[i1] * frac


def perturb_dataset_speeds(
    wav_scp_lines: Sequence[Tuple[str, np.ndarray]],
    factors: Sequence[float] = (0.9, 1.0, 1.1),
) -> Sequence[Tuple[str, np.ndarray]]:
    """Expand (uid, wav) pairs with sp{factor}- prefixed copies
    (perturb_data_dir_speed naming: 'sp0.9-<uid>')."""
    out = []
    for uid, wav in wav_scp_lines:
        for f in factors:
            new_uid = uid if f == 1.0 else f"sp{f}-{uid}"
            out.append((new_uid, speed_perturb(wav, f)))
    return out


class SpeedPerturbPreprocessor:
    """Wrap a preprocessor with random on-the-fly speed perturbation."""

    def __init__(self, inner=None, factors: Sequence[float] = (0.9, 1.0, 1.1), seed: int = 0):
        self.inner = inner
        self.factors = list(factors)
        self.rng = np.random.default_rng(seed)

    def __call__(self, uid: str, data: dict) -> dict:
        if self.inner is not None:
            data = self.inner(uid, data)
        if "speech" in data and not isinstance(data["speech"], str):
            f = self.factors[self.rng.integers(len(self.factors))]
            data = {**data, "speech": speed_perturb(np.asarray(data["speech"]), f)}
        return data
