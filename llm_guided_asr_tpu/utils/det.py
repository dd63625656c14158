"""Detection-error metrics for speaker verification: EER and minDCF.

Reference: espnet2/utils/eer.py (tuneThresholdfromScore / ComputeErrorRates /
ComputeMinDcf, used by espnet2/train/spk_trainer.py:193-215 for validation
EER/minDCF with NIST SRE'16 parameters p_target=0.05, c_miss=c_fa=1).

This is a vectorized re-derivation, not a port: error curves come from a
single argsort + cumulative sums over the score-sorted trials (the reference
loops in Python over every threshold), and EER is the exact crossing point of
the interpolated DET curve rather than the nearest sampled threshold.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np


def det_curve(
    scores: Sequence[float], labels: Sequence[int]
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """False-negative / false-positive rates at every candidate threshold.

    Thresholds are the sorted trial scores; at threshold t a trial is
    accepted iff score >= t. Returns (fnr, fpr, thresholds) with fnr
    non-decreasing and fpr non-increasing in the threshold.
    """
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels, np.int64)
    if scores.shape != labels.shape or scores.ndim != 1 or scores.size == 0:
        raise ValueError("scores and labels must be equal-length 1-D, non-empty")
    if not np.isin(labels, (0, 1)).all():
        raise ValueError("labels must be 0 (nontarget) or 1 (target)")
    n_target = int(labels.sum())
    n_nontarget = labels.size - n_target
    if n_target == 0 or n_nontarget == 0:
        raise ValueError("need at least one target and one nontarget trial")

    order = np.argsort(scores, kind="stable")
    thresholds = scores[order]
    sorted_labels = labels[order]
    # accepting iff score >= thresholds[i]: targets strictly below i are
    # misses; nontargets at i or above are false accepts.
    misses = np.concatenate(([0], np.cumsum(sorted_labels)[:-1]))
    false_accepts = n_nontarget - np.concatenate(
        ([0], np.cumsum(1 - sorted_labels)[:-1])
    )
    fnr = misses / n_target
    fpr = false_accepts / n_nontarget
    return fnr, fpr, thresholds


def eer(scores: Sequence[float], labels: Sequence[int]) -> Tuple[float, float]:
    """Equal error rate (fraction, not %) and its threshold.

    The DET curve is piecewise constant; the exact EER is where the linear
    interpolation of (fnr - fpr) crosses zero between adjacent thresholds.
    """
    fnr, fpr, thr = det_curve(scores, labels)
    diff = fnr - fpr  # monotone non-decreasing
    i = int(np.searchsorted(diff > 0, True))
    if i == 0:
        return float(max(fnr[0], fpr[0])), float(thr[0])
    if i == len(diff):
        return float(max(fnr[-1], fpr[-1])), float(thr[-1])
    d0, d1 = diff[i - 1], diff[i]
    w = 0.0 if d1 == d0 else float(-d0 / (d1 - d0))
    rate = float(fnr[i - 1] + w * (fnr[i] - fnr[i - 1]))
    threshold = float(thr[i - 1] + w * (thr[i] - thr[i - 1]))
    return rate, threshold


def min_dcf(
    scores: Sequence[float],
    labels: Sequence[int],
    p_target: float = 0.05,
    c_miss: float = 1.0,
    c_fa: float = 1.0,
) -> Tuple[float, float]:
    """Normalized minimum detection cost (NIST SRE'16 eq. 2-4) + threshold."""
    fnr, fpr, thr = det_curve(scores, labels)
    cost = c_miss * fnr * p_target + c_fa * fpr * (1.0 - p_target)
    i = int(np.argmin(cost))
    norm = min(c_miss * p_target, c_fa * (1.0 - p_target))
    return float(cost[i] / norm), float(thr[i])


def verification_report(
    scores: Sequence[float],
    labels: Sequence[int],
    p_target: float = 0.05,
    c_miss: float = 1.0,
    c_fa: float = 1.0,
) -> Dict[str, float]:
    """EER/minDCF + score statistics (the spk_trainer validation stats)."""
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels, np.int64)
    rate, thr_eer = eer(scores, labels)
    dcf, thr_dcf = min_dcf(scores, labels, p_target, c_miss, c_fa)
    trg = scores[labels == 1]
    non = scores[labels == 0]
    return {
        "eer": rate * 100.0,  # percent, as the reference reports it
        "eer_threshold": thr_eer,
        "mindcf": dcf,
        "mindcf_threshold": thr_dcf,
        "n_trials": float(scores.size),
        "trg_mean": float(trg.mean()),
        "trg_std": float(trg.std()),
        "nontrg_mean": float(non.mean()),
        "nontrg_std": float(non.std()),
    }
