#!/usr/bin/env python3
"""Separation scoring CLI (espnet2/bin/enh_scoring.py analog).

Scores estimated sources against references with permutation-resolved
SI-SNR (and raw SNR), writing per-utterance and average results.

Usage: --ref_scps ref1.scp,ref2.scp --est_scps est1.scp,est2.scp
"""

from __future__ import annotations

import itertools
import logging
import sys
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)


def _si_snr(ref: np.ndarray, est: np.ndarray, eps: float = 1e-8) -> float:
    ref = ref - ref.mean()
    est = est - est.mean()
    proj = np.dot(est, ref) / (np.dot(ref, ref) + eps) * ref
    noise = est - proj
    return float(10 * np.log10((np.dot(proj, proj) + eps) / (np.dot(noise, noise) + eps)))


def _snr(ref: np.ndarray, est: np.ndarray, eps: float = 1e-8) -> float:
    noise = est - ref
    return float(10 * np.log10((np.dot(ref, ref) + eps) / (np.dot(noise, noise) + eps)))


def score(output_dir: str, ref_scps, est_scps):
    from llm_guided_asr_tpu.data.fileio import SoundScpReader

    refs = [SoundScpReader(p) for p in ref_scps]
    ests = [SoundScpReader(p) for p in est_scps]
    assert len(refs) == len(ests), "need as many est scps as ref scps"
    s = len(refs)
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    per_utt = open(out / "si_snr_per_utt", "w")
    totals = []
    n_skipped = 0
    for uid in refs[0].keys():
        if any(uid not in rd.keys() for rd in refs) or any(
            uid not in ed.keys() for ed in ests
        ):
            logger.warning(f"{uid}: missing in a ref/est scp; skipped")
            n_skipped += 1
            continue
        r = [np.asarray(rd[uid][1], np.float64) for rd in refs]
        e = [np.asarray(ed[uid][1], np.float64) for ed in ests]
        n = min(min(len(x) for x in r), min(len(x) for x in e))
        r = [x[:n] for x in r]
        e = [x[:n] for x in e]
        # permutation-resolved (PIT scoring, like the reference's
        # si_snr with perm search)
        best = None
        for perm in itertools.permutations(range(s)):
            val = np.mean([_si_snr(r[i], e[perm[i]]) for i in range(s)])
            if best is None or val > best[0]:
                best = (val, perm)
        si, perm = best
        snr = np.mean([_snr(r[i], e[perm[i]]) for i in range(s)])
        per_utt.write(f"{uid} si_snr={si:.3f} snr={snr:.3f} perm={list(perm)}\n")
        totals.append((si, snr))
    per_utt.close()
    if totals:
        avg_si = float(np.mean([t[0] for t in totals]))
        avg_snr = float(np.mean([t[1] for t in totals]))
    else:
        avg_si = avg_snr = float("nan")
    (out / "result.txt").write_text(
        f"utts {len(totals)}\nSI-SNR {avg_si:.3f}\nSNR {avg_snr:.3f}\n"
    )
    logger.info(f"scored {len(totals)} utts: SI-SNR {avg_si:.3f} dB")
    return avg_si


def main(cmd=None):
    from llm_guided_asr_tpu.utils.config import build_config

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "output_dir": "enh_scored",
        "ref_scps": None,  # comma-separated
        "est_scps": None,
    })
    logging.basicConfig(level=logging.INFO)
    ref = config["ref_scps"]
    est = config["est_scps"]
    ref = ref.split(",") if isinstance(ref, str) else list(ref)
    est = est.split(",") if isinstance(est, str) else list(est)
    return score(config["output_dir"], ref, est)


if __name__ == "__main__":
    main()
