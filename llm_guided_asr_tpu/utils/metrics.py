"""Edit-distance scoring: WER / CER (sclite stage-13 equivalent).

The reference shells out to SCTK sclite (asr.sh:1694); this is a native
Levenshtein aligner producing the same corpus-level error rates
(substitutions + deletions + insertions over reference length).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np


def edit_distance(ref: Sequence, hyp: Sequence) -> Tuple[int, int, int, int]:
    """Returns (#sub, #del, #ins, #correct) of the optimal alignment."""
    n, m = len(ref), len(hyp)
    # DP over cost, tracking op counts via backtrace
    d = np.zeros((n + 1, m + 1), dtype=np.int32)
    d[:, 0] = np.arange(n + 1)
    d[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            sub = d[i - 1, j - 1] + (ref[i - 1] != hyp[j - 1])
            d[i, j] = min(sub, d[i - 1, j] + 1, d[i, j - 1] + 1)
    # backtrace
    i, j = n, m
    n_sub = n_del = n_ins = n_cor = 0
    while i > 0 or j > 0:
        if i > 0 and j > 0 and d[i, j] == d[i - 1, j - 1] + (ref[i - 1] != hyp[j - 1]):
            if ref[i - 1] == hyp[j - 1]:
                n_cor += 1
            else:
                n_sub += 1
            i, j = i - 1, j - 1
        elif i > 0 and d[i, j] == d[i - 1, j] + 1:
            n_del += 1
            i -= 1
        else:
            n_ins += 1
            j -= 1
    return n_sub, n_del, n_ins, n_cor


def error_rate(refs: Iterable[Sequence], hyps: Iterable[Sequence]) -> Dict[str, float]:
    """Corpus-level error rate over pre-split sequences."""
    tot_s = tot_d = tot_i = tot_c = tot_ref = 0
    n_utt = 0
    for ref, hyp in zip(refs, hyps):
        s, d, i, c = edit_distance(list(ref), list(hyp))
        tot_s += s
        tot_d += d
        tot_i += i
        tot_c += c
        tot_ref += len(ref)
        n_utt += 1
    denom = max(tot_ref, 1)
    return {
        "err": 100.0 * (tot_s + tot_d + tot_i) / denom,
        "sub": 100.0 * tot_s / denom,
        "del": 100.0 * tot_d / denom,
        "ins": 100.0 * tot_i / denom,
        "n_ref": tot_ref,
        "n_utt": n_utt,
    }


def wer(refs: Iterable[str], hyps: Iterable[str]) -> float:
    return error_rate((r.split() for r in refs), (h.split() for h in hyps))["err"]


def cer(refs: Iterable[str], hyps: Iterable[str]) -> float:
    strip = lambda s: list(s.replace(" ", ""))
    return error_rate((strip(r) for r in refs), (strip(h) for h in hyps))["err"]
