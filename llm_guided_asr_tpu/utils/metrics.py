"""Edit-distance scoring: WER / CER (sclite stage-13 equivalent).

The reference shells out to SCTK sclite (asr.sh:1694); this is a native
Levenshtein aligner producing the same corpus-level error rates
(substitutions + deletions + insertions over reference length).
"""

from __future__ import annotations

import ctypes
import functools
import logging
import subprocess
from pathlib import Path
from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


@functools.lru_cache(maxsize=1)
def _native_lib():
    """Lazily build + load the C++ aligner (csrc/edit_distance.cpp); None on failure."""
    try:
        src = Path(__file__).resolve().parents[2] / "csrc" / "edit_distance.cpp"
        if not src.exists():
            return None
        build = Path(__file__).resolve().parent / "_build"
        build.mkdir(exist_ok=True)
        so = build / "edit_distance.so"
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", str(so), str(src)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(so))
        lib.edit_distance_i64.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        return lib
    except Exception as e:  # pragma: no cover - depends on toolchain
        logger.warning(f"native aligner unavailable, using python DP: {e}")
        return None


def _tokens_to_i64(seq: Sequence) -> np.ndarray:
    """Map arbitrary hashable tokens to int64 codes (shared per call site)."""
    return seq  # resolved in edit_distance below


def edit_distance(ref: Sequence, hyp: Sequence) -> Tuple[int, int, int, int]:
    """Returns (#sub, #del, #ins, #correct) of the optimal alignment."""
    lib = _native_lib()
    if lib is not None:
        vocab: Dict = {}
        enc = lambda s: np.array(
            [vocab.setdefault(t, len(vocab)) for t in s], dtype=np.int64
        )
        r = enc(ref)
        h = enc(hyp)
        out = np.zeros(4, np.int64)
        lib.edit_distance_i64(
            r.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(r),
            h.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(h),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return int(out[0]), int(out[1]), int(out[2]), int(out[3])
    return _edit_distance_py(ref, hyp)


def _edit_distance_py(ref: Sequence, hyp: Sequence) -> Tuple[int, int, int, int]:
    """Pure-python fallback DP."""
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


def align(ref: Sequence, hyp: Sequence) -> List[Tuple[str, object, object]]:
    """Optimal alignment as [(op, ref_tok, hyp_tok)]; op in C/S/D/I.

    Feeds the sclite-style per-utterance report (asr.sh:1694 writes
    result.txt via sclite -i rm -o all)."""
    n, m = len(ref), len(hyp)
    d = np.zeros((n + 1, m + 1), dtype=np.int32)
    d[:, 0] = np.arange(n + 1)
    d[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            sub = d[i - 1, j - 1] + (ref[i - 1] != hyp[j - 1])
            d[i, j] = min(sub, d[i - 1, j] + 1, d[i, j - 1] + 1)
    ops: List[Tuple[str, object, object]] = []
    i, j = n, m
    while i > 0 or j > 0:
        if i > 0 and j > 0 and d[i, j] == d[i - 1, j - 1] + (ref[i - 1] != hyp[j - 1]):
            ops.append(
                ("C" if ref[i - 1] == hyp[j - 1] else "S", ref[i - 1], hyp[j - 1])
            )
            i, j = i - 1, j - 1
        elif i > 0 and d[i, j] == d[i - 1, j] + 1:
            ops.append(("D", ref[i - 1], None))
            i -= 1
        else:
            ops.append(("I", None, hyp[j - 1]))
            j -= 1
    return ops[::-1]


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


def corpus_bleu(
    refs: Iterable[Sequence],
    hyps: Iterable[Sequence],
    max_n: int = 4,
) -> float:
    """Corpus-level BLEU-N with brevity penalty (the reference scores MT/ST
    with sacrebleu at stage 13 and reports training BLEU via
    espnet/nets/e2e_mt_common.py; this is the standard corpus formula over
    pre-tokenized sequences with sacrebleu's default exponential smoothing:
    an order with zero clipped matches contributes precision 1/2^k, k
    incremented per smoothed order — without it any corpus lacking a single
    4-gram match scores 0.0 where sacrebleu reports a nonzero value).

    refs/hyps: parallel iterables of token sequences (str.split() the text
    for word BLEU).  Returns BLEU in [0, 100].
    """
    import math
    from collections import Counter

    clipped = [0] * max_n
    totals = [0] * max_n
    ref_len = hyp_len = 0
    for ref, hyp in zip(refs, hyps):
        ref, hyp = list(ref), list(hyp)
        ref_len += len(ref)
        hyp_len += len(hyp)
        for n in range(1, max_n + 1):
            h_ngrams = Counter(
                tuple(hyp[i:i + n]) for i in range(len(hyp) - n + 1)
            )
            r_ngrams = Counter(
                tuple(ref[i:i + n]) for i in range(len(ref) - n + 1)
            )
            totals[n - 1] += max(len(hyp) - n + 1, 0)
            clipped[n - 1] += sum(
                min(c, r_ngrams[g]) for g, c in h_ngrams.items()
            )
    if hyp_len == 0 or any(t == 0 for t in totals):
        return 0.0
    # sacrebleu smooth_method='exp' (its default): each zero-match order n
    # gets precision 1 / (2^k * total_n), k = 1, 2, ... per smoothed order
    # (sacrebleu BLEU.compute_bleu: smooth_mteval *= 2;
    #  p_n = 100 / (smooth_mteval * total[n]))
    log_p = 0.0
    smooth = 1.0
    for c, t in zip(clipped, totals):
        if c == 0:
            smooth *= 2.0
            log_p += math.log(1.0 / (smooth * t))
        else:
            log_p += math.log(c / t)
    log_p /= max_n
    bp = 1.0 if hyp_len > ref_len else math.exp(1.0 - ref_len / hyp_len)
    return 100.0 * bp * math.exp(log_p)
