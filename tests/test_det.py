"""EER / minDCF detection metrics (reference: espnet2/utils/eer.py +
spk_trainer.py:193-215)."""

import numpy as np
import pytest

from llm_guided_asr_tpu.utils.det import (
    det_curve,
    eer,
    min_dcf,
    verification_report,
)


def _brute_min_dcf(scores, labels, p_target=0.05, c_miss=1.0, c_fa=1.0):
    """O(n^2) reference: evaluate the DCF at every score threshold."""
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels)
    best = np.inf
    for t in scores:
        accept = scores >= t
        fnr = np.mean(~accept[labels == 1])
        fpr = np.mean(accept[labels == 0])
        best = min(best, c_miss * fnr * p_target + c_fa * fpr * (1 - p_target))
    return best / min(c_miss * p_target, c_fa * (1 - p_target))


def test_det_curve_monotone_and_endpoints():
    rng = np.random.default_rng(0)
    scores = rng.normal(size=200)
    labels = (rng.random(200) < 0.4).astype(int)
    fnr, fpr, thr = det_curve(scores, labels)
    assert np.all(np.diff(fnr) >= 0) and np.all(np.diff(fpr) <= 0)
    assert fnr[0] == 0.0 and fpr[0] == 1.0  # lowest threshold accepts all
    assert np.all(np.diff(thr) >= 0)


def test_eer_separable_and_random():
    # perfectly separable: EER 0
    scores = np.array([0.9, 0.8, 0.7, 0.2, 0.1])
    labels = np.array([1, 1, 1, 0, 0])
    rate, thr = eer(scores, labels)
    assert rate == 0.0
    assert 0.2 < thr <= 0.7
    # anti-separable: EER 1
    rate, _ = eer(scores, 1 - labels)
    assert rate == pytest.approx(1.0)
    # random scores -> EER near 0.5
    rng = np.random.default_rng(1)
    rate, _ = eer(rng.normal(size=4000), (rng.random(4000) < 0.5).astype(int))
    assert 0.45 < rate < 0.55


def test_eer_matches_crossing_definition():
    rng = np.random.default_rng(2)
    labels = (rng.random(500) < 0.3).astype(int)
    scores = rng.normal(size=500) + labels * 1.5
    rate, thr = eer(scores, labels)
    # at the returned threshold, fnr ~ fpr ~ rate
    accept = scores >= thr
    fnr = np.mean(~accept[labels == 1])
    fpr = np.mean(accept[labels == 0])
    assert abs(fnr - fpr) < 0.05
    assert abs(rate - (fnr + fpr) / 2) < 0.05


def test_min_dcf_matches_bruteforce():
    rng = np.random.default_rng(3)
    for _ in range(5):
        n = 120
        labels = (rng.random(n) < 0.35).astype(int)
        if labels.sum() in (0, n):
            continue
        scores = rng.normal(size=n) + labels * rng.uniform(0.5, 2.0)
        got, _ = min_dcf(scores, labels)
        want = _brute_min_dcf(scores, labels)
        assert got == pytest.approx(want, abs=1e-12)


def test_verification_report_fields():
    rng = np.random.default_rng(4)
    labels = (rng.random(300) < 0.5).astype(int)
    scores = rng.normal(size=300) + labels * 2.0
    rep = verification_report(scores, labels)
    assert set(rep) >= {"eer", "mindcf", "n_trials", "trg_mean", "nontrg_mean"}
    assert 0.0 <= rep["eer"] <= 100.0 and rep["trg_mean"] > rep["nontrg_mean"]
    assert rep["n_trials"] == 300


def test_degenerate_inputs_raise():
    with pytest.raises(ValueError):
        det_curve([], [])
    with pytest.raises(ValueError):
        det_curve([0.1, 0.2], [1, 1])  # no nontargets
    with pytest.raises(ValueError):
        det_curve([0.1, 0.2], [1, 2])  # bad label


def test_trial_scoring_with_labels(tmp_path):
    from llm_guided_asr_tpu.bin.spk_embed_extract import score_trials

    rng = np.random.default_rng(5)
    # two speakers, clustered embeddings
    centers = {"a": rng.normal(size=8), "b": rng.normal(size=8)}
    scp = tmp_path / "embed.scp"
    lines = []
    uids = []
    for spk in ("a", "b"):
        for i in range(4):
            uid = f"{spk}{i}"
            emb = centers[spk] + 0.05 * rng.normal(size=8)
            np.save(tmp_path / f"{uid}.npy", emb)
            lines.append(f"{uid} {tmp_path / (uid + '.npy')}\n")
            uids.append(uid)
    scp.write_text("".join(lines))
    trials = tmp_path / "trials"
    with open(trials, "w") as f:
        f.write("a0 a1 target\na2 a3 1\nb0 b1 target\n")
        f.write("a0 b0 nontarget\na1 b2 0\nb3 a3 nontarget\n")
    rep = score_trials(str(scp), str(trials), str(tmp_path / "scores.txt"))
    assert rep is not None and rep["eer"] == 0.0 and rep["mindcf"] == 0.0
    out = (tmp_path / "scores.txt").read_text().splitlines()
    assert len(out) == 6
    assert (tmp_path / "verification_result.txt").exists()
