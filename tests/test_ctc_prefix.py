"""CTC prefix scorer vs brute-force path enumeration on tiny inputs."""

import itertools

import jax.numpy as jnp
import numpy as np

from llm_guided_asr_tpu.search.ctc_prefix import (
    ctc_prefix_init,
    ctc_prefix_scores,
    ctc_prefix_select,
)

BLANK = 0


def collapse(path):
    out = []
    prev = None
    for p in path:
        if p != BLANK and p != prev:
            out.append(p)
        prev = p
    return tuple(out)


def brute_prefix_logprob(logp, prefix):
    """log sum of P(path) over paths whose collapse STARTS WITH prefix."""
    T, V = logp.shape
    total = -np.inf
    for path in itertools.product(range(V), repeat=T):
        c = collapse(path)
        if c[: len(prefix)] == tuple(prefix):
            lp = sum(logp[t, path[t]] for t in range(T))
            total = np.logaddexp(total, lp)
    return total


def brute_complete_logprob(logp, seq):
    T, V = logp.shape
    total = -np.inf
    for path in itertools.product(range(V), repeat=T):
        if collapse(path) == tuple(seq):
            lp = sum(logp[t, path[t]] for t in range(T))
            total = np.logaddexp(total, lp)
    return total


def make_logp(T=4, V=4, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((T, V))
    return (logits - np.log(np.exp(logits).sum(-1, keepdims=True))).astype(np.float32)


def test_first_step_scores_match_bruteforce():
    T, V = 4, 4
    logp = make_logp(T, V)
    K = 2
    state = ctc_prefix_init(jnp.asarray(logp), jnp.asarray(T), beam=K)
    cand = jnp.asarray([[1, 2, 3], [1, 2, 3]])
    psi, r_new = ctc_prefix_scores(jnp.asarray(logp), jnp.asarray(T), state, cand)
    for w, c in enumerate([1, 2, 3]):
        expect = brute_prefix_logprob(logp, (c,))
        np.testing.assert_allclose(float(psi[0, w]), expect, rtol=1e-4, atol=1e-5)


def test_second_step_and_state_chaining():
    T, V = 5, 4
    logp = make_logp(T, V, seed=1)
    K = 1
    state = ctc_prefix_init(jnp.asarray(logp), jnp.asarray(T), beam=K)
    cand1 = jnp.asarray([[2]])
    psi1, r1 = ctc_prefix_scores(jnp.asarray(logp), jnp.asarray(T), state, cand1)
    state2 = ctc_prefix_select(r1, psi1, cand1, jnp.asarray([0]), jnp.asarray([0]))
    # extend with each candidate incl. repeated token (2,2) which needs a blank
    cand2 = jnp.asarray([[1, 2, 3]])
    psi2, _ = ctc_prefix_scores(jnp.asarray(logp), jnp.asarray(T), state2, cand2)
    for w, c in enumerate([1, 2, 3]):
        expect = brute_prefix_logprob(logp, (2, c))
        np.testing.assert_allclose(float(psi2[0, w]), expect, rtol=1e-4, atol=1e-5)


def test_eos_gives_complete_sequence_prob():
    T, V = 4, 4
    eos = 3  # treat 3 as eos for the scorer (it is excluded from CTC paths here)
    logp = make_logp(T, V, seed=2)
    state = ctc_prefix_init(jnp.asarray(logp), jnp.asarray(T), beam=1)
    cand1 = jnp.asarray([[1]])
    psi1, r1 = ctc_prefix_scores(jnp.asarray(logp), jnp.asarray(T), state, cand1)
    state2 = ctc_prefix_select(r1, psi1, cand1, jnp.asarray([0]), jnp.asarray([0]))
    psi2, _ = ctc_prefix_scores(
        jnp.asarray(logp), jnp.asarray(T), state2, jnp.asarray([[eos]]), eos_id=eos
    )
    expect = brute_complete_logprob(logp, (1,))
    np.testing.assert_allclose(float(psi2[0, 0]), expect, rtol=1e-4, atol=1e-5)


def test_length_masking():
    # frames beyond `length` must not contribute
    T, V = 6, 4
    logp = make_logp(T, V, seed=3)
    L = 4
    state_full = ctc_prefix_init(jnp.asarray(logp[:L]), jnp.asarray(L), beam=1)
    psi_ref, _ = ctc_prefix_scores(
        jnp.asarray(logp[:L]), jnp.asarray(L), state_full, jnp.asarray([[2]])
    )
    state_mask = ctc_prefix_init(jnp.asarray(logp), jnp.asarray(L), beam=1)
    psi_mask, _ = ctc_prefix_scores(
        jnp.asarray(logp), jnp.asarray(L), state_mask, jnp.asarray([[2]])
    )
    np.testing.assert_allclose(float(psi_mask[0, 0]), float(psi_ref[0, 0]), rtol=1e-5)


def test_associative_equals_sequential_scan():
    T, V, K, W = 9, 6, 3, 4
    logp = make_logp(T, V, seed=7)
    L = 7  # exercise length masking too
    state = ctc_prefix_init(jnp.asarray(logp), jnp.asarray(L), beam=K)
    # give beams distinct last tokens / states via one chained extension
    cand0 = jnp.asarray([[1], [2], [3]])
    psi0, r0 = ctc_prefix_scores(jnp.asarray(logp), jnp.asarray(L), state, cand0)
    state = ctc_prefix_select(r0, psi0, cand0, jnp.asarray([0, 1, 2]), jnp.asarray([0, 0, 0]))
    cand = jnp.asarray([[1, 2, 3, 4], [2, 3, 4, 5], [1, 1, 2, 3]])
    psi_a, r_a = ctc_prefix_scores(
        jnp.asarray(logp), jnp.asarray(L), state, cand, use_associative_scan=True
    )
    psi_s, r_s = ctc_prefix_scores(
        jnp.asarray(logp), jnp.asarray(L), state, cand, use_associative_scan=False
    )
    np.testing.assert_allclose(np.asarray(psi_a), np.asarray(psi_s), rtol=1e-4, atol=1e-4)
    # DP rows must agree on the VALID frames (beyond L the variants differ by
    # design: frozen vs -inf — never read)
    np.testing.assert_allclose(
        np.asarray(r_a)[:, :, :L], np.asarray(r_s)[:, :, :L], rtol=1e-4, atol=1e-4
    )


def test_psi_advance_equals_scores_select():
    """The two-phase path (scan-free psi + advance-on-selected) must
    reproduce ctc_prefix_scores + ctc_prefix_select exactly."""
    from llm_guided_asr_tpu.search.ctc_prefix import (
        ctc_prefix_advance,
        ctc_prefix_init,
        ctc_prefix_psi,
        ctc_prefix_scores,
        ctc_prefix_select,
    )

    rng = np.random.default_rng(11)
    T, V, K, W = 9, 7, 3, 4
    logp = np.log(rng.dirichlet(np.ones(V), size=T)).astype(np.float32)
    state = ctc_prefix_init(jnp.asarray(logp), jnp.asarray(T), K)
    # walk two steps so parent rows are non-trivial
    for step in range(3):
        cand = jnp.asarray(rng.integers(1, V - 1, (K, W)))
        psi_full, r_new = ctc_prefix_scores(
            jnp.asarray(logp), jnp.asarray(T), state, cand, eos_id=V - 1
        )
        psi_fast = ctc_prefix_psi(
            jnp.asarray(logp), jnp.asarray(T), state, cand, eos_id=V - 1
        )
        np.testing.assert_allclose(
            np.asarray(psi_fast), np.asarray(psi_full), rtol=1e-5, atol=1e-5
        )
        parent = jnp.asarray(rng.integers(0, K, K))
        cidx = jnp.asarray(rng.integers(0, W, K))
        sel_ref = ctc_prefix_select(r_new, psi_full, cand, parent, cidx)
        sel_fast = ctc_prefix_advance(
            jnp.asarray(logp), jnp.asarray(T), state,
            cand[parent, cidx], parent, psi_fast[parent, cidx],
        )
        np.testing.assert_allclose(
            np.asarray(sel_fast.psi), np.asarray(sel_ref.psi), rtol=1e-5,
            atol=1e-5,
        )
        rr = np.asarray(sel_ref.r)
        rf = np.asarray(sel_fast.r)
        big = rr <= -1e9
        np.testing.assert_allclose(rf[~big], rr[~big], rtol=1e-4, atol=1e-4)
        assert np.all(rf[big] <= -1e9)
        np.testing.assert_array_equal(
            np.asarray(sel_fast.last), np.asarray(sel_ref.last)
        )
        state = sel_fast


def test_extend_from_zero_frames_equals_fresh_init():
    """Regression (ADVICE r2): ctc_prefix_extend(old_len=0) must use a log(1)=0
    blank-row base, not r_b[0] — reading r_b[0] double-counts frame 0's blank
    log-prob and shifts every subsequent streaming CTC prefix score."""
    from llm_guided_asr_tpu.search.ctc_prefix import ctc_prefix_extend

    rng = np.random.default_rng(0)
    T, V, K = 9, 6, 3
    logits = rng.standard_normal((T, V))
    logp = jnp.asarray(logits - np.log(np.exp(logits).sum(-1, keepdims=True)))

    fresh = ctc_prefix_init(logp, jnp.asarray(T), K)
    empty = ctc_prefix_init(logp, jnp.asarray(0), K)
    ext = ctc_prefix_extend(
        empty, logp, jnp.asarray(0), jnp.asarray(T), blank_id=0
    )
    np.testing.assert_allclose(
        np.asarray(ext.r[..., 1]), np.asarray(fresh.r[..., 1]), rtol=1e-6, atol=1e-6
    )
