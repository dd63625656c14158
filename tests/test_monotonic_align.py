"""MAS vs brute-force enumeration of monotonic alignment paths."""

import itertools

import jax.numpy as jnp
import numpy as np

from llm_guided_asr_tpu.ops.monotonic_align import monotonic_align


def brute_best_path(value, L, T):
    """Enumerate all monotonic paths (0,0)->(L-1,T-1); return best 0/1 map."""
    best_score, best_path = -np.inf, None
    # path = token index per frame, non-decreasing, steps of 0/1
    def rec(js):
        nonlocal best_score, best_path
        if len(js) == T:
            if js[-1] == L - 1:
                s = sum(value[j, t] for t, j in enumerate(js))
                if s > best_score:
                    best_score = s
                    best_path = list(js)
            return
        j = js[-1]
        for nj in ([j, j + 1] if j + 1 < L else [j]):
            rec(js + [nj])

    rec([0])
    path = np.zeros((L, T))
    for t, j in enumerate(best_path):
        path[j, t] = 1.0
    return path, best_score


def test_mas_matches_bruteforce():
    rng = np.random.default_rng(0)
    for trial in range(5):
        L, T = 3, 6
        value = rng.standard_normal((L, T)).astype(np.float32)
        ref_path, ref_score = brute_best_path(value, L, T)
        got = np.asarray(
            monotonic_align(
                jnp.asarray(value[None]), jnp.asarray([L]), jnp.asarray([T])
            )
        )[0]
        got_score = float((got * value).sum())
        np.testing.assert_allclose(got_score, ref_score, rtol=1e-5)
        np.testing.assert_array_equal(got, ref_path)


def test_mas_respects_lengths():
    rng = np.random.default_rng(1)
    value = rng.standard_normal((2, 4, 8)).astype(np.float32)
    out = np.asarray(
        monotonic_align(jnp.asarray(value), jnp.asarray([4, 2]), jnp.asarray([8, 5]))
    )
    # each valid frame assigned exactly one token; invalid regions zero
    assert np.all(out[0].sum(0) == 1.0)
    assert np.all(out[1][:, :5].sum(0) == 1.0)
    assert np.all(out[1][2:, :] == 0.0)
    assert np.all(out[1][:, 5:] == 0.0)
    # monotone non-decreasing token index
    for b, (L, T) in enumerate([(4, 8), (2, 5)]):
        js = out[b][:, :T].argmax(0)
        assert np.all(np.diff(js) >= 0)
        assert js[0] == 0 and js[T - 1] == L - 1
