"""ARPA n-gram loader, backoff scoring, rescoring, dense fusion tables."""

import math

import numpy as np
import pytest

from llm_guided_asr_tpu.search.ngram import ArpaLM, DenseNgramScorer, NgramRescorer

ARPA = """\
\\data\\
ngram 1=5
ngram 2=4

\\1-grams:
-0.30103\t</s>
-99\t<s>\t-0.30103
-0.52288\ta\t-0.30103
-0.69897\tb\t-0.22185
-1.00000\t<unk>

\\2-grams:
-0.22185\t<s> a
-0.30103\ta b
-0.52288\tb a
-0.39794\tb </s>

\\end\\
"""

LOG10 = math.log(10.0)


@pytest.fixture
def arpa_file(tmp_path):
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA)
    return p


def test_direct_ngram_hit(arpa_file):
    lm = ArpaLM(arpa_file)
    assert lm.order == 2
    np.testing.assert_allclose(lm.score_word(["<s>"], "a"), -0.22185 * LOG10, rtol=1e-6)
    np.testing.assert_allclose(lm.score_word(["a"], "b"), -0.30103 * LOG10, rtol=1e-6)


def test_backoff_path(arpa_file):
    lm = ArpaLM(arpa_file)
    # P(a | a) unseen bigram -> backoff(a) + P(a)
    expect = (-0.30103 + -0.52288) * LOG10
    np.testing.assert_allclose(lm.score_word(["a"], "a"), expect, rtol=1e-6)


def test_sequence_score(arpa_file):
    lm = ArpaLM(arpa_file)
    # <s> a b </s>: P(a|<s>) P(b|a) P(</s>|b)
    expect = (-0.22185 + -0.30103 + -0.39794) * LOG10
    np.testing.assert_allclose(lm.score_sequence(["a", "b"]), expect, rtol=1e-6)


def test_rescorer_reorders(arpa_file):
    from llm_guided_asr_tpu.search.beam_search import Hypothesis

    nbest = [
        Hypothesis(yseq=[1, 2], score=-1.0, scores={}),  # text "b a" (bad LM)
        Hypothesis(yseq=[2, 1], score=-1.1, scores={}),  # text "a b" (good LM)
    ]
    rescorer = NgramRescorer(arpa_file, weight=1.0)
    out = rescorer(nbest, [["b", "b"], ["a", "b"]])
    assert out[0].yseq == [2, 1]  # the LM flipped the order


def test_dense_scorer_matches_backoff(arpa_file):
    token_list = ["<blank>", "a", "b"]
    lm = ArpaLM(arpa_file)
    dense = DenseNgramScorer(arpa_file, token_list)
    import jax.numpy as jnp

    fn = dense.make_score_fn()
    # context last token = 'a' (id 1)
    logp = np.asarray(fn(jnp.asarray([[5, 1, 0]]), jnp.asarray([2])))[0]
    np.testing.assert_allclose(logp[2], lm.score_word(["a"], "b"), rtol=1e-5)
    np.testing.assert_allclose(logp[1], lm.score_word(["a"], "a"), rtol=1e-5)
