"""TSD / NSC / multi-blank transducer searches, fully on device.

Rebuilds of the remaining reference transducer search algorithms
(espnet2/asr/transducer/beam_search_transducer.py):

- time_sync_decoding (:382, Saon et al. 2020): per encoder frame, up to
  ``max_sym_exp`` label-expansion rounds; blank-settled hypotheses
  accumulate in a per-frame buffer with DUPLICATE-PREFIX RECOMBINATION
  (log-sum-exp of identical label sequences, :436-448).
- nsc_beam_search (:596, Kim et al. 2020): ``nstep`` constrained expansion
  rounds per frame with candidate de-duplication (utils.subtract) and
  prefix-search score augmentation (:203 prefix_search — a hypothesis whose
  label sequence extends another live hypothesis absorbs the probability of
  being generated through it at the current frame).
- multi_blank_greedy_search (:926, Xu et al. 2023): greedy decoding for
  multi-blank models — emitting a big blank skips its duration in frames.

TPU-first formulation: the reference keeps Python lists of Hypothesis
objects and loops per hypothesis on the host; here every buffer is a
fixed-shape tensor ([K, U] token tables + [K] lengths/scores), duplicate
detection is a K x K equality matrix, recombination is a short
``lax.fori_loop`` over candidate rows, and the whole search is one jitted
``lax.fori_loop`` over frames.  Prediction-network outputs are recomputed
from the full label prefix each round (correct for every decoder type).

Known deviation (documented): the reference's NSC keeps duplicate label
sequences as separate list entries in its settled set ``S`` (no
recombination there); this implementation recombines them with log-sum-exp
— at most a slightly HIGHER (never lower) score for a prefix reached along
multiple expansion paths, and one beam slot instead of two.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from llm_guided_asr_tpu.search.transducer_beam import TransducerHypothesis

NEG_INF = -1.0e10


def _same_prefix(tok_a, n_a, tok_b, n_b):
    """[KA, U] x [KB, U] -> [KA, KB] bool: identical label sequences."""
    u = tok_a.shape[1]
    pos = jnp.arange(u)
    in_len = pos[None, None, :] < n_a[:, None, None]  # [KA, 1, U]
    eq = jnp.where(in_len, tok_a[:, None, :] == tok_b[None, :, :], True)
    return (n_a[:, None] == n_b[None, :]) & jnp.all(eq, axis=-1)


def _merge_rows(buf, cand):
    """Insert K candidate rows into a K-slot (tok, n, s) buffer.

    Identical prefixes log-add their scores; new prefixes evict the lowest
    slot when better (streaming top-K).  Sequential over candidates so
    multiple candidates mapping to one slot chain correctly.
    """
    c_tok, c_n, c_s = cand

    def insert(i, state):
        tok, n, s = state
        same = _same_prefix(c_tok[i][None], c_n[i][None], tok, n)[0]  # [K]
        alive = c_s[i] > NEG_INF / 2
        hit = jnp.any(same & (s > NEG_INF / 2)) & alive
        j_hit = jnp.argmax(jnp.where(same & (s > NEG_INF / 2), s, NEG_INF))
        j_min = jnp.argmin(s)
        take_new = alive & ~hit & (c_s[i] > s[j_min])
        j = jnp.where(hit, j_hit, j_min)
        row = jnp.arange(tok.shape[0]) == j
        tok = jnp.where((row & take_new)[:, None], c_tok[i][None, :], tok)
        n = jnp.where(row & take_new, c_n[i], n)
        new_val = jnp.where(hit, jnp.logaddexp(s[j], c_s[i]), c_s[i])
        s = jnp.where(row & (hit | take_new), new_val, s)
        return tok, n, s

    return jax.lax.fori_loop(0, c_s.shape[0], insert, buf)


def _expand_topk(model, variables, h_k, c_tok, c_n, c_s, logp, blank, u_max,
                 dup_mask=None):
    """One constrained expansion: per live hyp, top-W non-blank tokens; pool
    K x W candidates -> top K.  ``dup_mask`` [K, W] (True = drop) implements
    the reference's subtract() de-duplication."""
    K = c_s.shape[0]
    w = min(K, logp.shape[-1] - 1)
    masked = logp.at[:, blank].set(NEG_INF)
    top_lp, top_id = jax.lax.top_k(masked, w)
    emit = jnp.where(
        ((c_s > NEG_INF / 2) & (c_n < u_max - 1))[:, None],
        c_s[:, None] + top_lp, NEG_INF,
    )
    if dup_mask is not None:
        emit = jnp.where(dup_mask[:, :w], NEG_INF, emit)
    best, idx = jax.lax.top_k(emit.reshape(-1), K)
    parent = idx // w
    new_token = top_id[parent, idx % w]
    ins = c_n[parent]
    new_tok = jnp.where(
        jnp.arange(u_max)[None, :] == ins[:, None],
        new_token[:, None], c_tok[parent],
    )
    return new_tok, jnp.minimum(ins + 1, u_max - 1), best, top_id


# ---------------------------------------------------------------------------
# TSD
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("model", "beam_size", "max_sym_exp", "u_max"))
def _tsd_scan(model, variables, enc, enc_len, beam_size, max_sym_exp, u_max):
    t_max = enc.shape[1]
    K = beam_size
    blank = model.cfg.blank_id

    def dec_state(tokens, n):
        out = model.apply(variables, tokens, method=model.decode_labels)
        return jnp.take_along_axis(out, n[:, None, None], axis=1)[:, 0]

    def frame_step(t, carry):
        tokens, n, score = carry
        frame_valid = t < enc_len
        h_t = enc[0, jnp.clip(t, 0, t_max - 1)]
        h_k = jnp.broadcast_to(h_t[None, :], (K, h_t.shape[0]))

        # A: blank-settled accumulator for this frame (starts empty)
        a = (jnp.zeros((K, u_max), jnp.int32), jnp.zeros((K,), jnp.int32),
             jnp.full((K,), NEG_INF))
        c_tok, c_n, c_s = tokens, n, score

        for v in range(max_sym_exp):
            g = dec_state(c_tok, c_n)
            logits = model.apply(variables, h_k, g, method=model.joint_step)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            a = _merge_rows(a, (c_tok, c_n, c_s + logp[:, blank]))
            if v < max_sym_exp - 1:
                c_tok, c_n, c_s, _ = _expand_topk(
                    model, variables, h_k, c_tok, c_n, c_s, logp, blank, u_max
                )

        a_tok, a_n, a_s = a
        tokens = jnp.where(frame_valid, a_tok, carry[0])
        n = jnp.where(frame_valid, a_n, carry[1])
        score = jnp.where(frame_valid, a_s, carry[2])
        return tokens, n, score

    tokens0 = jnp.zeros((K, u_max), jnp.int32)
    n0 = jnp.zeros((K,), jnp.int32)
    score0 = jnp.where(jnp.arange(K) == 0, 0.0, NEG_INF)
    return jax.lax.fori_loop(0, t_max, frame_step, (tokens0, n0, score0))


def transducer_tsd_decode(
    model,
    variables: Dict,
    enc: jnp.ndarray,  # [1, T, D]
    enc_lens: jnp.ndarray,  # [1]
    beam_size: int = 5,
    max_sym_exp: int = 2,
    u_max: int = 200,
    nbest: int = 1,
    score_norm: bool = True,
) -> List[TransducerHypothesis]:
    """Time-synchronous decoding (time_sync_decoding, :382)."""
    u_max = min(u_max, enc.shape[1] * max(max_sym_exp - 1, 1) + 1)
    tokens, n, score = _tsd_scan(
        model, variables, enc, enc_lens[0], beam_size, max_sym_exp, u_max
    )
    return _collect(tokens, n, score, nbest, score_norm)


def _collect(tokens, n, score, nbest, score_norm):
    # reference sort_nbest: sorts by score / len(yseq) (yseq includes the
    # leading blank context token => n + 1) but REPORTS the raw score
    # (beam_search_transducer.py:184-201)
    final = score / (n + 1) if score_norm else score
    order = jnp.argsort(-final)
    tk = np.asarray(tokens[order])
    nn_ = np.asarray(n[order])
    ss = np.asarray(score[order])
    out = []
    for k in range(min(nbest, len(ss))):
        if ss[k] <= NEG_INF / 2:
            continue
        out.append(TransducerHypothesis(
            yseq=[int(x) for x in tk[k, : nn_[k]]], score=float(ss[k])
        ))
    if not out:
        out = [TransducerHypothesis(yseq=[], score=float(ss[0]))]
    return out


# ---------------------------------------------------------------------------
# NSC
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("model", "beam_size", "nstep", "u_max",
                                   "prefix_alpha"))
def _nsc_scan(model, variables, enc, enc_len, beam_size, nstep, u_max,
              prefix_alpha):
    t_max = enc.shape[1]
    K = beam_size
    blank = model.cfg.blank_id

    def dec_all(tokens):
        return model.apply(variables, tokens, method=model.decode_labels)

    def dec_at(out_all, n):
        return jnp.take_along_axis(out_all, n[:, None, None], axis=1)[:, 0]

    def prefix_augment(tokens, n, score, h_t):
        """prefix_search (:203): for each live pair where hyp_i is a PROPER
        PREFIX of hyp_j with gap <= prefix_alpha, the LONGER hyp_j absorbs
        score_i + sum_{k=n_i}^{n_j-1} logp(joint(h_t, out_j[k]))[tokens_j[k]]
        (the probability of i emitting j's suffix labels at this frame)."""
        out_all = dec_all(tokens)  # [K, U+1, H]
        u = tokens.shape[1]
        h_b = jnp.broadcast_to(h_t[None, None, :], out_all.shape[:2] + h_t.shape)
        logits = model.apply(
            variables, h_b.reshape(-1, h_t.shape[0]),
            out_all.reshape(-1, out_all.shape[-1]), method=model.joint_step,
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logp = logp.reshape(K, u + 1, -1)
        emit_lp = jnp.take_along_axis(
            logp[:, :u, :], tokens[:, :, None], axis=-1
        )[..., 0]  # [K, U]: logp of emitting label k after k labels
        cum = jnp.concatenate(
            [jnp.zeros((K, 1)), jnp.cumsum(emit_lp, axis=1)], axis=1
        )  # [K, U+1]

        pos = jnp.arange(u)
        eq = jnp.where(
            pos[None, None, :] < jnp.minimum(n[:, None], n[None, :])[:, :, None],
            tokens[:, None, :] == tokens[None, :, :], True,
        )
        common_pref = jnp.all(eq, axis=-1)
        live = score > NEG_INF / 2
        pair = (
            common_pref
            & (n[:, None] < n[None, :])
            & ((n[None, :] - n[:, None]) <= prefix_alpha)
            & live[:, None] & live[None, :]
        )  # [i, j]: i proper prefix of j
        cum_nj = jnp.take_along_axis(cum, n[:, None], axis=1)[:, 0]  # cum[j, n_j]
        cum_j_ni = jnp.take_along_axis(
            jnp.broadcast_to(cum[None, :, :], (K, K, u + 1)),
            jnp.broadcast_to(n[:, None, None], (K, K, 1)), axis=2,
        )[..., 0]  # [i, j] = cum[j, n_i]
        contrib = jnp.where(
            pair, score[:, None] + (cum_nj[None, :] - cum_j_ni), NEG_INF
        )  # [i, j]
        new_score = jax.nn.logsumexp(
            jnp.concatenate([score[None, :], contrib], axis=0), axis=0
        )
        return jnp.where(live, new_score, score)

    def frame_step(t, carry):
        tokens, n, score = carry
        frame_valid = t < enc_len
        h_t = enc[0, jnp.clip(t, 0, t_max - 1)]
        h_k = jnp.broadcast_to(h_t[None, :], (K, h_t.shape[0]))

        c_tok, c_n, c_s = tokens, n, prefix_augment(tokens, n, score, h_t)
        s_buf = (jnp.zeros((K, u_max), jnp.int32), jnp.zeros((K,), jnp.int32),
                 jnp.full((K,), NEG_INF))

        for v in range(nstep + 1):
            g = dec_at(dec_all(c_tok), c_n)
            logits = model.apply(variables, h_k, g, method=model.joint_step)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            s_buf = _merge_rows(s_buf, (c_tok, c_n, c_s + logp[:, blank]))
            if v < nstep:
                # subtract(): drop expansion candidates identical to a
                # current-set sequence — candidate (p, token w) duplicates
                # hyp q iff n_q == n_p + 1, q[:n_p] == p[:n_p], token == q[n_p]
                pref_eq = jnp.all(
                    jnp.where(
                        jnp.arange(u_max)[None, None, :] < c_n[:, None, None],
                        c_tok[:, None, :] == c_tok[None, :, :], True,
                    ), axis=-1,
                )
                one_longer = (c_n[None, :] == c_n[:, None] + 1) & pref_eq
                q_next = jnp.take_along_axis(
                    jnp.broadcast_to(c_tok[None, :, :], (K, K, u_max)),
                    jnp.broadcast_to(
                        jnp.clip(c_n, 0, u_max - 1)[:, None, None], (K, K, 1)
                    ), axis=2,
                )[..., 0]  # [p, q] = tokens_q[n_p]
                w = min(K, logp.shape[-1] - 1)
                masked = logp.at[:, blank].set(NEG_INF)
                _, top_id = jax.lax.top_k(masked, w)
                dup = jnp.any(
                    one_longer[:, None, :]
                    & (top_id[:, :, None] == q_next[:, None, :]),
                    axis=-1,
                )  # [p, w]
                c_tok, c_n, c_s, _ = _expand_topk(
                    model, variables, h_k, c_tok, c_n, c_s, logp, blank, u_max,
                    dup_mask=dup,
                )

        s_tok, s_n, s_s = s_buf
        tokens = jnp.where(frame_valid, s_tok, carry[0])
        n = jnp.where(frame_valid, s_n, carry[1])
        score = jnp.where(frame_valid, s_s, carry[2])
        return tokens, n, score

    tokens0 = jnp.zeros((K, u_max), jnp.int32)
    n0 = jnp.zeros((K,), jnp.int32)
    score0 = jnp.where(jnp.arange(K) == 0, 0.0, NEG_INF)
    return jax.lax.fori_loop(0, t_max, frame_step, (tokens0, n0, score0))


def transducer_nsc_decode(
    model,
    variables: Dict,
    enc: jnp.ndarray,  # [1, T, D]
    enc_lens: jnp.ndarray,  # [1]
    beam_size: int = 5,
    nstep: int = 2,
    prefix_alpha: int = 4,
    u_max: int = 200,
    nbest: int = 1,
    score_norm: bool = True,
) -> List[TransducerHypothesis]:
    """N-step constrained beam search (nsc_beam_search, :596)."""
    u_max = min(u_max, enc.shape[1] * max(nstep, 1) + 1)
    tokens, n, score = _nsc_scan(
        model, variables, enc, enc_lens[0], beam_size, nstep, u_max, prefix_alpha
    )
    return _collect(tokens, n, score, nbest, score_norm)


# ---------------------------------------------------------------------------
# Multi-blank greedy
# ---------------------------------------------------------------------------

def transducer_multiblank_greedy(
    model,
    variables: Dict,
    enc: jnp.ndarray,  # [1, T, D]
    enc_lens: jnp.ndarray,  # [1]
    big_blank_ids,
    big_blank_durations,
    u_max: int = 200,
    max_symbols_per_frame: int = 3,
) -> List[TransducerHypothesis]:
    """Multi-blank greedy (multi_blank_greedy_search, :926): argmax per
    inner step; a blank or big blank ends the frame, big blanks skip their
    duration in frames."""
    t_max = enc.shape[1]
    blank = model.cfg.blank_id
    # pad with a never-matching id so the gather below is total even with
    # no big blanks configured (plain greedy degenerates correctly)
    big_ids = jnp.asarray(list(big_blank_ids) + [-1], jnp.int32)
    big_durs = jnp.asarray(list(big_blank_durations) + [1], jnp.int32)
    enc_len = enc_lens[0]

    def frame_step(t, carry):
        tokens, n, score, skip_until = carry
        active = (t < enc_len) & (t >= skip_until)
        h_t = enc[0, jnp.clip(t, 0, t_max - 1)]

        def body(sym, st):
            tokens, n, score, skip_until, emitting = st
            out = model.apply(variables, tokens[None], method=model.decode_labels)
            g = out[0, n]
            logits = model.apply(
                variables, h_t[None], g[None], method=model.joint_step
            )
            logp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
            k = jnp.argmax(logp).astype(jnp.int32)
            top = logp[k]
            is_big = jnp.any(big_ids == k)
            is_blank = (k == blank) | is_big
            do = emitting
            dur = jnp.where(is_big, big_durs[jnp.argmax(big_ids == k)], 1)
            skip_until = jnp.where(do & is_blank, t + dur, skip_until)
            score = jnp.where(do, score + top, score)
            append = do & ~is_blank & (n < u_max - 1)
            tokens = jnp.where(append & (jnp.arange(u_max) == n), k, tokens)
            n = jnp.where(append, n + 1, n)
            return tokens, n, score, skip_until, do & ~is_blank

        tokens2, n2, score2, skip2, _ = jax.lax.fori_loop(
            0, max_symbols_per_frame + 1, body,
            (tokens, n, score, skip_until, active),
        )
        return tokens2, n2, score2, skip2

    carry = jax.lax.fori_loop(
        0, t_max, frame_step,
        (jnp.zeros((u_max,), jnp.int32), jnp.asarray(0), jnp.asarray(0.0),
         jnp.asarray(0)),
    )
    tokens, n, score, _ = carry
    tk = np.asarray(tokens)
    return [TransducerHypothesis(
        yseq=[int(x) for x in tk[: int(n)]], score=float(score)
    )]
