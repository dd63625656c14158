"""Batched transducer beam search, fully on device.

Rebuild of the reference transducer searches
(espnet2/asr/transducer/beam_search_transducer.py 'default'/'maes' family)
in a TPU-friendly fixed-expansion formulation (the mAES idea): per encoder
frame, each hypothesis gets up to ``max_sym_exp`` symbol-expansion rounds;
in each round a hypothesis either *settles* (takes blank, freezing its score
for this frame) or emits one of the top non-blank tokens.  All K hypotheses
and candidates are fixed-shape tensors inside one ``lax.fori_loop`` over
frames — no per-hypothesis host loop.

Prediction-network states are recomputed from the full label prefix each
round (correct for all decoder types; the prefix is capped at ``u_max``).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1.0e10


class TransducerHypothesis(NamedTuple):
    yseq: List[int]
    score: float


def transducer_beam_decode(
    model,
    variables: Dict,
    enc: jnp.ndarray,  # [1, T, D] single utterance
    enc_lens: jnp.ndarray,  # [1]
    beam_size: int = 5,
    max_sym_exp: int = 2,
    u_max: int = 200,
    nbest: int = 1,
    score_norm: bool = True,
) -> List[TransducerHypothesis]:
    """Beam decode one utterance; returns nbest hypotheses."""
    t_max = enc.shape[1]
    u_max = min(u_max, t_max * max_sym_exp + 1)
    K = beam_size
    blank = model.cfg.blank_id
    enc_len = enc_lens[0]

    def dec_state(tokens, n):
        """Prediction-network output at position n for each hyp."""
        out = model.apply(variables, tokens, method=model.decode_labels)  # [K, U+1, H]
        return jnp.take_along_axis(out, n[:, None, None], axis=1)[:, 0]

    def frame_step(t, carry):
        tokens, n, score = carry
        h_t = enc[0, jnp.clip(t, 0, t_max - 1)]  # [D]
        h_k = jnp.broadcast_to(h_t[None, :], (K, h_t.shape[0]))
        active = jnp.ones((K,), bool)
        frame_valid = t < enc_len

        for e in range(max_sym_exp):
            g = dec_state(tokens, n)  # [K, H]
            logits = model.apply(variables, h_k, g, method=model.joint_step)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)  # [K, V]

            # settled candidates: active hyps take blank; inactive keep score
            settled_score = jnp.where(active, score + logp[:, blank], score)

            if e == max_sym_exp - 1:
                tokens, n, score = tokens, n, settled_score
                break

            # emit candidates from active hyps: top-W non-blank
            w = min(K, logp.shape[-1] - 1)
            masked = logp.at[:, blank].set(NEG_INF)
            top_lp, top_id = jax.lax.top_k(masked, w)  # [K, W]
            emit_score = jnp.where(
                (active & (n < u_max - 1))[:, None], score[:, None] + top_lp, NEG_INF
            )

            # pool: K settled + K*W emitted -> top K
            pool_scores = jnp.concatenate([settled_score, emit_score.reshape(-1)])
            best, idx = jax.lax.top_k(pool_scores, K)
            is_settled = idx < K
            parent = jnp.where(is_settled, idx, (idx - K) // w)
            cand_j = jnp.clip(idx - K, 0, K * w - 1) % w
            new_token = top_id[parent, cand_j]

            new_tokens = tokens[parent]
            new_n = n[parent]
            ins = new_n  # 0-based position of the next label
            new_tokens = jnp.where(
                (~is_settled[:, None])
                & (jnp.arange(tokens.shape[1])[None, :] == ins[:, None]),
                new_token[:, None],
                new_tokens,
            )
            new_n = jnp.where(is_settled, new_n, jnp.minimum(new_n + 1, u_max - 1))
            # settled hyps stop expanding this frame; emitted ones continue
            prev_active = active[parent]
            active = prev_active & ~is_settled
            tokens, n, score = new_tokens, new_n, best

        # frames past the utterance leave everything unchanged
        tokens = jnp.where(frame_valid, tokens, carry[0])
        n = jnp.where(frame_valid, n, carry[1])
        score = jnp.where(frame_valid, score, carry[2])
        return tokens, n, score

    tokens0 = jnp.zeros((K, u_max), jnp.int32)
    n0 = jnp.zeros((K,), jnp.int32)
    score0 = jnp.where(jnp.arange(K) == 0, 0.0, NEG_INF)

    tokens, n, score = jax.lax.fori_loop(
        0, t_max, frame_step, (tokens0, n0, score0)
    )
    # reference sort_nbest divides by len(yseq) which INCLUDES the
    # leading blank context token (beam_search_transducer.py:184-201)
    final = score / (n + 1) if score_norm else score
    order = jnp.argsort(-final)
    tokens, n, final = tokens[order], n[order], final[order]
    out = []
    tk = np.asarray(tokens)
    nn = np.asarray(n)
    ss = np.asarray(final)
    for k in range(min(nbest, K)):
        if ss[k] <= NEG_INF / 2:
            continue
        out.append(
            TransducerHypothesis(
                yseq=[int(x) for x in tk[k, : nn[k]]], score=float(ss[k])
            )
        )
    if not out:
        out = [TransducerHypothesis(yseq=[], score=float(ss[0]))]
    return out


def transducer_alsd_decode(
    model,
    variables: Dict,
    enc: jnp.ndarray,  # [1, T, D] single utterance
    enc_lens: jnp.ndarray,  # [1]
    beam_size: int = 5,
    u_max: int = 50,
    nbest: int = 1,
    score_norm: bool = True,
) -> List[TransducerHypothesis]:
    """Alignment-length synchronous decoding (ALSD, Saon et al. 2020;
    beam_search_transducer.py align_length_sync_decoding).

    One loop over alignment length i = t + u: at each step every live
    hypothesis sits at its own frame t = i - u; a blank step advances t,
    a label step advances u — both advance i, so hypotheses of different
    label lengths stay synchronous and compete in one top-K.  Hypotheses
    whose frame pointer crosses the utterance end retire into a finished
    buffer.  All state is fixed-shape on device (the reference keeps
    Python lists of hyps, :load-bearing difference).
    """
    t_max = enc.shape[1]
    K = beam_size
    blank = model.cfg.blank_id
    enc_len = enc_lens[0]
    i_max = t_max + min(u_max, t_max)

    def dec_state(tokens, n):
        out = model.apply(variables, tokens, method=model.decode_labels)
        return jnp.take_along_axis(out, n[:, None, None], axis=1)[:, 0]

    def step(i, carry):
        tokens, u, score, fin_tokens, fin_u, fin_score = carry
        t = i - u  # [K] per-hyp frame pointer
        live = (t >= 0) & (t < enc_len) & (score > NEG_INF / 2)
        h_k = enc[0, jnp.clip(t, 0, t_max - 1)]  # [K, D]
        g = dec_state(tokens, u)
        logits = model.apply(variables, h_k, g, method=model.joint_step)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

        # blank: t+1 (u unchanged); final if t+1 == enc_len
        blank_score = jnp.where(live, score + logp[:, blank], NEG_INF)
        becomes_final = live & (t + 1 >= enc_len)
        # finished-buffer merge for blank steps that cross the end
        fin_cand = jnp.where(becomes_final, blank_score, NEG_INF)
        all_fin = jnp.concatenate([fin_score, fin_cand])
        all_fin_tokens = jnp.concatenate([fin_tokens, tokens])
        all_fin_u = jnp.concatenate([fin_u, u])
        fin_score2, fi = jax.lax.top_k(all_fin, K)
        fin_tokens2 = all_fin_tokens[fi]
        fin_u2 = all_fin_u[fi]
        blank_alive = jnp.where(becomes_final, NEG_INF, blank_score)

        # emit: top-W non-blank, u+1 (t unchanged)
        w = min(K, logp.shape[-1] - 1)
        masked = logp.at[:, blank].set(NEG_INF)
        top_lp, top_id = jax.lax.top_k(masked, w)
        emit_score = jnp.where(
            (live & (u < tokens.shape[1] - 1))[:, None],
            score[:, None] + top_lp, NEG_INF,
        )

        pool = jnp.concatenate([blank_alive, emit_score.reshape(-1)])
        best, idx = jax.lax.top_k(pool, K)
        is_blank = idx < K
        parent = jnp.where(is_blank, idx, (idx - K) // w)
        cand_j = jnp.clip(idx - K, 0, K * w - 1) % w
        new_token = top_id[parent, cand_j]
        new_tokens = tokens[parent]
        ins = u[parent]
        new_tokens = jnp.where(
            (~is_blank[:, None])
            & (jnp.arange(tokens.shape[1])[None, :] == ins[:, None]),
            new_token[:, None], new_tokens,
        )
        new_u = jnp.where(is_blank, u[parent],
                          jnp.minimum(u[parent] + 1, tokens.shape[1] - 1))
        return (new_tokens, new_u, best, fin_tokens2, fin_u2, fin_score2)

    um = min(u_max, t_max)
    tokens0 = jnp.zeros((K, um + 1), jnp.int32)
    u0 = jnp.zeros((K,), jnp.int32)
    score0 = jnp.where(jnp.arange(K) == 0, 0.0, NEG_INF)
    fin0 = (jnp.zeros((K, um + 1), jnp.int32), jnp.zeros((K,), jnp.int32),
            jnp.full((K,), NEG_INF))
    tokens, u, score, fin_tokens, fin_u, fin_score = jax.lax.fori_loop(
        0, i_max, step, (tokens0, u0, score0) + fin0
    )
    final = fin_score / (fin_u + 1) if score_norm else fin_score
    order = jnp.argsort(-final)
    tk, nn, ss = (np.asarray(fin_tokens[order]), np.asarray(fin_u[order]),
                  np.asarray(final[order]))
    out = []
    for k in range(min(nbest, K)):
        if ss[k] <= NEG_INF / 2:
            continue
        out.append(TransducerHypothesis(
            yseq=[int(x) for x in tk[k, : nn[k]]], score=float(ss[k])
        ))
    if not out:
        out = [TransducerHypothesis(yseq=[], score=float(ss[0]))]
    return out
