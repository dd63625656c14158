"""Frame-synchronous CTC-first beam search (beam_search_timesync rebuild).

Rebuild of espnet/nets/beam_search_timesync.py (TSD, Variani et al. 2020):
the search advances over ENCODER FRAMES, not output tokens — each frame
updates K alive prefixes' (p_blank, p_nonblank) CTC mass and proposes
single-token extensions; attention-decoder (and LM) scores rescore the
surviving prefixes.  Here the whole search is one jitted ``lax.scan`` over
frames with the beam and vocabulary axes vectorized; the attention decoder
rescoring happens once on the K finalists (the reference caches per-prefix
decoder scores inside the frame loop; the end-rescoring variant keeps the
loop free of O(V) decoder calls and is the TPU-friendly operating point).

Known approximation (shared by vectorized CTC beam searches): two different
candidate paths that collapse to the SAME prefix in the same frame are not
merged; their mass stays on separate beam slots and merges only through the
top-K competition.
"""

from __future__ import annotations

from typing import Callable, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1.0e10


class TimesyncHypothesis(NamedTuple):
    yseq: List[int]
    score: float
    scores: dict


class CTCBeamSearchTimesync:
    def __init__(
        self,
        model,
        variables,
        vocab_size: int,
        sos: int,
        eos: int,
        beam_size: int = 10,
        blank_id: int = 0,
        ctc_weight: float = 1.0,
        att_weight: float = 0.0,
    ):
        self.model = model
        self.variables = variables
        self.vocab_size = vocab_size
        self.sos = sos
        self.eos = eos
        self.K = min(beam_size, vocab_size)
        self.blank_id = blank_id
        self.ctc_weight = float(ctc_weight)
        self.att_weight = float(att_weight)
        self._jit = jax.jit(self._search, static_argnames=("lmax",))

    def _search(self, enc, enc_len, lmax: int):
        K, V = self.K, self.vocab_size
        logp = self.model.apply(
            self.variables, enc, method=self.model.ctc_log_softmax
        )[0]  # [T, V]
        t_max = logp.shape[0]

        tokens0 = jnp.zeros((K, lmax), jnp.int32)
        len0 = jnp.zeros((K,), jnp.int32)
        # slot 0 = empty prefix with p_b = 0; other slots dead
        p_b0 = jnp.where(jnp.arange(K) == 0, 0.0, NEG_INF)
        p_nb0 = jnp.full((K,), NEG_INF)

        def frame(carry, inp):
            tokens, lens, p_b, p_nb = carry
            x, t = inp  # [V], frame index
            last = tokens[jnp.arange(K), jnp.maximum(lens - 1, 0)]
            has_last = lens > 0
            total = jnp.logaddexp(p_b, p_nb)

            # stay: same prefix after this frame
            stay_b = total + x[self.blank_id]
            stay_nb = jnp.where(
                has_last, p_nb + x[jnp.clip(last, 0, V - 1)], NEG_INF
            )
            stay_total = jnp.logaddexp(stay_b, stay_nb)

            # extend prefix g with token c (c != blank):
            # p_nb(g.c) = (c == last(g) ? p_b : total) + x[c]
            base = jnp.where(
                (jnp.arange(V)[None, :] == last[:, None]) & has_last[:, None],
                p_b[:, None],
                total[:, None],
            )  # [K, V]
            ext_nb = base + x[None, :]
            ext_nb = ext_nb.at[:, self.blank_id].set(NEG_INF)
            # frames past enc_len change nothing
            active = t < enc_len
            ext_total = jnp.where(active, ext_nb, NEG_INF)
            stay_b = jnp.where(active, stay_b, p_b)
            stay_nb = jnp.where(active, stay_nb, p_nb)
            stay_total = jnp.logaddexp(stay_b, stay_nb)

            # candidate pool: K stays + K*V extensions; top-K by total mass
            all_scores = jnp.concatenate([stay_total, ext_total.reshape(-1)])
            top, idx = jax.lax.top_k(all_scores, K)
            is_stay = idx < K
            src = jnp.where(is_stay, idx, (idx - K) // V)
            tok = jnp.where(is_stay, 0, (idx - K) % V)

            new_tokens = tokens[src]
            new_lens = lens[src]
            ins = jnp.where(is_stay, -1, new_lens)  # -1: no write
            new_tokens = jnp.where(
                jnp.arange(lmax)[None, :] == ins[:, None], tok[:, None], new_tokens
            )
            new_lens = jnp.where(is_stay, new_lens, jnp.minimum(new_lens + 1, lmax))
            new_p_b = jnp.where(is_stay, stay_b[src], NEG_INF)
            new_p_nb = jnp.where(
                is_stay, stay_nb[src], ext_total.reshape(-1)[jnp.maximum(idx - K, 0)]
            )
            return (new_tokens, new_lens, new_p_b, new_p_nb), None

        (tokens, lens, p_b, p_nb), _ = jax.lax.scan(
            frame, (tokens0, len0, p_b0, p_nb0),
            (logp, jnp.arange(t_max)),
        )
        ctc_scores = jnp.logaddexp(p_b, p_nb)

        att_scores = jnp.zeros((K,))
        if self.att_weight > 0.0:
            # one-shot attention rescoring of the K finalists: teacher-forced
            # decoder over [sos, y, eos]
            ys = jnp.concatenate(
                [jnp.full((K, 1), self.sos, jnp.int32), tokens], axis=1
            )
            ys_out = jnp.where(
                jnp.arange(ys.shape[1])[None, :] == (lens + 1)[:, None],
                self.eos,
                jnp.concatenate([tokens, jnp.zeros((K, 1), jnp.int32)], axis=1),
            )
            enc_k = jnp.broadcast_to(enc[0], (K,) + enc.shape[1:])
            enc_lens_k = jnp.full((K,), enc_len, jnp.int32)
            logits = self.model.apply(
                self.variables, enc_k, enc_lens_k, ys, lens + 2,
                method=self.model.decoder_logits,
            )
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            tok_lp = jnp.take_along_axis(lp, ys_out[..., None], axis=-1)[..., 0]
            pos_valid = jnp.arange(ys.shape[1])[None, :] <= lens[:, None]
            att_scores = jnp.sum(jnp.where(pos_valid, tok_lp, 0.0), axis=1)

        final = self.ctc_weight * ctc_scores + self.att_weight * att_scores
        order = jnp.argsort(-final)
        return tokens[order], lens[order], final[order], ctc_scores[order], att_scores[order]

    def __call__(self, enc, enc_lens, nbest: int = 1) -> List[TimesyncHypothesis]:
        lmax = int(enc.shape[1]) + 1
        tokens, lens, final, ctc_s, att_s = self._jit(enc, enc_lens[0], lmax=lmax)
        tokens, lens = np.asarray(tokens), np.asarray(lens)
        final, ctc_s, att_s = np.asarray(final), np.asarray(ctc_s), np.asarray(att_s)
        out = []
        for k in range(min(nbest, self.K)):
            if final[k] <= NEG_INF / 2:
                continue
            out.append(TimesyncHypothesis(
                yseq=[int(t) for t in tokens[k, : lens[k]]],
                score=float(final[k]),
                scores={"ctc": float(ctc_s[k]), "decoder": float(att_s[k])},
            ))
        return out or [TimesyncHypothesis([], float(final[0]), {})]
