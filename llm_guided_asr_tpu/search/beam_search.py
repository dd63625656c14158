"""Fully vectorized on-device joint CTC/attention beam search.

Rebuild of espnet/nets/beam_search.py:34 + batch_beam_search.py:32 as a
single jitted ``lax.while_loop``:  the reference's Python-per-token loop with
per-hypothesis state-list surgery (batch_beam_search.py:320-363, the
TODO-marked host bottleneck) becomes static-shape tensor ops:

- full scorers (attention decoder, optional LM, length bonus) score [K, V];
- pre-beam selects W = ceil(1.5*K) candidates per hyp
  (beam_search.py:347-353, pre_beam_ratio 1.5);
- the partial scorer (CTC prefix DP, ctc_prefix.py) rescores the [K, W]
  candidates; total = prev + full_weighted + ctc_weight*local_ctc + penalty;
- eos candidates retire into a fixed-size finished buffer; non-eos top-K
  refill the alive beam (espnet's ended_hyps/post_process:500);
- loop exits when maxlen is reached or no alive hyp can beat the worst
  finished hyp (end_detect analog).

Weights follow asr_inference.py:352-362: decoder 1-ctc_weight, ctc
ctc_weight, lm lm_weight, length_bonus penalty.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llm_guided_asr_tpu.search.ctc_prefix import (
    ctc_prefix_advance,
    ctc_prefix_psi,
    CTCPrefixState,
    ctc_prefix_init,
)

NEG_INF = -1.0e10


class Hypothesis(NamedTuple):
    """Host-side result (espnet beam_search.py:15)."""

    yseq: List[int]
    score: float
    scores: Dict[str, float]


class BeamState(NamedTuple):
    step: jnp.ndarray  # scalar i
    alive_tokens: jnp.ndarray  # [K, Lmax] (sos at 0)
    alive_len: jnp.ndarray  # [K]
    alive_score: jnp.ndarray  # [K] total (= alive_base + ctc_weight * psi)
    alive_base: jnp.ndarray  # [K] cumulative NON-CTC part (att+lm+penalty)
    alive_parts: jnp.ndarray  # [K, 4] unweighted (decoder, ctc, lm, length_bonus)
    ctc: CTCPrefixState
    fin_tokens: jnp.ndarray  # [K, Lmax]
    fin_len: jnp.ndarray  # [K]
    fin_score: jnp.ndarray  # [K]
    fin_parts: jnp.ndarray  # [K, 4]


class BatchBeamSearch:
    """Joint CTC/attention (+LM) beam search over one utterance, on device."""

    def __init__(
        self,
        model,
        variables,
        vocab_size: int,
        sos: int,
        eos: int,
        beam_size: int = 10,
        ctc_weight: float = 0.5,
        penalty: float = 0.0,
        lm_score_fn: Optional[Callable] = None,
        lm_weight: float = 0.0,
        blank_id: int = 0,
        pre_beam_ratio: float = 1.5,
        att_scorer=None,
    ):
        from llm_guided_asr_tpu.search.scorers import StatelessAttScorer

        self.model = model
        self.variables = variables
        # the default scorer shares our weights; remember that so a later
        # self.variables reassignment (checkpoint swap) propagates to it
        # (_call_weights syncs) instead of it scoring with the stale tree
        self._default_att_scorer = att_scorer is None
        self.att_scorer = att_scorer or StatelessAttScorer(model, variables)
        self.vocab_size = vocab_size
        self.sos = sos
        self.eos = eos
        # espnet clamps the beam to the vocab (beam_search.py __init__); a
        # K > V beam admits blank/dead candidates whose later extension gets
        # a catastrophic +inf CTC delta (psi_finite - NEG_INF)
        self.K = min(beam_size, vocab_size)
        beam_size = self.K
        # espnet-exact pre-beam width (beam_search.py:105): int(ratio * K),
        # capped at the vocab.  At beam 1 this is 1 — only the single best
        # full-scorer token is CTC-rescored, which changes hypotheses
        # (caught by the beam-1 golden parity fixture).
        self.W = max(1, min(vocab_size, int(pre_beam_ratio * beam_size)))
        self.ctc_weight = float(ctc_weight)
        self.att_weight = 1.0 - float(ctc_weight)
        self.penalty = float(penalty)
        self.lm_score_fn = lm_score_fn
        self.lm_weight = float(lm_weight)
        self.blank_id = blank_id
        self._search_jit = jax.jit(
            self._search, static_argnames=("lmax",)
        )
        # Weight-passing mode is decided per call by _call_weights(): small
        # weight sets ride as closure constants (XLA constant-folds them —
        # worth ~19% beam10 RTFx on the flagship), large ones as traced jit
        # arguments (a resident 1B LLM as a literal costs 2.78 GB at lowering
        # + duplicated HBM).  lm_score_fn always closes over its own weights —
        # shallow-fusion LMs are small.
        # batched multi-utterance decode: ONE while_loop over lockstep lanes
        # (the reference decodes utterance-by-utterance even in
        # BatchBeamSearch; vmapping the whole while_loop instead measured a
        # +74% tax at B=1 and near-linear per-lane cost — the batched loop
        # carry gets select-masked every iteration and per-lane step counters
        # turn every KV-cache dynamic_update_slice into a scatter)
        self._batch_search_jit = jax.jit(
            self._vmapped_search, static_argnames=("lmax",)
        )

    # Below this, weights ride as closure constants (XLA constant-folds them:
    # measured beam10 1019x vs 856x on the 116M flagship, tools/
    # ab_beam_weights.py); above it, as traced jit args (a resident 1B LLM as
    # a literal costs 2.78 GB at lowering + duplicated HBM).
    _TRACED_WEIGHTS_MIN_BYTES = int(
        float(os.environ.get("LLMASR_BEAM_TRACED_WEIGHTS_MIN_MB", "512"))
        * (1 << 20)
    )

    def _call_weights(self):
        """Weight-passing mode, decided at CALL time.

        Returns None for closure mode (the traced body reads self.variables
        directly, baked in as jit constants) or the (variables,
        att_scorer_variables) pair to pass as traced arguments.
        LLMASR_BEAM_CLOSURE_WEIGHTS=1/0 forces the mode (A/B instrument);
        default is by total weight size.  In closure mode the jit caches are
        invalidated when self.variables (or the scorer's) is REASSIGNED, so a
        checkpoint swap retraces instead of silently decoding with stale
        constants (ADVICE r4 #1).
        """
        forced = os.environ.get("LLMASR_BEAM_CLOSURE_WEIGHTS")
        if self._default_att_scorer:
            self.att_scorer.variables = self.variables
        sv = getattr(self.att_scorer, "variables", None)
        if forced == "1":
            use_closure = True
        elif forced == "0":
            use_closure = False
        else:
            total = sum(
                getattr(leaf, "nbytes", 0)
                for tree in (self.variables, sv)
                for leaf in jax.tree_util.tree_leaves(tree)
            )
            use_closure = total < self._TRACED_WEIGHTS_MIN_BYTES
        if not use_closure:
            return (self.variables, sv)
        ident = (id(self.variables), id(sv))
        if getattr(self, "_closure_weights_id", None) != ident:
            if getattr(self, "_closure_weights_id", None) is not None:
                # weights object swapped since last trace: drop the compiled
                # executables that constant-folded the old ones
                self._search_jit = jax.jit(
                    self._search, static_argnames=("lmax",)
                )
                self._batch_search_jit = jax.jit(
                    self._vmapped_search, static_argnames=("lmax",)
                )
            self._closure_weights_id = ident
        return None

    def _weights_ctx(self, weights):
        """Trace-time swap of model/scorer variables for the traced pytrees.

        ``weights`` is the (variables, att_scorer_variables) pair passed as a
        jit argument; while the traced function body runs, instance attrs
        point at the tracers so every model.apply reads traced weights."""
        import contextlib

        @contextlib.contextmanager
        def cm():
            if weights is None:
                yield
                return
            mv, sv = weights
            prev_m, self.variables = self.variables, mv
            has_sv = hasattr(self.att_scorer, "variables") and sv is not None
            if has_sv:
                prev_s, self.att_scorer.variables = self.att_scorer.variables, sv
            try:
                yield
            finally:
                self.variables = prev_m
                if has_sv:
                    self.att_scorer.variables = prev_s

        return cm()

    def _vmapped_search(self, encs, enc_lens, maxlens, minlens, weights,
                        lmax: int):
        """Lockstep batched search: a single while_loop with a SHARED scalar
        step counter; only the per-lane body is vmapped.

        - The shared counter keeps KV-cache writes (decode_step's
          dynamic_update_slice at prompt_len + step) unbatched-index dus.
        - Finished lanes' result-bearing leaves (BeamState) are frozen with a
          per-lane active mask; scorer KV caches free-run — their post-finish
          junk is never read because _finalize consumes only the frozen
          BeamState.
        """
        b = encs.shape[0]

        with self._weights_ctx(weights):
            return self._vmapped_search_body(
                b, encs, enc_lens, maxlens, minlens, lmax
            )

    def _vmapped_search_body(self, b, encs, enc_lens, maxlens, minlens,
                             lmax: int):
        def init_one(enc, enc_len):
            ctc_logp = self._ctc_table(enc[None])
            return ctc_logp, self._init_carry(ctc_logp, enc[None], enc_len, lmax)

        ctc_logps, (S, ATT) = jax.vmap(init_one)(encs, enc_lens)
        maxl = jnp.minimum(maxlens, lmax - 1)

        def active_mask(S, step):
            viable = jnp.max(S.alive_score, axis=-1) > jnp.min(S.fin_score, axis=-1)
            return (step < maxl) & viable

        def cond(carry):
            step, S, _ = carry
            return jnp.any(active_mask(S, step))

        def body(carry):
            step, S, ATT = carry
            active = active_mask(S, step)
            new_S, new_ATT = jax.vmap(
                lambda enc, enc_len, minlen, ctc_logp, s, att: self._body_core(
                    enc[None], enc_len, minlen, ctc_logp, s, att, step
                )
            )(encs, enc_lens, minlens, ctc_logps, S, ATT)

            def frz(n, o):
                mask = active.reshape((b,) + (1,) * (n.ndim - 1))
                return jnp.where(mask, n, o)

            return step + 1, jax.tree_util.tree_map(frz, new_S, S), new_ATT

        step0 = jnp.asarray(0, jnp.int32)
        _, S, _ = jax.lax.while_loop(cond, body, (step0, S, ATT))
        return jax.vmap(self._finalize)(S)

    # -- core loop ------------------------------------------------------
    def _init_carry(self, ctc_logp, enc, enc_len, lmax: int, scorer_ctx=None):
        K = self.K
        att_state0 = self.att_scorer.init(enc, enc_len, K, lmax, ctx=scorer_ctx)
        init = BeamState(
            step=jnp.asarray(0, jnp.int32),
            alive_tokens=jnp.full((K, lmax), self.sos, jnp.int32),
            alive_len=jnp.ones((K,), jnp.int32),
            alive_score=jnp.where(jnp.arange(K) == 0, 0.0, NEG_INF),
            alive_base=jnp.where(jnp.arange(K) == 0, 0.0, NEG_INF),
            alive_parts=jnp.zeros((K, 4)),
            ctc=ctc_prefix_init(ctc_logp, enc_len, K, self.blank_id),
            fin_tokens=jnp.zeros((K, lmax), jnp.int32),
            fin_len=jnp.zeros((K,), jnp.int32),
            fin_score=jnp.full((K,), NEG_INF),
            fin_parts=jnp.zeros((K, 4)),
        )
        return (init, att_state0)

    def _ctc_table(self, enc):
        if self.ctc_weight != 0.0:
            return self.model.apply(
                self.variables, enc, method=self.model.ctc_log_softmax
            )[0]  # [T, V]
        # CTC-less models (MT, discrete-unit TTS): dummy uniform table,
        # never scored (the ctc branch is compiled out)
        return jnp.zeros((enc.shape[1], self.vocab_size))

    def _search(self, enc, enc_len, maxlen, minlen, scorer_ctx, weights,
                lmax: int):
        # weights ride as traced args exactly like _vmapped_search: a
        # resident multi-GB LLM closed over as jit constants was measured to
        # capture 2.78 GB of literals at lowering time (ADVICE r4 #2)
        with self._weights_ctx(weights):
            ctc_logp = self._ctc_table(enc)
            carry = self._init_carry(ctc_logp, enc, enc_len, lmax, scorer_ctx)
            final = self._run_loop(
                enc, enc_len, maxlen, minlen, carry, ctc_logp
            )[0]
            return self._finalize(final)

    def _run_loop(self, enc, enc_len, maxlen, minlen, carry, ctc_logp):
        lmax = carry[0].alive_tokens.shape[1]

        def cond(carry):
            s, _ = carry
            room = s.step < jnp.minimum(maxlen, lmax - 1)
            viable = jnp.max(s.alive_score) > jnp.min(s.fin_score)
            return jnp.logical_and(room, viable)

        def body(carry):
            s, att_state = carry
            return self._body_core(
                enc, enc_len, minlen, ctc_logp, s, att_state, s.step
            )

        return jax.lax.while_loop(cond, body, carry)

    def _body_core(self, enc, enc_len, minlen, ctc_logp, s, att_state, step):
        """One beam step at scalar ``step``.

        ``step`` is an explicit scalar (not read from ``s.step``) so the
        lockstep batched search can share ONE counter across lanes: KV-cache
        writes at positions derived from it stay unbatched dynamic-update-
        slices instead of lowering to per-lane scatters under vmap
        (measured as the bulk of the batch-decode vmap tax).
        """
        K, W = self.K, self.W
        lmax = s.alive_tokens.shape[1]
        # 1. full scorers
        att_logp, att_state = self.att_scorer.step(
            enc, enc_len, att_state, s.alive_tokens, s.alive_len, step
        )
        full = self.att_weight * att_logp
        lm_logp = None
        if self.lm_score_fn is not None and self.lm_weight != 0.0:
            lm_logp = self.lm_score_fn(s.alive_tokens, s.alive_len)
            full = full + self.lm_weight * lm_logp
        # 2. pre-beam
        top_full, cand = jax.lax.top_k(full, W)  # [K, W]
        if self.ctc_weight != 0.0 and self.eos < self.vocab_size:
            # espnet CTC-scores eos UNCONDITIONALLY — outside the pre-beam
            # window too (ctc_prefix_score.py:180-181 writes log_psi[:, eos]
            # for every hyp; every other non-windowed token dies at
            # logzero - s_prev).  A candidate set limited to the top-W full
            # tokens therefore drops low-decoder-score eos endings the
            # reference keeps (caught by the trained-guided parity corpus:
            # 5/30 utterances decoded over-long).  Append eos as a
            # (W+1)-th candidate; NEG_INF-mask it when already in top-W so
            # no duplicate hypothesis can enter the beam.
            has_eos = jnp.any(cand == self.eos, axis=1, keepdims=True)
            eos_full = jnp.where(has_eos, NEG_INF, full[:, self.eos][:, None])
            top_full = jnp.concatenate([top_full, eos_full], axis=1)
            cand = jnp.concatenate(
                [cand, jnp.full((K, 1), self.eos, cand.dtype)], axis=1
            )
            W = W + 1
        # 3. partial scorer: CTC prefix — psi is scan-free (a reduction
        # over the parent rows); the T-length DP recurrence runs later,
        # only for the K selected extensions (ctc_prefix_advance)
        if self.ctc_weight != 0.0:
            psi = ctc_prefix_psi(
                ctc_logp, enc_len, s.ctc, cand,
                blank_id=self.blank_id, eos_id=self.eos,
            )
            # STABLE absolute-psi scoring.  espnet accumulates weighted
            # per-step deltas (scorers/ctc.py:80-85 presub - prev), whose
            # sum telescopes to ctc_weight * psi(g.c) — but through a
            # blank the deltas are +-1e10 and their f32 cancellation
            # leaves O(100) noise (a blank-then-eos path once decoded at
            # score +119).  Scoring from the absolute prefix probability
            # gives the same mathematical total with no logzero
            # round-trip; the non-CTC cumulative rides in alive_base.
            cand_score = (
                s.alive_base[:, None]
                + top_full
                + self.ctc_weight * psi
                + self.penalty
            )
        else:
            psi = jnp.zeros((K, W))
            cand_score = s.alive_score[:, None] + top_full + self.penalty

        # 4. espnet-exact selection (beam_search.py:316 + post_process:500):
        # top-K over ALL candidates first (eos included, competing on raw
        # score); THEN the selected eos hyps retire into the finished
        # buffer (if past minlen) and their beam slots die for this step.
        # Retiring best-eos-candidates unconditionally (even when they
        # would not survive the beam) admits hypotheses the reference
        # prunes — caught by the golden hypothesis-parity test.
        new_score, flat_idx = jax.lax.top_k(cand_score.reshape(-1), K)
        parent = flat_idx // W
        cidx = flat_idx % W
        token = cand[parent, cidx]
        ins = s.alive_len[parent]
        new_tokens = s.alive_tokens[parent]
        new_tokens = jnp.where(
            jnp.arange(lmax)[None, :] == ins[:, None], token[:, None], new_tokens
        )
        new_len = ins + 1
        is_eos_sel = token == self.eos

        # per-scorer breakdown (espnet Hypothesis.scores: raw unweighted
        # cumulative score per scorer, beam_search.py merge_scores:263).
        # The cumulative CTC part telescopes to the absolute prefix
        # probability, so it is SET (not accumulated) from psi.
        att_part = att_logp[parent, token]
        lm_part = lm_logp[parent, token] if lm_logp is not None else jnp.zeros((K,))
        new_parts = s.alive_parts[parent] + jnp.stack(
            [att_part, jnp.zeros((K,)), lm_part, jnp.ones((K,))], axis=1
        )
        if self.ctc_weight != 0.0:
            new_parts = new_parts.at[:, 1].set(psi[parent, cidx])

        # finished-buffer merge (only eos hyps at/after minlen retire;
        # below-minlen eos hyps are dropped entirely, like the reference)
        fin_cand = jnp.where(is_eos_sel & (step >= minlen), new_score, NEG_INF)
        all_fin_scores = jnp.concatenate([s.fin_score, fin_cand])
        all_fin_tokens = jnp.concatenate([s.fin_tokens, new_tokens])
        all_fin_len = jnp.concatenate([s.fin_len, new_len])
        all_fin_parts = jnp.concatenate([s.fin_parts, new_parts])
        fin_top, fin_idx = jax.lax.top_k(all_fin_scores, K)
        fin_tokens = all_fin_tokens[fin_idx]
        fin_len = all_fin_len[fin_idx]
        fin_parts = all_fin_parts[fin_idx]

        # 5. alive beam: eos slots are dead for the rest of the search
        new_score = jnp.where(is_eos_sel, NEG_INF, new_score)
        new_base = jnp.where(
            is_eos_sel, NEG_INF,
            s.alive_base[parent] + top_full[parent, cidx] + self.penalty,
        ) if self.ctc_weight != 0.0 else new_score
        if self.ctc_weight != 0.0:
            new_ctc = ctc_prefix_advance(
                ctc_logp, enc_len, s.ctc, token, parent,
                psi[parent, cidx], blank_id=self.blank_id,
            )
        else:
            new_ctc = s.ctc._replace(
                psi=psi[parent, cidx],
                last=token.astype(jnp.int32),
                empty=jnp.zeros(parent.shape, bool),
                r=s.ctc.r[parent],
            )
        att_state = self.att_scorer.select(att_state, parent)

        return (
            BeamState(
                step=step + 1,
                alive_tokens=new_tokens,
                alive_len=new_len,
                alive_score=new_score,
                alive_base=new_base,
                alive_parts=new_parts,
                ctc=new_ctc,
                fin_tokens=fin_tokens,
                fin_len=fin_len,
                fin_score=fin_top,
                fin_parts=fin_parts,
            ),
            att_state,
        )


    def _finalize(self, final: BeamState):
        # merge still-alive hyps (maxlen reached) into finished (post_process
        # at last step, beam_search.py:500): append eos, keep raw score.
        alive_rows = jnp.where(
            jnp.arange(final.alive_tokens.shape[1])[None, :]
            == final.alive_len[:, None],
            self.eos,
            final.alive_tokens,
        )
        all_scores = jnp.concatenate([final.fin_score, final.alive_score])
        all_tokens = jnp.concatenate([final.fin_tokens, alive_rows])
        all_len = jnp.concatenate([final.fin_len, final.alive_len + 1])
        all_parts = jnp.concatenate([final.fin_parts, final.alive_parts])
        top, idx = jax.lax.top_k(all_scores, self.K)
        return all_tokens[idx], all_len[idx], top, all_parts[idx]

    # -- streaming continuation (batch_beam_search_online analog) --------
    # The search state is a resumable pytree: each audio chunk extends the
    # encoder buffer, the alive hypotheses' CTC DP rows are extended over the
    # new frames (CTCPrefixScoreTH.extend_prob/extend_state,
    # ctc_prefix_score.py:222-270), and the while_loop continues from where
    # it stopped with a larger frame budget — no re-decoding of earlier
    # tokens, no re-encoding of earlier audio.

    def _sync_stream_weights(self):
        """Streaming jits always close over self.variables (no traced-weights
        mechanism on this path): drop them when the weights object was
        reassigned so a checkpoint swap retraces instead of silently decoding
        with stale constants (same contract as _call_weights)."""
        if self._default_att_scorer:
            self.att_scorer.variables = self.variables
        ident = (id(self.variables),
                 id(getattr(self.att_scorer, "variables", None)))
        if getattr(self, "_stream_weights_id", None) != ident:
            for a in ("_stream_start_jit", "_stream_step_jit"):
                if hasattr(self, a):
                    delattr(self, a)
            self._stream_weights_id = ident

    def stream_start(self, ctc_logp, enc_buf, enc_len, lmax: int, scorer_ctx=None):
        """Initial resumable carry over a partially-filled encoder buffer."""
        self._sync_stream_weights()
        if not hasattr(self, "_stream_start_jit"):
            self._stream_start_jit = jax.jit(
                lambda ctc_logp, enc, enc_len, scorer_ctx, lmax: self._init_carry(
                    ctc_logp, enc, enc_len, lmax, scorer_ctx
                ),
                static_argnames=("lmax",),
            )
        return self._stream_start_jit(ctc_logp, enc_buf, enc_len, scorer_ctx, lmax=lmax)

    def stream_step(
        self, enc_buf, enc_len_old, enc_len_new, maxlen, minlen, carry, ctc_logp
    ):
        """Extend CTC state over the new frames, then continue the search."""
        self._sync_stream_weights()
        if not hasattr(self, "_stream_step_jit"):
            def _step(enc_buf, old, new, maxlen, minlen, carry, ctc_logp):
                from llm_guided_asr_tpu.search.ctc_prefix import ctc_prefix_extend

                state, att = carry
                if self.ctc_weight != 0.0:
                    state = state._replace(
                        ctc=ctc_prefix_extend(
                            state.ctc, ctc_logp, old, new, self.blank_id
                        )
                    )
                return self._run_loop(
                    enc_buf, new, maxlen, minlen, (state, att), ctc_logp
                )

            self._stream_step_jit = jax.jit(_step)
        return self._stream_step_jit(
            enc_buf, enc_len_old, enc_len_new, maxlen, minlen, carry, ctc_logp
        )

    def stream_hyps(self, carry, nbest: int = 1) -> List[Hypothesis]:
        """Current best hypotheses (partial or final) from a resumable carry."""
        if not hasattr(self, "_finalize_jit"):
            self._finalize_jit = jax.jit(self._finalize)
        tokens, lens, scores, parts = self._finalize_jit(carry[0])
        return self._to_hyps(tokens, lens, scores, nbest, parts)

    # -- public API -----------------------------------------------------
    def __call__(
        self,
        enc: jnp.ndarray,  # [1, T, D]
        enc_lens: jnp.ndarray,  # [1]
        maxlenratio: float = 0.0,
        minlenratio: float = 0.0,
        nbest: int = 1,
        scorer_ctx=None,  # traced per-utterance scorer context (e.g. bias ids)
    ) -> List[Hypothesis]:
        t_enc = int(enc.shape[1])
        enc_len = enc_lens[0]
        if maxlenratio == 0.0:
            maxlen = enc_len
        elif maxlenratio < 0.0:
            maxlen = jnp.asarray(int(-maxlenratio), jnp.int32)
        else:
            maxlen = jnp.maximum(1, (maxlenratio * enc_len).astype(jnp.int32))
        minlen = (minlenratio * enc_len).astype(jnp.int32)
        lmax = self._lmax(t_enc, maxlenratio)
        weights = self._call_weights()
        tokens, lens, scores, parts = jax.device_get(
            self._search_jit(enc, enc_len, maxlen, minlen, scorer_ctx,
                             weights, lmax=lmax)
        )  # ONE host transfer for the whole result pytree (remote-device RTT)
        return self._to_hyps(tokens, lens, scores, nbest, parts)

    @staticmethod
    def _lmax(t_enc: int, maxlenratio: float) -> int:
        """Static token-buffer size: don't carry T_enc-sized state when the
        output is capped far shorter (scorer KV buffers scale with this).

        The cap must NOT be clamped to t_enc: generation tasks (MT, unit
        TTS/S2ST) legitimately emit more tokens than encoder frames — an
        earlier min(bound, t_enc) silently truncated those decodes."""
        if maxlenratio < 0.0:
            bound = int(-maxlenratio)
        elif maxlenratio > 0.0:
            bound = int(maxlenratio * t_enc) + 1
        else:
            bound = t_enc
        return bound + 2

    def _to_hyps(self, tokens, lens, scores, nbest: int, parts=None) -> List[Hypothesis]:
        tokens = np.asarray(tokens)
        lens = np.asarray(lens)
        scores = np.asarray(scores)
        parts = np.asarray(parts) if parts is not None else None
        out = []
        for k in range(min(nbest, self.K)):
            if scores[k] <= NEG_INF / 2:
                continue
            breakdown = {}
            if parts is not None:
                breakdown = {"decoder": float(parts[k, 0])}
                if self.ctc_weight != 0.0:
                    breakdown["ctc"] = float(parts[k, 1])
                if self.lm_score_fn is not None and self.lm_weight != 0.0:
                    breakdown["lm"] = float(parts[k, 2])
                if self.penalty != 0.0:
                    breakdown["length_bonus"] = float(parts[k, 3])
            out.append(
                Hypothesis(
                    yseq=[int(t) for t in tokens[k, : lens[k]]],
                    score=float(scores[k]),
                    scores=breakdown,
                )
            )
        if not out:
            out = [Hypothesis(yseq=[self.sos, self.eos], score=float(scores[0]), scores={})]
        return out

    def batch_decode(
        self,
        encs: jnp.ndarray,  # [B, T, D]
        enc_lens: jnp.ndarray,  # [B]
        maxlenratio: float = 0.0,
        minlenratio: float = 0.0,
        nbest: int = 1,
    ) -> List[List[Hypothesis]]:
        """Decode a whole batch of utterances in one on-device call."""
        t_enc = int(encs.shape[1])
        if maxlenratio == 0.0:
            maxlens = enc_lens
        elif maxlenratio < 0.0:
            maxlens = jnp.full_like(enc_lens, int(-maxlenratio))
        else:
            maxlens = jnp.maximum(1, (maxlenratio * enc_lens).astype(jnp.int32))
        minlens = (minlenratio * enc_lens).astype(jnp.int32)
        weights = self._call_weights()
        tokens, lens, scores, parts = jax.device_get(
            self._batch_search_jit(
                encs, enc_lens, maxlens, minlens, weights,
                lmax=self._lmax(t_enc, maxlenratio),
            )
        )  # ONE host transfer for the whole batch: per-field np.asarray would
        # pay a device->host round-trip per utterance per array (B x 4 RTTs),
        # which dominates end-to-end decode latency on remote/tunneled devices
        return [
            self._to_hyps(tokens[b], lens[b], scores[b], nbest, parts[b])
            for b in range(encs.shape[0])
        ]
