#!/usr/bin/env python3
"""True incremental streaming inference (batch_beam_search_online analog).

Rebuild of espnet2/bin/asr_inference_streaming.py + the real online search
(espnet/nets/batch_beam_search_online.py): audio arrives in chunks and ALL
state is carried forward —

- STFT/log-mel frames are computed only for new samples (frames whose window
  would touch the signal's future end-padding are deferred);
- the contextual-block encoder consumes new feature frames with carried
  per-layer context vectors (``encode_chunk``) — no re-encoding: outputs are
  bit-equal to the offline pass because attention is block-causal;
- the on-device beam search resumes from its carried state: alive
  hypotheses' CTC prefix DP rows are extended over the new frames
  (CTCPrefixScoreTH.extend_prob/extend_state, ctc_prefix_score.py:222-270)
  and the while_loop continues with a larger frame budget.  Committed tokens
  are never re-decoded.

Mid-stream the token budget is gated by the first-pass CTC greedy length
over the *trusted* region (all frames except the last ``lookahead_blocks``
encoder blocks), so hypotheses never outrun the audio — the espnet online
search's block-reliability guard in on-device form.

Per-chunk latency is bounded: each chunk costs one fixed-shape encoder-chunk
forward plus however many search steps the new audio unlocks.  Offline and
streaming decodes agree when encoder outputs are identical (contextual-block
encoder) and normalization is streamable (global_mvn / none; utterance_mvn
needs the whole utterance by definition — it falls back to re-encode mode).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from llm_guided_asr_tpu.bin.asr_inference import Speech2Text
from llm_guided_asr_tpu.data.dataset import round_up

logger = logging.getLogger(__name__)

NEG_INF = -1.0e10


class Speech2TextStreaming:
    """Chunk-fed recognizer carrying encoder + search state across chunks."""

    def __init__(
        self,
        asr_train_config: Union[str, Path],
        asr_model_file: Optional[Union[str, Path]] = None,
        chunk_samples: int = 16000,
        lookahead_blocks: int = 1,
        incremental: Optional[bool] = None,
        **kwargs,
    ):
        self.s2t = Speech2Text(asr_train_config, asr_model_file, **kwargs)
        self.chunk_samples = chunk_samples
        self.lookahead_blocks = lookahead_blocks
        model = self.s2t.model
        cfg = model.cfg
        # (setup-defined submodules like model.encoder only exist inside
        # apply — detect streamability from the config)
        can_increment = (
            getattr(cfg, "encoder_type", None) == "contextual_block_conformer"
            and cfg.frontend is not None
            and getattr(cfg, "normalize", "none") != "utterance_mvn"
            and self.s2t._beam is not None
            and type(self.s2t._beam.att_scorer).__name__ == "StatelessAttScorer"
        )
        self.incremental = can_increment if incremental is None else incremental
        if self.incremental and not can_increment:
            raise ValueError(
                "incremental streaming needs a contextual-block encoder, a "
                "streamable normalize (global_mvn/none), and the default "
                "attention scorer"
            )
        if self.incremental:
            f = cfg.frontend
            self._n_fft, self._hop = f.n_fft, f.hop_length
            self._n_mels = f.n_mels
            self._f = f
            self._block = cfg.encoder.block_size
            self._n_layers = cfg.encoder.num_blocks
            self._d = cfg.encoder.output_size
            self._feats_fn = jax.jit(self._feats_chunk)
            self._enc_chunk_fn = jax.jit(
                lambda feats, ctxs, off, nv: model.apply(
                    self.s2t.variables, feats, ctxs, off, nv,
                    method=lambda m, *a: m.encoder.encode_chunk(*a),
                )
            )
            self._ctc_rows_fn = jax.jit(
                lambda enc_chunk: model.apply(
                    self.s2t.variables, enc_chunk, method=model.ctc_log_softmax
                )[0]
            )
        self.reset()

    # -- incremental frontend -------------------------------------------
    def _feats_chunk(self, frames: jnp.ndarray) -> jnp.ndarray:
        """[1, T, n_fft] raw sample windows -> [T, n_mels] normalized feats.

        Same window + rfft + log-mel math as ops.frontend.stft/default_frontend,
        applied to pre-gathered sample windows (the wrapper handles framing)."""
        from llm_guided_asr_tpu.ops.frontend import _hann_window, logmel_from_power

        f = self._f
        win_length = f.win_length or f.n_fft
        w = _hann_window(win_length)
        if win_length < f.n_fft:
            left = (f.n_fft - win_length) // 2
            w = np.pad(w, (left, f.n_fft - win_length - left))
        spec = jnp.fft.rfft(frames * jnp.asarray(w), axis=-1)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
        feats = logmel_from_power(power, f.fs, f.n_fft, self._n_mels, f.fmin, f.fmax, f.htk)
        model = self.s2t.model
        if model.cfg.normalize == "global_mvn":
            mvn = self.s2t.variables["mvn"]
            feats = (feats - mvn["mean"]) * mvn["inv_std"]
        return feats[0]

    def reset(self):
        self._buffer = np.zeros((0,), np.float32)
        if not self.incremental:
            return
        self._frames_done = 0
        self._feats = np.zeros((0, self._n_mels), np.float32)
        self._sub_done = 0
        self._ctxs = jnp.zeros((self._n_layers, 1, self._d), jnp.float32)
        self._cap = 16 * self._block
        self._enc = np.zeros((self._cap, self._d), np.float32)
        self._ctc_logp = np.full((self._cap, self.s2t.model.cfg.vocab_size), 0.0, np.float32)
        self._carry = None
        self._lmax = self._cap + 2

    # -- capacity management ---------------------------------------------
    def _ensure_capacity(self, need_frames: int):
        if need_frames <= self._cap:
            return
        new_cap = self._cap
        while new_cap < need_frames:
            new_cap *= 2
        grow = new_cap - self._cap
        self._enc = np.concatenate([self._enc, np.zeros((grow, self._d), np.float32)])
        self._ctc_logp = np.concatenate(
            [self._ctc_logp, np.zeros((grow, self._ctc_logp.shape[1]), np.float32)]
        )
        new_lmax = new_cap + 2
        if self._carry is not None:
            state, att = self._carry
            pad_l = new_lmax - state.alive_tokens.shape[1]
            sos = self.s2t._beam.sos
            state = state._replace(
                alive_tokens=jnp.pad(state.alive_tokens, ((0, 0), (0, pad_l)), constant_values=sos),
                fin_tokens=jnp.pad(state.fin_tokens, ((0, 0), (0, pad_l))),
                ctc=state.ctc._replace(
                    r=jnp.pad(state.ctc.r, ((0, 0), (0, grow), (0, 0)), constant_values=NEG_INF)
                ),
            )
            self._carry = (state, att)
        self._cap, self._lmax = new_cap, new_lmax

    # -- main entry -------------------------------------------------------
    def __call__(
        self, speech: np.ndarray, is_final: bool = False
    ) -> List[Tuple[str, list, list, object]]:
        """Feed one chunk; returns current (partial or final) hypotheses."""
        if not self.incremental:
            # re-encode fallback (batch_beam_search_online_sim analog)
            self._buffer = np.concatenate([self._buffer, np.asarray(speech, np.float32)])
            results = self.s2t(self._buffer)
            if is_final:
                self.reset()
            return results
        self._buffer = np.concatenate([self._buffer, np.asarray(speech, np.float32)])
        self._advance(is_final)
        results = self._current_results(is_final)
        if is_final:
            self.reset()
        return results

    def _advance(self, is_final: bool):
        n = len(self._buffer)
        n_fft, hop = self._n_fft, self._hop
        half = n_fft // 2
        # 1. new STFT frames: frame t covers samples [t*hop - half, t*hop + half)
        if is_final:
            f_total = n // hop + 1 if n > 0 else 0
        else:
            f_total = (n - half) // hop + 1 if n >= half else 0
        if f_total > self._frames_done:
            f0, f1 = self._frames_done, f_total
            # offline pads speech with zeros to a bucket multiple BEFORE the
            # STFT's reflect padding, so the start reflection reads real
            # samples (zero-extended if tiny) and the frames near the valid
            # end read zeros — mirror exactly
            src = self._buffer
            if len(src) < half + 1:
                src = np.concatenate([src, np.zeros(half + 1 - len(src), np.float32)])
            padded = np.concatenate([src[1 : half + 1][::-1], self._buffer])
            if is_final:
                padded = np.concatenate([padded, np.zeros(half + hop, np.float32)])
            idx = np.arange(f0, f1)[:, None] * hop + np.arange(n_fft)[None, :]
            frames = jnp.asarray(padded[idx][None])  # [1, T, n_fft]
            new_feats = np.asarray(self._feats_fn(frames))
            self._feats = np.concatenate([self._feats, new_feats])
            self._frames_done = f1

        # 2. new encoder sub-frames in whole blocks
        S = self._block
        F_avail = self._feats.shape[0]
        if is_final:
            s_total = (self._frames_done + 3) // 4
            s_next = s_total
        else:
            s_safe = max((F_avail - 3) // 4, 0)
            s_next = (s_safe // S) * S
            s_total = None
        while s_next > self._sub_done:
            if is_final:
                m = round_up(s_next - self._sub_done, S)
                n_valid = s_next - self._sub_done
            else:
                m = min(s_next - self._sub_done, 4 * S)  # bounded per-chunk latency
                n_valid = m
            need = 4 * (self._sub_done + m) + 6
            buf = np.zeros((need, self._n_mels), np.float32)
            take = min(need, F_avail)
            buf[:take] = self._feats[:take]
            chunk = jnp.asarray(buf[4 * self._sub_done : 4 * self._sub_done + 4 * m + 6][None])
            out, self._ctxs = self._enc_chunk_fn(
                chunk, self._ctxs, jnp.asarray(self._sub_done), jnp.asarray(n_valid)
            )
            self._ensure_capacity(self._sub_done + n_valid)
            rows = np.asarray(self._ctc_rows_fn(out))
            self._enc[self._sub_done : self._sub_done + n_valid] = np.asarray(out[0, :n_valid])
            self._ctc_logp[self._sub_done : self._sub_done + n_valid] = rows[:n_valid]
            self._sub_done += n_valid

        # 3. resume the search
        beam = self.s2t._beam
        if beam is None or self._sub_done == 0:
            return
        enc_buf = jnp.asarray(self._enc[None])
        ctc_buf = jnp.asarray(self._ctc_logp)
        enc_len_new = jnp.asarray(self._sub_done, jnp.int32)
        if self._carry is None:
            self._carry = beam.stream_start(ctc_buf, enc_buf, enc_len_new, self._lmax)
            # stream_start already ran the CTC prefix DP over all _sub_done
            # frames; starting extend at 0 would re-add frame blanks from the
            # r_b[0] base and shift every subsequent streaming score
            self._enc_len_prev = int(self._sub_done)
        # token budget: CTC greedy count over the trusted region
        guard = 0 if is_final else self.lookahead_blocks * S
        trusted = max(self._sub_done - guard, 0)
        am = self._ctc_logp[:trusted].argmax(-1)
        collapsed = am[np.concatenate([[True], am[1:] != am[:-1]])] if trusted else np.zeros(0)
        n_ctc = int((collapsed != beam.blank_id).sum())
        if is_final:
            ratio = self.s2t.maxlenratio
            if ratio == 0.0:
                maxlen = self._sub_done
            elif ratio < 0.0:
                maxlen = int(-ratio)
            else:
                maxlen = max(1, int(ratio * self._sub_done))
            minlen = int(self.s2t.minlenratio * self._sub_done)
        else:
            maxlen = min(n_ctc, self._sub_done)
            minlen = 0
        self._carry = beam.stream_step(
            enc_buf, jnp.asarray(self._enc_len_prev, jnp.int32), enc_len_new,
            jnp.asarray(maxlen, jnp.int32), jnp.asarray(minlen, jnp.int32),
            self._carry, ctc_buf,
        )
        self._enc_len_prev = self._sub_done

    def _current_results(self, is_final: bool):
        from llm_guided_asr_tpu.bin.asr_inference import Hypothesis

        beam = self.s2t._beam
        if beam is None or self._carry is None:
            return [("", [], [], Hypothesis(yseq=[], score=0.0))]
        hyps = beam.stream_hyps(self._carry, nbest=self.s2t.nbest)
        out = []
        for hyp in hyps[: self.s2t.nbest]:
            ids = [
                i for i in hyp.yseq
                if i not in (self.s2t.model.cfg.sos_id, self.s2t.model.cfg.eos_id)
            ]
            tokens = self.s2t.converter.ids2tokens(ids)
            text = self.s2t.tokenizer.tokens2text(tokens)
            out.append((text, tokens, ids, Hypothesis(yseq=ids, score=hyp.score, scores=hyp.scores)))
        return out

    def decode_utterance(self, speech: np.ndarray) -> List:
        """Stream a whole utterance chunk-by-chunk; returns per-chunk partials."""
        self.reset()
        partials = []
        n = len(speech)
        for start in range(0, max(n, 1), self.chunk_samples):
            chunk = speech[start : start + self.chunk_samples]
            final = start + self.chunk_samples >= n
            partials.append(self(chunk, is_final=final))
        return partials
