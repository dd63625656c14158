"""LLM-guided ASR model — the fork's headline contribution, TPU-native.

Rebuild of espnet2/asr/llm_guided_asr_model.py:47 (LLMGuidedASRModel) and
espnet2/asr/decoder/transformer_decoder.py:946 (LLMGuidedTransformerDecoder):

- sos/eos are the LLM's response-delimiter token ids (llm_guided_asr_model.py:76-80);
- the CTC head is shared into the decoder, which runs first-pass greedy CTC
  internally (transformer_decoder.py:1021-1039) — here fully on-device;
- the frozen LLM is prompted with [prefix | ctc-hyp | suffix | response] and
  its last hidden states at the response positions feed a
  Linear(llm_hidden -> enc_dim) installed as the decoder 'embed'
  (llm_guided_asr_model.py:119-125);
- a 6-block transformer decoder cross-attends to the encoder memory and emits
  logits over the LLM vocabulary;
- loss = ctc_weight*ctc + (1-ctc_weight)*label-smoothed att CE
  (llm_guided_asr_model.py:196-218).

TPU-first: the entire training step — encoder, greedy CTC, prompt packing,
LLM forward, guided decoder — is ONE jitted graph with static shapes; the
reference's host-side detokenize/retokenize loop is eliminated.  The same
``decoder_logits`` method plugs into the on-device BatchBeamSearch unchanged,
so LLM-guided decoding needs no bespoke search code.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.conformer import (
    ConformerConfig,
    ConformerEncoder,
    TransformerEncoder,
)
from llm_guided_asr_tpu.models.llm.llama import LlamaConfig, LlamaModel
from llm_guided_asr_tpu.models.llm.prompt import (
    PromptTemplate,
    gather_response,
    pack_prompt,
)
from llm_guided_asr_tpu.models.transformer import DecoderLayer
from llm_guided_asr_tpu.models.transformer_decoder import TransformerDecoderConfig
from llm_guided_asr_tpu.ops.frontend import (
    FrontendConfig,
    default_frontend,
    global_mvn,
    utterance_mvn,
)
from llm_guided_asr_tpu.ops.losses import (
    accuracy,
    add_sos_eos,
    ctc_loss,
    label_smoothing_loss,
)
from llm_guided_asr_tpu.ops.specaug import SpecAugConfig, specaug
from llm_guided_asr_tpu.search.greedy import ctc_greedy_decode
from llm_guided_asr_tpu.utils.masks import causal_attn_mask, make_valid_mask

logger = logging.getLogger(__name__)

Dtype = Any


@dataclasses.dataclass(frozen=True)
class LLMGuidedASRConfig:
    vocab_size: int  # = LLM vocab size
    llm: LlamaConfig
    prompt: PromptTemplate
    frontend: Optional[FrontendConfig] = FrontendConfig()
    specaug: Optional[SpecAugConfig] = None
    normalize: str = "global_mvn"
    encoder_type: str = "conformer"
    encoder: ConformerConfig = ConformerConfig()
    decoder: TransformerDecoderConfig = TransformerDecoderConfig()
    ctc_weight: float = 0.3
    lsm_weight: float = 0.0
    length_normalized_loss: bool = False
    ignore_id: int = -1
    blank_id: int = 0  # llm_guided_asr_model.py:78-80
    # mixed-vocab CTC (the reference's ctc_vocab_path,
    # transformer_decoder.py:1002-1010 + tasks/asr.py:625-632): CTC over its
    # own (BPE) vocab; greedy hyps are expanded to LLM ids on device via a
    # precomputed map stored in the 'ctc_map' variable collection.
    ctc_vocab_size: Optional[int] = None
    ctc_map_width: int = 8  # max LLM ids per CTC token
    # decode-time LLM scoring mode (llama.py:240,259-262 'log_softmax'):
    # 'hidden'      — LLM last hidden states feed the guided decoder (default)
    # 'log_softmax' — the LLM's own next-token log-probs ARE the scores;
    #                 the guided decoder is bypassed (pure LM scoring)
    llm_score_mode: str = "hidden"
    # reference-compat quirk: the reference's training-time first-pass CTC
    # collapse runs over the FULL padded encoder output — pad frames beyond
    # hlens leak tokens into shorter utterances' prompts
    # (transformer_decoder.py:1021-1039 iterates lpz rows with no hlens trim).
    # Default False = trim to valid frames (the sane behavior); True restores
    # bit-parity with reference training (tests/test_parity_llm_guided.py).
    first_pass_pad_frames: bool = False

    @property
    def sos_id(self) -> int:
        return self.prompt.start_of_response_id

    @property
    def eos_id(self) -> int:
        return self.prompt.end_of_response_id


class LLMGuidedASRModel(nn.Module):
    cfg: LLMGuidedASRConfig
    dtype: Dtype = jnp.float32
    llm_dtype: Dtype = jnp.float32  # bfloat16 for real checkpoints

    def setup(self):
        cfg = self.cfg
        from llm_guided_asr_tpu.models.conformer import make_encoder

        self.encoder = make_encoder(cfg.encoder_type, cfg.encoder, self.dtype, name="encoder")
        ctc_dim = cfg.ctc_vocab_size or cfg.vocab_size
        self.ctc_head = nn.Dense(ctc_dim, dtype=self.dtype, name="ctc_head")
        if cfg.ctc_vocab_size:
            w = cfg.ctc_map_width
            self.ctc_map_ids = self.variable(
                "ctc_map", "ids", lambda: jnp.zeros((ctc_dim, w), jnp.int32)
            )
            self.ctc_map_lens = self.variable(
                "ctc_map", "lens", lambda: jnp.zeros((ctc_dim,), jnp.int32)
            )
        self.llm = LlamaModel(cfg.llm, dtype=self.llm_dtype, name="llm")
        # Linear(llm_hidden -> enc_dim) installed as decoder embed
        self.embed = nn.Dense(cfg.encoder.output_size, dtype=self.dtype, name="embed")
        dec = cfg.decoder
        self.decoders = [
            DecoderLayer(
                dec.attention_heads,
                dec.linear_units,
                dec.dropout_rate,
                dec.self_attention_dropout_rate,
                dec.src_attention_dropout_rate,
                dtype=self.dtype,
                name=f"block_{i}",
            )
            for i in range(dec.num_blocks)
        ]
        self.after_norm = nn.LayerNorm(dtype=self.dtype, name="after_norm")
        self.output_layer = nn.Dense(cfg.vocab_size, dtype=self.dtype, name="output_layer")
        n_feat = cfg.frontend.n_mels if cfg.frontend is not None else 1
        if cfg.normalize == "global_mvn":
            self.mvn_mean = self.variable("mvn", "mean", lambda: jnp.zeros((n_feat,), jnp.float32))
            self.mvn_inv_std = self.variable("mvn", "inv_std", lambda: jnp.ones((n_feat,), jnp.float32))

    # ------------------------------------------------------------------
    def _extract_feats(self, speech, speech_lengths):
        cfg = self.cfg
        if cfg.frontend is not None and speech.ndim == 2:
            f = cfg.frontend
            return default_frontend(
                speech, speech_lengths, fs=f.fs, n_fft=f.n_fft,
                win_length=f.win_length, hop_length=f.hop_length, n_mels=f.n_mels,
                fmin=f.fmin, fmax=f.fmax, htk=f.htk, center=f.center, window=f.window,
            )
        return speech, speech_lengths

    def collect_feats(self, speech, speech_lengths):
        feats, feats_lengths = self._extract_feats(speech, speech_lengths)
        return {"feats": feats, "feats_lengths": feats_lengths}

    def encode(self, speech, speech_lengths, deterministic: bool = True):
        cfg = self.cfg
        feats, feats_lengths = self._extract_feats(speech, speech_lengths)
        if cfg.specaug is not None and not deterministic:
            feats = specaug(self.make_rng("specaug"), feats, feats_lengths, cfg.specaug)
        if cfg.normalize == "global_mvn":
            feats = global_mvn(feats, self.mvn_mean.value, self.mvn_inv_std.value, feats_lengths)
        elif cfg.normalize == "utterance_mvn":
            feats = utterance_mvn(feats, feats_lengths)
        feats = feats.astype(self.dtype)
        # the phase-2 recipe freezes the encoder and forces eval mode
        # (is_encoder_eval, llm_guided_asr_model.py:160-162): dropout off
        return self.encoder(feats, feats_lengths, deterministic=True)

    def ctc_logits(self, encoder_out):
        return self.ctc_head(encoder_out)

    def ctc_log_softmax(self, encoder_out):
        return jax.nn.log_softmax(self.ctc_head(encoder_out).astype(jnp.float32), axis=-1)

    # ------------------------------------------------------------------
    def _llm_response_states(
        self, encoder_out, encoder_out_lengths, ys_in, ys_in_lengths,
        bias_words=None, bias_words_lengths=None,
    ):
        """First-pass CTC -> prompt pack -> frozen LLM -> response hidden states."""
        cfg = self.cfg
        hyp, hyp_lengths = self._first_pass_hyp(encoder_out, encoder_out_lengths)
        ids, valid, resp_start = pack_prompt(
            cfg.prompt, hyp, hyp_lengths, ys_in, ys_in_lengths,
            bias=bias_words, bias_lengths=bias_words_lengths,
        )
        # the LLM is frozen (freeze_param decoder.llm.lm, is_llm_eval):
        # stop_gradient keeps XLA from building its backward graph
        hidden, _ = self.llm(ids, valid)
        hidden = jax.lax.stop_gradient(hidden)
        resp_hidden = gather_response(hidden, resp_start, ys_in.shape[1])
        resp_valid = make_valid_mask(ys_in_lengths, ys_in.shape[1])
        return jnp.where(resp_valid[..., None], resp_hidden.astype(self.dtype), 0.0)

    def _first_pass_hyp(self, encoder_out, encoder_out_lengths):
        """Greedy CTC hyp in LLM-vocab ids (mixed vocab: expand via ctc_map,
        the on-chip analog of detokenize+retokenize)."""
        cfg = self.cfg
        ctc_lp = self.ctc_log_softmax(encoder_out)
        if cfg.first_pass_pad_frames:
            encoder_out_lengths = jnp.full_like(
                encoder_out_lengths, encoder_out.shape[1]
            )
        hyp, hyp_lengths = ctc_greedy_decode(
            ctc_lp, encoder_out_lengths, blank_id=cfg.blank_id, pad_id=cfg.prompt.pad_id
        )
        if cfg.ctc_vocab_size:
            from llm_guided_asr_tpu.models.llm.prompt import expand_token_ids

            hyp, hyp_lengths = expand_token_ids(
                self.ctc_map_ids.value, self.ctc_map_lens.value,
                hyp, hyp_lengths, cfg.prompt.pad_id,
            )
        return hyp, hyp_lengths

    def decoder_logits(
        self,
        encoder_out,
        encoder_out_lengths,
        ys_in,
        ys_in_lengths,
        deterministic: bool = True,
        bias_words=None,
        bias_words_lengths=None,
    ):
        """Guided decoder forward (transformer_decoder.py:1014-1065)."""
        cfg = self.cfg
        tgt = self._llm_response_states(
            encoder_out, encoder_out_lengths, ys_in, ys_in_lengths,
            bias_words, bias_words_lengths,
        )
        x = self.embed(tgt)
        tgt_mask = causal_attn_mask(ys_in_lengths, ys_in.shape[1])
        memory_mask = make_valid_mask(encoder_out_lengths, encoder_out.shape[1])[:, None, :]
        for layer in self.decoders:
            x = layer(x, tgt_mask, encoder_out, memory_mask, deterministic)
        x = self.after_norm(x)
        return self.output_layer(x)

    # ------------------------------------------------------------------
    # cached decoding (TPU rebuild of forward_one_step_cached /
    # batch_score_cached, transformer_decoder.py:1134-1235 + the
    # shared-prefix KV trick of llama.py:269-356)
    # ------------------------------------------------------------------
    def decode_prefix(self, encoder_out, encoder_out_lengths, beam: int, resp_max: int,
                      bias_words=None, bias_words_lengths=None):
        """First-pass CTC + prompt-only LLM forward; build static KV buffers.

        The prompt KV is computed ONCE per utterance and broadcast across the
        beam (llama.py:288-314); response positions are appended per beam at
        static offsets.  Returns the scorer state pytree.
        """
        cfg = self.cfg
        hyp, hyp_lengths = self._first_pass_hyp(encoder_out, encoder_out_lengths)
        b = encoder_out.shape[0]
        empty_resp = jnp.zeros((b, 0), jnp.int32)
        ids, valid, _ = pack_prompt(
            cfg.prompt, hyp, hyp_lengths, empty_resp, jnp.zeros((b,), jnp.int32),
            bias=bias_words, bias_lengths=bias_words_lengths,
        )
        _, cache = self.llm(ids, valid)
        tp = ids.shape[1]
        tc = tp + resp_max
        n_layers = cfg.llm.num_hidden_layers
        hkv = cfg.llm.num_key_value_heads
        hd = cfg.llm.hidden_size // cfg.llm.num_attention_heads
        # per-layer padded KV buffers (tuples, NOT a stacked [L,...] array:
        # the in-place decode path returns each layer's updated buffer —
        # re-stacking would copy the full cache every step)
        k_bufs, v_bufs = [], []
        for k, v in cache["layers"]:
            kb = jnp.zeros((beam, tc, hkv, hd), jnp.float32)
            vb = jnp.zeros((beam, tc, hkv, hd), jnp.float32)
            kb = kb.at[:, :tp].set(jnp.broadcast_to(k[:1], (beam, tp, hkv, hd)))
            vb = vb.at[:, :tp].set(jnp.broadcast_to(v[:1], (beam, tp, hkv, hd)))
            k_bufs.append(jax.lax.stop_gradient(kb))
            v_bufs.append(jax.lax.stop_gradient(vb))
        kv_valid = jnp.zeros((beam, tc), bool).at[:, :tp].set(
            jnp.broadcast_to(valid[:1], (beam, tp))
        )
        prompt_nvalid = jnp.sum(valid[0].astype(jnp.int32))
        # guided-decoder caches (forward_one_step_cached analog,
        # transformer_decoder.py:1134-1235): the memory K/V projections are
        # utterance-constant — computing them inside every decode step was
        # ~6 layers x 2 x [T,D]x[D,D] matmuls/step, the measured bulk of the
        # guided per-step cost; and per-layer input-stream buffers make the
        # decoder pass incremental (one position/step) instead of re-running
        # the full response buffer.
        d_model = cfg.encoder.output_size
        n_blocks = len(self.decoders)
        gd_mem = [
            layer(None, None, encoder_out.astype(self.dtype), None,
                  project_mem_kv_only=True)
            for layer in self.decoders
        ]
        return {
            "k": tuple(k_bufs),
            "v": tuple(v_bufs),
            "kv_valid": kv_valid,
            "prompt_nvalid": prompt_nvalid,
            "prompt_len": tp,
            "gd_mem_k": jnp.stack([m[0] for m in gd_mem]),  # [L, 1, T, H, dk]
            "gd_mem_v": jnp.stack([m[1] for m in gd_mem]),
            "gd_xs": jnp.zeros((n_blocks, beam, resp_max, d_model), self.dtype),
        }

    def decode_step(
        self,
        encoder_out,  # [1, T, D] (single utterance)
        encoder_out_lengths,  # [1]
        state: Dict,
        last_token: jnp.ndarray,  # [K] most recent response token (sos at step 0)
        step: jnp.ndarray,  # scalar response position index
    ):
        """One cached decode step: LLM on the new token only -> incremental
        guided decoder (one position, cached memory K/V) -> log-probs [K, V]."""
        cfg = self.cfg
        k_bufs, v_bufs = state["k"], state["v"]
        n_layers = len(k_bufs)
        beam, tc = k_bufs[0].shape[:2]
        tp = state["prompt_len"]
        resp_max = state["gd_xs"].shape[2]
        write = tp + step

        cache = {"layers": [(k_bufs[i], v_bufs[i]) for i in range(n_layers)]}
        positions = jnp.broadcast_to(
            (state["prompt_nvalid"] + step)[None, None], (beam, 1)
        )
        use_lm_logits = cfg.llm_score_mode == "log_softmax"
        # In-place KV writes (cache_write_pos) are opt-in: combined with the
        # CTC prefix machinery in one beam-search while_loop they reproducibly
        # hard-crash the axon TPU runtime ("TPU worker process crashed") —
        # the same step runs fine standalone, in a plain while_loop, and with
        # ctc_weight=0, so this is a runtime bug, not a semantics issue.
        # The legacy path concats the cache per layer (more HBM traffic) but
        # still benefits from the grouped-GQA no-repeat attention.
        inplace = os.environ.get("LLMASR_KV_INPLACE", "0") == "1"
        llm_out = self.llm(
            last_token[:, None],
            jnp.ones((beam, 1), bool),
            cache=cache,
            cache_valid=state["kv_valid"],
            positions=positions,
            return_logits=use_lm_logits,
            cache_write_pos=write if inplace else None,
        )
        if use_lm_logits:
            hidden, lm_logits, new_kv = llm_out
        else:
            hidden, new_kv = llm_out
        hidden = jax.lax.stop_gradient(hidden)
        if inplace:
            # in-place mode returns each layer's UPDATED full buffer
            k_bufs = tuple(jax.lax.stop_gradient(k) for k, _ in new_kv["layers"])
            v_bufs = tuple(jax.lax.stop_gradient(v) for _, v in new_kv["layers"])
        else:
            # legacy: new_kv holds the new token's k/v only; write them in
            k_bufs = tuple(
                jax.lax.dynamic_update_slice(
                    k_bufs[i],
                    jax.lax.stop_gradient(k).astype(k_bufs[i].dtype),
                    (0, write, 0, 0),
                )
                for i, (k, _) in enumerate(new_kv["layers"])
            )
            v_bufs = tuple(
                jax.lax.dynamic_update_slice(
                    v_bufs[i],
                    jax.lax.stop_gradient(v).astype(v_bufs[i].dtype),
                    (0, write, 0, 0),
                )
                for i, (_, v) in enumerate(new_kv["layers"])
            )
        kv_valid = state["kv_valid"].at[:, write].set(True)
        gd_xs = state["gd_xs"]

        if use_lm_logits:
            # 'log_softmax' mode: the LLM's next-token distribution is the
            # score — guided decoder bypassed (llama.py:259-262)
            logp = jax.nn.log_softmax(
                jax.lax.stop_gradient(lm_logits[:, -1]).astype(jnp.float32), axis=-1
            )
        else:
            # incremental guided decoder: ONE position through the blocks;
            # self-attn keys come from the per-layer input-stream buffers,
            # cross-attn uses the utterance-constant memory K/V computed in
            # decode_prefix.  Equivalent to the full causal forward restricted
            # to positions <= step (cached-vs-uncached parity tested).
            x_cur = self.embed(hidden.astype(self.dtype))  # [K, 1, D]
            tgt_mask = jnp.broadcast_to(
                (jnp.arange(resp_max) <= step)[None, None, :],
                (beam, 1, resp_max),
            )
            mem = jnp.broadcast_to(
                encoder_out[0:1], (beam,) + encoder_out.shape[1:]
            ).astype(self.dtype)
            mem_mask = (
                jnp.arange(encoder_out.shape[1]) < encoder_out_lengths[0]
            )[None, None, :]
            mem_mask = jnp.broadcast_to(mem_mask, (beam, 1, encoder_out.shape[1]))
            for i, layer in enumerate(self.decoders):
                gd_xs = jax.lax.dynamic_update_slice(
                    gd_xs, x_cur[None].astype(gd_xs.dtype), (i, 0, step, 0)
                )
                mem_k = jnp.broadcast_to(
                    state["gd_mem_k"][i], (beam,) + state["gd_mem_k"].shape[2:]
                )
                mem_v = jnp.broadcast_to(
                    state["gd_mem_v"][i], (beam,) + state["gd_mem_v"].shape[2:]
                )
                x_cur = layer(
                    x_cur, tgt_mask, mem, mem_mask, True,
                    self_kv=gd_xs[i], mem_kv=(mem_k, mem_v),
                )
            last_logits = self.output_layer(self.after_norm(x_cur))[:, 0]
            logp = jax.nn.log_softmax(last_logits.astype(jnp.float32), axis=-1)
        new_state = {
            "k": k_bufs,
            "v": v_bufs,
            "kv_valid": kv_valid,
            "prompt_nvalid": state["prompt_nvalid"],
            "prompt_len": tp,
            "gd_mem_k": state["gd_mem_k"],
            "gd_mem_v": state["gd_mem_v"],
            "gd_xs": gd_xs,
        }
        return logp, new_state

    def _guided_decode_from_states(
        self, tgt_states, lens, encoder_out, encoder_out_lengths, at_position=None
    ):
        x = self.embed(tgt_states)
        tgt_mask = causal_attn_mask(lens, tgt_states.shape[1])
        memory_mask = make_valid_mask(encoder_out_lengths, encoder_out.shape[1])[:, None, :]
        for layer in self.decoders:
            x = layer(x, tgt_mask, encoder_out, memory_mask, True)
        x = self.after_norm(x)
        if at_position is not None:
            # slice before the (large) vocab projection
            x = jax.lax.dynamic_slice_in_dim(x, at_position, 1, axis=1)[:, 0]
        return self.output_layer(x)

    # ------------------------------------------------------------------
    def __call__(
        self,
        speech,
        speech_lengths,
        text,  # [B, L] LLM-vocab token ids padded with -1
        text_lengths,
        bias_words=None,  # [B, W] per-utterance biasing tokens (optional)
        bias_words_lengths=None,
        ctc_text=None,  # [B, Lc] CTC-vocab targets (mixed-vocab mode only)
        ctc_text_lengths=None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        cfg = self.cfg
        batch_size = speech.shape[0]
        enc_out, enc_lens = self.encode(speech, speech_lengths, deterministic)

        stats: Dict[str, jnp.ndarray] = {}
        loss_ctc = jnp.asarray(0.0, jnp.float32)
        if cfg.ctc_weight > 0.0:
            if cfg.ctc_vocab_size and ctc_text is None:
                raise ValueError(
                    "mixed-vocab model needs a 'ctc_text' data stream (CTC-vocab "
                    "targets); the LLM-vocab 'text' ids exceed the CTC head dim"
                )
            tgt = ctc_text if ctc_text is not None else text
            tgt_lens = ctc_text_lengths if ctc_text is not None else text_lengths
            loss_ctc = ctc_loss(
                self.ctc_logits(enc_out), enc_lens, tgt, tgt_lens, cfg.blank_id
            )
            stats["loss_ctc"] = loss_ctc

        ys_in, ys_out = add_sos_eos(
            text, text_lengths, cfg.sos_id, cfg.eos_id, cfg.ignore_id
        )
        dec_logits = self.decoder_logits(
            enc_out, enc_lens, ys_in, text_lengths + 1, deterministic,
            bias_words=bias_words, bias_words_lengths=bias_words_lengths,
        )
        loss_att = label_smoothing_loss(
            dec_logits, ys_out, cfg.lsm_weight, cfg.ignore_id, cfg.length_normalized_loss
        )
        stats["loss_att"] = loss_att
        stats["acc"] = accuracy(dec_logits, ys_out, cfg.ignore_id)

        if cfg.ctc_weight == 0.0:
            loss = loss_att
        else:
            loss = cfg.ctc_weight * loss_ctc + (1.0 - cfg.ctc_weight) * loss_att
        stats["loss"] = loss
        return loss, stats, jnp.asarray(batch_size, jnp.float32)


# ---------------------------------------------------------------------------
# task-layer builder (tasks/asr.py:638-680 analog)
# ---------------------------------------------------------------------------

def build_llm_guided_model(config: Dict[str, Any], dtype=jnp.float32) -> LLMGuidedASRModel:
    """Build from a task config dict; LLM weights are injected separately by
    init_llm_guided_variables (frozen params never live in checkpoints)."""
    from llm_guided_asr_tpu.models.llm.llama import LlamaConfig

    llm_conf = dict(config.get("llm_conf", {}) or {})
    spec = _resolve_llm_spec(llm_conf)

    frontend = None
    if config.get("frontend", "default") not in (None, "none") and config.get("input_size") is None:
        frontend = FrontendConfig.from_dict(config.get("frontend_conf", {}) or {})
    spec_aug = None
    if config.get("specaug") == "specaug":
        spec_aug = SpecAugConfig.from_dict(config.get("specaug_conf", {}) or {})
    model_conf = dict(config.get("model_conf", {}) or {})

    cfg = LLMGuidedASRConfig(
        vocab_size=spec["llm_config"].vocab_size,
        llm=spec["llm_config"],
        prompt=spec["template"],
        frontend=frontend,
        specaug=spec_aug,
        normalize=config.get("normalize") or "none",
        encoder_type=config.get("encoder", "conformer"),
        encoder=ConformerConfig.from_dict(config.get("encoder_conf", {}) or {}),
        decoder=TransformerDecoderConfig.from_dict(config.get("decoder_conf", {}) or {}),
        ctc_weight=float(model_conf.get("ctc_weight", 0.3)),
        lsm_weight=float(model_conf.get("lsm_weight", 0.0)),
        length_normalized_loss=bool(model_conf.get("length_normalized_loss", False)),
        # mixed vocab: a separate CTC token list (ctc_vocab_path analog)
        ctc_vocab_size=(
            len(_read_ctc_token_list(config)) if config.get("ctc_token_list") else None
        ),
        ctc_map_width=int(model_conf.get("ctc_map_width", 8)),
        llm_score_mode=str(model_conf.get("llm_score_mode", "hidden")),
    )
    llm_dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.bfloat16}[
        llm_conf.get("dtype", "float32")
    ]
    return LLMGuidedASRModel(cfg, dtype=dtype, llm_dtype=llm_dtype)


def _read_ctc_token_list(config: Dict[str, Any]):
    from llm_guided_asr_tpu.utils.config import read_token_list

    return read_token_list(config["ctc_token_list"])


def build_ctc_map_variables(config: Dict[str, Any]) -> Dict:
    """Precompute the CTC-vocab -> LLM-ids table for the 'ctc_map' collection."""
    from llm_guided_asr_tpu.models.llm.prompt import build_ctc_to_llm_map

    tokens = _read_ctc_token_list(config)
    spec = _resolve_llm_spec(dict(config.get("llm_conf", {}) or {}))
    width = int((config.get("model_conf") or {}).get("ctc_map_width", 8))
    ids, lens = build_ctc_to_llm_map(tokens, spec["tokenizer"], max_expand=width)
    return {"ids": jnp.asarray(ids), "lens": jnp.asarray(lens)}


_LLM_SPEC_CACHE: Dict[str, Dict] = {}


def _resolve_llm_spec(llm_conf: Dict[str, Any]) -> Dict:
    """Load tokenizer+config (and lazily weights) for the configured LLM."""
    from llm_guided_asr_tpu.models.llm.prompt import split_template

    name = llm_conf["model_name_or_path"]
    cache_key = f"{name}::{llm_conf.get('template_prompt')}"
    if cache_key in _LLM_SPEC_CACHE:
        return _LLM_SPEC_CACHE[cache_key]

    from transformers import AutoConfig, AutoTokenizer

    hf_cfg = AutoConfig.from_pretrained(name, cache_dir=llm_conf.get("cache_dir"))
    llm_config = LlamaConfig.from_hf_config(hf_cfg)
    tokenizer = AutoTokenizer.from_pretrained(name, cache_dir=llm_conf.get("cache_dir"))
    bos = hf_cfg.bos_token_id
    eos = hf_cfg.eos_token_id
    if isinstance(eos, (list, tuple)):
        eos = eos[0]  # llama3 has several eos tokens (llama.py:91-92)
    if bos is None:
        bos = tokenizer.bos_token_id if tokenizer.bos_token_id is not None else 0
    template = split_template(
        tokenizer,
        llm_conf.get("template_prompt"),
        bos_token_id=bos,
        eos_token_id=eos if eos is not None else 0,
        pad_token=llm_conf.get("pad_token"),
    )
    spec = {
        "llm_config": llm_config,
        "template": template,
        "tokenizer": tokenizer,
        "name": name,
        "cache_dir": llm_conf.get("cache_dir"),
    }
    _LLM_SPEC_CACHE[cache_key] = spec
    return spec


def load_llm_params(config: Dict[str, Any], mesh=None) -> Dict:
    """Load the frozen-LLM weights for injection at params['llm'].

    Preferred path: per-tensor safetensors streaming (models/llm/ingest.py)
    — one tensor resident on host at a time, cast straight to the working
    dtype, optionally device_put with its TP sharding (pass ``mesh``) — the
    only way an 8B-class checkpoint fits this host (VERDICT r2 #3).  Falls
    back to transformers materialization for hub names / non-safetensors
    checkpoints.
    """
    from pathlib import Path

    import jax.numpy as jnp

    llm_conf = dict(config.get("llm_conf", {}) or {})
    spec = _resolve_llm_spec(llm_conf)
    dtype = {"bfloat16": jnp.bfloat16, "float16": jnp.bfloat16}.get(
        llm_conf.get("dtype", "float32"), jnp.float32
    )
    local = _resolve_checkpoint_dir(spec["name"], spec["cache_dir"])
    if local is not None:
        from llm_guided_asr_tpu.models.llm.ingest import stream_llm_params

        params = stream_llm_params(
            local, spec["llm_config"], dtype=dtype, mesh=mesh
        )
        logger.info(f"streamed frozen LLM weights from {local} ({dtype})")
        return params

    import torch
    from transformers import AutoModelForCausalLM

    from llm_guided_asr_tpu.models.llm.llama import convert_hf_state_dict

    hf_model = AutoModelForCausalLM.from_pretrained(
        spec["name"], cache_dir=spec["cache_dir"], torch_dtype=torch.float32
    )
    params = convert_hf_state_dict(hf_model.state_dict(), spec["llm_config"])
    del hf_model
    logger.info(f"loaded frozen LLM weights from {spec['name']}")
    return params


def _resolve_checkpoint_dir(name: str, cache_dir) -> Optional["Path"]:
    """Local dir (or cached hub snapshot) holding a safetensors checkpoint."""
    from pathlib import Path

    cand = Path(name)
    if cand.is_dir():
        if (cand / "model.safetensors").exists() or (
            cand / "model.safetensors.index.json"
        ).exists():
            return cand
        return None
    if cache_dir:
        # HF hub cache layout: <cache>/models--org--name/snapshots/<rev>/
        base = Path(cache_dir) / ("models--" + name.replace("/", "--")) / "snapshots"
        if base.is_dir():
            for snap in sorted(base.iterdir(), reverse=True):
                if (snap / "model.safetensors").exists() or (
                    snap / "model.safetensors.index.json"
                ).exists():
                    return snap
    return None
