"""Multi-stream codec language models (espnet2/speechlm/core_lm rebuild).

The reference speechlm core abstraction models frames of ``nq`` parallel
codec codes per step (AbsCoreLM, espnet2/speechlm/core_lm/abs_core_lm.py:
``forward(dec_seq [B,T,nq], lengths, prefix_len) -> (loss, stats, weight)``).
Three architectures, all sharing one embedding/lm-head:

- ``MultiScaleLM`` (core_lm/ar_multiscale.py:18, UniAudio arXiv:2310.00704):
  a global causal transformer over frame embeddings (streams summed) and a
  local transformer over the nq codes inside each frame.
- ``ValleLM`` (core_lm/valle.py:24, Vall-E): AR transformer over the first
  code stream + a level-conditioned NAR transformer (AdaLN,
  module/valle.py:11) trained on one random level per sample.
- ``DelayPatternLM`` (MusicGen delay interleaving, arXiv:2306.05284): stream
  k is delayed k steps so one causal transformer predicts all nq streams
  jointly — the fully-parallel pattern the reference's roadmap points at and
  the cheapest shape for the MXU (one big attention, no inner loop).

TPU-first notes: the local transformer runs on [B*T, nq, D] (one batched
attention over tiny length nq, not a per-frame Python loop); the NAR level
draw is a traced ``jax.random`` call; loss masks are branch-free where()s.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.transformer import (
    PositionalEncoding,
    TransformerEncoderLayer,
)
from llm_guided_asr_tpu.utils.masks import causal_attn_mask, make_valid_mask

Dtype = Any


def scale_grad(x: jnp.ndarray, weight: float) -> jnp.ndarray:
    """Identity in the forward pass; scales the cotangent by ``weight``.

    JAX analog of the reference's ``logits.register_hook`` gradient hook
    (net_utils.py:38-44 first_layer_weight)."""
    return x * weight + jax.lax.stop_gradient(x * (1.0 - weight))


def multi_stream_ce_loss(
    logits: jnp.ndarray,  # [B, T, nq, V]
    target: jnp.ndarray,  # [B, T, nq]
    lengths: jnp.ndarray,  # [B] valid frame counts
    prefix_len: Optional[jnp.ndarray] = None,  # [B] condition part (no acc)
    first_layer_weight: float = 1.0,
) -> Tuple[jnp.ndarray, Dict, jnp.ndarray]:
    """net_utils.py:28 ce_loss: frame-masked CE over every stream, accuracy
    only over the continuation (non-prefix) frames, per-layer acc stats."""
    b, t, nq, v = logits.shape
    if first_layer_weight != 1.0:
        first = scale_grad(logits[:, :, :1], first_layer_weight)
        logits = jnp.concatenate([first, logits[:, :, 1:]], axis=2)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.clip(target, 0, v - 1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]  # [B,T,nq]
    mask = make_valid_mask(lengths, t).astype(jnp.float32)[..., None]  # [B,T,1]
    if prefix_len is not None:
        tmask = mask * (1.0 - make_valid_mask(prefix_len, t).astype(jnp.float32)[..., None])
    else:
        tmask = mask
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    loss = jnp.sum(nll * mask) / denom / nq
    pred = jnp.argmax(logits, axis=-1)
    acc_el = (pred == tgt).astype(jnp.float32) * tmask
    tdenom = jnp.maximum(jnp.sum(tmask), 1.0)
    stats = {f"acc_layer{i}": jnp.sum(acc_el[:, :, i]) / tdenom for i in range(nq)}
    stats["acc"] = jnp.sum(acc_el) / tdenom / nq
    stats["loss"] = loss
    return loss, stats, jnp.sum(mask)


@dataclasses.dataclass(frozen=True)
class MultiStreamLMConfig:
    vocab_size: int = 256  # joint vocab over all streams (codec codebook ids)
    nq: int = 4  # code streams per frame
    att_unit: int = 256
    head: int = 2
    unit: int = 1024  # ffn size
    g_layer: int = 4  # global / AR depth
    l_layer: int = 4  # local / NAR depth
    dropout_rate: float = 0.0
    first_layer_weight: float = 1.0

    @classmethod
    def from_dict(cls, d: dict) -> "MultiStreamLMConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


class _CausalStack(nn.Module):
    """Shared trunk: pos-enc + n causal encoder layers + final LN."""

    n_layer: int
    head: int
    unit: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths, deterministic: bool = True):
        x = PositionalEncoding(self.dropout_rate, dtype=self.dtype, name="pos")(
            x, deterministic
        )
        mask = causal_attn_mask(lengths, x.shape[1])
        for i in range(self.n_layer):
            x = TransformerEncoderLayer(
                self.head, self.unit, self.dropout_rate, 0.0, dtype=self.dtype,
                name=f"block_{i}",
            )(x, mask, deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="after_norm")(x)


class MultiScaleLM(nn.Module):
    """UniAudio global/local factorization (core_lm/ar_multiscale.py:18)."""

    cfg: MultiStreamLMConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.emb = nn.Embed(c.vocab_size, c.att_unit, dtype=self.dtype, name="emb")
        self.g_decoders = _CausalStack(
            c.g_layer, c.head, c.unit, c.dropout_rate, self.dtype, name="g_decoders"
        )
        self.l_decoders = _CausalStack(
            c.l_layer, c.head, c.unit, c.dropout_rate, self.dtype, name="l_decoders"
        )
        self.placeholder = self.param(
            "placeholder", nn.initializers.normal(1.0), (c.att_unit,)
        )

    def _head(self, h):
        # tied lm head (ar_multiscale.py:54 share_emb)
        return self.emb.attend(h.astype(self.dtype))

    def hidden(self, dec_seq, lengths, deterministic: bool = True):
        """[B, T, nq] -> local hidden states [B, T-1, nq, D] for frames 1..T-1."""
        c = self.cfg
        b, t, nq = dec_seq.shape
        x = self.emb(dec_seq[:, :-1]).sum(axis=2)  # [B, T-1, D]
        x = self.g_decoders(x, jnp.maximum(lengths - 1, 0), deterministic)
        target = dec_seq[:, 1:]  # [B, T-1, nq]
        ph = jnp.broadcast_to(
            self.placeholder.astype(self.dtype), (b, t - 1, 1, c.att_unit)
        )
        tgt_emb = self.emb(target)  # [B, T-1, nq, D]
        target_shift = jnp.concatenate([ph, tgt_emb], axis=2)[:, :, :-1]
        h = x[:, :, None] + target_shift  # [B, T-1, nq, D]
        h = h.reshape(b * (t - 1), nq, c.att_unit)
        h = self.l_decoders(
            h, jnp.full((b * (t - 1),), nq, jnp.int32), deterministic
        )
        return h.reshape(b, t - 1, nq, c.att_unit)

    def __call__(
        self,
        dec_seq: jnp.ndarray,  # [B, T, nq]
        lengths: jnp.ndarray,  # [B]
        prefix_len: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        h = self.hidden(dec_seq, lengths, deterministic)
        logits = self._head(h)
        return multi_stream_ce_loss(
            logits, dec_seq[:, 1:], lengths - 1,
            None if prefix_len is None else prefix_len - 1,
            self.cfg.first_layer_weight,
        )


class AdaLN(nn.Module):
    """Level-conditioned layer norm (module/valle.py:11)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond):
        d = x.shape[-1]
        w = nn.Dense(
            d, use_bias=False, dtype=self.dtype,
            kernel_init=nn.initializers.constant(1.0 / max(d, 1)), name="weight",
        )(cond)
        bsc = nn.Dense(
            d, use_bias=False, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="bias",
        )(cond)
        x = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype)(x)
        return w[:, None, :] * x + bsc[:, None, :]


class _NARStack(nn.Module):
    """Non-causal transformer with AdaLN level conditioning at the output
    (ValleNARDecoder, module/valle.py:62)."""

    n_layer: int
    head: int
    unit: int
    n_level: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths, level, deterministic: bool = True):
        lv = nn.Embed(self.n_level, x.shape[-1], dtype=self.dtype, name="level_emb")(level)
        x = PositionalEncoding(self.dropout_rate, dtype=self.dtype, name="pos")(
            x, deterministic
        )
        valid = make_valid_mask(lengths, x.shape[1])
        mask = valid[:, None, :]
        for i in range(self.n_layer):
            x = TransformerEncoderLayer(
                self.head, self.unit, self.dropout_rate, 0.0, dtype=self.dtype,
                name=f"block_{i}",
            )(x, mask, deterministic)
        return AdaLN(dtype=self.dtype, name="ln")(x, lv)


class ValleLM(nn.Module):
    """Vall-E AR(first stream) + NAR(levels 2..nq) (core_lm/valle.py:24)."""

    cfg: MultiStreamLMConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.emb = nn.Embed(c.vocab_size, c.att_unit, dtype=self.dtype, name="emb")
        self.ar_decoder = _CausalStack(
            c.g_layer, c.head, c.unit, c.dropout_rate, self.dtype, name="ar_decoder"
        )
        self.nar_decoder = _NARStack(
            c.l_layer, c.head, c.unit, max(c.nq - 1, 1), c.dropout_rate,
            self.dtype, name="nar_decoder",
        )

    def _head(self, h):
        return self.emb.attend(h.astype(self.dtype))

    def _prepare_input(self, emb, prefix_len, level):
        """Sum code-stream embeddings: prefix frames use ALL nq streams, the
        continuation uses streams < level (valle.py prepare_input)."""
        b, t, nq, _ = emb.shape
        if isinstance(level, int):
            level = jnp.full((b,), level, jnp.int32)
        level_mask = jnp.arange(nq)[None, :] < level[:, None]  # [B, nq]
        level_mask = level_mask[:, None, :, None]
        prefix_mask = make_valid_mask(prefix_len, t)[:, :, None, None]
        keep = level_mask | prefix_mask
        return jnp.sum(jnp.where(keep, emb, 0.0), axis=2)  # [B, T, D]

    def __call__(
        self,
        dec_seq: jnp.ndarray,  # [B, T, nq]
        lengths: jnp.ndarray,
        prefix_len: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ):
        c = self.cfg
        b, t, nq = dec_seq.shape
        if prefix_len is None:
            prefix_len = jnp.ones((b,), jnp.int32)
        emb = self.emb(dec_seq)  # [B, T, nq, D]

        # AR over the first stream
        ar_in = self._prepare_input(emb, prefix_len, 1)[:, :-1]
        h_ar = self.ar_decoder(ar_in, jnp.maximum(lengths - 1, 0), deterministic)
        logits_ar = self._head(h_ar)  # [B, T-1, V]
        target_ar = dec_seq[:, 1:, 0]

        # NAR on one random level per sample (valle.py:104 randint(1, nq))
        if rng is None:
            rng = self.make_rng("level") if not deterministic else jax.random.PRNGKey(0)
        level = jax.random.randint(rng, (b,), 1, max(nq, 2))
        nar_in = self._prepare_input(emb, prefix_len, level)[:, 1:]
        h_nar = self.nar_decoder(
            nar_in, jnp.maximum(lengths - 1, 0), level - 1, deterministic
        )
        logits_nar = self._head(h_nar)
        idx = jnp.broadcast_to(level[:, None, None], (b, t - 1, 1))
        target_nar = jnp.take_along_axis(dec_seq[:, 1:], idx, axis=2)[..., 0]

        logits = jnp.stack([logits_ar, logits_nar], axis=2)  # [B, T-1, 2, V]
        target = jnp.stack([target_ar, target_nar], axis=2)
        loss, stats, weight = multi_stream_ce_loss(
            logits, target, lengths - 1, prefix_len - 1
        )
        stats["acc_ar"] = stats.pop("acc_layer0")
        stats["acc_nar"] = stats.pop("acc_layer1")
        return loss, stats, weight


class DelayPatternLM(nn.Module):
    """Delay-interleaved multi-stream causal LM (MusicGen, arXiv:2306.05284).

    Stream k is shifted right by k frames, every frame's nq embeddings are
    summed, one causal transformer runs over T+nq-1 positions, and nq output
    heads (tied to the embedding via per-stream projections) predict each
    stream at its own delay.  Pads introduced by the shift use a learned
    per-stream BOS embedding.
    """

    cfg: MultiStreamLMConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.emb = nn.Embed(c.vocab_size, c.att_unit, dtype=self.dtype, name="emb")
        self.stream_bos = self.param(
            "stream_bos", nn.initializers.normal(0.02), (c.nq, c.att_unit)
        )
        self.decoders = _CausalStack(
            c.g_layer, c.head, c.unit, c.dropout_rate, self.dtype, name="decoders"
        )
        self.stream_proj = [
            nn.Dense(c.att_unit, use_bias=False, dtype=self.dtype, name=f"stream_proj_{k}")
            for k in range(c.nq)
        ]

    def _delayed(self, dec_seq):
        """[B, T, nq] -> summed delayed embeddings [B, T+nq-1, D]."""
        c = self.cfg
        b, t, nq = dec_seq.shape
        emb = self.emb(dec_seq)  # [B, T, nq, D]
        total = t + nq - 1
        x = jnp.zeros((b, total, c.att_unit), self.dtype)
        for k in range(nq):
            bos = jnp.broadcast_to(
                self.stream_bos[k].astype(self.dtype), (b, 1, c.att_unit)
            )
            # positions 0..k-1 carry the stream's BOS marker, then the codes
            stream = jnp.concatenate(
                [jnp.repeat(bos, k, axis=1) if k else emb[:, :0, 0], emb[:, :, k]],
                axis=1,
            )
            x = x.at[:, : k + t].add(stream)
        return x

    def __call__(
        self,
        dec_seq: jnp.ndarray,  # [B, T, nq]
        lengths: jnp.ndarray,
        prefix_len: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        c = self.cfg
        b, t, nq = dec_seq.shape
        x = self._delayed(dec_seq)[:, :-1]  # predict position p+1 from <=p
        h = self.decoders(
            x, jnp.maximum(lengths + nq - 2, 0), deterministic
        )  # [B, T+nq-2, D]
        # stream k's frame f sits at delayed position f+k; its predictor is
        # the hidden state at f+k-1
        logits = []
        for k in range(nq):
            hk = jax.lax.dynamic_slice_in_dim(h, k, t - 1, axis=1)
            logits.append(self.emb.attend(self.stream_proj[k](hk)))
        logits = jnp.stack(logits, axis=2)  # [B, T-1, nq, V]
        return multi_stream_ce_loss(
            logits, dec_seq[:, 1:], lengths - 1,
            None if prefix_len is None else prefix_len - 1,
            c.first_layer_weight,
        )


CORE_LMS = {
    "multiscale": MultiScaleLM,
    "valle": ValleLM,
    "delay": DelayPatternLM,
}


class MultiStreamLMModel(nn.Module):
    """Trainer-contract wrapper for the generic speechlm task
    (espnet2/speechlm/espnet_model.py:14 ESPnetSpeechLMModel).

    __call__(dec_seq [B, T*nq] flattened or [B, T, nq], lengths) ->
    (loss, stats, weight).  Flattened input (frame-major) is reshaped using
    the configured nq so the plain [utt x tokens] data path can feed it.
    """

    cfg: MultiStreamLMConfig
    corelm: str = "multiscale"
    dtype: Dtype = jnp.float32

    def setup(self):
        self.lm = CORE_LMS[self.corelm](self.cfg, dtype=self.dtype, name="corelm")

    def __call__(self, dec_seq, dec_seq_lengths, deterministic: bool = True):
        c = self.cfg
        if dec_seq.ndim == 2:
            b, tn = dec_seq.shape
            dec_seq = dec_seq.reshape(b, tn // c.nq, c.nq)
            dec_seq_lengths = dec_seq_lengths // c.nq
        dec_seq = jnp.maximum(dec_seq, 0)  # -1 pads -> 0 (masked by lengths)
        kwargs = {}
        if self.corelm == "valle" and not deterministic:
            kwargs["rng"] = self.make_rng("dropout")
        loss, stats, weight = self.lm(
            dec_seq, dec_seq_lengths, deterministic=deterministic, **kwargs
        )
        stats["ppl"] = jnp.exp(stats["loss"])
        return loss, stats, weight
