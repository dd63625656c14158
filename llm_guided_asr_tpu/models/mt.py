"""Machine translation: text-to-text encoder-decoder (espnet2/mt/ rebuild).

espnet_model.py analog: embedding + transformer encoder over source tokens,
the shared TransformerDecoder over target tokens, label-smoothed CE.
Decoding reuses the on-device beam search via the common
encode/decoder_logits interface (ctc_weight=0 — no CTC branch in MT).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.transformer import PositionalEncoding, TransformerEncoderLayer
from llm_guided_asr_tpu.models.transformer_decoder import (
    TransformerDecoder,
    TransformerDecoderConfig,
)
from llm_guided_asr_tpu.ops.losses import accuracy, add_sos_eos, label_smoothing_loss
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class MTConfig:
    vocab_size: int
    src_vocab_size: Optional[int] = None  # None = shared vocab
    adim: int = 256
    heads: int = 4
    units: int = 1024
    elayers: int = 6
    decoder: TransformerDecoderConfig = TransformerDecoderConfig()
    lsm_weight: float = 0.1
    length_normalized_loss: bool = False
    ignore_id: int = -1
    # espnet2/mt/espnet_model.py:240-243: the source sequence is wrapped in
    # src_sos/src_eos delimiters (repeat=patch_size) before the embedding
    # frontend; patch_size > 1 repeats them (discrete-unit MT patches)
    patch_size: int = 1
    # :71-79 share_decoder_input_output_embed: output projection = embed^T
    share_decoder_input_output_embed: bool = False
    # :82-91 share_encoder_decoder_input_embed: one table for src embed and
    # tgt embed (requires src_vocab == tgt_vocab, flax module sharing)
    share_encoder_decoder_input_embed: bool = False
    # encoder: transformer (scratch) | hugging_face (pretrained BERT-family
    # token encoder, hugging_face_transformers_encoder.py; weights injected
    # by the task from hf_model_name_or_path)
    encoder: str = "transformer"
    hf_model_name_or_path: str = ""
    lang_token_id: int = -1

    @property
    def sos_id(self) -> int:
        return self.vocab_size - 1

    @property
    def eos_id(self) -> int:
        return self.vocab_size - 1

    @property
    def blank_id(self) -> int:  # beam-search interface parity (unused in MT)
        return 0


class MTModel(nn.Module):
    cfg: MTConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        if cfg.encoder == "hugging_face":
            from transformers import AutoConfig

            from llm_guided_asr_tpu.models.hf_encoder import (
                BertBodyConfig,
                HFTransformersEncoder,
            )

            body = BertBodyConfig.from_hf_config(
                AutoConfig.from_pretrained(cfg.hf_model_name_or_path)
            )
            self.hf_encoder = HFTransformersEncoder(
                body, lang_token_id=cfg.lang_token_id, dtype=self.dtype,
                name="hf_encoder",
            )
            # project the pretrained hidden size into the decoder width
            self.enc_proj = nn.Dense(cfg.adim, dtype=self.dtype, name="enc_proj")
            shared_embed = None
        else:
            src_vocab = cfg.src_vocab_size or cfg.vocab_size
            share = (
                cfg.share_encoder_decoder_input_embed
                and src_vocab == cfg.vocab_size
            )
            self.src_embed = nn.Embed(src_vocab, cfg.adim, dtype=self.dtype, name="src_embed")
            shared_embed = self.src_embed if share else None
            self.pos = PositionalEncoding(0.1, dtype=self.dtype, name="pos")
            self.blocks = [
                TransformerEncoderLayer(cfg.heads, cfg.units, 0.1, dtype=self.dtype,
                                        name=f"block_{i}")
                for i in range(cfg.elayers)
            ]
            self.after_norm = nn.LayerNorm(dtype=self.dtype, name="after_norm")
        dec_cfg = cfg.decoder
        if cfg.share_decoder_input_output_embed and not dec_cfg.tie_input_output:
            dec_cfg = dataclasses.replace(dec_cfg, tie_input_output=True)
        self.decoder = TransformerDecoder(
            cfg.vocab_size, dec_cfg, dtype=self.dtype,
            embed_module=shared_embed,
            name="decoder",
        )

    def encode(self, src_text, src_text_lengths, deterministic: bool = True):
        valid = make_valid_mask(src_text_lengths, src_text.shape[1])
        if self.cfg.encoder == "hugging_face":
            x, lens = self.hf_encoder(
                jnp.where(valid, src_text, 0), src_text_lengths, deterministic
            )
            x = self.enc_proj(x)
            valid = make_valid_mask(lens, x.shape[1])
            return jnp.where(valid[..., None], x, 0.0), lens
        # src delimiter: prepend src_sos (= src_vocab-1), patch_size copies
        # (espnet_model.py:240-243 _extract_feats add_sos_eos(repeat=patch))
        cfg = self.cfg
        src_sos = (cfg.src_vocab_size or cfg.vocab_size) - 1
        b = src_text.shape[0]
        sos_col = jnp.full((b, cfg.patch_size), src_sos, src_text.dtype)
        src_text = jnp.concatenate(
            [sos_col, jnp.where(valid, src_text, 0)], axis=1
        )
        src_text_lengths = src_text_lengths + cfg.patch_size
        valid = make_valid_mask(src_text_lengths, src_text.shape[1])
        x = self.src_embed(jnp.where(valid, src_text, 0))
        x = self.pos(x, deterministic)
        for blk in self.blocks:
            x = blk(x, valid[:, None, :], deterministic)
        x = self.after_norm(x)
        return jnp.where(valid[..., None], x, 0.0), src_text_lengths

    def decoder_logits(self, enc, enc_lens, ys_in, ys_in_lengths,
                       deterministic: bool = True, only_last: bool = False):
        return self.decoder(enc, enc_lens, ys_in, ys_in_lengths, deterministic,
                            only_last=only_last)

    def __call__(
        self,
        text: jnp.ndarray,  # [B, L] target, padded -1
        text_lengths: jnp.ndarray,
        src_text: jnp.ndarray,  # [B, Ls] source, padded -1
        src_text_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        cfg = self.cfg
        valid = make_valid_mask(src_text_lengths, src_text.shape[1])
        enc, enc_lens = self.encode(jnp.where(valid, src_text, 0), src_text_lengths,
                                    deterministic)
        ys_in, ys_out = add_sos_eos(text, text_lengths, cfg.sos_id, cfg.eos_id, cfg.ignore_id)
        logits = self.decoder(enc, enc_lens, ys_in, text_lengths + 1, deterministic)
        loss = label_smoothing_loss(
            logits, ys_out, cfg.lsm_weight, cfg.ignore_id, cfg.length_normalized_loss
        )
        stats = {"loss": loss, "acc": accuracy(logits, ys_out, cfg.ignore_id)}
        return loss, stats, jnp.asarray(text.shape[0], jnp.float32)
