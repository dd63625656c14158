"""JAX Llama/Qwen decoder-only LM with HuggingFace weight ingestion.

TPU-native rebuild of the LLM wrapped by the reference's espnet2/asr/llm/
(llama.py:47-54 wraps AutoModelForCausalLM; qwen.py likewise).  Instead of
calling torch, this is a flax implementation of the public Llama-2/3 and
Qwen-2.5 architecture (RMSNorm, RoPE incl. llama3 NTK scaling, SwiGLU, GQA)
whose weights are converted from a HF checkpoint (convert_hf_state_dict).

Mid-sequence padding support: the LLM-guided packer places each prompt
segment at a static offset, so pad tokens can sit *inside* a row.  Positions
are therefore computed as cumsum(valid)-1 and pads are masked from attention
keys — numerically identical to the reference's contiguous right-padded
layout (llama.py prepare_prompt).

Supports an optional KV cache (prefix cache shared across beams) for decode.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any
NEG_INF = -1.0e9


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_position_embeddings: int = 4096
    attention_bias: bool = False  # True for Qwen2
    tie_word_embeddings: bool = False
    # llama3-style rope scaling (None to disable)
    rope_scaling_factor: Optional[float] = None
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_original_max_position: int = 8192

    @classmethod
    def from_hf_config(cls, hf) -> "LlamaConfig":
        """Build from a transformers PretrainedConfig (Llama or Qwen2)."""
        rope_scaling = getattr(hf, "rope_scaling", None) or {}
        rope_type = rope_scaling.get("rope_type", rope_scaling.get("type"))
        kw = dict(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            intermediate_size=hf.intermediate_size,
            num_hidden_layers=hf.num_hidden_layers,
            num_attention_heads=hf.num_attention_heads,
            num_key_value_heads=getattr(hf, "num_key_value_heads", hf.num_attention_heads),
            rms_norm_eps=hf.rms_norm_eps,
            rope_theta=getattr(hf, "rope_theta", 10000.0),
            max_position_embeddings=hf.max_position_embeddings,
            attention_bias=getattr(hf, "attention_bias", hf.model_type == "qwen2"),
            tie_word_embeddings=getattr(hf, "tie_word_embeddings", False),
        )
        if rope_type == "llama3":
            kw.update(
                rope_scaling_factor=rope_scaling["factor"],
                rope_low_freq_factor=rope_scaling["low_freq_factor"],
                rope_high_freq_factor=rope_scaling["high_freq_factor"],
                rope_original_max_position=rope_scaling["original_max_position_embeddings"],
            )
        return cls(**kw)


def rope_frequencies(cfg: LlamaConfig) -> np.ndarray:
    """Inverse frequencies, with optional llama3 NTK-by-parts scaling."""
    head_dim = cfg.hidden_size // cfg.num_attention_heads
    inv_freq = 1.0 / (
        cfg.rope_theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    )
    if cfg.rope_scaling_factor is not None:
        low_wl = cfg.rope_original_max_position / cfg.rope_low_freq_factor
        high_wl = cfg.rope_original_max_position / cfg.rope_high_freq_factor
        wavelen = 2.0 * np.pi / inv_freq
        scaled = inv_freq / cfg.rope_scaling_factor
        smooth = (cfg.rope_original_max_position / wavelen - cfg.rope_low_freq_factor) / (
            cfg.rope_high_freq_factor - cfg.rope_low_freq_factor
        )
        smoothed = (1.0 - smooth) * scaled + smooth * inv_freq
        inv_freq = np.where(
            wavelen < high_wl, inv_freq, np.where(wavelen > low_wl, scaled, smoothed)
        )
    return inv_freq.astype(np.float32)


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray, inv_freq: jnp.ndarray) -> jnp.ndarray:
    """x: [B, T, H, D]; positions: [B, T] -> rotated x (HF rotate_half layout)."""
    angles = positions[..., None].astype(jnp.float32) * inv_freq[None, None, :]  # [B,T,D/2]
    cos = jnp.cos(angles)[:, :, None, :]  # [B,T,1,D/2]
    sin = jnp.sin(angles)[:, :, None, :]
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    out1 = xf1 * cos - xf2 * sin
    out2 = xf2 * cos + xf1 * sin
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)


class RMSNorm(nn.Module):
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        norm = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (norm * w).astype(self.dtype)


class LlamaAttention(nn.Module):
    cfg: LlamaConfig
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, D]
        positions: jnp.ndarray,  # [B, T]
        attn_mask: jnp.ndarray,  # [B, T, Tk] bool True=attend (incl. causality)
        cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # (k, v) [B, Tc, Hkv, hd]
        cache_write_pos=None,  # scalar: dus-write new k/v INTO the padded cache
    ):
        cfg = self.cfg
        h = cfg.num_attention_heads
        hkv = cfg.num_key_value_heads
        hd = cfg.hidden_size // h
        bias = cfg.attention_bias

        q = nn.Dense(h * hd, use_bias=bias, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(hkv * hd, use_bias=bias, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(hkv * hd, use_bias=bias, dtype=self.dtype, name="v_proj")(x)
        b, t = x.shape[:2]
        q = q.reshape(b, t, h, hd)
        k = k.reshape(b, t, hkv, hd)
        v = v.reshape(b, t, hkv, hd)

        inv_freq = jnp.asarray(rope_frequencies(cfg))
        q = apply_rope(q, positions, inv_freq)
        k = apply_rope(k, positions, inv_freq)

        if cache is not None and cache_write_pos is not None:
            # decode hot path: write the new token's k/v IN PLACE into the
            # caller's padded buffer and attend over the buffer — the old
            # concat path copied the whole cache (and the GQA repeat doubled
            # it again) every layer every step, the measured per-lane cost of
            # batched guided decode
            ck, cv = cache
            # iota-select write (not dynamic_update_slice): a scatter into a
            # while_loop carry buffer hard-crashed the axon TPU runtime
            # ("TPU worker process crashed"), reproducibly; the select lowers
            # to a fused elementwise update and runs fine
            sel = (
                jnp.arange(ck.shape[1]) == cache_write_pos
            )[None, :, None, None]
            ck = jnp.where(sel, k.astype(ck.dtype), ck)
            cv = jnp.where(sel, v.astype(cv.dtype), cv)
            new_cache = (ck, cv)
            k, v = ck.astype(self.dtype), cv.astype(self.dtype)
        else:
            new_cache = (k, v)  # K/V of the NEW tokens only (caller owns the buffer)
            if cache is not None:
                ck, cv = cache
                k = jnp.concatenate([ck, k], axis=1)
                v = jnp.concatenate([cv, v], axis=1)

        rep = h // hkv
        if rep > 1:
            # grouped-query attention WITHOUT materializing the repeated
            # k/v (jnp.repeat doubled the cache traffic per layer per step)
            qg = q.reshape(b, t, hkv, rep, hd)
            scores = jnp.einsum("bqgrd,bkgd->bgrqk", qg, k) / math.sqrt(hd)
            scores = jnp.where(attn_mask[:, None, None, :, :], scores, NEG_INF)
            attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
            out = jnp.einsum("bgrqk,bkgd->bqgrd", attn, v).reshape(b, t, h * hd)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
            scores = jnp.where(attn_mask[:, None, :, :], scores, NEG_INF)
            attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, h * hd)
        out = nn.Dense(cfg.hidden_size, use_bias=False, dtype=self.dtype, name="o_proj")(out)
        return out, new_cache


class LlamaMLP(nn.Module):
    cfg: LlamaConfig
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        gate = nn.Dense(cfg.intermediate_size, use_bias=False, dtype=self.dtype, name="gate_proj")(x)
        up = nn.Dense(cfg.intermediate_size, use_bias=False, dtype=self.dtype, name="up_proj")(x)
        return nn.Dense(cfg.hidden_size, use_bias=False, dtype=self.dtype, name="down_proj")(
            jax.nn.silu(gate) * up
        )


class LlamaBlock(nn.Module):
    cfg: LlamaConfig
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, positions, attn_mask, cache=None, cache_write_pos=None):
        h = RMSNorm(self.cfg.rms_norm_eps, dtype=self.dtype, name="input_layernorm")(x)
        h, new_cache = LlamaAttention(self.cfg, dtype=self.dtype, name="self_attn")(
            h, positions, attn_mask, cache, cache_write_pos
        )
        x = x + h
        h = RMSNorm(self.cfg.rms_norm_eps, dtype=self.dtype, name="post_attention_layernorm")(x)
        h = LlamaMLP(self.cfg, dtype=self.dtype, name="mlp")(h)
        return x + h, new_cache


class LlamaModel(nn.Module):
    """Returns final hidden states (post model.norm), optionally logits."""

    cfg: LlamaConfig
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,  # [B, T]
        valid: jnp.ndarray,  # [B, T] bool (False = pad, possibly mid-row)
        cache: Optional[Dict] = None,  # {'k': [L,B,Tc,...], layers list}
        cache_valid: Optional[jnp.ndarray] = None,  # [B, Tc] validity of cache keys
        positions: Optional[jnp.ndarray] = None,  # [B, T] overrides cumsum(valid)-1
        return_logits: bool = False,
        embed_override: Optional[jnp.ndarray] = None,  # [B, T, H]
        override_mask: Optional[jnp.ndarray] = None,  # [B, T] bool: use override
        cache_write_pos=None,  # scalar: in-place decode (T must be 1); the new
        # token's k/v are dus-written into the padded cache buffers, which come
        # back updated in out_cache — no concat, no repeat (decode hot path)
    ):
        cfg = self.cfg
        b, t = input_ids.shape
        if positions is None:
            positions = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
            positions = jnp.maximum(positions, 0)

        if cache_write_pos is not None:
            assert cache is not None and t == 1, "in-place decode needs cache, T=1"
            tc = cache_valid.shape[1]
            # keys = the padded buffer only; the query's own slot is valid
            cache_valid = cache_valid | (jnp.arange(tc) == cache_write_pos)[None, :]
            qk_mask = jnp.broadcast_to(cache_valid[:, None, :], (b, t, tc))
        else:
            # attention mask over [query t, key (cache + t)]
            causal = jnp.tril(jnp.ones((t, t), bool))
            qk_mask = causal[None, :, :] & valid[:, None, :] & valid[:, :, None]
            if cache is not None:
                tc = cache_valid.shape[1]
                cmask = jnp.broadcast_to(cache_valid[:, None, :], (b, t, tc)) & valid[:, :, None]
                qk_mask = jnp.concatenate([cmask, qk_mask], axis=2)

        emb = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="embed_tokens")
        x = emb(input_ids)
        if embed_override is not None:
            # inject continuous embeddings (e.g. projected encoder frames of
            # the HF causal-LM decoder) at override_mask positions
            x = jnp.where(override_mask[..., None], embed_override.astype(x.dtype), x)
        new_cache = []
        for i in range(cfg.num_hidden_layers):
            layer_cache = None if cache is None else cache["layers"][i]
            x, kv = LlamaBlock(cfg, dtype=self.dtype, name=f"layers_{i}")(
                x, positions, qk_mask, layer_cache, cache_write_pos
            )
            new_cache.append(kv)
        x = RMSNorm(cfg.rms_norm_eps, dtype=self.dtype, name="norm")(x)
        out_cache = {"layers": new_cache}
        if return_logits:
            if cfg.tie_word_embeddings:
                logits = emb.attend(x)
            else:
                logits = nn.Dense(
                    cfg.vocab_size, use_bias=False, dtype=self.dtype, name="lm_head"
                )(x)
            return x, logits, out_cache
        return x, out_cache


# ---------------------------------------------------------------------------
# HF weight conversion
# ---------------------------------------------------------------------------

def convert_hf_state_dict(state_dict: Dict[str, Any], cfg: LlamaConfig) -> Dict:
    """torch state_dict (LlamaForCausalLM / Qwen2ForCausalLM) -> flax params."""

    def a(name, transpose=False):
        w = state_dict[name]
        w = np.asarray(w.float().numpy() if hasattr(w, "float") else w, np.float32)
        return w.T if transpose else w

    p: Dict[str, Any] = {
        "embed_tokens": {"embedding": a("model.embed_tokens.weight")},
        "norm": {"weight": a("model.norm.weight")},
    }
    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}"
        layer = {
            "input_layernorm": {"weight": a(f"{pre}.input_layernorm.weight")},
            "post_attention_layernorm": {
                "weight": a(f"{pre}.post_attention_layernorm.weight")
            },
            "self_attn": {},
            "mlp": {
                "gate_proj": {"kernel": a(f"{pre}.mlp.gate_proj.weight", True)},
                "up_proj": {"kernel": a(f"{pre}.mlp.up_proj.weight", True)},
                "down_proj": {"kernel": a(f"{pre}.mlp.down_proj.weight", True)},
            },
        }
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            d = {"kernel": a(f"{pre}.self_attn.{proj}.weight", True)}
            bkey = f"{pre}.self_attn.{proj}.bias"
            if cfg.attention_bias and bkey in state_dict and proj != "o_proj":
                d["bias"] = a(bkey)
            layer["self_attn"][proj] = d
        p[f"layers_{i}"] = layer
    if not cfg.tie_word_embeddings and "lm_head.weight" in state_dict:
        p["lm_head"] = {"kernel": a("lm_head.weight", True)}
    return p


def load_hf_llama(
    model_name_or_path: str, dtype=jnp.bfloat16, cache_dir: Optional[str] = None
) -> Tuple[LlamaModel, Dict, Any]:
    """Load config+weights via transformers (local dir or cached hub snapshot).

    Returns (flax model, {'params': ...}, hf tokenizer).
    """
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM, AutoTokenizer

    hf_cfg = AutoConfig.from_pretrained(model_name_or_path, cache_dir=cache_dir)
    cfg = LlamaConfig.from_hf_config(hf_cfg)
    hf_model = AutoModelForCausalLM.from_pretrained(
        model_name_or_path, cache_dir=cache_dir, torch_dtype=torch.float32
    )
    params = convert_hf_state_dict(hf_model.state_dict(), cfg)
    del hf_model
    tokenizer = AutoTokenizer.from_pretrained(model_name_or_path, cache_dir=cache_dir)
    model = LlamaModel(cfg, dtype=dtype)
    return model, {"params": params}, tokenizer
