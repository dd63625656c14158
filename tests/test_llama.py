"""JAX Llama/Qwen numerics parity vs transformers (tiny random models, CPU)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.llm.llama import (
    LlamaConfig,
    LlamaModel,
    convert_hf_state_dict,
)


def make_hf_llama(vocab=64, hidden=32, inter=48, layers=2, heads=4, kv_heads=2):
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    cfg = HFLlamaConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=128,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    return LlamaForCausalLM(cfg).eval(), cfg


def to_jax(hf_model, hf_cfg, dtype=jnp.float32):
    cfg = LlamaConfig.from_hf_config(hf_cfg)
    params = convert_hf_state_dict(hf_model.state_dict(), cfg)
    return LlamaModel(cfg, dtype=dtype), {"params": params}, cfg


def test_hidden_states_match_hf():
    hf, hf_cfg = make_hf_llama()
    model, variables, cfg = to_jax(hf, hf_cfg)
    ids = np.array([[1, 5, 9, 20, 33, 2], [3, 7, 11, 13, 2, 0]], np.int64)
    mask = np.array([[1, 1, 1, 1, 1, 1], [1, 1, 1, 1, 1, 0]], np.int64)
    with torch.no_grad():
        ref = hf.model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()
    ours, _ = model.apply(variables, jnp.asarray(ids), jnp.asarray(mask, bool))
    ours = np.asarray(ours)
    # compare only valid positions
    np.testing.assert_allclose(ours[0], ref[0], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(ours[1, :5], ref[1, :5], atol=2e-4, rtol=1e-3)


def test_logits_match_hf():
    hf, hf_cfg = make_hf_llama()
    model, variables, cfg = to_jax(hf, hf_cfg)
    ids = np.array([[1, 5, 9, 20]], np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids)).logits.numpy()
    _, logits, _ = model.apply(
        variables, jnp.asarray(ids), jnp.ones((1, 4), bool), return_logits=True
    )
    np.testing.assert_allclose(np.asarray(logits), ref, atol=5e-4, rtol=1e-3)


def test_midrow_padding_equals_contiguous():
    """Pads inside a row (static packing) must equal the depadded sequence."""
    hf, hf_cfg = make_hf_llama()
    model, variables, cfg = to_jax(hf, hf_cfg)
    # contiguous: [1, 5, 9, 20]; packed: [1, 5, PAD, PAD, 9, 20]
    cont = jnp.asarray([[1, 5, 9, 20]])
    packed = jnp.asarray([[1, 5, 0, 0, 9, 20]])
    valid = jnp.asarray([[1, 1, 0, 0, 1, 1]], bool)
    out_c, _ = model.apply(variables, cont, jnp.ones((1, 4), bool))
    out_p, _ = model.apply(variables, packed, valid)
    np.testing.assert_allclose(
        np.asarray(out_p)[0, [0, 1, 4, 5]], np.asarray(out_c)[0], atol=1e-4, rtol=1e-3
    )


def test_kv_cache_matches_full_forward():
    hf, hf_cfg = make_hf_llama()
    model, variables, cfg = to_jax(hf, hf_cfg)
    ids = jnp.asarray([[1, 5, 9, 20, 33]])
    valid = jnp.ones((1, 5), bool)
    full, _ = model.apply(variables, ids, valid)
    # prefix then one-token step
    _, cache = model.apply(variables, ids[:, :4], valid[:, :4])
    step, _ = model.apply(
        variables, ids[:, 4:5], valid[:, 4:5],
        cache=cache, cache_valid=valid[:, :4],
        positions=jnp.asarray([[4]]),
    )
    np.testing.assert_allclose(
        np.asarray(step)[0, 0], np.asarray(full)[0, 4], atol=1e-4, rtol=1e-3
    )


def test_qwen2_with_bias_matches_hf():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg_hf = Qwen2Config(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    hf = Qwen2ForCausalLM(cfg_hf).eval()
    cfg = LlamaConfig.from_hf_config(cfg_hf)
    assert cfg.attention_bias
    params = convert_hf_state_dict(hf.state_dict(), cfg)
    model = LlamaModel(cfg, dtype=jnp.float32)
    ids = np.array([[1, 5, 9, 20, 2]], np.int64)
    with torch.no_grad():
        ref = hf.model(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
    ours, _ = model.apply({"params": params}, jnp.asarray(ids), jnp.ones((1, 5), bool))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)
