#!/usr/bin/env python3
"""Llama-2-7B decode-only residency probe on one v5e chip (VERDICT r4 #9).

The librispeech_100 fork config guides with Llama-2-7b
(/root/reference/egs2/librispeech_100/work/conf/tuning/
train_asr+llama2_conformer.yaml) — ~13 GB in bf16 against a 16 GB v5e.
This probe answers, with a measurement, whether the guided DECODE path fits
on one chip:

1. writes a synthetic HF sharded safetensors checkpoint at the exact
   Llama-2-7b geometry (vocab 32000, hidden 4096, inter 11008, 32 layers,
   32 heads, MHA — config.json of meta-llama/Llama-2-7b-hf);
2. streams it onto the chip in bf16 (models/llm/ingest.py — one tensor
   resident on host at a time);
3. runs the cached guided beam-10 decode on a 10 s utterance and records
   peak HBM + decode RTFx, OR catches the allocator failure and records the
   OOM boundary.

Either outcome is written to /tmp/probe_7b_result.json; paste into NOTES.md.

Run:  python tools/probe_7b_residency.py        (TPU; ~10 min incl. 13 GB
      checkpoint write on first run — reused afterwards)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

RESULT = Path("/tmp/probe_7b_result.json")
CKPT = "/tmp/llmasr_bench_llama2_7b"
SR, SECONDS = 16000, 10.0


def llama2_7b_config():
    """meta-llama/Llama-2-7b-hf dims (HF config.json; the librispeech_100
    fork guidance LLM, train_asr+llama2_conformer.yaml)."""
    from llm_guided_asr_tpu.models.llm.llama import LlamaConfig

    return LlamaConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=32, num_attention_heads=32,
        num_key_value_heads=32, rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=4096, tie_word_embeddings=False,
    )


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/llmasr_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from llm_guided_asr_tpu.models.conformer import ConformerConfig
    from llm_guided_asr_tpu.models.llm.ingest import (
        stream_llm_params,
        write_synth_hf_checkpoint,
    )
    from llm_guided_asr_tpu.models.llm.prompt import PromptTemplate
    from llm_guided_asr_tpu.models.llm_guided import (
        LLMGuidedASRConfig,
        LLMGuidedASRModel,
    )
    from llm_guided_asr_tpu.models.transformer_decoder import (
        TransformerDecoderConfig,
    )
    from llm_guided_asr_tpu.ops.frontend import FrontendConfig
    from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch
    from llm_guided_asr_tpu.search.scorers import CachedGuidedScorer

    result = {"llm": "llama-2-7b (synthetic weights, exact geometry)",
              "dtype": "bfloat16", "chip": str(jax.devices()[0])}
    llm = llama2_7b_config()
    n_params = (
        llm.vocab_size * llm.hidden_size * 2  # embed + lm_head (untied)
        + llm.num_hidden_layers * (
            4 * llm.hidden_size * llm.hidden_size
            + 3 * llm.hidden_size * llm.intermediate_size
            + 2 * llm.hidden_size
        )
        + llm.hidden_size
    )
    result["llm_params_b"] = round(n_params / 1e9, 3)
    result["llm_bf16_gb"] = round(n_params * 2 / (1 << 30), 2)
    print(f"7B geometry: {result['llm_params_b']}B params, "
          f"{result['llm_bf16_gb']} GiB bf16", flush=True)

    t0 = time.perf_counter()
    write_synth_hf_checkpoint(CKPT, llm)
    result["ckpt_write_s"] = round(time.perf_counter() - t0, 1)
    print(f"checkpoint ready in {result['ckpt_write_s']}s", flush=True)

    prompt = PromptTemplate(
        prefix_ids=tuple(range(2, 50)), suffix_ids=tuple(range(50, 66)),
        start_of_response_id=70, end_of_response_id=70, pad_id=0,
    )
    cfg = LLMGuidedASRConfig(
        vocab_size=llm.vocab_size, llm=llm, prompt=prompt,
        frontend=FrontendConfig(), normalize="utterance_mvn",
        encoder=ConformerConfig(
            output_size=256, attention_heads=4, linear_units=1024,
            num_blocks=12, macaron_style=True, use_cnn_module=True,
            cnn_module_kernel=31,
        ),
        decoder=TransformerDecoderConfig(
            attention_heads=4, linear_units=2048, num_blocks=6
        ),
        ctc_weight=0.3,
    )
    model = LLMGuidedASRModel(cfg, dtype=jnp.bfloat16)
    samples = int(SECONDS * SR)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((1, samples)), jnp.float32) * 0.1
    lengths = jnp.full((1,), samples, jnp.int32)
    text = jnp.ones((1, 16), jnp.int32)
    tlens = jnp.full((1,), 16, jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}

    from bench import _fence, host_init_variables

    try:
        variables = host_init_variables(
            model, rngs, speech, lengths, text, tlens, deterministic=True
        )
        t0 = time.perf_counter()
        llm_params = stream_llm_params(CKPT, llm, dtype=jnp.bfloat16)
        _fence(llm_params["embed_tokens"]["embedding"])
        result["ingest_s"] = round(time.perf_counter() - t0, 1)
        print(f"streamed 7B onto chip in {result['ingest_s']}s", flush=True)
        variables = jax.device_put(variables)
        variables["params"] = {**variables["params"], "llm": llm_params}

        enc, enc_lens = jax.jit(
            lambda s, l: model.apply(variables, s, l, method=model.encode)
        )(speech, lengths)
        _fence(enc)
        bs = BatchBeamSearch(
            model, variables, vocab_size=llm.vocab_size, sos=70, eos=70,
            beam_size=10, ctc_weight=0.3,
            att_scorer=CachedGuidedScorer(model, variables),
        )
        print("compiling guided decode...", flush=True)
        bs(enc, enc_lens, maxlenratio=-24.0)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            bs(enc, enc_lens, maxlenratio=-24.0)
            w = time.perf_counter() - t0
            best = w if best is None else min(best, w)
        result["llm_guided_7b_rtfx"] = round(SECONDS / best, 1)
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        if peak:
            result["peak_hbm_gb"] = round(peak / (1 << 30), 2)
        result["fits"] = True
        print(f"7B guided decode: {result['llm_guided_7b_rtfx']}x realtime, "
              f"peak HBM {result.get('peak_hbm_gb')} GiB", flush=True)
    except Exception as e:  # XlaRuntimeError RESOURCE_EXHAUSTED etc.
        result["fits"] = False
        result["error"] = f"{type(e).__name__}: {e}"[:500]
        print(f"OOM boundary hit: {result['error']}", flush=True)

    RESULT.write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
