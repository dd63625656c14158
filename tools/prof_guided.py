"""Profile the LLM-guided batched decode regression (VERDICT r2 weak #2).

BENCH_r02: llm_guided_batch4_rtfx 133x < single 159x — batch-4 should
amortize dispatch and fill the MXU, not cost 16%.  This tool decomposes
where batch decode loses:

  1. single `__call__` (non-vmapped while_loop search)      — baseline
  2. `batch_decode` at B=1 (vmapped while_loop, same work)  — vmap lowering tax
  3. `batch_decode` at B=2 / B=4                            — scaling curve
  4. loop trip counts per lane (early-exit `viable` cond)   — lockstep tax
  5. per-step slope: maxlen 24 vs 12                        — step cost vs fixed

Run on the TPU (default backend): `python tools/prof_guided.py`.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

SR = 16000
SECONDS = 10.0


def fence(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def build():
    from llm_guided_asr_tpu.models.conformer import ConformerConfig
    from llm_guided_asr_tpu.models.llm.llama import LlamaConfig
    from llm_guided_asr_tpu.models.llm.prompt import PromptTemplate
    from llm_guided_asr_tpu.models.llm_guided import (
        LLMGuidedASRConfig,
        LLMGuidedASRModel,
    )
    from llm_guided_asr_tpu.models.transformer_decoder import TransformerDecoderConfig
    from llm_guided_asr_tpu.ops.frontend import FrontendConfig
    from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch
    from llm_guided_asr_tpu.search.scorers import CachedGuidedScorer

    llm = LlamaConfig(
        vocab_size=5000, hidden_size=512, intermediate_size=1408,
        num_hidden_layers=8, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=2048,
    )
    prompt = PromptTemplate(
        prefix_ids=tuple(range(2, 50)), suffix_ids=tuple(range(50, 66)),
        start_of_response_id=70, end_of_response_id=70, pad_id=0,
    )
    cfg = LLMGuidedASRConfig(
        vocab_size=5000, llm=llm, prompt=prompt,
        frontend=FrontendConfig(), normalize="utterance_mvn",
        encoder=ConformerConfig(
            output_size=256, attention_heads=4, linear_units=1024, num_blocks=12,
            macaron_style=True, use_cnn_module=True, cnn_module_kernel=31,
        ),
        decoder=TransformerDecoderConfig(
            attention_heads=4, linear_units=2048, num_blocks=6
        ),
        ctc_weight=0.3,
    )
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = LLMGuidedASRModel(cfg, dtype=dtype)
    samples = int(SECONDS * SR)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((4, samples)), jnp.float32) * 0.1
    lengths = jnp.full((4,), samples, jnp.int32)
    text = jnp.ones((4, 16), jnp.int32)
    tlens = jnp.full((4,), 16, jnp.int32)
    print("init...", flush=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, lengths, text, tlens, deterministic=True,
    )
    print("encode...", flush=True)
    enc, enc_lens = jax.jit(
        lambda s, l: model.apply(variables, s, l, method=model.encode)
    )(speech, lengths)
    fence(enc)
    print("built", flush=True)
    bs = BatchBeamSearch(
        model, variables, vocab_size=5000, sos=70, eos=70,
        beam_size=10, ctc_weight=0.3,
        att_scorer=CachedGuidedScorer(model, variables),
    )
    return bs, enc, enc_lens


def timeit(fn, iters=5, repeats=3):
    fn()  # compile / warm
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    bs, enc, enc_lens = build()
    results = {}

    # 1. single __call__ (the r2 headline path)
    t = timeit(lambda: bs(enc[:1], enc_lens[:1], maxlenratio=-24.0))
    results["single_call_ms"] = t * 1e3
    print(f"1. single __call__            : {t*1e3:8.1f} ms", flush=True)

    # 2-3. batch_decode at B=1,2,4
    for b in (1, 2, 4):
        t = timeit(lambda b=b: bs.batch_decode(enc[:b], enc_lens[:b], maxlenratio=-24.0))
        results[f"batch{b}_ms"] = t * 1e3
        print(f"2. batch_decode B={b}          : {t*1e3:8.1f} ms "
              f"(per-utt {t*1e3/b:6.1f})", flush=True)

    # 4. trip counts (why lockstep might cost: max over lanes)
    def trips(encs, lens, maxlen):
        def one(e, l):
            ctc_logp = bs._ctc_table(e[None])
            carry = bs._init_carry(ctc_logp, e[None], l, 32, None)
            final = bs._run_loop(e[None], l, maxlen, jnp.asarray(0), carry, ctc_logp)[0]
            return final.step
        return jax.jit(jax.vmap(one))(encs, lens)

    tc = jax.device_get(trips(enc, enc_lens, jnp.asarray(24)))
    results["trip_counts"] = tc.tolist()
    print(f"4. trip counts per lane       : {tc.tolist()}", flush=True)

    # 5. per-step slope: maxlen 12 vs 24 at B=1 and B=4
    for b in (1, 4):
        t24 = timeit(lambda b=b: bs.batch_decode(enc[:b], enc_lens[:b], maxlenratio=-24.0))
        t12 = timeit(lambda b=b: bs.batch_decode(enc[:b], enc_lens[:b], maxlenratio=-12.0))
        step = (t24 - t12) / 12.0
        fixed = t12 - 12 * step
        results[f"b{b}_step_ms"] = step * 1e3
        results[f"b{b}_fixed_ms"] = fixed * 1e3
        print(f"5. B={b}: per-step {step*1e3:6.2f} ms, fixed {fixed*1e3:6.1f} ms",
              flush=True)

    print("\nsummary:", results, flush=True)


if __name__ == "__main__":
    main()
