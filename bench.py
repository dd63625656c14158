#!/usr/bin/env python3
"""Benchmark: batched encoder + greedy CTC decode throughput (RTFx per chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the inference hot path of the flagship Conformer (esun headline
dims: 256-d x 12 blocks) on whatever backend JAX resolves (the driver runs
this on a real TPU chip; falls back to CPU transparently).  RTFx = seconds of
audio processed per wall-clock second.  vs_baseline divides by the reference
operating point: ESPnet GPU decoding of the same model family runs at
~O(100) RTFx per device (BASELINE.md pins WER targets; no official RTFx is
published, so 100 is the working reference denominator).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from llm_guided_asr_tpu.models.asr_model import ASRModel, ASRModelConfig
    from llm_guided_asr_tpu.models.conformer import ConformerConfig
    from llm_guided_asr_tpu.models.transformer_decoder import TransformerDecoderConfig
    from llm_guided_asr_tpu.ops.frontend import FrontendConfig
    from llm_guided_asr_tpu.search.greedy import ctc_greedy_decode

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    cfg = ASRModelConfig(
        vocab_size=5000,
        frontend=FrontendConfig(),
        normalize="utterance_mvn",
        encoder=ConformerConfig(
            output_size=256, attention_heads=4, linear_units=1024, num_blocks=12,
            macaron_style=True, use_cnn_module=True, cnn_module_kernel=31,
        ),
        decoder=TransformerDecoderConfig(
            attention_heads=4, linear_units=2048, num_blocks=6
        ),
        ctc_weight=0.3,
    )
    model = ASRModel(cfg, dtype=dtype)

    batch = 16 if on_tpu else 2
    seconds = 10.0
    samples = int(seconds * 16000)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((batch, samples)), jnp.float32) * 0.1
    lengths = jnp.full((batch,), samples, jnp.int32)

    text = jnp.ones((batch, 8), jnp.int32)
    tlens = jnp.full((batch,), 8, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, lengths, text, tlens, deterministic=True,
    )

    @jax.jit
    def decode(speech, lengths):
        enc, enc_lens = model.apply(variables, speech, lengths, method=model.encode)
        logp = model.apply(variables, enc, method=model.ctc_log_softmax)
        toks, ntoks = ctc_greedy_decode(logp, enc_lens)
        return toks, ntoks

    # warmup/compile
    toks, ntoks = decode(speech, lengths)
    jax.block_until_ready((toks, ntoks))

    iters = 20 if on_tpu else 3
    t0 = time.perf_counter()
    for _ in range(iters):
        toks, ntoks = decode(speech, lengths)
    jax.block_until_ready((toks, ntoks))
    dt = time.perf_counter() - t0

    audio_seconds = batch * seconds * iters
    rtfx = audio_seconds / dt
    baseline_rtfx = 100.0  # assumed reference GPU decode throughput (see docstring)
    print(json.dumps({
        "metric": f"greedy_decode_rtfx_{platform}",
        "value": round(rtfx, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtfx / baseline_rtfx, 3),
    }))


if __name__ == "__main__":
    main()
