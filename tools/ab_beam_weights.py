#!/usr/bin/env python3
"""A/B: traced-args weights vs closure-captured weights in the beam search.

VERDICT r4 weak #3: beam10 regressed 1051.8 -> 864.0 between r3 and r4; the
prime suspect is the traced-weights plumbing added in r4 (closure constants
let XLA constant-fold, traced arguments do not).  This measures both modes
back-to-back on the SAME process/chip/tunnel state, removing run-to-run
tunnel variance from the comparison:

  mode A: weights passed as traced jit arguments (current default)
  mode B: LLMASR_BEAM_CLOSURE_WEIGHTS=1 semantics (weights as jit constants)

Prints one JSON line per mode with best-of-N window times.

Run: python tools/ab_beam_weights.py [windows=4] [iters=5]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    windows = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/llmasr_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from bench import FLAGSHIP_SECONDS, SR, _fence, build_flagship
    from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = build_flagship(dtype)
    batch = 32 if on_tpu else 2
    samples = int(FLAGSHIP_SECONDS * SR)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((batch, samples)), jnp.float32) * 0.1
    lengths = jnp.full((batch,), samples, jnp.int32)
    text = jnp.ones((batch, 24), jnp.int32)
    tlens = jnp.full((batch,), 24, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, lengths, text, tlens, deterministic=True,
    )
    enc, enc_lens = jax.jit(
        lambda s, l: model.apply(variables, s, l, method=model.encode)
    )(speech, lengths)
    _fence(enc)

    def measure(mode_env: str, label: str):
        os.environ["LLMASR_BEAM_CLOSURE_WEIGHTS"] = mode_env
        bs = BatchBeamSearch(
            model, variables, vocab_size=5000, sos=4999, eos=4999,
            beam_size=10, ctc_weight=0.3,
        )
        t0 = time.perf_counter()
        bs.batch_decode(enc, enc_lens, maxlenratio=-24.0)  # compile
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(windows):
            t0 = time.perf_counter()
            for _ in range(iters):
                bs.batch_decode(enc, enc_lens, maxlenratio=-24.0)
            times.append(time.perf_counter() - t0)
        best = min(times)
        rtfx = batch * FLAGSHIP_SECONDS * iters / best
        print(json.dumps({
            "mode": label, "beam10_rtfx": round(rtfx, 1),
            "compile_s": round(compile_s, 1),
            "window_s": [round(t, 3) for t in times],
        }), flush=True)
        return rtfx

    # interleave: A B A B to decorrelate tunnel drift from mode
    a1 = measure("0", "traced_args")
    b1 = measure("1", "closure_const")
    a2 = measure("0", "traced_args_2")
    b2 = measure("1", "closure_const_2")
    print(json.dumps({
        "traced_best": round(max(a1, a2), 1),
        "closure_best": round(max(b1, b2), 1),
        "ratio_closure_over_traced": round(max(b1, b2) / max(a1, a2), 3),
    }))


if __name__ == "__main__":
    main()
