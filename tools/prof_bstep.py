"""Train-step batch scaling on the TPU (MFU hunt, round 4).

The B=32 flagship step is 54 ms for ~2.1 TFLOP (MFU 0.196).  If a chunk of
that is batch-independent (small-op overhead, dispatch, layout changes),
larger batches amortize it and MFU rises.  Times the full grad+apply step
at each requested batch and prints sps + MFU.

Run: python tools/prof_bstep.py [B ...]   (default: 32 64)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

SECONDS = 10.0
V5E_BF16_FLOPS = 197e12


def fence(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, iters=10, windows=4):
    out = fn(*args)
    fence(out)
    best = None
    for rep in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        fence(out)
        dt = (time.perf_counter() - t0) / iters
        if rep == 0:
            continue
        best = dt if best is None else min(best, dt)
    return best


def main():
    from tools.prof_train import build, step_flops

    batches = [int(a) for a in sys.argv[1:]] or [32, 64]
    print(f"backend={jax.default_backend()}", flush=True)
    for batch in batches:
        model, variables, state, grad_step, apply_step, tbatch, rngk = build(batch)
        params, extra, opt = state["params"], state["extra"], state["opt_state"]

        def full(p, o):
            g, e, st, w = grad_step(p, extra, tbatch, rngk)
            return apply_step(p, o, g)

        print(f"[B={batch}] compiling...", flush=True)
        t_full = timeit(lambda: full(params, opt), iters=10)
        flops = step_flops(grad_step, params, extra, tbatch, rngk)
        mfu = flops / t_full / V5E_BF16_FLOPS if flops else 0.0
        sps = batch * SECONDS / t_full
        print(f"[B={batch}] full={t_full * 1e3:.2f}ms sps={sps:.0f} mfu={mfu:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
