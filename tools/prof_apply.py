"""Decompose apply_step cost on the TPU (MFU hunt, round 4).

prof_train.py measured apply=18.8 ms for ~37M params — ~8x over the
bandwidth bound.  Suspects: (a) per-call dispatch floor through the axon
tunnel, (b) the 615-leaf flatten (concats) re-done every step, (c) the
615-leaf unflatten (dynamic-slices + casts), (d) the optax chain itself.

Rows:
  noop          — jitted x+1 on [8] (pure dispatch floor)
  flatten       — ChunkPlan.flatten(params) alone
  unflatten     — ChunkPlan.unflatten(chunks) alone
  update_flat   — optax adamw on the 8 flat chunks alone
  apply_full    — the shipping apply_step
  fused_step    — grad+apply in ONE jit (bench/accum=1 shape)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


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
    import optax

    from tools.prof_train import build

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    print(f"backend={jax.default_backend()} B={batch}", flush=True)
    model, variables, state, grad_step, apply_step, tbatch, rngk = build(batch)
    params, extra, opt = state["params"], state["extra"], state["opt_state"]

    from llm_guided_asr_tpu.train.optim import ChunkPlan

    plan = ChunkPlan(params)
    tx = optax.adamw(1e-3)

    noop = jax.jit(lambda x: x + 1)
    xsmall = jnp.zeros((8,), jnp.float32)
    print(f"noop: {timeit(noop, xsmall) * 1e3:.3f}ms", flush=True)

    flat = jax.jit(lambda p: plan.flatten(p))
    chunks = flat(params)
    print(f"flatten: {timeit(flat, params) * 1e3:.3f}ms", flush=True)

    unflat = jax.jit(lambda c: plan.unflatten(c))
    print(f"unflatten: {timeit(unflat, chunks) * 1e3:.3f}ms", flush=True)

    fopt = tx.init(chunks)

    @jax.jit
    def update_flat(c, o):
        u, o2 = tx.update(c, o, c)
        return [a + b for a, b in zip(c, u)], o2

    print(f"update_flat: {timeit(update_flat, chunks, fopt) * 1e3:.3f}ms",
          flush=True)

    g, *_ = grad_step(params, extra, tbatch, rngk)
    print(f"apply_full: {timeit(apply_step, params, opt, g) * 1e3:.3f}ms",
          flush=True)

    @jax.jit
    def fused_step(p, o, e, b, r):
        grads, e2, stats, w = grad_step._fun(p, e, b, r) if hasattr(
            grad_step, "_fun") else grad_step(p, e, b, r)
        p2, o2 = apply_step(p, o, grads)
        return p2, o2, e2, stats

    print("compiling fused_step...", flush=True)
    t = timeit(fused_step, params, opt, extra, tbatch, rngk)
    print(f"fused_step: {t * 1e3:.3f}ms", flush=True)


if __name__ == "__main__":
    main()
