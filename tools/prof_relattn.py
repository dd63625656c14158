"""Op-level microbench: fused Pallas rel-pos attention vs the dense XLA path.

The axon tunnel has a ~900us per-dispatch floor (NOTES.md round 4), so ops
are timed by running ITERS copies inside ONE jitted lax.fori_loop with a
forced data dependency — per-iteration time then reflects device execution,
not RPC overhead.  Ablation variants isolate where the kernel spends time:

  fused        the shipping kernel (ops/rel_attention.py)
  dense        the XLA pad/reshape rel-shift path
  abs          plain absolute attention (qu.k^T only) — the lower bound
  noshift      fused math with the barrel shifter skipped (WRONG results;
               measures the log-step pltpu.roll chain's cost)

Run on TPU: python tools/prof_relattn.py [T] [dropout] [iters]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit_looped(fn, args, iters=50, windows=4):
    """Time fn by running `iters` dependent copies inside one jit."""

    def repeated(*a):
        def body(_, carry):
            a, acc = carry
            out = fn(*a)
            # tiny additive dependency: keeps every iteration live without
            # changing values measurably (bf16 eps is ~1e-2 relative)
            dep = jnp.sum(out[0, 0].astype(jnp.float32)) * 1e-30
            a = (a[0] + dep.astype(a[0].dtype),) + tuple(a[1:])
            return (a, acc + dep)

        (_, acc) = jax.lax.fori_loop(
            0, iters, body, (a, jnp.float32(0.0)))
        return acc

    f = jax.jit(repeated)
    out = f(*args)
    fence(out)
    best = None
    for rep in range(windows):
        t0 = time.perf_counter()
        out = f(*args)
        fence(out)
        dt = (time.perf_counter() - t0) / iters
        if rep == 0:
            continue
        best = dt if best is None else min(best, dt)
    return best


def timeit_grad_looped(fn, args, iters=50, windows=4):
    def loss(*a):
        return jnp.sum(fn(*a).astype(jnp.float32) ** 2)

    g = jax.grad(loss, argnums=tuple(range(len(args))))

    def repeated(*a):
        def body(_, carry):
            a, acc = carry
            gr = g(*a)
            dep = jnp.sum(gr[0][0, 0].astype(jnp.float32)) * 1e-30
            a = (a[0] + dep.astype(a[0].dtype),) + tuple(a[1:])
            return (a, acc + dep)

        (_, acc) = jax.lax.fori_loop(
            0, iters, body, (a, jnp.float32(0.0)))
        return acc

    f = jax.jit(repeated)
    out = f(*args)
    fence(out)
    best = None
    for rep in range(windows):
        t0 = time.perf_counter()
        out = f(*args)
        fence(out)
        dt = (time.perf_counter() - t0) / iters
        if rep == 0:
            continue
        best = dt if best is None else min(best, dt)
    return best


def dense_rel_attention(q, k, v, p, u, vb, mask, sm_scale):
    """The XLA path of RelPositionMultiHeadedAttention (scores only)."""
    t = q.shape[1]
    ac = jnp.einsum("bqhd,bkhd->bhqk", q + u, k)
    bd = jnp.einsum("bqhd,phd->bhqp", q + vb, p)
    # pad-reshape rel shift
    b_, h_, _, pl_ = bd.shape
    x = jnp.pad(bd, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b_, h_, pl_ + 1, t)[:, :, 1:, :].reshape(b_, h_, t, pl_)[..., :t]
    scores = (ac + x) * sm_scale
    scores = jnp.where(mask[:, None, :, :], scores.astype(jnp.float32), -1e30)
    attn = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)


def abs_attention(q, k, v, u, mask, sm_scale):
    scores = jnp.einsum("bqhd,bkhd->bhqk", q + u, k) * sm_scale
    scores = jnp.where(mask[:, None, :, :], scores.astype(jnp.float32), -1e30)
    attn = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)


def main():
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    rate = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    b, h, dk = 32, 4, 64
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    rng = np.random.default_rng(0)

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.float32).astype(dtype)

    q = mk(b, t, h, dk)
    k = mk(b, t, h, dk)
    v = mk(b, t, h, dk)
    p = mk(2 * t - 1, h, dk)
    u = mk(h, dk)
    vb = mk(h, dk)
    lens = np.full((b,), t)
    lens[: b // 2] = t - 7
    valid = jnp.asarray(np.arange(t)[None, :] < lens[:, None])
    mask = valid[:, None, :]
    sm_scale = 1.0 / math.sqrt(dk)

    from llm_guided_asr_tpu.ops import rel_attention as ra

    tp = -(-t // 128) * 128
    pad = tp - t

    def to_bhtd(y):
        return jnp.pad(jnp.moveaxis(y, 2, 1), ((0, 0), (0, 0), (0, pad), (0, 0)))

    def fused(q, k, v, p):
        qu = to_bhtd(q + u)
        qv = to_bhtd(q + vb)
        kk = to_bhtd(k)
        vv = to_bhtd(v)
        p_pad = ra.rel_attention_pad_pos(p, t, tp)
        kv_valid = jnp.pad(valid.astype(jnp.int32), ((0, 0), (0, pad)))
        out = ra.rel_flash_attention(qu, qv, kk, vv, p_pad.astype(qu.dtype),
                                     kv_valid, sm_scale, seed=jnp.int32(7),
                                     dropout_rate=rate)
        return jnp.moveaxis(out[:, :, :t], 1, 2)

    def dense(q, k, v, p):
        return dense_rel_attention(q, k, v, p, u, vb, mask, sm_scale)

    def absattn(q, k, v, p):
        del p
        return abs_attention(q, k, v, u, mask, sm_scale)

    fns = {"fused": fused, "dense": dense, "abs": absattn}
    print(f"backend={jax.default_backend()} B={b} H={h} T={t} dk={dk} "
          f"dropout={rate} iters={iters} (in-graph loop)", flush=True)
    for name, fn in fns.items():
        if name != "fused" and rate > 0.0:
            continue  # dense/abs drop outside this op; compare at rate 0
        t_f = timeit_looped(fn, (q, k, v, p), iters=iters)
        t_g = timeit_grad_looped(fn, (q, k, v, p), iters=iters)
        print(f"[{name}] fwd={t_f * 1e6:.0f}us fwd+bwd={t_g * 1e6:.0f}us",
              flush=True)


if __name__ == "__main__":
    main()
