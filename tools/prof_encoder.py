"""Per-piece encoder cost on the TPU (MFU hunt, round 4).

prof_train.py: encode fwd=20.7 ms / fwd+bwd=45.9 ms at B=32, 10 s audio —
vs ~2.7 ms fwd speed-of-light for the ~0.5 TFLOP the encoder does.  This
times the pieces at the exact flagship shapes to find where the 7x goes:

  frontend      — STFT+mel+MVN (+specaug off) fwd and fwd+bwd
  subsample     — Conv2dSubsampling fwd+bwd at [B, 1000, 80]
  block         — ONE conformer block fwd and fwd+bwd at [B, T4, 256]
  blockx12      — 12 stacked blocks (checks per-block cost is additive)

Run: python tools/prof_encoder.py [B]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


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
    from llm_guided_asr_tpu.models.conformer import ConformerBlock, ConformerConfig
    from llm_guided_asr_tpu.models.transformer import (
        Conv2dSubsampling,
        RelPositionalEncoding,
    )
    from llm_guided_asr_tpu.ops.frontend import default_frontend

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    print(f"backend={jax.default_backend()} B={batch}", flush=True)

    sr, seconds = 16000, 10.0
    rng = np.random.default_rng(0)
    speech = jnp.asarray(
        rng.standard_normal((batch, int(sr * seconds))), jnp.float32) * 0.1
    slens = jnp.full((batch,), speech.shape[1], jnp.int32)

    def fe_loss(s, sl):
        f, fl = default_frontend(s, sl)
        return jnp.sum(f.astype(jnp.float32) ** 2)

    fe_fwd = jax.jit(default_frontend)
    fe_grad = jax.jit(jax.grad(fe_loss, argnums=0))
    print(f"frontend fwd: {timeit(fe_fwd, speech, slens) * 1e3:.2f}ms",
          flush=True)
    print(f"frontend fwd+bwd(d/dspeech): "
          f"{timeit(fe_grad, speech, slens) * 1e3:.2f}ms", flush=True)

    feats, flens = fe_fwd(speech, slens)
    t_feat = feats.shape[1]
    print(f"feats: {feats.shape} {feats.dtype}", flush=True)

    sub = Conv2dSubsampling(256, dtype=dtype)
    sub_vars = sub.init(jax.random.PRNGKey(0), feats.astype(dtype))

    def sub_loss(v, f):
        return jnp.sum(sub.apply(v, f).astype(jnp.float32) ** 2)

    sub_grad = jax.jit(jax.grad(sub_loss))
    sub_fwd = jax.jit(lambda v, f: sub.apply(v, f))
    fd = feats.astype(dtype)
    print(f"subsample fwd: {timeit(sub_fwd, sub_vars, fd) * 1e3:.2f}ms", flush=True)
    print(f"subsample fwd+bwd: {timeit(sub_grad, sub_vars, fd) * 1e3:.2f}ms",
          flush=True)

    x = sub_fwd(sub_vars, fd)
    t4 = x.shape[1]
    print(f"block input: {x.shape}", flush=True)
    valid = jnp.ones((batch, t4), bool)

    cfg = ConformerConfig(
        output_size=256, attention_heads=4, linear_units=1024, num_blocks=12,
        macaron_style=True, use_cnn_module=True, cnn_module_kernel=31,
        attention_dropout_rate=0.1,
    )
    pe = RelPositionalEncoding(0.1, dtype=dtype)
    pe_vars = pe.init(jax.random.PRNGKey(0), x)
    _, pos_emb = pe.apply(pe_vars, x, True)

    import flax.linen as nn

    for n in (1, 12):

        class StackM(nn.Module):
            n: int

            @nn.compact
            def __call__(self, x, pos_emb, valid, det):
                for i in range(self.n):
                    x = ConformerBlock(cfg, dtype=dtype, name=f"b{i}")(
                        x, pos_emb, valid, det)
                return x

        m = StackM(n)
        variables = m.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, pos_emb, valid, True)
        rngk = jax.random.key(2, impl="rbg")

        def loss(v, x):
            y, upd = m.apply(v, x, pos_emb, valid, False,
                             rngs={"dropout": rngk}, mutable=["batch_stats"])
            return jnp.sum(y.astype(jnp.float32) ** 2)

        bfwd = jax.jit(lambda v, x: m.apply(
            v, x, pos_emb, valid, False, rngs={"dropout": rngk},
            mutable=["batch_stats"]))
        bgrad = jax.jit(jax.grad(loss, argnums=1))
        print(f"block x{n} fwd: {timeit(bfwd, variables, x) * 1e3:.2f}ms",
              flush=True)
        print(f"block x{n} fwd+bwd: {timeit(bgrad, variables, x) * 1e3:.2f}ms",
              flush=True)


if __name__ == "__main__":
    main()
