"""Encoder-internal ablation profile on the TPU (MFU hunt, round 4).

prof_train.py showed the flagship conformer encoder fwd+bwd at ~50 ms
(B=32) where the matmul-FLOP ideal is ~6 ms, flat in batch (B=128 gives the
same MFU) — so the gap is per-element work, not dispatch.  This tool times
encoder fwd / fwd+bwd over FEATURES (frontend excluded) under one-knob
ablations to locate it:

  base        flagship config, dense rel attention, dropout 0.1
  nodrop      all dropout rates 0 (isolates RNG + mask traffic)
  nocnn       use_cnn_module=False (depthwise conv + masked BN share)
  nomacaron   single FFN per block
  abspos      absolute positional attention (rel-pos machinery share)
  linear_in   input_layer='linear' (conv2d subsampling share — its second
              3x3x256x256 conv is ~178 GFLOP fwd at B=32, comparable to the
              whole 12-block stack)

Times use in-graph fori_loop repetition (tools/prof_relattn.py style) to
amortize the ~900 us axon dispatch floor.

Run: python tools/prof_encoder.py [B] [iters]
"""

from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

SR = 16000
SECONDS = 10.0
V5E_BF16_FLOPS = 197e12


def fence(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit_looped(f, args, iters, windows=3):
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


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    from llm_guided_asr_tpu.models.conformer import (
        ConformerConfig,
        ConformerEncoder,
    )
    from llm_guided_asr_tpu.ops.frontend import default_frontend

    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    rng = np.random.default_rng(0)
    samples = int(SECONDS * SR)
    speech = jnp.asarray(
        rng.standard_normal((batch, samples)), jnp.float32) * 0.1
    feats, feat_lens = jax.jit(default_frontend)(
        speech, jnp.full((batch,), samples, jnp.int32))
    feats = feats.astype(dtype)
    print(f"backend={jax.default_backend()} B={batch} feats={feats.shape} "
          f"iters={iters}", flush=True)

    base = ConformerConfig(
        output_size=256, attention_heads=4, linear_units=1024, num_blocks=12,
        macaron_style=True, use_cnn_module=True, cnn_module_kernel=31,
    )
    variants = {
        "base": base,
        "nodrop": dataclasses.replace(
            base, dropout_rate=0.0, positional_dropout_rate=0.0,
            attention_dropout_rate=0.0),
        "nocnn": dataclasses.replace(base, use_cnn_module=False),
        "nomacaron": dataclasses.replace(base, macaron_style=False),
        "abspos": dataclasses.replace(
            base, pos_enc_layer_type="abs_pos",
            selfattention_layer_type="selfattn"),
        "linear_in": dataclasses.replace(base, input_layer="linear"),
    }

    for name, cfg in variants.items():
        enc = ConformerEncoder(cfg, dtype=dtype)
        rngs = {"params": jax.random.PRNGKey(0),
                "dropout": jax.random.key(1, impl="rbg")}
        variables = enc.init(rngs, feats, feat_lens, deterministic=True)
        params = variables["params"]
        extra = {k: v for k, v in variables.items() if k != "params"}
        dkey = jax.random.key(2, impl="rbg")

        def fwd_once(params, feats, key):
            out, olens, new_extra = None, None, None
            y = enc.apply(
                {"params": params, **extra}, feats, feat_lens,
                deterministic=False, rngs={"dropout": key},
                mutable=list(extra.keys()) or False,
            )
            if isinstance(y, tuple) and len(y) == 2 and isinstance(y[1], dict):
                (out, olens), new_extra = y
            else:
                out, olens = y
            return out

        def loss_fn(params, feats, key):
            return jnp.sum(fwd_once(params, feats, key).astype(jnp.float32) ** 2)

        def rep_fwd(params, feats, key):
            def body(_, carry):
                feats, key, acc = carry
                out = fwd_once(params, feats, key)
                dep = jnp.sum(out[0, 0].astype(jnp.float32)) * 1e-30
                key = jax.random.fold_in(key, 1)
                return (feats + dep.astype(feats.dtype), key, acc + dep)

            return jax.lax.fori_loop(
                0, iters, body, (feats, key, jnp.float32(0.0)))[2]

        def rep_bwd(params, feats, key):
            g = jax.grad(loss_fn)

            def body(_, carry):
                feats, key, acc = carry
                gr = g(params, feats, key)
                # depend on EVERY grad leaf — slicing one leaf lets XLA
                # dead-code-eliminate most of the backward pass (a first
                # version measured fwd+bwd == fwd because only the final
                # norm's gradient survived)
                dep = sum(
                    jnp.sum(l.astype(jnp.float32) ** 2) * 1e-30
                    for l in jax.tree_util.tree_leaves(gr)
                )
                key = jax.random.fold_in(key, 1)
                return (feats + dep.astype(feats.dtype), key, acc + dep)

            return jax.lax.fori_loop(
                0, iters, body, (feats, key, jnp.float32(0.0)))[2]

        tf = timeit_looped(jax.jit(rep_fwd), (params, feats, dkey), iters)
        tg = timeit_looped(jax.jit(rep_bwd), (params, feats, dkey), iters)
        print(f"[{name:10s}] fwd={tf * 1e3:7.2f}ms fwd+bwd={tg * 1e3:7.2f}ms",
              flush=True)


if __name__ == "__main__":
    main()
