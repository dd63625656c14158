"""Dissect the flagship train step on the TPU (MFU hunt, VERDICT r2 weak #1).

Ablations, all fenced with a host read (the axon tunnel ACKs block_until_ready
before execution — see NOTES.md round 3 item 4):

  A. full grad+apply step, rel-attention impl=auto (Pallas fused on TPU)
  B. same, impl=dense (the XLA pad/reshape rel-shift path)
  C. encoder-only fwd+bwd, fused vs dense (isolates the attention delta)
  D. grad_step alone vs apply_step alone (optimizer share)

Run on the TPU (default backend): `python tools/prof_train.py [B]`.
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

SR = 16000
SECONDS = 10.0
V5E_BF16_FLOPS = 197e12  # per-chip bf16 peak (394 is the int8 number)


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


def set_rel_impl(impl: str):
    from llm_guided_asr_tpu.models import conformer, transformer

    base = transformer.RelPositionMultiHeadedAttention
    if impl == "auto":
        conformer.RelPositionMultiHeadedAttention = base
    else:
        conformer.RelPositionMultiHeadedAttention = functools.partial(
            base, impl=impl
        )


def build(batch):
    import optax

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import build_flagship

    from llm_guided_asr_tpu.train.optim import ChunkPlan
    from llm_guided_asr_tpu.train.trainer import init_train_state, make_train_step

    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    model = build_flagship(dtype)
    samples = int(SECONDS * SR)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((batch, samples)), jnp.float32) * 0.1
    lengths = jnp.full((batch,), samples, jnp.int32)
    text = jnp.ones((batch, 24), jnp.int32)
    tlens = jnp.full((batch,), 24, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, lengths, text, tlens, deterministic=True,
    )
    tx = optax.adamw(1e-3)
    plan = ChunkPlan(variables["params"])
    state = init_train_state(variables, tx, flat_plan=plan)
    grad_step, apply_step, _ = make_train_step(model, tx, flat_plan=plan)
    tbatch = {"speech": speech, "speech_lengths": lengths,
              "text": text, "text_lengths": tlens}
    rngk = jax.random.key(2, impl="rbg")
    return model, variables, state, grad_step, apply_step, tbatch, rngk


def step_flops(grad_step, params, extra, tbatch, rngk):
    try:
        cost = jax.jit(grad_step).lower(
            params, extra, tbatch, rngk
        ).compile().cost_analysis()
        return (cost or {}).get("flops", 0.0)
    except Exception:
        return 0.0


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    print(f"backend={jax.default_backend()} B={batch}", flush=True)

    for impl in ("auto", "dense"):
        set_rel_impl(impl)
        model, variables, state, grad_step, apply_step, tbatch, rngk = build(batch)
        params, extra, opt = state["params"], state["extra"], state["opt_state"]

        def full(p, o):
            g, e, st, w = grad_step(p, extra, tbatch, rngk)
            return apply_step(p, o, g)

        print(f"[{impl}] compiling...", flush=True)
        t_full = timeit(lambda: full(params, opt), iters=10)
        g, *_ = grad_step(params, extra, tbatch, rngk)
        t_grad = timeit(lambda: grad_step(params, extra, tbatch, rngk), iters=10)
        t_apply = timeit(lambda: apply_step(params, opt, g), iters=10)
        flops = step_flops(grad_step, params, extra, tbatch, rngk)
        mfu = flops / t_full / V5E_BF16_FLOPS if flops else 0.0
        sps = batch * SECONDS / t_full
        print(
            f"[{impl}] full={t_full * 1e3:.2f}ms grad={t_grad * 1e3:.2f}ms "
            f"apply={t_apply * 1e3:.2f}ms sps={sps:.0f} mfu={mfu:.4f}",
            flush=True,
        )

        # encoder-only fwd / fwd+bwd (training mode: dropout on, batch_stats
        # mutable like the train step) — isolates the attention delta
        def enc_loss(p, feats, feat_lens):
            (enc, enc_lens), _ = model.apply(
                {"params": p, **extra}, feats, feat_lens, False,
                rngs={"dropout": rngk}, mutable=["batch_stats"],
                method=model.encode,
            )
            return jnp.sum(enc.astype(jnp.float32) ** 2)

        enc_grad = jax.jit(jax.grad(enc_loss))
        enc_fwd = jax.jit(enc_loss)
        t_encf = timeit(
            lambda: enc_fwd(params, tbatch["speech"], tbatch["speech_lengths"]),
            iters=10,
        )
        t_enc = timeit(
            lambda: enc_grad(params, tbatch["speech"], tbatch["speech_lengths"]),
            iters=10,
        )
        hlo = enc_grad.lower(
            params, tbatch["speech"], tbatch["speech_lengths"]
        ).compile().as_text()
        n_pallas = hlo.count("tpu_custom_call")
        print(
            f"[{impl}] encode fwd={t_encf * 1e3:.2f}ms fwd+bwd={t_enc * 1e3:.2f}ms "
            f"pallas_calls_in_enc_grad={n_pallas}",
            flush=True,
        )

        # full loss fwd only (no bwd): what share of grad time is backward
        def full_loss(p, b):
            out, _ = model.apply(
                {"params": p, **extra}, b["speech"], b["speech_lengths"],
                b["text"], b["text_lengths"], False,
                rngs={"dropout": rngk}, mutable=["batch_stats"],
            )
            return out[0]

        fwd_fn = jax.jit(full_loss)
        t_fwd = timeit(lambda: fwd_fn(params, tbatch), iters=10)
        print(f"[{impl}] full loss fwd={t_fwd * 1e3:.2f}ms", flush=True)


if __name__ == "__main__" and not (
        len(sys.argv) > 1 and sys.argv[1] == "breakdown"):
    main()


def component_breakdown(batch=32):
    """Fwd+bwd time per stage of the flagship train step (MFU hunt):
    frontend (STFT+mel+MVN), encoder given feats, decoder+CTC given enc.
    Run standalone: python tools/prof_train.py breakdown [B]."""
    set_rel_impl("auto")
    model, variables, state, grad_step, apply_step, tbatch, rngk = build(batch)
    params, extra = state["params"], state["extra"]

    feats, feat_lens = model.apply(
        {"params": params, **extra}, tbatch["speech"],
        tbatch["speech_lengths"], method=model.collect_feats,
    )

    def fe_loss(p, speech, lens):
        f, fl = model.apply({"params": p, **extra}, speech, lens,
                            method=model.collect_feats)
        return jnp.sum(f.astype(jnp.float32) ** 2)

    def enc_from_feats_loss(p, f, fl):
        (enc, enc_lens), _ = model.apply(
            {"params": p, **extra}, f, fl, False,
            rngs={"dropout": rngk}, mutable=["batch_stats"],
            method=model.encode_feats
            if hasattr(model, "encode_feats") else model.encode,
        )
        return jnp.sum(enc.astype(jnp.float32) ** 2)

    (enc, enc_lens), _ = model.apply(
        {"params": params, **extra}, tbatch["speech"],
        tbatch["speech_lengths"], False, rngs={"dropout": rngk},
        mutable=["batch_stats"], method=model.encode,
    )

    def dec_loss(p, enc, enc_lens):
        logits = model.apply(
            {"params": p, **extra}, enc, enc_lens, tbatch["text"],
            tbatch["text_lengths"] , False, rngs={"dropout": rngk},
            method=model.decoder_logits,
        )
        return jnp.sum(logits.astype(jnp.float32) ** 2)

    def ctc_loss_only(p, enc):
        logits = model.apply({"params": p}, enc, method=model.ctc_logits)
        return jnp.sum(logits.astype(jnp.float32) ** 2)

    rows = [
        ("frontend fwd+bwd", jax.jit(jax.grad(fe_loss)),
         (params, tbatch["speech"], tbatch["speech_lengths"])),
        ("decoder fwd+bwd", jax.jit(jax.grad(dec_loss)), (params, enc, enc_lens)),
        ("ctc-head fwd+bwd", jax.jit(jax.grad(ctc_loss_only)), (params, enc)),
    ]
    for name, fn, args in rows:
        t = timeit(lambda: fn(*args), iters=10)
        print(f"{name}: {t * 1e3:.2f}ms", flush=True)

    # full grad step for reference
    t_grad = timeit(lambda: grad_step(params, extra, tbatch, rngk), iters=10)
    g, *_ = grad_step(params, extra, tbatch, rngk)
    t_apply = timeit(lambda: apply_step(params, state["opt_state"], g), iters=10)
    print(f"grad_step: {t_grad * 1e3:.2f}ms  apply: {t_apply * 1e3:.2f}ms",
          flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "breakdown":
    component_breakdown(int(sys.argv[2]) if len(sys.argv) > 2 else 32)
    sys.exit(0)
