#!/usr/bin/env python3
"""Benchmark at the reference's real operating points (VERDICT r1 item 4).

Prints one JSON line per metric as it completes; the LAST line is the
headline: batched beam-10 joint CTC/attention decode RTFx at the fork's
decode_bs10_ctc0.3 operating point (egs2/esun/work/conf/tuning/
decode_bs10_ctc0.3.yaml), with an "all" field carrying every metric.

Metrics:
- greedy_ctc_rtfx:     batched encoder + greedy CTC (easiest path, upper bound)
- train_step_audio_sps: audio-seconds/s through one fwd+bwd+adam step of the
                        flagship model (plus mfu when XLA cost analysis works)
- beam1_p50_latency_ms: single-utterance beam-1 decode p50 latency (driver
                        latency target)
- llm_guided_rtfx:     LLM-guided cached decode with a realistic prompt
                        (guarded by a watchdog; skipped on timeout)
- beam10_rtfx:         HEADLINE, batched beam-10 ctc_weight 0.3

vs_baseline: the reference publishes no RTFx numbers (BASELINE.md), so the
denominator is MEASURED from the reference's own decode compute path on this
box (tools/bench_reference.py -> reference_rtfx.json: torch CPU — the
reference targets GPUs, none available here; the JSON records that).  Where a
matching reference metric exists, vs_baseline = ours / reference.
"""

import json
import os
import signal
import time
from pathlib import Path

import numpy as np

FLAGSHIP_SECONDS = 10.0
SR = 16000
V5E_BF16_FLOPS = 197e12  # per-chip peak, TPU v5e

# Global wall-clock budget (VERDICT r4 weak #2: the r4 run was killed by the
# driver's timeout during the 1B section, rc=124, losing the round's most
# important numbers).  Sections check remaining() before starting and emit
# "skipped: budget" instead of dying; the 1B section runs right after the
# headline so a kill can never lose it again.
BENCH_BUDGET_S = float(os.environ.get("LLMASR_BENCH_BUDGET_S", "2100"))
_T_START = time.monotonic()


def remaining() -> float:
    return BENCH_BUDGET_S - (time.monotonic() - _T_START)

_REF_FILE = Path(__file__).resolve().parent / "reference_rtfx.json"
try:
    REFERENCE_RTFX = json.loads(_REF_FILE.read_text())
except Exception:
    REFERENCE_RTFX = {}


def _vs_ref(ours, key):
    ref = REFERENCE_RTFX.get(key)
    return round(float(ours) / ref, 2) if ref else None


def _emit(metric, value, unit, vs_baseline=None, **extra):
    line = {"metric": metric, "value": round(float(value), 3), "unit": unit,
            "vs_baseline": vs_baseline}
    line.update(extra)
    print(json.dumps(line), flush=True)
    return line


class BudgetSkip(Exception):
    """Section never started: the global wall-clock budget is exhausted."""


class Watchdog:
    """SIGALRM guard so one slow tunnel compile can't starve the headline."""

    def __init__(self, seconds):
        self.seconds = seconds

    def __enter__(self):
        signal.signal(signal.SIGALRM, self._raise)
        signal.alarm(self.seconds)

    def __exit__(self, *a):
        signal.alarm(0)

    @staticmethod
    def _raise(signum, frame):
        raise TimeoutError("bench section timed out")


_FENCE_FN = None


def _fence(x):
    """Force real execution before reading the clock.

    Through the axon tunnel, ``jax.block_until_ready`` ACKs before the device
    has executed (measured: an 8k bf16 matmul "finished" at 26,220 TFLOP/s on
    a 197 TFLOP/s chip; with a host read of a dependent scalar it measured a
    plausible 124 TFLOP/s).  Every timed window must therefore end with a
    device_get of a value that depends on the final output.
    """
    global _FENCE_FN
    import jax
    import jax.numpy as jnp

    if _FENCE_FN is None:
        _FENCE_FN = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(_FENCE_FN(leaf))


def build_flagship(dtype):
    from llm_guided_asr_tpu.models.asr_model import ASRModel, ASRModelConfig
    from llm_guided_asr_tpu.models.conformer import ConformerConfig
    from llm_guided_asr_tpu.models.transformer_decoder import TransformerDecoderConfig
    from llm_guided_asr_tpu.ops.frontend import FrontendConfig

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
    return ASRModel(cfg, dtype=dtype)


def main():
    import jax

    # Persistent compilation cache: verified working through the axon tunnel
    # (30-matmul jit: 1.94 s cold -> 0.33 s warm across processes).  Repeat
    # bench runs — including the driver's — skip every compile this session
    # already paid for.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/llmasr_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

    import jax.numpy as jnp

    from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch
    from llm_guided_asr_tpu.search.greedy import ctc_greedy_decode

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = build_flagship(dtype)

    # B=32 measured the same ~17 ms step latency as B=16 on v5e (the step is
    # latency-bound), so the larger batch doubles throughput for free
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
    all_metrics = {}

    # ---- 1. greedy CTC ----------------------------------------------------
    @jax.jit
    def greedy(speech, lengths):
        enc, enc_lens = model.apply(variables, speech, lengths, method=model.encode)
        logp = model.apply(variables, enc, method=model.ctc_log_softmax)
        return ctc_greedy_decode(logp, enc_lens)

    out = greedy(speech, lengths)
    _fence(out)
    iters = 20 if on_tpu else 2
    best = None
    for rep in range(4 if on_tpu else 1):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = greedy(speech, lengths)
        _fence(out)
        dt = time.perf_counter() - t0
        if on_tpu and rep == 0:
            continue  # first window absorbs any residual device queue
        best = dt if best is None else min(best, dt)
    greedy_rtfx = batch * FLAGSHIP_SECONDS * iters / best
    all_metrics["greedy_ctc_rtfx"] = round(greedy_rtfx, 1)
    _emit("greedy_ctc_rtfx", greedy_rtfx, "x_realtime_per_chip",
          vs_baseline=_vs_ref(greedy_rtfx, "greedy_rtfx"))

    # ---- 2. HEADLINE EARLY: batched beam-10 ctc0.3 ---------------------
    # measured before the slow-compiling optional sections so a driver
    # timeout can never lose it; re-emitted last with the full summary
    bs10 = BatchBeamSearch(
        model, variables, vocab_size=5000, sos=4999, eos=4999,
        beam_size=10, ctc_weight=0.3,
    )
    enc, enc_lens = jax.jit(
        lambda s, l: model.apply(variables, s, l, method=model.encode)
    )(speech, lengths)
    _fence(enc)
    nb = bs10.batch_decode(enc, enc_lens, maxlenratio=-24.0)  # compile
    iters = 5 if on_tpu else 1
    dt = None
    for _ in range(3 if on_tpu else 1):  # best-of (tunnel congestion)
        t0 = time.perf_counter()
        for _ in range(iters):
            nb = bs10.batch_decode(enc, enc_lens, maxlenratio=-24.0)
        w = time.perf_counter() - t0
        dt = w if dt is None else min(dt, w)
    beam_rtfx = batch * FLAGSHIP_SECONDS * iters / dt
    all_metrics["beam10_rtfx"] = round(beam_rtfx, 1)
    _emit("beam10_ctc0.3_rtfx", beam_rtfx, "x_realtime_per_chip",
          vs_baseline=_vs_ref(beam_rtfx, "beam10_rtfx"))

    # From here on the headline exists; make sure a driver SIGTERM (timeout)
    # still flushes the full summary as the last line before dying.
    def emit_summary():
        _emit(
            "beam10_ctc0.3_rtfx", all_metrics["beam10_rtfx"],
            "x_realtime_per_chip",
            vs_baseline=_vs_ref(all_metrics["beam10_rtfx"], "beam10_rtfx"),
            all=all_metrics,
        )

    _summary_done = []

    def _on_term(signum, frame):
        if not _summary_done:
            _summary_done.append(1)
            emit_summary()
        os._exit(0)

    signal.signal(signal.SIGTERM, _on_term)
    import atexit

    atexit.register(lambda: (_summary_done or (_summary_done.append(1),
                                               emit_summary())))

    # ---- 3. LLM-guided at the fork's REAL LLM scale (Llama-3.2-1B) -----
    # Runs IMMEDIATELY after the headline (VERDICT r4 missing #1): these are
    # the fork's numbers at its shipping scale and must never again be lost
    # to a driver timeout.  The shipping configs guide with
    # Llama-3.2-1B-Instruct (egs2/esun/work/conf/tuning/
    # train_asr+llama3_conformer.yaml:51-53).  Synthetic bf16 weights are
    # written once (idempotent, reused across runs) as a real HF multi-file
    # safetensors checkpoint and ingested through the streamed path
    # (models/llm/ingest.py), so this also exercises ingestion at scale.
    try:
        if not on_tpu:
            _emit("llm_guided_1b_rtfx", -1, "x_realtime_per_chip",
                  note="skipped: no TPU (1B decode impractical on host)")
        elif remaining() < 180:
            _emit("llm_guided_1b_rtfx", -1, "x_realtime_per_chip",
                  note="skipped: budget")
        else:
            with Watchdog(int(min(2700, remaining()))):
                bench_llm_guided_1b(on_tpu, dtype, all_metrics)
    except TimeoutError:
        _emit("llm_guided_1b_rtfx", -1, "x_realtime_per_chip", note="timeout")
    except Exception as e:
        _emit("llm_guided_1b_rtfx", -1, "x_realtime_per_chip",
              note=f"error: {e}")

    # ---- 4. train step ------------------------------------------------
    try:
        if remaining() < 120:
            raise BudgetSkip
        with Watchdog(int(min(1500 if on_tpu else 600, max(remaining(), 1)))):
            import optax

            from llm_guided_asr_tpu.train.trainer import (
                init_train_state,
                make_fused_train_step,
            )

            from llm_guided_asr_tpu.train.optim import ChunkPlan

            tx = optax.adamw(1e-3)
            # what Trainer.run actually executes at accum_grad 1: ONE fused
            # grad+update jit (separate apply_step paid a ~460 MB f32 grads
            # round-trip through HBM, measured 10-16 ms/step on v5e) over the
            # chunked-flat optimizer (615 leaves -> ~8 flat buffers; per-leaf
            # chain measured 14.2 ms vs 4.9 ms)
            plan = ChunkPlan(variables["params"])
            state = init_train_state(variables, tx, flat_plan=plan)
            fused = make_fused_train_step(model, tx, flat_plan=plan)
            # the train step is HBM-bound, not launch-bound: B=64 measured
            # 7127 sps / mfu 0.2346 vs 6820 / 0.2246 at B=32 on v5e — report
            # the machine's actual training capability
            tbt = 2 * batch if on_tpu else batch
            t_rng = np.random.default_rng(4)
            tbatch = {
                "speech": jnp.asarray(
                    t_rng.standard_normal((tbt, samples)), jnp.float32) * 0.1,
                "speech_lengths": jnp.full((tbt,), samples, jnp.int32),
                "text": jnp.ones((tbt, 24), jnp.int32),
                "text_lengths": jnp.full((tbt,), 24, jnp.int32),
            }
            # rbg dropout keys (Trainer default; threefry mask generation
            # measured ~1/3 of the step on v5e)
            rngk = jax.random.key(2, impl="rbg")
            params, opt = state["params"], state["opt_state"]
            xtr = state["extra"]
            params, opt, xtr, st, w = fused(params, opt, xtr, tbatch, rngk)
            _fence(params)
            iters = 10 if on_tpu else 2
            # the tunnel to the TPU host shows transient congestion (up to 5x
            # wall-clock inflation measured); best-of windows (first
            # discarded) reports the machine's actual capability
            best_dt = None
            for rep in range(4 if on_tpu else 1):
                t0 = time.perf_counter()
                for _ in range(iters):
                    params, opt, xtr, st, w = fused(params, opt, xtr, tbatch, rngk)
                _fence(params)
                dt = time.perf_counter() - t0
                if on_tpu and rep == 0:
                    continue
                best_dt = dt if best_dt is None else min(best_dt, dt)
            dt = best_dt
            sps = tbt * FLAGSHIP_SECONDS * iters / dt
            extra = {}
            try:
                cost = fused.lower(
                    params, opt, xtr, tbatch, rngk
                ).compile().cost_analysis()
                flops = (cost or {}).get("flops", 0.0)
                if flops and on_tpu:
                    extra["mfu"] = round(flops * iters / dt / V5E_BF16_FLOPS, 4)
            except Exception:
                pass
            all_metrics["train_step_audio_sps"] = round(sps, 1)
            all_metrics.update(extra)
            _emit("train_step_audio_sps", sps, "audio_seconds_per_second", **extra)
    except BudgetSkip:
        _emit("train_step_audio_sps", -1, "audio_seconds_per_second",
              note="skipped: budget")
    except TimeoutError:
        _emit("train_step_audio_sps", -1, "audio_seconds_per_second", note="timeout")
    except Exception as e:
        _emit("train_step_audio_sps", -1, "audio_seconds_per_second",
              note=f"error: {e}"[:300])

    # ---- 5. p50 single-utterance beam-1 latency (decode_bs1_ctc0.3) ----
    try:
        if remaining() < 90:
            raise BudgetSkip
        with Watchdog(int(min(1500 if on_tpu else 600, max(remaining(), 1)))):
            bs1 = BatchBeamSearch(
                model, variables, vocab_size=5000, sos=4999, eos=4999,
                beam_size=1, ctc_weight=0.3,
            )
            one, one_len = enc[:1], enc_lens[:1]
            bs1(one, one_len, maxlenratio=-24.0)  # compile
            lats = []
            for _ in range(10 if on_tpu else 2):
                t0 = time.perf_counter()
                bs1(one, one_len, maxlenratio=-24.0)
                lats.append((time.perf_counter() - t0) * 1e3)
            p50 = float(np.percentile(lats, 50))
            all_metrics["beam1_p50_latency_ms"] = round(p50, 2)
            # latency ratio: reference_ms / ours_ms (>1 = we are faster)
            ref_ms = REFERENCE_RTFX.get("beam1_latency_ms")
            _emit("beam1_p50_latency_ms", p50, "ms_per_10s_utterance",
                  vs_baseline=round(ref_ms / p50, 2) if ref_ms else None)
    except BudgetSkip:
        _emit("beam1_p50_latency_ms", -1, "ms", note="skipped: budget")
    except TimeoutError:
        _emit("beam1_p50_latency_ms", -1, "ms", note="timeout")
    except Exception as e:
        _emit("beam1_p50_latency_ms", -1, "ms", note=f"error: {e}"[:300])

    # ---- 6. LLM-guided cached decode (toy LLM; continuity series) ------
    try:
        if remaining() < 120:
            raise BudgetSkip
        with Watchdog(int(min(1800 if on_tpu else 900, max(remaining(), 1)))):
            llm_rtfx, llm_batch_rtfx, llm_train_sps = bench_llm_guided(on_tpu, dtype)
            all_metrics["llm_guided_rtfx"] = round(llm_rtfx, 1)
            _emit("llm_guided_rtfx", llm_rtfx, "x_realtime_per_chip")
            if llm_batch_rtfx:
                all_metrics["llm_guided_batch4_rtfx"] = round(llm_batch_rtfx, 1)
                _emit("llm_guided_batch4_rtfx", llm_batch_rtfx,
                      "x_realtime_per_chip")
            if llm_train_sps:
                # the fork's actual training cost center: frozen-LLM forward
                # inside the train step (SURVEY 3.1 HOT LOOP) with only the
                # guided decoder + projection trainable (phase-2 freeze,
                # egs2/esun train_asr+llama3_conformer.yaml freeze_param)
                all_metrics["llm_guided_train_sps"] = round(llm_train_sps, 1)
                _emit("llm_guided_train_sps", llm_train_sps,
                      "audio_seconds_per_second")
    except BudgetSkip:
        _emit("llm_guided_rtfx", -1, "x_realtime_per_chip",
              note="skipped: budget")
    except TimeoutError:
        _emit("llm_guided_rtfx", -1, "x_realtime_per_chip", note="timeout")
    except Exception as e:  # keep the headline alive
        _emit("llm_guided_rtfx", -1, "x_realtime_per_chip", note=f"error: {e}")

    # ---- 7. headline re-emit with the full summary ---------------------
    # BASELINE.json target: >=10x reference RTFx/chip; the denominator is the
    # measured reference compute path on this box (reference_rtfx.json).
    # (atexit/SIGTERM handlers also flush this if anything above escapes.)
    if not _summary_done:
        _summary_done.append(1)
        emit_summary()


def host_init_variables(model, rngs, *args, **kwargs):
    """Param tree with init-like values WITHOUT running model.init on device.

    jax.eval_shape traces init (no compute, no 1B-param materialization);
    leaves are then filled on host by name: biases/means 0, norm scales /
    running vars 1, everything else N(0, 0.02).  Used where real weights are
    streamed in afterwards (the 1B bench) — compiling a 16-layer 128k-vocab
    init graph through the tunnel would cost minutes for values we discard.
    """
    import jax

    shapes = jax.eval_shape(lambda: model.init(rngs, *args, **kwargs))
    rng = np.random.default_rng(0)

    def fill(path, leaf):
        name = str(getattr(path[-1], "key", path[-1]))
        if name in ("bias", "mean") or name.startswith("pos_bias"):
            return np.zeros(leaf.shape, leaf.dtype)
        if name in ("scale", "weight", "var"):
            return np.ones(leaf.shape, leaf.dtype)
        return (rng.standard_normal(leaf.shape, np.float32) * 0.02).astype(
            leaf.dtype
        )

    return jax.tree_util.tree_map_with_path(fill, shapes)


def llama32_1b_config():
    """meta-llama/Llama-3.2-1B-Instruct dims (HF config.json; the esun
    guidance LLM, train_asr+llama3_conformer.yaml:51-53)."""
    from llm_guided_asr_tpu.models.llm.llama import LlamaConfig

    return LlamaConfig(
        vocab_size=128256, hidden_size=2048, intermediate_size=8192,
        num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
        rms_norm_eps=1e-5, rope_theta=500000.0,
        max_position_embeddings=131072, tie_word_embeddings=True,
        rope_scaling_factor=32.0, rope_low_freq_factor=1.0,
        rope_high_freq_factor=4.0, rope_original_max_position=8192,
    )


def bench_llm_guided_1b(on_tpu, dtype, all_metrics, llm=None, ckpt_dir=None,
                        decode_iters=3, train_batch=None):
    """Guided decode + frozen-LLM train step with the real-scale LLM resident.

    Emits metrics as they land (each is independently watchdog-safe):
      llm_guided_1b_ingest_s   streamed safetensors -> device (bf16)
      llm_guided_1b_rtfx       beam-10 cached guided decode, B=1 x 10 s
      llm_guided_1b_train_sps  frozen-LLM phase-2 train step (decoder+proj
                               trainable, esun freeze_param)
      llm_guided_1b_peak_hbm_gb device peak bytes after the above
    """
    import jax
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
    from llm_guided_asr_tpu.models.transformer_decoder import TransformerDecoderConfig
    from llm_guided_asr_tpu.ops.frontend import FrontendConfig
    from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch
    from llm_guided_asr_tpu.search.scorers import CachedGuidedScorer

    if llm is None:
        llm = llama32_1b_config()
    ckpt_dir = ckpt_dir or "/tmp/llmasr_bench_llama3_1b"
    write_synth_hf_checkpoint(ckpt_dir, llm)
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
    model = LLMGuidedASRModel(cfg, dtype=dtype)
    samples = int(FLAGSHIP_SECONDS * SR)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((1, samples)), jnp.float32) * 0.1
    lengths = jnp.full((1,), samples, jnp.int32)
    text = jnp.ones((1, 16), jnp.int32)
    tlens = jnp.full((1,), 16, jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = host_init_variables(
        model, rngs, speech, lengths, text, tlens, deterministic=True
    )
    t0 = time.perf_counter()
    llm_params = stream_llm_params(ckpt_dir, llm, dtype=jnp.bfloat16)
    _fence(llm_params["embed_tokens"]["embedding"])
    ingest_s = time.perf_counter() - t0
    variables = jax.device_put(variables)
    variables["params"] = {**variables["params"], "llm": llm_params}
    all_metrics["llm_guided_1b_ingest_s"] = round(ingest_s, 2)
    _emit("llm_guided_1b_ingest_s", ingest_s, "seconds",
          note=f"{llm.num_hidden_layers}L x h{llm.hidden_size} bf16 streamed")

    enc, enc_lens = jax.jit(
        lambda s, l: model.apply(variables, s, l, method=model.encode)
    )(speech, lengths)
    _fence(enc)
    bs = BatchBeamSearch(
        model, variables, vocab_size=llm.vocab_size, sos=70, eos=70,
        beam_size=10, ctc_weight=0.3,
        att_scorer=CachedGuidedScorer(model, variables),
    )
    bs(enc, enc_lens, maxlenratio=-24.0)  # compile
    best = None
    for _ in range(3 if on_tpu else 1):
        t0 = time.perf_counter()
        for _ in range(decode_iters):
            bs(enc, enc_lens, maxlenratio=-24.0)
        w = time.perf_counter() - t0
        best = w if best is None else min(best, w)
    rtfx = FLAGSHIP_SECONDS * decode_iters / best
    all_metrics["llm_guided_1b_rtfx"] = round(rtfx, 1)
    _emit("llm_guided_1b_rtfx", rtfx, "x_realtime_per_chip")

    _peak_candidates = {}  # label -> (bytes, note); axon fallback, see emit_peak

    def emit_peak():
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            peak = stats.get("peak_bytes_in_use")
        except Exception:
            peak = None
        if peak:
            peak_gb = peak / (1 << 30)
            all_metrics["llm_guided_1b_peak_hbm_gb"] = round(peak_gb, 2)
            _emit("llm_guided_1b_peak_hbm_gb", peak_gb, "GiB")
        elif _peak_candidates:
            # memory_stats() returns None through the axon runtime; fall back
            # to XLA's own memory analysis of the largest compiled executable
            # (arguments + temps + outputs — what the compiler reserves).
            label, (nbytes, note) = max(
                _peak_candidates.items(), key=lambda kv: kv[1][0]
            )
            peak_gb = nbytes / (1 << 30)
            all_metrics["llm_guided_1b_peak_hbm_gb"] = round(peak_gb, 2)
            _emit("llm_guided_1b_peak_hbm_gb", peak_gb, "GiB",
                  note=f"xla memory_analysis({label}): {note}; "
                       "runtime peak stats unavailable on this runtime")

    def _record_exec_mem(label, lowered_compiled):
        try:
            ma = lowered_compiled.memory_analysis()
            args_b = int(getattr(ma, "argument_size_in_bytes", 0))
            temp_b = int(getattr(ma, "temp_size_in_bytes", 0))
            out_b = int(getattr(ma, "output_size_in_bytes", 0))
            tot = args_b + temp_b + out_b
            if tot:
                _peak_candidates[label] = (
                    tot,
                    f"args {args_b / (1 << 30):.2f} + temps "
                    f"{temp_b / (1 << 30):.2f} + outs {out_b / (1 << 30):.2f} GiB",
                )
        except Exception:
            pass

    # (emit_peak runs ONCE, after the train sub-section below — which is
    # exception-guarded, so the call is reached even if training fails; a
    # second earlier emission produced two JSON lines for the same metric on
    # runtimes with working memory_stats)

    # frozen-LLM train step (phase-2: encoder/ctc/llm frozen, esun yaml
    # freeze_param; the LLM forward still runs inside the step).  ONE fused
    # jit (make_fused_train_step): separate grad/apply steps materialize the
    # frozen LLM's zero grads as real 2.5 GB buffers at the jit boundary —
    # the r5 run-2 OOM; fused, XLA folds them away entirely.
    try:
        from llm_guided_asr_tpu.train.optim import build_optimizer, path_prefix_mask
        from llm_guided_asr_tpu.train.trainer import (
            init_train_state,
            make_fused_train_step,
        )

        tb = train_batch or (2 if on_tpu else 1)
        t_speech = jnp.asarray(
            np.random.default_rng(1).standard_normal((tb, samples)), jnp.float32
        ) * 0.1
        t_lens = jnp.full((tb,), samples, jnp.int32)
        t_text = jnp.ones((tb, 16), jnp.int32)
        t_tlens = jnp.full((tb,), 16, jnp.int32)
        fmask = path_prefix_mask(variables["params"], ["encoder", "ctc_head", "llm"])
        tx = build_optimizer("adamw", {"lr": 1e-3}, freeze_mask=fmask)
        state = init_train_state(variables, tx)
        fused = make_fused_train_step(model, tx)
        tbatch = {"speech": t_speech, "speech_lengths": t_lens,
                  "text": t_text, "text_lengths": t_tlens}
        rngk = jax.random.key(3, impl="rbg")
        params, opt, extra = state["params"], state["opt_state"], state["extra"]
        params, opt, extra, st, w = fused(params, opt, extra, tbatch, rngk)
        _fence(params)
        t_iters = 5 if on_tpu else 1
        best = None
        for rep in range(3 if on_tpu else 1):
            t0 = time.perf_counter()
            for _ in range(t_iters):
                params, opt, extra, st, w = fused(params, opt, extra, tbatch, rngk)
            _fence(params)
            wdt = time.perf_counter() - t0
            if on_tpu and rep == 0:
                continue
            best = wdt if best is None else min(best, wdt)
        train_sps = tb * FLAGSHIP_SECONDS * t_iters / best
        all_metrics["llm_guided_1b_train_sps"] = round(train_sps, 1)
        _emit("llm_guided_1b_train_sps", train_sps, "audio_seconds_per_second")
        # warm persistent cache makes this re-lower+compile cheap
        _record_exec_mem(
            "1b_fused_train_step",
            fused.lower(params, opt, extra, tbatch, rngk).compile(),
        )
    except Exception as e:
        _emit("llm_guided_1b_train_sps", -1, "audio_seconds_per_second",
              note=f"error: {e}"[:300])

    emit_peak()


def bench_llm_guided(on_tpu, dtype):
    """LLM-guided cached decode RTFx with a realistic prompt length."""
    import jax
    import jax.numpy as jnp

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

    # TinyLlama-class guidance LM (realistic layer count, narrow width so the
    # tunnel compile stays tractable); prompt ~64 ids like the esun template
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
    model = LLMGuidedASRModel(cfg, dtype=dtype)
    samples = int(FLAGSHIP_SECONDS * SR)
    b_batch = 4 if on_tpu else 2
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((b_batch, samples)), jnp.float32) * 0.1
    lengths = jnp.full((b_batch,), samples, jnp.int32)
    text = jnp.ones((b_batch, 16), jnp.int32)
    tlens = jnp.full((b_batch,), 16, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, lengths, text, tlens, deterministic=True,
    )
    enc, enc_lens = jax.jit(
        lambda s, l: model.apply(variables, s, l, method=model.encode)
    )(speech, lengths)
    _fence(enc)
    bs = BatchBeamSearch(
        model, variables, vocab_size=5000, sos=70, eos=70,
        beam_size=10, ctc_weight=0.3,
        att_scorer=CachedGuidedScorer(model, variables),
    )
    bs(enc[:1], enc_lens[:1], maxlenratio=-24.0)  # compile
    iters = 5 if on_tpu else 1

    def best_of(fn, repeats=3):
        best = None
        for _ in range(repeats if on_tpu else 1):
            t0 = time.perf_counter()
            for _ in range(iters):
                fn()
            w = time.perf_counter() - t0
            best = w if best is None else min(best, w)
        return best

    dt = best_of(lambda: bs(enc[:1], enc_lens[:1], maxlenratio=-24.0))
    single_rtfx = FLAGSHIP_SECONDS * iters / dt
    # batched guided decode (vmapped search; per-utterance prefix caches)
    try:
        bs.batch_decode(enc, enc_lens, maxlenratio=-24.0)  # compile
        dt = best_of(lambda: bs.batch_decode(enc, enc_lens, maxlenratio=-24.0))
        batch_rtfx = b_batch * FLAGSHIP_SECONDS * iters / dt
    except Exception:
        batch_rtfx = None

    # guided TRAIN step: frozen encoder/ctc/llm (phase-2 freeze_param,
    # egs2/esun train_asr+llama3_conformer.yaml:65-69), only the 6-block
    # guided decoder + embed projection update.  The frozen-LLM fwd runs
    # inside the step (llm_guided_asr_model.py:136-218 cost center).
    try:
        from llm_guided_asr_tpu.train.optim import build_optimizer, path_prefix_mask
        from llm_guided_asr_tpu.train.trainer import (
            init_train_state,
            make_fused_train_step,
        )

        tb = 8 if on_tpu else 2
        t_speech = jnp.asarray(
            np.random.default_rng(1).standard_normal((tb, samples)), jnp.float32
        ) * 0.1
        t_lens = jnp.full((tb,), samples, jnp.int32)
        t_text = jnp.ones((tb, 16), jnp.int32)
        t_tlens = jnp.full((tb,), 16, jnp.int32)
        fmask = path_prefix_mask(
            variables["params"], ["encoder", "ctc_head", "llm"]
        )
        tx = build_optimizer("adamw", {"lr": 1e-3}, freeze_mask=fmask)
        state = init_train_state(variables, tx)
        fused = make_fused_train_step(model, tx)
        tbatch = {"speech": t_speech, "speech_lengths": t_lens,
                  "text": t_text, "text_lengths": t_tlens}
        rngk = jax.random.key(3, impl="rbg")
        params, opt, xtr = state["params"], state["opt_state"], state["extra"]
        params, opt, xtr, st, w = fused(params, opt, xtr, tbatch, rngk)
        _fence(params)
        t_iters = 10 if on_tpu else 1
        best = None
        for rep in range(4 if on_tpu else 1):
            t0 = time.perf_counter()
            for _ in range(t_iters):
                params, opt, xtr, st, w = fused(params, opt, xtr, tbatch, rngk)
            _fence(params)
            wdt = time.perf_counter() - t0
            if on_tpu and rep == 0:
                continue
            best = wdt if best is None else min(best, wdt)
        train_sps = tb * FLAGSHIP_SECONDS * t_iters / best
    except Exception as e:
        # keep the decode metrics alive but leave a trace — this failure was
        # once silent and the metric just vanished from a run
        _emit("llm_guided_train_sps", -1, "audio_seconds_per_second",
              note=f"error: {e}"[:300])
        train_sps = None
    return single_rtfx, batch_rtfx, train_sps


if __name__ == "__main__":
    main()
