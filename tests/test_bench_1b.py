"""Smoke-test the real-LLM-scale guided bench machinery (bench.py 5b).

The on-chip run uses Llama-3.2-1B dims; here the identical code path —
synthetic HF multi-file safetensors checkpoint -> streamed ingestion ->
host-side eval_shape init -> cached guided beam-10 decode -> frozen-LLM
train step -> metric emission — runs with a toy LLM on CPU so regressions
surface before the driver's bench run.
"""

import json

import numpy as np
import pytest

import bench
from llm_guided_asr_tpu.models.llm.llama import LlamaConfig


def tiny_llm():
    return LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=True,
    )


def test_synth_checkpoint_roundtrip(tmp_path):
    """write_synth_hf_checkpoint emits the exact tensor inventory
    stream_llm_params maps, and ingestion reproduces shapes + dtype."""
    import jax.numpy as jnp

    from llm_guided_asr_tpu.models.llm.ingest import (
        checkpoint_files,
        hf_tensor_shapes,
        stream_llm_params,
        write_synth_hf_checkpoint,
    )

    cfg = tiny_llm()
    out = write_synth_hf_checkpoint(tmp_path / "ckpt", cfg, shard_bytes=8192)
    files = checkpoint_files(out)
    assert set(files) == set(hf_tensor_shapes(cfg))
    assert len(set(files.values())) > 1  # actually multi-file
    params = stream_llm_params(out, cfg, dtype=jnp.bfloat16)
    assert params["embed_tokens"]["embedding"].shape == (128, 32)
    assert params["embed_tokens"]["embedding"].dtype == jnp.bfloat16
    # norm scales were written as ones
    np.testing.assert_array_equal(
        np.asarray(params["norm"]["weight"], np.float32), 1.0
    )
    # idempotent: second call reuses the checkpoint (marker match)
    before = sorted(p.name for p in out.iterdir())
    write_synth_hf_checkpoint(tmp_path / "ckpt", cfg, shard_bytes=8192)
    assert sorted(p.name for p in out.iterdir()) == before


def test_host_init_variables_matches_init_tree():
    """eval_shape-based host init builds the same tree as model.init with
    sane values (zeros bias, ones norm scales, finite kernels)."""
    import jax
    import jax.numpy as jnp

    from llm_guided_asr_tpu.models.asr_model import ASRModel, ASRModelConfig
    from llm_guided_asr_tpu.models.conformer import ConformerConfig
    from llm_guided_asr_tpu.models.transformer_decoder import (
        TransformerDecoderConfig,
    )
    from llm_guided_asr_tpu.ops.frontend import FrontendConfig

    cfg = ASRModelConfig(
        vocab_size=50, frontend=FrontendConfig(), normalize="utterance_mvn",
        encoder=ConformerConfig(
            output_size=16, attention_heads=2, linear_units=32, num_blocks=1,
            macaron_style=True, use_cnn_module=True, cnn_module_kernel=7,
        ),
        decoder=TransformerDecoderConfig(
            attention_heads=2, linear_units=32, num_blocks=1
        ),
    )
    model = ASRModel(cfg)
    speech = jnp.zeros((1, 8000), jnp.float32)
    lens = jnp.full((1,), 8000, jnp.int32)
    text = jnp.ones((1, 4), jnp.int32)
    tlens = jnp.full((1,), 4, jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    ref = model.init(rngs, speech, lens, text, tlens, deterministic=True)
    host = bench.host_init_variables(
        model, rngs, speech, lens, text, tlens, deterministic=True
    )
    ref_tree = jax.tree_util.tree_structure(ref)
    assert jax.tree_util.tree_structure(host) == ref_tree
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref),
        jax.tree_util.tree_leaves_with_path(host),
    ):
        assert a.shape == b.shape and a.dtype == b.dtype, pa
        assert np.all(np.isfinite(np.asarray(b, np.float32)))
    # a model.apply with the host-built tree runs
    loss, stats, _ = model.apply(
        host, speech, lens, text, tlens, deterministic=True
    )
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_bench_1b_path_end_to_end(tmp_path, monkeypatch, capsys):
    """The full 5b bench section runs on CPU with a toy LLM and emits the
    llm_guided_1b_* metrics (same code the driver measures on the chip)."""
    import jax.numpy as jnp

    monkeypatch.setattr(bench, "FLAGSHIP_SECONDS", 0.5)
    all_metrics = {}
    bench.bench_llm_guided_1b(
        on_tpu=False, dtype=jnp.float32, all_metrics=all_metrics,
        llm=tiny_llm(), ckpt_dir=tmp_path / "ckpt", decode_iters=1,
        train_batch=1,
    )
    assert all_metrics["llm_guided_1b_rtfx"] > 0
    assert all_metrics["llm_guided_1b_train_sps"] > 0
    assert all_metrics["llm_guided_1b_ingest_s"] > 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l]
    emitted = {l["metric"] for l in lines}
    assert {"llm_guided_1b_ingest_s", "llm_guided_1b_rtfx",
            "llm_guided_1b_train_sps"} <= emitted
