"""Streamed safetensors LLM ingestion + sharded checkpoint format
(VERDICT r2 item 3: no full-checkpoint host materialization)."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_guided_asr_tpu.utils.testing import make_tiny_llm_dir


@pytest.fixture(scope="module")
def llm_dir(tmp_path_factory):
    return make_tiny_llm_dir(tmp_path_factory.mktemp("tiny_llm_ing") / "model")


@pytest.fixture(scope="module")
def cfg(llm_dir):
    from transformers import AutoConfig

    from llm_guided_asr_tpu.models.llm.llama import LlamaConfig

    return LlamaConfig.from_hf_config(AutoConfig.from_pretrained(llm_dir))


def _reference_params(llm_dir, cfg):
    import torch
    from transformers import AutoModelForCausalLM

    from llm_guided_asr_tpu.models.llm.llama import convert_hf_state_dict

    hf = AutoModelForCausalLM.from_pretrained(llm_dir, torch_dtype=torch.float32)
    return convert_hf_state_dict(hf.state_dict(), cfg)


def _assert_tree_equal(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(fa) == len(fb)
    for kp, x in fa:
        np.testing.assert_array_equal(
            np.asarray(x, np.float32), np.asarray(fb[kp], np.float32),
            err_msg=str(kp),
        )


def test_stream_matches_torch_conversion(llm_dir, cfg):
    """Per-tensor streaming == the torch-materializing converter, exactly."""
    from llm_guided_asr_tpu.models.llm.ingest import stream_llm_params

    streamed = stream_llm_params(llm_dir, cfg, dtype=np.float32)
    _assert_tree_equal(streamed, _reference_params(llm_dir, cfg))


def test_stream_multifile_index(llm_dir, cfg, tmp_path):
    """HF sharded format: tensors split across files + index.json resolve."""
    from safetensors.numpy import save_file

    from llm_guided_asr_tpu.models.llm.ingest import (
        iter_checkpoint,
        stream_llm_params,
    )

    tensors = {name: np.asarray(arr) for name, arr in iter_checkpoint(llm_dir)}
    names = sorted(tensors)
    half = len(names) // 2
    sharded = tmp_path / "sharded"
    sharded.mkdir()
    save_file({n: tensors[n] for n in names[:half]},
              sharded / "model-00001-of-00002.safetensors")
    save_file({n: tensors[n] for n in names[half:]},
              sharded / "model-00002-of-00002.safetensors")
    (sharded / "model.safetensors.index.json").write_text(json.dumps({
        "weight_map": {
            **{n: "model-00001-of-00002.safetensors" for n in names[:half]},
            **{n: "model-00002-of-00002.safetensors" for n in names[half:]},
        }
    }))
    streamed = stream_llm_params(sharded, cfg, dtype=np.float32)
    _assert_tree_equal(streamed, _reference_params(llm_dir, cfg))


def test_stream_bf16_and_forward(llm_dir, cfg):
    """bf16 streaming (the 8B serving layout) still drives the flax model."""
    from llm_guided_asr_tpu.models.llm.ingest import stream_llm_params
    from llm_guided_asr_tpu.models.llm.llama import LlamaModel

    params = stream_llm_params(llm_dir, cfg, dtype=jnp.bfloat16)
    kern = jax.tree_util.tree_leaves(params)[0]
    assert kern.dtype == jnp.bfloat16
    model = LlamaModel(cfg, dtype=jnp.bfloat16)
    ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    hidden, _ = model.apply({"params": params}, ids, jnp.ones_like(ids, bool))
    assert bool(jnp.all(jnp.isfinite(hidden.astype(jnp.float32))))


def test_stream_with_tp_mesh(llm_dir, cfg):
    """Leaves land with their tensor-parallel shardings at load time."""
    from jax.sharding import Mesh

    from llm_guided_asr_tpu.models.llm.ingest import stream_llm_params

    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "model"))
    params = stream_llm_params(llm_dir, cfg, dtype=np.float32, mesh=mesh)
    q = params["layers_0"]["self_attn"]["q_proj"]["kernel"]
    # column-parallel: second dim split along 'model'
    assert q.sharding.spec == jax.sharding.PartitionSpec(None, "model"), q.sharding
    o = params["layers_0"]["self_attn"]["o_proj"]["kernel"]
    assert o.sharding.spec == jax.sharding.PartitionSpec("model", None), o.sharding
    norm = params["norm"]["weight"]
    assert norm.sharding.spec == jax.sharding.PartitionSpec(), norm.sharding
    _assert_tree_equal(params, _reference_params(llm_dir, cfg))


def test_sharded_checkpoint_roundtrip(llm_dir, cfg, tmp_path):
    """Our sharded on-disk format: shard_bytes caps every file; the
    checkpoint is larger than any single shard buffer; streaming load with a
    per-leaf map_fn reproduces the tree exactly."""
    from llm_guided_asr_tpu.models.llm.ingest import (
        load_sharded_checkpoint,
        save_sharded_checkpoint,
        stream_llm_params,
    )

    params = stream_llm_params(llm_dir, cfg, dtype=np.float32)
    out = tmp_path / "ckpt"
    shard_bytes = 16 * 1024
    save_sharded_checkpoint(out, params, shard_bytes=shard_bytes)
    shards = sorted(out.glob("model-*.safetensors"))
    assert len(shards) > 1, "checkpoint should span multiple shard files"
    total = sum(p.stat().st_size for p in shards)
    assert total > shard_bytes, "total must exceed a single shard buffer"
    # every shard respects the buffer cap (up to one oversized leaf)
    leaf_max = max(
        np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(params)
    )
    for p in shards:
        assert p.stat().st_size <= max(shard_bytes, leaf_max) + 64 * 1024

    seen = []
    loaded = load_sharded_checkpoint(
        out, leaf_fn=lambda path, arr: (seen.append(path), jnp.asarray(arr))[1]
    )
    assert len(seen) == len(jax.tree_util.tree_leaves(params))
    _assert_tree_equal(loaded, params)


def test_load_llm_params_uses_streaming(llm_dir):
    """The task-layer loader routes local safetensors dirs through the
    streaming path (models/llm_guided.py load_llm_params)."""
    from llm_guided_asr_tpu.models.llm_guided import (
        _resolve_checkpoint_dir,
        load_llm_params,
    )

    assert _resolve_checkpoint_dir(str(llm_dir), None) == Path(llm_dir)
    config = {"llm_conf": {"model_name_or_path": str(llm_dir),
                           "template_prompt": 'fix "((HYP))" -> "',
                           "dtype": "float32", "pad_token": "<pad>"}}
    params = load_llm_params(config)
    from llm_guided_asr_tpu.models.llm.llama import LlamaConfig
    from transformers import AutoConfig

    cfg = LlamaConfig.from_hf_config(AutoConfig.from_pretrained(llm_dir))
    _assert_tree_equal(params, _reference_params(llm_dir, cfg))
