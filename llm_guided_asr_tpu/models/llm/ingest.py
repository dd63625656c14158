"""Streamed, sharded ingestion of HF safetensors LLM checkpoints.

Replaces the full-f32 `AutoModelForCausalLM` host materialization
(models/llm_guided.py load_llm_params, VERDICT r2 item 3): an 8B Llama-3 —
the fork's real configuration (egs2/esun/work/conf/tuning/
train_asr+llama3_conformer.yaml) — is ~32 GB in f32 and cannot be
materialized whole on this host.  Instead:

- the safetensors layout (8-byte header-length + JSON header + raw blob) is
  parsed directly and each tensor is a lazy ``np.memmap`` view — opening a
  checkpoint costs the header only;
- tensors are converted ONE AT A TIME to the flax layout (kernels
  transposed), cast to the target dtype (bfloat16 for real checkpoints), and
  immediately ``jax.device_put`` with their tensor-parallel NamedSharding
  from parallel/sharding.py — peak host memory is a single tensor
  (~0.5 GB for an 8B o_proj in f32 scratch), never the whole checkpoint;
- multi-file checkpoints resolve through ``model.safetensors.index.json``
  (the HF sharded format, reference analog: llama.py:47-54 loads the same
  files via transformers).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Iterator, Optional, Tuple

import numpy as np

_ST_DTYPES = None


def _st_dtypes():
    global _ST_DTYPES
    if _ST_DTYPES is None:
        import ml_dtypes

        _ST_DTYPES = {
            "F64": np.float64, "F32": np.float32, "F16": np.float16,
            "BF16": ml_dtypes.bfloat16, "I64": np.int64, "I32": np.int32,
            "I16": np.int16, "I8": np.int8, "U8": np.uint8, "BOOL": np.bool_,
        }
    return _ST_DTYPES


def read_safetensors_header(path: Path) -> Tuple[Dict[str, Any], int]:
    """Parse the JSON header; returns (header, data_start_offset)."""
    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(n))
    header.pop("__metadata__", None)
    return header, 8 + n


def open_tensor(path: Path, info: Dict[str, Any], data_start: int) -> np.ndarray:
    """Zero-copy memmap view of one tensor (no read until sliced)."""
    off0, off1 = info["data_offsets"]
    mm = np.memmap(path, np.uint8, mode="r", offset=data_start + off0,
                   shape=(off1 - off0,))
    return mm.view(_st_dtypes()[info["dtype"]]).reshape(info["shape"])


def checkpoint_files(model_dir: Path) -> Dict[str, Path]:
    """tensor name -> file, resolving model.safetensors.index.json if present."""
    model_dir = Path(model_dir)
    index = model_dir / "model.safetensors.index.json"
    if index.exists():
        weight_map = json.loads(index.read_text())["weight_map"]
        return {name: model_dir / fname for name, fname in weight_map.items()}
    single = model_dir / "model.safetensors"
    if not single.exists():
        raise FileNotFoundError(f"no safetensors checkpoint under {model_dir}")
    header, _ = read_safetensors_header(single)
    return {name: single for name in header}


def iter_checkpoint(model_dir: Path) -> Iterator[Tuple[str, np.ndarray]]:
    """Yield (hf_name, lazy memmap tensor), grouped per shard file."""
    files = checkpoint_files(model_dir)
    by_file: Dict[Path, list] = {}
    for name, f in files.items():
        by_file.setdefault(f, []).append(name)
    for f, names in by_file.items():
        header, data_start = read_safetensors_header(f)
        for name in names:
            yield name, open_tensor(f, header[name], data_start)


def _map_hf_name(name: str, cfg) -> Optional[Tuple[Tuple[str, ...], bool]]:
    """HF tensor name -> (flax tree path, transpose?) | None to skip.

    Mirrors convert_hf_state_dict (llama.py:267) exactly, per tensor.
    """
    if name == "model.embed_tokens.weight":
        return ("embed_tokens", "embedding"), False
    if name == "model.norm.weight":
        return ("norm", "weight"), False
    if name == "lm_head.weight":
        if cfg.tie_word_embeddings:
            return None
        return ("lm_head", "kernel"), True
    if name.startswith("model.layers."):
        rest = name[len("model.layers."):]
        i, _, tail = rest.partition(".")
        layer = f"layers_{i}"
        if tail in ("input_layernorm.weight", "post_attention_layernorm.weight"):
            return (layer, tail.split(".")[0], "weight"), False
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            if tail == f"self_attn.{proj}.weight":
                return (layer, "self_attn", proj, "kernel"), True
            if tail == f"self_attn.{proj}.bias":
                if cfg.attention_bias and proj != "o_proj":
                    return (layer, "self_attn", proj, "bias"), False
                return None
        for proj in ("gate_proj", "up_proj", "down_proj"):
            if tail == f"mlp.{proj}.weight":
                return (layer, "mlp", proj, "kernel"), True
    # rotary inv_freq buffers etc. are derived, not parameters
    return None


def stream_llm_params(
    model_dir,
    cfg,
    dtype=None,
    mesh=None,
    llm_prefix: str = "llm",
) -> Dict:
    """Stream a safetensors checkpoint into a flax param tree.

    dtype: numpy/jax dtype for the stored params (default: bfloat16 —
    real-checkpoint serving/training layout; pass np.float32 for exact
    f32 parity work).
    mesh: when given, each leaf is device_put with its TP NamedSharding
    (parallel/sharding.py specs) as soon as it is converted, so the host
    never holds more than one tensor.
    """
    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.bfloat16
    sharding_for = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from llm_guided_asr_tpu.parallel.sharding import _llama_leaf_spec

        sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

        def sharding_for(path: Tuple[str, ...], shape) -> Any:
            spec = _llama_leaf_spec(f"{llm_prefix}/" + "/".join(path))
            for dim, axis in enumerate(spec):
                if axis is None:
                    continue
                if len(shape) <= dim or shape[dim] % sizes.get(axis, 1) != 0:
                    spec = P()
                    break
            return NamedSharding(mesh, spec)

    # Producer thread reads + transposes + dtype-converts the NEXT tensors
    # (disk + host CPU) while the current device transfer is in flight; the
    # depth-2 queue bounds host residency to ~3 tensors (the ingest's whole
    # point is never holding the full checkpoint on host).  Measured ingest
    # of the 2.5 GB 1B bench checkpoint is disk/convert + tunnel-transfer
    # serial without this.
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=2)

    def _produce():
        try:
            for name, lazy in iter_checkpoint(model_dir):
                mapped = _map_hf_name(name, cfg)
                if mapped is None:
                    continue
                path, transpose = mapped
                arr = np.asarray(lazy)  # materialize THIS tensor only
                if transpose:
                    arr = np.ascontiguousarray(arr.T)
                arr = arr.astype(dtype) if arr.dtype != dtype else arr
                q.put((path, arr))
            q.put(None)
        except BaseException as e:  # surface reader errors to the consumer
            q.put(e)

    threading.Thread(target=_produce, daemon=True).start()

    params: Dict[str, Any] = {}
    n_seen = 0
    while True:
        item = q.get()
        if item is None:
            break
        if isinstance(item, BaseException):
            raise item
        path, arr = item
        if sharding_for is not None:
            leaf = jax.device_put(arr, sharding_for(path, arr.shape))
        else:
            leaf = jnp.asarray(arr)
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf
        del arr
        n_seen += 1
    if n_seen == 0:
        raise ValueError(f"no mappable tensors found in {model_dir}")
    return params


def hf_tensor_shapes(cfg) -> Dict[str, Tuple[int, ...]]:
    """HF safetensors tensor name -> shape for a Llama/Qwen-family config.

    The exact inventory `stream_llm_params` expects (llama.py HF layout):
    used to synthesize benchmark checkpoints at real scale (a Llama-3.2-1B
    -shaped checkpoint for bench.py's guided-path measurement) without hub
    access.
    """
    h = cfg.hidden_size
    kv = cfg.num_key_value_heads * (h // cfg.num_attention_heads)
    shapes: Dict[str, Tuple[int, ...]] = {
        "model.embed_tokens.weight": (cfg.vocab_size, h),
        "model.norm.weight": (h,),
    }
    if not cfg.tie_word_embeddings:
        shapes["lm_head.weight"] = (cfg.vocab_size, h)
    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}."
        shapes[pre + "input_layernorm.weight"] = (h,)
        shapes[pre + "post_attention_layernorm.weight"] = (h,)
        shapes[pre + "self_attn.q_proj.weight"] = (h, h)
        shapes[pre + "self_attn.k_proj.weight"] = (kv, h)
        shapes[pre + "self_attn.v_proj.weight"] = (kv, h)
        shapes[pre + "self_attn.o_proj.weight"] = (h, h)
        if cfg.attention_bias:
            for p in ("q_proj", "k_proj", "v_proj"):
                d = kv if p in ("k_proj", "v_proj") else h
                shapes[pre + f"self_attn.{p}.bias"] = (d,)
        shapes[pre + "mlp.gate_proj.weight"] = (cfg.intermediate_size, h)
        shapes[pre + "mlp.up_proj.weight"] = (cfg.intermediate_size, h)
        shapes[pre + "mlp.down_proj.weight"] = (h, cfg.intermediate_size)
    return shapes


def write_synth_hf_checkpoint(
    out_dir, cfg, seed: int = 0, scale: float = 0.02,
    shard_bytes: int = 1 << 30,
) -> Path:
    """Write a synthetic HF-named bf16 sharded safetensors checkpoint.

    Random N(0, scale) weights (norm scales = 1) in the real multi-file hub
    layout, so bench.py can exercise the streamed ingestion + guided decode
    at the fork's true LLM scale (Llama-3.2-1B, esun
    train_asr+llama3_conformer.yaml:51-53) with zero network.  Idempotent:
    reuses out_dir when a complete index already exists.  One tensor is
    resident at a time (peak host = one embed table).
    """
    import ml_dtypes
    from safetensors.numpy import save_file

    out_dir = Path(out_dir)
    index = out_dir / "model.safetensors.index.json"
    marker = out_dir / ".synth_meta.json"
    meta = {"seed": seed, "scale": scale,
            "cfg": {k: getattr(cfg, k) for k in (
                "vocab_size", "hidden_size", "intermediate_size",
                "num_hidden_layers", "num_attention_heads",
                "num_key_value_heads", "attention_bias",
                "tie_word_embeddings")}}
    if index.exists() and marker.exists():
        try:
            if json.loads(marker.read_text()) == meta:
                return out_dir
        except Exception:
            pass
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    bf16 = ml_dtypes.bfloat16
    weight_map: Dict[str, str] = {}
    group: Dict[str, np.ndarray] = {}
    size = 0
    shards: list = []

    def flush():
        nonlocal group, size
        if group:
            shards.append(group)
            group, size = {}, 0

    for name, shape in hf_tensor_shapes(cfg).items():
        if name.endswith("layernorm.weight") or name == "model.norm.weight":
            arr = np.ones(shape, bf16)
        else:
            arr = (rng.standard_normal(shape, np.float32) * scale).astype(bf16)
        if size and size + arr.nbytes > shard_bytes:
            flush()
        group[name] = arr
        size += arr.nbytes
    flush()
    n = len(shards)
    for i, g in enumerate(shards):
        fname = f"model-{i + 1:05d}-of-{n:05d}.safetensors"
        save_file(g, out_dir / fname)
        for name in g:
            weight_map[name] = fname
    index.write_text(json.dumps({"weight_map": weight_map}))
    marker.write_text(json.dumps(meta))
    return out_dir


def save_sharded_checkpoint(
    out_dir, tree: Dict, shard_bytes: int = 1 << 30
) -> None:
    """Write a param pytree as an HF-style sharded safetensors checkpoint.

    Leaves are packed into model-XXXXX-of-NNNNN.safetensors files of about
    ``shard_bytes`` each plus model.safetensors.index.json — the on-disk
    sharded format for checkpoints too big for one buffer (VERDICT r2 #3).
    Flax leaf paths are joined with '/' as tensor names (no HF renaming —
    this is OUR checkpoint format; HF checkpoints are read, not written).
    """
    import jax

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    leaves = []
    for kp, x in jax.tree_util.tree_leaves_with_path(tree):
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        leaves.append((name, np.asarray(jax.device_get(x))))

    shards: list = [[]]
    size = 0
    for name, arr in leaves:
        nb = arr.nbytes
        if shards[-1] and size + nb > shard_bytes:
            shards.append([])
            size = 0
        shards[-1].append((name, arr))
        size += nb

    from safetensors.numpy import save_file

    weight_map = {}
    n = len(shards)
    for i, group in enumerate(shards):
        fname = f"model-{i + 1:05d}-of-{n:05d}.safetensors"
        save_file(dict(group), out_dir / fname)
        for name, _ in group:
            weight_map[name] = fname
    (out_dir / "model.safetensors.index.json").write_text(
        json.dumps({"weight_map": weight_map}, indent=1)
    )


def load_sharded_checkpoint(in_dir, leaf_fn=None) -> Dict:
    """Stream back a checkpoint written by save_sharded_checkpoint.

    leaf_fn(path_tuple, np_array) -> leaf lets callers device_put each leaf
    with a sharding as it is read (one tensor resident at a time).
    """
    in_dir = Path(in_dir)
    tree: Dict[str, Any] = {}
    for name, lazy in iter_checkpoint(in_dir):
        path = tuple(name.split("/"))
        arr = np.asarray(lazy)
        leaf = leaf_fn(path, arr) if leaf_fn is not None else arr
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf
        del arr, lazy
    return tree
