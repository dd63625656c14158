"""Parameter sharding rules: tensor-parallel LLM over the 'model' mesh axis.

The reference has no TP (SURVEY.md §2.10) — its frozen LLM fits one GPU.  For
>8B guidance LLMs on TPU the plan is megatron-style column/row sharding over
the ('data', 'model') mesh; XLA inserts the all-reduces from these specs:

- attention q/k/v kernels [D, H*hd]  -> P(None, 'model')   (column parallel)
- attention o_proj        [H*hd, D]  -> P('model', None)   (row parallel)
- mlp gate/up             [D, F]     -> P(None, 'model')
- mlp down                [F, D]     -> P('model', None)
- embed_tokens.embedding  [V, D]     -> P('model', None)   (vocab parallel)
- lm_head                 [D, V]     -> P(None, 'model')
- norms / biases          replicated

Everything outside the LLM (encoder, guided decoder) is small and replicated;
the batch is sharded along 'data'.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _llama_leaf_spec(path: str) -> P:
    if path.endswith("embed_tokens/embedding"):
        return P("model", None)
    if path.endswith("lm_head/kernel"):
        return P(None, "model")
    for proj in ("q_proj", "k_proj", "v_proj"):
        if f"self_attn/{proj}/kernel" in path:
            return P(None, "model")
        if f"self_attn/{proj}/bias" in path:
            return P("model")
    if "self_attn/o_proj/kernel" in path:
        return P("model", None)
    if "mlp/gate_proj/kernel" in path or "mlp/up_proj/kernel" in path:
        return P(None, "model")
    if "mlp/down_proj/kernel" in path:
        return P("model", None)
    return P()  # norms etc. replicated


def _path_str(kp) -> str:
    parts = []
    for k in kp:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return "/".join(parts)


def param_shardings(params: Dict, mesh: Mesh, llm_prefix: str = "llm") -> Dict:
    """NamedSharding pytree for a model's params; LLM subtree gets TP specs."""

    def leaf(kp, x):
        p = _path_str(kp)
        if p == llm_prefix or p.startswith(llm_prefix + "/"):
            spec = _llama_leaf_spec(p)
            # guard: axis size must divide the sharded dim
            sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
            ok = True
            for dim, axis in enumerate(spec):
                if axis is None:
                    continue
                if x.ndim <= dim or x.shape[dim] % sizes.get(axis, 1) != 0:
                    ok = False
            return NamedSharding(mesh, spec if ok else P())
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf, params)


def shard_params(params: Dict, mesh: Mesh, llm_prefix: str = "llm") -> Dict:
    return jax.device_put(params, param_shardings(params, mesh, llm_prefix))
