"""Checkpoint store: save/resume, n-best retention, weight averaging.

Rebuild of the reference checkpoint discipline (trainer.py:408-540 and
main_funcs/average_nbest_models.py:14):
- every epoch: ``checkpoint.msgpack`` (full train state: params, opt state,
  batch stats, reporter) + ``{n}epoch.msgpack`` (params only) + best symlinks
  ``{phase}.{key}.best.msgpack``;
- n-best pruning keeps the union of the best epochs per criterion;
- final artifact ``{phase}.{key}.ave_{n}best.msgpack`` = plain average of the
  n best epochs' params (the decode artifact, e.g. valid.acc.ave_10best).

Frozen-LLM params are excluded by the caller passing ``exclude_prefixes``
(trainer.py:408-417 strips decoder.llm.* from every save).
"""

from __future__ import annotations

import json
import logging
import os
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def _strip_prefixes(tree: Dict, prefixes: Sequence[str], path: str = "") -> Dict:
    """Drop subtrees whose '/'-joined path matches any prefix."""
    out = {}
    for k, v in tree.items():
        p = f"{path}/{k}" if path else str(k)
        if any(p == pre or p.startswith(pre + "/") for pre in prefixes):
            continue
        if isinstance(v, dict):
            sub = _strip_prefixes(v, prefixes, p)
            out[k] = sub
        else:
            out[k] = v
    return out


def save_pytree(path: os.PathLike, tree: Any, exclude_prefixes: Sequence[str] = ()):
    # to_state_dict converts optax namedtuples/tuples to plain dicts so
    # msgpack can serialize any train-state structure
    tree = flax.serialization.to_state_dict(jax.device_get(tree))
    if exclude_prefixes and isinstance(tree, dict):
        tree = _strip_prefixes(tree, exclude_prefixes)
    data = flax.serialization.msgpack_serialize(tree)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(data)
    tmp.replace(path)


def load_pytree(path: os.PathLike) -> Any:
    return flax.serialization.msgpack_restore(Path(path).read_bytes())


def merge_loaded(target: Any, loaded: Dict) -> Any:
    """Non-strict restore: copy leaves present in ``loaded`` into ``target``.

    Mirrors the reference's strict=False resume that skips missing LLM params
    (trainer.py:231-243).  Shapes must match where keys overlap.
    """

    def rec(t, l):
        if isinstance(t, dict):
            return {
                k: rec(v, l[k]) if isinstance(l, dict) and k in l else v
                for k, v in t.items()
            }
        if l is None:
            return t
        if not isinstance(t, (dict, jnp.ndarray, np.ndarray)) and isinstance(l, dict):
            # structured target (e.g. optax state namedtuple) serialized as dict
            return flax.serialization.from_state_dict(t, l)
        arr = jnp.asarray(l)
        if hasattr(t, "shape") and tuple(arr.shape) != tuple(t.shape):
            raise ValueError(f"shape mismatch restoring checkpoint: {arr.shape} vs {t.shape}")
        return arr.astype(t.dtype) if hasattr(t, "dtype") else arr

    return rec(target, loaded)


def load_partial(
    target_params: Dict,
    path: os.PathLike,
    src_prefix: str = "",
    dst_prefix: str = "",
) -> Dict:
    """init_param surgery: 'path:src_prefix:dst_prefix'
    (torch_utils/load_pretrained_model.py).

    Loads ``path``, selects the subtree at ``src_prefix`` ('/'-separated, empty
    = whole tree) and merges it into ``target_params`` at ``dst_prefix``.
    """
    loaded = load_pytree(path)
    if isinstance(loaded, dict) and "params" in loaded and src_prefix.split("/")[0] != "params":
        loaded = loaded["params"]
    for part in filter(None, src_prefix.split("/")):
        loaded = loaded[part]

    dst_parts = list(filter(None, dst_prefix.split("/")))

    def rec(t, parts):
        if not parts:
            return merge_loaded(t, loaded)
        head, rest = parts[0], parts[1:]
        if head not in t:
            raise KeyError(f"init_param dst prefix {dst_prefix!r}: {head!r} not in model")
        return {**t, head: rec(t[head], rest)}

    return rec(target_params, dst_parts)


class CheckpointManager:
    """Exp-dir checkpoint lifecycle (save / best links / n-best prune / average)."""

    def __init__(
        self,
        output_dir: os.PathLike,
        keep_nbest: int = 10,
        best_criteria: Sequence[Tuple[str, str, str]] = (("valid", "loss", "min"),),
        exclude_prefixes: Sequence[str] = (),
    ):
        self.dir = Path(output_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.keep_nbest = keep_nbest
        self.best_criteria = [tuple(c) for c in best_criteria]
        self.exclude_prefixes = tuple(exclude_prefixes)

    def epoch_path(self, epoch: int) -> Path:
        return self.dir / f"{epoch}epoch.msgpack"

    def save_epoch(self, epoch: int, model_variables: Any, full_state: Any, reporter):
        """Save per-epoch params, rolling full checkpoint, and reporter state."""
        save_pytree(self.epoch_path(epoch), model_variables, self.exclude_prefixes)
        save_pytree(self.dir / "checkpoint.msgpack", full_state, self.exclude_prefixes)
        reporter.dump(self.dir / "reporter.json")
        self._update_best_links(reporter)
        self._prune(reporter)

    def _link(self, name: str, epoch: int):
        link = self.dir / name
        target = f"{epoch}epoch.msgpack"
        if link.is_symlink() or link.exists():
            link.unlink()
        link.symlink_to(target)

    def _update_best_links(self, reporter):
        self._link("latest.msgpack", reporter.epoch)
        for phase, key, mode in self.best_criteria:
            best = reporter.get_best_epoch(phase, key, mode)
            if best is not None and self.epoch_path(best).exists():
                self._link(f"{phase}.{key}.best.msgpack", best)

    def _keep_set(self, reporter) -> set:
        keep = {reporter.epoch}
        for phase, key, mode in self.best_criteria:
            keep.update(reporter.sort_epochs(phase, key, mode)[: self.keep_nbest])
        return keep

    def _prune(self, reporter):
        keep = self._keep_set(reporter)
        for p in self.dir.glob("*epoch.msgpack"):
            try:
                ep = int(p.name.replace("epoch.msgpack", ""))
            except ValueError:
                continue
            if ep not in keep:
                p.unlink()
                logger.info(f"pruned checkpoint {p.name}")

    def average_nbest(self, reporter, phase: str, key: str, mode: str, n: Optional[int] = None) -> Path:
        """Average best-n epochs' params -> {phase}.{key}.ave_{n}best.msgpack."""
        n = n or self.keep_nbest
        epochs = [e for e in reporter.sort_epochs(phase, key, mode)[:n] if self.epoch_path(e).exists()]
        if not epochs:
            raise RuntimeError("no epochs to average")
        acc = None
        for e in epochs:
            tree = load_pytree(self.epoch_path(e))
            if acc is None:
                acc = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), tree)
            else:
                acc = jax.tree_util.tree_map(lambda a, x: a + np.asarray(x, np.float64), acc, tree)
        ave = jax.tree_util.tree_map(
            lambda a: (a / len(epochs)).astype(np.float32), acc
        )
        out = self.dir / f"{phase}.{key}.ave_{len(epochs)}best.msgpack"
        save_pytree(out, ave)
        logger.info(f"averaged epochs {epochs} -> {out.name}")
        return out

    def has_checkpoint(self) -> bool:
        return (self.dir / "checkpoint.msgpack").exists()

    def load_checkpoint(self) -> Any:
        return load_pytree(self.dir / "checkpoint.msgpack")
