"""Optimizer + LR-scheduler registry (optax).

Rebuild of the reference registries at espnet2/tasks/abs_task.py:98-175 and
the schedulers in espnet2/schedulers/ (warmuplr.py, noamlr.py).  Schedules
are optax-style step->lr callables so the whole update is one jitted optax
transform chain; ``freeze_param`` surgery (abs_task.py:1352) is an
optax.masked wrapper over parameter-path prefixes.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax


# ---------------------------------------------------------------------------
# LR schedules (espnet2/schedulers/*)
# ---------------------------------------------------------------------------

def warmup_lr(lr: float, warmup_steps: int = 25000, **_unused) -> optax.Schedule:
    """espnet2/schedulers/warmuplr.py: lr * w^0.5 * min(s^-0.5, s * w^-1.5)."""

    def schedule(step):
        s = jnp.maximum(step.astype(jnp.float32) + 1.0, 1.0)
        w = float(warmup_steps)
        return lr * (w**0.5) * jnp.minimum(s**-0.5, s * (w**-1.5))

    return schedule


def noam_lr(lr: float, model_size: int = 320, warmup_steps: int = 25000, **_unused) -> optax.Schedule:
    """espnet2/schedulers/noamlr.py (equivalent to warmuplr scaled by d^-0.5)."""

    def schedule(step):
        s = jnp.maximum(step.astype(jnp.float32) + 1.0, 1.0)
        w = float(warmup_steps)
        return lr * (model_size**-0.5) * jnp.minimum(s**-0.5, s * (w**-1.5))

    return schedule


def constant_lr(lr: float, **_unused) -> optax.Schedule:
    return lambda step: jnp.asarray(lr, jnp.float32)


def exponential_decay_lr(lr: float, decay_rate: float = 0.96, decay_steps: int = 10000, **_unused) -> optax.Schedule:
    return optax.exponential_decay(lr, decay_steps, decay_rate)


SCHEDULER_REGISTRY: Dict[str, Callable[..., optax.Schedule]] = {
    "warmuplr": warmup_lr,
    "noamlr": noam_lr,
    "none": constant_lr,
    "constant": constant_lr,
    "exponentiallr": exponential_decay_lr,
}

# epoch-level validation-driven schedulers (ReduceLROnPlateau analog,
# registered in the reference at abs_task.py:158-175): handled as an LR
# *scale* hyperparameter living in the optimizer state (see build_optimizer)
# updated by the Trainer after each validation epoch via PlateauController.
PLATEAU_SCHEDULERS = ("reducelronplateau", "plateau")


class PlateauController:
    """Host-side ReduceLROnPlateau logic (torch.optim.lr_scheduler semantics:
    mode=min, relative threshold).  The LR scale it emits is written into the
    optimizer state's ``plateau_scale`` hyperparameter — the jitted update
    reads it as a traced leaf, so no recompilation on change."""

    def __init__(self, factor: float = 0.1, patience: int = 3,
                 threshold: float = 1e-4, min_scale: float = 1e-8,
                 mode: str = "min"):
        self.factor = float(factor)
        self.patience = int(patience)
        self.threshold = float(threshold)
        self.min_scale = float(min_scale)
        self.mode = mode
        self.scale = 1.0
        self.best: Optional[float] = None
        self.num_bad = 0

    def _improved(self, value: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return value < self.best * (1.0 - self.threshold)
        return value > self.best * (1.0 + self.threshold)

    def step(self, value: float) -> float:
        if self._improved(value):
            self.best = value
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.scale = max(self.scale * self.factor, self.min_scale)
                self.num_bad = 0
        return self.scale

    def replay(self, values) -> float:
        """Rebuild controller state from a metric history (resume path: the
        reporter is persisted, the controller is not)."""
        for v in values:
            self.step(v)
        return self.scale


def set_plateau_scale(opt_state, scale: float):
    """Write the plateau LR scale into an inject_hyperparams opt state."""
    hp = getattr(opt_state, "hyperparams", None)
    if not isinstance(hp, dict) or "plateau_scale" not in hp:
        raise ValueError("optimizer was not built with a plateau scheduler")
    new_hp = dict(hp)
    new_hp["plateau_scale"] = jnp.asarray(scale, jnp.float32)
    return opt_state._replace(hyperparams=new_hp)


def build_schedule(
    name: Optional[str], lr: float, conf: Optional[dict] = None
) -> optax.Schedule:
    name = (name or "none").lower()
    conf = dict(conf or {})
    conf.pop("lr", None)
    return SCHEDULER_REGISTRY[name](lr, **conf)


# ---------------------------------------------------------------------------
# Optimizers (abs_task.py optim_classes)
# ---------------------------------------------------------------------------

def _adam(schedule, weight_decay=0.0, betas=(0.9, 0.999), eps=1e-8, **kw):
    if weight_decay:
        return optax.adamw(schedule, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)
    return optax.adam(schedule, b1=betas[0], b2=betas[1], eps=eps)


def _adamw(schedule, weight_decay=0.01, betas=(0.9, 0.999), eps=1e-8, **kw):
    return optax.adamw(schedule, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)


def _sgd(schedule, momentum=0.0, weight_decay=0.0, nesterov=False, **kw):
    tx = optax.sgd(schedule, momentum=momentum or None, nesterov=nesterov)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


def _adadelta(schedule, rho=0.95, eps=1e-6, weight_decay=0.0, **kw):
    tx = optax.adadelta(schedule, rho=rho, eps=eps)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


def _adagrad(schedule, eps=1e-10, **kw):
    return optax.adagrad(schedule, eps=eps)


def _rmsprop(schedule, alpha=0.99, eps=1e-8, momentum=0.0, **kw):
    return optax.rmsprop(schedule, decay=alpha, eps=eps, momentum=momentum or None)


def _radam(schedule, betas=(0.9, 0.999), eps=1e-8, **kw):
    return optax.radam(schedule, b1=betas[0], b2=betas[1], eps=eps)


def _lamb(schedule, weight_decay=0.0, betas=(0.9, 0.999), eps=1e-6, **kw):
    return optax.lamb(schedule, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)


def _adafactor(schedule, **kw):
    return optax.adafactor(schedule)


def _lion(schedule, weight_decay=0.0, betas=(0.9, 0.99), **kw):
    return optax.lion(schedule, b1=betas[0], b2=betas[1], weight_decay=weight_decay)


OPTIMIZER_REGISTRY: Dict[str, Callable[..., optax.GradientTransformation]] = {
    "adam": _adam,
    "adamw": _adamw,
    "sgd": _sgd,
    "adadelta": _adadelta,
    "adagrad": _adagrad,
    "rmsprop": _rmsprop,
    "radam": _radam,
    "lamb": _lamb,
    "adafactor": _adafactor,
    "lion": _lion,
}


def path_prefix_mask(params: Any, prefixes: Sequence[str]) -> Any:
    """Pytree mask: True where the '/'-joined param path starts with any prefix.

    Used to implement freeze_param (trainable = NOT matching).
    """
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        parts = []
        for k in kp:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        return "/".join(parts)

    def match(kp):
        p = path_str(kp)
        return any(p == pref or p.startswith(pref + "/") for pref in prefixes)

    return jax.tree_util.tree_map_with_path(lambda kp, _: match(kp), params)


def build_optimizer(
    name: str = "adam",
    conf: Optional[dict] = None,
    scheduler: Optional[str] = None,
    scheduler_conf: Optional[dict] = None,
    grad_clip: Optional[float] = 5.0,
    freeze_mask: Optional[Any] = None,
    grad_noise: bool = False,
) -> optax.GradientTransformation:
    """Build the full update chain: [zero-frozen] -> clip -> optimizer(schedule).

    ``freeze_mask`` is a params-shaped pytree of bools, True = FROZEN
    (freeze_param semantics, abs_task.py:1352-1356): frozen grads are zeroed
    *before* the global-norm clip so they neither move nor distort the norm.
    grad_clip default 5.0 matches the reference trainer
    (trainer.py clip_grad_norm_, TrainerOptions.grad_clip).
    """
    import jax

    conf = dict(conf or {})
    lr = float(conf.pop("lr", 1e-3))
    plateau = (scheduler or "").lower() in PLATEAU_SCHEDULERS
    # plateau: constant base schedule, validation drives the scale instead
    schedule = build_schedule(None if plateau else scheduler, lr,
                              None if plateau else scheduler_conf)

    def _build(plateau_scale=None):
        tx = OPTIMIZER_REGISTRY[name.lower()](schedule, **conf)
        parts = []
        if freeze_mask is not None:
            # zero frozen grads before the norm clip, and mask the optimizer so
            # it allocates NO moment state for frozen subtrees (matters for the
            # frozen multi-B-param LLM)
            parts.append(optax.masked(optax.set_to_zero(), freeze_mask))
        if grad_clip is not None and grad_clip > 0:
            parts.append(optax.clip_by_global_norm(grad_clip))
        if grad_noise:
            # annealed gaussian gradient noise (torch_utils/add_gradient_noise.py:
            # eta/(1+step)^0.55 with eta ~ duration-scaled; optax equivalent)
            parts.append(optax.add_noise(eta=0.01, gamma=0.55, key=0))
        if freeze_mask is not None:
            trainable = jax.tree_util.tree_map(lambda m: not m, freeze_mask)
            parts.append(optax.masked(tx, trainable))
        else:
            parts.append(tx)
        if plateau_scale is not None:
            parts.append(optax.scale(plateau_scale))
        return optax.chain(*parts)

    if plateau:
        return optax.inject_hyperparams(_build)(plateau_scale=1.0)
    return _build()


# ---------------------------------------------------------------------------
# chunked-flat optimizer application
# ---------------------------------------------------------------------------
# The flagship conformer has ~615 parameter leaves; per-leaf optimizer update
# chains measured 14.2 ms/step on v5e vs 4.9 ms for the same 34M params in a
# few flat buffers (launch/op overhead, not bandwidth).  The plan concatenates
# raveled leaves into n_chunks ~equal flat vectors; the whole update chain
# (clip -> adamw -> schedule) and the non-finite skip gate then run on K
# leaves instead of 615 (the reference's GradScaler skip, trainer.py:748).
# Incompatible with per-leaf optax.masked freeze masks - callers keep the
# per-leaf path when freeze_param is active.

class ChunkPlan:
    """Assignment of param leaves to flat chunks (contiguous, size-balanced)."""

    def __init__(self, params: Any, n_chunks: int = 8):
        leaves, treedef = jax.tree_util.tree_flatten(params)
        self.treedef = treedef
        self.shapes = [l.shape for l in leaves]
        self.dtypes = [l.dtype for l in leaves]
        sizes = [int(np.prod(s)) if s else 1 for s in self.shapes]
        total = sum(sizes)
        target = max(1, total // max(1, n_chunks))
        self.assign: list = []  # chunk id per leaf
        self.offsets: list = []  # start offset of each leaf within its chunk
        chunk, acc = 0, 0
        for sz in sizes:
            if acc >= target and chunk < n_chunks - 1:
                chunk, acc = chunk + 1, 0
            self.assign.append(chunk)
            self.offsets.append(acc)
            acc += sz
        self.n_chunks = chunk + 1
        self.chunk_sizes = [0] * self.n_chunks
        for cid, off, sz in zip(self.assign, self.offsets, sizes):
            self.chunk_sizes[cid] = max(self.chunk_sizes[cid], off + sz)
        self.sizes = sizes

    def flatten(self, tree: Any) -> list:
        """pytree -> list of K flat f32 vectors (one concatenate per chunk)."""
        leaves = jax.tree_util.tree_leaves(tree)
        out = []
        for cid in range(self.n_chunks):
            parts = [
                leaves[i].ravel().astype(jnp.float32)
                for i in range(len(leaves)) if self.assign[i] == cid
            ]
            out.append(jnp.concatenate(parts) if len(parts) > 1 else parts[0])
        return out

    def unflatten(self, chunks: list) -> Any:
        leaves = []
        for i, (shape, dtype) in enumerate(zip(self.shapes, self.dtypes)):
            cid, off = self.assign[i], self.offsets[i]
            sz = self.sizes[i]
            leaves.append(
                jax.lax.dynamic_slice_in_dim(chunks[cid], off, sz)
                .reshape(shape).astype(dtype)
            )
        return jax.tree_util.tree_unflatten(self.treedef, leaves)
