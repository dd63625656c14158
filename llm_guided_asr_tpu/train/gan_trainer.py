"""Two-optimizer GAN training loop (espnet2/train/gan_trainer.py rebuild).

Alternating discriminator/generator updates, each its own optax chain and
jitted step; used by the gan_tts vocoder path.  The model contract differs
from AbsESPnetModel: the caller supplies

  g_loss_fn(g_params, d_params, batch, rng) -> (loss, stats)
  d_loss_fn(d_params, g_params, batch, rng) -> (loss, stats)

(in the reference, ESPnetGANTTSModel.forward(forward_generator=...) plays
this role).
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import optax

logger = logging.getLogger(__name__)


def make_gan_steps(
    g_loss_fn: Callable,
    d_loss_fn: Callable,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
):
    @jax.jit
    def d_step(g_params, d_params, d_opt, batch, rng):
        (loss, stats), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            d_params, g_params, batch, rng
        )
        updates, d_opt = d_tx.update(grads, d_opt, d_params)
        return optax.apply_updates(d_params, updates), d_opt, loss, stats

    @jax.jit
    def g_step(g_params, d_params, g_opt, batch, rng):
        (loss, stats), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            g_params, d_params, batch, rng
        )
        updates, g_opt = g_tx.update(grads, g_opt, g_params)
        return optax.apply_updates(g_params, updates), g_opt, loss, stats

    return g_step, d_step


def gan_train(
    g_params: Any,
    d_params: Any,
    g_loss_fn: Callable,
    d_loss_fn: Callable,
    batches: Iterable,
    n_epochs: int = 1,
    g_lr: float = 2e-4,
    d_lr: float = 2e-4,
    seed: int = 0,
    log_interval: int = 50,
) -> Tuple[Any, Any, Dict[str, float]]:
    """Convenience loop for vocoder training (GANTrainer.train_one_epoch)."""
    g_tx = optax.adam(g_lr, b1=0.8, b2=0.99)
    d_tx = optax.adam(d_lr, b1=0.8, b2=0.99)
    g_step, d_step = make_gan_steps(g_loss_fn, d_loss_fn, g_tx, d_tx)
    g_opt = g_tx.init(g_params)
    d_opt = d_tx.init(d_params)
    rng = jax.random.PRNGKey(seed)
    stats = {}
    it = 0
    for epoch in range(n_epochs):
        for batch in batches:
            r = jax.random.fold_in(rng, it)
            d_params, d_opt, d_loss, d_stats = d_step(g_params, d_params, d_opt, batch, r)
            g_params, g_opt, g_loss, g_stats = g_step(g_params, d_params, g_opt, batch, r)
            stats = {
                **{f"d_{k}": float(v) for k, v in d_stats.items()},
                **{f"g_{k}": float(v) for k, v in g_stats.items()},
            }
            if it % log_interval == 0:
                logger.info(f"gan it {it}: {stats}")
            it += 1
    return g_params, d_params, stats
