"""Chunked-flat optimizer application parity (train/optim.py ChunkPlan).

The flagship conformer's ~615 parameter leaves make the per-leaf optax
update chain launch-bound (measured 14.2 ms vs 4.9 ms for the same 34M
params in a few flat buffers on v5e).  The flat path must be numerically
identical to the per-leaf path: same update chain, same non-finite skip
gate (reference GradScaler skip, trainer.py:748).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from llm_guided_asr_tpu.train.optim import ChunkPlan, build_optimizer


def _params(key, n_leaves=13):
    ks = jax.random.split(key, n_leaves)
    tree = {}
    for i, k in enumerate(ks):
        shape = [(7, 5), (128,), (3, 4, 5), ()][i % 4]
        tree[f"layer_{i}"] = {"w": jax.random.normal(k, shape, jnp.float32)}
    return tree


def test_chunk_plan_round_trip():
    params = _params(jax.random.PRNGKey(0))
    plan = ChunkPlan(params, n_chunks=4)
    chunks = plan.flatten(params)
    assert sum(int(c.size) for c in chunks) == sum(
        int(np.prod(l.shape)) if l.shape else 1
        for l in jax.tree_util.tree_leaves(params)
    )
    back = plan.unflatten(chunks)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("optim,conf", [
    ("adamw", {"lr": 1e-2, "weight_decay": 0.01}),
    ("adam", {"lr": 1e-2}),
])
def test_flat_matches_per_leaf(optim, conf):
    """N update steps through the flat path == per-leaf path bit-for-bit
    (same f32 math; the only difference is buffer layout)."""
    from llm_guided_asr_tpu.train.trainer import init_train_state, make_train_step

    params = _params(jax.random.PRNGKey(1))
    tx = build_optimizer(optim, conf, grad_clip=1.0)
    plan = ChunkPlan(params, n_chunks=3)

    # drive apply_step directly with synthetic grads (no model needed)
    class _M:  # minimal stand-in; grad_step unused
        def apply(self, *a, **k):
            raise AssertionError

    _, apply_leaf, _ = make_train_step(_M(), tx)
    _, apply_flat, _ = make_train_step(_M(), tx, flat_plan=plan)

    opt_leaf = tx.init(params)
    opt_flat = tx.init(plan.flatten(params))
    p_leaf, p_flat = params, params
    key = jax.random.PRNGKey(2)
    for step in range(4):
        key, sk = jax.random.split(key)
        grads = jax.tree_util.tree_map(
            lambda p: jax.random.normal(sk, p.shape, jnp.float32), p_leaf
        )
        p_leaf, opt_leaf = apply_leaf(p_leaf, opt_leaf, grads)
        p_flat, opt_flat = apply_flat(p_flat, opt_flat, grads)
    for a, b in zip(jax.tree_util.tree_leaves(p_leaf),
                    jax.tree_util.tree_leaves(p_flat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_flat_nonfinite_skip():
    """A NaN in any leaf's grad skips the whole flat update (params and
    moments unchanged), matching the per-leaf gate."""
    from llm_guided_asr_tpu.train.trainer import make_train_step

    params = _params(jax.random.PRNGKey(3), n_leaves=5)
    tx = optax.adamw(1e-2)
    plan = ChunkPlan(params, n_chunks=2)
    _, apply_flat, _ = make_train_step(object(), tx, flat_plan=plan)
    opt = tx.init(plan.flatten(params))

    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    grads["layer_2"]["w"] = grads["layer_2"]["w"].at[0, 0, 0].set(jnp.nan)
    p2, opt2 = apply_flat(params, opt, grads)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # moments also held (count may tick in either design; check mu buffers)
    mu_old = [l for l in jax.tree_util.tree_leaves(opt) if hasattr(l, "shape") and l.ndim]
    mu_new = [l for l in jax.tree_util.tree_leaves(opt2) if hasattr(l, "shape") and l.ndim]
    for a, b in zip(mu_old, mu_new):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_run_flat_optim(tmp_path):
    """Trainer.run(flat_optim=True) trains, checkpoints, and resumes on the
    flat opt state (plan is rebuilt deterministically from the params tree)."""
    import flax.linen as nn

    from llm_guided_asr_tpu.train.trainer import Trainer, TrainerOptions

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, x, x_lens, y, y_lens, deterministic=True):
            w = self.param("w", nn.initializers.ones, (3,))
            b = self.param("b", nn.initializers.zeros, (2,))
            loss = jnp.sum(w**2) + jnp.sum((b - 1.0) ** 2)
            return loss, {"loss": loss}, jnp.asarray(1.0)

    model = Toy()
    dummy = (jnp.zeros((1, 2)), jnp.asarray([2]),
             jnp.zeros((1, 1), jnp.int32), jnp.asarray([1]))
    variables = {"params": model.init(jax.random.PRNGKey(0), *dummy)["params"]}
    batch = {"speech": dummy[0], "speech_lengths": dummy[1],
             "text": dummy[2], "text_lengths": dummy[3]}
    tx = build_optimizer("adamw", {"lr": 0.1})
    opts = TrainerOptions(max_epoch=2, flat_optim=True, log_interval=1)
    state = Trainer.run(model, variables, tx, lambda e: [batch],
                        lambda e: [batch], tmp_path, opts)
    w = np.asarray(state["params"]["w"])
    assert np.all(np.abs(w) < 1.0)  # moved toward 0
    # flat opt state: chunk lists, not a params-shaped {'w','b'} tree
    paths = {
        str(kp)
        for kp, _ in jax.tree_util.tree_flatten_with_path(state["opt_state"])[0]
    }
    assert not any("'w'" in p or "'b'" in p for p in paths), paths
    # resume continues from the checkpointed flat opt state
    opts2 = TrainerOptions(max_epoch=3, flat_optim=True, resume=True,
                           log_interval=1)
    state2 = Trainer.run(model, variables, tx, lambda e: [batch],
                         lambda e: [batch], tmp_path, opts2)
    assert np.all(np.abs(np.asarray(state2["params"]["w"])) < np.abs(w))


def test_fused_flat_matches_split():
    """make_fused_train_step(flat_plan=...) == split grad_step+apply_step
    (same math; the fused jit only removes the grads round-trip)."""
    import jax.numpy as jnp

    from llm_guided_asr_tpu.models.asr_model import ASRModel, ASRModelConfig
    from llm_guided_asr_tpu.models.conformer import ConformerConfig
    from llm_guided_asr_tpu.models.transformer_decoder import (
        TransformerDecoderConfig,
    )
    from llm_guided_asr_tpu.ops.frontend import FrontendConfig
    from llm_guided_asr_tpu.train.trainer import (
        init_train_state,
        make_fused_train_step,
        make_train_step,
    )

    cfg = ASRModelConfig(
        vocab_size=8,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=20),
        normalize="utterance_mvn",
        encoder=ConformerConfig(output_size=16, attention_heads=2,
                                linear_units=24, num_blocks=1,
                                use_cnn_module=True, cnn_module_kernel=7),
        decoder=TransformerDecoderConfig(attention_heads=2, linear_units=24,
                                         num_blocks=1),
        ctc_weight=0.3,
    )
    model = ASRModel(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "speech": jnp.asarray(rng.standard_normal((2, 2048)), jnp.float32),
        "speech_lengths": jnp.asarray([2048, 1500]),
        "text": jnp.asarray([[1, 2, 3, -1], [4, 5, -1, -1]], jnp.int32),
        "text_lengths": jnp.asarray([3, 2]),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["speech"], batch["speech_lengths"], batch["text"],
        batch["text_lengths"], deterministic=True,
    )
    tx = optax.adamw(1e-2)
    plan = ChunkPlan(variables["params"], n_chunks=4)
    rngk = jax.random.PRNGKey(7)

    s1 = init_train_state(variables, tx, flat_plan=plan)
    grad_step, apply_step, _ = make_train_step(model, tx, flat_plan=plan)
    p_a, o_a, e_a = s1["params"], s1["opt_state"], s1["extra"]
    for _ in range(3):
        g, e_a, st_a, w_a = grad_step(p_a, e_a, batch, rngk)
        p_a, o_a = apply_step(p_a, o_a, g)

    s2 = init_train_state(variables, tx, flat_plan=plan)
    fused = make_fused_train_step(model, tx, flat_plan=plan)
    p_b, o_b, e_b = s2["params"], s2["opt_state"], s2["extra"]
    for _ in range(3):
        p_b, o_b, e_b, st_b, w_b = fused(p_b, o_b, e_b, batch, rngk)

    for a, b in zip(jax.tree_util.tree_leaves(p_a),
                    jax.tree_util.tree_leaves(p_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(e_a),
                    jax.tree_util.tree_leaves(e_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
