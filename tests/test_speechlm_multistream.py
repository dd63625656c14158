"""Multi-stream codec LMs (speechlm core_lm rebuild) + translatotron s2st."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from llm_guided_asr_tpu.models.speechlm_multistream import (
    CORE_LMS,
    DelayPatternLM,
    MultiScaleLM,
    MultiStreamLMConfig,
    MultiStreamLMModel,
    ValleLM,
    multi_stream_ce_loss,
    scale_grad,
)

CFG = MultiStreamLMConfig(
    vocab_size=24, nq=3, att_unit=32, head=2, unit=64, g_layer=1, l_layer=1
)


def _data(key=0, b=2, t=7, nq=3, v=24):
    rng = np.random.default_rng(key)
    seq = jnp.asarray(rng.integers(0, v, (b, t, nq)), jnp.int32)
    lengths = jnp.asarray([t, t - 2])
    return seq, lengths


def test_scale_grad_identity_forward_scaled_backward():
    x = jnp.asarray([1.5, -2.0])
    np.testing.assert_allclose(scale_grad(x, 0.25), x)
    g = jax.grad(lambda x: jnp.sum(scale_grad(x, 0.25) ** 2))(x)
    np.testing.assert_allclose(g, 2 * x * 0.25, rtol=1e-6)


def test_ce_loss_masks_and_per_layer_stats():
    b, t, nq, v = 2, 5, 2, 7
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((b, t, nq, v)), jnp.float32)
    target = jnp.asarray(rng.integers(0, v, (b, t, nq)), jnp.int32)
    lengths = jnp.asarray([5, 3])
    prefix = jnp.asarray([1, 1])
    loss, stats, weight = multi_stream_ce_loss(logits, target, lengths, prefix)
    assert np.isfinite(float(loss))
    assert float(weight) == 8.0  # 5 + 3 valid frames
    assert set(stats) >= {"acc_layer0", "acc_layer1", "acc", "loss"}
    # frames past the length must not change the loss
    logits2 = logits.at[1, 3:].set(99.0)
    loss2, _, _ = multi_stream_ce_loss(logits2, target, lengths, prefix)
    np.testing.assert_allclose(loss, loss2, rtol=1e-6)


@pytest.mark.parametrize("name", sorted(CORE_LMS))
def test_core_lm_forward_and_grads(name):
    seq, lengths = _data()
    lm = CORE_LMS[name](CFG)
    vs = lm.init(
        {"params": jax.random.PRNGKey(0), "level": jax.random.PRNGKey(1)},
        seq, lengths,
    )

    def loss_fn(params):
        out = lm.apply(
            {"params": params}, seq, lengths,
            rngs={"level": jax.random.PRNGKey(2)},
        )
        return out[0]

    loss, grads = jax.value_and_grad(loss_fn)(vs["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # some gradient actually flows
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


@pytest.mark.parametrize("name", sorted(CORE_LMS))
def test_core_lm_overfits_pattern(name):
    """Each architecture memorizes a short fixed multi-stream sequence."""
    rng = np.random.default_rng(3)
    seq = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 9, CFG.nq)), jnp.int32)
    lengths = jnp.asarray([9])
    lm = CORE_LMS[name](CFG)
    vs = lm.init(
        {"params": jax.random.PRNGKey(0), "level": jax.random.PRNGKey(1)},
        seq, lengths,
    )
    tx = optax.adam(3e-3)
    params = vs["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        def f(p):
            return lm.apply({"params": p}, seq, lengths, rngs={"level": key})[0]

        loss, g = jax.value_and_grad(f)(params)
        up, opt2 = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt2, loss

    first = None
    key = jax.random.PRNGKey(7)
    for i in range(150):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, sub)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.5 * first, (name, first, float(loss))


def test_trainer_contract_wrapper_flattened_input():
    model = MultiStreamLMModel(CFG, corelm="multiscale")
    seq, lengths = _data()
    flat = seq.reshape(seq.shape[0], -1)
    flens = lengths * CFG.nq
    vs = model.init(
        {"params": jax.random.PRNGKey(0), "level": jax.random.PRNGKey(1)},
        flat, flens,
    )
    loss, stats, weight = model.apply(vs, flat, flens)
    assert np.isfinite(float(loss)) and "ppl" in stats


def test_speechlm_task_builder_corelm():
    from llm_guided_asr_tpu.tasks.generic import TASK_BUILDERS

    config = {"model_conf": {"corelm": "delay", "nq": 2, "vocab_size": 16,
                             "att_unit": 32, "g_layer": 1, "l_layer": 1}}
    model, names, dummy = TASK_BUILDERS["speechlm"](config)
    assert isinstance(model, MultiStreamLMModel)
    vs = model.init(
        {"params": jax.random.PRNGKey(0), "level": jax.random.PRNGKey(1)}, *dummy
    )
    loss, stats, weight = model.apply(vs, *dummy)
    assert np.isfinite(float(loss))
    with pytest.raises(ValueError, match="unknown corelm"):
        TASK_BUILDERS["speechlm"]({"model_conf": {"corelm": "nope"}})


def test_translatotron_builds_and_trains():
    from llm_guided_asr_tpu.models.s2st import TranslatotronModel
    from llm_guided_asr_tpu.tasks.generic import TASK_BUILDERS

    config = {
        "model_conf": {"s2st_type": "translatotron", "n_mels": 20},
        "encoder": "transformer",
        "encoder_conf": {"output_size": 32, "num_blocks": 1, "attention_heads": 2,
                         "linear_units": 64, "input_layer": "conv2d"},
        "decoder_conf": {"num_blocks": 1, "attention_heads": 2, "linear_units": 64},
        "token_list": ["<blank>", "<unk>", "x", "y", "<sos/eos>"],
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 24},
    }
    model, names, dummy = TASK_BUILDERS["s2st"](config)
    assert isinstance(model, TranslatotronModel)
    assert names[2] == "tgt_speech"
    vs = model.init({"params": jax.random.PRNGKey(0)}, *dummy)
    loss, stats, weight = model.apply(vs, *dummy)
    assert np.isfinite(float(loss))
    assert "loss_syn" in stats and "loss_stop" in stats and "loss_st" in stats

    # one grad step decreases the loss on this fixed batch
    tx = optax.adam(1e-3)
    params = vs["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def f(p):
            return model.apply({"params": p}, *dummy)[0]

        loss, g = jax.value_and_grad(f)(params)
        up, opt2 = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt2, loss

    l0 = None
    for _ in range(8):
        params, opt, loss = step(params, opt)
        if l0 is None:
            l0 = float(loss)
    assert float(loss) < l0


def test_translatotron_synthesize_shapes():
    from llm_guided_asr_tpu.tasks.generic import TASK_BUILDERS

    config = {
        "model_conf": {"s2st_type": "translatotron", "n_mels": 20},
        "encoder": "transformer",
        "encoder_conf": {"output_size": 32, "num_blocks": 1, "attention_heads": 2,
                         "linear_units": 64, "input_layer": "conv2d"},
        "decoder_conf": {"num_blocks": 1, "attention_heads": 2, "linear_units": 64},
        "token_list": ["<blank>", "<unk>", "x", "y", "<sos/eos>"],
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 24},
    }
    model, names, dummy = TASK_BUILDERS["s2st"](config)
    vs = model.init({"params": jax.random.PRNGKey(0)}, *dummy)
    mel = model.synthesize(vs, dummy[0][:1], dummy[1][:1], max_frames=12)
    assert mel.shape[0] == 1 and mel.shape[1] <= 12 and mel.shape[2] == 20
