"""Forward-backward CTC loss kernel (ops/ctc_fb.py): value + exact-gradient
parity vs optax autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llm_guided_asr_tpu.ops.ctc_fb import ctc_loss_fb


def _opt_loss(logits, ll, labels, lbl):
    T, N = logits.shape[1], labels.shape[1]
    lp_pad = 1.0 - (jnp.arange(T)[None, :] < ll[:, None]).astype(jnp.float32)
    lab_pad = 1.0 - (jnp.arange(N)[None, :] < lbl[:, None]).astype(jnp.float32)
    labs = jnp.where(jnp.arange(N)[None, :] < lbl[:, None], labels, 0)
    return optax.ctc_loss(logits, lp_pad, labs, lab_pad, blank_id=0)


def test_value_and_grad_match_optax():
    rng = np.random.default_rng(0)
    B, T, V, N = 3, 12, 7, 4
    logits = jnp.asarray(rng.standard_normal((B, T, V)), jnp.float32)
    ll = jnp.asarray([12, 9, 5])
    labels = jnp.asarray([[1, 2, 2, 3], [2, 3, 0, 0], [4, 0, 0, 0]], jnp.int32)
    lbl = jnp.asarray([4, 2, 1])
    np.testing.assert_allclose(
        np.asarray(ctc_loss_fb(logits, ll, labels, lbl)),
        np.asarray(_opt_loss(logits, ll, labels, lbl)), rtol=1e-4, atol=1e-4,
    )
    g_ref = jax.grad(lambda lg: jnp.sum(_opt_loss(lg, ll, labels, lbl)))(logits)
    g_fb = jax.grad(lambda lg: jnp.sum(ctc_loss_fb(lg, ll, labels, lbl)))(logits)
    np.testing.assert_allclose(np.asarray(g_fb), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-5)


def test_repeated_labels_and_single_frame():
    """Repeats force blank transitions; the skip-disallowed path must match."""
    rng = np.random.default_rng(1)
    B, T, V = 2, 10, 5
    logits = jnp.asarray(rng.standard_normal((B, T, V)), jnp.float32)
    labels = jnp.asarray([[2, 2, 2, 0], [1, 1, 0, 0]], jnp.int32)
    ll = jnp.asarray([10, 10])
    lbl = jnp.asarray([3, 2])
    np.testing.assert_allclose(
        np.asarray(ctc_loss_fb(logits, ll, labels, lbl)),
        np.asarray(_opt_loss(logits, ll, labels, lbl)), rtol=1e-4, atol=1e-4,
    )
    g_ref = jax.grad(lambda lg: jnp.sum(_opt_loss(lg, ll, labels, lbl)))(logits)
    g_fb = jax.grad(lambda lg: jnp.sum(ctc_loss_fb(lg, ll, labels, lbl)))(logits)
    np.testing.assert_allclose(np.asarray(g_fb), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-5)


def test_impossible_alignment_is_inf_with_zero_grad():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.standard_normal((1, 3, 5)), jnp.float32)
    labels = jnp.asarray([[1, 2, 3, 4]], jnp.int32)  # needs >= 4 frames
    loss = ctc_loss_fb(logits, jnp.asarray([3]), labels, jnp.asarray([4]))
    assert not np.isfinite(float(loss[0]))
    g = jax.grad(lambda lg: jnp.where(
        jnp.isfinite(ctc_loss_fb(lg, jnp.asarray([3]), labels, jnp.asarray([4]))),
        ctc_loss_fb(lg, jnp.asarray([3]), labels, jnp.asarray([4])), 0.0
    ).sum())(logits)
    assert np.allclose(np.asarray(g), 0.0)


def test_grad_sums_to_zero_over_vocab():
    """softmax - posterior: each valid frame's gradient sums to 0 over V."""
    rng = np.random.default_rng(3)
    B, T, V = 2, 8, 6
    logits = jnp.asarray(rng.standard_normal((B, T, V)), jnp.float32)
    labels = jnp.asarray([[1, 2], [3, 0]], jnp.int32)
    ll = jnp.asarray([8, 5])
    lbl = jnp.asarray([2, 1])
    g = jax.grad(lambda lg: jnp.sum(ctc_loss_fb(lg, ll, labels, lbl)))(logits)
    sums = np.asarray(jnp.sum(g, axis=-1))
    np.testing.assert_allclose(sums, 0.0, atol=1e-4)
    # padded frames get zero grad
    assert np.allclose(np.asarray(g)[1, 5:], 0.0)


def test_brctc_delay_risk_prefers_early_emission():
    """With a symmetric two-frame choice for one label, the delay risk must
    push gradient mass toward emitting at the EARLIER frame."""
    logits = jnp.zeros((1, 4, 3), jnp.float32)  # uniform: emission time free
    labels = jnp.asarray([[1]], jnp.int32)
    ll = jnp.asarray([4])
    lbl = jnp.asarray([1])

    def grad_at(time_risk):
        g = jax.grad(lambda lg: jnp.sum(
            ctc_loss_fb(lg, ll, labels, lbl, time_risk=time_risk)
        ))(logits)
        return np.asarray(g)[0, :, 1]  # d loss / d logit of label 1 per frame

    g0 = grad_at(0.0)
    # uniform logits: standard CTC is time-symmetric
    np.testing.assert_allclose(g0[0], g0[3], atol=1e-6)
    g1 = grad_at(4.0)
    # risk: early frames want label-1 logit UP (more negative grad) vs late
    assert g1[0] < g1[3] - 1e-4, (g1,)
    # loss value increases with risk (tilted partition shrinks)
    l0 = float(ctc_loss_fb(logits, ll, labels, lbl)[0])
    l1 = float(ctc_loss_fb(logits, ll, labels, lbl, time_risk=4.0)[0])
    assert l1 > l0


def test_brctc_through_asr_task():
    """ctc_conf.ctc_type=brctc builds and trains one step."""
    from llm_guided_asr_tpu.tasks.asr import build_model, init_model_variables

    config = {
        "token_type": "char",
        "token_list": ["<blank>", "<unk>", "a", "b", "<sos/eos>"],
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 20},
        "normalize": "utterance_mvn",
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 24, "num_blocks": 1,
                         "use_cnn_module": False, "input_layer": "linear"},
        "decoder_conf": {"attention_heads": 2, "linear_units": 24,
                         "num_blocks": 1},
        "model_conf": {"ctc_weight": 0.5},
        "ctc_conf": {"ctc_type": "brctc", "brctc_risk_factor": 0.5},
    }
    model = build_model(config)
    assert model.cfg.ctc_type == "brctc"
    variables = init_model_variables(model, config)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((2, 2048)) * 0.1, jnp.float32)
    slens = jnp.asarray([2048, 1600])
    text = jnp.asarray([[2, 3], [3, -1]], jnp.int32)
    tlens = jnp.asarray([2, 1])
    loss, stats, _ = model.apply(variables, speech, slens, text, tlens,
                                 deterministic=True)
    assert np.isfinite(float(loss))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        build_model({**config, "ctc_conf": {"ctc_type": "gtnctc"}})
