"""EEND-style diarization: PIT-BCE learns a two-tone alternating mixture."""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llm_guided_asr_tpu.models.diar import DiarConfig, DiarizationModel, pit_bce
from llm_guided_asr_tpu.ops.frontend import FrontendConfig, stft_out_lengths


def test_pit_bce_permutation_invariant():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((1, 6, 2)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, (1, 6, 2)), jnp.float32)
    valid = jnp.ones((1, 6), bool)
    l1, _ = pit_bce(logits, labels, valid)
    l2, _ = pit_bce(logits[..., ::-1], labels, valid)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_diar_learns_alternating_speakers():
    cfg = DiarConfig(
        num_spk=2,
        frontend=FrontendConfig(n_fft=256, hop_length=128, n_mels=23),
        adim=32, heads=2, units=48, layers=1,
    )
    model = DiarizationModel(cfg)
    n = 8000
    t = np.arange(n) / 16000
    seg = (np.floor(t * 5.0) % 2).astype(int)  # 200 ms turns
    wav = np.where(seg == 0, np.sin(2 * np.pi * 350 * t), np.sin(2 * np.pi * 1600 * t))
    speech = jnp.asarray(wav.astype(np.float32))[None]
    slens = jnp.asarray([n])
    t_frames = int(stft_out_lengths(slens, 256, 128)[0])
    ft = (np.arange(t_frames) + 0.5) * 128 / 16000
    act = np.zeros((1, t_frames, 2), np.float32)
    act[0, :, 0] = (np.floor(ft * 5.0) % 2 == 0)
    act[0, :, 1] = 1.0 - act[0, :, 0]
    labels = jnp.asarray(act)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, slens, labels, deterministic=True,
    )
    tx = optax.adam(3e-3)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, (stats, _)), g = jax.value_and_grad(
            lambda p: (lambda o=model.apply({"params": p}, speech, slens, labels,
                                            deterministic=True): (o[0], (o[1], o[2])))(),
            has_aux=True,
        )(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, stats

    for _ in range(120):
        params, opt, stats = step(params, opt)
    assert float(stats["der_frame"]) < 0.1, f"frame DER too high: {stats}"


def test_eda_attractor_diar_learns_and_counts_speakers():
    """EEND-EDA (use_attractor): PIT activity via attractors + existence head.

    After overfitting a 2-speaker mixture, frame DER must drop AND
    estimate_activity must infer exactly 2 speakers from the existence
    logits when asked for up to 4 attractors.
    """
    cfg = DiarConfig(
        num_spk=2,
        frontend=FrontendConfig(n_fft=256, hop_length=128, n_mels=23),
        adim=32, heads=2, units=48, layers=1,
        use_attractor=True, attractor_unit=32, attractor_weight=2.0,
    )
    model = DiarizationModel(cfg)
    n = 8000
    t = np.arange(n) / 16000
    seg = (np.floor(t * 5.0) % 2).astype(int)
    wav = np.where(seg == 0, np.sin(2 * np.pi * 350 * t), np.sin(2 * np.pi * 1600 * t))
    speech = jnp.asarray(wav.astype(np.float32))[None]
    slens = jnp.asarray([n])
    t_frames = int(stft_out_lengths(slens, 256, 128)[0])
    ft = (np.arange(t_frames) + 0.5) * 128 / 16000
    act = np.zeros((1, t_frames, 2), np.float32)
    act[0, :, 0] = (np.floor(ft * 5.0) % 2 == 0)
    act[0, :, 1] = 1.0 - act[0, :, 0]
    labels = jnp.asarray(act)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, slens, labels, deterministic=False,
    )
    tx = optax.adam(3e-3)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        (loss, (stats, _)), g = jax.value_and_grad(
            lambda p: (lambda o=model.apply(
                {"params": p}, speech, slens, labels,
                deterministic=False, rngs={"dropout": key}): (o[0], (o[1], o[2])))(),
            has_aux=True,
        )(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, stats

    key = jax.random.PRNGKey(7)
    for i in range(450):
        key, sub = jax.random.split(key)
        params, opt, stats = step(params, opt, sub)
    assert float(stats["der_frame"]) < 0.15, f"EDA frame DER too high: {stats}"
    assert float(stats["loss_att"]) < 0.5, f"existence loss stuck: {stats}"

    probs, k, flens = model.apply(
        {"params": params}, speech, slens, max_spk=4,
        method=model.estimate_activity,
    )
    assert probs.shape[-1] == 4
    assert int(k[0]) == 2, f"estimated speaker count {k} != 2"
    # activity beyond the estimated count is zeroed
    assert float(jnp.max(probs[..., 2:])) == 0.0
