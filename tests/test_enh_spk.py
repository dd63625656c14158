"""Enhancement (separation) and speaker embedding domain packages."""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from llm_guided_asr_tpu.models.enh import (
    EnhConfig,
    ESPnetEnhancementModel,
    pit_si_snr_loss,
    si_snr,
)
from llm_guided_asr_tpu.ops.frontend import istft, stft

SR = 16000


def tone(freq, n, amp=0.4):
    t = np.arange(n) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_istft_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8000)), jnp.float32)
    spec = stft(x, n_fft=512, hop_length=128)
    y = istft(spec, n_fft=512, hop_length=128, length=8000)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-3)


def test_si_snr_properties():
    x = jnp.asarray(tone(440, 4000))[None]
    lens = jnp.asarray([4000])
    # perfect (even scaled) estimate -> very high si-snr
    assert float(si_snr(x, 0.5 * x, lens)[0]) > 50
    noisy = x + 0.1 * jnp.asarray(np.random.default_rng(0).standard_normal(4000), jnp.float32)
    assert float(si_snr(x, noisy, lens)[0]) < 30


def test_pit_picks_best_permutation():
    a = jnp.asarray(tone(300, 2000))[None]
    b = jnp.asarray(tone(1200, 2000))[None]
    lens = jnp.asarray([2000])
    refs = jnp.stack([a, b])
    ests_swapped = jnp.stack([b, a])
    loss, perm = pit_si_snr_loss(refs, ests_swapped, lens)
    assert float(loss) < -50  # matched after permutation
    assert list(np.asarray(perm)[0]) == [1, 0]


@pytest.mark.parametrize("sep", ["rnn", "tcn", "dprnn", "skim", "tfgridnet"])
def test_enh_overfits_two_tone_separation(sep):
    cfg = EnhConfig(num_spk=2, n_fft=256, hop_length=128, separator_type=sep,
                    hidden=32, layers=2)
    model = ESPnetEnhancementModel(cfg)
    rng = np.random.default_rng(0)
    n = 4000
    s1 = jnp.asarray(tone(350, n))[None]
    s2 = jnp.asarray(tone(1500, n))[None]
    mix = s1 + s2
    lens = jnp.asarray([n])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        mix, lens, s1, s2, deterministic=True,
    )
    tx = optax.adam(1e-3)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, _), g = jax.value_and_grad(
            lambda p: model.apply({"params": p}, mix, lens, s1, s2,
                                  deterministic=True)[:2],
            has_aux=True,
        )(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    _, _, loss0 = step(params, opt)
    for _ in range(150):
        params, opt, loss = step(params, opt)
    si = -float(loss)
    assert si > 10.0, f"{sep}: separation SI-SNR too low: {si}"

    ests, _ = model.apply({"params": params}, mix, lens, method=model.separate)
    assert ests.shape == (2, 1, n)


def test_spk_model_learns_speakers():
    from llm_guided_asr_tpu.models.spk import SpeakerModel, SpkConfig, cosine_score
    from llm_guided_asr_tpu.ops.frontend import FrontendConfig

    cfg = SpkConfig(
        n_speakers=3,
        frontend=FrontendConfig(n_fft=256, hop_length=128, n_mels=23),
        hidden=32, layers=2, embed_dim=16,
    )
    model = SpeakerModel(cfg)
    rng = np.random.default_rng(0)
    # "speakers" = distinct fundamental frequencies
    freqs = [220, 550, 1400]
    speech = jnp.asarray(
        np.stack([tone(freqs[i % 3], 3200) + 0.01 * rng.standard_normal(3200).astype(np.float32)
                  for i in range(6)])
    )
    lens = jnp.full((6,), 3200, jnp.int32)
    labels = jnp.asarray([0, 1, 2, 0, 1, 2], jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, lens, labels, deterministic=True,
    )
    tx = optax.adam(3e-3)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, (stats, _)), g = jax.value_and_grad(
            lambda p: (lambda o=model.apply({"params": p}, speech, lens, labels,
                                            deterministic=True): (o[0], (o[1], o[2])))(),
            has_aux=True,
        )(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, stats

    for _ in range(80):
        params, opt, stats = step(params, opt)
    assert float(stats["acc"]) == 1.0, f"speaker acc: {stats}"

    # verification: same-speaker pairs score higher than cross-speaker
    emb = model.apply({"params": params}, speech, lens, method=model.extract_embedding)
    same = float(cosine_score(emb[0], emb[3]))
    diff = float(cosine_score(emb[0], emb[1]))
    assert same > diff
