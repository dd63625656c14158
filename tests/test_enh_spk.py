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


@pytest.mark.parametrize("sep", ["rnn", "conformer", "tcn", "dprnn", "skim", "tfgridnet"])
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


def test_tse_extracts_enrolled_speaker():
    """TSE conditioning: same mixture, different enrollment -> different
    target; overfit to extract the enrolled tone from a 2-tone mixture."""
    from llm_guided_asr_tpu.models.enh import EnhConfig, ESPnetTSEModel

    cfg = EnhConfig(num_spk=1, n_fft=256, hop_length=128, hidden=32, layers=2)
    model = ESPnetTSEModel(cfg)
    n = 4000
    a = jnp.asarray(tone(350, n))[None]
    b = jnp.asarray(tone(1500, n))[None]
    mix = a + b
    lens = jnp.asarray([n])
    # two training examples sharing the mixture, differing by enrollment
    batch = dict(
        mix=jnp.concatenate([mix, mix]),
        lens=jnp.concatenate([lens, lens]),
        enroll=jnp.concatenate([a, b]),
        ref=jnp.concatenate([a, b]),
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["mix"], batch["lens"], batch["enroll"], batch["lens"], batch["ref"],
        deterministic=True,
    )
    tx = optax.adam(1e-3)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, _), g = jax.value_and_grad(
            lambda p: model.apply(
                {"params": p}, batch["mix"], batch["lens"], batch["enroll"],
                batch["lens"], batch["ref"], deterministic=True,
            )[:2],
            has_aux=True,
        )(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(200):
        params, opt, loss = step(params, opt)
    si = -float(loss)
    assert si > 8.0, f"TSE SI-SNR too low: {si}"
    # conditioning check: swapping enrollment changes the extraction target
    est_a = model.apply({"params": params}, mix, lens, a, lens, method=model.extract)
    est_b = model.apply({"params": params}, mix, lens, b, lens, method=model.extract)
    from llm_guided_asr_tpu.models.enh import si_snr

    assert float(si_snr(a, est_a, lens)[0]) > float(si_snr(b, est_a, lens)[0])
    assert float(si_snr(b, est_b, lens)[0]) > float(si_snr(a, est_b, lens)[0])


def test_enh_s2t_joint_model():
    """Joint enh+ASR: forward/grad finite, encode path usable for decoding."""
    from llm_guided_asr_tpu.models.enh import EnhConfig, ESPnetEnhS2TModel
    from llm_guided_asr_tpu.tasks.asr import build_model as build_asr_model

    asr = build_asr_model({
        "token_list": ["<blank>", "<unk>", "a", "b", "<sos/eos>"],
        "token_type": "char",
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 20},
        "normalize": "utterance_mvn",
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 24, "num_blocks": 1,
                         "use_cnn_module": False},
        "decoder_conf": {"attention_heads": 2, "linear_units": 24, "num_blocks": 1},
        "model_conf": {"ctc_weight": 0.5},
    })
    model = ESPnetEnhS2TModel(
        EnhConfig(num_spk=1, n_fft=256, hop_length=128, hidden=16, layers=1),
        asr, enh_weight=0.2,
    )
    rng = np.random.default_rng(0)
    mix = jnp.asarray(0.3 * rng.standard_normal((2, 3000)), jnp.float32)
    lens = jnp.asarray([3000, 2500])
    text = jnp.asarray([[2, 3, 2], [3, 2, -1]], jnp.int32)
    tlens = jnp.asarray([3, 2])
    ref = jnp.asarray(0.3 * rng.standard_normal((2, 3000)), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        mix, lens, text, tlens, ref, deterministic=True,
    )
    loss, stats, w = model.apply(variables, mix, lens, text, tlens, ref,
                                 deterministic=True)
    assert np.isfinite(float(loss))
    assert "loss_enh" in stats and "asr_loss" in stats
    enc, enc_lens = model.apply(variables, mix, lens, method=model.encode)
    assert enc.shape[0] == 2 and np.all(np.isfinite(np.asarray(enc)))
