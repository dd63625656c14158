"""VITS: flow + MAS + adversarial training smoke, and inference synthesis."""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llm_guided_asr_tpu.models.hifigan import HiFiGANDiscriminator
from llm_guided_asr_tpu.models.vits import VITSConfig, VITSGenerator, make_vits_loss_fns
from llm_guided_asr_tpu.ops.frontend import stft


def _cfg():
    return VITSConfig(
        vocab_size=12, spec_channels=129, hidden=32, text_layers=1,
        text_heads=2, text_ffn=64, posterior_layers=2, flow_layers=2,
        segment_frames=8, n_fft=256, hop_length=128, n_mels=20,
    )


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    gen = VITSGenerator(cfg)
    disc = HiFiGANDiscriminator(cfg.hifigan)
    rng = np.random.default_rng(0)
    n = 128 * 40  # 40 frames
    wav = np.sin(np.linspace(0, 300, n)).astype(np.float32) * 0.4
    wav += 0.05 * rng.standard_normal(n).astype(np.float32)
    speech = jnp.asarray(wav)[None]
    spec = jnp.abs(stft(speech, n_fft=cfg.n_fft, hop_length=cfg.hop_length))
    text = jnp.asarray([[2, 3, 4, 5]], jnp.int32)
    batch = {
        "text": text, "text_lengths": jnp.asarray([4]),
        "spec": spec, "spec_lengths": jnp.asarray([spec.shape[1]]),
        "speech": speech,
    }
    g_vars = gen.init(
        {"params": jax.random.PRNGKey(0)},
        batch["text"], batch["text_lengths"], batch["spec"],
        batch["spec_lengths"], jax.random.PRNGKey(1),
    )
    d_vars = disc.init({"params": jax.random.PRNGKey(2)}, speech[:, : 8 * 128])
    return cfg, gen, disc, batch, g_vars["params"], d_vars["params"]


def test_vits_flow_invertible(setup):
    cfg, gen, disc, batch, g_params, _ = setup
    s_valid = jnp.ones((1, 10), bool)
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 10, cfg.hidden))

    z_p = gen.apply({"params": g_params}, z, s_valid, method=gen._flow)
    z_back = gen.apply(
        {"params": g_params}, z_p, s_valid, reverse=True, method=gen._flow
    )
    np.testing.assert_allclose(np.asarray(z_back), np.asarray(z), atol=1e-4)


def test_vits_gan_steps_and_losses(setup):
    from llm_guided_asr_tpu.train.gan_trainer import make_gan_steps

    cfg, gen, disc, batch, g_params, d_params = setup
    g_loss_fn, d_loss_fn = make_vits_loss_fns(gen, disc, cfg)
    g_tx = optax.adam(2e-4)
    d_tx = optax.adam(2e-4)
    g_step, d_step = make_gan_steps(g_loss_fn, d_loss_fn, g_tx, d_tx)
    g_opt, d_opt = g_tx.init(g_params), d_tx.init(d_params)
    rng = jax.random.PRNGKey(0)
    first_stats = None
    for i in range(5):
        r = jax.random.fold_in(rng, i)
        d_params, d_opt, d_loss, _ = d_step(g_params, d_params, d_opt, batch, r)
        g_params, g_opt, g_loss, stats = g_step(g_params, d_params, g_opt, batch, r)
        if first_stats is None:
            first_stats = {k: float(v) for k, v in stats.items()}
        assert np.isfinite(float(g_loss)) and np.isfinite(float(d_loss))
    assert {"adv", "fm", "mel", "kl", "dur"} <= set(first_stats)


def test_vits_inference_synthesizes(setup):
    cfg, gen, disc, batch, g_params, _ = setup
    wav, frame_lengths = gen.apply(
        {"params": g_params}, batch["text"], batch["text_lengths"],
        max_frames=64, rng=jax.random.PRNGKey(7), method=gen.inference,
    )
    assert wav.shape == (1, 64 * cfg.hop_length)
    assert int(frame_lengths[0]) >= 4  # at least one frame per token
    assert np.all(np.isfinite(np.asarray(wav)))
