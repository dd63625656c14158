"""HiFiGAN vocoder + two-optimizer GAN trainer."""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np

from llm_guided_asr_tpu.models.hifigan import (
    HiFiGANConfig,
    HiFiGANDiscriminator,
    HiFiGANGenerator,
    feature_matching_loss,
    lsgan_d_loss,
    lsgan_g_loss,
    mel_l1_loss,
)
from llm_guided_asr_tpu.ops.frontend import default_frontend
from llm_guided_asr_tpu.train.gan_trainer import gan_train


def tiny_cfg():
    return HiFiGANConfig(
        n_mels=20, channels=32, upsample_rates=(4, 4, 8), upsample_kernels=(8, 8, 16),
        resblock_kernels=(3,), resblock_dilations=(1, 3), periods=(2,), scales=1,
        disc_channels=8,
    )


def test_generator_shape_is_hop_upsampled():
    cfg = tiny_cfg()  # prod(rates) = 128 = hop
    gen = HiFiGANGenerator(cfg)
    mel = jnp.zeros((2, 10, cfg.n_mels))
    v = gen.init(jax.random.PRNGKey(0), mel)
    wav = gen.apply(v, mel)
    assert wav.shape == (2, 10 * 128)
    assert np.all(np.abs(np.asarray(wav)) <= 1.0)


def test_gan_training_reduces_mel_error():
    cfg = tiny_cfg()
    gen = HiFiGANGenerator(cfg)
    disc = HiFiGANDiscriminator(cfg)

    # target: a 500 Hz tone; input mel computed from it
    n = 10 * 128 * 2
    t = np.arange(n) / 16000
    wav = jnp.asarray((0.5 * np.sin(2 * np.pi * 500 * t)).astype(np.float32))[None]
    mel, _ = default_frontend(wav, jnp.asarray([n]), n_fft=256, hop_length=128, n_mels=20)
    mel = mel[:, : n // 128]

    g_v = gen.init(jax.random.PRNGKey(0), mel)
    d_v = disc.init(jax.random.PRNGKey(1), wav)

    def g_loss(g_params, d_params, batch, rng):
        fake = gen.apply({"params": g_params}, batch["mel"])
        f_scores, f_fmaps = disc.apply({"params": d_params}, fake)
        _, r_fmaps = disc.apply({"params": d_params}, batch["wav"])
        mel_l = mel_l1_loss(batch["wav"], fake, n_fft=256, hop_length=128, n_mels=20)
        adv = lsgan_g_loss(f_scores)
        fm = feature_matching_loss(r_fmaps, f_fmaps)
        loss = 45.0 * mel_l + adv + 2.0 * fm
        return loss, {"mel_l1": mel_l, "adv": adv}

    def d_loss(d_params, g_params, batch, rng):
        fake = jax.lax.stop_gradient(gen.apply({"params": g_params}, batch["mel"]))
        f_scores, _ = disc.apply({"params": d_params}, fake)
        r_scores, _ = disc.apply({"params": d_params}, batch["wav"])
        loss = lsgan_d_loss(r_scores, f_scores)
        return loss, {"d": loss}

    batch = {"mel": mel, "wav": wav}
    # initial mel error
    fake0 = gen.apply({"params": g_v["params"]}, mel)
    mel0 = float(mel_l1_loss(wav, fake0, n_fft=256, hop_length=128, n_mels=20))

    g_params, d_params, stats = gan_train(
        g_v["params"], d_v["params"], g_loss, d_loss,
        [batch] * 60, n_epochs=1, g_lr=5e-4, d_lr=5e-4, log_interval=1000,
    )
    fake1 = gen.apply({"params": g_params}, mel)
    mel1 = float(mel_l1_loss(wav, fake1, n_fft=256, hop_length=128, n_mels=20))
    assert mel1 < mel0 * 0.8, f"mel L1 {mel0} -> {mel1}"
    assert np.isfinite(stats["d_d"]) and np.isfinite(stats["g_adv"])
