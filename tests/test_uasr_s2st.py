"""UASR GAN mechanics and discrete-unit S2ST."""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np

from llm_guided_asr_tpu.models.asr_model import ASRModelConfig
from llm_guided_asr_tpu.models.conformer import ConformerConfig
from llm_guided_asr_tpu.models.s2st import S2STConfig, S2STModel
from llm_guided_asr_tpu.models.transformer_decoder import TransformerDecoderConfig
from llm_guided_asr_tpu.models.uasr import (
    UASRConfig,
    UASRDiscriminator,
    UASRGenerator,
    uasr_d_loss,
    uasr_g_losses,
)
from llm_guided_asr_tpu.ops.frontend import FrontendConfig
from llm_guided_asr_tpu.train.gan_trainer import gan_train


def test_uasr_gan_discriminator_learns():
    cfg = UASRConfig(n_phones=5, feat_dim=8, hidden=16)
    gen = UASRGenerator(cfg)
    disc = UASRDiscriminator(cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((4, 20, 8)), jnp.float32)
    flens = jnp.full((4,), 20, jnp.int32)
    # "real" text: strongly peaked phone sequences with repeats (language-like)
    real_ids = np.repeat(rng.integers(0, 5, (4, 5)), 2, axis=1)
    real = jax.nn.one_hot(jnp.asarray(real_ids), 5) * 0.9 + 0.02
    rlens = jnp.full((4,), 10, jnp.int32)

    g_v = gen.init(jax.random.PRNGKey(0), feats, flens)
    logits0, glens = gen.apply(g_v, feats, flens)
    d_v = disc.init(jax.random.PRNGKey(1), real, rlens)

    def g_loss(g_params, d_params, batch, rng_key):
        logits, lens = gen.apply({"params": g_params}, batch["feats"], batch["flens"])
        probs = jax.nn.softmax(logits, -1)
        scores = disc.apply({"params": d_params}, probs, lens)
        parts = uasr_g_losses(logits, lens, scores)
        loss = parts["adv"] + parts["smooth"] + parts["diversity"]
        return loss, parts

    def d_loss(d_params, g_params, batch, rng_key):
        logits, lens = gen.apply({"params": g_params}, batch["feats"], batch["flens"])
        fake = jax.lax.stop_gradient(jax.nn.softmax(logits, -1))
        f = disc.apply({"params": d_params}, fake, lens)
        r = disc.apply({"params": d_params}, batch["real"], batch["rlens"])
        loss = uasr_d_loss(r, f)
        return loss, {"d": loss}

    batch = {"feats": feats, "flens": flens, "real": real, "rlens": rlens}
    g_params, d_params, stats = gan_train(
        g_v["params"], d_v["params"], g_loss, d_loss, [batch] * 40,
        g_lr=1e-3, d_lr=1e-3, log_interval=1000,
    )
    # discriminator separates real text from generator output
    logits, lens = gen.apply({"params": g_params}, feats, flens)
    f_score = disc.apply({"params": d_params}, jax.nn.softmax(logits, -1), lens)
    r_score = disc.apply({"params": d_params}, real, rlens)
    assert float(jnp.mean(r_score)) > float(jnp.mean(f_score))
    assert all(np.isfinite(v) for v in stats.values())


def test_s2st_unit_and_text_losses():
    base = ASRModelConfig(
        vocab_size=12,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=20),
        normalize="utterance_mvn",
        encoder=ConformerConfig(output_size=16, attention_heads=2, linear_units=24,
                                num_blocks=1, use_cnn_module=False),
        decoder=TransformerDecoderConfig(attention_heads=2, linear_units=24, num_blocks=1),
    )
    model = S2STModel(S2STConfig(base=base, unit_vocab_size=30, st_weight=0.3))
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((2, 1600)), jnp.float32)
    slens = jnp.asarray([1600, 900])
    units = jnp.asarray(rng.integers(0, 30, (2, 6)), jnp.int32)
    ulens = jnp.asarray([6, 4])
    units = jnp.where(jnp.arange(6)[None] < ulens[:, None], units, -1)
    text = jnp.asarray([[1, 2, -1], [3, -1, -1]], jnp.int32)
    tlens = jnp.asarray([2, 1])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, slens, units, ulens, text, tlens, deterministic=True,
    )
    loss, stats, _ = model.apply(
        variables, speech, slens, units, ulens, text, tlens, deterministic=True
    )
    assert np.isfinite(float(loss))
    assert "loss_unit" in stats and "loss_st" in stats
    np.testing.assert_allclose(
        float(loss),
        0.7 * float(stats["loss_unit"]) + 0.3 * float(stats["loss_st"]),
        rtol=1e-5,
    )
    # units-only mode
    loss2, stats2, _ = model.apply(
        variables, speech, slens, units, ulens, deterministic=True
    )
    np.testing.assert_allclose(float(loss2), float(stats2["loss_unit"]), rtol=1e-6)
