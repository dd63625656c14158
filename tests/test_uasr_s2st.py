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
from llm_guided_asr_tpu.models import uasr as U
from llm_guided_asr_tpu.ops.frontend import FrontendConfig
from llm_guided_asr_tpu.train.gan_trainer import gan_train


def test_uasr_gan_discriminator_learns():
    cfg = U.UASRConfig(
        n_phones=5, feat_dim=8, discriminator_channels=16,
        generator_dropout=0.0, discriminator_depth=2,
    )
    gen = U.ConvGenerator(cfg)
    disc = U.ConvDiscriminator(cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((4, 20, 8)), jnp.float32)
    flens = jnp.full((4,), 20, jnp.int32)
    # "real" text: strongly peaked phone sequences with repeats (language-like)
    real_ids = np.repeat(rng.integers(0, 5, (4, 5)), 2, axis=1)
    real = jax.nn.one_hot(jnp.asarray(real_ids), 5) * 0.9 + 0.02
    rlens = jnp.full((4,), 10, jnp.int32)

    g_v = gen.init(jax.random.PRNGKey(0), feats, flens)
    d_v = disc.init(jax.random.PRNGKey(1), real, rlens)

    def gen_logits(g_params, batch):
        (logits, inter_x, lens), _ = gen.apply(
            {"params": g_params}, batch["feats"], batch["flens"],
            deterministic=False, mutable=["batch_stats"],
        )
        return logits, lens

    def g_loss(g_params, d_params, batch, rng_key):
        logits, lens = gen_logits(g_params, batch)
        probs = jax.nn.softmax(logits, -1)
        scores = disc.apply({"params": d_params}, probs, lens)
        adv, _ = U.discriminator_loss(scores, None, False)
        smooth = U.smoothness_penalty(logits, lens, logits.shape[0])
        div = U.phoneme_diversity_loss(logits, lens, logits.shape[0])
        loss = adv + 0.5 * smooth + 0.3 * div
        return loss, {"adv": adv, "smooth": smooth, "diversity": div}

    def d_loss(d_params, g_params, batch, rng_key):
        logits, lens = gen_logits(g_params, batch)
        fake = jax.lax.stop_gradient(jax.nn.softmax(logits, -1))
        f = disc.apply({"params": d_params}, fake, lens)
        r = disc.apply({"params": d_params}, batch["real"], batch["rlens"])
        l_fake, l_real = U.discriminator_loss(f, r, True)
        gp = U.gradient_penalty(
            lambda p, x, ls: disc.apply({"params": p}, x, ls),
            d_params, fake, batch["real"], rng_key,
        )
        loss = l_fake + l_real + 1.0 * gp
        return loss, {"d": loss, "gp": gp}

    batch = {"feats": feats, "flens": flens, "real": real, "rlens": rlens}
    g_params, d_params, stats = gan_train(
        g_v["params"], d_v["params"], g_loss, d_loss, [batch] * 40,
        g_lr=1e-3, d_lr=1e-3, log_interval=1000,
    )
    assert all(np.isfinite(v) for v in stats.values())

    # the clean separation property: D trained against a FROZEN generator
    # separates generated distributions from one-hot text.  NOTE the
    # reference labels generated samples 1 and real text 0
    # (discriminator_loss.py:47-57), so FAKE scores end up higher.
    import optax

    logits, lens = gen_logits(g_params, batch)
    fake = jax.lax.stop_gradient(jax.nn.softmax(logits, -1))
    tx = optax.adam(2e-3)
    d_only, opt = d_v["params"], None
    opt = tx.init(d_only)

    def d_fixed_loss(p):
        f = disc.apply({"params": p}, fake, lens)
        r = disc.apply({"params": p}, real, rlens)
        l_fake, l_real = U.discriminator_loss(f, r, True)
        return l_fake + l_real

    @jax.jit
    def step(p, o):
        g = jax.grad(d_fixed_loss)(p)
        updates, o = tx.update(g, o, p)
        return optax.apply_updates(p, updates), o

    for _ in range(60):
        d_only, opt = step(d_only, opt)
    f_score = disc.apply({"params": d_only}, fake, lens)
    r_score = disc.apply({"params": d_only}, real, rlens)
    assert float(jnp.mean(f_score)) > float(jnp.mean(r_score))


def test_uasr_join_segmenter_collapses_runs():
    """join_logit_segment == unique_consecutive + mean-pool (join_segmenter.py)."""
    # 2 utterances; argmax runs: [a a b b b c] -> 3 segments; [a b b] -> 2
    logits = np.full((2, 6, 3), -5.0, np.float32)
    for b, seq in enumerate([[0, 0, 1, 1, 1, 2], [0, 1, 1, 0, 0, 0]]):
        for t, p in enumerate(seq):
            logits[b, t, p] = float(t + 1)  # distinct magnitudes per frame
    lens = jnp.asarray([6, 3])
    pooled, n_seg = U.join_logit_segment(jnp.asarray(logits), lens, mean_pool_join=True)
    assert n_seg.tolist() == [3, 2]
    # segment 0 of utt 0 = mean of frames 0,1
    np.testing.assert_allclose(
        np.asarray(pooled)[0, 0], logits[0, :2].mean(0), rtol=1e-6
    )
    # beyond n_seg everything is zero-padded
    assert np.all(np.asarray(pooled)[1, 2:] == 0.0)
    # random-pick mode keeps one frame per segment (values from the segment)
    picked, n2 = U.join_logit_segment(
        jnp.asarray(logits), lens, mean_pool_join=False, rng=jax.random.PRNGKey(0)
    )
    assert n2.tolist() == [3, 2]
    p0 = np.asarray(picked)[0, 0]
    assert any(np.allclose(p0, logits[0, t]) for t in range(2))


def test_uasr_random_pre_segment():
    rng = jax.random.PRNGKey(3)
    feats = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 4)), jnp.float32)
    lens = jnp.asarray([16, 8])
    out, new_lens = U.random_pre_segment(rng, feats, lens, 0.5)
    assert out.shape == (2, 8, 4)
    assert int(new_lens[0]) == 8 and 1 <= int(new_lens[1]) <= 8


def test_uasr_gumbel_and_temperature():
    t0 = U.gumbel_temperature(jnp.asarray(0), 2.0, 0.1, 0.9)
    t9 = U.gumbel_temperature(jnp.asarray(100), 2.0, 0.1, 0.9)
    np.testing.assert_allclose([float(t0), float(t9)], [2.0, 0.1], rtol=1e-6)
    logits = jnp.asarray(np.random.default_rng(1).standard_normal((2, 5, 7)), jnp.float32)
    hard = U.sample_generator_output(jax.random.PRNGKey(0), logits, 1.0, hard=True)
    np.testing.assert_allclose(np.asarray(hard).sum(-1), 1.0, rtol=1e-5)
    assert np.all((np.asarray(hard).max(-1) > 0.99))


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
