"""SLU (ASR + intent) and ASVSpoof (binary spoof detection) models."""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llm_guided_asr_tpu.models.asr_model import ASRModelConfig
from llm_guided_asr_tpu.models.conformer import ConformerConfig
from llm_guided_asr_tpu.models.slu import ASVSpoofConfig, ASVSpoofModel, SLUConfig, SLUModel
from llm_guided_asr_tpu.models.transformer_decoder import TransformerDecoderConfig
from llm_guided_asr_tpu.ops.frontend import FrontendConfig


def test_slu_forward_and_loss_composition():
    asr_cfg = ASRModelConfig(
        vocab_size=10,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=20),
        normalize="utterance_mvn",
        encoder=ConformerConfig(output_size=16, attention_heads=2, linear_units=24,
                                num_blocks=1, use_cnn_module=False),
        decoder=TransformerDecoderConfig(attention_heads=2, linear_units=24, num_blocks=1),
        ctc_weight=0.3,
    )
    model = SLUModel(SLUConfig(asr=asr_cfg, n_intents=4, intent_weight=0.5))
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((2, 1600)), jnp.float32)
    slens = jnp.asarray([1600, 900])
    text = jnp.asarray([[1, 2, -1], [3, -1, -1]], jnp.int32)
    tlens = jnp.asarray([2, 1])
    intent = jnp.asarray([1, 3], jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, slens, text, tlens, intent, deterministic=True,
    )
    loss, stats, _ = model.apply(
        variables, speech, slens, text, tlens, intent, deterministic=True
    )
    assert np.isfinite(float(loss))
    assert "loss_intent" in stats and "acc_intent" in stats
    assert float(loss) > float(stats["loss_ctc"]) * 0.0  # sanity


def test_asvspoof_learns_tone_vs_noise():
    cfg = ASVSpoofConfig(
        frontend=FrontendConfig(n_fft=256, hop_length=128, n_mels=23), adim=16, layers=1
    )
    model = ASVSpoofModel(cfg)
    rng = np.random.default_rng(0)
    n = 3200
    tones = np.stack([
        0.5 * np.sin(2 * np.pi * 440 * np.arange(n) / 16000) for _ in range(3)
    ]).astype(np.float32)
    noise = rng.standard_normal((3, n)).astype(np.float32) * 0.3
    speech = jnp.asarray(np.concatenate([tones, noise]))
    slens = jnp.full((6,), n, jnp.int32)
    label = jnp.asarray([0, 0, 0, 1, 1, 1], jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, slens, label, deterministic=True,
    )
    tx = optax.adam(3e-3)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, (stats, _)), g = jax.value_and_grad(
            lambda p: (lambda o=model.apply({"params": p}, speech, slens, label,
                                            deterministic=True): (o[0], (o[1], o[2])))(),
            has_aux=True,
        )(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, stats

    for _ in range(60):
        params, opt, stats = step(params, opt)
    assert float(stats["acc"]) == 1.0, stats
