"""WPE dereverberation + mask-based MVDR beamforming (enh/layers/wpe.py,
dnn_beamformer.py analogs) and the multichannel ASR frontend."""

import jax
import jax.numpy as jnp
import numpy as np

from llm_guided_asr_tpu.ops.beamformer import mvdr_beamform, wpe_dereverb


def test_mvdr_suppresses_spatially_separated_noise():
    """Two channels see the same speech but opposite-phase noise; with oracle
    masks MVDR must beat the raw reference channel SNR by a wide margin."""
    rng = np.random.default_rng(0)
    F, T = 9, 60
    speech = (rng.standard_normal((F, T)) + 1j * rng.standard_normal((F, T)))
    speech[:, T // 2:] = 0.0  # speech active in first half only
    noise = (rng.standard_normal((F, T)) + 1j * rng.standard_normal((F, T)))
    y1 = speech + noise
    y2 = speech - noise  # opposite phase -> perfectly cancellable
    y = jnp.asarray(np.stack([y1, y2], axis=1)[None], jnp.complex64)  # [1,F,C,T]
    m_s = np.zeros((1, F, T), np.float32)
    m_s[:, :, : T // 2] = 1.0
    m_n = 1.0 - m_s
    out = np.asarray(mvdr_beamform(y, jnp.asarray(m_s), jnp.asarray(m_n)))
    err_bf = np.mean(np.abs(out[0, :, : T // 2] - speech[:, : T // 2]) ** 2)
    err_raw = np.mean(np.abs(y1[:, : T // 2] - speech[:, : T // 2]) ** 2)
    assert err_bf < 0.05 * err_raw, (err_bf, err_raw)


def test_wpe_reduces_late_reverb():
    """y = x + 0.7 x[t-4]: WPE prediction should strip most of the tail."""
    rng = np.random.default_rng(1)
    F, C, T, d = 5, 2, 200, 4
    x = (rng.standard_normal((F, C, T)) + 1j * rng.standard_normal((F, C, T)))
    y = x.copy()
    y[..., d:] += 0.7 * x[..., :-d]
    out = np.asarray(
        wpe_dereverb(jnp.asarray(y[None], jnp.complex64), taps=8, delay=4,
                     iterations=3)
    )[0]
    err_before = np.mean(np.abs(y - x) ** 2)
    err_after = np.mean(np.abs(out - x) ** 2)
    # the lag-4/-8 taps capture the geometric predictor; > 2x echo-power cut
    assert err_after < 0.5 * err_before, (err_after, err_before)


def test_multichannel_asr_frontend_trains():
    from llm_guided_asr_tpu.models.asr_model import ASRModel, ASRModelConfig
    from llm_guided_asr_tpu.models.conformer import ConformerConfig
    from llm_guided_asr_tpu.models.transformer_decoder import (
        TransformerDecoderConfig,
    )
    from llm_guided_asr_tpu.ops.frontend import FrontendConfig

    cfg = ASRModelConfig(
        vocab_size=8,
        frontend=FrontendConfig(n_fft=256, hop_length=128, n_mels=20,
                                use_wpe=True, wpe_taps=3, wpe_iterations=1,
                                use_beamformer=True, mask_units=8),
        normalize="utterance_mvn",
        encoder_type="transformer",
        encoder=ConformerConfig(output_size=16, attention_heads=2,
                                linear_units=24, num_blocks=1,
                                input_layer="linear", use_cnn_module=False),
        decoder=TransformerDecoderConfig(attention_heads=2, linear_units=24,
                                         num_blocks=1),
        ctc_weight=0.3,
    )
    model = ASRModel(cfg)
    rng = np.random.default_rng(2)
    speech = jnp.asarray(rng.standard_normal((2, 2000, 2)) * 0.1, jnp.float32)
    slens = jnp.asarray([2000, 1500])
    text = jnp.asarray([[1, 2, 3], [4, 5, -1]], jnp.int32)
    tlens = jnp.asarray([3, 2])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, slens, text, tlens, deterministic=True,
    )
    assert "mc_frontend" in variables["params"]
    loss, stats, _ = model.apply(variables, speech, slens, text, tlens,
                                 deterministic=True)
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda p: model.apply({"params": p}, speech, slens, text, tlens,
                              deterministic=True)[0]
    )(variables["params"])
    import optax

    assert float(optax.global_norm(g["mc_frontend"])) > 0
