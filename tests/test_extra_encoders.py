"""MultiConvformer + (VGG-)RNN encoders (multiconvformer_encoder.py /
rnn_encoder.py / vgg_rnn_encoder.py analogs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_guided_asr_tpu.models.conformer import ConformerConfig, make_encoder


def enc_cfg(**kw):
    base = dict(
        output_size=16, attention_heads=2, linear_units=32, num_blocks=2,
        input_layer="linear", use_cnn_module=False, dropout_rate=0.0,
        positional_dropout_rate=0.0, pos_enc_layer_type="abs_pos",
        selfattention_layer_type="selfattn",
    )
    base.update(kw)
    return ConformerConfig(**base)


def run_encoder(enc_type, cfg, feats, lens):
    model = make_encoder(enc_type, cfg, name="enc")
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats, lens, deterministic=True,
    )
    return model.apply(variables, feats, lens, deterministic=True)


@pytest.mark.parametrize("enc_type", ["multiconvformer", "rnn"])
def test_extra_encoders_forward(enc_type):
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((2, 30, 20)), jnp.float32)
    lens = jnp.asarray([30, 17])
    cfg = enc_cfg(multicgmlp_kernel_sizes=(3, 7))
    out, out_lens = run_encoder(enc_type, cfg, feats, lens)
    assert out.shape == (2, 30, 16)
    o = np.asarray(out)
    assert np.all(np.isfinite(o))
    assert np.all(o[1, 17:] == 0.0)
    np.testing.assert_array_equal(np.asarray(out_lens), [30, 17])


def test_vgg_rnn_subsamples_4x():
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((2, 32, 20)), jnp.float32)
    lens = jnp.asarray([32, 20])
    cfg = enc_cfg(input_layer="conv2d", num_blocks=1)
    out, out_lens = run_encoder("vgg_rnn", cfg, feats, lens)
    assert out.shape[1] == 8  # 32 / 4
    np.testing.assert_array_equal(np.asarray(out_lens), [8, 5])
    assert np.all(np.isfinite(np.asarray(out)))


def test_multiconvformer_pad_invariance():
    """Valid-frame outputs must not depend on padded tail content."""
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.standard_normal((1, 24, 20)), jnp.float32)
    lens = jnp.asarray([16])
    cfg = enc_cfg(multicgmlp_kernel_sizes=(3, 7), num_blocks=1)
    model = make_encoder("multiconvformer", cfg, name="enc")
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats, lens, deterministic=True,
    )
    out1, _ = model.apply(variables, feats, lens, deterministic=True)
    feats2 = feats.at[:, 16:].set(feats[:, 16:] + 9.0)
    out2, _ = model.apply(variables, feats2, lens, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out1)[:, :16], np.asarray(out2)[:, :16], atol=1e-5
    )


def test_fused_frontend_asr():
    """Fused multi-resolution frontend (fused.py FusedFrontends analog)."""
    from llm_guided_asr_tpu.models.asr_model import ASRModel, ASRModelConfig
    from llm_guided_asr_tpu.models.transformer_decoder import (
        TransformerDecoderConfig,
    )
    from llm_guided_asr_tpu.ops.frontend import FrontendConfig

    cfg = ASRModelConfig(
        vocab_size=8,
        frontend=FrontendConfig(fused=((256, 128, 20), (512, 256, 40)),
                                proj_dim=12),
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
    rng = np.random.default_rng(5)
    speech = jnp.asarray(rng.standard_normal((2, 2000)) * 0.1, jnp.float32)
    slens = jnp.asarray([2000, 1500])
    feats, flens = model.init_with_output(
        {"params": jax.random.PRNGKey(0)}, speech, slens,
        method=ASRModel.collect_feats,
    )[0].values()
    assert feats.shape[-1] == 24  # proj_dim * 2 frontends
    text = jnp.asarray([[1, 2, 3], [4, 5, -1]], jnp.int32)
    tlens = jnp.asarray([3, 2])
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           speech, slens, text, tlens, deterministic=True)
    loss, _, _ = model.apply(variables, speech, slens, text, tlens,
                             deterministic=True)
    assert np.isfinite(float(loss))


def test_gst_style_conditioning():
    """GST style encoder: different reference mels give different synthesized
    output; training forward is finite."""
    from llm_guided_asr_tpu.models.tts import FastSpeech2, FastSpeech2Config

    cfg = FastSpeech2Config(vocab_size=10, n_mels=12, adim=16, heads=2,
                            eunits=24, elayers=1, dlayers=1, use_gst=True,
                            gst_tokens=4, gst_heads=2)
    model = FastSpeech2(cfg)
    rng = np.random.default_rng(6)
    text = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    tlens = jnp.asarray([4])
    mel = jnp.asarray(rng.standard_normal((1, 12, 12)), jnp.float32)
    mlens = jnp.asarray([12])
    dur = jnp.asarray([[3, 3, 3, 3]], jnp.int32)
    pitch = jnp.asarray(rng.standard_normal((1, 4)), jnp.float32)
    energy = jnp.asarray(rng.standard_normal((1, 4)), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           text, tlens, mel, mlens, dur,
                           pitch=pitch, energy=energy)
    loss, stats, _ = model.apply(variables, text, tlens, mel, mlens, dur,
                                 pitch=pitch, energy=energy)
    assert np.isfinite(float(loss))
    out1, _ = model.apply(variables, text, tlens, t_max=24,
                          ref_mel=mel, ref_mel_lengths=mlens,
                          method=model.inference)
    out2, _ = model.apply(variables, text, tlens, t_max=24,
                          ref_mel=mel + 3.0, ref_mel_lengths=mlens,
                          method=model.inference)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_flash_attention_falls_back_dense_on_cpu():
    """selfattention_layer_type=flash: identical numerics to selfattn via the
    dense fallback on CPU (the TPU pallas path is covered by a TPU probe)."""
    rng = np.random.default_rng(7)
    feats = jnp.asarray(rng.standard_normal((2, 24, 20)), jnp.float32)
    lens = jnp.asarray([24, 17])
    base = dict(output_size=16, attention_heads=2, linear_units=32,
                num_blocks=1, input_layer="linear", use_cnn_module=False,
                dropout_rate=0.0, positional_dropout_rate=0.0,
                pos_enc_layer_type="abs_pos")
    dense = make_encoder("conformer", ConformerConfig(
        **base, selfattention_layer_type="selfattn"), name="enc")
    flash = make_encoder("conformer", ConformerConfig(
        **base, selfattention_layer_type="flash"), name="enc")
    v = dense.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)},
                   feats, lens, deterministic=True)
    out_d, _ = dense.apply(v, feats, lens, deterministic=True)
    out_f, _ = flash.apply(v, feats, lens, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_d),
                               rtol=1e-5, atol=1e-5)
