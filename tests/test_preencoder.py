"""Sinc preencoder + sliding-window frontend + length-adaptor postencoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_guided_asr_tpu.models.preencoder import (
    LengthAdaptorConfig,
    LengthAdaptorPostEncoder,
    LightweightSincConvs,
    SincConv1d,
    SincPreencoderConfig,
    mel_filter_bank,
    sliding_window,
)


def test_sliding_window_frames_and_lengths():
    sr = 16000
    x = jnp.asarray(np.arange(2 * 1600, dtype=np.float32).reshape(2, 1600))
    frames, lens = sliding_window(x, jnp.asarray([1600, 800]), 400, 160)
    t = (1600 - 400) // 160 + 1
    assert frames.shape == (2, t, 400)
    # frame k starts at k*hop
    np.testing.assert_allclose(frames[0, 2, :5], np.arange(320, 325))
    assert int(lens[0]) == t and int(lens[1]) == (800 - 400) // 160 + 1


def test_sinc_conv_is_a_band_pass():
    """A filter's response to an in-band tone beats an out-of-band tone."""
    fs = 16000.0
    conv = SincConv1d(out_channels=16, kernel_size=101, fs=fs)
    vs = conv.init(jax.random.PRNGKey(0), jnp.zeros((1, 400, 1)))
    f = np.asarray(vs["params"]["f"])  # [16, 2] normalized (f_min, f_max)
    # pick filter 8; its band in Hz
    lo, hi = abs(f[8, 0]) * fs, (abs(f[8, 0]) + abs(f[8, 1] - f[8, 0])) * fs
    mid = (lo + hi) / 2
    t = np.arange(400) / fs

    def energy(freq):
        x = jnp.asarray(np.sin(2 * np.pi * freq * t), jnp.float32)[None, :, None]
        y = conv.apply(vs, x)
        return float(jnp.sum(y[0, :, 8] ** 2))

    assert energy(mid) > 5 * energy(hi * 3 if hi * 3 < fs / 2 else lo / 4)


def test_mel_filter_bank_monotone():
    bank = np.asarray(mel_filter_bank(32, 16000.0)) * 16000.0
    assert np.all(bank[:, 1] > bank[:, 0])  # every band has positive width
    assert np.all(np.diff(bank[:, 0]) > 0)  # band starts increase


def test_lightweight_sinc_convs_shape_and_grads():
    cfg = SincPreencoderConfig(out_channels=32, sinc_channels=16)
    mod = LightweightSincConvs(cfg)
    frames = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 5, 400)), jnp.float32
    )
    vs = mod.init(jax.random.PRNGKey(0), frames)
    out, muts = mod.apply(vs, frames, False, mutable=["batch_stats"],
                          rngs={"dropout": jax.random.PRNGKey(1)})
    assert out.shape == (2, 5, 32)
    g = jax.grad(
        lambda p: jnp.sum(
            mod.apply({"params": p, "batch_stats": vs["batch_stats"]}, frames) ** 2
        )
    )(vs["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    # the sinc band edges themselves receive gradient (learnable filters)
    assert float(jnp.abs(g["filters"]["f"]).max()) > 0


def test_length_adaptor_halves_time():
    mod = LengthAdaptorPostEncoder(LengthAdaptorConfig(n_layers=2))
    x = jnp.ones((2, 16, 8))
    vs = mod.init(jax.random.PRNGKey(0), x, jnp.asarray([16, 10]))
    y, lens = mod.apply(vs, x, jnp.asarray([16, 10]))
    assert y.shape == (2, 4, 8)
    assert lens.tolist() == [4, 2]


def test_length_adaptor_linear_input_layer():
    mod = LengthAdaptorPostEncoder(
        LengthAdaptorConfig(n_layers=1, input_layer="linear", output_size=12)
    )
    x = jnp.ones((2, 8, 6))
    vs = mod.init(jax.random.PRNGKey(0), x, jnp.asarray([8, 8]))
    y, lens = mod.apply(vs, x, jnp.asarray([8, 8]))
    assert y.shape == (2, 4, 12)


def test_asr_model_with_sinc_and_adaptor_trains():
    """Full pipeline: sliding_window frontend -> sinc preencoder -> encoder
    -> length adaptor; loss decreases over a few steps."""
    import optax

    from llm_guided_asr_tpu.tasks.asr import build_model

    config = {
        "token_list": ["<blank>", "<unk>", "a", "b", "<sos/eos>"],
        "frontend": "default",
        "frontend_conf": {"type": "sliding_window", "win_length": 400,
                          "hop_length": 320},
        "preencoder": "sinc",
        "preencoder_conf": {"out_channels": 32, "sinc_channels": 16},
        "postencoder": "length_adaptor",
        "postencoder_conf": {"n_layers": 1},
        "normalize": "none",
        "encoder": "transformer",
        "encoder_conf": {"output_size": 32, "num_blocks": 1, "attention_heads": 2,
                         "linear_units": 64, "input_layer": "linear"},
        "decoder_conf": {"num_blocks": 1, "attention_heads": 2, "linear_units": 64},
        "model_conf": {"ctc_weight": 0.5},
    }
    model = build_model(config)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32) * 0.1
    slens = jnp.asarray([4000, 3200])
    text = jnp.asarray([[2, 3], [3, 2]], jnp.int32)
    tlens = jnp.asarray([2, 2])
    vs = model.init({"params": jax.random.PRNGKey(0)}, speech, slens, text, tlens,
                    deterministic=True)
    extra = {k: v for k, v in vs.items() if k != "params"}

    tx = optax.adam(1e-3)
    params = vs["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def f(p):
            out = model.apply({"params": p, **extra}, speech, slens, text, tlens,
                              deterministic=True)
            return out[0]

        loss, g = jax.value_and_grad(f)(params)
        up, opt2 = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt2, loss

    l0 = None
    for _ in range(6):
        params, opt, loss = step(params, opt)
        if l0 is None:
            l0 = float(loss)
    assert np.isfinite(float(loss)) and float(loss) < l0


def test_unknown_pre_post_encoder_rejected():
    from llm_guided_asr_tpu.tasks.asr import build_model_config

    base = {"token_list": ["<blank>", "a", "<sos/eos>"]}
    with pytest.raises(ValueError, match="unknown preencoder"):
        build_model_config({**base, "preencoder": "bogus"})
    with pytest.raises(ValueError, match="unknown postencoder"):
        build_model_config({**base, "postencoder": "bogus"})
