"""MEGA transducer decoder tests (asr_transducer/decoder/mega_decoder.py parity).

- EMA Toeplitz-matmul causal conv == explicit per-step damped-EMA recurrence
  (ema_one_step, multi_head_damped_ema.py:145-170).
- Causality: output at u is independent of labels > u.
- Full transducer forward/grads + greedy decode with decoder_type=mega.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_guided_asr_tpu.models.conformer import ConformerConfig
from llm_guided_asr_tpu.models.mega_decoder import MEGADecoder, MultiHeadDampedEMA
from llm_guided_asr_tpu.models.transducer import (
    TransducerDecoderConfig,
    TransducerModel,
    TransducerModelConfig,
    transducer_greedy_decode,
)
from llm_guided_asr_tpu.ops.frontend import FrontendConfig

VOCAB = 11


def test_ema_toeplitz_matches_recurrence():
    d, n, length, b = 6, 4, 9, 2
    ema = MultiHeadDampedEMA(d, n)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, length, d)), jnp.float32)
    variables = ema.init(jax.random.PRNGKey(0), x)
    out = ema.apply(variables, x)

    # explicit recurrence (reference ema_one_step): state[d, n] updates as
    # s_t = damp*expand*x_t + q*s_{t-1}; y_t = proj/sqrt(N) . s_t + w_res*x_t
    p = variables["params"]
    damp = jax.nn.sigmoid(p["damping_factor"])
    q = 1.0 - damp * jax.nn.sigmoid(p["decay_factor"])
    expand = p["ema_expansion_matrix"]
    proj = p["kernel_projection_matrix"] / np.sqrt(n)
    wres = p["residual_weight"]
    ref = np.zeros((b, length, d), np.float32)
    for bi in range(b):
        s = np.zeros((d, n), np.float32)
        for t in range(length):
            s = np.asarray(damp * expand) * np.asarray(x[bi, t])[:, None] + np.asarray(q) * s
            ref[bi, t] = (s * np.asarray(proj)).sum(-1) + np.asarray(wres) * np.asarray(x[bi, t])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("bias_type", ["simple", "rotary"])
def test_mega_decoder_causal(bias_type):
    cfg = TransducerDecoderConfig(
        decoder_type="mega", hidden_size=16, num_layers=2,
        mega_qk_size=8, mega_v_size=24, mega_rel_pos_bias=bias_type,
    )
    dec = MEGADecoder(VOCAB, cfg)
    labels = jnp.asarray([[1, 2, 3, 4, 5]], jnp.int32)
    variables = dec.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, labels
    )
    out = dec.apply(variables, labels)
    assert out.shape == (1, 6, 16)
    # perturb the last label: positions <= 4 (prefix incl. prepended 0 and
    # labels[0:4]) must be unchanged
    labels2 = labels.at[0, 4].set(9)
    out2 = dec.apply(variables, labels2)
    np.testing.assert_allclose(np.asarray(out[:, :5]), np.asarray(out2[:, :5]), atol=1e-5)
    assert not np.allclose(np.asarray(out[:, 5]), np.asarray(out2[:, 5]))


def test_ema_fft_path_matches_toeplitz():
    """Above fft_threshold the rfft/irfft formulation must equal the
    Toeplitz matmul (ADVICE r3: no [D, L, L] intermediate at decode
    lengths)."""
    d, n, length, b = 6, 4, 40, 2
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, length, d)), jnp.float32)
    toep = MultiHeadDampedEMA(d, n)  # default threshold 256 >= 40 -> matmul
    fft = MultiHeadDampedEMA(d, n, fft_threshold=8)  # force FFT path
    variables = toep.init(jax.random.PRNGKey(0), x)
    out_t = toep.apply(variables, x)
    out_f = fft.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_f),
                               rtol=2e-4, atol=2e-5)


def test_simple_bias_reference_orientation_and_range_check():
    """bias[i, j] = b[max_positions-1 + (j-i)] (reference tile-trick layout,
    positional_bias.py:44-58) and length > max_positions raises."""
    from llm_guided_asr_tpu.models.mega_decoder import SimpleRelativePositionBias

    mod = SimpleRelativePositionBias(max_positions=8)
    variables = mod.init(jax.random.PRNGKey(0), 5)
    bias = mod.apply(variables, 5)
    b = np.asarray(variables["params"]["relative_position_bias"])
    for i in range(5):
        for j in range(5):
            np.testing.assert_allclose(float(bias[i, j]), b[7 + (j - i)])
    with pytest.raises(ValueError, match="max_positions"):
        mod.apply(variables, 9)


def test_mega_config_plumbs_ffn_and_max_positions():
    """mega_ffn_size / mega_max_positions reach the blocks; default FFN is
    2*hidden (reference linear_size default), not 4*."""
    cfg = TransducerDecoderConfig(
        decoder_type="mega", hidden_size=16, num_layers=1, mega_qk_size=8,
        mega_max_positions=4,
    )
    dec = MEGADecoder(VOCAB, cfg)
    labels = jnp.asarray([[1, 2]], jnp.int32)  # L = 3 <= 4
    variables = dec.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, labels
    )
    # default ffn hidden = 2 * 16
    assert variables["params"]["ffn_0"]["linear1"]["kernel"].shape == (16, 32)
    long_labels = jnp.asarray([[1, 2, 3, 4, 5]], jnp.int32)  # L = 6 > 4
    with pytest.raises(ValueError, match="max_positions"):
        dec.apply(variables, long_labels)
    cfg2 = TransducerDecoderConfig(
        decoder_type="mega", hidden_size=16, num_layers=1, mega_qk_size=8,
        mega_ffn_size=48,
    )
    dec2 = MEGADecoder(VOCAB, cfg2)
    v2 = dec2.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, labels
    )
    assert v2["params"]["ffn_0"]["linear1"]["kernel"].shape == (16, 48)


def test_transducer_mega_forward_grads_and_decode():
    cfg = TransducerModelConfig(
        vocab_size=VOCAB,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=20),
        normalize="utterance_mvn",
        encoder=ConformerConfig(
            output_size=16, attention_heads=2, linear_units=24, num_blocks=1,
            use_cnn_module=False,
        ),
        decoder=TransducerDecoderConfig(
            decoder_type="mega", embed_size=16, hidden_size=16, num_layers=1,
            mega_qk_size=8,
        ),
        joint_size=16,
    )
    model = TransducerModel(cfg)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((2, 1600)), jnp.float32)
    slens = jnp.asarray([1600, 900])
    text = jnp.asarray([[1, 2, 3], [4, 5, -1]], jnp.int32)
    tlens = jnp.asarray([3, 2])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, slens, text, tlens, deterministic=True,
    )
    loss, stats, w = model.apply(variables, speech, slens, text, tlens, deterministic=True)
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda p: model.apply({**variables, "params": p}, speech, slens, text, tlens,
                              deterministic=True)[0]
    )(variables["params"])
    total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0

    enc, enc_lens = model.apply(variables, speech, slens, method=model.encode)
    tokens, n = transducer_greedy_decode(model, variables, enc, enc_lens)
    assert tokens.shape[0] == 2 and np.all(np.asarray(n) >= 0)
