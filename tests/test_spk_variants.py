"""Speaker package registry variants.

Covers the espnet2/spk multi-architecture registries rebuilt in
models/spk.py: encoders (ecapa/rawnet3/xvector/ska_tdnn/identity),
poolings (chn_attn_stat/stats/mean), projectors (rawnet3/xvector/ska),
and losses (aamsoftmax/aamsoftmax_sc_itk) — reference combos per
egs2/voxceleb/spk1 configs. Each combo: train-mode forward + grad step
(batch_stats mutated) and eval-mode embedding extraction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

# (encoder, pooling, projector, loss) — matching reference recipe pairings
COMBOS = [
    ("ecapa", "chn_attn_stat", "rawnet3", "aamsoftmax"),
    ("rawnet3", "chn_attn_stat", "rawnet3", "aamsoftmax_sc_itk"),
    ("xvector", "stats", "xvector", "aamsoftmax"),
    ("ska_tdnn", "chn_attn_stat", "ska", "aamsoftmax_sc_itk"),
    ("identity", "mean", "dense", "aamsoftmax"),
]


@pytest.mark.parametrize("enc,pool,proj,loss", COMBOS)
def test_spk_variant_forward_grad_eval(enc, pool, proj, loss):
    from llm_guided_asr_tpu.models.spk import SpeakerModel, SpkConfig
    from llm_guided_asr_tpu.ops.frontend import FrontendConfig

    cfg = SpkConfig(
        n_speakers=4,
        frontend=FrontendConfig(n_fft=256, hop_length=128, n_mels=16),
        hidden=16,
        layers=2,
        embed_dim=8,
        encoder=enc,
        pooling=pool,
        projector=proj,
        loss=loss,
        model_scale=4,
        ska_dim=4,
        subcenter_k=2,
        inter_topk=2,
    )
    model = SpeakerModel(cfg)
    rng = np.random.default_rng(0)
    b = 3
    # rawnet3 maxpools time by 5 then 3: keep >= 15 frames post-frontend
    speech = jnp.asarray(rng.standard_normal((b, 4000)).astype(np.float32))
    lens = jnp.asarray([4000, 3000, 2600], jnp.int32)
    labels = jnp.asarray([0, 1, 2], jnp.int32)

    variables = model.init(
        jax.random.PRNGKey(0), speech, lens, labels, deterministic=False
    )
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    def loss_fn(p):
        (l, stats, _w), new_vars = model.apply(
            {"params": p, "batch_stats": bstats},
            speech,
            lens,
            labels,
            deterministic=False,
            mutable=["batch_stats"],
        )
        return l, (stats, new_vars)

    (l0, (stats, new_vars)), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(l0)), f"{enc}: non-finite loss"
    gnorm = float(optax.global_norm(g))
    assert np.isfinite(gnorm) and gnorm > 0.0, f"{enc}: bad grad norm {gnorm}"
    assert 0.0 <= float(stats["acc"]) <= 1.0

    # eval path: running stats, no mutation
    emb = model.apply(
        {"params": params, "batch_stats": new_vars.get("batch_stats", bstats)},
        speech,
        lens,
        method=model.extract_embedding,
    )
    assert emb.shape == (b, cfg.embed_dim)
    assert np.isfinite(np.asarray(emb)).all()


def test_subcenter_intertopk_reduces_to_aam_when_k1_top0():
    """With K=1 sub-center and no inter-topk the sc_itk loss must equal the
    easy-margin region of plain AAM on well-separated embeddings."""
    from llm_guided_asr_tpu.models.spk import (
        aam_softmax_loss,
        aam_subcenter_intertopk_loss,
    )

    rng = np.random.default_rng(1)
    e = jnp.asarray(rng.standard_normal((5, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((8, 6)).astype(np.float32))
    labels = jnp.asarray([0, 1, 2, 3, 4], jnp.int32)
    l_ref, acc_ref = aam_softmax_loss(e, w, labels, margin=0.2, scale=30.0)
    l_sc, acc_sc = aam_subcenter_intertopk_loss(
        e, w, labels, n_classes=6, margin=0.2, scale=30.0, k_top=0
    )
    # identical unless some cos falls past the easy-margin threshold
    assert acc_ref == acc_sc
    np.testing.assert_allclose(float(l_ref), float(l_sc), rtol=2e-3)
