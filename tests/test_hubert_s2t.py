"""HuBERT-style SSL pretraining + OWSM-style S2T multitask model."""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llm_guided_asr_tpu.models.hubert import (
    ConvFeatureExtractor,
    HubertConfig,
    HubertModel,
    kmeans_units,
)
from llm_guided_asr_tpu.models.s2t import S2TModel
from llm_guided_asr_tpu.models.asr_model import ASRModelConfig
from llm_guided_asr_tpu.models.conformer import ConformerConfig
from llm_guided_asr_tpu.models.transformer_decoder import TransformerDecoderConfig
from llm_guided_asr_tpu.ops.frontend import FrontendConfig


def test_conv_fe_lengths_match():
    cfg = HubertConfig(conv_channels=16, adim=16, layers=1)
    fe = ConvFeatureExtractor(cfg)
    x = jnp.zeros((1, 16000))
    v = fe.init(jax.random.PRNGKey(0), x)
    out = fe.apply(v, x)
    expect = int(ConvFeatureExtractor.out_lengths(cfg, jnp.asarray([16000]))[0])
    assert out.shape[1] == expect


def test_kmeans_units():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((50, 4)) + 5
    b = rng.standard_normal((50, 4)) - 5
    labels, cents = kmeans_units(np.concatenate([a, b]), 2, n_iters=10)
    assert len(set(labels[:50])) == 1 and len(set(labels[50:])) == 1
    assert labels[0] != labels[50]


def test_hubert_masked_prediction_learns():
    cfg = HubertConfig(n_clusters=4, adim=32, heads=2, units=48, layers=2,
                       conv_channels=16, head="softmax", loss_weights=0.0)
    model = HubertModel(cfg)
    rng = np.random.default_rng(0)
    n = 8000
    # two alternating acoustic units (tones) -> learnable cluster structure
    t = np.arange(n) / 16000
    seg = (np.floor(t * 12.5) % 2).astype(int)  # 80 ms segments
    wav = np.where(seg == 0, np.sin(2 * np.pi * 400 * t), np.sin(2 * np.pi * 1600 * t))
    speech = jnp.asarray(wav.astype(np.float32))[None]
    slens = jnp.asarray([n])
    flen = int(ConvFeatureExtractor.out_lengths(cfg, slens)[0])
    # align unit timeline with the actual conv frame rate
    frame_t = (np.arange(flen) + 0.5) * (n / 16000.0) / flen
    units = jnp.asarray((np.floor(frame_t * 12.5) % 2).astype(np.int32))[None]
    ulens = jnp.asarray([flen])

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "mask": jax.random.PRNGKey(2)},
        speech, slens, units, ulens, deterministic=True,
    )
    tx = optax.adam(2e-3)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        (loss, (stats, _)), g = jax.value_and_grad(
            lambda p: (lambda o=model.apply(
                {"params": p}, speech, slens, units, ulens, deterministic=False,
                rngs={"mask": key, "dropout": jax.random.fold_in(key, 1)},
            ): (o[0], (o[1], o[2])))(),
            has_aux=True,
        )(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, stats

    for i in range(150):
        params, opt, stats = step(params, opt, jax.random.PRNGKey(i))
    loss, stats, _ = model.apply(
        {"params": params}, speech, slens, units, ulens, deterministic=True
    )
    assert float(stats["acc_masked"]) > 0.85, f"masked unit acc: {stats}"


def test_hubert_cosine_head_criterion_parity():
    """Cosine head == fairseq criterion: CE over [sim(target), sim(all)] with
    target at index 0 (hubert_loss.py), plus weighted masked/unmasked terms
    and the loss_weights * features_pen extra loss."""
    cfg = HubertConfig(n_clusters=5, adim=16, heads=2, units=24, layers=1,
                       conv_channels=8, head="cosine", final_dim=12,
                       logit_temp=0.1, pred_masked_weight=1.0,
                       pred_nomask_weight=0.5, loss_weights=10.0)
    model = HubertModel(cfg)
    rng = np.random.default_rng(1)
    speech = jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32)
    slens = jnp.asarray([4000, 2500])
    flen = int(ConvFeatureExtractor.out_lengths(cfg, slens)[0])
    units = jnp.asarray(rng.integers(0, 5, (2, flen)), jnp.int32)
    flens = ConvFeatureExtractor.out_lengths(cfg, slens)
    units = jnp.where(jnp.arange(flen)[None, :] < flens[:, None], units, -1)
    ulens = flens
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "mask": jax.random.PRNGKey(2)},
        speech, slens, units, ulens, deterministic=True,
    )
    loss, stats, _ = model.apply(
        {"params": variables["params"]}, speech, slens, units, ulens,
        deterministic=True,
    )
    # recompute from the encoder outputs with an explicit target-first
    # logit layout (the fairseq arrangement)
    x, fl, _, feats = model.apply(
        {"params": variables["params"]}, speech, slens, None, True,
        method=model.encode, return_feats=True,
    )
    p = variables["params"]
    z = np.asarray(x) @ np.asarray(p["final_proj"]["kernel"]) + np.asarray(
        p["final_proj"]["bias"]
    )
    e = np.asarray(p["label_embs"])
    zn = z / np.maximum(np.linalg.norm(z, axis=-1, keepdims=True), 1e-6)
    en = e / np.maximum(np.linalg.norm(e, axis=-1, keepdims=True), 1e-6)
    sims = zn @ en.T / cfg.logit_temp  # [B, T, C]
    tgt = np.asarray(units)
    valid = np.arange(flen)[None, :] < np.asarray(fl)[:, None]
    masked = ((np.arange(flen)[None, :] % 2 == 1) & valid)  # eval-mode mask

    def ce_mean(sel):
        tot, n = 0.0, 0
        for b, t in zip(*np.nonzero(sel)):
            c = tgt[b, t]
            row = sims[b, t]
            # target-first arrangement: CE(row_with_target_first, index 0)
            first = np.concatenate([[row[c]], row])
            first = np.delete(first, 1 + c)
            tot += -first[0] + np.log(np.exp(first).sum())
            n += 1
        return tot / max(n, 1)

    exp_m = ce_mean((tgt >= 0) & masked)
    exp_u = ce_mean((tgt >= 0) & ~masked & valid)
    pen = float(np.mean(np.asarray(feats) ** 2))
    expect = 1.0 * exp_m + 0.5 * exp_u + 10.0 * pen
    np.testing.assert_allclose(float(loss), expect, rtol=2e-4)
    np.testing.assert_allclose(float(stats["loss_m"]), exp_m, rtol=2e-4)
    np.testing.assert_allclose(float(stats["loss_u"]), exp_u, rtol=2e-4)


def test_s2t_prompted_io_and_training():
    cfg = ASRModelConfig(
        vocab_size=20,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=20),
        normalize="utterance_mvn",
        encoder=ConformerConfig(output_size=16, attention_heads=2, linear_units=24,
                                num_blocks=1, use_cnn_module=False),
        decoder=TransformerDecoderConfig(attention_heads=2, linear_units=24, num_blocks=1),
        ctc_weight=0.3,
    )
    model = S2TModel(cfg)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((2, 1600)), jnp.float32)
    slens = jnp.asarray([1600, 900])
    text = jnp.asarray([[3, 4, 5], [6, 7, -1]], jnp.int32)
    tlens = jnp.asarray([3, 2])
    prev = jnp.asarray([[8, 9], [-1, -1]], jnp.int32)
    plens = jnp.asarray([2, 0])
    ctc_text = jnp.asarray([[4, 5, -1], [7, -1, -1]], jnp.int32)
    clens = jnp.asarray([2, 1])

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, slens, text, tlens, prev, plens, ctc_text, clens, deterministic=True,
    )
    # check the prompted IO layout directly
    ids, ys_out, in_lens = model.apply(
        variables, text, tlens, prev, plens, method=model.build_prompted_io
    )
    row0 = list(np.asarray(ids)[0][: int(in_lens[0])])
    assert row0 == [cfg.sos_id, 8, 9, 3, 4, 5]
    out0 = list(np.asarray(ys_out)[0])
    # prompt positions ignored; text positions predict next; final predicts eos
    assert out0[0] == -1 and out0[1] == -1  # sos, prev[0] positions
    assert out0[2] == 3 and out0[3] == 4 and out0[4] == 5
    assert out0[5] == cfg.eos_id
    # row 1 has no prev: [sos, 6, 7]
    row1 = list(np.asarray(ids)[1][: int(in_lens[1])])
    assert row1 == [cfg.sos_id, 6, 7]

    loss, stats, _ = model.apply(
        variables, speech, slens, text, tlens, prev, plens, ctc_text, clens,
        deterministic=True,
    )
    assert np.isfinite(float(loss))
    assert "loss_ctc" in stats and "loss_att" in stats

    g = jax.grad(
        lambda p: model.apply({"params": p}, speech, slens, text, tlens, prev, plens,
                              ctc_text, clens, deterministic=True)[0]
    )(variables["params"])
    total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
