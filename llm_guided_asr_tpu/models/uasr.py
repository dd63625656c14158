"""Unsupervised ASR — wav2vec-U style GAN (espnet2/uasr/ rebuild).

Reference layout (espnet2/uasr/):
  generator/conv_generator.py:37   ConvGenerator — masked batch-norm (weight
      init 30), residual in_proj, dropout, strided conv -> phone logits;
      real sample = one-hot(text).
  discriminator/conv_discriminator.py:25  ConvDiscriminator — causal conv
      stack (emb conv + depth-1 inner + 1-channel head), GELU, mean/max pool
      over valid frames.
  segmenter/{random,join}_segmenter.py   pre-segment subsampling and
      argmax-run collapse of generator logits.
  loss/*.py   discriminator BCE (one-sided smoothing), gradient penalty at
      interpolated samples, smoothness (consecutive-frame MSE), phoneme
      diversity ((C - ppl)/C), auxiliary pseudo-label CE.
  espnet_model.py:126  forward — alternating G/D steps
      (is_discriminative_step = updates % 2), gumbel-softmax with decaying
      temperature.

TPU-first notes: the join segmenter's per-utterance ``unique_consecutive``
loop (espnet_model.py / join_segmenter.py:48-96) becomes a static-shape
segment-mean via one-hot matmul; the gradient penalty's ``autograd.grad``
is a plain ``jax.grad`` of the discriminator w.r.t. its input; the
generator's masked BatchNorm reuses the fused custom-VJP masked batch norm.
Trains through train/gan_trainer.py (two optimizers, alternating steps).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class UASRConfig:
    n_phones: int = 40
    feat_dim: int = 80
    # generator (conv_generator.py defaults; esun-free wav2vec-U recipe uses
    # stride 9 over SSL features — the log-mel default here keeps stride small)
    generator_kernel: int = 4
    generator_dilation: int = 1
    generator_stride: int = 2
    generator_bias: bool = False
    generator_dropout: float = 0.1
    generator_batch_norm: bool = True
    generator_batch_norm_weight: float = 30.0
    generator_residual: bool = True
    # discriminator (conv_discriminator.py defaults)
    discriminator_channels: int = 384
    discriminator_kernel: int = 8
    discriminator_dilation: int = 1
    discriminator_depth: int = 2
    discriminator_linear_emb: bool = False
    discriminator_causal: bool = True
    discriminator_max_pool: bool = False
    discriminator_act_after_linear: bool = False
    discriminator_dropout: float = 0.0
    # segmenter: none | random | join
    segmenter: str = "none"
    segmenter_subsample_rate: float = 0.25
    segmenter_mean_pool_join: bool = False
    segmenter_remove_zeros: bool = False
    # losses (espnet_model.py loss dict weights)
    discriminator_loss_weight: float = 1.0
    gradient_penalty_weight: float = 1.0
    smoothness_weight: float = 0.5
    diversity_weight: float = 0.3
    pseudo_label_weight: float = 0.0
    pseudo_label_dim: int = 64
    pseudo_label_downsample: int = 2
    smoothing: float = 0.0
    smoothing_one_sided: bool = False
    # gumbel sampling of the generator distribution (espnet_model.py:183-191)
    use_gumbel: bool = False
    use_hard_gumbel: bool = True
    min_temperature: float = 0.1
    max_temperature: float = 2.0
    decay_temperature: float = 0.99995


class ConvGenerator(nn.Module):
    """conv_generator.py:37 — BN + residual in_proj + strided conv head.

    Returns (logits [B,T',P], inter_x [B,T,F] or None, out_lengths [B]).
    """

    cfg: UASRConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, feats_lengths: jnp.ndarray,
                 deterministic: bool = True,
                 bn_use_running: Optional[bool] = None):
        """``bn_use_running=False`` with ``deterministic=True`` gives
        dropout-free inference on batch statistics (running stats are not
        carried through the two-optimizer gan loop)."""
        cfg = self.cfg
        valid = make_valid_mask(feats_lengths, feats.shape[1])
        if cfg.generator_batch_norm:
            # bn_padded_data (conv_generator.py:156-161): normalize valid
            # frames only, leave pads untouched; weight init 30
            from llm_guided_asr_tpu.models.conformer import MaskedBatchNorm

            normed = MaskedBatchNorm(
                dtype=self.dtype, name="bn",
                scale_init=lambda k, s: jnp.full(
                    s, cfg.generator_batch_norm_weight, jnp.float32
                ),
            )(feats, valid,
              use_running_average=deterministic
              if bn_use_running is None else bn_use_running)
            feats = jnp.where(valid[..., None], normed, feats)
        inter_x = None
        if cfg.generator_residual:
            inter_x = nn.Dense(feats.shape[-1], dtype=self.dtype, name="in_proj")(
                nn.Dropout(cfg.generator_dropout, deterministic=deterministic)(feats)
            )
            feats = feats + inter_x
        feats = nn.Dropout(cfg.generator_dropout, deterministic=deterministic)(feats)
        logits = nn.Conv(
            cfg.n_phones, (cfg.generator_kernel,),
            strides=(cfg.generator_stride,),
            kernel_dilation=(cfg.generator_dilation,),
            padding=[(cfg.generator_kernel // 2,) * 2],
            use_bias=cfg.generator_bias, dtype=self.dtype, name="proj",
        )(feats)
        out_lens = (feats_lengths + cfg.generator_stride - 1) // cfg.generator_stride
        out_lens = jnp.minimum(out_lens, logits.shape[1])
        return logits, inter_x, out_lens


class ConvDiscriminator(nn.Module):
    """conv_discriminator.py:25 — causal conv stack -> pooled realness score."""

    cfg: UASRConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray,
                 deterministic: bool = True):
        cfg = self.cfg
        k, d = cfg.discriminator_kernel, cfg.discriminator_dilation
        causal = cfg.discriminator_causal
        # torch does symmetric pad then SamePad-trims the tail; CAUSAL padding
        # in flax is the same receptive field
        pad = "CAUSAL" if causal else "SAME"
        drop = nn.Dropout(cfg.discriminator_dropout, deterministic=deterministic)
        if cfg.discriminator_linear_emb:
            h = nn.Conv(cfg.discriminator_channels, (1,), dtype=self.dtype,
                        name="emb")(x)
        else:
            h = nn.Conv(cfg.discriminator_channels, (k,), kernel_dilation=(d,),
                        padding=pad, dtype=self.dtype, name="emb")(x)
        if cfg.discriminator_act_after_linear:
            h = jax.nn.gelu(h)
        h = drop(h)
        for i in range(cfg.discriminator_depth - 1):
            h = nn.Conv(cfg.discriminator_channels, (k,), kernel_dilation=(d,),
                        padding=pad, dtype=self.dtype, name=f"inner{i}")(h)
            h = drop(h)
            h = jax.nn.gelu(h)
        h = nn.Conv(1, (k,), padding=pad, dtype=self.dtype, name="head")(h)[..., 0]
        valid = make_valid_mask(lengths, h.shape[1])
        if cfg.discriminator_max_pool:
            return jnp.max(jnp.where(valid, h, -jnp.inf), axis=1)
        tot = jnp.sum(jnp.where(valid, h, 0.0), axis=1)
        return tot / jnp.maximum(lengths.astype(h.dtype), 1)


# ---------------------------------------------------------------------------
# segmenters (segmenter/{random,join}_segmenter.py)
# ---------------------------------------------------------------------------
def random_pre_segment(rng, feats, lengths, subsample_rate: float):
    """random_segmenter.py:22-33 — keep a sorted random subset of frames."""
    t = feats.shape[1]
    target = max(1, int(-(-t * subsample_rate // 1)))  # ceil
    # sorted random subset per row: top-target of random keys, sorted
    keys = jax.random.uniform(rng, (feats.shape[0], t))
    _, idx = jax.lax.top_k(keys, target)
    idx = jnp.sort(idx, axis=-1)
    picked = jnp.take_along_axis(feats, idx[..., None], axis=1)
    # new length = number of picked indices < old length
    new_len = jnp.sum(idx < lengths[:, None], axis=1)
    return picked, new_len


def join_logit_segment(logits, lengths, mean_pool_join: bool = True,
                       remove_zeros: bool = False, rng=None):
    """join_segmenter.py:43-96 — collapse consecutive identical argmax runs.

    TPU-native: instead of per-utterance ``unique_consecutive`` + index_add
    loops, build the run-id per frame (cumsum of boundaries) and segment-mean
    via a one-hot matmul — static [B, T, P] in / [B, T, P] out with new
    lengths = run count (tail zero-padded like the reference's new_pad).

    mean_pool_join=True mirrors the reference's eval path; the training
    random-frame pick (join_segmenter.py:74-79) is approximated by gumbel
    segment-argmax when ``rng`` is given.
    """
    b, t, p = logits.shape
    preds = jnp.argmax(logits, -1)
    valid = make_valid_mask(lengths, t)
    boundary = jnp.concatenate(
        [jnp.ones((b, 1), bool), preds[:, 1:] != preds[:, :-1]], axis=1
    )
    boundary = jnp.logical_and(boundary, valid)
    seg_id = jnp.cumsum(boundary.astype(jnp.int32), axis=1) - 1  # [B, T]
    n_seg = jnp.maximum(jnp.max(jnp.where(valid, seg_id, -1), axis=1) + 1, 0)
    onehot = jax.nn.one_hot(jnp.where(valid, seg_id, t), t, dtype=logits.dtype)
    # [B, T_seg, T_frame] selector
    sel = jnp.swapaxes(onehot, 1, 2)
    if mean_pool_join or rng is None:
        counts = jnp.sum(sel, axis=-1, keepdims=True)
        pooled = jnp.einsum("bst,btp->bsp", sel, logits) / jnp.maximum(counts, 1.0)
    else:
        # random pick within each run: gumbel-max over frames of the run
        g = jax.random.gumbel(rng, (b, 1, t))
        pick = jnp.where(sel > 0, g, -jnp.inf)
        hard = jax.nn.one_hot(jnp.argmax(pick, -1), t, dtype=logits.dtype)
        hard = jnp.where(jnp.any(sel > 0, -1, keepdims=True), hard, 0.0)
        pooled = jnp.einsum("bst,btp->bsp", hard, logits)
    if remove_zeros:
        # drop segments whose phone is 0 (<SIL> analog): compact left
        seg_phone = jnp.argmax(pooled, -1)
        seg_valid = jnp.logical_and(
            jnp.arange(t)[None] < n_seg[:, None], seg_phone != 0
        )
        order = jnp.argsort(~seg_valid, axis=1, stable=True)
        pooled = jnp.take_along_axis(pooled, order[..., None], axis=1)
        n_seg = jnp.sum(seg_valid, axis=1)
    pooled = jnp.where((jnp.arange(t)[None] < n_seg[:, None])[..., None], pooled, 0.0)
    return pooled, n_seg


# ---------------------------------------------------------------------------
# losses (loss/*.py)
# ---------------------------------------------------------------------------
def _bce_logits(z, target):
    # sum-reduced binary_cross_entropy_with_logits
    return jnp.sum(jnp.maximum(z, 0) - z * target + jnp.log1p(jnp.exp(-jnp.abs(z))))


def discriminator_loss(fake_scores, real_scores, is_d_step: bool,
                       smoothing: float = 0.0, one_sided: bool = False):
    """discriminator_loss.py:26-66.  D step: fake->1, real->0 (the reference
    labels generated samples 1); G step: fake->0 (non-saturating flip)."""
    fake_smooth = 0.0 if one_sided else smoothing
    if is_d_step:
        return (_bce_logits(fake_scores, 1.0 - fake_smooth),
                _bce_logits(real_scores, smoothing))
    return _bce_logits(fake_scores, fake_smooth), None


def gradient_penalty(d_apply, d_params, fake, real, rng):
    """gradient_penalty.py:29-89 — ||dD/dx at alpha*real+(1-alpha)*fake|| -> 1.

    jax.grad replaces autograd.grad(create_graph=True); the penalty itself is
    differentiated by the outer D-step grad, XLA builds the 2nd-order graph.
    """
    bsz = min(fake.shape[0], real.shape[0])
    t = min(fake.shape[1], real.shape[1])
    fake = fake[:bsz, :t]
    real = real[:bsz, :t].astype(fake.dtype)
    alpha = jax.random.uniform(rng, (bsz, 1, 1), dtype=fake.dtype)
    inter = alpha * real + (1.0 - alpha) * fake

    def d_sum(x):
        lens = jnp.full((bsz,), t, jnp.int32)
        return jnp.sum(d_apply(d_params, x, lens))

    grads = jax.grad(d_sum)(inter)  # [B, T, P]
    gnorm = jnp.sqrt(jnp.sum(grads.astype(jnp.float32) ** 2, axis=1) + 1e-12)
    return jnp.sum((gnorm - 1.0) ** 2)


def smoothness_penalty(logits, lengths, sample_size: int):
    """smoothness_penalty.py:23-46 — masked consecutive-frame MSE."""
    diff = (logits[:, 1:] - logits[:, :-1]) ** 2
    valid = make_valid_mask(lengths, logits.shape[1])[:, 1:]
    diff = jnp.where(valid[..., None], diff, 0.0)
    return jnp.sum(diff) / diff.size * sample_size


def phoneme_diversity_loss(logits, lengths, sample_size: int):
    """phoneme_diversity_loss.py:21-45 — (C - softmax ppl)/C * batch.

    The reference averages softmax over ALL B*T positions including pads;
    here pads are excluded (the masked mean is the intended statistic)."""
    c = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1)
    valid = make_valid_mask(lengths, logits.shape[1])[..., None]
    avg = jnp.sum(jnp.where(valid, probs, 0.0), (0, 1)) / jnp.maximum(
        jnp.sum(valid), 1.0
    )
    ppl = jnp.exp(-jnp.sum(avg * jnp.log(avg + 1e-7)))
    return (c - ppl) / c * sample_size


def pseudo_label_loss(decoder_apply, decoder_params, inter_x, pseudo_labels,
                      downsample: int, ignore_index: int = -1):
    """pseudo_label_loss.py:34-60 — aux CE from the generator's residual
    branch against k-means/HMM pseudo labels."""
    out = decoder_apply(decoder_params, inter_x)
    labels = pseudo_labels[:, ::downsample]
    t = min(labels.shape[1], out.shape[1])
    out, labels = out[:, :t], labels[:, :t]
    logp = jax.nn.log_softmax(out.astype(jnp.float32), -1)
    keep = labels != ignore_index
    nll = -jnp.take_along_axis(
        logp, jnp.maximum(labels, 0)[..., None], axis=-1
    )[..., 0]
    nll = jnp.where(keep, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(keep), 1) * out.shape[0]


def gumbel_temperature(step, max_t: float, min_t: float, decay: float):
    """espnet_model.py:426-430 temperature schedule."""
    return jnp.maximum(max_t * decay ** step.astype(jnp.float32), min_t)


def sample_generator_output(rng, logits, temperature, hard: bool = True):
    """F.gumbel_softmax(tau=curr_temp, hard=...) (espnet_model.py:184-189)."""
    g = jax.random.gumbel(rng, logits.shape)
    y = jax.nn.softmax((logits + g) / temperature, -1)
    if hard:
        oh = jax.nn.one_hot(jnp.argmax(y, -1), logits.shape[-1], dtype=y.dtype)
        y = oh + y - jax.lax.stop_gradient(y)  # straight-through
    return y


def one_hot_real_sample(text, n_phones: int, pad_id: int = -1):
    """conv_generator.py:147-152 — one-hot unpaired text as the real sample."""
    real = jax.nn.one_hot(jnp.maximum(text, 0), n_phones)
    return jnp.where((text == pad_id)[..., None], 0.0, real)
