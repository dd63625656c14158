"""Loss functions: CTC, label-smoothing KL, accuracy.

Rebuilds of espnet2/asr/ctc.py:9 (ctc_type='builtin' path: sum-reduced
torch.nn.CTCLoss divided by batch size) and
espnet/nets/pytorch_backend/transformer/label_smoothing_loss.py
(KL between smoothed one-hot and log-probs, denominated by batch size or by
token count), plus nets_utils.th_accuracy.

All reductions run in f32 islands regardless of the activation dtype so that
bf16 training keeps stable loss scales.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from llm_guided_asr_tpu.utils.masks import make_valid_mask


def ctc_loss_per_example(
    logits: jnp.ndarray,  # [B, T, V] pre-softmax
    logit_lengths: jnp.ndarray,  # [B]
    labels: jnp.ndarray,  # [B, N] padded with any value beyond length
    label_lengths: jnp.ndarray,  # [B]
    blank_id: int = 0,
    time_risk: float = 0.0,
) -> jnp.ndarray:
    """Per-example CTC negative log-likelihood [B] (non-finite -> 0).

    Uses the forward-backward custom-VJP kernel (ops/ctc_fb.py): the exact
    Graves gradient (softmax - posterior) instead of autodiff through the
    alpha scan, which measured as ~half the whole train-step cost on TPU.
    """
    from llm_guided_asr_tpu.ops.ctc_fb import ctc_loss_fb

    label_valid = make_valid_mask(label_lengths, labels.shape[1])
    labels = jnp.where(label_valid, labels, 0)
    per_ex = ctc_loss_fb(logits, logit_lengths, labels, label_lengths,
                         blank_id=blank_id, time_risk=time_risk)
    # zero_infinity analog (ctc.py:93-130): drop non-finite examples
    return jnp.where(jnp.isfinite(per_ex), per_ex, 0.0)


def ctc_loss(
    logits: jnp.ndarray,  # [B, T, V] pre-softmax
    logit_lengths: jnp.ndarray,  # [B]
    labels: jnp.ndarray,  # [B, N] padded with any value beyond length
    label_lengths: jnp.ndarray,  # [B]
    blank_id: int = 0,
    time_risk: float = 0.0,
) -> jnp.ndarray:
    """Batch-mean CTC loss (matches reference 'builtin': sum over batch / B).

    time_risk > 0 = Bayes-risk delay-penalized variant (ctc_type brctc,
    espnet2/asr/bayes_risk_ctc.py analog without k2)."""
    per_ex = ctc_loss_per_example(logits, logit_lengths, labels, label_lengths,
                                  blank_id=blank_id, time_risk=time_risk)
    return jnp.sum(per_ex) / logits.shape[0]


def label_smoothing_loss(
    logits: jnp.ndarray,  # [B, L, V]
    targets: jnp.ndarray,  # [B, L] with ignore_id at pads
    smoothing: float = 0.0,
    ignore_id: int = -1,
    normalize_length: bool = False,
) -> jnp.ndarray:
    """KL(smoothed one-hot || softmax(logits)), reference reduction semantics."""
    b, l, v = logits.shape
    valid = targets != ignore_id
    tgt = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    confidence = 1.0 - smoothing
    low = smoothing / (v - 1)
    # KL = sum_c p_c (log p_c - logq_c); the log p_c entropy term is constant
    # but the reference includes it (torch KLDivLoss), so include it too.
    tgt_logp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    sum_logp = jnp.sum(logp, axis=-1)
    cross = -(confidence * tgt_logp + low * (sum_logp - tgt_logp))
    ent = confidence * jnp.log(jnp.maximum(confidence, 1e-20)) + (v - 1) * low * jnp.log(
        jnp.maximum(low, 1e-20)
    )
    kl = cross + ent
    kl = jnp.where(valid, kl, 0.0)
    denom = jnp.sum(valid) if normalize_length else jnp.asarray(b, jnp.float32)
    return jnp.sum(kl) / jnp.maximum(denom, 1.0)


def accuracy(
    logits: jnp.ndarray, targets: jnp.ndarray, ignore_id: int = -1
) -> jnp.ndarray:
    """Token accuracy over non-ignored targets (nets_utils.th_accuracy)."""
    pred = jnp.argmax(logits, axis=-1)
    valid = targets != ignore_id
    correct = jnp.sum((pred == targets) & valid)
    return correct / jnp.maximum(jnp.sum(valid), 1)


def add_sos_eos(
    text: jnp.ndarray,  # [B, L] padded with ignore_id
    text_lengths: jnp.ndarray,  # [B]
    sos: int,
    eos: int,
    ignore_id: int = -1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static-shape add_sos_eos (transformer/add_sos_eos.py, pad_input_with_eos=False).

    Returns (ys_in [B, L+1] = [sos, y..., 0-pad], ys_out [B, L+1] = [y..., eos,
    ignore-pad]).  ys_in pads are zeros — they are never attended because the
    decoder masks by ys_in_lengths = text_lengths + 1.
    """
    b, l = text.shape
    valid = make_valid_mask(text_lengths, l)
    clean = jnp.where(valid, text, 0)
    ys_in = jnp.concatenate([jnp.full((b, 1), sos, text.dtype), clean], axis=1)
    pos = jnp.arange(l + 1)[None, :]
    ys_out = jnp.concatenate([clean, jnp.zeros((b, 1), text.dtype)], axis=1)
    ys_out = jnp.where(pos == text_lengths[:, None], eos, ys_out)
    ys_out = jnp.where(pos > text_lengths[:, None], ignore_id, ys_out)
    return ys_in, ys_out
