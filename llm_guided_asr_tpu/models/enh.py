"""Speech enhancement / separation (espnet2/enh/ minimal-but-real rebuild).

Components mirroring the reference structure (enh/espnet_model.py,
encoder/stft_encoder.py, separator/{rnn,tcn}_separator.py,
decoder/stft_decoder.py, loss wrappers with SI-SNR and PIT):

- STFTEncoder/STFTDecoder: complex STFT <-> waveform (ops/frontend stft/istft);
- RNNSeparator: BLSTM over frames emitting one T-F mask per source;
- TCNSeparator: dilated depthwise-conv stack (Conv-TasNet style) over frames;
- si_snr loss (scale-invariant SNR) + PIT wrapper (permutation-invariant
  training, espnet2/enh/loss/wrappers/pit_solver.py) — all sources evaluated
  under every permutation on device, best permutation chosen per utterance;
- ESPnetEnhancementModel: forward(mix, lens, ref1..refN) -> (loss, stats, B).
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.ops.frontend import istft, stft, stft_out_lengths
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class EnhConfig:
    num_spk: int = 2
    n_fft: int = 512
    hop_length: int = 128
    separator_type: str = "rnn"  # rnn | tcn
    hidden: int = 256
    layers: int = 3
    kernel_size: int = 3
    mask_nonlinear: str = "relu"  # relu | sigmoid

    @classmethod
    def from_dict(cls, d: dict) -> "EnhConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


class RNNSeparator(nn.Module):
    """BLSTM masking separator (enh/separator/rnn_separator.py)."""

    cfg: EnhConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """[B, T, F] magnitude -> [num_spk, B, T, F] masks."""
        cfg = self.cfg
        x = feat
        for i in range(cfg.layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(cfg.hidden), name=f"lstm_f{i}")(x)
            bwd = nn.RNN(
                nn.OptimizedLSTMCell(cfg.hidden), reverse=True,
                keep_order=True, name=f"lstm_b{i}",
            )(x)
            x = jnp.concatenate([fwd, bwd], axis=-1)
        masks = nn.Dense(feat.shape[-1] * cfg.num_spk, dtype=self.dtype, name="mask")(x)
        masks = masks.reshape(*feat.shape[:-1], cfg.num_spk, feat.shape[-1])
        masks = jnp.moveaxis(masks, -2, 0)  # [S, B, T, F]
        if cfg.mask_nonlinear == "sigmoid":
            return jax.nn.sigmoid(masks)
        return jax.nn.relu(masks)


class TCNSeparator(nn.Module):
    """Dilated conv masking separator (enh/separator/tcn_separator.py lite)."""

    cfg: EnhConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        x = nn.Dense(cfg.hidden, dtype=self.dtype, name="in_proj")(feat)
        for i in range(cfg.layers):
            h = nn.LayerNorm(dtype=self.dtype, name=f"ln_{i}")(x)
            h = nn.Conv(
                cfg.hidden, (cfg.kernel_size,), kernel_dilation=(2**i,),
                padding="SAME", dtype=self.dtype, name=f"conv_{i}",
            )(h)
            x = x + jax.nn.relu(h)
        masks = nn.Dense(feat.shape[-1] * cfg.num_spk, dtype=self.dtype, name="mask")(x)
        masks = masks.reshape(*feat.shape[:-1], cfg.num_spk, feat.shape[-1])
        masks = jnp.moveaxis(masks, -2, 0)
        if cfg.mask_nonlinear == "sigmoid":
            return jax.nn.sigmoid(masks)
        return jax.nn.relu(masks)


def si_snr(ref: jnp.ndarray, est: jnp.ndarray, lengths: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Scale-invariant SNR per example [B] (enh/loss/criterions/time_domain.py)."""
    valid = make_valid_mask(lengths, ref.shape[1]).astype(ref.dtype)
    n = jnp.maximum(lengths.astype(ref.dtype), 1.0)[:, None]
    ref = (ref - jnp.sum(ref * valid, 1, keepdims=True) / n) * valid
    est = (est - jnp.sum(est * valid, 1, keepdims=True) / n) * valid
    dot = jnp.sum(ref * est, axis=1, keepdims=True)
    energy = jnp.sum(ref * ref, axis=1, keepdims=True) + eps
    target = dot / energy * ref
    noise = est - target
    ratio = (jnp.sum(target**2, 1) + eps) / (jnp.sum(noise**2, 1) + eps)
    return 10.0 * jnp.log10(ratio)


def pit_si_snr_loss(
    refs: jnp.ndarray,  # [S, B, N]
    ests: jnp.ndarray,  # [S, B, N]
    lengths: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """PIT: best permutation per utterance; returns (loss scalar, perm [B, S])."""
    s = refs.shape[0]
    perms = list(itertools.permutations(range(s)))
    scores = []  # [P, B] mean si-snr under each permutation
    for perm in perms:
        snr = jnp.stack(
            [si_snr(refs[i], ests[perm[i]], lengths) for i in range(s)], axis=0
        )  # [S, B]
        scores.append(jnp.mean(snr, axis=0))
    scores = jnp.stack(scores, axis=0)  # [P, B]
    best = jnp.argmax(scores, axis=0)  # [B]
    best_score = jnp.max(scores, axis=0)
    perm_arr = jnp.asarray(perms)[best]  # [B, S]
    return -jnp.mean(best_score), perm_arr


class ESPnetEnhancementModel(nn.Module):
    """enh/espnet_model.py analog: STFT -> mask -> iSTFT, PIT SI-SNR loss."""

    cfg: EnhConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        sep_cls = RNNSeparator if self.cfg.separator_type == "rnn" else TCNSeparator
        self.separator = sep_cls(self.cfg, dtype=self.dtype, name="separator")

    def separate(
        self, speech_mix: jnp.ndarray, speech_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[B, N] mixture -> ([S, B, N] estimates, frame lengths)."""
        cfg = self.cfg
        spec = stft(speech_mix, n_fft=cfg.n_fft, hop_length=cfg.hop_length)  # [B,T,F]
        mag = jnp.abs(spec)
        masks = self.separator(mag.astype(self.dtype), deterministic)  # [S,B,T,F]
        ests = []
        for i in range(cfg.num_spk):
            est_spec = spec * masks[i].astype(spec.dtype)
            wav = istft(
                est_spec, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
                length=speech_mix.shape[1],
            )
            ests.append(wav)
        olens = stft_out_lengths(speech_lengths, cfg.n_fft, cfg.hop_length)
        return jnp.stack(ests, axis=0), olens

    def collect_feats(self, speech_mix, speech_lengths):
        return {"feats": speech_mix, "feats_lengths": speech_lengths}

    def __call__(
        self,
        speech_mix: jnp.ndarray,  # [B, N]
        speech_mix_lengths: jnp.ndarray,
        *refs: jnp.ndarray,  # S tensors [B, N] (speech_ref1..refS)
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        ests, _ = self.separate(speech_mix, speech_mix_lengths, deterministic)
        refs_arr = jnp.stack(refs, axis=0)  # [S, B, N]
        loss, perm = pit_si_snr_loss(refs_arr, ests, speech_mix_lengths)
        stats = {"loss": loss, "si_snr": -loss}
        return loss, stats, jnp.asarray(speech_mix.shape[0], jnp.float32)
