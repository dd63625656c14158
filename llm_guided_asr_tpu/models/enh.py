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
    # rnn | conformer | tcn | dprnn | skim | tfgridnet
    # | transformer | dptnet | bsrnn | dccrn | dpcl   (models/enh_extra.py)
    separator_type: str = "rnn"
    hidden: int = 256
    layers: int = 3
    kernel_size: int = 3
    mask_nonlinear: str = "relu"  # relu | sigmoid
    # dual-path separators (dprnn/skim/dptnet): frames per chunk/segment
    chunk_size: int = 25
    # tfgridnet: embedding channels + full-band attention heads
    tf_channels: int = 16
    attn_heads: int = 2
    # bsrnn: number of frequency bands
    num_bands: int = 8
    # dpcl / dan: T-F embedding dimension
    emb_dim: int = 20
    # svoice: conv frame-encoder kernel (waveform samples per frame)
    svoice_kernel: int = 8
    # fasnet: beamforming window + context samples
    fasnet_win: int = 256
    fasnet_context: int = 64
    # uses: frames per segment + carried memory-token count
    uses_segment: int = 64
    memory_size: int = 4
    # tfgridnet v2/v3: sub-band unfold kernel/hop, attention q/k channels
    emb_ks: int = 4
    emb_hs: int = 4
    attn_approx_qk_dim: int = 512  # v2: total q/k dim target across freq
    attn_qk_channels: int = 4      # v3: fixed per-head q/k channels
    # ineube: output stage + Wiener-filter context chunks
    output_from: str = "dnn2"  # dnn1 | mfmcwf | dnn2
    n_chunks: int = 1
    # neural_beamformer: WPE dereverberation front
    use_wpe: bool = False
    taps: int = 3
    delay: int = 2
    # training criterion + assignment solver (models/enh_losses.py;
    # reference enh/loss/criterions + enh/loss/wrappers)
    loss_type: str = "si_snr"  # si_snr|snr|ci_sdr|mse_time|l1_time|mse_spec|...
    loss_wrapper: str = "pit"  # pit | fixed_order | mixit

    @classmethod
    def from_dict(cls, d: dict) -> "EnhConfig":
        from llm_guided_asr_tpu.utils.config import filter_known_fields

        return cls(**filter_known_fields(cls, d, "enh_conf"))


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


class ConformerSeparator(nn.Module):
    """Conformer masking separator (enh/separator/conformer_separator.py):
    conformer blocks over the magnitude spectrogram emit one T-F mask per
    speaker."""

    cfg: EnhConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        from llm_guided_asr_tpu.models.conformer import ConformerBlock, ConformerConfig
        from llm_guided_asr_tpu.models.transformer import RelPositionalEncoding

        cfg = self.cfg
        ccfg = ConformerConfig(
            output_size=cfg.hidden, attention_heads=4,
            linear_units=cfg.hidden * 4, num_blocks=cfg.layers,
            macaron_style=True, use_cnn_module=True, cnn_module_kernel=15,
            cnn_module_norm="layer_norm",  # stateless (no batch_stats plumbing)
            dropout_rate=0.0, positional_dropout_rate=0.0,
        )
        x = nn.Dense(cfg.hidden, dtype=self.dtype, name="in_proj")(feat)
        x, pos_emb = RelPositionalEncoding(0.0, dtype=self.dtype,
                                           name="pos_enc")(x, deterministic)
        valid = jnp.ones(x.shape[:2], bool)
        for i in range(cfg.layers):
            x = ConformerBlock(ccfg, dtype=self.dtype, name=f"block_{i}")(
                x, pos_emb, valid, deterministic
            )
        masks = nn.Dense(feat.shape[-1] * cfg.num_spk, dtype=self.dtype,
                         name="mask")(x)
        masks = masks.reshape(*feat.shape[:-1], cfg.num_spk, feat.shape[-1])
        masks = jnp.moveaxis(masks, -2, 0)
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


def _bilstm(x: jnp.ndarray, hidden: int, name: str) -> jnp.ndarray:
    """[..., L, D] -> [..., L, 2*hidden] bidirectional LSTM over the -2 axis."""
    fwd = nn.RNN(nn.OptimizedLSTMCell(hidden), name=f"{name}_f")(x)
    bwd = nn.RNN(nn.OptimizedLSTMCell(hidden), reverse=True, keep_order=True,
                 name=f"{name}_b")(x)
    return jnp.concatenate([fwd, bwd], axis=-1)


def _segment(x: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, int]:
    """[B, T, D] -> ([B, n, k, D] half-overlapping chunks, original T)."""
    b, t, d = x.shape
    hop = k // 2
    n = max(-(-(t - k) // hop) + 1, 1) if t > k else 1
    pad = (n - 1) * hop + k - t
    x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    idx = jnp.arange(n)[:, None] * hop + jnp.arange(k)[None, :]
    return x[:, idx], t


def _merge(chunks: jnp.ndarray, t: int, k: int) -> jnp.ndarray:
    """Overlap-add inverse of :func:`_segment` -> [B, T, D]."""
    b, n, _, d = chunks.shape
    hop = k // 2
    total = (n - 1) * hop + k
    out = jnp.zeros((b, total, d))
    norm = jnp.zeros((total,))
    idx = (jnp.arange(n)[:, None] * hop + jnp.arange(k)[None, :]).reshape(-1)
    out = out.at[:, idx].add(chunks.reshape(b, -1, d))
    norm = norm.at[idx].add(1.0)
    return (out / jnp.maximum(norm, 1.0)[None, :, None])[:, :t]


class DPRNNSeparator(nn.Module):
    """Dual-path RNN masking separator (enh/separator/dprnn_separator.py):
    alternating intra-chunk and inter-chunk BiLSTMs over half-overlapping
    chunks (Luo et al. 2020)."""

    cfg: EnhConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        d = cfg.hidden
        x = nn.Dense(d, dtype=self.dtype, name="in_proj")(feat)
        chunks, t = _segment(x, cfg.chunk_size)  # [B, n, K, D]
        b, n, k, _ = chunks.shape
        for i in range(cfg.layers):
            # intra-chunk: sequence axis = K, batch = B*n
            h = _bilstm(chunks.reshape(b * n, k, d), d // 2, f"intra_{i}")
            h = nn.Dense(d, dtype=self.dtype, name=f"intra_proj_{i}")(h)
            chunks = nn.LayerNorm(name=f"intra_ln_{i}")(chunks + h.reshape(b, n, k, d))
            # inter-chunk: sequence axis = n, batch = B*K
            y = jnp.moveaxis(chunks, 1, 2).reshape(b * k, n, d)
            h = _bilstm(y, d // 2, f"inter_{i}")
            h = nn.Dense(d, dtype=self.dtype, name=f"inter_proj_{i}")(h)
            y = nn.LayerNorm(name=f"inter_ln_{i}")(y + h)
            chunks = jnp.moveaxis(y.reshape(b, k, n, d), 1, 2)
        x = _merge(chunks, t, cfg.chunk_size)
        x = jax.nn.relu(x)
        masks = nn.Dense(feat.shape[-1] * cfg.num_spk, dtype=self.dtype, name="mask")(x)
        masks = masks.reshape(*feat.shape[:-1], cfg.num_spk, feat.shape[-1])
        masks = jnp.moveaxis(masks, -2, 0)
        if cfg.mask_nonlinear == "sigmoid":
            return jax.nn.sigmoid(masks)
        return jax.nn.relu(masks)


class SkiMSeparator(nn.Module):
    """Skipping-memory LSTM separator (enh/separator/skim_separator.py):
    local segment LSTMs whose boundary states are carried across segments by
    a memory LSTM (Li et al. 2022) — linear-time alternative to DPRNN."""

    cfg: EnhConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        d = cfg.hidden
        k = cfg.chunk_size
        x = nn.Dense(d, dtype=self.dtype, name="in_proj")(feat)
        b, t, _ = x.shape
        n = -(-t // k)
        x = jnp.pad(x, ((0, 0), (0, n * k - t), (0, 0)))
        segs = x.reshape(b, n, k, d)
        for i in range(cfg.layers):
            cell = nn.OptimizedLSTMCell(d, name=f"seg_lstm_{i}")
            mem_cell = nn.OptimizedLSTMCell(d, name=f"mem_lstm_{i}")
            rnn = nn.RNN(cell, return_carry=True, name=f"seg_rnn_{i}")
            outs = []
            carry = cell.initialize_carry(jax.random.PRNGKey(0), (b, d))
            mem_carry = mem_cell.initialize_carry(jax.random.PRNGKey(0), (b, d))
            for j in range(n):  # segment chain (static unroll over segments)
                carry, seg_out = rnn(segs[:, j], initial_carry=carry)
                outs.append(seg_out)
                # memory LSTM transforms the boundary hidden state into the
                # next segment's initial state ("skipping" the details)
                mem_carry, mem_h = mem_cell(mem_carry, carry[1])
                carry = (carry[0], mem_h)
            h = jnp.stack(outs, axis=1)  # [B, n, k, D]
            h = nn.Dense(d, dtype=self.dtype, name=f"proj_{i}")(h)
            segs = nn.LayerNorm(name=f"ln_{i}")(segs + h)
        x = segs.reshape(b, n * k, d)[:, :t]
        masks = nn.Dense(feat.shape[-1] * cfg.num_spk, dtype=self.dtype, name="mask")(x)
        masks = masks.reshape(*feat.shape[:-1], cfg.num_spk, feat.shape[-1])
        masks = jnp.moveaxis(masks, -2, 0)
        if cfg.mask_nonlinear == "sigmoid":
            return jax.nn.sigmoid(masks)
        return jax.nn.relu(masks)


class TFGridNetSeparator(nn.Module):
    """TF-GridNet (enh/separator/tfgridnet_separator.py, Wang et al. 2023):
    gridded intra-frame (frequency) BiLSTM, sub-band temporal BiLSTM, and
    full-band frame self-attention over the complex spectrogram; estimates
    the complex spectrum of each source directly (no mask)."""

    cfg: EnhConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, spec: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """[B, T, F] complex mixture -> [S, B, T, F] complex estimates."""
        cfg = self.cfg
        d = cfg.tf_channels
        b, t, f = spec.shape
        x = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)  # [B,T,F,2]
        x = nn.Conv(d, (3, 3), padding="SAME", dtype=self.dtype, name="embed")(x)
        for i in range(cfg.layers):
            # intra-frame: BiLSTM across frequency per frame
            h = nn.LayerNorm(name=f"freq_ln_{i}")(x)
            h = _bilstm(h.reshape(b * t, f, d), d // 2, f"freq_lstm_{i}")
            h = nn.Dense(d, dtype=self.dtype, name=f"freq_proj_{i}")(h)
            x = x + h.reshape(b, t, f, d)
            # sub-band: BiLSTM across time per frequency
            h = nn.LayerNorm(name=f"time_ln_{i}")(x)
            h = jnp.moveaxis(h, 2, 1).reshape(b * f, t, d)
            h = _bilstm(h, d // 2, f"time_lstm_{i}")
            h = nn.Dense(d, dtype=self.dtype, name=f"time_proj_{i}")(h)
            x = x + jnp.moveaxis(h.reshape(b, f, t, d), 1, 2)
            # full-band self-attention across frames
            frames = nn.LayerNorm(name=f"attn_ln_{i}")(x).reshape(b, t, f * d)
            e = max(d, 8) * cfg.attn_heads
            q = nn.Dense(e, dtype=self.dtype, name=f"q_{i}")(frames)
            kk = nn.Dense(e, dtype=self.dtype, name=f"k_{i}")(frames)
            v = nn.Dense(e, dtype=self.dtype, name=f"v_{i}")(frames)
            hh = cfg.attn_heads
            hd = e // hh
            q = q.reshape(b, t, hh, hd)
            kk = kk.reshape(b, t, hh, hd)
            v = v.reshape(b, t, hh, hd)
            att = jax.nn.softmax(
                (jnp.einsum("bqhd,bkhd->bhqk", q, kk) / (hd ** 0.5)).astype(jnp.float32),
                axis=-1,
            ).astype(self.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, t, e)
            o = nn.Dense(f * d, dtype=self.dtype, name=f"attn_out_{i}")(o)
            x = x + o.reshape(b, t, f, d)
        out = nn.Conv(2 * cfg.num_spk, (3, 3), padding="SAME", dtype=self.dtype,
                      name="deconv")(x)  # [B, T, F, 2S]
        out = out.reshape(b, t, f, cfg.num_spk, 2)
        est = out[..., 0] + 1j * out[..., 1]  # [B, T, F, S]
        return jnp.moveaxis(est, -1, 0)  # [S, B, T, F]


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


class TSEExtractor(nn.Module):
    """Target-speaker extraction (enh/espnet_model_tse.py + extractor/
    td_speakerbeam_extractor.py analog): an enrollment utterance is encoded
    into a speaker embedding that conditions the mask estimator
    (multiplicative FiLM-style fusion per frame)."""

    cfg: EnhConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, enroll_feat, enroll_valid, deterministic=True):
        """([B,T,F] mixture mag, [B,Te,F] enrollment mag) -> [B,T,F] mask."""
        cfg = self.cfg
        # speaker embedding: conv stack + masked mean pool
        e = enroll_feat
        for i in range(2):
            e = nn.Conv(cfg.hidden, (3,), padding="SAME", dtype=self.dtype,
                        name=f"spk_conv_{i}")(e)
            e = jax.nn.relu(nn.LayerNorm(name=f"spk_ln_{i}")(e))
            e = jnp.where(enroll_valid[..., None], e, 0.0)
        denom = jnp.maximum(jnp.sum(enroll_valid, 1, keepdims=True), 1)
        spk = jnp.sum(e, axis=1) / denom.astype(e.dtype)  # [B, H]

        x = nn.Dense(cfg.hidden, dtype=self.dtype, name="in_proj")(feat)
        gate = nn.Dense(cfg.hidden, dtype=self.dtype, name="spk_gate")(spk)
        for i in range(cfg.layers):
            h = nn.LayerNorm(name=f"ln_{i}")(x)
            h = nn.Conv(cfg.hidden, (cfg.kernel_size,), kernel_dilation=(2**i,),
                        padding="SAME", dtype=self.dtype, name=f"conv_{i}")(h)
            x = x + jax.nn.relu(h) * jax.nn.sigmoid(gate)[:, None, :]
        mask = nn.Dense(feat.shape[-1], dtype=self.dtype, name="mask")(x)
        if cfg.mask_nonlinear == "sigmoid":
            return jax.nn.sigmoid(mask)
        return jax.nn.relu(mask)


class ESPnetTSEModel(nn.Module):
    """Target-speaker extraction model: mixture + enrollment -> target wav;
    SI-SNR loss against the target reference (enh/espnet_model_tse.py)."""

    cfg: EnhConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        self.extractor = TSEExtractor(self.cfg, dtype=self.dtype, name="extractor")

    def extract(self, speech_mix, speech_lengths, enroll, enroll_lengths,
                deterministic: bool = True):
        cfg = self.cfg
        spec = stft(speech_mix, n_fft=cfg.n_fft, hop_length=cfg.hop_length)
        espec = stft(enroll, n_fft=cfg.n_fft, hop_length=cfg.hop_length)
        elens = stft_out_lengths(enroll_lengths, cfg.n_fft, cfg.hop_length)
        evalid = make_valid_mask(jnp.clip(elens, 0, espec.shape[1]), espec.shape[1])
        mask = self.extractor(
            jnp.abs(spec).astype(self.dtype), jnp.abs(espec).astype(self.dtype),
            evalid, deterministic,
        )
        wav = istft(spec * mask.astype(spec.dtype), n_fft=cfg.n_fft,
                    hop_length=cfg.hop_length, length=speech_mix.shape[1])
        return wav

    def collect_feats(self, speech_mix, speech_lengths, *a):
        return {"feats": speech_mix, "feats_lengths": speech_lengths}

    def __call__(self, speech_mix, speech_mix_lengths, enroll, enroll_lengths,
                 speech_ref, deterministic: bool = True):
        est = self.extract(speech_mix, speech_mix_lengths, enroll,
                           enroll_lengths, deterministic)
        snr = si_snr(speech_ref, est, speech_mix_lengths)
        loss = -jnp.mean(snr)
        return loss, {"loss": loss, "si_snr": -loss}, jnp.asarray(
            speech_mix.shape[0], jnp.float32
        )


class ESPnetEnhS2TModel(nn.Module):
    """Joint enhancement + ASR (enh/espnet_enh_s2t_model.py): the enh front
    separates/denoises, the ASR model consumes the estimated waveform; loss =
    asr_loss + enh_weight * enh_loss (permutation fixed to source 0 like the
    reference's single-target joint recipe)."""

    enh_cfg: EnhConfig
    asr_model: Any  # an ASRModel module instance
    enh_weight: float = 0.1
    dtype: Dtype = jnp.float32

    def setup(self):
        self.enh = ESPnetEnhancementModel(self.enh_cfg, dtype=self.dtype, name="enh")

    def collect_feats(self, speech_mix, speech_lengths, *a, **k):
        return self.asr_model.collect_feats(speech_mix, speech_lengths)

    def encode(self, speech_mix, speech_lengths, deterministic: bool = True):
        ests, _ = self.enh.separate(speech_mix, speech_lengths, deterministic)
        return self.asr_model.encode(ests[0], speech_lengths, deterministic)

    def ctc_log_softmax(self, encoder_out):
        return self.asr_model.ctc_log_softmax(encoder_out)

    def decoder_logits(self, *a, **k):
        return self.asr_model.decoder_logits(*a, **k)

    def __call__(self, speech_mix, speech_mix_lengths, text, text_lengths,
                 speech_ref=None, deterministic: bool = True):
        ests, _ = self.enh.separate(speech_mix, speech_mix_lengths, deterministic)
        est = ests[0]
        stats = {}
        loss_enh = jnp.asarray(0.0)
        if speech_ref is not None:
            loss_enh = -jnp.mean(si_snr(speech_ref, est, speech_mix_lengths))
            stats["loss_enh"] = loss_enh
        asr_loss, asr_stats, w = self.asr_model(
            est, speech_mix_lengths, text, text_lengths,
            deterministic=deterministic,
        )
        loss = asr_loss + self.enh_weight * loss_enh
        stats.update({f"asr_{k}": v for k, v in asr_stats.items()})
        stats["loss"] = loss
        return loss, stats, w


class ESPnetEnhancementModel(nn.Module):
    """enh/espnet_model.py analog: STFT -> mask -> iSTFT, PIT SI-SNR loss."""

    cfg: EnhConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        from llm_guided_asr_tpu.models import enh_extra, enh_zoo

        sep_cls = {
            "rnn": RNNSeparator,
            "conformer": ConformerSeparator,
            "tcn": TCNSeparator,
            "dprnn": DPRNNSeparator,
            "skim": SkiMSeparator,
            "tfgridnet": TFGridNetSeparator,
            "transformer": enh_extra.TransformerSeparator,
            "dptnet": enh_extra.DPTNetSeparator,
            "bsrnn": enh_extra.BSRNNSeparator,
            "dccrn": enh_extra.DCCRNSeparator,
            "dpcl": enh_extra.DPCLSeparator,
            "dan": enh_zoo.DANSeparator,
            "dpcl_e2e": enh_zoo.DPCLE2ESeparator,
            "svoice": enh_zoo.SVoiceSeparator,
            "fasnet": enh_zoo.FaSNetSeparator,
            "uses": enh_zoo.USESSeparator,
            "tfgridnetv2": enh_zoo.TFGridNetV2Separator,
            "tfgridnetv3": enh_zoo.TFGridNetV3Separator,
            "ineube": enh_zoo.INeuBeSeparator,
            "neural_beamformer": enh_zoo.NeuralBeamformerSeparator,
        }[self.cfg.separator_type]
        self.separator = sep_cls(self.cfg, dtype=self.dtype, name="separator")

    def separate(
        self, speech_mix: jnp.ndarray, speech_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[B, N] (or [B, N, C] multichannel) mixture -> ([S, B, N] estimates,
        frame lengths)."""
        cfg = self.cfg
        domain = getattr(self.separator, "domain", "mag_mask")
        olens = stft_out_lengths(speech_lengths, cfg.n_fft, cfg.hop_length)
        if domain in ("time", "time_multiscale"):
            # waveform-domain separators (fasnet, svoice): no STFT round trip
            ests = self.separator(speech_mix, deterministic)  # [S, B, N]
            return ests, olens
        if speech_mix.ndim == 3:  # [B, N, C] multichannel -> [B, T, F, C]
            spec = jnp.stack(
                [stft(speech_mix[..., c], n_fft=cfg.n_fft,
                      hop_length=cfg.hop_length)
                 for c in range(speech_mix.shape[-1])], axis=-1)
            out_len = speech_mix.shape[1]
        else:
            spec = stft(speech_mix, n_fft=cfg.n_fft, hop_length=cfg.hop_length)
            out_len = speech_mix.shape[1]
        if cfg.separator_type == "tfgridnet" or domain == "complex_spec":
            # complex-spectrum estimation (no masking)
            est_specs = self.separator(spec, deterministic)  # [S,B,T,F] complex
        elif domain == "dan":
            # inference-time attractors via on-device soft k-means
            mag = jnp.abs(spec)
            masks = self.separator(mag.astype(self.dtype), None, deterministic)
            est_specs = spec[None] * masks.astype(spec.dtype)
        elif domain == "complex_mask":
            masks = self.separator(spec, deterministic)  # [S,B,T,F] complex
            est_specs = spec[None] * masks
        elif domain == "embedding":
            from llm_guided_asr_tpu.models.enh_extra import kmeans_masks

            emb = self.separator(jnp.abs(spec).astype(self.dtype), deterministic)
            masks = kmeans_masks(emb, cfg.num_spk)  # [S,B,T,F] binary
            est_specs = spec[None] * masks.astype(spec.dtype)
        else:
            mag = jnp.abs(spec)
            masks = self.separator(mag.astype(self.dtype), deterministic)  # [S,B,T,F]
            est_specs = spec[None] * masks.astype(spec.dtype)
        ests = []
        for i in range(cfg.num_spk):
            wav = istft(
                est_specs[i], n_fft=cfg.n_fft, hop_length=cfg.hop_length,
                length=out_len,
            )
            ests.append(wav)
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
        refs_arr = jnp.stack(refs, axis=0)  # [S, B, N]
        if self.cfg.separator_type == "dpcl":
            # Deep clustering: train on the affinity loss over embeddings
            # (k-means mask assignment is non-differentiable; reference
            # enh/espnet_model.py routes DPCL through its own criterion).
            from llm_guided_asr_tpu.models.enh_extra import dpcl_loss

            cfg = self.cfg
            spec = stft(speech_mix, n_fft=cfg.n_fft, hop_length=cfg.hop_length)
            mix_mag = jnp.abs(spec)
            emb = self.separator(mix_mag.astype(self.dtype), deterministic)
            ref_mags = jnp.stack(
                [jnp.abs(stft(r, n_fft=cfg.n_fft, hop_length=cfg.hop_length))
                 for r in refs], axis=0)  # [S, B, T, F]
            loss = dpcl_loss(emb, ref_mags, mix_mag)
            stats = {"loss": loss}
            return loss, stats, jnp.asarray(speech_mix.shape[0], jnp.float32)
        from llm_guided_asr_tpu.models.enh_losses import (
            build_criterion,
            build_wrapper,
        )

        crit = build_criterion(self.cfg.loss_type)
        wrap = build_wrapper(self.cfg.loss_wrapper)
        cfg = self.cfg
        if cfg.separator_type == "dan":
            # oracle attractors from the reference magnitudes (the fixed
            # source order of the oracle assignment makes PIT degenerate to
            # fixed-order here, matching dan_separator.py training)
            spec = stft(speech_mix, n_fft=cfg.n_fft, hop_length=cfg.hop_length)
            ref_mags = jnp.stack(
                [jnp.abs(stft(r, n_fft=cfg.n_fft, hop_length=cfg.hop_length))
                 for r in refs], axis=0)
            masks = self.separator(
                jnp.abs(spec).astype(self.dtype), ref_mags, deterministic)
            ests = jnp.stack([
                istft(spec * masks[i].astype(spec.dtype), n_fft=cfg.n_fft,
                      hop_length=cfg.hop_length, length=speech_mix.shape[1])
                for i in range(cfg.num_spk)], axis=0)
            loss, perm = wrap(refs_arr, ests, speech_mix_lengths, crit)
            stats = {"loss": loss}
            if cfg.loss_type == "si_snr":
                stats["si_snr"] = -loss
            return loss, stats, jnp.asarray(speech_mix.shape[0], jnp.float32)
        if getattr(self.separator, "domain", "") == "time_multiscale":
            # multi-scale training loss averaged over every block's decoded
            # waveform (svoice_separator.py forward: list over layers)
            all_ests = self.separator(
                speech_mix, deterministic, all_scales=True)  # [L, S, B, N]
            losses = [wrap(refs_arr, all_ests[j], speech_mix_lengths, crit)[0]
                      for j in range(all_ests.shape[0])]
            loss = jnp.mean(jnp.stack(losses))
            stats = {"loss": loss}
            if cfg.loss_type == "si_snr":
                stats["si_snr"] = -loss
            return loss, stats, jnp.asarray(speech_mix.shape[0], jnp.float32)
        ests, _ = self.separate(speech_mix, speech_mix_lengths, deterministic)
        loss, perm = wrap(refs_arr, ests, speech_mix_lengths, crit)
        stats = {"loss": loss}
        if self.cfg.loss_type == "si_snr":
            stats["si_snr"] = -loss
        return loss, stats, jnp.asarray(speech_mix.shape[0], jnp.float32)
