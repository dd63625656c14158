"""Multi-speaker ASR with permutation-invariant training (PIT).

Rebuild of espnet2/asr/pit_espnet_model.py (ESPnetASRModel over num_inf
speaker streams):
- encoder trunk (frontend -> conformer) shared across speakers, followed by
  one lightweight per-speaker "separation" branch each (the reference pairs
  a multi-output enh-style encoder with a shared recognizer);
- a first CTC pass scores every (hypothesis stream, reference) pair and the
  minimum-cost permutation is selected per utterance
  (pit_espnet_model.py:258-268 "1st ctc calculation is only used to decide
  permutation", PITLossWrapper.forward:37);
- streams are permuted to match references, flattened to (B*S), and the
  standard hybrid CTC/attention loss is computed with the shared CTC head
  and shared decoder (pit_espnet_model.py:264-276).

The permutation search is fully on-device: the S! permutations are a static
table, pair losses come from one vmapped per-example CTC, and the argmin /
gather replace the reference's Python ``itertools.permutations`` loop.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.asr_model import ASRModel, ASRModelConfig
from llm_guided_asr_tpu.models.transformer import TransformerEncoderLayer
from llm_guided_asr_tpu.ops.losses import (
    accuracy,
    add_sos_eos,
    ctc_loss_per_example,
    label_smoothing_loss,
)
from llm_guided_asr_tpu.utils.masks import make_valid_mask

Dtype = Any


@dataclasses.dataclass(frozen=True)
class PITASRConfig:
    asr: ASRModelConfig
    num_ref: int = 2  # speakers (= num_inf)


class PITASRModel(nn.Module):
    cfg: PITASRConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        acfg = self.cfg.asr
        # trunk: reuse the full ASRModel for frontend+encoder+ctc+decoder; the
        # per-speaker branches below specialize the shared trunk encoding
        self.asr = ASRModel(acfg, dtype=self.dtype, name="asr")
        self.spk_branches = [
            TransformerEncoderLayer(
                acfg.encoder.attention_heads, acfg.encoder.linear_units,
                0.1, dtype=self.dtype, name=f"spk_branch_{i}",
            )
            for i in range(self.cfg.num_ref)
        ]

    def encode_multi(self, speech, speech_lengths, deterministic: bool = True):
        """[B, N] -> (enc [B, S, T, D], enc_lens [B])."""
        enc, enc_lens = self.asr.encode(speech, speech_lengths, deterministic)
        valid = make_valid_mask(enc_lens, enc.shape[1])
        streams = [
            br(enc, valid[:, None, :], deterministic) for br in self.spk_branches
        ]
        return jnp.stack(streams, axis=1), enc_lens

    # single-stream interface for beam-search decode of speaker `spk`
    def encode(self, speech, speech_lengths, deterministic: bool = True, spk: int = 0):
        enc, enc_lens = self.encode_multi(speech, speech_lengths, deterministic)
        return enc[:, spk], enc_lens

    def decoder_logits(self, enc, enc_lens, ys_in, ys_in_lengths,
                       deterministic: bool = True, only_last: bool = False):
        return self.asr.decoder_logits(enc, enc_lens, ys_in, ys_in_lengths,
                                       deterministic, only_last=only_last)

    def ctc_logits(self, encoder_out):
        return self.asr.ctc_logits(encoder_out)

    def ctc_log_softmax(self, encoder_out):
        return self.asr.ctc_log_softmax(encoder_out)

    def __call__(
        self,
        speech: jnp.ndarray,  # [B, N]
        speech_lengths: jnp.ndarray,
        text: jnp.ndarray,  # [B, L] speaker-1 reference, padded -1
        text_lengths: jnp.ndarray,
        *extra,  # text_spk2, text_spk2_lengths, ... (trainer batch_args order)
        deterministic: bool = True,
        **kwargs,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
        cfg = self.cfg.asr
        S = self.cfg.num_ref
        # gather references text, text_spk2, ... (pit_espnet_model.py:222-245),
        # accepted positionally (trainer batch order) or as keywords
        refs, ref_lens = [text], [text_lengths]
        for s in range(1, S):
            if f"text_spk{s + 1}" in kwargs:
                refs.append(kwargs[f"text_spk{s + 1}"])
                ref_lens.append(kwargs[f"text_spk{s + 1}_lengths"])
            else:
                refs.append(extra[2 * (s - 1)])
                ref_lens.append(extra[2 * (s - 1) + 1])
        lmax = max(r.shape[1] for r in refs)
        refs = [
            jnp.pad(r, ((0, 0), (0, lmax - r.shape[1])),
                    constant_values=cfg.ignore_id)
            for r in refs
        ]
        ref_ids = jnp.stack(refs, axis=1)  # [B, S, L]
        ref_len = jnp.stack(ref_lens, axis=1)  # [B, S]

        enc, enc_lens = self.encode_multi(speech, speech_lengths, deterministic)
        B = enc.shape[0]

        # 1st CTC pass: pair losses [B, S_inf, S_ref] decide the permutation
        ctc_tab = self.ctc_logits(enc)  # [B, S, T, V]

        def pair_nll(logits_i, ref_j, ref_j_len):
            return ctc_loss_per_example(
                logits_i, enc_lens, ref_j, ref_j_len, blank_id=cfg.blank_id
            )

        # vmap over inf streams (axis 1 of ctc_tab) x ref streams
        mat = jax.vmap(
            lambda li: jax.vmap(
                lambda rj, rjl: pair_nll(li, rj, rjl), in_axes=(1, 1), out_axes=1
            )(ref_ids, ref_len),
            in_axes=1, out_axes=1,
        )(ctc_tab)  # [B, S_inf, S_ref]

        perms = jnp.asarray(
            list(itertools.permutations(range(S))), jnp.int32
        )  # [P, S]: perm[p, j] = inf stream assigned to ref j
        # score[b, p] = sum_j mat[b, perms[p, j], j]
        perm_scores = jnp.sum(
            mat[:, perms, jnp.arange(S)[None, :]], axis=-1
        )  # [B, P]
        best = jnp.argmin(perm_scores, axis=1)  # [B]
        sel = perms[best]  # [B, S]: ref j <- inf stream sel[b, j]
        enc_aligned = jnp.take_along_axis(
            enc, sel[:, :, None, None], axis=1
        )  # [B, S, T, D]

        # flatten (B*S) and run the standard hybrid loss (pit:264-276)
        flat_enc = enc_aligned.reshape(B * S, *enc.shape[2:])
        flat_enc_lens = jnp.repeat(enc_lens, S)
        flat_ref = ref_ids.reshape(B * S, lmax)
        flat_ref_len = ref_len.reshape(B * S)

        per_ex = ctc_loss_per_example(
            self.ctc_logits(flat_enc), flat_enc_lens, flat_ref, flat_ref_len,
            blank_id=cfg.blank_id,
        )
        loss_ctc = jnp.sum(per_ex) / B  # reference sums speakers, divides by B

        loss_att = jnp.asarray(0.0)
        acc = jnp.asarray(0.0)
        if cfg.ctc_weight != 1.0:
            ys_in, ys_out = add_sos_eos(flat_ref, flat_ref_len, cfg.sos_id,
                                        cfg.eos_id, cfg.ignore_id)
            logits = self.decoder_logits(flat_enc, flat_enc_lens, ys_in,
                                         flat_ref_len + 1, deterministic)
            loss_att = label_smoothing_loss(
                logits, ys_out, cfg.lsm_weight, cfg.ignore_id,
                cfg.length_normalized_loss,
            )
            acc = accuracy(logits, ys_out, cfg.ignore_id)
        if cfg.ctc_weight == 1.0:
            loss = loss_ctc
        else:
            loss = cfg.ctc_weight * loss_ctc + (1.0 - cfg.ctc_weight) * loss_att
        stats = {"loss": loss, "loss_ctc": loss_ctc, "loss_att": loss_att,
                 "acc": acc}
        return loss, stats, jnp.asarray(B, jnp.float32)
