#!/usr/bin/env python3
"""Decode a wav.scp with a pretrained HF Whisper checkpoint.

The user-facing end of the Whisper import path (models/whisper.py): loads
WhisperModel weights into the flax WhisperASR, builds the whisper prompt
(<|startoftranscript|> [lang] [task] <|notimestamps|>) from the HF
tokenizer, and decodes with the on-device BatchBeamSearch in CTC-less mode
(whisper has no CTC head).  Mirrors how the reference exposes whisper
through espnet2/bin/asr_inference.py with whisper encoder/decoder choices.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class WhisperSpeech2Text:
    def __init__(
        self,
        model_name_or_path: Optional[str] = None,
        language: str = "en",
        task: str = "transcribe",
        beam_size: int = 5,
        maxlenratio: float = -96.0,  # cap output tokens (negative = absolute)
        dtype=jnp.float32,
        _preloaded=None,  # (model, variables, tokenizer|None, prompt_ids, eot)
    ):
        from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch

        if _preloaded is not None:
            self.model, self.variables, self.tokenizer, self.prompt_ids, self.eot = (
                _preloaded
            )
        else:
            from transformers import AutoTokenizer

            from llm_guided_asr_tpu.models.whisper import load_whisper_asr

            self.model, self.variables, hf_cfg = load_whisper_asr(
                model_name_or_path, dtype=dtype
            )
            self.tokenizer = AutoTokenizer.from_pretrained(model_name_or_path)
            tok = self.tokenizer
            # prompt: sot [lang task] notimestamps (generation_config analog)
            ids = [tok.convert_tokens_to_ids("<|startoftranscript|>")]
            lang_tok = f"<|{language}|>"
            if tok.convert_tokens_to_ids(lang_tok) != tok.unk_token_id:
                ids.append(tok.convert_tokens_to_ids(lang_tok))
                ids.append(tok.convert_tokens_to_ids(f"<|{task}|>"))
            nt = tok.convert_tokens_to_ids("<|notimestamps|>")
            if nt is not None and nt != tok.unk_token_id:
                ids.append(nt)
            self.prompt_ids = [i for i in ids if i is not None and i >= 0]
            self.eot = tok.convert_tokens_to_ids("<|endoftext|>")
        self.beam_size = beam_size
        self.maxlenratio = maxlenratio
        self._bs = BatchBeamSearch(
            self.model, self.variables,
            vocab_size=self.model.cfg.vocab_size,
            # sos slot is overwritten by the prompt injection below; eos = eot
            sos=self.prompt_ids[0], eos=int(self.eot),
            beam_size=beam_size, ctc_weight=0.0,
        )

    def __call__(self, speech: np.ndarray) -> str:
        from llm_guided_asr_tpu.ops.frontend import whisper_frontend

        feats, flens = whisper_frontend(
            jnp.asarray(np.asarray(speech, np.float32))[None],
            jnp.asarray([len(speech)]),
            n_mels=self.model.cfg.encoder.num_mel_bins,
        )
        enc, enc_lens = self.model.apply(
            self.variables, feats, flens, method=self.model.encode
        )
        # multi-token prompt: decode greedily over the prompt then beam:
        # simplest faithful handling — prepend prompt via hyp seeding
        hyps = self._decode_with_prompt(enc, enc_lens)
        ids = [
            i for i in hyps[0].yseq
            if i not in self.prompt_ids and i != self.eot
        ]
        if self.tokenizer is None:
            return ids
        return self.tokenizer.decode(ids, skip_special_tokens=True).strip()

    def _decode_with_prompt(self, enc, enc_lens):
        # seed the search with the whisper prompt (hyp_primer analog,
        # beam_search.py:123): force the first len(prompt) steps
        import jax

        bs = self._bs
        lmax = bs._lmax(int(enc.shape[1]), self.maxlenratio) + len(self.prompt_ids)
        ctc_logp = jnp.zeros((enc.shape[1], bs.vocab_size))
        carry = bs.stream_start(ctc_logp, enc, enc_lens[0], lmax)
        state, att_state = carry
        # overwrite slot tokens with the full prompt
        k = state.alive_tokens.shape[0]
        prompt = jnp.asarray(self.prompt_ids, jnp.int32)
        tokens = state.alive_tokens.at[:, : len(self.prompt_ids)].set(
            jnp.broadcast_to(prompt, (k, len(self.prompt_ids)))
        )
        state = state._replace(
            alive_tokens=tokens,
            alive_len=jnp.full((k,), len(self.prompt_ids), jnp.int32),
        )
        maxlen = (
            int(-self.maxlenratio) if self.maxlenratio < 0 else int(enc_lens[0])
        )
        # the loop's step counter counts EMITTED tokens (prompt seeding only
        # set alive_len), so maxlen bounds the response directly
        carry = bs.stream_step(
            enc, enc_lens[0], enc_lens[0],
            jnp.asarray(maxlen, jnp.int32),
            jnp.asarray(0, jnp.int32), (state, att_state), ctc_logp,
        )
        return bs.stream_hyps(carry, nbest=1)


def main(cmd=None):
    import sys

    from llm_guided_asr_tpu.data.fileio import DatadirWriter, SoundScpReader
    from llm_guided_asr_tpu.utils.config import build_config
    from llm_guided_asr_tpu.utils.devices import resolve_device

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "output_dir": "decode_whisper",
        "wav_scp": None,
        "model_name_or_path": None,
        "language": "en",
        "task": "transcribe",
        "beam_size": 5,
        "device": None,
    })
    logging.basicConfig(level=logging.INFO)
    resolve_device(config.get("device"))
    s2t = WhisperSpeech2Text(
        config["model_name_or_path"], config.get("language", "en"),
        config.get("task", "transcribe"), int(config.get("beam_size", 5)),
    )
    reader = SoundScpReader(config["wav_scp"])
    with DatadirWriter(Path(config["output_dir"]) / "1best_recog") as writer:
        for uid in reader.keys():
            rate, wav = reader[uid]
            writer["text"][uid] = s2t(wav)
    logger.info(f"decoded {len(reader)} utterances")


if __name__ == "__main__":
    main()
