#!/usr/bin/env python3
"""Speech translation inference CLI (espnet2/bin/st_inference.py analog):
beam-decode target-language text from a wav.scp through the ST model (the
attention decoder scores; CTC is over the SOURCE vocab so it does not join
the translation beam, matching the reference's ST decode)."""

from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class Speech2Translation:
    def __init__(
        self,
        train_config,
        model_file=None,
        beam_size: int = 5,
        nbest: int = 1,
        maxlenratio: float = -48.0,
        penalty: float = 0.0,
        speech_pad_multiple: int = 1600,
    ):
        from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch
        from llm_guided_asr_tpu.tasks.st import STTask

        self.model, self.variables, self.config = STTask.build_model_from_file(
            train_config, model_file
        )
        from llm_guided_asr_tpu.tasks.asr import build_text_converter

        self.tokenizer, self.converter = build_text_converter(self.config)
        self.maxlenratio = maxlenratio
        self.nbest = nbest
        self.speech_pad_multiple = speech_pad_multiple
        cfg = self.model.cfg
        self.beam = BatchBeamSearch(
            self.model, self.variables, vocab_size=cfg.vocab_size,
            sos=cfg.sos_id, eos=cfg.eos_id, beam_size=beam_size,
            ctc_weight=0.0, penalty=penalty,
        )

    def __call__(self, speech: np.ndarray):
        import jax

        from llm_guided_asr_tpu.data.dataset import round_up

        n = len(speech)
        padded = np.zeros((round_up(max(n, 1), self.speech_pad_multiple),),
                          np.float32)
        padded[:n] = speech
        enc, enc_lens = self.model.apply(
            self.variables, jnp.asarray(padded[None]), jnp.asarray([n]),
            method=self.model.encode,
        )
        hyps = self.beam(enc, enc_lens, maxlenratio=self.maxlenratio,
                         nbest=self.nbest)
        out = []
        for h in hyps[: self.nbest]:
            ids = [i for i in h.yseq
                   if i not in (self.model.cfg.sos_id, self.model.cfg.eos_id)]
            toks = self.converter.ids2tokens(ids)
            out.append((self.tokenizer.tokens2text(toks), toks, ids, h))
        return out


def inference(
    output_dir: str,
    wav_scp: str,
    train_config: str,
    model_file: Optional[str] = None,
    beam_size: int = 5,
):
    from llm_guided_asr_tpu.data.fileio import DatadirWriter, SoundScpReader

    s2tr = Speech2Translation(train_config, model_file, beam_size=beam_size)
    reader = SoundScpReader(wav_scp)
    with DatadirWriter(output_dir) as writer:
        w = writer["1best_recog"]
        for uid in reader.keys():
            rate, wav = reader[uid]
            text, toks, ids, hyp = s2tr(np.asarray(wav, np.float32))[0]
            w["text"][uid] = text
            w["token"][uid] = " ".join(toks)
            w["score"][uid] = str(float(hyp.score))
    logger.info(f"translated {len(reader)} utterances -> {output_dir}")


def main(cmd=None):
    from llm_guided_asr_tpu.utils.config import build_config
    from llm_guided_asr_tpu.utils.devices import resolve_device

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "output_dir": "st_decoded",
        "wav_scp": None,
        "train_config": None,
        "model_file": None,
        "beam_size": 5,
        "device": None,
    })
    logging.basicConfig(level=logging.INFO)
    resolve_device(config.get("device"))
    inference(config["output_dir"], config["wav_scp"], config["train_config"],
              config.get("model_file"), beam_size=int(config.get("beam_size", 5)))


if __name__ == "__main__":
    main()
