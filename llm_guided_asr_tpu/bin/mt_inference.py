#!/usr/bin/env python3
"""MT inference CLI (espnet2/bin/mt_inference.py analog): beam-decode a
source-text file through the text-to-text model with the shared on-device
beam search (ctc branch compiled out)."""

from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class Text2Text:
    def __init__(
        self,
        train_config,
        model_file=None,
        beam_size: int = 5,
        nbest: int = 1,
        maxlenratio: float = 1.5,
        penalty: float = 0.0,
    ):
        from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch
        from llm_guided_asr_tpu.tasks.asr import build_text_converter
        from llm_guided_asr_tpu.tasks.generic import GenericTask

        self.model, self.variables, self.config = GenericTask.build_model_from_file(
            train_config, model_file
        )
        self.tokenizer, self.converter = build_text_converter(self.config)
        self.maxlenratio = maxlenratio
        self.nbest = nbest
        cfg = self.model.cfg
        self.beam = BatchBeamSearch(
            self.model, self.variables, vocab_size=cfg.vocab_size,
            sos=cfg.sos_id, eos=cfg.eos_id, beam_size=beam_size,
            ctc_weight=0.0, penalty=penalty,
        )

    def __call__(self, src_text: str):
        ids = self.converter.tokens2ids(self.tokenizer.text2tokens(src_text))
        if not ids:
            return [("", [], [])]
        src = jnp.asarray([ids], jnp.int32)
        lens = jnp.asarray([len(ids)], jnp.int32)
        enc, enc_lens = self.model.apply(
            self.variables, src, lens, method=self.model.encode
        )
        hyps = self.beam(enc, enc_lens, maxlenratio=self.maxlenratio,
                         nbest=self.nbest)
        out = []
        for h in hyps[: self.nbest]:
            oids = [i for i in h.yseq
                    if i not in (self.model.cfg.sos_id, self.model.cfg.eos_id)]
            toks = self.converter.ids2tokens(oids)
            out.append((self.tokenizer.tokens2text(toks), toks, oids))
        return out


def inference(
    output_dir: str,
    src_text: str,
    train_config: str,
    model_file: Optional[str] = None,
    beam_size: int = 5,
):
    from llm_guided_asr_tpu.data.fileio import read_2columns_text

    t2t = Text2Text(train_config, model_file, beam_size=beam_size)
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    texts = read_2columns_text(src_text)
    with open(out / "text", "w") as f:
        for uid, line in texts.items():
            hyp = t2t(line)[0][0]
            f.write(f"{uid} {hyp}\n")
    logger.info(f"translated {len(texts)} lines -> {out}")


def main(cmd=None):
    from llm_guided_asr_tpu.utils.config import build_config
    from llm_guided_asr_tpu.utils.devices import resolve_device

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "output_dir": "translated",
        "src_text": None,
        "train_config": None,
        "model_file": None,
        "beam_size": 5,
        "device": None,
    })
    logging.basicConfig(level=logging.INFO)
    resolve_device(config.get("device"))
    inference(config["output_dir"], config["src_text"], config["train_config"],
              config.get("model_file"), beam_size=int(config.get("beam_size", 5)))


if __name__ == "__main__":
    main()
