#!/usr/bin/env python3
"""SLU inference CLI (espnet2/bin/slu_inference.py analog): transcript via
greedy CTC + intent class via the pooled intent head."""

from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def inference(
    output_dir: str,
    wav_scp: str,
    train_config: str,
    model_file: Optional[str] = None,
):
    from llm_guided_asr_tpu.data.dataset import round_up
    from llm_guided_asr_tpu.data.fileio import SoundScpReader
    from llm_guided_asr_tpu.search.greedy import ctc_greedy_decode
    from llm_guided_asr_tpu.tasks.asr import build_text_converter
    from llm_guided_asr_tpu.tasks.generic import GenericTask

    model, variables, config = GenericTask.build_model_from_file(
        train_config, model_file
    )
    tokenizer, converter = build_text_converter(config)
    enc_fn = jax.jit(lambda s, l: model.apply(variables, s, l, method=model.encode))
    logp_fn = jax.jit(lambda e: model.apply(variables, e, method=model.ctc_log_softmax))
    intent_fn = jax.jit(
        lambda e, l: model.apply(variables, e, l, method=model.classify_intent)
    )
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    reader = SoundScpReader(wav_scp)
    n = 0
    with open(out / "text", "w") as tf, open(out / "intent", "w") as itf:
        for uid in reader.keys():
            rate, wav = reader[uid]
            ns = len(wav)
            padded = np.zeros((round_up(max(ns, 1), 16000),), np.float32)
            padded[:ns] = wav
            enc, enc_lens = enc_fn(jnp.asarray(padded[None]), jnp.asarray([ns]))
            logp = logp_fn(enc)
            tokens, ntok = jax.device_get(
                ctc_greedy_decode(logp, enc_lens,
                                  blank_id=model.cfg.asr.blank_id)
            )
            ids = [int(t) for t in tokens[0, : int(ntok[0])]]
            text = tokenizer.tokens2text(converter.ids2tokens(ids))
            intent = int(np.argmax(jax.device_get(intent_fn(enc, enc_lens))[0]))
            tf.write(f"{uid} {text}\n")
            itf.write(f"{uid} {intent}\n")
            n += 1
    logger.info(f"decoded {n} utterances -> {out}")


def main(cmd=None):
    from llm_guided_asr_tpu.utils.config import build_config
    from llm_guided_asr_tpu.utils.devices import resolve_device

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "output_dir": "slu_decoded",
        "wav_scp": None,
        "train_config": None,
        "model_file": None,
        "device": None,
    })
    logging.basicConfig(level=logging.INFO)
    resolve_device(config.get("device"))
    inference(config["output_dir"], config["wav_scp"], config["train_config"],
              config.get("model_file"))


if __name__ == "__main__":
    main()
