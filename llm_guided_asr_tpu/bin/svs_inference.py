#!/usr/bin/env python3
"""Singing voice synthesis CLI (espnet2/bin/svs_inference.py analog):
score-driven synthesis — text + midi + durations -> log-mel (.npy) and a
Griffin-Lim waveform."""

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
    text: str,  # 'uid phones...' file
    midi: str,  # 'uid m1 m2 ...' per-token midi notes
    durations: str,  # 'uid d1 d2 ...' frames per token
    train_config: str,
    model_file: Optional[str] = None,
    fs: int = 16000,
    n_fft: int = 512,
    hop_length: int = 128,
):
    from llm_guided_asr_tpu.bin.tts_inference import Text2Speech
    from llm_guided_asr_tpu.data.fileio import (
        load_num_sequence_text,
        read_2columns_text,
        write_wav,
    )
    from llm_guided_asr_tpu.tasks.asr import build_text_converter
    from llm_guided_asr_tpu.tasks.generic import GenericTask

    model, variables, config = GenericTask.build_model_from_file(
        train_config, model_file
    )
    tokenizer, converter = build_text_converter(config)
    infer_fn = jax.jit(
        lambda t, tl, m, d: model.apply(variables, t, tl, m, d,
                                        method=model.inference)
    )
    texts = read_2columns_text(text)
    midis = load_num_sequence_text(midi)
    durs = load_num_sequence_text(durations)
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    gl = Text2Speech.mel_to_wav  # reuse the pseudo-inverse + Griffin-Lim

    class _V:  # tiny shim carrying the vocoder params for mel_to_wav
        pass

    v = _V()
    v.fs, v.n_fft, v.hop_length = fs, n_fft, hop_length
    n = 0
    with open(out / "feats.scp", "w") as scp:
        for uid, line in texts.items():
            if uid not in midis or uid not in durs:
                continue
            ids = converter.tokens2ids(tokenizer.text2tokens(line))
            L = len(ids)
            m = np.asarray(midis[uid], np.int32)[:L]
            d = np.asarray(durs[uid], np.int32)[:L]
            if len(m) < L or len(d) < L:
                logger.warning(f"{uid}: midi/durations shorter than text; skip")
                continue
            mel, mel_lens = jax.device_get(infer_fn(
                jnp.asarray([ids], jnp.int32), jnp.asarray([L], jnp.int32),
                jnp.asarray(m[None]), jnp.asarray(d[None]),
            ))
            mel = mel[0, : int(mel_lens[0])]
            np.save(out / f"{uid}.npy", mel)
            scp.write(f"{uid} {out / f'{uid}.npy'}\n")
            wav = gl(v, mel)
            write_wav(out / f"{uid}.wav", fs, wav)
            n += 1
    logger.info(f"synthesized {n} utterances -> {out}")


def main(cmd=None):
    from llm_guided_asr_tpu.utils.config import build_config
    from llm_guided_asr_tpu.utils.devices import resolve_device

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "output_dir": "svs_synthesized",
        "text": None,
        "midi": None,
        "durations": None,
        "train_config": None,
        "model_file": None,
        "device": None,
    })
    logging.basicConfig(level=logging.INFO)
    resolve_device(config.get("device"))
    inference(config["output_dir"], config["text"], config["midi"],
              config["durations"], config["train_config"],
              config.get("model_file"))


if __name__ == "__main__":
    main()
