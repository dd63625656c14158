#!/usr/bin/env python3
"""Anti-spoofing inference CLI (espnet2/bin/asvspoof_inference.py analog):
per-utterance spoofing scores (sigmoid of the binary head logit)."""

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
    from llm_guided_asr_tpu.tasks.generic import GenericTask

    model, variables, config = GenericTask.build_model_from_file(
        train_config, model_file
    )
    score_fn = jax.jit(lambda s, l: model.apply(variables, s, l))
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    reader = SoundScpReader(wav_scp)
    n = 0
    with open(out / "score", "w") as f:
        for uid in reader.keys():
            rate, wav = reader[uid]
            ns = len(wav)
            padded = np.zeros((round_up(max(ns, 1), 16000),), np.float32)
            padded[:ns] = wav
            logit = float(jax.device_get(
                score_fn(jnp.asarray(padded[None]), jnp.asarray([ns]))
            )[0])
            p_spoof = 1.0 / (1.0 + np.exp(-logit))
            f.write(f"{uid} {p_spoof:.6f}\n")
            n += 1
    logger.info(f"scored {n} utterances -> {out}")


def main(cmd=None):
    from llm_guided_asr_tpu.utils.config import build_config
    from llm_guided_asr_tpu.utils.devices import resolve_device

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "output_dir": "spoof_scored",
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
