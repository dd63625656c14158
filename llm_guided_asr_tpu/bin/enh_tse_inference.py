#!/usr/bin/env python3
"""Target-speaker extraction inference CLI
(espnet2/bin/enh_tse_inference.py analog): extract the enrolled speaker from
each mixture; wav.scp + enroll.scp (uid -> enrollment audio) -> wavs."""

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
    enroll_scp: str,
    train_config: str,
    model_file: Optional[str] = None,
):
    from llm_guided_asr_tpu.data.dataset import round_up
    from llm_guided_asr_tpu.data.fileio import SoundScpReader, write_wav
    from llm_guided_asr_tpu.tasks.generic import GenericTask

    model, variables, config = GenericTask.build_model_from_file(
        train_config, model_file
    )
    ext_fn = jax.jit(
        lambda m, ml, e, el: model.apply(variables, m, ml, e, el,
                                         method=model.extract)
    )
    mixes = SoundScpReader(wav_scp)
    enrolls = SoundScpReader(enroll_scp)
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    n = 0
    with open(out / "spk1.scp", "w") as scp:
        for uid in mixes.keys():
            if uid not in enrolls.keys():
                logger.warning(f"{uid}: no enrollment; skip")
                continue
            rate, mix = mixes[uid]
            _, enr = enrolls[uid]
            nm, ne = len(mix), len(enr)
            pm = np.zeros((round_up(max(nm, 1), 4000),), np.float32)
            pm[:nm] = mix
            pe = np.zeros((round_up(max(ne, 1), 4000),), np.float32)
            pe[:ne] = enr
            wav = jax.device_get(ext_fn(
                jnp.asarray(pm[None]), jnp.asarray([nm]),
                jnp.asarray(pe[None]), jnp.asarray([ne]),
            ))[0, :nm]
            p = out / f"{uid}.wav"
            write_wav(p, rate, wav)
            scp.write(f"{uid} {p}\n")
            n += 1
    logger.info(f"extracted {n} utterances -> {out}")


def main(cmd=None):
    from llm_guided_asr_tpu.utils.config import build_config
    from llm_guided_asr_tpu.utils.devices import resolve_device

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "output_dir": "extracted",
        "wav_scp": None,
        "enroll_scp": None,
        "train_config": None,
        "model_file": None,
        "device": None,
    })
    logging.basicConfig(level=logging.INFO)
    resolve_device(config.get("device"))
    inference(config["output_dir"], config["wav_scp"], config["enroll_scp"],
              config["train_config"], config.get("model_file"))


if __name__ == "__main__":
    main()
