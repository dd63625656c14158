#!/usr/bin/env python3
"""Diarization inference CLI (espnet2/bin/diar_inference.py analog).

Runs the EEND-style model over a wav.scp and writes per-speaker frame
activity posteriors plus an RTTM file (SPEAKER rows from thresholded,
median-smoothed activities).
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def _segments(active: np.ndarray) -> list:
    """[T] bool -> [(start, end)] frame runs."""
    out = []
    start = None
    for t, a in enumerate(active):
        if a and start is None:
            start = t
        elif not a and start is not None:
            out.append((start, t))
            start = None
    if start is not None:
        out.append((start, len(active)))
    return out


def inference(
    output_dir: str,
    wav_scp: str,
    train_config: str,
    model_file: Optional[str] = None,
    threshold: float = 0.5,
    median: int = 11,
    fs: int = 16000,
):
    from llm_guided_asr_tpu.data.dataset import round_up
    from llm_guided_asr_tpu.data.fileio import SoundScpReader
    from llm_guided_asr_tpu.tasks.generic import GenericTask

    model, variables, config = GenericTask.build_model_from_file(
        train_config, model_file
    )
    hop = model.cfg.frontend.hop_length
    act_fn = jax.jit(
        lambda s, l: model.apply(variables, s, l, method=model.activity_logits)
    )
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    reader = SoundScpReader(wav_scp)
    n = 0
    with open(out / "rttm", "w") as rttm, open(out / "activity.scp", "w") as scp:
        for uid in reader.keys():
            rate, wav = reader[uid]
            ns = len(wav)
            padded = np.zeros((round_up(max(ns, 1), 16000),), np.float32)
            padded[:ns] = wav
            logits, flens = jax.device_get(
                act_fn(jnp.asarray(padded[None]), jnp.asarray([ns]))
            )
            t = int(flens[0])
            post = 1.0 / (1.0 + np.exp(-logits[0, :t]))  # [T, S]
            np.save(out / f"{uid}.npy", post)
            scp.write(f"{uid} {out / f'{uid}.npy'}\n")
            active = post > threshold
            if median > 1:  # median smoothing per speaker
                k = median // 2
                sm = np.zeros_like(active)
                for s in range(active.shape[1]):
                    a = active[:, s]
                    ap = np.pad(a, (k, k), mode="edge")
                    sm[:, s] = np.asarray(
                        [np.median(ap[i : i + median]) > 0.5 for i in range(t)]
                    )
                active = sm
            frame_s = hop / fs
            for s in range(active.shape[1]):
                for b0, b1 in _segments(active[:, s]):
                    rttm.write(
                        f"SPEAKER {uid} 1 {b0 * frame_s:.3f} "
                        f"{(b1 - b0) * frame_s:.3f} <NA> <NA> spk{s + 1} <NA> <NA>\n"
                    )
            n += 1
    logger.info(f"diarized {n} utterances -> {out}")


def main(cmd=None):
    from llm_guided_asr_tpu.utils.config import build_config
    from llm_guided_asr_tpu.utils.devices import resolve_device

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "output_dir": "diarized",
        "wav_scp": None,
        "train_config": None,
        "model_file": None,
        "threshold": 0.5,
        "median": 11,
        "device": None,
    })
    logging.basicConfig(level=logging.INFO)
    resolve_device(config.get("device"))
    inference(config["output_dir"], config["wav_scp"], config["train_config"],
              config.get("model_file"),
              threshold=float(config.get("threshold", 0.5)),
              median=int(config.get("median", 11)))


if __name__ == "__main__":
    main()
