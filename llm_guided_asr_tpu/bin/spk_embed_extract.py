#!/usr/bin/env python3
"""Speaker-embedding extraction (espnet2/bin/spk_inference.py analog).

Writes one .npy embedding per utterance + an embed.scp index; optional trial
scoring (cosine) for verification pairs.
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


def extract(
    output_dir: str,
    wav_scp: str,
    train_config: str,
    model_file: Optional[str] = None,
    speech_pad_multiple: int = 4000,
):
    from llm_guided_asr_tpu.data.dataset import round_up
    from llm_guided_asr_tpu.data.fileio import SoundScpReader
    from llm_guided_asr_tpu.tasks.generic import GenericTask

    model, variables, _ = GenericTask.build_model_from_file(train_config, model_file)
    embed_fn = jax.jit(
        lambda s, l: model.apply(variables, s, l, method=model.extract_embedding)
    )
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    reader = SoundScpReader(wav_scp)
    with open(out / "embed.scp", "w") as scp:
        for uid in reader.keys():
            _, wav = reader[uid]
            n = len(wav)
            padded = np.zeros((round_up(max(n, 1), speech_pad_multiple),), np.float32)
            padded[:n] = wav
            emb = np.asarray(embed_fn(jnp.asarray(padded[None]), jnp.asarray([n])))[0]
            p = out / f"{uid}.npy"
            np.save(p, emb)
            scp.write(f"{uid} {p}\n")
    logger.info(f"extracted {len(reader)} embeddings -> {out}")


_TRIAL_LABELS = {"1": 1, "0": 0, "target": 1, "nontarget": 0}


def score_trials(embed_scp: str, trials_file: str, output_file: str):
    """trials: 'uid1 uid2 [label]' per line -> 'uid1 uid2 cos' per line.

    When a third column gives the ground truth (1/0 or target/nontarget),
    also writes EER/minDCF (NIST p_target=0.05, as spk_trainer.py:202-215)
    to <output_file's dir>/verification_result.txt and returns the report.
    """
    from llm_guided_asr_tpu.data.fileio import read_2columns_text

    table = read_2columns_text(embed_scp)
    scores, labels = [], []
    with open(trials_file) as f, open(output_file, "w") as out:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            u1, u2 = parts[:2]
            a = np.load(table[u1])
            b = np.load(table[u2])
            cos = float(
                np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
            )
            out.write(f"{u1} {u2} {cos:.4f}\n")
            if len(parts) > 2 and parts[2].lower() in _TRIAL_LABELS:
                scores.append(cos)
                labels.append(_TRIAL_LABELS[parts[2].lower()])
    if scores and 0 < sum(labels) < len(labels):
        from llm_guided_asr_tpu.utils.det import verification_report

        report = verification_report(scores, labels)
        result = Path(output_file).parent / "verification_result.txt"
        with open(result, "w") as f:
            for k, v in report.items():
                f.write(f"{k} {v:.6f}\n")
        logger.info(
            f"EER {report['eer']:.3f}% minDCF {report['mindcf']:.4f} "
            f"({int(report['n_trials'])} trials) -> {result}"
        )
        return report
    return None


def main(cmd=None):
    from llm_guided_asr_tpu.utils.config import build_config
    from llm_guided_asr_tpu.utils.devices import resolve_device

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "output_dir": "embeddings",
        "wav_scp": None,
        "train_config": None,
        "model_file": None,
        "trials": None,
        "device": None,
    })
    logging.basicConfig(level=logging.INFO)
    resolve_device(config.get("device"))
    extract(config["output_dir"], config["wav_scp"], config["train_config"],
            config.get("model_file"))
    if config.get("trials"):
        score_trials(
            str(Path(config["output_dir"]) / "embed.scp"),
            config["trials"],
            str(Path(config["output_dir"]) / "scores.txt"),
        )


if __name__ == "__main__":
    main()
