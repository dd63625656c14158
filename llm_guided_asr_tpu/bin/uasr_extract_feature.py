#!/usr/bin/env python3
"""UASR feature extraction CLI (espnet2/bin/uasr_extract_feature.py analog):
dump the frontend features the UASR GAN consumes (log-mel + MVN) as .npy +
feats.scp, for offline clustering/phonemization."""

from __future__ import annotations

import logging
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def main(cmd=None):
    from llm_guided_asr_tpu.data.dataset import round_up
    from llm_guided_asr_tpu.data.fileio import SoundScpReader
    from llm_guided_asr_tpu.ops.frontend import (
        FrontendConfig,
        default_frontend,
        utterance_mvn,
    )
    from llm_guided_asr_tpu.utils.config import build_config
    from llm_guided_asr_tpu.utils.devices import resolve_device

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "output_dir": "uasr_feats",
        "wav_scp": None,
        "frontend_conf": {},
        "device": None,
    })
    logging.basicConfig(level=logging.INFO)
    resolve_device(config.get("device"))
    fcfg = FrontendConfig.from_dict(config.get("frontend_conf", {}) or {})

    @jax.jit
    def feats_fn(speech, lens):
        f, fl = default_frontend(
            speech, lens, fs=fcfg.fs, n_fft=fcfg.n_fft,
            hop_length=fcfg.hop_length, n_mels=fcfg.n_mels,
        )
        return utterance_mvn(f, fl), fl

    out = Path(config["output_dir"])
    out.mkdir(parents=True, exist_ok=True)
    reader = SoundScpReader(config["wav_scp"])
    n = 0
    with open(out / "feats.scp", "w") as scp:
        for uid in reader.keys():
            rate, wav = reader[uid]
            ns = len(wav)
            padded = np.zeros((round_up(max(ns, 1), 16000),), np.float32)
            padded[:ns] = wav
            f, fl = jax.device_get(
                feats_fn(jnp.asarray(padded[None]), jnp.asarray([ns]))
            )
            np.save(out / f"{uid}.npy", f[0, : int(fl[0])])
            scp.write(f"{uid} {out / f'{uid}.npy'}\n")
            n += 1
    logger.info(f"extracted features for {n} utterances -> {out}")


if __name__ == "__main__":
    main()
