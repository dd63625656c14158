#!/usr/bin/env python3
"""Speech separation/enhancement inference (espnet2/bin/enh_inference.py analog).

SeparateSpeech: rebuild the enh model from its config.yaml artifact and
separate a wav.scp into per-source wav files + spk{n}.scp listings.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class SeparateSpeech:
    def __init__(
        self,
        train_config: Union[str, Path],
        model_file: Optional[Union[str, Path]] = None,
        speech_pad_multiple: int = 4000,
    ):
        from llm_guided_asr_tpu.tasks.generic import GenericTask

        self.model, self.variables, self.config = GenericTask.build_model_from_file(
            train_config, model_file
        )
        self.speech_pad_multiple = speech_pad_multiple
        self._separate = jax.jit(
            lambda s, l: self.model.apply(self.variables, s, l, method=self.model.separate)
        )

    def __call__(self, speech: np.ndarray) -> List[np.ndarray]:
        from llm_guided_asr_tpu.data.dataset import round_up

        n = len(speech)
        padded = np.zeros((round_up(max(n, 1), self.speech_pad_multiple),), np.float32)
        padded[:n] = speech
        ests, _ = self._separate(jnp.asarray(padded[None]), jnp.asarray([n]))
        return [np.asarray(ests[i, 0, :n]) for i in range(ests.shape[0])]


def inference(
    output_dir: str,
    wav_scp: str,
    train_config: str,
    model_file: Optional[str] = None,
    fs: int = 16000,
):
    from llm_guided_asr_tpu.data.fileio import SoundScpReader, write_wav

    sep = SeparateSpeech(train_config, model_file)
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    num_spk = sep.model.cfg.num_spk
    scps = [open(out / f"spk{i + 1}.scp", "w") for i in range(num_spk)]
    reader = SoundScpReader(wav_scp)
    for uid in reader.keys():
        rate, wav = reader[uid]
        for i, est in enumerate(sep(wav)):
            p = out / f"{uid}_spk{i + 1}.wav"
            write_wav(p, rate, est)
            scps[i].write(f"{uid} {p}\n")
    for f in scps:
        f.close()
    logger.info(f"separated {len(reader)} utterances -> {out}")


def main(cmd=None):
    from llm_guided_asr_tpu.utils.config import build_config
    from llm_guided_asr_tpu.utils.devices import resolve_device

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "output_dir": "separated",
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
