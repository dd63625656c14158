#!/usr/bin/env python3
"""Streaming speech separation CLI
(espnet2/bin/enh_inference_streaming.py analog).

Processes audio in fixed chunks with left/right context, runs the separator
on each padded window and keeps only the chunk core (context trimming), and
stitches the cores. For conv separators (tcn/conformer with bounded
receptive field) the core frames match the offline output once the context
covers the receptive field; recurrent separators are approximate at chunk
boundaries.
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


class SeparateSpeechStreaming:
    def __init__(
        self,
        train_config: Union[str, Path],
        model_file: Optional[Union[str, Path]] = None,
        chunk_samples: int = 16000,
        context_samples: int = 8000,
    ):
        from llm_guided_asr_tpu.tasks.generic import GenericTask

        self.model, self.variables, self.config = GenericTask.build_model_from_file(
            train_config, model_file
        )
        hop = self.model.cfg.hop_length
        # align chunk/context to the STFT hop so every window sees the same
        # frame grid as the offline pass (unaligned starts shift the frame
        # phase and create boundary artifacts)
        self.chunk = max(hop, (chunk_samples // hop) * hop)
        self.ctx = max(hop, (context_samples // hop) * hop)
        win = self.chunk + 2 * self.ctx
        self._separate = jax.jit(
            lambda s, l: self.model.apply(
                self.variables, s, l, method=self.model.separate
            )
        )
        self._win = win

    def __call__(self, speech: np.ndarray) -> List[np.ndarray]:
        n = len(speech)
        num_spk = self.model.cfg.num_spk
        outs = [np.zeros((n,), np.float32) for _ in range(num_spk)]
        hop = self.model.cfg.hop_length
        for start in range(0, max(n, 1), self.chunk):
            # padded window [ctx | chunk | ctx]
            w0 = start - self.ctx
            w1 = start + self.chunk + self.ctx
            window = np.zeros((self._win,), np.float32)
            s0, s1 = max(w0, 0), min(w1, n)
            window[s0 - w0 : s0 - w0 + (s1 - s0)] = speech[s0:s1]
            ests, _ = self._separate(
                jnp.asarray(window[None]), jnp.asarray([self._win])
            )
            core0 = self.ctx
            core1 = min(self.ctx + self.chunk, self.ctx + (n - start))
            for i in range(num_spk):
                est = np.asarray(ests[i, 0])
                outs[i][start : start + (core1 - core0)] = est[core0:core1]
        return outs


def inference(
    output_dir: str,
    wav_scp: str,
    train_config: str,
    model_file: Optional[str] = None,
    chunk_samples: int = 16000,
    context_samples: int = 8000,
):
    from llm_guided_asr_tpu.data.fileio import SoundScpReader, write_wav

    sep = SeparateSpeechStreaming(train_config, model_file,
                                  chunk_samples, context_samples)
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    num_spk = sep.model.cfg.num_spk
    scps = [open(out / f"spk{i + 1}.scp", "w") for i in range(num_spk)]
    reader = SoundScpReader(wav_scp)
    for uid in reader.keys():
        rate, wav = reader[uid]
        for i, est in enumerate(sep(np.asarray(wav, np.float32))):
            p = out / f"{uid}_spk{i + 1}.wav"
            write_wav(p, rate, est)
            scps[i].write(f"{uid} {p}\n")
    for f in scps:
        f.close()
    logger.info(f"stream-separated {len(reader)} utterances -> {out}")


def main(cmd=None):
    from llm_guided_asr_tpu.utils.config import build_config
    from llm_guided_asr_tpu.utils.devices import resolve_device

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "output_dir": "separated_streaming",
        "wav_scp": None,
        "train_config": None,
        "model_file": None,
        "chunk_samples": 16000,
        "context_samples": 8000,
        "device": None,
    })
    logging.basicConfig(level=logging.INFO)
    resolve_device(config.get("device"))
    inference(config["output_dir"], config["wav_scp"], config["train_config"],
              config.get("model_file"),
              chunk_samples=int(config.get("chunk_samples", 16000)),
              context_samples=int(config.get("context_samples", 8000)))


if __name__ == "__main__":
    main()
