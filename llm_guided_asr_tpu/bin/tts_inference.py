#!/usr/bin/env python3
"""TTS synthesis CLI (espnet2/bin/tts_inference.py analog).

Text2Speech: rebuild the FastSpeech2 model from its config.yaml, synthesize
log-mel (saved as .npy + feats.scp) and optionally a waveform via mel
pseudo-inversion + Griffin-Lim (vocoder-less path; neural vocoders are
future work).
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class Text2Speech:
    def __init__(
        self,
        train_config: Union[str, Path],
        model_file: Optional[Union[str, Path]] = None,
        vocoder: str = "griffin_lim",
        fs: int = 16000,
        n_fft: int = 512,
        hop_length: int = 128,
    ):
        from llm_guided_asr_tpu.tasks.asr import build_text_converter
        from llm_guided_asr_tpu.tasks.generic import GenericTask

        self.model, self.variables, self.config = GenericTask.build_model_from_file(
            train_config, model_file
        )
        self.tokenizer, self.converter = build_text_converter(self.config)
        self.vocoder = vocoder
        self.fs, self.n_fft, self.hop_length = fs, n_fft, hop_length
        self._infer = jax.jit(
            lambda text, lens: self.model.apply(
                self.variables, text, lens, method=self.model.inference
            ),
            static_argnames=(),
        )

    def __call__(self, text: str) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """text -> (log-mel [T, M], waveform or None)."""
        ids = self.converter.tokens2ids(self.tokenizer.text2tokens(text))
        arr = jnp.asarray([ids], jnp.int32)
        lens = jnp.asarray([len(ids)], jnp.int32)
        mel, mel_lens = self._infer(arr, lens)
        mel = np.asarray(mel)[0, : int(mel_lens[0])]
        wav = None
        if self.vocoder == "griffin_lim":
            wav = self.mel_to_wav(mel)
        return mel, wav

    def mel_to_wav(self, log_mel: np.ndarray) -> np.ndarray:
        """log-mel -> linear power (filterbank pseudo-inverse) -> Griffin-Lim."""
        from llm_guided_asr_tpu.models.tts import griffin_lim
        from llm_guided_asr_tpu.ops.frontend import mel_filterbank

        fb = mel_filterbank(self.fs, self.n_fft, log_mel.shape[-1])  # [F, M]
        inv = np.linalg.pinv(fb)  # [M, F]
        power = np.maximum(np.exp(log_mel) @ inv, 1e-10)  # [T, F]
        wav = griffin_lim(
            jnp.asarray(power[None]), n_fft=self.n_fft, hop_length=self.hop_length,
            n_iters=24,
        )
        return np.asarray(wav)[0]


def main(cmd=None):
    from llm_guided_asr_tpu.data.fileio import read_2columns_text, write_wav
    from llm_guided_asr_tpu.utils.config import build_config
    from llm_guided_asr_tpu.utils.devices import resolve_device

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "output_dir": "synthesized",
        "text": None,  # 'uid text' file
        "train_config": None,
        "model_file": None,
        "vocoder": "griffin_lim",
        "device": None,
    })
    logging.basicConfig(level=logging.INFO)
    resolve_device(config.get("device"))
    t2s = Text2Speech(config["train_config"], config.get("model_file"),
                      vocoder=config.get("vocoder", "griffin_lim"))
    out = Path(config["output_dir"])
    out.mkdir(parents=True, exist_ok=True)
    texts = read_2columns_text(config["text"])
    with open(out / "feats.scp", "w") as scp:
        for uid, text in texts.items():
            mel, wav = t2s(text)
            np.save(out / f"{uid}.npy", mel)
            scp.write(f"{uid} {out / f'{uid}.npy'}\n")
            if wav is not None:
                write_wav(out / f"{uid}.wav", t2s.fs, wav)
    logger.info(f"synthesized {len(texts)} utterances -> {out}")


if __name__ == "__main__":
    main()
