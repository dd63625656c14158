#!/usr/bin/env python3
"""TTS synthesis CLI (espnet2/bin/tts_inference.py analog).

Text2Speech: rebuild the FastSpeech2 model from its config.yaml, synthesize
log-mel (saved as .npy + feats.scp) and optionally a waveform — via mel
pseudo-inversion + Griffin-Lim, or a neural vocoder (hifigan/melgan) trained
by the 'vocoder' GAN task (--vocoder hifigan --vocoder_file ...).
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
        vocoder: str = "griffin_lim",  # griffin_lim | hifigan | melgan
        vocoder_file: Optional[str] = None,  # vocoder-task checkpoint.msgpack
        vocoder_config: Optional[str] = None,  # its exp config.yaml
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
        self._voc_apply = None
        if vocoder in ("hifigan", "melgan"):
            # neural vocoder trained by the 'vocoder' GAN task: its
            # checkpoint holds {"generator": params}
            from llm_guided_asr_tpu.models.hifigan import (
                HiFiGANConfig,
                HiFiGANGenerator,
                MelGANGenerator,
            )
            from llm_guided_asr_tpu.train.checkpoint import load_pytree
            from llm_guided_asr_tpu.utils.config import load_yaml

            if not vocoder_file:
                raise ValueError(f"vocoder={vocoder!r} needs vocoder_file")
            vmc = {}
            if vocoder_config:
                vmc = dict(load_yaml(vocoder_config).get("model_conf", {}) or {})
            rates = tuple(vmc.get("upsample_rates", (8, 8, 2)))
            hcfg = HiFiGANConfig(
                n_mels=int(vmc.get("n_mels", 40)),
                channels=int(vmc.get("channels", 64)),
                upsample_rates=rates,
                upsample_kernels=tuple(
                    vmc.get("upsample_kernels", tuple(2 * r for r in rates))
                ),
            )
            voc = (MelGANGenerator(hcfg) if vocoder == "melgan"
                   else HiFiGANGenerator(hcfg))
            voc_params = load_pytree(vocoder_file)["generator"]
            self._voc_apply = jax.jit(
                lambda mel: voc.apply({"params": voc_params}, mel)
            )
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
        if self._voc_apply is not None:
            wav = np.asarray(self._voc_apply(jnp.asarray(mel[None])))[0]
        elif self.vocoder == "griffin_lim":
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
        "vocoder_file": None,
        "vocoder_config": None,
        "device": None,
    })
    logging.basicConfig(level=logging.INFO)
    resolve_device(config.get("device"))
    t2s = Text2Speech(config["train_config"], config.get("model_file"),
                      vocoder=config.get("vocoder", "griffin_lim"),
                      vocoder_file=config.get("vocoder_file"),
                      vocoder_config=config.get("vocoder_config"))
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
