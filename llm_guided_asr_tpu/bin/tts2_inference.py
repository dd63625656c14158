#!/usr/bin/env python3
"""Discrete-unit TTS inference CLI (espnet2/bin/tts2_inference.py analog):
text -> unit sequence via the shared on-device beam search (CTC-less), with
optional codec resynthesis to waveform (--codec_config/--codec_model)."""

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
    text: str,
    train_config: str,
    model_file: Optional[str] = None,
    beam_size: int = 5,
    maxlenratio: float = -96.0,
    codec_config: Optional[str] = None,
    codec_model: Optional[str] = None,
    fs: int = 16000,
):
    from llm_guided_asr_tpu.data.fileio import read_2columns_text, write_wav
    from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch
    from llm_guided_asr_tpu.tasks.asr import build_text_converter
    from llm_guided_asr_tpu.tasks.generic import GenericTask

    from llm_guided_asr_tpu.models.tts2 import FastSpeech2Discrete

    model, variables, config = GenericTask.build_model_from_file(
        train_config, model_file
    )
    tokenizer, converter = build_text_converter(config)
    cfg = model.cfg
    non_ar = isinstance(model, FastSpeech2Discrete)
    beam = None if non_ar else BatchBeamSearch(
        model, variables, vocab_size=cfg.unit_vocab_size + 1,
        sos=cfg.sos_id, eos=cfg.eos_id, beam_size=beam_size, ctc_weight=0.0,
    )
    dec_codes = None
    if codec_config:
        from llm_guided_asr_tpu.models.codec import CodecConfig, CodecModel
        from llm_guided_asr_tpu.train.checkpoint import load_pytree
        from llm_guided_asr_tpu.utils.config import load_yaml

        ccfg_d = dict(load_yaml(codec_config).get("model_conf", {}) or {})
        ccfg = CodecConfig(
            channels=int(ccfg_d.get("channels", 64)),
            latent_dim=int(ccfg_d.get("latent_dim", 64)),
            strides=tuple(ccfg_d.get("strides", (4, 4, 8))),
            n_quantizers=int(ccfg_d.get("n_quantizers", 4)),
            codebook_size=int(ccfg_d.get("codebook_size", 256)),
        )
        codec = CodecModel(ccfg)
        loaded = load_pytree(codec_model or
                             Path(codec_config).parent / "checkpoint.msgpack")
        cparams = loaded.get("generator", loaded.get("params", loaded))

        def dec_codes(units):  # first-quantizer stream; rest zero
            codes = np.zeros((1, len(units), ccfg.n_quantizers), np.int32)
            codes[0, :, 0] = np.clip(units, 0, ccfg.codebook_size - 1)
            return np.asarray(codec.apply({"params": cparams},
                                          jnp.asarray(codes),
                                          method=codec.decode_codes))[0]

    texts = read_2columns_text(text)
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    n = 0
    with open(out / "units", "w") as uf:
        for uid, line in texts.items():
            ids = converter.tokens2ids(tokenizer.text2tokens(line))
            if not ids:
                continue
            if non_ar:
                pred, flens = model.apply(
                    variables, jnp.asarray([ids], jnp.int32),
                    jnp.asarray([len(ids)], jnp.int32), method=model.inference,
                )
                units = np.asarray(pred[0][: int(flens[0])]).reshape(-1).tolist()
            else:
                enc, enc_lens = model.apply(
                    variables, jnp.asarray([ids], jnp.int32),
                    jnp.asarray([len(ids)], jnp.int32), method=model.encode,
                )
                hyps = beam(enc, enc_lens, maxlenratio=maxlenratio)
                units = [i for i in hyps[0].yseq if i != cfg.unit_sos]
            uf.write(f"{uid} {' '.join(str(u) for u in units)}\n")
            if dec_codes is not None and units:
                write_wav(out / f"{uid}.wav", fs, dec_codes(units))
            n += 1
    logger.info(f"synthesized {n} unit sequences -> {out}")


def main(cmd=None):
    from llm_guided_asr_tpu.utils.config import build_config
    from llm_guided_asr_tpu.utils.devices import resolve_device

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "output_dir": "tts2_synthesized",
        "text": None,
        "train_config": None,
        "model_file": None,
        "beam_size": 5,
        "codec_config": None,
        "codec_model": None,
        "device": None,
    })
    logging.basicConfig(level=logging.INFO)
    resolve_device(config.get("device"))
    inference(config["output_dir"], config["text"], config["train_config"],
              config.get("model_file"),
              beam_size=int(config.get("beam_size", 5)),
              codec_config=config.get("codec_config"),
              codec_model=config.get("codec_model"))


if __name__ == "__main__":
    main()
