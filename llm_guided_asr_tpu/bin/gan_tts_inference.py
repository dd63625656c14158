#!/usr/bin/env python3
"""End-to-end GAN TTS synthesis CLI (VITS / JETS; the reference exposes
these through espnet2/bin/tts_inference.py's tts choices).

Rebuilds the generator from the gan_tts/gan_svs/jets exp's config.yaml,
loads the generator params from its checkpoint and synthesizes waveforms
directly (no separate vocoder)."""

from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def _build_generator(config):
    task = config.get("task")
    mc = dict(config.get("model_conf", {}) or {})
    from llm_guided_asr_tpu.utils.config import read_token_list

    vocab = (
        len(read_token_list(config["token_list"]))
        if config.get("token_list") else int(mc.get("vocab_size", 100))
    )
    if task == "jets":
        from llm_guided_asr_tpu.models.jets import JETSConfig, JETSGenerator

        cfg = JETSConfig(
            vocab_size=vocab, n_mels=int(mc.get("n_mels", 40)),
            adim=int(mc.get("adim", 128)), heads=int(mc.get("heads", 2)),
            eunits=int(mc.get("eunits", 256)),
            elayers=int(mc.get("elayers", 2)),
            dlayers=int(mc.get("dlayers", 2)),
            segment_frames=int(mc.get("segment_frames", 16)),
            n_fft=int(mc.get("n_fft", 256)),
            hop_length=int(mc.get("hop_length", 128)),
        )
        return JETSGenerator(cfg), "jets"
    # gan_tts / gan_svs: VITS generator
    from llm_guided_asr_tpu.models.vits import VITSConfig, VITSGenerator

    n_fft = int(mc.get("n_fft", 256))
    cfg = VITSConfig(
        vocab_size=vocab, spec_channels=n_fft // 2 + 1,
        hidden=int(mc.get("hidden", 64)),
        text_layers=int(mc.get("text_layers", 2)),
        text_heads=int(mc.get("text_heads", 2)),
        text_ffn=int(mc.get("text_ffn", 128)),
        posterior_layers=int(mc.get("posterior_layers", 3)),
        flow_layers=int(mc.get("flow_layers", 2)),
        segment_frames=int(mc.get("segment_frames", 16)),
        n_fft=n_fft, hop_length=int(mc.get("hop_length", 128)),
        n_mels=int(mc.get("n_mels", 40)),
        n_midi=int(mc.get("n_midi", 129)) if task == "gan_svs" else 0,
    )
    return VITSGenerator(cfg), "vits"


def inference(
    output_dir: str,
    text: str,
    train_config: str,
    model_file: Optional[str] = None,
    fs: int = 16000,
    max_frames: int = 400,
):
    from llm_guided_asr_tpu.data.fileio import read_2columns_text, write_wav
    from llm_guided_asr_tpu.tasks.asr import build_text_converter
    from llm_guided_asr_tpu.train.checkpoint import load_pytree
    from llm_guided_asr_tpu.utils.config import load_yaml

    config = load_yaml(Path(train_config))
    gen, kind = _build_generator(config)
    ckpt = model_file or Path(train_config).parent / "checkpoint.msgpack"
    params = load_pytree(ckpt)["generator"]
    tokenizer, converter = build_text_converter(config)
    hop = (gen.cfg.hop_length if kind == "jets"
           else (config.get("model_conf") or {}).get("hop_length", 128))

    if kind == "jets":
        infer = jax.jit(lambda t, l: gen.apply(
            {"params": params}, t, l, t_max=max_frames, method=gen.inference
        ))
    else:
        infer = jax.jit(lambda t, l: gen.apply(
            {"params": params}, t, l, max_frames=max_frames,
            method=gen.inference,
        ))

    texts = read_2columns_text(text)
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    n = 0
    with open(out / "wav.scp", "w") as scp:
        for uid, line in texts.items():
            ids = converter.tokens2ids(tokenizer.text2tokens(line))
            if not ids:
                continue
            wav, nlen = jax.device_get(infer(
                jnp.asarray([ids], jnp.int32),
                jnp.asarray([len(ids)], jnp.int32),
            ))
            # jets returns sample count; vits returns frame count
            nsamp = int(nlen[0]) if kind == "jets" else int(nlen[0]) * int(hop)
            p = out / f"{uid}.wav"
            write_wav(p, fs, np.asarray(wav)[0, :max(nsamp, 1)])
            scp.write(f"{uid} {p}\n")
            n += 1
    logger.info(f"synthesized {n} utterances ({kind}) -> {out}")


def main(cmd=None):
    from llm_guided_asr_tpu.utils.config import build_config
    from llm_guided_asr_tpu.utils.devices import resolve_device

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "output_dir": "gan_tts_synthesized",
        "text": None,
        "train_config": None,
        "model_file": None,
        "max_frames": 400,
        "device": None,
    })
    logging.basicConfig(level=logging.INFO)
    resolve_device(config.get("device"))
    inference(config["output_dir"], config["text"], config["train_config"],
              config.get("model_file"),
              max_frames=int(config.get("max_frames", 400)))


if __name__ == "__main__":
    main()
