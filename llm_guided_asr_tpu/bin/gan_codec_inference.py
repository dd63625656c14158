#!/usr/bin/env python3
"""Neural-codec inference CLI (espnet2/bin/gan_codec_inference.py analog):
encode a wav.scp to discrete codes and reconstruct waveforms through the
decoder; writes codes (.npy + codes.scp) and resynthesized wavs."""

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
    train_config: str,
    model_file: Optional[str] = None,
    fs: int = 16000,
):
    from llm_guided_asr_tpu.data.dataset import round_up
    from llm_guided_asr_tpu.data.fileio import SoundScpReader, write_wav
    from llm_guided_asr_tpu.models.codec import CodecConfig, CodecModel
    from llm_guided_asr_tpu.train.checkpoint import load_pytree
    from llm_guided_asr_tpu.utils.config import load_yaml

    config = load_yaml(Path(train_config))
    mc = dict(config.get("model_conf", {}) or {})
    cfg = CodecConfig(
        channels=int(mc.get("channels", 64)),
        latent_dim=int(mc.get("latent_dim", 64)),
        strides=tuple(mc.get("strides", (4, 4, 8))),
        n_quantizers=int(mc.get("n_quantizers", 4)),
        codebook_size=int(mc.get("codebook_size", 256)),
    )
    codec = CodecModel(cfg)
    ckpt = model_file or Path(train_config).parent / "checkpoint.msgpack"
    loaded = load_pytree(ckpt)
    # gan_codec checkpoints hold {generator, discriminator}; the plain codec
    # task holds the model params directly
    params = loaded.get("generator", loaded.get("params", loaded))

    stride = 1
    for s in cfg.strides:
        stride *= s
    enc_fn = jax.jit(lambda s: codec.apply({"params": params}, s,
                                           method=codec.encode))
    dec_fn = jax.jit(lambda c: codec.apply({"params": params}, c,
                                           method=codec.decode_codes))
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    reader = SoundScpReader(wav_scp)
    n = 0
    with open(out / "codes.scp", "w") as cs, open(out / "wav.scp", "w") as ws:
        for uid in reader.keys():
            rate, wav = reader[uid]
            ns = len(wav)
            padded = np.zeros((round_up(max(ns, 1), stride * 4),), np.float32)
            padded[:ns] = wav
            codes = jax.device_get(enc_fn(jnp.asarray(padded[None])))  # [1,T,Q]
            recon = jax.device_get(dec_fn(jnp.asarray(codes)))[0, :ns]
            np.save(out / f"{uid}_codes.npy", codes[0])
            cs.write(f"{uid} {out / f'{uid}_codes.npy'}\n")
            p = out / f"{uid}.wav"
            write_wav(p, rate, recon)
            ws.write(f"{uid} {p}\n")
            n += 1
    logger.info(f"coded+resynthesized {n} utterances -> {out}")


def main(cmd=None):
    from llm_guided_asr_tpu.utils.config import build_config
    from llm_guided_asr_tpu.utils.devices import resolve_device

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "output_dir": "codec_out",
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
