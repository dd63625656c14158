#!/usr/bin/env python3
"""UASR inference CLI (espnet2/bin/uasr_inference.py analog): greedy phone
decoding from the GAN generator's frame-level phone distribution (collapse
repeats, drop silence/blank id 0)."""

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
):
    from llm_guided_asr_tpu.data.dataset import round_up
    from llm_guided_asr_tpu.data.fileio import SoundScpReader, read_2columns_text
    import dataclasses

    from llm_guided_asr_tpu.models.uasr import ConvGenerator, UASRConfig, join_logit_segment
    from llm_guided_asr_tpu.ops.frontend import FrontendConfig, default_frontend
    from llm_guided_asr_tpu.train.checkpoint import load_pytree
    from llm_guided_asr_tpu.utils.config import load_yaml, read_token_list

    config = load_yaml(Path(train_config))
    mc = dict(config.get("model_conf", {}) or {})
    token_list = (
        read_token_list(config["token_list"]) if config.get("token_list") else None
    )
    n_phones = len(token_list) if token_list else int(mc.get("n_phones", 40))
    fcfg = FrontendConfig.from_dict(config.get("frontend_conf", {}) or {})
    known = {f.name for f in dataclasses.fields(UASRConfig)}
    cfg = UASRConfig(
        n_phones=n_phones, feat_dim=fcfg.n_mels,
        **{k: v for k, v in mc.items()
           if k in known and k not in ("n_phones", "feat_dim")},
    )
    gen = ConvGenerator(cfg)
    ckpt = model_file or Path(train_config).parent / "checkpoint.msgpack"
    g_params = load_pytree(ckpt)["generator"]

    @jax.jit
    def decode_fn(speech, lens):
        feats, flens = default_frontend(
            speech, lens, fs=fcfg.fs, n_fft=fcfg.n_fft,
            hop_length=fcfg.hop_length, n_mels=fcfg.n_mels,
        )
        # batch-stat BN at inference (running stats aren't carried through
        # the two-optimizer loop; deviation documented in models/uasr.py),
        # dropout off
        (logits, _, olens), _ = gen.apply(
            {"params": g_params}, feats, flens,
            deterministic=True, bn_use_running=False, mutable=["batch_stats"],
        )
        if cfg.segmenter == "join":
            logits, olens = join_logit_segment(
                logits, olens, mean_pool_join=True,
                remove_zeros=cfg.segmenter_remove_zeros,
            )
        return jnp.argmax(logits, -1), olens

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    reader = SoundScpReader(wav_scp)
    n = 0
    with open(out / "token", "w") as f:
        for uid in reader.keys():
            rate, wav = reader[uid]
            ns = len(wav)
            padded = np.zeros((round_up(max(ns, 1), 16000),), np.float32)
            padded[:ns] = wav
            ids, olens = jax.device_get(
                decode_fn(jnp.asarray(padded[None]), jnp.asarray([ns]))
            )
            seq = ids[0, : int(olens[0])]
            # collapse repeats, drop blank/sil id 0 (ctc-style readout)
            outp = []
            prev = -1
            for i in seq:
                if i != prev and i != 0:
                    outp.append(int(i))
                prev = i
            toks = ([token_list[i] for i in outp if i < len(token_list)]
                    if token_list else [str(i) for i in outp])
            f.write(f"{uid} {' '.join(toks)}\n")
            n += 1
    logger.info(f"decoded {n} utterances -> {out}")


def main(cmd=None):
    from llm_guided_asr_tpu.utils.config import build_config
    from llm_guided_asr_tpu.utils.devices import resolve_device

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "output_dir": "uasr_decoded",
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
