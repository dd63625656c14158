#!/usr/bin/env python3
"""CTC forced alignment CLI (espnet2/bin/asr_align.py analog).

Aligns each transcript to its audio via Viterbi over the blank-interleaved
CTC graph (ops/ctc_align.py) and writes Kaldi-style ``segments`` rows
``<uid>_<idx> <uid> <start_s> <end_s>`` plus a per-token ``aligned`` file
``<uid> token:start:end ...`` (seconds).
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


def align(
    output_dir: str,
    wav_scp: str,
    text: str,
    asr_train_config: str,
    asr_model_file: Optional[str] = None,
    fs: int = 16000,
):
    from llm_guided_asr_tpu.bin.asr_inference import Speech2Text
    from llm_guided_asr_tpu.data.dataset import round_up
    from llm_guided_asr_tpu.data.fileio import SoundScpReader, read_2columns_text
    from llm_guided_asr_tpu.ops.ctc_align import ctc_forced_align, token_boundaries

    s2t = Speech2Text(asr_train_config, asr_model_file, beam_size=1,
                      ctc_weight=1.0)
    model, variables = s2t.model, s2t.variables
    # frame period: frontend hop x encoder subsampling (conv2d = 4x)
    fcfg = model.cfg.frontend
    hop_s = (fcfg.hop_length if fcfg is not None else 160) / fs
    sub = 4 if model.cfg.encoder.input_layer == "conv2d" else 1
    frame_s = hop_s * sub

    reader = SoundScpReader(wav_scp)
    texts = read_2columns_text(text)
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    enc_fn = jax.jit(lambda s, l: model.apply(variables, s, l, method=model.encode))
    logp_fn = jax.jit(lambda e: model.apply(variables, e, method=model.ctc_log_softmax))
    n_done = 0
    with open(out / "segments", "w") as seg, open(out / "aligned", "w") as alf:
        for uid in reader.keys():
            if uid not in texts:
                continue
            rate, wav = reader[uid]
            tokens = s2t.tokenizer.text2tokens(texts[uid])
            ids = s2t.converter.tokens2ids(tokens)
            if not ids:
                continue
            n = len(wav)
            padded = np.zeros((round_up(max(n, 1), s2t.speech_pad_multiple),),
                              np.float32)
            padded[: n] = wav
            enc, enc_lens = enc_fn(jnp.asarray(padded[None]), jnp.asarray([n]))
            logp = logp_fn(enc)[0]  # [T, V]
            states, toks = jax.device_get(ctc_forced_align(
                logp, jnp.asarray(ids, jnp.int32), enc_lens[0]
            ))
            bounds = token_boundaries(toks, len(ids))
            parts = []
            for u, (tok, (b0, b1)) in enumerate(zip(tokens, bounds)):
                t0, t1 = b0 * frame_s, b1 * frame_s
                seg.write(f"{uid}_{u:04d} {uid} {t0:.3f} {t1:.3f}\n")
                parts.append(f"{tok}:{t0:.3f}:{t1:.3f}")
            alf.write(f"{uid} {' '.join(parts)}\n")
            n_done += 1
    logger.info(f"aligned {n_done} utterances -> {out}")


def main(cmd=None):
    from llm_guided_asr_tpu.utils.config import build_config
    from llm_guided_asr_tpu.utils.devices import resolve_device

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "output_dir": "aligned",
        "wav_scp": None,
        "text": None,
        "asr_train_config": None,
        "asr_model_file": None,
        "device": None,
    })
    logging.basicConfig(level=logging.INFO)
    resolve_device(config.get("device"))
    align(config["output_dir"], config["wav_scp"], config["text"],
          config["asr_train_config"], config.get("asr_model_file"))


if __name__ == "__main__":
    main()
