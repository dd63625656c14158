#!/usr/bin/env python3
"""LM generation CLI (espnet2/bin/lm_inference.py analog): continue text
prompts autoregressively with a trained LM (greedy or temperature
sampling)."""

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
    text: str,  # 'uid prompt...' file
    train_config: str,
    model_file: Optional[str] = None,
    n_new: int = 30,
    temperature: float = 0.0,  # 0 = greedy
    seed: int = 0,
):
    from llm_guided_asr_tpu.tasks.asr import build_text_converter
    from llm_guided_asr_tpu.tasks.lm import LMTask
    from llm_guided_asr_tpu.data.fileio import read_2columns_text

    model, variables, config = LMTask.build_model_from_file(
        train_config, model_file
    )
    tokenizer, converter = build_text_converter(config)
    vocab = model.vocab_size
    sos = vocab - 1

    @jax.jit
    def next_logits(ids, length):
        # run the inner LM (ESPnetLanguageModel wraps it; __call__ is the nll)
        logits = model.apply(
            variables, ids, length,
            method=lambda mdl, x, l: mdl.lm(x, l, True),
        )
        return logits[jnp.arange(ids.shape[0]), length - 1]

    texts = read_2columns_text(text)
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    key = jax.random.PRNGKey(seed)
    with open(out / "text", "w") as f:
        for uid, prompt in texts.items():
            ids = [sos] + converter.tokens2ids(tokenizer.text2tokens(prompt))
            buf = np.full((1, len(ids) + n_new), 0, np.int32)
            buf[0, : len(ids)] = ids
            cur = len(ids)
            for _ in range(n_new):
                lg = next_logits(jnp.asarray(buf), jnp.asarray([cur]))
                if temperature > 0:
                    key, sub = jax.random.split(key)
                    nxt = int(jax.random.categorical(sub, lg[0] / temperature))
                else:
                    nxt = int(jnp.argmax(lg[0]))
                if nxt == sos:  # eos
                    break
                buf[0, cur] = nxt
                cur += 1
            cont = [int(i) for i in buf[0, len(ids):cur]]
            textout = tokenizer.tokens2text(converter.ids2tokens(cont))
            f.write(f"{uid} {textout}\n")
    logger.info(f"generated {len(texts)} continuations -> {out}")


def main(cmd=None):
    from llm_guided_asr_tpu.utils.config import build_config
    from llm_guided_asr_tpu.utils.devices import resolve_device

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "output_dir": "lm_generated",
        "text": None,
        "train_config": None,
        "model_file": None,
        "n_new": 30,
        "temperature": 0.0,
        "device": None,
    })
    logging.basicConfig(level=logging.INFO)
    resolve_device(config.get("device"))
    inference(config["output_dir"], config["text"], config["train_config"],
              config.get("model_file"), n_new=int(config.get("n_new", 30)),
              temperature=float(config.get("temperature", 0.0)))


if __name__ == "__main__":
    main()
