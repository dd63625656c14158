#!/usr/bin/env python3
"""SpeechLM generation CLI (espnet2/bin/speechlm_inference.py analog):
continue discrete-unit prompts autoregressively with the trained unit LM
(greedy or sampled)."""

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
    prompt_file: str,  # 'uid u1 u2 ...' unit-id rows
    train_config: str,
    model_file: Optional[str] = None,
    n_new: int = 32,
    greedy: bool = True,
    seed: int = 0,
):
    from llm_guided_asr_tpu.data.fileio import load_num_sequence_text
    from llm_guided_asr_tpu.models.speechlm import SpeechLM
    from llm_guided_asr_tpu.tasks.generic import GenericTask

    model, variables, config = GenericTask.build_model_from_file(
        train_config, model_file
    )
    sos = model.cfg.unit_vocab_size
    # SpeechLMModel nests the TransformerLM under params['lm']
    lm_vars = {"params": variables["params"]["lm"]}
    from llm_guided_asr_tpu.models.lm import TransformerLM

    lm = TransformerLM(model.cfg.resolve_lm())
    prompts = load_num_sequence_text(prompt_file)
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    key = jax.random.PRNGKey(seed)
    with open(out / "units", "w") as f:
        for uid, seq in prompts.items():
            prompt = jnp.asarray(np.asarray(seq, np.int32)[None])
            key, sub = jax.random.split(key)  # fresh stream per utterance
            cont = SpeechLM.generate(lm, lm_vars, prompt, n_new, sos,
                                     greedy=greedy, key=sub)
            units = [str(int(u)) for u in np.asarray(cont)[0]]
            f.write(f"{uid} {' '.join(units)}\n")
    logger.info(f"generated {len(prompts)} continuations -> {out}")


def main(cmd=None):
    from llm_guided_asr_tpu.utils.config import build_config
    from llm_guided_asr_tpu.utils.devices import resolve_device

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "output_dir": "generated",
        "prompt_file": None,
        "train_config": None,
        "model_file": None,
        "n_new": 32,
        "greedy": True,
        "device": None,
    })
    logging.basicConfig(level=logging.INFO)
    resolve_device(config.get("device"))
    inference(config["output_dir"], config["prompt_file"],
              config["train_config"], config.get("model_file"),
              n_new=int(config.get("n_new", 32)),
              greedy=bool(config.get("greedy", True)))


if __name__ == "__main__":
    main()
