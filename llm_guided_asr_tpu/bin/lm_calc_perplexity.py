#!/usr/bin/env python3
"""Corpus perplexity CLI (espnet2/bin/lm_calc_perplexity.py analog):
thin shim over tasks/lm.calc_perplexity."""

from __future__ import annotations

import logging
import sys

logger = logging.getLogger(__name__)


def main(cmd=None):
    from llm_guided_asr_tpu.tasks.lm import calc_perplexity
    from llm_guided_asr_tpu.utils.config import build_config
    from llm_guided_asr_tpu.utils.devices import resolve_device

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "train_config": None,
        "model_file": None,
        "data_path_and_name_and_type": [],
        "batch_size": 32,
        "output_dir": None,
        "device": None,
    })
    logging.basicConfig(level=logging.INFO)
    resolve_device(config.get("device"))
    ppl = calc_perplexity(
        config["train_config"], config["model_file"],
        config["data_path_and_name_and_type"],
        batch_size=int(config.get("batch_size", 32)),
    )
    print(f"perplexity: {ppl:.4f}")
    if config.get("output_dir"):
        from pathlib import Path

        out = Path(config["output_dir"])
        out.mkdir(parents=True, exist_ok=True)
        (out / "perplexity").write_text(f"{ppl}\n")
    return ppl


if __name__ == "__main__":
    main()
