#!/usr/bin/env python3
"""Export an HF tokenizer's vocabulary as an ESPnet token list.

Rebuild of espnet2/bin/hugging_face_export_vocabulary.py (asr.sh:957
hugging_face token_type): writes one token per line ordered by token id, so
token-list index == LLM vocabulary id (run.sh:36-37 two-phase workflow).
"""

from __future__ import annotations

import logging
import sys

logger = logging.getLogger(__name__)


def export_vocabulary(model_name_or_path: str, output: str = "-"):
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(model_name_or_path)
    vocab = tok.get_vocab()  # token -> id
    inv = {i: t for t, i in vocab.items()}
    size = max(inv) + 1
    out = sys.stdout if output == "-" else open(output, "w", encoding="utf-8")
    with out:
        for i in range(size):
            out.write(inv.get(i, f"<unused_{i}>") + "\n")
    logger.info(f"exported {size} tokens from {model_name_or_path}")


def main(cmd=None):
    from llm_guided_asr_tpu.utils.config import build_config

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "model_name_or_path": None, "output": "-",
    })
    logging.basicConfig(level=logging.INFO)
    export_vocabulary(config["model_name_or_path"], config.get("output", "-"))


if __name__ == "__main__":
    main()
