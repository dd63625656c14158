#!/usr/bin/env python3
"""Contextual-biasing inference entry (espnet2/bin/asr_inference_new.py shim).

The fork's `_new` variant adds per-utterance biasing-word injection; the
repo's asr_inference carries that natively via --biasing_words_file
(bin/asr_inference.py make_bias_ctx). This shim exists for reference
CLI-name parity.
"""


def main(cmd=None):
    import sys

    from llm_guided_asr_tpu.bin.asr_inference import main as inf_main

    inf_main(list(cmd if cmd is not None else sys.argv[1:]))


if __name__ == "__main__":
    main()
