#!/usr/bin/env python3
"""Transducer inference entry (espnet2/bin/asr_transducer_inference.py shim):
asr_inference dispatches on the model's joint network automatically
(--transducer_search default|alsd|tsd|nsc|mbg selects the search)."""


def main(cmd=None):
    import sys

    from llm_guided_asr_tpu.bin.asr_inference import main as inf_main

    inf_main(list(cmd if cmd is not None else sys.argv[1:]))


if __name__ == "__main__":
    main()
