#!/usr/bin/env python3
"""Language-ID inference entry (espnet2/bin/s2t_inference_language.py shim):
s2t_inference with mode=language."""


def main(cmd=None):
    import sys

    from llm_guided_asr_tpu.bin.s2t_inference import main as inf_main

    inf_main(["--mode", "language"] + list(cmd if cmd is not None else sys.argv[1:]))


if __name__ == "__main__":
    main()
