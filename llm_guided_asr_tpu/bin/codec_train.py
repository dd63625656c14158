#!/usr/bin/env python3
"""codec training entry point (espnet2/bin/codec_train.py 2-line shim analog)."""


def main(cmd=None):
    import sys

    from llm_guided_asr_tpu.bin.train import main as train_main

    train_main(["--task", "codec"] + list(cmd if cmd is not None else sys.argv[1:]))


if __name__ == "__main__":
    main()
