#!/usr/bin/env python3
"""gan_codec training entry point (espnet2/bin/gan_codec_train.py 2-line shim analog)."""


def main(cmd=None):
    import sys

    from llm_guided_asr_tpu.bin.train import main as train_main

    train_main(["--task", "gan_codec"] + list(cmd if cmd is not None else sys.argv[1:]))


if __name__ == "__main__":
    main()
