#!/usr/bin/env python3
"""ASR training CLI (espnet2/bin/asr_train.py analog)."""


def main(cmd=None):
    import sys

    from llm_guided_asr_tpu.tasks.asr import ASRTask

    ASRTask.main(cmd if cmd is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
