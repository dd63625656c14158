#!/usr/bin/env python3
"""Transducer training entry (espnet2/bin/asr_transducer_train.py shim):
ASRTask with model=transducer."""


def main(cmd=None):
    import sys

    from llm_guided_asr_tpu.tasks.asr import ASRTask

    ASRTask.main(["--model", "transducer"]
                 + list(cmd if cmd is not None else sys.argv[1:]))


if __name__ == "__main__":
    main()
