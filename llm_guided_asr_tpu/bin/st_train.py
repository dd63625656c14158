#!/usr/bin/env python3
"""ST training CLI (espnet2/bin/st_train.py analog)."""


def main(cmd=None):
    import sys

    from llm_guided_asr_tpu.tasks.st import STTask

    STTask.main(cmd if cmd is not None else sys.argv[1:])


if __name__ == "__main__":
    main()
