#!/usr/bin/env python3
"""Speaker inference entry (espnet2/bin/spk_inference.py shim): embedding
extraction + optional trial scoring lives in spk_embed_extract."""


def main(cmd=None):
    import sys

    from llm_guided_asr_tpu.bin.spk_embed_extract import main as inf_main

    inf_main(list(cmd if cmd is not None else sys.argv[1:]))


if __name__ == "__main__":
    main()
