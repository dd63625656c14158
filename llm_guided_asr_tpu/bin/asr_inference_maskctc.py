#!/usr/bin/env python3
"""MaskCTC inference entry (espnet2/bin/asr_inference_maskctc.py shim).

The repo's asr_inference dispatches to the MaskCTC iterative decode
automatically when the model is a MaskCTCModel (bin/asr_inference.py:254);
this shim exists for reference CLI-name parity.
"""


def main(cmd=None):
    import sys

    from llm_guided_asr_tpu.bin.asr_inference import main as inf_main

    inf_main(list(cmd if cmd is not None else sys.argv[1:]))


if __name__ == "__main__":
    main()
