#!/usr/bin/env python3
"""Split scp files into N balanced shards (espnet2/bin/split_scps.py).

Used by asr.sh stage 12 to split decode jobs (`--scps wav.scp --num_splits N
--output_dir split`): writes <output_dir>/<name>.{1..N} plus num_splits.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

logger = logging.getLogger(__name__)


def split_scps(scps, num_splits: int, output_dir: str):
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    if num_splits < 1:
        raise ValueError("num_splits must be >= 1")
    key_sets = None
    for scp in scps:
        lines = Path(scp).read_text().splitlines()
        keys = [ln.split(maxsplit=1)[0] for ln in lines if ln.strip()]
        if key_sets is None:
            key_sets = keys
        # shard by position in the FIRST scp's key order so parallel files
        # stay aligned (split_scps.py keeps line correspondence)
        order = {k: i for i, k in enumerate(key_sets)}
        lines = [ln for ln in lines if ln.strip()]
        lines.sort(key=lambda ln: order.get(ln.split(maxsplit=1)[0], 1 << 30))
        name = Path(scp).name
        for n in range(num_splits):
            shard = lines[n::num_splits]
            (out / f"{name}.{n + 1}").write_text(
                "\n".join(shard) + ("\n" if shard else "")
            )
    (out / "num_splits").write_text(f"{num_splits}\n")
    logger.info(f"split {len(scps)} scp file(s) into {num_splits} shards -> {out}")


def main(cmd=None):
    from llm_guided_asr_tpu.utils.config import build_config

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "scps": [], "num_splits": 1, "output_dir": "split",
    })
    logging.basicConfig(level=logging.INFO)
    scps = config["scps"]
    if isinstance(scps, str):
        scps = [scps]
    split_scps(scps, int(config["num_splits"]), config["output_dir"])


if __name__ == "__main__":
    main()
