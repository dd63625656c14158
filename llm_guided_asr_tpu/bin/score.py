#!/usr/bin/env python3
"""WER/CER scoring of Kaldi-style ref/hyp text files (stage-13 sclite analog).

Reads two 'uttid text...' files, aligns with the native Levenshtein aligner,
and writes a result report (asr.sh:1621-1726 scoring, minus SCTK).
"""

from __future__ import annotations

import json
import logging
import sys
from pathlib import Path

from llm_guided_asr_tpu.data.fileio import read_2columns_text
from llm_guided_asr_tpu.utils.metrics import error_rate

logger = logging.getLogger(__name__)


def score(
    ref_file: str,
    hyp_file: str,
    output_dir: str = None,
    token_type: str = "word",
) -> dict:
    refs = read_2columns_text(ref_file)
    hyps = read_2columns_text(hyp_file)
    uids = sorted(set(refs) & set(hyps))
    missing = sorted(set(refs) - set(hyps))
    if missing:
        logger.warning(f"{len(missing)} utterances missing from hyp")

    def split(s):
        return s.split() if token_type == "word" else list(s.replace(" ", ""))

    result = error_rate(
        (split(refs[u]) for u in uids), (split(hyps[u]) for u in uids)
    )
    result["metric"] = "WER" if token_type == "word" else "CER"
    if output_dir:
        out = Path(output_dir)
        out.mkdir(parents=True, exist_ok=True)
        with open(out / "result.json", "w") as f:
            json.dump(result, f, indent=1)
    return result


def main(cmd=None):
    from llm_guided_asr_tpu.utils.config import build_config

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "ref": None, "hyp": None, "output_dir": None, "token_type": "word",
    })
    logging.basicConfig(level=logging.INFO)
    result = score(config["ref"], config["hyp"], config.get("output_dir"),
                   config.get("token_type", "word"))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
