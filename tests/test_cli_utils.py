"""CLI utilities: tokenize_text, split_scps, aggregate_stats_dirs, launch.

Rebuild of the reference's stage-support binaries (espnet2/bin/
{tokenize_text,split_scps,aggregate_stats_dirs,launch}.py — VERDICT L1 gap).
"""

import sys
from pathlib import Path

import numpy as np


def test_tokenize_text_and_vocabulary(tmp_path):
    from llm_guided_asr_tpu.bin.tokenize_text import tokenize

    src = tmp_path / "text"
    src.write_text("u1 abc ab\nu2 cab\n")
    out = tmp_path / "tokens"
    tokenize(str(src), str(out), token_type="char")
    lines = out.read_text().splitlines()
    assert lines[0].startswith("u1 ")
    assert lines[0] == "u1 a b c <space> a b"

    vocab = tmp_path / "vocab"
    tokenize(
        str(src), str(vocab), token_type="char", write_vocabulary=True,
        add_symbol=["<blank>:0", "<unk>:1", "<sos/eos>:-1"],
    )
    v = vocab.read_text().splitlines()
    assert v[0] == "<blank>" and v[1] == "<unk>" and v[-1] == "<sos/eos>"
    assert set("abc") <= set(v)


def test_split_scps(tmp_path):
    from llm_guided_asr_tpu.bin.split_scps import split_scps

    scp = tmp_path / "wav.scp"
    scp.write_text("".join(f"utt{i:02d} /p/{i}.wav\n" for i in range(10)))
    out = tmp_path / "split"
    split_scps([str(scp)], 3, str(out))
    shards = [
        (out / f"wav.scp.{n}").read_text().splitlines() for n in (1, 2, 3)
    ]
    assert sum(len(s) for s in shards) == 10
    assert abs(len(shards[0]) - len(shards[2])) <= 1
    all_keys = {l.split()[0] for s in shards for l in s}
    assert len(all_keys) == 10
    assert (out / "num_splits").read_text().strip() == "3"


def test_aggregate_stats_dirs(tmp_path):
    from llm_guided_asr_tpu.bin.aggregate_stats_dirs import aggregate

    for j, n in enumerate([3, 5]):
        d = tmp_path / f"job{j}" / "train"
        d.mkdir(parents=True)
        np.savez(d / "feats_stats.npz", count=n,
                 sum=np.full(4, float(n)), sum_square=np.full(4, 2.0 * n))
        (d / "speech_shape").write_text(f"u{j} {n}\n")
    out = tmp_path / "agg"
    aggregate([str(tmp_path / "job0"), str(tmp_path / "job1")], str(out))
    z = np.load(out / "train" / "feats_stats.npz")
    assert int(z["count"]) == 8
    np.testing.assert_allclose(z["sum"], np.full(4, 8.0))
    shapes = (out / "train" / "speech_shape").read_text().splitlines()
    assert len(shapes) == 2


def test_launch_propagates_env_and_failures(tmp_path):
    import pytest

    from llm_guided_asr_tpu.bin.launch import launch

    script = tmp_path / "worker.py"
    script.write_text(
        "import os, sys\n"
        "rank = os.environ['LLMASR_PROCESS_ID']\n"
        "n = os.environ['LLMASR_NUM_PROCESSES']\n"
        "assert os.environ['LLMASR_COORDINATOR']\n"
        "print(f'rank={rank} n={n}')\n"
    )
    rc = launch([sys.executable, str(script)], num_processes=3,
                log_dir=str(tmp_path / "logs"))
    assert rc == 0
    logs = sorted((tmp_path / "logs").glob("worker.*.log"))
    assert len(logs) == 3
    assert "rank=1 n=3" in logs[1].read_text()

    bad = tmp_path / "bad.py"
    bad.write_text("import sys; sys.exit(3)\n")
    with pytest.raises(RuntimeError, match="exited with 3"):
        launch([sys.executable, str(bad)], num_processes=2,
               log_dir=str(tmp_path / "logs2"))


def test_whisper_export_vocabulary(tmp_path):
    """Id-ordered export with G-marker space conversion, timestamp padding
    to the full model vocab, added tokens, and the SOT speaker-change
    symbol (reference espnet2/bin/whisper_export_vocabulary.py:79-93)."""
    import pytest
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from transformers import PreTrainedTokenizerFast

    from llm_guided_asr_tpu.bin.whisper_export_vocabulary import export_vocabulary

    vocab = {"<unk>": 0, "hello": 1, "Ġworld": 2, "Ġfoo": 3}
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="<unk>")
    tdir = tmp_path / "tok"
    fast.save_pretrained(tdir)

    out = tmp_path / "tokens.txt"
    export_vocabulary(str(out), "whisper_en", str(tdir), full_vocab_size=8)
    lines = out.read_text().split("\n")[:-1]
    assert lines[:4] == ["<unk>", "hello", " world", " foo"]
    assert lines[4:] == ["<|0.00|>", "<|0.02|>", "<|0.04|>", "<|0.06|>"]

    # added tokens extend the full size; sot appends <sc> last
    extra = tmp_path / "extra.txt"
    extra.write_text("<boo>\n<baz>\n")
    export_vocabulary(str(out), "whisper_multilingual", str(tdir),
                      whisper_language="chinese", full_vocab_size=8,
                      add_token_file_name=str(extra), sot_asr=True)
    lines = out.read_text().split("\n")[:-1]
    assert lines[4:6] == ["<boo>", "<baz>"]
    assert len(lines) == 8 + 2 + 1 and lines[-1] == "<sc>"
    assert lines[6:10] == ["<|0.00|>", "<|0.02|>", "<|0.04|>", "<|0.06|>"]

    with pytest.raises(ValueError, match="language unsupported"):
        export_vocabulary(str(out), "whisper_multilingual", str(tdir),
                          whisper_language="klingon", full_vocab_size=8)
    with pytest.raises(ValueError, match="tokenizer unsupported"):
        export_vocabulary(str(out), "whisper_v9", str(tdir))
