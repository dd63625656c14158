"""End-to-end slice: synthetic tone corpus -> collect_stats -> train -> decode.

This is the mini_an4 integration analog (SURVEY.md §4): a tiny corpus where
each character maps to a pure tone, so a small model must reach ~0 CER.  It
exercises the real build path: YAML config -> ASRTask.main -> checkpoints ->
Speech2Text from the config.yaml artifact -> greedy + beam decode -> CER.
"""

import pytest

pytestmark = pytest.mark.slow

import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

from llm_guided_asr_tpu.data.fileio import write_wav
from llm_guided_asr_tpu.utils.metrics import cer

SR = 16000
TONES = {"a": 400.0, "b": 900.0, "c": 1900.0}
TOKEN_LIST = ["<blank>", "<unk>", "a", "b", "c", "<sos/eos>"]


def synth(text: str, rng) -> np.ndarray:
    chunks = [np.zeros(int(0.05 * SR), np.float32)]
    for ch in text:
        t = np.arange(int(0.15 * SR)) / SR
        tone = 0.5 * np.sin(2 * np.pi * TONES[ch] * t).astype(np.float32)
        chunks.append(tone)
        chunks.append(np.zeros(int(0.05 * SR), np.float32))
    wav = np.concatenate(chunks)
    return wav + 0.01 * rng.standard_normal(len(wav)).astype(np.float32)


def make_corpus(root: Path, n_train=24, n_valid=6, seed=0):
    rng = np.random.default_rng(seed)
    chars = list(TONES)
    for split, n in [("train", n_train), ("valid", n_valid)]:
        d = root / split
        d.mkdir(parents=True)
        with open(d / "wav.scp", "w") as wscp, open(d / "text", "w") as tf:
            for i in range(n):
                text = "".join(rng.choice(chars) for _ in range(rng.integers(2, 6)))
                uid = f"{split}_{i:03d}"
                wav = synth(text, rng)
                write_wav(d / f"{uid}.wav", SR, wav)
                wscp.write(f"{uid} {d / f'{uid}.wav'}\n")
                tf.write(f"{uid} {text}\n")


@pytest.fixture(scope="module")
def exp(tmp_path_factory):
    """Build corpus, collect stats, train; return paths."""
    from llm_guided_asr_tpu.tasks.asr import ASRTask

    root = tmp_path_factory.mktemp("tone_corpus")
    make_corpus(root)
    token_file = root / "tokens.txt"
    token_file.write_text("\n".join(TOKEN_LIST) + "\n")

    exp_dir = root / "exp"
    config = {
        "token_type": "char",
        "token_list": str(token_file),
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 23},
        "normalize": "global_mvn",
        "encoder": "conformer",
        "encoder_conf": {
            "output_size": 32, "attention_heads": 2, "linear_units": 64,
            "num_blocks": 2, "macaron_style": True, "use_cnn_module": True,
            "cnn_module_kernel": 7, "dropout_rate": 0.0,
            "positional_dropout_rate": 0.0, "attention_dropout_rate": 0.0,
        },
        "decoder_conf": {
            "attention_heads": 2, "linear_units": 64, "num_blocks": 2,
            "dropout_rate": 0.0, "positional_dropout_rate": 0.0,
        },
        "model_conf": {"ctc_weight": 0.5, "lsm_weight": 0.1},
        "optim": "adam",
        "optim_conf": {"lr": 0.003},
        "scheduler": "warmuplr",
        "scheduler_conf": {"warmup_steps": 60},
        "batch_type": "sorted",
        "batch_size": 8,
        "max_epoch": 28,
        "keep_nbest_models": 3,
        "best_model_criterion": [["valid", "loss", "min"]],
        "log_interval": 20,
        "speech_pad_multiple": 4000,
        "text_pad_multiple": 4,
        "train_data_path_and_name_and_type": [
            [str(root / "train" / "wav.scp"), "speech", "sound"],
            [str(root / "train" / "text"), "text", "text"],
        ],
        "valid_data_path_and_name_and_type": [
            [str(root / "valid" / "wav.scp"), "speech", "sound"],
            [str(root / "valid" / "text"), "text", "text"],
        ],
        "output_dir": str(exp_dir),
    }
    cfg_file = root / "train.yaml"
    cfg_file.write_text(yaml.safe_dump(config))

    # stage 10: collect stats
    stats_dir = root / "stats"
    ASRTask.main([
        "--config", str(cfg_file), "--collect_stats", "true",
        "--output_dir", str(stats_dir),
    ])
    assert (stats_dir / "train" / "feats_stats.npz").exists()
    assert (stats_dir / "train" / "speech_shape").exists()

    # stage 11: train
    ASRTask.main([
        "--config", str(cfg_file),
        "--normalize_conf", f"stats_file={stats_dir / 'train' / 'feats_stats.npz'}",
    ])
    assert (exp_dir / "config.yaml").exists()
    assert (exp_dir / "valid.loss.best.msgpack").exists()
    ave = list(exp_dir.glob("valid.loss.ave_*best.msgpack"))
    assert ave, "n-best average artifact missing"
    return {"root": root, "exp": exp_dir, "ave": ave[0]}


def _refs(root: Path):
    refs = {}
    for line in (root / "valid" / "text").read_text().splitlines():
        uid, txt = line.split(maxsplit=1)
        refs[uid] = txt
    return refs


def test_greedy_decode_cer(exp):
    from llm_guided_asr_tpu.bin.asr_inference import Speech2Text
    from llm_guided_asr_tpu.data.fileio import SoundScpReader

    s2t = Speech2Text(
        exp["exp"] / "config.yaml", exp["ave"], ctc_weight=1.0, beam_size=1,
        speech_pad_multiple=4000,
    )
    refs = _refs(exp["root"])
    reader = SoundScpReader(exp["root"] / "valid" / "wav.scp")
    hyps = {}
    for uid in reader.keys():
        _, wav = reader[uid]
        hyps[uid] = s2t(wav)[0][0]
    uids = sorted(refs)
    rate = cer([refs[u] for u in uids], [hyps[u] for u in uids])
    print("greedy CER:", rate, {u: (refs[u], hyps[u]) for u in uids})
    assert rate <= 10.0, f"greedy CER too high: {rate} ({hyps})"


def test_beam_decode_cer(exp):
    from llm_guided_asr_tpu.bin.asr_inference import Speech2Text
    from llm_guided_asr_tpu.data.fileio import SoundScpReader

    s2t = Speech2Text(
        exp["exp"] / "config.yaml", exp["ave"], ctc_weight=0.3, beam_size=5,
        speech_pad_multiple=4000,
    )
    refs = _refs(exp["root"])
    reader = SoundScpReader(exp["root"] / "valid" / "wav.scp")
    hyps = {}
    scores = {}
    for uid in reader.keys():
        _, wav = reader[uid]
        text, tokens, ids, hyp = s2t(wav)[0]
        hyps[uid] = text
        scores[uid] = hyp.score
    uids = sorted(refs)
    rate = cer([refs[u] for u in uids], [hyps[u] for u in uids])
    print("beam CER:", rate, {u: (refs[u], hyps[u]) for u in uids})
    assert rate <= 10.0, f"beam CER too high: {rate} ({hyps})"
    assert all(np.isfinite(s) for s in scores.values())


def test_inference_cli_writes_datadir(exp, tmp_path):
    from llm_guided_asr_tpu.bin.asr_inference import inference

    out = tmp_path / "decode"
    inference(
        str(out),
        [[str(exp["root"] / "valid" / "wav.scp"), "speech", "sound"]],
        str(exp["exp"] / "config.yaml"),
        str(exp["ave"]),
        ctc_weight=1.0, beam_size=1, speech_pad_multiple=4000,
    )
    text = (out / "1best_recog" / "text").read_text().splitlines()
    assert len(text) == 6
