"""Full recipe pipeline (stages 3-13) on the tone corpus — the mini_an4
integration analog (ci/test_integration_espnet2.sh)."""

import json
import sys
from pathlib import Path

import pytest
import yaml


def test_pipeline_stages_3_to_13(tmp_path, capsys):
    sys.path.insert(0, str(Path(__file__).parent))
    from test_e2e_tiny import make_corpus

    from llm_guided_asr_tpu.bin.asr_pipeline import main as pipeline_main

    root = tmp_path / "data"
    make_corpus(root, n_train=24, n_valid=6)
    train_cfg = {
        "token_type": "char",
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 23},
        "normalize": "global_mvn",
        "encoder": "conformer",
        "encoder_conf": {"output_size": 32, "attention_heads": 2, "linear_units": 64,
                         "num_blocks": 2, "macaron_style": True, "use_cnn_module": True,
                         "cnn_module_kernel": 7, "dropout_rate": 0.0,
                         "positional_dropout_rate": 0.0},
        "decoder_conf": {"attention_heads": 2, "linear_units": 64, "num_blocks": 2,
                         "dropout_rate": 0.0, "positional_dropout_rate": 0.0},
        "model_conf": {"ctc_weight": 0.5, "lsm_weight": 0.1},
        "optim": "adam", "optim_conf": {"lr": 0.003},
        "scheduler": "warmuplr", "scheduler_conf": {"warmup_steps": 60},
        "batch_type": "sorted", "batch_size": 8, "max_epoch": 20,
        "keep_nbest_models": 3, "log_interval": 100,
        "speech_pad_multiple": 4000, "text_pad_multiple": 4,
    }
    cfg_file = tmp_path / "train.yaml"
    cfg_file.write_text(yaml.safe_dump(train_cfg))

    expdir = tmp_path / "exp"
    pipeline_main([
        "--config", str(cfg_file),
        "--train_dir", str(root / "train"),
        "--valid_dir", str(root / "valid"),
        "--expdir", str(expdir),
        "--stage", "3", "--stop_stage", "13",
        "--beam_size", "5", "--ctc_weight", "0.3",
    ])
    # artifacts of every stage
    assert (expdir / "data" / "train" / "utt2num_samples").exists()      # 3/4
    tokens = (expdir / "tokens.txt").read_text().splitlines()            # 5
    assert tokens[0] == "<blank>" and tokens[-1] == "<sos/eos>"
    assert set("abc") <= set(tokens)
    assert (expdir / "stats" / "train" / "feats_stats.npz").exists()     # 10
    assert (expdir / "train" / "config.yaml").exists()                   # 11
    assert (expdir / "decode" / "valid" / "1best_recog" / "text").exists()  # 12
    result = json.loads((expdir / "score" / "valid" / "result.json").read_text())  # 13
    assert result["metric"] == "CER"
    assert result["err"] <= 15.0, f"pipeline CER too high: {result}"
