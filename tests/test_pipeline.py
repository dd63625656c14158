"""Full recipe pipeline (stages 3-13) on the tone corpus — the mini_an4
integration analog (ci/test_integration_espnet2.sh)."""

import pytest

pytestmark = pytest.mark.slow

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
        "--stage", "1", "--stop_stage", "15",
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
    assert (expdir / "pack" / "asr_model.zip").exists()                   # 14
    card = (expdir / "pack" / "README.md").read_text()                    # 15
    assert "automatic-speech-recognition" in card and "Results" in card

    # multi-job decode splitting (asr.sh:1480): re-decode with decode_nj=2,
    # merged outputs must equal the single-job decode
    single = dict(
        line.split(maxsplit=1)
        for line in (expdir / "decode" / "valid" / "1best_recog" / "text")
        .read_text().splitlines()
    )
    expdir2 = tmp_path / "exp_nj2"
    import shutil

    shutil.copytree(expdir, expdir2)
    shutil.rmtree(expdir2 / "decode")
    pipeline_main([
        "--config", str(cfg_file),
        "--train_dir", str(root / "train"),
        "--valid_dir", str(root / "valid"),
        "--expdir", str(expdir2),
        "--stage", "12", "--stop_stage", "12",
        "--beam_size", "5", "--ctc_weight", "0.3",
        "--decode_nj", "2",
    ])
    merged = dict(
        line.split(maxsplit=1)
        for line in (expdir2 / "decode" / "valid" / "1best_recog" / "text")
        .read_text().splitlines()
    )
    assert merged == single


def test_pipeline_lm_ngram_stages(tmp_path):
    """Stages 6-9: LM training, perplexity, ngram ARPA; LM fuses at decode."""
    sys.path.insert(0, str(Path(__file__).parent))
    from test_e2e_tiny import make_corpus

    from llm_guided_asr_tpu.bin.asr_pipeline import main as pipeline_main

    root = tmp_path / "data"
    make_corpus(root, n_train=16, n_valid=4)
    train_cfg = {
        "token_type": "char",
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 23},
        "normalize": "global_mvn",
        "encoder": "conformer",
        "encoder_conf": {"output_size": 32, "attention_heads": 2, "linear_units": 64,
                         "num_blocks": 1, "macaron_style": True, "use_cnn_module": True,
                         "cnn_module_kernel": 7, "dropout_rate": 0.0,
                         "positional_dropout_rate": 0.0},
        "decoder_conf": {"attention_heads": 2, "linear_units": 64, "num_blocks": 1,
                         "dropout_rate": 0.0, "positional_dropout_rate": 0.0},
        "model_conf": {"ctc_weight": 0.5, "lsm_weight": 0.1},
        "optim": "adam", "optim_conf": {"lr": 0.003},
        "scheduler": "warmuplr", "scheduler_conf": {"warmup_steps": 40},
        "batch_type": "sorted", "batch_size": 8, "max_epoch": 6,
        "keep_nbest_models": 2, "log_interval": 100,
        "speech_pad_multiple": 4000, "text_pad_multiple": 4,
    }
    lm_cfg = {
        "lm": "transformer", "max_epoch": 5, "batch_size": 8,
        "lm_conf": {"att_unit": 32, "head": 2, "unit": 64, "layer": 1,
                    "dropout_rate": 0.0},
        "optim": "adam", "optim_conf": {"lr": 0.002},
    }
    cfg_file = tmp_path / "train.yaml"
    cfg_file.write_text(yaml.safe_dump(train_cfg))
    lm_file = tmp_path / "lm.yaml"
    lm_file.write_text(yaml.safe_dump(lm_cfg))

    expdir = tmp_path / "exp"
    pipeline_main([
        "--config", str(cfg_file),
        "--train_dir", str(root / "train"),
        "--valid_dir", str(root / "valid"),
        "--expdir", str(expdir),
        "--stage", "3", "--stop_stage", "13",
        "--use_lm", "true", "--lm_config", str(lm_file), "--lm_weight", "0.2",
        "--use_ngram", "true", "--ngram_order", "2",
        "--beam_size", "3", "--ctc_weight", "0.3",
    ])
    assert (expdir / "lm" / "config.yaml").exists()                      # 6-7
    ppl = float((expdir / "lm" / "perplexity_valid").read_text())        # 8
    assert ppl > 1.0
    arpa = expdir / "ngram" / "2gram.arpa"                               # 9
    assert arpa.exists()
    from llm_guided_asr_tpu.search.ngram import ArpaLM

    lm = ArpaLM(arpa)
    assert lm.order == 2
    assert (expdir / "decode" / "valid" / "1best_recog" / "text").exists()
    # per-utterance alignment report (stage 13)
    rpt = (expdir / "score" / "valid" / "result.txt").read_text()
    assert "Scores: (#C #S #D #I)" in rpt and "REF:" in rpt and "HYP:" in rpt
    assert (expdir / "score" / "valid" / "per_utt.txt").exists()


def test_pipeline_stage1_rejects_mismatched_ids(tmp_path):
    from llm_guided_asr_tpu.bin.asr_pipeline import main as pipeline_main

    for split in ("train", "valid"):
        d = tmp_path / split
        d.mkdir()
        (d / "wav.scp").write_text("u1 a.wav\nu2 b.wav\n")
        (d / "text").write_text("u1 ab\nu3 ba\n")  # u2/u3 mismatch
    with pytest.raises(ValueError, match="utt-id mismatch"):
        pipeline_main([
            "--train_dir", str(tmp_path / "train"),
            "--valid_dir", str(tmp_path / "valid"),
            "--expdir", str(tmp_path / "exp"),
            "--stage", "1", "--stop_stage", "1",
        ])
