"""espnetez-style high-level API: in-memory dataset -> train -> decode."""

import pytest

pytestmark = pytest.mark.slow

from pathlib import Path

import numpy as np
import pytest

import llm_guided_asr_tpu.ez as ez

TOKEN_LIST = ["<blank>", "<unk>", "a", "b", "c", "<sos/eos>"]


def make_data(n, seed=0):
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from test_e2e_tiny import synth

    rng = np.random.default_rng(seed)
    chars = ["a", "b", "c"]
    data = {}
    for i in range(n):
        text = "".join(rng.choice(chars) for _ in range(rng.integers(2, 5)))
        data[f"utt{i:03d}"] = {"speech": synth(text, rng), "text": text}
    return data


def test_ez_train_and_stats(tmp_path):
    tokens = tmp_path / "tokens.txt"
    tokens.write_text("\n".join(TOKEN_LIST) + "\n")
    config = {
        "token_type": "char",
        "token_list": str(tokens),
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 23},
        "normalize": "global_mvn",
        "encoder_conf": {"output_size": 16, "attention_heads": 2, "linear_units": 32,
                         "num_blocks": 1, "use_cnn_module": False, "dropout_rate": 0.0,
                         "positional_dropout_rate": 0.0},
        "decoder_conf": {"attention_heads": 2, "linear_units": 32, "num_blocks": 1,
                         "dropout_rate": 0.0, "positional_dropout_rate": 0.0},
        "model_conf": {"ctc_weight": 0.5},
        "optim": "adam", "optim_conf": {"lr": 0.003},
        "scheduler": "none",
        "batch_type": "sorted", "batch_size": 8, "max_epoch": 2,
        "keep_nbest_models": 1, "speech_pad_multiple": 4000, "text_pad_multiple": 4,
    }
    trainer = ez.Trainer(
        task="asr", config=config,
        train_dataset=make_data(8), valid_dataset=make_data(2, seed=1),
        output_dir=tmp_path / "exp",
    )
    stats = trainer.collect_stats()
    assert stats.exists()
    trainer.train()
    assert (tmp_path / "exp" / "valid.loss.best.msgpack").exists()
    assert (tmp_path / "exp" / "config.yaml").exists()

    # the artifact is Speech2Text-compatible
    from llm_guided_asr_tpu.bin.asr_inference import Speech2Text

    s2t = Speech2Text(
        tmp_path / "exp" / "config.yaml",
        tmp_path / "exp" / "valid.loss.best.msgpack",
        ctc_weight=1.0, beam_size=1, speech_pad_multiple=4000,
    )
    text, tokens_, ids, hyp = s2t(make_data(1, seed=2)["utt000"]["speech"])[0]
    assert isinstance(text, str)


def test_ez_generic_task_enh(tmp_path):
    """ez.Trainer over a generic-domain task (espnetez covers all tasks)."""
    import numpy as np

    import llm_guided_asr_tpu.ez as ez

    rng = np.random.default_rng(0)
    t = np.arange(4000) / 16000.0
    s1 = (0.4 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    s2 = (0.4 * np.sin(2 * np.pi * 1500 * t)).astype(np.float32)

    def mk(n):
        return {
            f"u{i}": {"speech_mix": s1 + s2, "speech_ref1": s1,
                      "speech_ref2": s2}
            for i in range(n)
        }

    trainer = ez.Trainer(
        task="enh",
        config={
            "model_conf": {"num_spk": 2, "n_fft": 256, "hop_length": 128,
                           "separator_type": "tcn", "hidden": 16, "layers": 1},
            "token_list": None, "batch_type": "unsorted", "batch_size": 4,
            "max_epoch": 2, "optim": "adam", "optim_conf": {"lr": 0.002},
            "scheduler": "none", "keep_nbest_models": 1,
            "speech_pad_multiple": 4000,
        },
        train_dataset=mk(4),
        valid_dataset=mk(2),
        output_dir=tmp_path / "exp",
    )
    trainer.train()
    assert (tmp_path / "exp" / "checkpoint.msgpack").exists()
