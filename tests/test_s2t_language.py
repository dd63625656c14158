"""Language identification via the s2t CLI (s2t_inference_language.py analog).

Trains a tiny OWSM-style S2T model on a 2-"language" tone corpus whose
targets begin with a <lang> token, then asserts Speech2Language recovers
the language from the first decoder step's distribution over the lang-sym
id range (reference espnet2/bin/s2t_inference_language.py:24-135).
"""

from pathlib import Path

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow

SR = 16000


def _make_corpus(root: Path):
    from llm_guided_asr_tpu.data.fileio import write_wav

    # lang0 <-> 400 Hz, lang1 <-> 2000 Hz; text = "<langX> a b"
    rng = np.random.default_rng(0)
    for split, n in [("train", 8), ("valid", 2)]:
        d = root / split
        d.mkdir(parents=True)
        with open(d / "wav.scp", "w") as w, open(d / "text", "w") as t, open(
            d / "text_ctc", "w"
        ) as c:
            for i in range(n):
                lang = i % 2
                freq = 400 if lang == 0 else 2000
                tt = np.arange(3200) / SR
                sig = (
                    0.4 * np.sin(2 * np.pi * freq * tt)
                    + 0.01 * rng.standard_normal(3200)
                ).astype(np.float32)
                p = d / f"u{i}.wav"
                write_wav(p, SR, sig)
                uid = f"u{i:02d}"
                w.write(f"{uid} {p}\n")
                t.write(f"{uid} {'<lang0>' if lang == 0 else '<lang1>'} a b\n")
                c.write(f"{uid} a b\n")


def test_s2t_language_identification(tmp_path):
    from llm_guided_asr_tpu.tasks.generic import GenericTask

    _make_corpus(tmp_path / "data")
    tokens = tmp_path / "tokens.txt"
    tokens.write_text(
        "\n".join(["<blank>", "<unk>", "<lang0>", "<lang1>", "a", "b", "<sos/eos>"])
        + "\n"
    )
    exp = tmp_path / "exp"
    root = tmp_path / "data"
    cfg = {
        "task": "s2t",
        "token_list": str(tokens),
        "token_type": "word",
        "model_conf": {"ctc_weight": 0.3},
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 16},
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 24, "num_blocks": 1,
                         "use_cnn_module": False},
        "decoder_conf": {"attention_heads": 2, "linear_units": 24,
                         "num_blocks": 1},
        "optim": "adam", "optim_conf": {"lr": 5e-3}, "scheduler": "none",
        "batch_type": "unsorted", "batch_size": 8, "max_epoch": 30,
        "keep_nbest_models": 1, "log_interval": 50,
        "speech_pad_multiple": 3200,
        "train_data_path_and_name_and_type": [
            [str(root / "train" / "wav.scp"), "speech", "sound"],
            [str(root / "train" / "text"), "text", "text"],
            [str(root / "train" / "text_ctc"), "text_ctc", "text"]],
        "valid_data_path_and_name_and_type": [
            [str(root / "valid" / "wav.scp"), "speech", "sound"],
            [str(root / "valid" / "text"), "text", "text"],
            [str(root / "valid" / "text_ctc"), "text_ctc", "text"]],
        "output_dir": str(exp),
    }
    (tmp_path / "c.yaml").write_text(yaml.safe_dump(cfg))
    GenericTask.main(["--config", str(tmp_path / "c.yaml")])

    from llm_guided_asr_tpu.bin.s2t_inference import Speech2Language, inference_language

    s2l = Speech2Language(
        str(exp / "config.yaml"), str(next(exp.glob("*.best.msgpack"))),
        first_lang_sym="<lang0>", last_lang_sym="<lang1>", nbest=2,
    )
    from llm_guided_asr_tpu.data.fileio import SoundScpReader

    reader = SoundScpReader(str(root / "valid" / "wav.scp"))
    expected = {"u00": "<lang0>", "u01": "<lang1>"}
    for uid in reader.keys():
        _, wav = reader[uid]
        results = s2l(np.asarray(wav, np.float32))
        assert len(results) == 2
        lang, prob = results[0]
        assert lang == expected[uid], f"{uid}: {results}"
        assert prob > 0.7
        # probabilities over the lang span sum to 1
        assert abs(sum(p for _, p in results) - 1.0) < 1e-4

    # CLI wrapper writes DatadirWriter files
    inference_language(
        str(tmp_path / "langid"), str(root / "valid" / "wav.scp"),
        str(exp / "config.yaml"), str(next(exp.glob("*.best.msgpack"))),
        first_lang_sym="<lang0>", last_lang_sym="<lang1>", nbest=1,
    )
    out = dict(
        line.split(maxsplit=1)
        for line in (tmp_path / "langid" / "1best_recog" / "text")
        .read_text().strip().splitlines()
    )
    assert {k: v.strip() for k, v in out.items()} == expected
