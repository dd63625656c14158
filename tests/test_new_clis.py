"""New CLI surface: per-task train shims, asr_align, enh_scoring,
lm_calc_perplexity, domain inference CLIs (espnet2/bin/* analogs)."""

import importlib
import wave
from pathlib import Path

import numpy as np
import pytest
import yaml

SHIMS = [
    "enh", "spk", "tts", "hubert", "s2t", "diar", "mt", "slu", "asvspoof",
    "s2st", "svs", "codec", "speechlm", "tts2", "uasr", "gan_tts", "gan_svs",
    "gan_codec", "jets", "vocoder", "pit_asr", "discrete_asr", "enh_s2t",
    "enh_tse",
]

CLIS = [
    "asr_align", "lm_calc_perplexity", "enh_scoring", "diar_inference",
    "enh_inference_streaming", "asr_transducer_train",
    "asr_transducer_inference", "enh_tse_inference", "lm_inference",
    "gan_tts_inference", "uasr_extract_feature",
    "slu_inference", "asvspoof_inference", "uasr_inference",
    "gan_codec_inference", "mt_inference", "speechlm_inference",
    "st_inference", "s2t_inference", "svs_inference", "tts2_inference",
    "s2st_inference",
]


@pytest.mark.parametrize("name", SHIMS)
def test_train_shims_importable(name):
    mod = importlib.import_module(f"llm_guided_asr_tpu.bin.{name}_train")
    assert callable(mod.main)


@pytest.mark.parametrize("name", CLIS)
def test_clis_importable(name):
    mod = importlib.import_module(f"llm_guided_asr_tpu.bin.{name}")
    assert callable(mod.main)


def _write_wav(p, x, rate=16000):
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(x, -1, 1) * 32767).astype(np.int16).tobytes())


def test_enh_scoring_prefers_matching_sources(tmp_path):
    rng = np.random.default_rng(0)
    t = np.arange(4000) / 16000.0
    s1 = 0.5 * np.sin(2 * np.pi * 440 * t)
    s2 = 0.5 * np.sin(2 * np.pi * 1320 * t)
    for name, sig in [("r1", s1), ("r2", s2),
                      ("e1", s2 + 0.01 * rng.standard_normal(4000)),
                      ("e2", s1 + 0.01 * rng.standard_normal(4000))]:
        _write_wav(tmp_path / f"{name}.wav", sig)
    for name in ("r1", "r2", "e1", "e2"):
        (tmp_path / f"{name}.scp").write_text(f"utt0 {tmp_path / f'{name}.wav'}\n")
    from llm_guided_asr_tpu.bin.enh_scoring import main

    # ests are swapped: permutation-resolved scoring must still be high
    avg = main(["--output_dir", str(tmp_path / "scored"),
                "--ref_scps", f"{tmp_path}/r1.scp,{tmp_path}/r2.scp",
                "--est_scps", f"{tmp_path}/e1.scp,{tmp_path}/e2.scp"])
    assert avg > 20.0
    line = (tmp_path / "scored" / "si_snr_per_utt").read_text()
    assert "perm=[1, 0]" in line


@pytest.mark.slow
def test_asr_align_recovers_tone_order(tmp_path):
    """Train a tiny 2-token model on tone pairs, then forced alignment puts
    the first token before the second."""
    import subprocess
    import sys

    rng = np.random.default_rng(0)
    tokens = tmp_path / "tokens.txt"
    tokens.write_text("\n".join(["<blank>", "<unk>", "a", "b", "<sos/eos>"]) + "\n")
    for split in ("train", "valid"):
        d = tmp_path / split
        d.mkdir()
        n = 6 if split == "train" else 2
        with open(d / "wav.scp", "w") as fw, open(d / "text", "w") as ft:
            for i in range(n):
                u = f"utt{i}"
                t = np.arange(3200) / 16000.0
                first, second = (400, 900) if i % 2 == 0 else (900, 400)
                x = np.concatenate([
                    0.5 * np.sin(2 * np.pi * first * t),
                    0.5 * np.sin(2 * np.pi * second * t),
                ])
                _write_wav(d / f"{u}.wav", x)
                fw.write(f"{u} {d / f'{u}.wav'}\n")
                ft.write(f"{u} {'ab' if i % 2 == 0 else 'ba'}\n")
    exp = tmp_path / "exp"
    cfg = {
        "token_list": str(tokens), "token_type": "char",
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 20},
        "normalize": "utterance_mvn",
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 24, "num_blocks": 1,
                         "use_cnn_module": False, "input_layer": "linear"},
        "decoder_conf": {"attention_heads": 2, "linear_units": 24,
                         "num_blocks": 1},
        "model_conf": {"ctc_weight": 1.0},
        "optim": "adam", "optim_conf": {"lr": 0.01}, "scheduler": "none",
        "batch_type": "unsorted", "batch_size": 6, "max_epoch": 8,
        "keep_nbest_models": 1, "log_interval": 50,
        "speech_pad_multiple": 6400, "text_pad_multiple": 4,
        "train_data_path_and_name_and_type": [
            [str(tmp_path / "train" / "wav.scp"), "speech", "sound"],
            [str(tmp_path / "train" / "text"), "text", "text"]],
        "valid_data_path_and_name_and_type": [
            [str(tmp_path / "valid" / "wav.scp"), "speech", "sound"],
            [str(tmp_path / "valid" / "text"), "text", "text"]],
        "output_dir": str(exp),
    }
    (tmp_path / "c.yaml").write_text(yaml.safe_dump(cfg))
    from llm_guided_asr_tpu.tasks.asr import ASRTask

    ASRTask.main(["--config", str(tmp_path / "c.yaml")])

    from llm_guided_asr_tpu.bin.asr_align import align

    align(str(tmp_path / "aligned"),
          str(tmp_path / "valid" / "wav.scp"),
          str(tmp_path / "valid" / "text"),
          str(exp / "config.yaml"),
          str(next(exp.glob("*.best.msgpack"))))
    aligned = (tmp_path / "aligned" / "aligned").read_text().splitlines()
    assert len(aligned) == 2
    for line in aligned:
        uid, *parts = line.split()
        # two tokens, ordered, within the utterance (0.4 s)
        assert len(parts) == 2
        t0s = [float(p.split(":")[1]) for p in parts]
        t1s = [float(p.split(":")[2]) for p in parts]
        assert t0s[0] < t0s[1] and t1s[0] <= t1s[1] + 1e-6
        assert all(0.0 <= v <= 0.45 for v in t0s + t1s)
    segs = (tmp_path / "aligned" / "segments").read_text().splitlines()
    assert len(segs) == 4


@pytest.mark.slow
def test_tts2_inference_emits_units(tmp_path):
    """Train a tiny discrete-unit TTS then synthesize units via the CLI."""
    from llm_guided_asr_tpu.tasks.generic import GenericTask

    rng = np.random.default_rng(0)
    tokens = tmp_path / "tokens.txt"
    tokens.write_text("\n".join(["<blank>", "<unk>", "a", "b", "<sos/eos>"]) + "\n")
    for split in ("train", "valid"):
        d = tmp_path / split
        d.mkdir()
        n = 6 if split == "train" else 2
        with open(d / "text", "w") as ft, open(d / "units", "w") as fu:
            for i in range(n):
                u = f"utt{i}"
                ft.write(f"{u} ab\n")
                fu.write(f"{u} 1 2 3 4\n")
    exp = tmp_path / "exp"
    cfg = {
        "task": "tts2", "token_list": str(tokens),
        "model_conf": {"unit_vocab_size": 8, "adim": 16, "heads": 2,
                       "units": 24, "elayers": 1},
        "decoder_conf": {"attention_heads": 2, "linear_units": 24,
                         "num_blocks": 1},
        "optim": "adam", "optim_conf": {"lr": 0.01}, "scheduler": "none",
        "batch_type": "unsorted", "batch_size": 6, "max_epoch": 15,
        "keep_nbest_models": 1, "log_interval": 50, "text_pad_multiple": 4,
        "train_data_path_and_name_and_type": [
            [str(tmp_path / "train" / "text"), "text", "text"],
            [str(tmp_path / "train" / "units"), "units", "text_int"]],
        "valid_data_path_and_name_and_type": [
            [str(tmp_path / "valid" / "text"), "text", "text"],
            [str(tmp_path / "valid" / "units"), "units", "text_int"]],
        "output_dir": str(exp),
    }
    (tmp_path / "c.yaml").write_text(yaml.safe_dump(cfg))
    GenericTask.main(["--config", str(tmp_path / "c.yaml")])

    from llm_guided_asr_tpu.bin.tts2_inference import inference

    (tmp_path / "in_text").write_text("q1 ab\n")
    inference(str(tmp_path / "synth"), str(tmp_path / "in_text"),
              str(exp / "config.yaml"),
              str(next(exp.glob("*.best.msgpack"))), beam_size=3,
              maxlenratio=-8.0)
    line = (tmp_path / "synth" / "units").read_text().strip()
    uid, *units = line.split()
    assert uid == "q1" and len(units) >= 1
    # the overfit model reproduces the training unit sequence
    assert units == ["1", "2", "3", "4"]


@pytest.mark.slow
def test_enh_streaming_close_to_offline(tmp_path):
    """Chunked separation with context trimming tracks the offline output
    for a conv (TCN) separator."""
    import yaml as _yaml

    from llm_guided_asr_tpu.tasks.generic import GenericTask

    rng = np.random.default_rng(0)
    t = np.arange(24000) / 16000.0
    s1 = (0.4 * np.sin(2 * np.pi * 350 * t)).astype(np.float32)
    s2 = (0.4 * np.sin(2 * np.pi * 1500 * t)).astype(np.float32)
    for split, n in [("train", 4), ("valid", 2)]:
        d = tmp_path / split
        d.mkdir()
        scps = {k: open(d / f"{k}.scp", "w") for k in ("mix", "r1", "r2")}
        for i in range(n):
            for name, sig in [("mix", s1 + s2), ("r1", s1), ("r2", s2)]:
                p = d / f"{name}_{i}.wav"
                _write_wav(p, sig[:4000])
                scps[name].write(f"u{i} {p}\n")
        for f in scps.values():
            f.close()
    exp = tmp_path / "exp"
    cfg = {
        "task": "enh",
        "model_conf": {"num_spk": 2, "n_fft": 256, "hop_length": 128,
                       "separator_type": "tcn", "hidden": 16, "layers": 1},
        "optim": "adam", "optim_conf": {"lr": 0.002}, "scheduler": "none",
        "batch_type": "unsorted", "batch_size": 4, "max_epoch": 3,
        "keep_nbest_models": 1, "log_interval": 50, "speech_pad_multiple": 4000,
        "train_data_path_and_name_and_type": [
            [str(tmp_path / "train" / "mix.scp"), "speech_mix", "sound"],
            [str(tmp_path / "train" / "r1.scp"), "speech_ref1", "sound"],
            [str(tmp_path / "train" / "r2.scp"), "speech_ref2", "sound"]],
        "valid_data_path_and_name_and_type": [
            [str(tmp_path / "valid" / "mix.scp"), "speech_mix", "sound"],
            [str(tmp_path / "valid" / "r1.scp"), "speech_ref1", "sound"],
            [str(tmp_path / "valid" / "r2.scp"), "speech_ref2", "sound"]],
        "output_dir": str(exp), "token_list": None,
    }
    (tmp_path / "enh.yaml").write_text(_yaml.safe_dump(cfg))
    GenericTask.main(["--config", str(tmp_path / "enh.yaml")])

    from llm_guided_asr_tpu.bin.enh_inference import SeparateSpeech
    from llm_guided_asr_tpu.bin.enh_inference_streaming import (
        SeparateSpeechStreaming,
    )

    mdl = next(exp.glob("*.best.msgpack"))
    mix = (s1 + s2)[:12000]
    off = SeparateSpeech(str(exp / "config.yaml"), str(mdl))(mix)
    strm = SeparateSpeechStreaming(str(exp / "config.yaml"), str(mdl),
                                   chunk_samples=4096,
                                   context_samples=4096)(mix)
    assert len(strm) == 2 and all(len(o) == len(mix) for o in strm)
    # core frames match offline well inside the receptive field: compare
    # energy-normalized error over the middle
    for o, s in zip(off, strm):
        mid = slice(2000, 10000)
        err = np.mean((o[mid] - s[mid]) ** 2)
        ref = np.mean(o[mid] ** 2) + 1e-8
        assert err / ref < 0.05, (err, ref)


def test_pipeline_stage2_speed_perturb(tmp_path):
    """Stage 2 triples the train split with sp<f>- copies (asr.sh:579)."""
    for split in ("train", "valid"):
        d = tmp_path / split
        d.mkdir()
        with open(d / "wav.scp", "w") as fw, open(d / "text", "w") as ft:
            for i in range(2):
                u = f"u{i}"
                t = np.arange(3200) / 16000.0
                _write_wav(d / f"{u}.wav", 0.5 * np.sin(2 * np.pi * 440 * t))
                fw.write(f"{u} {d / f'{u}.wav'}\n")
                ft.write(f"{u} ab\n")
    from llm_guided_asr_tpu.bin.asr_pipeline import main as pipeline_main

    pipeline_main([
        "--train_dir", str(tmp_path / "train"),
        "--valid_dir", str(tmp_path / "valid"),
        "--expdir", str(tmp_path / "exp"),
        "--stage", "2", "--stop_stage", "5",
        "--speed_perturb", "0.9,1.0,1.1",
    ])
    lines = (tmp_path / "exp" / "data" / "train" / "wav.scp").read_text().splitlines()
    assert len(lines) == 6
    assert any(l.startswith("sp0.9-") for l in lines)
    assert any(l.startswith("sp1.1-") for l in lines)
    # perturbed audio really is resampled (sp0.9 is LONGER)
    from llm_guided_asr_tpu.data.fileio import read_audio

    n_base = len(read_audio(str(tmp_path / "train" / "u0.wav"))[1])
    sp = [l.split()[1] for l in lines if l.startswith("sp0.9-u0")][0]
    assert len(read_audio(sp)[1]) > n_base
