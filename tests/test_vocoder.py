"""Standalone neural-vocoder training task + tts_inference integration
(gan_tts/{melgan,parallel_wavegan,hifigan} analogs)."""

import wave

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow


def _write_tone_wavs(d, n):
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    with open(d / "wav.scp", "w") as fw, open(d / "text", "w") as ft:
        for i in range(n):
            u = f"utt{i}"
            p = d / f"{u}.wav"
            t = np.arange(4000) / 16000.0
            x = (np.sin(2 * np.pi * (300 + 100 * i) * t) * 8000).astype(np.int16)
            with wave.open(str(p), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(x.tobytes())
            fw.write(f"{u} {p}\n")
            ft.write(f"{u} ab\n")


@pytest.mark.parametrize("gen,disc", [("melgan", "pwg"), ("hifigan", "hifigan")])
def test_vocoder_task_trains(gen, disc, tmp_path):
    from llm_guided_asr_tpu.tasks.generic import GenericTask

    for split in ("train", "valid"):
        _write_tone_wavs(tmp_path / split, 4 if split == "train" else 2)
    exp = tmp_path / f"exp_{gen}"
    config = {
        "task": "vocoder",
        "model_conf": {"generator": gen, "discriminator": disc,
                       "n_mels": 12, "n_fft": 256, "hop_length": 128,
                       "segment_frames": 4, "channels": 16},
        "optim": "adam", "optim_conf": {"lr": 0.001}, "scheduler": "none",
        "batch_type": "unsorted", "batch_size": 4, "max_epoch": 1,
        "log_interval": 50, "speech_pad_multiple": 4000,
        "train_data_path_and_name_and_type": [
            [str(tmp_path / "train" / "wav.scp"), "speech", "sound"]],
        "valid_data_path_and_name_and_type": [
            [str(tmp_path / "valid" / "wav.scp"), "speech", "sound"]],
        "output_dir": str(exp),
    }
    f = tmp_path / f"{gen}.yaml"
    f.write_text(yaml.safe_dump(config))
    GenericTask.main(["--config", str(f)])
    assert (exp / "checkpoint.msgpack").exists()

    # trained generator runs standalone: mel -> waveform at hop upsampling
    from llm_guided_asr_tpu.models.hifigan import (
        HiFiGANConfig,
        HiFiGANGenerator,
        MelGANGenerator,
    )
    from llm_guided_asr_tpu.train.checkpoint import load_pytree

    hcfg = HiFiGANConfig(n_mels=12, channels=16)
    voc = MelGANGenerator(hcfg) if gen == "melgan" else HiFiGANGenerator(hcfg)
    params = load_pytree(exp / "checkpoint.msgpack")["generator"]
    wav = voc.apply({"params": params}, jnp.zeros((1, 6, 12)))
    assert wav.shape == (1, 6 * 128)
    assert np.all(np.isfinite(np.asarray(wav)))


def test_tts_inference_with_neural_vocoder(tmp_path):
    """Train a tiny FastSpeech2 + a tiny vocoder, synthesize with both."""
    from llm_guided_asr_tpu.bin.tts_inference import Text2Speech
    from llm_guided_asr_tpu.tasks.generic import GenericTask

    tokens = tmp_path / "tokens.txt"
    tokens.write_text("\n".join(["<blank>", "<unk>", "a", "b", "<sos/eos>"]) + "\n")
    for split in ("train", "valid"):
        _write_tone_wavs(tmp_path / split, 4 if split == "train" else 2)
        d = tmp_path / split
        with open(d / "durations", "w") as f:
            for i in range(4 if split == "train" else 2):
                f.write(f"utt{i} 15 16\n")

    tts_exp = tmp_path / "tts_exp"
    tts_cfg = {
        "task": "tts", "token_list": str(tokens),
        "model_conf": {"n_mels": 12, "adim": 16, "heads": 2, "eunits": 24,
                       "elayers": 1, "dlayers": 1},
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 12},
        "optim": "adam", "optim_conf": {"lr": 0.001}, "scheduler": "none",
        "batch_type": "unsorted", "batch_size": 4, "max_epoch": 1,
        "keep_nbest_models": 1, "log_interval": 50,
        "speech_pad_multiple": 4000, "text_pad_multiple": 4,
        "train_data_path_and_name_and_type": [
            [str(tmp_path / "train" / "text"), "text", "text"],
            [str(tmp_path / "train" / "wav.scp"), "speech", "sound"],
            [str(tmp_path / "train" / "durations"), "durations", "text_int"]],
        "valid_data_path_and_name_and_type": [
            [str(tmp_path / "valid" / "text"), "text", "text"],
            [str(tmp_path / "valid" / "wav.scp"), "speech", "sound"],
            [str(tmp_path / "valid" / "durations"), "durations", "text_int"]],
        "output_dir": str(tts_exp),
    }
    (tmp_path / "tts.yaml").write_text(yaml.safe_dump(tts_cfg))
    GenericTask.main(["--config", str(tmp_path / "tts.yaml")])

    voc_exp = tmp_path / "voc_exp"
    voc_cfg = {
        "task": "vocoder",
        "model_conf": {"generator": "hifigan", "n_mels": 12, "n_fft": 256,
                       "hop_length": 128, "segment_frames": 4, "channels": 16},
        "optim": "adam", "optim_conf": {"lr": 0.001}, "scheduler": "none",
        "batch_type": "unsorted", "batch_size": 4, "max_epoch": 1,
        "log_interval": 50, "speech_pad_multiple": 4000,
        "train_data_path_and_name_and_type": [
            [str(tmp_path / "train" / "wav.scp"), "speech", "sound"]],
        "valid_data_path_and_name_and_type": [
            [str(tmp_path / "valid" / "wav.scp"), "speech", "sound"]],
        "output_dir": str(voc_exp),
    }
    (tmp_path / "voc.yaml").write_text(yaml.safe_dump(voc_cfg))
    GenericTask.main(["--config", str(tmp_path / "voc.yaml")])

    model_file = next(tts_exp.glob("*.best.msgpack"), None)
    t2s = Text2Speech(
        tts_exp / "config.yaml", model_file, vocoder="hifigan",
        vocoder_file=str(voc_exp / "checkpoint.msgpack"),
        vocoder_config=str(voc_exp / "config.yaml"),
    )
    mel, wav = t2s("ab")
    assert wav is not None and wav.shape[0] == mel.shape[0] * 128
    assert np.all(np.isfinite(wav))
