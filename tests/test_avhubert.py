"""AVHubert audio-visual encoder (avhubert_encoder.py rebuild)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from llm_guided_asr_tpu.models.avhubert import (
    AVHubertConfig,
    AVHubertEncoder,
    AVHubertModel,
    ResEncoder,
)

TINY = dict(encoder_embed_dim=16, encoder_layers=1, encoder_attention_heads=2,
            encoder_ffn_embed_dim=24, audio_feat_dim=10, dropout=0.0,
            resnet_channels=(8, 16), resnet_blocks_per_stage=1,
            frontend_channels=8, conv_pos=8, conv_pos_groups=4)


def _av_inputs(b=2, t=6, hw=16, f=10):
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((b, t, f)), jnp.float32)
    video = jnp.asarray(rng.standard_normal((b, t, hw, hw)), jnp.float32)
    lengths = jnp.asarray([t, t - 2])
    return audio, video, lengths


def test_resnet_video_frontend_shape():
    cfg = AVHubertConfig(**TINY)
    _, video, _ = _av_inputs()
    enc = ResEncoder(cfg)
    v = enc.init(jax.random.PRNGKey(0), video)
    out = enc.apply(v, video)
    # time resolution preserved by the (1,2,2)-stride stem; channels = last stage
    assert out.shape == (2, 6, 16)
    assert np.all(np.isfinite(np.asarray(out)))


def test_av_fusion_and_audio_only_paths():
    cfg = AVHubertConfig(**TINY)
    model = AVHubertModel(cfg)
    audio, video, lengths = _av_inputs()
    v = model.init(jax.random.PRNGKey(0), audio, lengths, video)
    av, _ = model.apply(v, audio, lengths, video)
    a_only, _ = model.apply(v, audio, lengths, None)
    v_only, _ = model.apply(v, None, lengths, video)
    assert av.shape == a_only.shape == v_only.shape == (2, 6, 16)
    # the video modality must actually contribute
    assert not np.allclose(np.asarray(av), np.asarray(a_only), atol=1e-5)
    assert not np.allclose(np.asarray(av), np.asarray(v_only), atol=1e-5)

    # add-fusion variant
    cfg_add = AVHubertConfig(**{**TINY, "modality_fuse": "add"})
    m2 = AVHubertModel(cfg_add)
    v2 = m2.init(jax.random.PRNGKey(0), audio, lengths, video)
    out2, _ = m2.apply(v2, audio, lengths, video)
    assert out2.shape == (2, 6, 16)


def test_modality_dropout_zeroes_one_half():
    """With modality_dropout=1 the fused features must equal the fusion with
    one modality zeroed (avhubert_encoder.py:233-247)."""
    cfg = AVHubertConfig(**{**TINY, "modality_dropout": 1.0, "audio_dropout": 1.0})
    model = AVHubertModel(cfg)
    audio, video, lengths = _av_inputs()
    v = model.init(jax.random.PRNGKey(0), audio, lengths, video)

    def fused(a, vid, det, seed=3):
        return model.apply(
            v, a, vid, None, False,
            method=lambda m, a_, vi_, r_, d_: m.fuse(
                m.feature_extractor_audio(a_),
                m.video_proj(m.feature_extractor_video(vi_)),
                None if d_ else jax.random.PRNGKey(seed), d_,
            ),
            rngs={"dropout": jax.random.PRNGKey(seed)},
        )

    dropped = fused(audio, video, det=False)
    d = cfg.encoder_embed_dim
    # audio_dropout=1 -> the audio half (first d dims) is zeroed
    assert np.allclose(np.asarray(dropped)[..., :d], 0.0)
    assert not np.allclose(np.asarray(dropped)[..., d:], 0.0)
    clean = fused(audio, video, det=True)
    np.testing.assert_allclose(
        np.asarray(dropped)[..., d:], np.asarray(clean)[..., d:], rtol=1e-5
    )


def test_avhubert_asr_task_audio_only(tmp_path):
    """encoder: avhubert trains through the standard ASR task (audio-only)."""
    import sys
    import wave
    from pathlib import Path

    import yaml

    sys.path.insert(0, str(Path(__file__).parent))
    from llm_guided_asr_tpu.tasks.asr import ASRTask

    tokens = tmp_path / "tokens.txt"
    tokens.write_text("\n".join(["<blank>", "<unk>", "a", "b", "<sos/eos>"]) + "\n")
    rng = np.random.default_rng(0)
    for split in ("train", "valid"):
        d = tmp_path / split
        d.mkdir()
        with open(d / "wav.scp", "w") as fw, open(d / "text", "w") as ft:
            for i in range(3):
                u = f"u{i}"
                x = (rng.standard_normal(3200) * 3000).astype(np.int16)
                with wave.open(str(d / f"{u}.wav"), "wb") as w:
                    w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
                    w.writeframes(x.tobytes())
                fw.write(f"{u} {d / f'{u}.wav'}\n")
                ft.write(f"{u} ab\n")
    cfg = {
        "token_list": str(tokens), "token_type": "char",
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 10},
        "normalize": "utterance_mvn",
        "encoder": "avhubert",
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 24, "num_blocks": 1,
                         "dropout_rate": 0.0},
        "decoder_conf": {"attention_heads": 2, "linear_units": 24,
                         "num_blocks": 1},
        "model_conf": {"ctc_weight": 0.5},
        "optim": "adam", "optim_conf": {"lr": 0.001}, "scheduler": "none",
        "batch_type": "unsorted", "batch_size": 3, "max_epoch": 1,
        "keep_nbest_models": 1, "log_interval": 10,
        "train_data_path_and_name_and_type": [
            [str(tmp_path / "train" / "wav.scp"), "speech", "sound"],
            [str(tmp_path / "train" / "text"), "text", "text"]],
        "valid_data_path_and_name_and_type": [
            [str(tmp_path / "valid" / "wav.scp"), "speech", "sound"],
            [str(tmp_path / "valid" / "text"), "text", "text"]],
        "output_dir": str(tmp_path / "exp"),
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    ASRTask.main(["--config", str(p)])
    assert (tmp_path / "exp" / "1epoch.msgpack").exists()
