"""Generic task CLI: enh real train; dry-run config artifacts for the rest."""

import pytest

pytestmark = pytest.mark.slow

from pathlib import Path

import numpy as np
import pytest
import yaml

from llm_guided_asr_tpu.data.fileio import write_wav

SR = 16000


def make_enh_corpus(root: Path, n=6):
    rng = np.random.default_rng(0)
    for split, k in [("train", n), ("valid", 2)]:
        d = root / split
        d.mkdir(parents=True)
        scps = {name: open(d / f"{name}.scp", "w") for name in ("mix", "ref1", "ref2")}
        for i in range(k):
            t = np.arange(4000) / SR
            f1, f2 = rng.choice([300, 500, 800]), rng.choice([1200, 1800, 2500])
            s1 = 0.4 * np.sin(2 * np.pi * f1 * t).astype(np.float32)
            s2 = 0.4 * np.sin(2 * np.pi * f2 * t).astype(np.float32)
            for name, sig in [("mix", s1 + s2), ("ref1", s1), ("ref2", s2)]:
                p = d / f"{name}_{i}.wav"
                write_wav(p, SR, sig)
                scps[name].write(f"u{i:02d} {p}\n")
        for f in scps.values():
            f.close()
    return root


def test_generic_enh_trains(tmp_path):
    from llm_guided_asr_tpu.tasks.generic import GenericTask

    root = make_enh_corpus(tmp_path / "data")
    exp = tmp_path / "exp"
    config = {
        "task": "enh",
        "model_conf": {"num_spk": 2, "n_fft": 256, "hop_length": 128,
                       "separator_type": "tcn", "hidden": 16, "layers": 1},
        "optim": "adam", "optim_conf": {"lr": 0.001}, "scheduler": "none",
        "batch_type": "unsorted", "batch_size": 4, "max_epoch": 2,
        "keep_nbest_models": 1, "log_interval": 50,
        "speech_pad_multiple": 4000,
        "train_data_path_and_name_and_type": [
            [str(root / "train" / "mix.scp"), "speech_mix", "sound"],
            [str(root / "train" / "ref1.scp"), "speech_ref1", "sound"],
            [str(root / "train" / "ref2.scp"), "speech_ref2", "sound"]],
        "valid_data_path_and_name_and_type": [
            [str(root / "valid" / "mix.scp"), "speech_mix", "sound"],
            [str(root / "valid" / "ref1.scp"), "speech_ref1", "sound"],
            [str(root / "valid" / "ref2.scp"), "speech_ref2", "sound"]],
        "output_dir": str(exp),
        "token_list": None,
    }
    (tmp_path / "enh.yaml").write_text(yaml.safe_dump(config))
    GenericTask.main(["--config", str(tmp_path / "enh.yaml")])
    assert (exp / "valid.loss.best.msgpack").exists()

    # reload and separate
    model, variables, _ = GenericTask.build_model_from_file(
        exp / "config.yaml", exp / "valid.loss.best.msgpack"
    )
    import jax.numpy as jnp

    mix = jnp.zeros((1, 4000), jnp.float32)
    ests, _ = model.apply(variables, mix, jnp.asarray([4000]), method=model.separate)
    assert ests.shape == (2, 1, 4000)


@pytest.mark.parametrize("task", ["spk", "hubert", "s2t", "tts", "diar", "mt"])
def test_generic_task_builders(task, tmp_path):
    """Every registered task builds a model and inits variables."""
    from llm_guided_asr_tpu.tasks.generic import GenericTask

    tokens = tmp_path / "tokens.txt"
    tokens.write_text("\n".join(["<blank>", "<unk>", "a", "b", "<sos/eos>"]) + "\n")
    config = {
        **GenericTask.get_default_config(),
        "task": task,
        "token_list": str(tokens),
        "model_conf": {
            "diar": {"num_spk": 2, "adim": 16, "heads": 2, "units": 24, "layers": 1},
            "mt": {"adim": 16, "heads": 2, "units": 24, "elayers": 1},
            "spk": {"n_speakers": 4, "hidden": 16, "layers": 1, "embed_dim": 8},
            "hubert": {"n_clusters": 4, "adim": 16, "heads": 2, "units": 24,
                       "layers": 1, "conv_channels": 8},
            "s2t": {"ctc_weight": 0.3},
            "tts": {"n_mels": 20, "adim": 16, "heads": 2, "eunits": 24,
                    "elayers": 1, "dlayers": 1},
        }[task],
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 23},
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 24, "num_blocks": 1, "use_cnn_module": False},
        "decoder_conf": {"attention_heads": 2, "linear_units": 24, "num_blocks": 1},
    }
    import jax

    model, batch_args, dummy = GenericTask.build(config)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "mask": jax.random.PRNGKey(2)},
        *dummy, deterministic=True,
    )
    loss, stats, w = model.apply(variables, *dummy, deterministic=True)
    import numpy as np

    assert np.isfinite(float(loss)), f"{task}: {stats}"


@pytest.mark.parametrize(
    "task", ["slu", "asvspoof", "s2st", "svs", "codec", "speechlm", "tts2"]
)
def test_new_domain_builders(task, tmp_path):
    """Round-2 domains (VERDICT r1 item 6): build + init + finite forward."""
    from llm_guided_asr_tpu.tasks.generic import GenericTask

    tokens = tmp_path / "tokens.txt"
    tokens.write_text("\n".join(["<blank>", "<unk>", "a", "b", "<sos/eos>"]) + "\n")
    config = {
        **GenericTask.get_default_config(),
        "task": task,
        "token_list": str(tokens),
        "model_conf": {
            "slu": {"n_intents": 3, "intent_weight": 0.3, "ctc_weight": 0.3},
            "asvspoof": {"adim": 16, "layers": 1},
            "s2st": {"unit_vocab_size": 8, "st_weight": 0.3},
            "svs": {"n_mels": 20, "adim": 16, "heads": 2, "eunits": 24,
                    "elayers": 1, "dlayers": 1, "n_midi": 10},
            "codec": {"channels": 8, "latent_dim": 8, "strides": [2, 2],
                      "n_quantizers": 2, "codebook_size": 8},
            "speechlm": {"unit_vocab_size": 16, "embed_unit": 8, "att_unit": 16,
                         "head": 2, "unit": 24, "layer": 1},
            "tts2": {"unit_vocab_size": 8, "adim": 16, "heads": 2, "units": 24,
                     "elayers": 1},
        }[task],
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 23},
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 24, "num_blocks": 1, "use_cnn_module": False},
        "decoder_conf": {"attention_heads": 2, "linear_units": 24, "num_blocks": 1},
    }
    import jax

    model, batch_args, dummy = GenericTask.build(config)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "mask": jax.random.PRNGKey(2)},
        *dummy, deterministic=True,
    )
    loss, stats, w = model.apply(variables, *dummy, deterministic=True)
    assert np.isfinite(float(loss)), f"{task}: {stats}"


def _write_scp_ints(path, rows):
    with open(path, "w") as f:
        for uid, seq in rows:
            f.write(f"{uid} {' '.join(str(int(x)) for x in seq)}\n")


def _write_wavs(d, n=4, samples=4000):
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    with open(d / "wav.scp", "w") as f:
        for i in range(n):
            p = d / f"u{i}.wav"
            write_wav(p, SR, 0.3 * rng.standard_normal(samples).astype(np.float32))
            f.write(f"u{i} {p}\n")
    return [f"u{i}" for i in range(n)]


@pytest.mark.parametrize(
    "task",
    ["slu", "asvspoof", "s2st", "svs", "codec", "speechlm", "tts2", "uasr",
     "gan_tts", "gan_svs", "gan_codec", "jets"],
)
def test_new_domain_trains_from_yaml(task, tmp_path):
    """One-epoch train of every new domain via the task CLI (espnet2/tasks/*
    parity: each domain trains from a YAML)."""
    from llm_guided_asr_tpu.tasks.generic import GenericTask

    rng = np.random.default_rng(1)
    tokens = tmp_path / "tokens.txt"
    tokens.write_text("\n".join(["<blank>", "<unk>", "a", "b", "<sos/eos>"]) + "\n")
    data = {}
    for split in ("train", "valid"):
        d = tmp_path / split
        n = 4 if split == "train" else 2
        uids = _write_wavs(d, n=n)
        with open(d / "text", "w") as f:
            for u in uids:
                f.write(f"{u} {'ab'[:rng.integers(1, 3)]}\n")
        _write_scp_ints(d / "units", [(u, rng.integers(0, 8, 6)) for u in uids])
        _write_scp_ints(d / "intent", [(u, [int(rng.integers(0, 3))]) for u in uids])
        _write_scp_ints(d / "label", [(u, [int(rng.integers(0, 2))]) for u in uids])
        _write_scp_ints(d / "durations", [(u, [3, 3, 3, 3]) for u in uids])
        _write_scp_ints(d / "midi", [(u, rng.integers(0, 10, 4)) for u in uids])
        (d / "svs_text").write_text("\n".join(f"{u} abab" for u in uids) + "\n")
        # mel targets for svs as npy
        mel_scp = open(d / "mel.scp", "w")
        for u in uids:
            arr = rng.standard_normal((12, 20)).astype(np.float32)
            np.save(d / f"{u}_mel.npy", arr)
            mel_scp.write(f"{u} {d / f'{u}_mel.npy'}\n")
        mel_scp.close()
        data[split] = d

    def streams(split):
        d = data[split]
        return {
            "slu": [[str(d / "wav.scp"), "speech", "sound"],
                    [str(d / "text"), "text", "text"],
                    [str(d / "intent"), "intent", "text_int"]],
            "asvspoof": [[str(d / "wav.scp"), "speech", "sound"],
                         [str(d / "label"), "label", "text_int"]],
            "s2st": [[str(d / "wav.scp"), "speech", "sound"],
                     [str(d / "units"), "tgt_units", "text_int"],
                     [str(d / "text"), "text", "text"]],
            "svs": [[str(d / "svs_text"), "text", "text"],
                    [str(d / "mel.scp"), "speech", "npy"],
                    [str(d / "durations"), "durations", "text_int"],
                    [str(d / "midi"), "midi", "text_int"]],
            "codec": [[str(d / "wav.scp"), "speech", "sound"]],
            "speechlm": [[str(d / "units"), "units", "text_int"]],
            "tts2": [[str(d / "text"), "text", "text"],
                     [str(d / "units"), "units", "text_int"]],
            "uasr": [[str(d / "wav.scp"), "speech", "sound"],
                     [str(d / "text"), "text", "text"]],
            "gan_tts": [[str(d / "text"), "text", "text"],
                        [str(d / "wav.scp"), "speech", "sound"]],
            "gan_svs": [[str(d / "svs_text"), "text", "text"],
                        [str(d / "midi"), "midi", "text_int"],
                        [str(d / "wav.scp"), "speech", "sound"]],
            "gan_codec": [[str(d / "wav.scp"), "speech", "sound"]],
            "jets": [[str(d / "text"), "text", "text"],
                     [str(d / "wav.scp"), "speech", "sound"]],
        }[task]

    exp = tmp_path / "exp"
    config = {
        "task": task,
        "token_list": str(tokens),
        "model_conf": {
            "slu": {"n_intents": 3, "ctc_weight": 0.3},
            "asvspoof": {"adim": 16, "layers": 1},
            "s2st": {"unit_vocab_size": 8, "st_weight": 0.3},
            "svs": {"n_mels": 20, "adim": 16, "heads": 2, "eunits": 24,
                    "elayers": 1, "dlayers": 1, "n_midi": 10},
            "codec": {"channels": 8, "latent_dim": 8, "strides": [2, 2],
                      "n_quantizers": 2, "codebook_size": 8},
            "speechlm": {"unit_vocab_size": 16, "embed_unit": 8, "att_unit": 16,
                         "head": 2, "unit": 24, "layer": 1},
            "tts2": {"unit_vocab_size": 8, "adim": 16, "heads": 2, "units": 24,
                     "elayers": 1},
            "uasr": {"discriminator_channels": 16, "generator_kernel": 4,
                     "generator_stride": 2, "segmenter": "join",
                     "use_gumbel": True, "gradient_penalty_weight": 1.0},
            "gan_tts": {"hidden": 16, "text_layers": 1, "posterior_layers": 1,
                        "flow_layers": 1, "segment_frames": 4, "n_fft": 256,
                        "hop_length": 128, "n_mels": 20},
            "gan_svs": {"hidden": 16, "text_layers": 1, "posterior_layers": 1,
                        "flow_layers": 1, "segment_frames": 4, "n_fft": 256,
                        "hop_length": 128, "n_mels": 20, "n_midi": 10},
            "gan_codec": {"channels": 8, "latent_dim": 8, "strides": [2, 2],
                          "n_quantizers": 2, "codebook_size": 8},
            "jets": {"adim": 16, "heads": 2, "eunits": 24, "elayers": 1,
                     "dlayers": 1, "segment_frames": 4, "n_mels": 12,
                     "n_fft": 256, "hop_length": 128},
        }[task],
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 23},
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 24, "num_blocks": 1,
                         "use_cnn_module": False},
        "decoder_conf": {"attention_heads": 2, "linear_units": 24, "num_blocks": 1},
        "optim": "adam", "optim_conf": {"lr": 0.001}, "scheduler": "none",
        "batch_type": "unsorted", "batch_size": 4, "max_epoch": 1,
        "keep_nbest_models": 1, "log_interval": 50,
        "speech_pad_multiple": 4000, "text_pad_multiple": 4,
        "train_data_path_and_name_and_type": streams("train"),
        "valid_data_path_and_name_and_type": streams("valid"),
        "output_dir": str(exp),
    }
    cfg_file = tmp_path / f"{task}.yaml"
    cfg_file.write_text(yaml.safe_dump(config))
    GenericTask.main(["--config", str(cfg_file)])
    assert (exp / "config.yaml").exists()
    assert (exp / "checkpoint.msgpack").exists()


def test_slu_transcript_conditioning(tmp_path):
    """SLU postdecoder analog: transcript conditioning changes the encoder
    states feeding the intent head (slu/espnet_model.py:89-98 postdecoder +
    deliberationencoder)."""
    import jax
    import jax.numpy as jnp

    from llm_guided_asr_tpu.models.slu import SLUConfig, SLUModel
    from llm_guided_asr_tpu.tasks.asr import build_model_config

    tokens = tmp_path / "tokens.txt"
    tokens.write_text("\n".join(
        ["<blank>", "<unk>"] + list("abcdefg") + ["<sos/eos>"]) + "\n")
    base = {
        "token_list": str(tokens),
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 20},
        "normalize": "utterance_mvn",
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 24, "num_blocks": 1,
                         "use_cnn_module": False},
        "decoder_conf": {"attention_heads": 2, "linear_units": 24,
                         "num_blocks": 1},
        "model_conf": {"ctc_weight": 0.5},
    }
    cfg = SLUConfig(
        asr=build_model_config({**base, "model_conf": {**base["model_conf"]}}),
        n_intents=3, use_transcript=True, transcript_layers=1,
        deliberation_layers=1, transcript_ffn=24,
    )
    model = SLUModel(cfg)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((2, 3200)), jnp.float32)
    slens = jnp.asarray([3200, 1600])
    text = jnp.asarray([[1, 2, -1], [3, -1, -1]], jnp.int32)
    tlens = jnp.asarray([2, 1])
    intent = jnp.asarray([[1], [2]], jnp.int32)
    tr = jnp.asarray([[4, 5, 6, -1], [7, 8, -1, -1]], jnp.int32)
    trlens = jnp.asarray([3, 2])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, slens, text, tlens, intent, None, tr, trlens,
        deterministic=True,
    )
    loss, stats, _ = model.apply(
        variables, speech, slens, text, tlens, intent, None, tr, trlens,
        deterministic=True,
    )
    assert np.isfinite(float(loss))
    assert "loss_intent" in stats
    # transcript content must change the result (the deliberation fusion is live)
    loss2, _, _ = model.apply(
        variables, speech, slens, text, tlens, intent, None,
        jnp.asarray([[8, 7, 6, -1], [4, 5, -1, -1]], jnp.int32), trlens,
        deterministic=True,
    )
    assert float(loss) != float(loss2)


def test_spk_trial_validation_eer(tmp_path):
    """spk task with spk_trials: per-epoch EER/minDCF valid stats and an
    eer-based best-model criterion (spk_trainer.py trial-validation analog)."""
    from llm_guided_asr_tpu.tasks.generic import GenericTask

    rng = np.random.default_rng(0)
    freqs = {0: 220, 1: 1400}
    root = tmp_path / "data"
    for split, n in [("train", 8), ("valid", 6)]:
        d = root / split
        d.mkdir(parents=True)
        with open(d / "wav.scp", "w") as scp, open(d / "utt2spk", "w") as lab:
            for i in range(n):
                spk = i % 2
                t = np.arange(3200) / SR
                sig = (0.4 * np.sin(2 * np.pi * freqs[spk] * t)
                       + 0.01 * rng.standard_normal(3200)).astype(np.float32)
                p = d / f"u{i}.wav"
                write_wav(p, SR, sig)
                scp.write(f"u{i} {p}\n")
                lab.write(f"u{i} {spk}\n")
    trials = tmp_path / "trials"
    trials.write_text(
        "u0 u2 target\nu1 u3 target\nu0 u1 nontarget\nu2 u3 nontarget\n"
        "u4 u0 1\nu5 u0 0\n"
    )
    exp = tmp_path / "exp"
    config = {
        "task": "spk",
        "model_conf": {"n_speakers": 2, "hidden": 16, "layers": 1,
                       "embed_dim": 8},
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 23},
        "optim": "adam", "optim_conf": {"lr": 0.003}, "scheduler": "none",
        "batch_type": "unsorted", "batch_size": 4, "max_epoch": 2,
        "keep_nbest_models": 1, "log_interval": 50,
        "speech_pad_multiple": 3200,
        "best_model_criterion": [["valid", "eer", "min"]],
        "spk_trials": str(trials),
        "train_data_path_and_name_and_type": [
            [str(root / "train" / "wav.scp"), "speech", "sound"],
            [str(root / "train" / "utt2spk"), "spk_labels", "text_int"]],
        "valid_data_path_and_name_and_type": [
            [str(root / "valid" / "wav.scp"), "speech", "sound"],
            [str(root / "valid" / "utt2spk"), "spk_labels", "text_int"]],
        "output_dir": str(exp),
        "token_list": None,
    }
    (tmp_path / "spk.yaml").write_text(yaml.safe_dump(config))
    GenericTask.main(["--config", str(tmp_path / "spk.yaml")])
    assert (exp / "valid.eer.best.msgpack").exists()
    import json

    stats = json.loads((exp / "reporter.json").read_text())["stats"]
    last = stats[max(stats, key=int)]["valid"]
    assert "eer" in last and "mindcf" in last
    assert 0.0 <= last["eer"] <= 100.0
    assert last["n_trials"] == 6.0
