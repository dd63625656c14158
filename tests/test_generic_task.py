"""Generic task CLI: enh real train; dry-run config artifacts for the rest."""

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
