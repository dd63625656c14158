"""Real multi-process distributed init on one host
(test/test_distributed_launch.py analog: spawn real process groups, assert
rank/world resolution and collective correctness; no mock backend)."""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from llm_guided_asr_tpu.parallel.mesh import DistributedOption

    opt = DistributedOption(
        coordinator={coord!r},
        num_processes=2,
        process_id=int(sys.argv[1]),
    )
    opt.init_distributed()
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == int(sys.argv[1])
    # cross-process collective: global device array sum over both processes
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    local = np.asarray([float(jax.process_index() + 1)])
    total = multihost_utils.process_allgather(local)
    assert total.shape[0] == 2 and float(total.sum()) == 3.0, total
    print(f"proc {{jax.process_index()}} OK", flush=True)
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_group_init_and_allgather(tmp_path):
    repo = str(Path(__file__).resolve().parent.parent)
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=repo, coord=coord))
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out


def test_worker_failure_propagates(tmp_path):
    """A worker that raises exits non-zero (the reference asserts clean
    non-zero-exit propagation, test_distributed_launch.py:95)."""
    script = tmp_path / "bad.py"
    script.write_text("raise RuntimeError('boom')\n")
    p = subprocess.run([sys.executable, str(script)], capture_output=True,
                       text=True)
    assert p.returncode != 0
    assert "boom" in p.stderr


TRAIN_WORKER = textwrap.dedent(
    """
    import os, sys, json
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)
    sys.path.insert(0, {repo!r})
    from llm_guided_asr_tpu.parallel.mesh import DistributedOption

    DistributedOption(coordinator={coord!r}, num_processes=2,
                      process_id=int(sys.argv[1])).init_distributed()
    assert jax.process_count() == 2 and len(jax.devices()) == 2

    from llm_guided_asr_tpu.tasks.asr import ASRTask

    ASRTask.main(["--config", {cfg!r}])
    print(f"proc {{jax.process_index()}} TRAIN OK", flush=True)
    """
)


def test_two_process_data_parallel_training(tmp_path):
    """True multi-process DP training: 2 processes x 1 CPU device form a
    2-device 'data' mesh; per-process local batch blocks assemble into
    global arrays; the loss curve matches a single-process run."""
    import json
    import wave

    import numpy as np
    import yaml

    repo = str(Path(__file__).resolve().parent.parent)
    rng = np.random.default_rng(0)
    tokens = tmp_path / "tokens.txt"
    tokens.write_text("\n".join(["<blank>", "<unk>", "a", "b", "<sos/eos>"]) + "\n")
    for split, n in [("train", 8), ("valid", 4)]:
        d = tmp_path / split
        d.mkdir()
        with open(d / "wav.scp", "w") as fw, open(d / "text", "w") as ft:
            for i in range(n):
                u = f"u{i}"
                t = np.arange(3200) / 16000.0
                x = (np.sin(2 * np.pi * (300 + 100 * i) * t) * 8000).astype(np.int16)
                with wave.open(str(d / f"{u}.wav"), "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(16000)
                    w.writeframes(x.tobytes())
                fw.write(f"{u} {d / f'{u}.wav'}\n")
                ft.write(f"{u} {'ab' if i % 2 else 'ba'}\n")

    def config_for(expdir, dp):
        return {
            "token_list": str(tokens), "token_type": "char",
            "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 20},
            "normalize": "utterance_mvn",
            "encoder_conf": {"output_size": 16, "attention_heads": 2,
                             "linear_units": 24, "num_blocks": 1,
                             "use_cnn_module": False, "input_layer": "linear",
                             "dropout_rate": 0.0, "positional_dropout_rate": 0.0},
            "decoder_conf": {"attention_heads": 2, "linear_units": 24,
                             "num_blocks": 1, "dropout_rate": 0.0,
                             "positional_dropout_rate": 0.0},
            "model_conf": {"ctc_weight": 0.5},
            "optim": "adam", "optim_conf": {"lr": 0.002}, "scheduler": "none",
            "batch_type": "sorted", "batch_size": 4, "max_epoch": 2,
            "keep_nbest_models": 1, "log_interval": 10, "seed": 7,
            "speech_pad_multiple": 3200, "text_pad_multiple": 4,
            "data_parallel": dp,
            "train_data_path_and_name_and_type": [
                [str(tmp_path / "train" / "wav.scp"), "speech", "sound"],
                [str(tmp_path / "train" / "text"), "text", "text"]],
            "valid_data_path_and_name_and_type": [
                [str(tmp_path / "valid" / "wav.scp"), "speech", "sound"],
                [str(tmp_path / "valid" / "text"), "text", "text"]],
            "output_dir": str(expdir),
        }

    # ground truth: single-process run (in a subprocess for env isolation)
    single_cfg = tmp_path / "single.yaml"
    single_cfg.write_text(yaml.safe_dump(config_for(tmp_path / "exp_single", None)))
    single_script = tmp_path / "single.py"
    single_script.write_text(textwrap.dedent(f"""
        import os, sys
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, {repo!r})
        from llm_guided_asr_tpu.tasks.asr import ASRTask
        ASRTask.main(["--config", {str(single_cfg)!r}])
    """))
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    r = subprocess.run([sys.executable, str(single_script)],
                       capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]

    # 2-process run over the same data
    mp_cfg = tmp_path / "mp.yaml"
    mp_cfg.write_text(yaml.safe_dump(config_for(tmp_path / "exp_mp", 2)))
    coord = f"127.0.0.1:{_free_port()}"
    worker = tmp_path / "train_worker.py"
    worker.write_text(TRAIN_WORKER.format(repo=repo, coord=coord,
                                          cfg=str(mp_cfg)))
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i}:\n{out[-3000:]}"

    from llm_guided_asr_tpu.train.reporter import Reporter

    rs = Reporter.load(tmp_path / "exp_single" / "reporter.json")
    rm = Reporter.load(tmp_path / "exp_mp" / "reporter.json")
    for ep in rs.stats:
        for ph in ("train", "valid"):
            a = rs.stats[ep][ph].get("loss")
            b = rm.stats[ep][ph].get("loss")
            assert a is not None and b is not None
            np.testing.assert_allclose(a, b, rtol=3e-3, atol=3e-4)
