"""Scale-out hardening beyond 2 processes (reference: test_distributed_launch.py
plus the trainer resume discipline, espnet2/train/trainer.py:231-254):

- 4-process data-parallel training with loss parity against a single process;
- a worker killed mid-run -> the launcher aborts the whole group cleanly ->
  a relaunch with --resume continues from the last epoch checkpoint.
"""

import os
import socket
import subprocess
import sys
import textwrap
import wave
from pathlib import Path

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow

REPO = str(Path(__file__).resolve().parent.parent)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_corpus(tmp_path, n_train=8, n_valid=4):
    tokens = tmp_path / "tokens.txt"
    tokens.write_text("\n".join(["<blank>", "<unk>", "a", "b", "<sos/eos>"]) + "\n")
    for split, n in [("train", n_train), ("valid", n_valid)]:
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
    return tokens


def _config(tmp_path, tokens, expdir, dp, max_epoch=2, resume=False):
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
        "batch_type": "sorted", "batch_size": 4, "max_epoch": max_epoch,
        "keep_nbest_models": 10, "log_interval": 10, "seed": 7,
        "resume": resume,
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


# Worker run by bin/launch.py: picks up LLMASR_* env automatically through
# ASRTask.main -> resolve_distributed_env (parallel/mesh.py).  When
# LLMASR_SABOTEUR_RANK matches, a watcher thread hard-exits the process as
# soon as the epoch-1 checkpoint lands (i.e. mid-epoch-2).
WORKER = textwrap.dedent(
    """
    import os, sys, threading, time
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)
    sys.path.insert(0, {repo!r})

    sab = os.environ.get("LLMASR_SABOTEUR_RANK")
    if sab is not None and os.environ.get("LLMASR_PROCESS_ID") == sab:
        marker = os.path.join({expdir!r}, "1epoch.msgpack")

        def _watch():
            while not os.path.exists(marker):
                time.sleep(0.05)
            time.sleep(0.2)  # let epoch 2 actually start
            os._exit(17)

        threading.Thread(target=_watch, daemon=True).start()

    from llm_guided_asr_tpu.tasks.asr import ASRTask

    ASRTask.main(["--config", {cfg!r}])
    print("TRAIN OK", flush=True)
    """
)


def _run_single(tmp_path, cfg_path):
    script = tmp_path / "single.py"
    script.write_text(textwrap.dedent(f"""
        import os, sys
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, {REPO!r})
        from llm_guided_asr_tpu.tasks.asr import ASRTask
        ASRTask.main(["--config", {str(cfg_path)!r}])
    """))
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    r = subprocess.run([sys.executable, str(script)], capture_output=True,
                       text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]


def _launch(worker_py, n, log_dir, extra_env=None):
    sys.path.insert(0, REPO)
    from llm_guided_asr_tpu.bin.launch import launch

    env_backup = dict(os.environ)
    os.environ["JAX_PLATFORMS"] = "cpu"
    if extra_env:
        os.environ.update(extra_env)
    try:
        return launch([sys.executable, str(worker_py)], num_processes=n,
                      log_dir=str(log_dir))
    finally:
        os.environ.clear()
        os.environ.update(env_backup)


def test_four_process_loss_parity(tmp_path):
    """dp=4 over 4 processes x 1 CPU device matches the single-process loss
    curve (extends the 2-process parity test to a real 4-way group)."""
    tokens = _make_corpus(tmp_path)

    single_cfg = tmp_path / "single.yaml"
    single_cfg.write_text(yaml.safe_dump(
        _config(tmp_path, tokens, tmp_path / "exp_single", None)))
    _run_single(tmp_path, single_cfg)

    mp_cfg = tmp_path / "mp.yaml"
    mp_cfg.write_text(yaml.safe_dump(
        _config(tmp_path, tokens, tmp_path / "exp_mp", 4)))
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(repo=REPO, cfg=str(mp_cfg),
                                    expdir=str(tmp_path / "exp_mp")))
    assert _launch(worker, 4, tmp_path / "logs") == 0

    from llm_guided_asr_tpu.train.reporter import Reporter

    rs = Reporter.load(tmp_path / "exp_single" / "reporter.json")
    rm = Reporter.load(tmp_path / "exp_mp" / "reporter.json")
    for ep in rs.stats:
        for ph in ("train", "valid"):
            a = rs.stats[ep][ph].get("loss")
            b = rm.stats[ep][ph].get("loss")
            assert a is not None and b is not None
            np.testing.assert_allclose(a, b, rtol=3e-3, atol=3e-4)


def test_four_process_kill_abort_resume(tmp_path):
    """One worker dying mid-epoch-2 aborts the whole 4-process group cleanly
    (no orphans, non-zero propagation: abs_task.py:1240-1274 semantics); a
    relaunch with resume=true restores the epoch-1 checkpoint and finishes."""
    tokens = _make_corpus(tmp_path)
    expdir = tmp_path / "exp"

    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(yaml.safe_dump(
        _config(tmp_path, tokens, expdir, 4, max_epoch=3, resume=True)))
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(repo=REPO, cfg=str(cfg),
                                    expdir=str(expdir)))

    with pytest.raises(RuntimeError, match="exited with 17"):
        _launch(worker, 4, tmp_path / "logs_a",
                extra_env={"LLMASR_SABOTEUR_RANK": "2"})
    # group aborted after epoch 1 was persisted, before the run finished
    assert (expdir / "1epoch.msgpack").exists()
    assert not (expdir / "3epoch.msgpack").exists()

    # relaunch; resume=true restores checkpoint.msgpack and runs to max_epoch
    assert _launch(worker, 4, tmp_path / "logs_b") == 0
    assert (expdir / "3epoch.msgpack").exists()
    resumed_log = (tmp_path / "logs_b" / "worker.0.log").read_text()
    assert "resumed from epoch" in resumed_log

    from llm_guided_asr_tpu.train.reporter import Reporter

    rep = Reporter.load(expdir / "reporter.json")
    assert sorted(int(e) for e in rep.stats) == [1, 2, 3]
