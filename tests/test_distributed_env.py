"""Cluster-environment rank resolution (distributed_utils.py:141-330 analog)."""

import os

import pytest

from llm_guided_asr_tpu.parallel.mesh import (
    _slurm_first_host,
    resolve_distributed_env,
)


@pytest.fixture
def clean_env(monkeypatch):
    for k in (
        "LLMASR_COORDINATOR", "LLMASR_NUM_PROCESSES", "LLMASR_PROCESS_ID",
        "SLURM_PROCID", "SLURM_NTASKS", "SLURM_STEP_NODELIST",
        "SLURM_JOB_NODELIST", "SLURM_JOB_ID", "OMPI_COMM_WORLD_RANK",
        "OMPI_COMM_WORLD_SIZE", "RANK", "WORLD_SIZE", "MASTER_ADDR",
        "MASTER_PORT",
    ):
        monkeypatch.delenv(k, raising=False)
    return monkeypatch


def test_single_process_returns_none(clean_env):
    assert resolve_distributed_env() is None


def test_launcher_env_wins(clean_env):
    clean_env.setenv("LLMASR_COORDINATOR", "10.0.0.1:1234")
    clean_env.setenv("LLMASR_NUM_PROCESSES", "4")
    clean_env.setenv("LLMASR_PROCESS_ID", "2")
    clean_env.setenv("SLURM_PROCID", "9")  # lower priority, ignored
    clean_env.setenv("SLURM_NTASKS", "16")
    d = resolve_distributed_env()
    assert d == {"coordinator": "10.0.0.1:1234", "num_processes": 4, "process_id": 2}


def test_slurm_env(clean_env):
    clean_env.setenv("SLURM_PROCID", "3")
    clean_env.setenv("SLURM_NTASKS", "8")
    clean_env.setenv("SLURM_STEP_NODELIST", "tpu[12-15],tpu20")
    clean_env.setenv("SLURM_JOB_ID", "4242")
    d = resolve_distributed_env()
    assert d["process_id"] == 3 and d["num_processes"] == 8
    host, port = d["coordinator"].rsplit(":", 1)
    assert host == "tpu12"
    assert 49152 <= int(port) < 65152
    # every rank derives the same coordinator
    clean_env.setenv("SLURM_PROCID", "0")
    assert resolve_distributed_env()["coordinator"] == d["coordinator"]


def test_slurm_single_task_is_not_distributed(clean_env):
    clean_env.setenv("SLURM_PROCID", "0")
    clean_env.setenv("SLURM_NTASKS", "1")
    clean_env.setenv("SLURM_STEP_NODELIST", "tpu1")
    assert resolve_distributed_env() is None


def test_mpi_env(clean_env):
    clean_env.setenv("OMPI_COMM_WORLD_RANK", "1")
    clean_env.setenv("OMPI_COMM_WORLD_SIZE", "2")
    clean_env.setenv("MASTER_ADDR", "node0")
    d = resolve_distributed_env()
    assert d == {"coordinator": "node0:29500", "num_processes": 2, "process_id": 1}


def test_torchrun_style_env(clean_env):
    clean_env.setenv("RANK", "5")
    clean_env.setenv("WORLD_SIZE", "8")
    clean_env.setenv("MASTER_ADDR", "head")
    clean_env.setenv("MASTER_PORT", "12345")
    d = resolve_distributed_env()
    assert d == {"coordinator": "head:12345", "num_processes": 8, "process_id": 5}


@pytest.mark.parametrize(
    "nodelist,first",
    [
        ("foo[1-10],bar[3-8]", "foo1"),
        ("foo4,bar[2-10]", "foo4"),
        ("tpu-host[001-004]", "tpu-host001"),
        ("single", "single"),
        ("n[7,9-12]", "n7"),
    ],
)
def test_slurm_nodelist_parse(nodelist, first):
    assert _slurm_first_host(nodelist) == first
