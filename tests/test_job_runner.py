"""cmd.sh / {run,queue,slurm}.pl analog (utils/job.py)."""

import sys
from pathlib import Path

import pytest

from llm_guided_asr_tpu.utils.job import JobOptions, JobRunner, SchedulerConf


def test_local_array_job_substitutes_and_logs(tmp_path):
    out = tmp_path / "out"
    out.mkdir()
    rc = JobRunner("local").run(
        [sys.executable, "-c",
         f"open(r'{out}/res.JOB','w').write('job JOB done')"],
        log=str(tmp_path / "log" / "t.JOB.log"), array=(1, 3),
        options=JobOptions(max_jobs_run=2),
    )
    assert rc == 0
    for j in (1, 2, 3):
        assert (out / f"res.{j}").read_text() == f"job {j} done"
        log = (tmp_path / "log" / f"t.{j}.log").read_text()
        assert log.startswith("# ")  # run.pl-style command header


def test_local_failure_propagates_rc(tmp_path):
    rc = JobRunner("local").run(
        [sys.executable, "-c", "import sys; sys.exit(3 if 'JOB' == '2' else 0)"],
        log=str(tmp_path / "f.JOB.log"), array=(1, 3),
    )
    assert rc == 3


def test_array_must_start_at_one(tmp_path):
    with pytest.raises(ValueError, match="JOB=1:N"):
        JobRunner("local").run(["true"], log=str(tmp_path / "x.log"), array=(0, 3))


def test_slurm_submission_built_from_conf(tmp_path):
    argv = JobRunner("slurm").run(
        ["python", "decode.py", "--part", "JOB"],
        log="exp/log/d.JOB.log", array=(1, 8),
        options=JobOptions(mem="4G", time="2:00:00", num_threads=2,
                           gpu=1, max_jobs_run=4),
        build_only=True,
    )
    s = " ".join(argv)
    assert argv[0] == "sbatch"
    assert "--mem-per-cpu 4G" in s and "--time 2:00:00" in s
    assert "--cpus-per-task 2" in s and "--gres gpu:1" in s
    assert "--array 1-8%4" in s
    assert "--output exp/log/d.%a.log" in s
    assert "${SLURM_ARRAY_TASK_ID}" in argv[-1]


def test_sge_submission_and_custom_conf(tmp_path):
    conf = tmp_path / "queue.conf"
    conf.write_text(
        "command qsub -V -cwd\n"
        "option mem=* -l mem_free=$0\n"
        "option gpu=0\n"          # gpu=0 maps to no flags
        "option gpu=* -l gpu=$0\n"
        "default gpu=0\n"
    )
    r = JobRunner("sge", conf=str(conf))
    argv = r.run(["echo", "JOB"], log="l.JOB.log", array=(1, 2),
                 options=JobOptions(mem="8G", gpu=0), build_only=True)
    s = " ".join(argv)
    assert argv[0] == "qsub" and "-l mem_free=8G" in s
    assert "gpu=" not in s.replace("mem_free", "")  # gpu=0 -> nothing
    assert "-t 1-2" in s


def test_ssh_round_robin(tmp_path):
    argvs = JobRunner("ssh", hosts=["hostA", "hostB"]).run(
        ["run", "JOB"], log=str(tmp_path / "s.JOB.log"), array=(1, 3),
        build_only=True,
    )
    assert [a[1] for a in argvs] == ["hostA", "hostB", "hostA"]
    assert argvs[2][-1] == "3"


def test_scheduler_conf_parser():
    c = SchedulerConf(
        "# comment\ncommand sbatch --wait\noption mem=* --mem $0\n"
        "option gpu=1 --gres gpu:1 --partition gpu\ndefault gpu=0\n"
    )
    assert c.command == ["sbatch", "--wait"]
    assert c.flags_for("mem", "16G") == ["--mem", "16G"]
    assert c.flags_for("gpu", 1) == ["--gres", "gpu:1", "--partition", "gpu"]
    assert c.flags_for("gpu", None) == []
