"""Job-scheduler runner (run_wrapper.sh equivalent): detection, job-script
generation, local execution, after_run checks, and the PASS/FAIL report."""

import os
import pathlib
import sys

import pytest

from genarchbench_tpu.harness.scheduler import (
    Job, JobRunner, detect_scheduler, _job_script, read_energy_j)


def test_detect_scheduler_env_override(monkeypatch):
    monkeypatch.setenv("GENARCH_JOB_SCHEDULER", "PJM")
    assert detect_scheduler() == "PJM"
    monkeypatch.setenv("GENARCH_JOB_SCHEDULER", "NONE")
    assert detect_scheduler() == "NONE"


def test_job_script_slurm(tmp_path):
    job = Job(name="chain", command=["python", "-m", "x"], devices=4,
              hosts=2, nodes=2, platform="cpu", env={"FOO": "a b"})
    script = _job_script(job, "SLURM", tmp_path)
    assert "#SBATCH --nodes=2" in script
    assert "#SBATCH --ntasks=2" in script
    assert "export GENARCH_DEVICES=4" in script
    assert "--xla_force_host_platform_device_count=4" in script
    assert "export FOO='a b'" in script
    assert script.rstrip().endswith("python -m x")


def test_job_script_pjm(tmp_path):
    job = Job(name="bsw", command=["true"], devices=1)
    script = _job_script(job, "PJM", tmp_path)
    assert "#PJM -L node=1" in script
    assert "#PJM -s" in script          # stats file => energy scrape
    # devices=1, no platform forcing => no host-platform override
    assert "xla_force_host_platform_device_count" not in script


def test_local_run_pass_fail_report(tmp_path, capsys):
    runner = JobRunner(scheduler="NONE", work_dir=str(tmp_path / "jobs"))
    seen = {}

    def check_ok(stage, res):
        seen["stdout"] = (stage / "stdout.txt").read_text()
        return True

    jobs = [
        Job(name="good", command=["echo", "hello"], after_run=check_ok),
        Job(name="bad", command=["bash", "-c", "exit 3"]),
    ]
    results = runner.run(jobs)
    assert results[0].ok and results[0].state == "COMPLETED"
    assert seen["stdout"].strip() == "hello"
    assert not results[1].ok and results[1].exit_code == 3
    err = capsys.readouterr().err
    assert "Failed jobs: 1/2" in err


def test_local_run_failed_check(tmp_path):
    runner = JobRunner(scheduler="NONE", work_dir=str(tmp_path / "jobs"),
                       quiet=True)
    job = Job(name="c", command=["echo", "x"], after_run=lambda s, r: False)
    res = runner.run([job])[0]
    assert res.state == "COMPLETED" and res.check_ok is False and not res.ok


def test_local_run_cwd_and_env(tmp_path):
    runner = JobRunner(scheduler="NONE", work_dir=str(tmp_path / "jobs"),
                       quiet=True)
    wd = tmp_path / "wd"
    wd.mkdir()
    job = Job(name="envtest",
              command=["bash", "-c", "pwd; echo $GENARCH_DEVICES $MYVAR"],
              devices=2, platform="cpu", workdir=str(wd),
              env={"MYVAR": "zz"})
    res = runner.run([job])[0]
    out = (res.stage_dir / "stdout.txt").read_text().split()
    assert out[0] == str(wd) and out[1] == "2" and out[2] == "zz"


def test_local_timeout(tmp_path, monkeypatch):
    monkeypatch.setenv("GENARCH_REGRESS_TIMEOUT", "1")
    runner = JobRunner(scheduler="NONE", work_dir=str(tmp_path / "jobs"),
                       quiet=True)
    res = runner.run([Job(name="slow", command=["sleep", "30"])])[0]
    assert res.state == "SIGNALED" and not res.ok


def test_read_energy_local_rapl_monotonic():
    # With no RAPL sysfs (containers), returns None; with one, a delta >= 0.
    e = read_energy_j("NONE", None, rapl_before=0)
    assert e is None or e >= 0


def test_regress_via_harness(tmp_path):
    """End-to-end: cli.cmd_regress submits through the JobRunner."""
    import numpy as np
    from genarchbench_tpu import cli
    from tests.synth import gen_seqpair_dataset

    rng = np.random.default_rng(5)
    inp = tmp_path / "pairs.txt"
    inp.write_text(gen_seqpair_dataset(rng, n_pairs=6, length=40,
                                       error_rate=0.1))
    os.environ.setdefault("GENARCH_JOB_DIR", str(tmp_path / "jobs"))
    try:
        rc = cli.cmd_regress("bpm", ["-i", str(inp)], golden=None,
                             devices=[1], platform="cpu", check_rule=None)
    finally:
        os.environ.pop("GENARCH_JOB_DIR", None)
    assert rc == 0
