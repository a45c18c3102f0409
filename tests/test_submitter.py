"""Cluster submitter tests (local backend + SLURM script generation)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.submitter import submitter


def test_local_backend_runs_command(tmp_path):
    s = submitter(log_dir=str(tmp_path), backend="local", name="j1")
    s.submit("echo hello-local")
    log = (tmp_path / "j1.log").read_text()
    assert "hello-local" in log


def test_slurm_script_generation(tmp_path, monkeypatch):
    calls = []
    import subprocess

    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: calls.append(a) or None)
    s = submitter(log_dir=str(tmp_path), backend="slurm", name="j2",
                  account="acct", gres="gpu:1", mail_user="x@y",
                  cpus_per_task=4, mem_mb=16, time="00-01:00:00")
    s.submit("python inference.py -g inference_DTU")
    script = (tmp_path / "j2.sh").read_text()
    assert "#SBATCH --job-name=j2" in script
    assert "#SBATCH --account=acct" in script
    assert "#SBATCH --gres=gpu:1" in script
    assert "#SBATCH --mail-user=x@y" in script
    assert "python inference.py -g inference_DTU" in script
    assert calls and calls[0][0][0] == "sbatch"
