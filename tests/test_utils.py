"""Logger / memory / profiling utility tests."""

import json
import os

import numpy as np
import pytest

from cermvs_tpu.utils.logger import Logger
from cermvs_tpu.utils.memory import device_memory_stats, report
from cermvs_tpu.utils.profiling import ViewTimer


def test_logger_running_means(tmp_path, capsys):
    log = Logger("t", run_dir=str(tmp_path), SUM_FREQ=5,
                 lr_fn=lambda s: 0.001)
    for i in range(9):
        log.push({"loss": float(i), "epe": 2.0})
    log.close()
    out = capsys.readouterr().out
    assert "Training Metrics" in out
    lines = [json.loads(l) for l in
             open(tmp_path / "t" / "metrics.jsonl").read().splitlines()]
    # flushes at total_steps % SUM_FREQ == SUM_FREQ-1 (reference quirk:
    # utils/logger.py:53), i.e. after 4 and 9 pushes; sums divide by SUM_FREQ
    assert len(lines) == 2
    np.testing.assert_allclose(lines[0]["epe"], 4 * 2.0 / 5)
    np.testing.assert_allclose(lines[1]["epe"], 2.0)
    assert lines[0]["lr"] == 0.001


def test_logger_nonhost0_writes_nothing(tmp_path):
    log = Logger("t2", run_dir=str(tmp_path), SUM_FREQ=2, is_host0=False)
    for i in range(5):
        log.push({"loss": 1.0})
    log.close()
    assert not (tmp_path / "t2").exists()


def test_memory_stats_and_report(capsys):
    stats = device_memory_stats()
    assert len(stats) >= 1
    report()
    assert "peak" in capsys.readouterr().out


def test_view_timer(capsys):
    t = ViewTimer(enabled=True)
    with t.view("v0"):
        pass
    with t.view("v1"):
        pass
    s = t.summary()
    assert s["views"] == 2
    assert "per view time" in capsys.readouterr().out

    t2 = ViewTimer(enabled=False)
    with t2.view("x"):
        pass
    assert t2.summary() == {}
