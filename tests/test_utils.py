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


def test_relay_probe_gating(monkeypatch):
    """require_tpu_relay is a no-op for CPU-forced runs and exits(2) when the
    axon backend would be used but the relay is unreachable."""
    import pytest

    from cermvs_tpu.utils import relay

    # no pool IPs -> axon never registers -> no-op regardless of relay state
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    relay.require_tpu_relay()

    # explicit CPU run -> no-op
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    relay.require_tpu_relay()

    # axon run with relay down -> SystemExit(2), BEFORE any jax device touch
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setattr(relay, "tpu_relay_up", lambda timeout=10.0: False)
    with pytest.raises(SystemExit) as ei:
        relay.require_tpu_relay()
    assert ei.value.code == 2

    # relay up -> proceeds
    monkeypatch.setattr(relay, "tpu_relay_up", lambda timeout=10.0: True)
    relay.require_tpu_relay()


def test_relay_probe_connect_refused():
    """A connection-refused port reads as down; an HTTP error as up."""
    from cermvs_tpu.utils import relay

    old = relay.RELAY_HEALTH_URL
    try:
        relay.RELAY_HEALTH_URL = "http://127.0.0.1:1/health"
        assert not relay.tpu_relay_up(timeout=2.0)
    finally:
        relay.RELAY_HEALTH_URL = old


def test_compilation_cache_setup(tmp_path, monkeypatch):
    """setup_compilation_cache points jax at the directory (parse_cli wires
    it into every CLI entry point); CERMVS_COMPILE_CACHE=0 opts out."""
    import jax

    from cermvs_tpu.utils import compile_cache

    monkeypatch.setattr(compile_cache, "_done", False)
    monkeypatch.setenv("CERMVS_COMPILE_CACHE", "0")
    assert compile_cache.setup_compilation_cache() is None

    monkeypatch.setenv("CERMVS_COMPILE_CACHE", "")
    d = str(tmp_path / "xla")
    assert compile_cache.setup_compilation_cache(d) == d
    assert (tmp_path / "xla").is_dir()
    assert jax.config.jax_compilation_cache_dir == d
    # idempotent re-entry keeps the configured dir
    assert compile_cache.setup_compilation_cache(d) == d
