"""bench.py auto-select logic (driver-critical: the end-of-round bench runs
unattended on real hardware and must adopt the fastest fused-stack config,
fall back cleanly when probes fail, and never wedge).

The probes are subprocesses; here subprocess.run is faked so the selection
logic is tested hermetically."""
import importlib.util
import json
import os
import subprocess
import sys
import types

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod.time, "sleep", lambda s: None)
    # snapshot the env keys the selector mutates
    for k in ("BENCH_FUSED", "BENCH_APPLY", "BENCH_SCAN_LAYERS",
              "BENCH_BLOCK_DTYPE", "BENCH_AUTO", "BENCH_ITERS"):
        monkeypatch.delenv(k, raising=False)
    return mod


def _fake_run(values_by_fused):
    """subprocess.run fake: reads BENCH_FUSED from the probe env and emits
    the scripted mol/s value as bench.py's one-line JSON contract."""

    def run(cmd, env=None, capture_output=True, text=True, timeout=None):
        fused = env.get("BENCH_FUSED", "none")
        if env.get("BENCH_BLOCK_DTYPE") == "bfloat16":
            fused += "+bf16"
        assert env.get("BENCH_AUTO") == "0", "probe must not recurse"
        assert env.get("BENCH_ITERS") == "1", "probe must be cheap"
        val = values_by_fused[fused]
        if val is None:  # simulate a crashed/hung probe
            raise subprocess.TimeoutExpired(cmd, timeout)
        out = json.dumps({"metric": "sampling_throughput_1000step",
                          "value": val, "unit": "molecules/sec/chip",
                          "vs_baseline": val / 100.0})
        return types.SimpleNamespace(stdout=out + "\n", stderr="",
                                     returncode=0)

    return run


def test_auto_select_adopts_fastest(bench, monkeypatch):
    monkeypatch.setattr(subprocess, "run", _fake_run(
        {"none": 1.0, "xla2+bf16": 3.2, "xla2": 2.8, "xla": 0.9}))
    best = bench._auto_select()
    assert best == 3.2
    assert os.environ["BENCH_FUSED"] == "xla2"
    assert os.environ["BENCH_BLOCK_DTYPE"] == "bfloat16"
    assert os.environ["BENCH_APPLY"] == "split"
    assert os.environ["BENCH_SCAN_LAYERS"] == "1"


def test_auto_select_survives_probe_crashes(bench, monkeypatch):
    # Mosaic rejects the pallas kernels (probe timeout/crash) -> the
    # XLA-fused and unfused rows still compete
    monkeypatch.setattr(subprocess, "run", _fake_run(
        {"none": 1.0, "xla2+bf16": None, "xla2": None, "xla": 1.7}))
    best = bench._auto_select()
    assert best == 1.7
    assert os.environ["BENCH_FUSED"] == "xla"


def test_auto_select_all_fail_returns_none(bench, monkeypatch):
    monkeypatch.setattr(subprocess, "run", _fake_run(
        {"none": None, "xla2+bf16": None, "xla2": None, "xla": None}))
    assert bench._auto_select() is None
    # env untouched -> in-process fallback uses the in-file defaults
    assert "BENCH_FUSED" not in os.environ


def test_auto_select_honors_user_pins(bench, monkeypatch):
    # BENCH_APPLY pinned by the caller: probes must not override it and the
    # adopted winner must not clobber it
    monkeypatch.setenv("BENCH_APPLY", "split")

    def run(cmd, env=None, capture_output=True, text=True, timeout=None):
        assert env["BENCH_APPLY"] == "split"
        val = {"none": 2.0}.get(env.get("BENCH_FUSED", "none"), 0.5)
        out = json.dumps({"metric": "m", "value": val, "unit": "u",
                          "vs_baseline": 0})
        return types.SimpleNamespace(stdout=out + "\n", stderr="",
                                     returncode=0)

    monkeypatch.setattr(subprocess, "run", run)
    best = bench._auto_select()
    assert best == 2.0
    assert os.environ["BENCH_FUSED"] == "none"
    assert os.environ["BENCH_APPLY"] == "split"
