"""Bench-harness resilience self-tests (parent/worker protocol of bench.py).

Gated behind BENCH_SELFTEST=1: each case spawns real worker subprocesses
(fresh jax imports), which is too slow for the default suite. Run with:

    BENCH_SELFTEST=1 python -m pytest tests/test_bench_harness.py -q

Mirrors the reference's every-app-is-its-own-binary isolation
(tools/RunGen.h:1267): one app crashing its process must not cost the rest
of the run.
"""
import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("BENCH_SELFTEST"),
    reason="spawns fresh-jax worker subprocesses; BENCH_SELFTEST=1 opts in")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra_env, timeout=600):
    env = dict(os.environ, BENCH_PLATFORM="cpu", BENCH_WALL_S="400",
               BENCH_INIT_S="180", BENCH_NO_COMPCACHE="1", **extra_env)
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=ROOT)
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert lines, out.stderr[-2000:]
    full = json.loads(lines[-2])      # full record (apps + errors)
    summary = json.loads(lines[-1])   # compact headline
    return full, summary


def test_backend_loss_respawns_worker():
    """A dead backend mid-run must cost only the app it died on: the worker
    health-checks after an UNAVAILABLE error, exits, and the parent
    respawns a fresh worker for the remaining apps (observed failure mode:
    one camera_pipe TPU fault burned 14 remaining apps in seconds)."""
    full, _ = _run_bench({"BENCH_APPS": "fft,saxpy",
                          "BENCH_FAKE_UNAVAIL": "fft"})
    assert "fft" in full["errors"], full["errors"]
    assert "saxpy" in full["apps"], (full["apps"], full["errors"])


def test_worker_crash_respawns():
    """A worker that dies outright (Mosaic abort analog) is respawned and
    the remaining apps still measure."""
    full, _ = _run_bench({"BENCH_APPS": "fft,saxpy",
                          "BENCH_FAKE_CRASH": "fft"})
    assert "fft" in full["errors"], full["errors"]
    assert "saxpy" in full["apps"], (full["apps"], full["errors"])
