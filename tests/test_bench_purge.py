"""Unit test for bench._purge_cache_since (no jax, runs in default suite).

A worker SIGKILLed mid-cache-write leaves a truncated serialized
executable behind; loading a truncated entry hard-crashes the TPU server
process (observed: one poisoned camera_pipe chain entry crashed every
subsequent bench run until removed). The parent therefore purges cache
files written during a killed app's window.
"""
import importlib.util
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_for_test", os.path.join(ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_for_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_purge_cache_since(tmp_path, monkeypatch):
    bench = _load_bench()
    monkeypatch.setenv("BENCH_CACHE_DIR", str(tmp_path))

    old = tmp_path / "jit_old-deadbeef-cache"
    old.write_bytes(b"x" * 64)
    past = time.time() - 3600
    os.utime(old, (past, past))

    probe = tmp_path / "probe_cache.json"
    probe.write_text("{}")

    cut = time.time() - 5
    fresh = tmp_path / "jit_chain_run-abc123-cache"
    fresh.write_bytes(b"y" * 64)   # mtime = now, inside the kill window

    bench._purge_cache_since(cut)

    assert old.exists(), "entries from before the window must survive"
    assert probe.exists(), "non-executable cache metadata must survive"
    assert not fresh.exists(), "entries written in the window are purged"
