"""Tracing / profiling / memoization (reference: SURVEY.md §5.1, §5.4;
src/Tracing.cpp, src/Profiling.cpp, src/Memoization.cpp + runtime/cache.cpp)."""
import os

import numpy as np
import pytest

import halide_tpu as hl
from halide_tpu.trace import tracing


def _pipe():
    x, y = hl.Var("x"), hl.Var("y")
    inp = hl.ImageParam(hl.Float(32), 2, "t_in")
    p = hl.Func("prod")
    c = hl.Func("cons")
    p[x, y] = inp[x, y] * 2.0
    p.compute_root().trace_stores().trace_realizations()
    c[x, y] = p[x, y] + 1.0
    return c, inp, p


def test_trace_events_and_packets(tmp_path):
    c, inp, p = _pipe()
    inp.set(np.ones((8, 10), np.float32))
    pipe = hl.Pipeline(c)
    path = str(tmp_path / "trace.bin")
    with tracing(pipe, file=path) as t:
        out = pipe.realize([10, 8])
        np.asarray(out.to_numpy())
    counts = t.counts()
    assert counts[("begin_realization", "prod")] == 1
    assert counts[("store", "prod")] == 1
    assert counts[("end_realization", "prod")] == 1
    assert os.path.getsize(path) > 0


def test_profile_report():
    c, inp, p = _pipe()
    inp.set(np.ones((8, 10), np.float32))
    rep = hl.Pipeline(c).profile([10, 8])
    names = [e["name"] for e in rep["funcs"]]
    assert "prod" in names and "cons" in names
    assert "ms" in str(rep)


def test_memoize_cache_hits():
    from halide_tpu.runtime import memo_cache
    x = hl.Var("x")
    inp = hl.ImageParam(hl.Float(32), 1, "m_in")
    lut = hl.Func("lut_memo")
    lut[x] = hl.exp(hl.f32(x) * 0.01)
    lut.compute_root().memoize()
    out = hl.Func("memo_out")
    out[x] = lut[hl.clamp(hl.i32(inp[x] * 10.0), 0, 99)]
    inp.set(np.linspace(0, 9.9, 50, dtype=np.float32))
    pipe = hl.Pipeline(out)
    memo_cache().clear()
    r1 = pipe.realize([50]).to_numpy()
    s1 = memo_cache().stats()
    pipe2 = hl.Pipeline(out)
    r2 = pipe2.realize([50]).to_numpy()
    s2 = memo_cache().stats()
    np.testing.assert_allclose(r1, r2)
    assert s2["hits"] > s1["hits"]


def test_native_runtime_cache():
    from halide_tpu.runtime import MemoCache, get_lib
    c = MemoCache(1 << 20)
    c.store(b"k1", b"hello")
    assert c.lookup(b"k1") == b"hello"
    assert c.lookup(b"nope") is None
    # LRU eviction under pressure
    for i in range(2000):
        c.store(f"key{i}".encode(), b"x" * 1024)
    st = c.stats()
    assert st["bytes"] <= (1 << 20)


def test_profile_fused_mode():
    c, inp, p = _pipe()
    inp.set(np.ones((64, 96), np.float32))
    rep = hl.Pipeline(c).profile([96, 64], mode="fused")
    names = [e["name"] for e in rep["funcs"]]
    assert "prod" in names and "cons" in names
    assert rep["total_ms"] >= 0
    # cumulative times are monotone by construction of the deltas
    assert all(e["ms"] >= 0 for e in rep["funcs"])
    assert "fused" in str(rep)
