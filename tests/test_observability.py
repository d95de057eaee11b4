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


def test_debug_to_file_npy_and_tmp(tmp_path):
    # debug_to_file dumps the realization when produced (reference:
    # src/DebugToFile.cpp, Lower.cpp:257): .npy round-trips through
    # numpy; other names get the 5-int32-header .tmp layout
    import numpy as np
    import halide_tpu as hl

    x, y = hl.Var("x"), hl.Var("y")
    f = hl.Func("dbg_f")
    g = hl.Func("dbg_g")
    f[x, y] = x + y * 10
    g[x, y] = f[x, y] * 2
    f.compute_root()
    npy = str(tmp_path / "f.npy")
    f.debug_to_file(npy)
    out = g.realize([4, 3]).to_numpy()
    ref_f = np.arange(4)[None, :] + np.arange(3)[:, None] * 10
    np.testing.assert_array_equal(out, ref_f * 2)
    dumped = np.load(npy)
    np.testing.assert_array_equal(dumped, ref_f.astype(dumped.dtype))

    f2 = hl.Func("dbg_f2")
    g2 = hl.Func("dbg_g2")
    f2[x, y] = hl.f32(x) + 100.0
    g2[x, y] = f2[x, y] + 1.0
    f2.compute_root()
    tmp = str(tmp_path / "f2.tmp")
    f2.debug_to_file(tmp)
    g2.realize([5, 2])
    raw = open(tmp, "rb").read()
    hdr = np.frombuffer(raw[:20], np.int32)
    assert list(hdr[:4]) == [5, 2, 1, 1]
    assert hdr[4] == 0  # float32 type code
    data = np.frombuffer(raw[20:], np.float32).reshape(2, 5)
    np.testing.assert_array_equal(
        data, (np.arange(5)[None, :] + 100.0).repeat(2, axis=0))


def test_custom_print_handler():
    # hl.print streams through the installed handler once per realization
    # (the JITUserContext::custom_print analog, HalideRuntime.h:178-196)
    import halide_tpu as hl

    msgs = []
    prev = hl.set_custom_print(msgs.append)
    try:
        x = hl.Var("x")
        f = hl.Func("cp_f")
        f[x] = hl.print_expr(x * 2, "doubled")
        out = f.realize([4]).to_numpy()
    finally:
        hl.set_custom_print(prev)
    np.testing.assert_array_equal(out, [0, 2, 4, 6])
    assert msgs and "doubled" in msgs[0]
    assert "0, 2, 4, 6" in msgs[0]


def test_per_call_print_handler():
    # realize(custom_print=...) installs the handler for ONE call and
    # restores the previous table on exit (the reference's per-call
    # JITUserContext overrides, Pipeline.cpp:818)
    import halide_tpu as hl

    msgs = []
    x = hl.Var("x")
    f = hl.Func("pc_f")
    f[x] = hl.print_expr(x + 1, "inc")
    p = hl.Pipeline(f)
    out = p.realize([4], custom_print=msgs.append).to_numpy()
    np.testing.assert_array_equal(out, [1, 2, 3, 4])
    assert msgs and "inc" in msgs[0]
    # the process-level default (stdout) is restored: a second realize
    # must NOT append to msgs
    n = len(msgs)
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        p.realize([4])
    assert len(msgs) == n
    assert "inc" in buf.getvalue()


def test_require_routes_error_handler():
    import halide_tpu as hl

    errs = []
    prev = hl.set_error_handler(errs.append)
    try:
        x = hl.Var("x")
        p = hl.Param(hl.Int(32), "rq_p")
        p.set(5)
        f = hl.Func("rq_f")
        f[x] = hl.require(p > 10, x + p)
        out = f.realize([3]).to_numpy()
    finally:
        hl.set_error_handler(prev)
    np.testing.assert_array_equal(out, [5, 6, 7])
    assert errs and "Requirement Failed" in errs[0]
