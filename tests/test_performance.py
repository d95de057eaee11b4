"""Performance floors (reference: test/performance/ — e.g.
parallel_performance.cpp:50-55 asserts relative speedups in CI).

Two kinds, both cheap enough for CI on any backend:
  * timing floors — relative asserts with wide margins;
  * engagement floors — the fast lowering path must actually engage
    (spies), so a silent fallback regression fails loudly even where
    CPU timing would be too noisy to notice.
Absolute-ms floors run only on real TPU hardware.
"""
import time

import numpy as np
import pytest

import halide_tpu as hl


def _t(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


# ---------------------------------------------------------------------------
# timing floors (relative, backend-agnostic)
# ---------------------------------------------------------------------------

def test_floor_jit_cache_amortizes_compile():
    x, y = hl.Var("x"), hl.Var("y")
    img = hl.ImageParam(hl.Float(32), 2, "pfj_in")
    img.set(np.random.rand(256, 256).astype(np.float32))
    f = hl.Func("pfj")
    f[x, y] = hl.sqrt(img[x, y] * 2.0 + 1.0) + hl.exp(-img[x, y])
    p = hl.Pipeline(f)
    t_first = _t(lambda: p.realize([256, 256]), n=1)
    t_warm = _t(lambda: p.realize([256, 256]))
    assert t_warm < t_first, (t_warm, t_first)
    assert t_warm * 3 < t_first, \
        f"jit cache gives <3x: first {t_first:.4f}s warm {t_warm:.4f}s"


def test_floor_memoize_cache_hits():
    x = hl.Var("x")
    img = hl.ImageParam(hl.Float(32), 1, "pfm_in")
    img.set(np.random.rand(1 << 16).astype(np.float32))
    g = hl.Func("pfm_heavy")
    g[x] = hl.sin(img[x]) * hl.cos(img[x]) + hl.sqrt(hl.abs(img[x]))
    g.compute_root().memoize()
    f = hl.Func("pfm_out")
    f[x] = g[x] + 1.0
    p = hl.Pipeline(f)
    p.realize([1 << 16])                    # populate
    t_hit = _t(lambda: p.realize([1 << 16]))
    assert t_hit < 0.5, f"memoized re-realize too slow: {t_hit:.3f}s"


def test_floor_fusion_beats_per_stage_materialization():
    # 16 chained elementwise stages: inlined (one pass) vs compute_root
    # each (16 materializations + barriers) — fusion must win
    def build(materialize):
        x, y = hl.Var("x"), hl.Var("y")
        img = hl.ImageParam(hl.Float(32), 2, "pff_in")
        img.set(np.random.rand(512, 512).astype(np.float32))
        prev = None
        fs = []
        for i in range(16):
            f = hl.Func(f"pff_{'m' if materialize else 'i'}_{i}")
            if prev is None:
                f[x, y] = img[x, y] * 1.0001 + 0.5
            else:
                f[x, y] = prev[x, y] * 1.0001 + 0.5
            if materialize:
                f.compute_root()
            prev = f
            fs.append(f)
        out = hl.Func(f"pff_out_{'m' if materialize else 'i'}")
        out[x, y] = prev[x, y]
        return hl.Pipeline(out)

    pi, pm = build(False), build(True)
    pi.realize([512, 512])
    pm.realize([512, 512])
    # best-of-7 and a wide margin: at this size per-realize Python
    # overhead is comparable to compute, so only assert "not slower"
    # retry once: on a loaded host a single best-of-7 can still catch a
    # scheduler hiccup (observed flaking in full-suite runs only)
    for attempt in range(2):
        ti = _t(lambda: pi.realize([512, 512]), n=7)
        tm = _t(lambda: pm.realize([512, 512]), n=7)
        if ti <= tm * 2.0:
            break
    assert ti <= tm * 2.0, \
        f"fused chain slower than materialize-everything: {ti:.4f} vs {tm:.4f}"


# ---------------------------------------------------------------------------
# engagement floors (the optimized path must actually run)
# ---------------------------------------------------------------------------

@pytest.fixture
def read_spies(monkeypatch):
    from halide_tpu import eval_jnp as EJ
    hits = {"gather": 0, "batched": 0, "factored_lut": 0}
    orig_g, orig_b = EJ._gather_read, EJ._batched_onehot_read

    def g(*a, **k):
        hits["gather"] += 1
        return orig_g(*a, **k)

    def b(*a, **k):
        r = orig_b(*a, **k)
        hits["batched"] += r is not None
        return r

    monkeypatch.setattr(EJ, "_gather_read", g)
    monkeypatch.setattr(EJ, "_batched_onehot_read", b)
    from halide_tpu.ops import onehot_mxu
    orig_l = onehot_mxu.lut_gather

    def lg(*a, **k):
        hits["factored_lut"] += 1
        return orig_l(*a, **k)

    monkeypatch.setattr(onehot_mxu, "lut_gather", lg)
    return hits


def _run_app(name, **kw):
    from halide_tpu.apps import get
    app = get(name)(**kw)
    app.bind(app.make_inputs())
    app.realize()


def test_floor_blur_app_engages_pallas(monkeypatch):
    # blur's MEASURED default is the fused-XLA lowering (round-5 sweep:
    # 41.8us vs the best kernel's 51.1us); the row-band Pallas kernel is
    # the opt-in A/B path and must still engage + match the golden
    monkeypatch.setenv("HALIDE_TPU_BLUR_TILE", "128x64")
    from halide_tpu.ops import pallas_group as pg
    engaged = []
    orig = pg.try_pallas_group

    def spy(*a, **kw):
        r = orig(*a, **kw)
        engaged.append(r is not None)
        return r

    pg.try_pallas_group = spy
    try:
        from halide_tpu.apps import get
        app = get("blur")(width=160, height=96)
        app.bind(app.make_inputs())
        out = np.asarray(app.realize(), dtype=np.uint16)
        np.testing.assert_array_equal(out, app.reference(**app.make_inputs()))
        assert engaged and engaged[-1], "blur app fell back from Pallas"
    finally:
        pg.try_pallas_group = orig


def test_floor_tiled_group_plans_pipelined_dma():
    # a tiled group whose inner grid dim iterates must plan double-buffered
    # input DMA, and parallel() marks must become "parallel" semantics
    from halide_tpu.ops import pallas_group as pg
    x, y = hl.Var("x"), hl.Var("y")
    img = hl.ImageParam(hl.UInt(16), 2, "pfp_in")
    img.set(np.random.randint(0, 1 << 14, (512, 1024)).astype(np.uint16))
    bx = hl.Func("pfp_bx")
    by = hl.Func("pfp_by")
    bx[x, y] = (img[x, y] + img[x + 1, y] + img[x + 2, y]) / 3
    by[x, y] = (bx[x, y] + bx[x, y + 1] + bx[x, y + 2]) / 3
    xo, yo, xi_, yi_ = (hl.Var(s) for s in ("xo", "yo", "xi", "yi"))
    by.tile(x, y, xo, yo, xi_, yi_, 256, 128).vectorize(xi_).parallel(yo)
    bx.compute_at(by, xo)
    pg._last_plan = None
    hl.Pipeline(by).realize([1022, 510], jit=False)
    plan = pg._last_plan
    assert plan is not None, "pallas group lowering did not engage"
    assert plan["pipeline_capable"], \
        f"inner grid dim iterates but DMA pipelining not planned: {plan}"
    assert plan["semantics"][0] == "parallel", \
        f"parallel(yo) did not map to megacore semantics: {plan}"
    assert plan["semantics"][-1] == "arbitrary", plan


def test_floor_iir_scan_kernel_engages():
    from halide_tpu.ops import pallas_scan as ps
    calls = []
    orig = ps.linear_scan

    def spy(*a, **kw):
        r = orig(*a, **kw)
        calls.append(r is not None)
        return r

    ps.linear_scan = spy
    try:
        _run_app("iir_blur", width=128, height=96)
        assert calls and any(calls), "iir_blur scan fell back to log-depth"
    finally:
        ps.linear_scan = orig


def test_floor_hist_uses_factored_mxu_lut(read_spies):
    _run_app("hist", width=96, height=64)
    assert read_spies["factored_lut"] > 0, \
        "hist equalize LUT not on the factored MXU path"
    assert read_spies["gather"] == 0, "hist fell back to gather"


def test_floor_bilateral_slice_fractional_rewrite(monkeypatch):
    # the trilinear slice must collapse through the lerp-shift rewrite
    # (one weighted z-sum), not 16 per-corner one-hot contractions
    from halide_tpu import eval_jnp as EJ
    hits = []
    orig = EJ._try_lerp_shift_rewrite

    def spy(e, ctx):
        r = orig(e, ctx)
        hits.append(r is not None)
        return r

    monkeypatch.setattr(EJ, "_try_lerp_shift_rewrite", spy)
    gathers = []
    orig_g = EJ._gather_read

    def g(*a, **k):
        gathers.append(True)
        return orig_g(*a, **k)

    monkeypatch.setattr(EJ, "_gather_read", g)
    _run_app("bilateral_grid", width=128, height=96)
    assert any(hits), "trilinear slice lost the fractional-lerp rewrite"
    assert not gathers, "bilateral_grid fell back to gather"


def test_floor_bgu_slice_no_gather(read_spies):
    _run_app("bgu", width=128, height=96)
    assert read_spies["gather"] == 0, "bgu fell back to gather"


def test_floor_interpolate_no_gather(read_spies):
    _run_app("interpolate", width=96, height=64)
    assert read_spies["gather"] == 0, "interpolate fell back to gather"


def test_floor_bilateral_scatter_takes_dense_path(monkeypatch):
    from halide_tpu import updates as U
    dense = []
    orig = U._dense_small_scatter

    def spy(*a, **kw):
        dense.append(True)
        return orig(*a, **kw)

    monkeypatch.setattr(U, "_dense_small_scatter", spy)
    unrolled = []
    orig_u = U._try_unrolled_onehot

    def spy_u(*a, **kw):
        r = orig_u(*a, **kw)
        unrolled.append(r is not None)
        return r

    monkeypatch.setattr(U, "_try_unrolled_onehot", spy_u)
    _run_app("bilateral_grid", width=128, height=96)
    assert dense, "grid construction lost the dense compare/MXU reduction"
    assert not any(unrolled), \
        "grid construction regressed to the sequential unrolled one-hot"


def test_floor_strided_clamped_reads_slice_not_gather(read_spies):
    x, y = hl.Var("x"), hl.Var("y")
    img = hl.ImageParam(hl.Float(32), 2, "pfs_in")
    img.set(np.random.rand(64, 128).astype(np.float32))
    cl = hl.repeat_edge(img)
    f = hl.Func("pfs")
    f[x, y] = cl[2 * x - 1, y] + cl[2 * x, y] + cl[2 * x + 1, y]
    f.realize([64, 64])
    assert read_spies["gather"] == 0, "strided clamped read hit gather"


# ---------------------------------------------------------------------------
# absolute floors, real TPU only
# ---------------------------------------------------------------------------

def _on_tpu():
    import jax
    return jax.default_backend() == "tpu"


@pytest.mark.skipif("not _on_tpu()")
def test_floor_tpu_blur_absolute():
    import bench
    from halide_tpu.apps import get
    app = get("blur")()
    app.bind(app.make_inputs())
    dt = bench.bench_one(app)
    assert dt * 1e3 < 0.15, f"blur {dt*1e3:.3f} ms/frame (floor 0.15)"
