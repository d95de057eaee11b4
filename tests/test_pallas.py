"""Scheduled Pallas group lowering (interpret mode on CPU — the
WasmExecutor-style fake backend, SURVEY.md §4)."""
import numpy as np
import pytest

import halide_tpu as hl


def _blur_pipeline(W, H, schedule):
    x, y = hl.Var("x"), hl.Var("y")
    xo, yo, xi, yi = hl.Var("xo"), hl.Var("yo"), hl.Var("xi"), hl.Var("yi")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 1 << 14, (H, W), np.uint16)
    inp = hl.Buffer(img)
    bx, by = hl.Func("bx"), hl.Func("by")
    bx[x, y] = (inp[x, y] + inp[x + 1, y] + inp[x + 2, y]) / 3
    by[x, y] = (bx[x, y] + bx[x, y + 1] + bx[x, y + 2]) / 3
    if schedule:
        by.tile(x, y, xo, yo, xi, yi, 64, 16).vectorize(xi).parallel(yo)
        bx.compute_at(by, xo)
    ref = (img[:, :-2].astype(np.uint16) + img[:, 1:-1] + img[:, 2:]) // 3
    ref = (ref[:-2] + ref[1:-1] + ref[2:]) // 3
    return by, ref


def test_tiled_blur_matches():
    W, H = 200, 100
    by, ref = _blur_pipeline(W, H, schedule=True)
    out = by.realize([W - 2, H - 2]).to_numpy()
    np.testing.assert_array_equal(out, ref)


def test_tiled_blur_kernel_actually_used():
    # the pallas path must engage (not silently fall back) for this shape
    from halide_tpu.ops import pallas_group as pg
    calls = []
    orig = pg.try_pallas_group

    def spy(*a, **kw):
        r = orig(*a, **kw)
        calls.append(r is not None)
        return r

    pg.try_pallas_group = spy
    try:
        W, H = 200, 100
        by, ref = _blur_pipeline(W, H, schedule=True)
        out = by.realize([W - 2, H - 2], jit=False).to_numpy()
        np.testing.assert_array_equal(out, ref)
    finally:
        pg.try_pallas_group = orig
    assert calls and calls[-1], "pallas group lowering did not engage"


def test_tile_without_compute_at():
    W, H = 130, 70
    x, y = hl.Var("x"), hl.Var("y")
    xo, yo, xi, yi = hl.Var("xo"), hl.Var("yo"), hl.Var("xi"), hl.Var("yi")
    rng = np.random.default_rng(1)
    img = rng.standard_normal((H, W)).astype(np.float32)
    inp = hl.Buffer(img)
    f = hl.Func("ftile")
    f[x, y] = inp[x, y] * 2.0 + 1.0
    f.tile(x, y, xo, yo, xi, yi, 32, 8)
    out = f.realize([W, H]).to_numpy()
    np.testing.assert_allclose(out, img * 2 + 1, rtol=1e-6)


def test_unsupported_schedule_falls_back():
    # data-dependent gather inside the group -> silent XLA fallback
    W = 64
    x = hl.Var("x")
    xo, xi = hl.Var("xo"), hl.Var("xi")
    rng = np.random.default_rng(2)
    img = rng.integers(0, 64, (W,), np.int32)
    inp = hl.Buffer(img)
    lut = hl.Buffer(np.arange(64, dtype=np.int32) * 10)
    f = hl.Func("fgather")
    f[x] = lut[hl.clamp(inp[x], 0, 63)]
    f.split(x, xo, xi, 16)
    out = f.realize([W]).to_numpy()
    np.testing.assert_array_equal(out, np.clip(img, 0, 63) * 10)
