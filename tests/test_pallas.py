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


def _app_engages_and_matches(name, _env=None, **kw):
    """Engagement spy: the app's scheduled group must actually lower to a
    Pallas kernel (silent fallback fails the test), and match its golden."""
    import os
    from halide_tpu.apps import get
    from halide_tpu.ops import pallas_group as pg
    for k, v in (_env or {}).items():
        os.environ[k] = v
    try:
        app = get(name)(**kw)
    finally:
        for k in (_env or {}):
            os.environ.pop(k, None)
    data = app.make_inputs()
    app.bind(data)
    calls = []
    orig = pg.try_pallas_group

    def spy(*a, **kwa):
        r = orig(*a, **kwa)
        calls.append(r is not None)
        return r

    pg.try_pallas_group = spy
    try:
        got = np.asarray(app.realize().to_numpy())
    finally:
        pg.try_pallas_group = orig
    assert calls and any(calls), \
        f"{name}: pallas group did not engage ({pg._last_reject})"
    ref = np.asarray(app.reference(**data))
    err = np.abs(got.astype(np.float64) - ref.astype(np.float64))
    tol = app.tolerance * np.maximum(1.0, np.abs(ref)) + max(app.atol, 1e-12)
    assert float((err > tol).mean()) <= app.mismatch_frac


def test_bilateral_grid_slice_kernel_engages():
    # the trilinear slice tile schedule must reach the Pallas path (z via
    # the in-kernel fractional-slice plane unroll, x/y via div windows)
    _app_engages_and_matches("bilateral_grid", width=512, height=256)


def test_camera_pipe_isp_kernel_engages():
    # the full-res back half of the ISP (demosaic interleave -> color
    # matrix -> tone curve -> sharpen) must lower to one Pallas kernel
    # with half-res planes staged via d=2 div-indexed windows; bit-exact
    _app_engages_and_matches("camera_pipe", out_width=512, out_height=128,
                             _env={"HALIDE_TPU_CP_KERNEL": "1"})


def test_kernel_repeat_matches_jnp_repeat():
    # the in-kernel sublane repeat lowers as a one-hot expansion matmul
    # (Mosaic cannot lower jnp.repeat); it must be element-exact
    import jax.numpy as jnp
    from halide_tpu.eval_jnp import _kernel_repeat

    class KCtx:
        in_kernel = True

    rng = np.random.default_rng(5)
    for shape, npax, div in [((8, 128), 0, 2), ((3, 8, 128), 1, 8),
                             ((2, 5, 4, 128), 2, 3), ((2, 5, 4, 128), 1, 2)]:
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        got = np.asarray(_kernel_repeat(x, div, npax, KCtx()))
        ref = np.repeat(np.asarray(x), div, axis=npax)
        np.testing.assert_array_equal(got, ref)
    # wide ints take the unrolled-concat path (no f32 round-trip)
    xi = jnp.asarray(rng.integers(0, 1 << 30, (4, 8, 128)).astype(np.int32))
    got = np.asarray(_kernel_repeat(xi, 2, 1, KCtx()))
    np.testing.assert_array_equal(got, np.repeat(np.asarray(xi), 2, axis=1))


def test_interpolate_blend_kernel_engages():
    # the full-res pyramid blend + normalize lowers to one Pallas kernel
    # (interpolated[1] staged through d=2 div windows)
    _app_engages_and_matches("interpolate", width=512, height=128,
                             levels=6, _env={"HALIDE_TPU_IP_KERNEL": "1"})


def test_local_laplacian_collapse_kernel_engages():
    # the 8-plane level-0 Laplacian + fractional-slice collapse + final
    # blend runs as one kernel per tile (lPyramid[0] as a VMEM member)
    _app_engages_and_matches("local_laplacian", width=512, height=128,
                             pyramid_levels=5,
                             _env={"HALIDE_TPU_LL_KERNEL": "1"})


def test_compositing_blend_kernel_engages():
    # tuple-valued member with a masked 5-step update chain evaluated
    # IN-KERNEL (apply_update under the kernel ctx); bit-exact u8
    _app_engages_and_matches("compositing", width=512, height=128,
                             _env={"HALIDE_TPU_CO_KERNEL": "1"})


def test_async_ring_buffer_plan_recorded():
    # async()/ring_buffer() are the user-facing spelling of the automatic
    # double-buffered DMA across grid steps; the lowering plan records the
    # request so schedules can assert the overlap decision
    from halide_tpu.ops import pallas_group as pg
    W, H = 256, 64
    x, y = hl.Var("x"), hl.Var("y")
    xo, yo, xi, yi = hl.Var("xo"), hl.Var("yo"), hl.Var("xi"), hl.Var("yi")
    rng = np.random.default_rng(3)
    img = rng.integers(0, 1 << 12, (H, W), np.uint16)
    inp = hl.Buffer(img)
    bx, by = hl.Func("ar_bx"), hl.Func("ar_by")
    bx[x, y] = (inp[x, y] + inp[x + 1, y] + inp[x + 2, y]) / 3
    by[x, y] = (bx[x, y] + bx[x, y + 1] + bx[x, y + 2]) / 3
    by.tile(x, y, xo, yo, xi, yi, 64, 16).vectorize(xi).parallel(yo)
    bx.compute_at(by, xo).async_().ring_buffer(2)
    by.realize([W - 2, H - 2], jit=False)
    assert pg._last_plan is not None
    assert pg._last_plan["async_requested"] is True
    assert pg._last_plan["pipeline_capable"] in (True, False)


def test_stencil_chain_grouped_kernels_engage():
    # multiple kernel groups in ONE pipeline (opt-in schedule: the fused
    # XLA path wins at canonical size on v5e, but the grouped lowering
    # must stay correct)
    _app_engages_and_matches("stencil_chain", width=256, height=128,
                             stencils=12, _env={"HALIDE_TPU_SC_KERNEL": "1"})


def test_single_tile_div_window_prediv():
    # regression: a div-indexed coarse-table read whose grid folds to ONE
    # program (tile >= extent) folds every window origin static, so reads
    # dispatch through _affine_read's static div branch -- which must
    # honor Realized.prediv (the window arrives host-pre-expanded for
    # lane/sublane alignment). Re-expanding it read garbage: row 0
    # collapsed to table entry 0 (75-94% bad pixels).
    from halide_tpu.ops import pallas_group as pg
    W = H = 64
    cell = 16
    rng = np.random.default_rng(7)
    for case in ("xdiv", "ydiv", "both"):
        x, y = hl.Var("x"), hl.Var("y")
        if case == "xdiv":
            tabn = rng.standard_normal((H, W // cell + 2)).astype(np.float32)
            gold = tabn[np.arange(H)[:, None], (np.arange(W) // cell)[None]]
        elif case == "ydiv":
            tabn = rng.standard_normal((H // cell + 2, W)).astype(np.float32)
            gold = tabn[(np.arange(H) // cell)[:, None], np.arange(W)[None]]
        else:
            tabn = rng.standard_normal(
                (H // cell + 2, W // cell + 2)).astype(np.float32)
            gold = tabn[(np.arange(H) // cell)[:, None],
                        (np.arange(W) // cell)[None]]
        tb = hl.Buffer(tabn)
        t = hl.Func(f"t_{case}")
        t[x, y] = tb[hl.clamp(x, 0, tabn.shape[1] - 1),
                     hl.clamp(y, 0, tabn.shape[0] - 1)]
        t.compute_root()
        out = hl.Func(f"out_{case}")
        if case == "xdiv":
            out[x, y] = t[x / cell, y]
        elif case == "ydiv":
            out[x, y] = t[x, y / cell]
        else:
            out[x, y] = t[x / cell, y / cell]
        xo, yo, xin, yin = (hl.Var(n) for n in ("xo", "yo", "xin", "yin"))
        out.tile(x, y, xo, yo, xin, yin, W, H).vectorize(xin).parallel(yo)
        pg._last_plan = None
        o = out.realize([W, H], jit=False).to_numpy()
        assert pg._last_plan is not None and \
            pg._last_plan["grid"] == (1, 1), pg._last_reject
        np.testing.assert_array_equal(o, gold, err_msg=case)


def test_div_window_grid_matrix():
    # systematic sweep: div factor x grid shape x lerp/direct -- the
    # one-tile-grid prediv bug lived in a hole of this matrix. All cells
    # must be exact (the staged coarse table IS the value, no rounding).
    from halide_tpu.ops import pallas_group as pg
    rng = np.random.default_rng(31)
    W = H = 64
    for cell in (4, 8, 16):
        for tilex, tiley in ((64, 64), (32, 64), (64, 32), (32, 32)):
            for lerp in (False, True):
                x, y = hl.Var("x"), hl.Var("y")
                lw, lh = W // cell + 2, H // cell + 2
                tabn = rng.standard_normal((lh, lw)).astype(np.float32)
                tb = hl.Buffer(tabn)
                t = hl.Func(f"m_t{cell}_{tilex}_{tiley}_{int(lerp)}")
                t[x, y] = tb[hl.clamp(x, 0, lw - 1), hl.clamp(y, 0, lh - 1)]
                t.compute_root()
                out = hl.Func(f"m_o{cell}_{tilex}_{tiley}_{int(lerp)}")
                xi_ = x / cell
                yi2 = y / cell
                if lerp:
                    xf = hl.f32(x) / cell - hl.f32(xi_)
                    out[x, y] = hl.lerp(t[xi_, yi2], t[xi_ + 1, yi2], xf)
                else:
                    out[x, y] = t[xi_, yi2]
                xo, yo, xin, yin = (hl.Var(nm)
                                    for nm in ("xo", "yo", "xin", "yin"))
                out.tile(x, y, xo, yo, xin, yin, tilex, tiley) \
                   .vectorize(xin).parallel(yo)
                o = out.realize([W, H], jit=False).to_numpy()
                ys = (np.arange(H) // cell)
                xs = (np.arange(W) // cell)
                g0 = tabn[ys[:, None], xs[None, :]]
                if lerp:
                    g1 = tabn[ys[:, None], np.minimum(xs + 1, lw - 1)[None]]
                    xfv = (np.arange(W) / np.float32(cell) - xs).astype(
                        np.float32)
                    gold = g0 + xfv[None, :] * (g1 - g0)
                    np.testing.assert_allclose(
                        o, gold, rtol=0, atol=1e-6,
                        err_msg=f"cell={cell} tile={tilex}x{tiley} lerp")
                else:
                    np.testing.assert_array_equal(
                        o, g0,
                        err_msg=f"cell={cell} tile={tilex}x{tiley}")


def test_partitioned_tail_shift_inwards():
    # a non-multiple extent through a tiled schedule lowers as interior
    # floor-tiles + shifted edge strips (no RoundUp over-compute: the
    # output is written exactly, edge tiles recompute the overlap band)
    from halide_tpu.ops import pallas_group as pg
    W, H = 200, 100        # 64x16 tiles: 200%64=8, 100%16=4 -> x+y strips
    by, ref = _blur_pipeline(W, H, schedule=True)
    pg._last_plan = None
    out = by.realize([W - 2, H - 2], jit=False).to_numpy()
    np.testing.assert_array_equal(out, ref)
    assert pg._last_plan is not None
    assert pg._last_plan.get("tail") == "shift_inwards", pg._last_plan
    assert pg._last_plan.get("parts") == 4, pg._last_plan  # int + x + y + corner


def test_partitioned_tail_1d():
    # 1-D split with a non-multiple extent: interior + one shifted strip
    from halide_tpu.ops import pallas_group as pg
    W = 300      # 64-tiles: 4 interior + strip
    x = hl.Var("x")
    xo, xi = hl.Var("xo"), hl.Var("xi")
    rng = np.random.default_rng(4)
    img = rng.standard_normal((W + 2,)).astype(np.float32)
    inp = hl.Buffer(img)
    g = hl.Func("p1_g")
    f = hl.Func("p1_f")
    g[x] = inp[x] * 2.0 + inp[x + 1]
    f[x] = g[x] + g[x + 1]
    f.split(x, xo, xi, 64).vectorize(xi)
    g.compute_at(f, xo)
    pg._last_plan = None
    out = f.realize([W], jit=False).to_numpy()
    gr = img[:-1] * 2.0 + img[1:]
    ref = gr[:-1] + gr[1:]
    np.testing.assert_allclose(out, ref[:W], rtol=1e-6)
    assert pg._last_plan is not None
    assert pg._last_plan.get("tail") == "shift_inwards", pg._last_plan
    assert pg._last_plan.get("parts") == 2, pg._last_plan


def test_partitioned_tail_round_up_opt_out():
    # an explicit RoundUp tail keeps the pad+crop lowering
    from halide_tpu.ops import pallas_group as pg
    W, H = 200, 100
    x, y = hl.Var("x"), hl.Var("y")
    xo, yo, xi, yi = hl.Var("xo"), hl.Var("yo"), hl.Var("xi"), hl.Var("yi")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 1 << 14, (H, W), np.uint16)
    inp = hl.Buffer(img)
    f = hl.Func("ru_f")
    f[x, y] = inp[x, y] * 2
    f.tile(x, y, xo, yo, xi, yi, 64, 16,
           tail=hl.TailStrategy.RoundUp).vectorize(xi).parallel(yo)
    pg._last_plan = None
    out = f.realize([W, H], jit=False).to_numpy()
    np.testing.assert_array_equal(out, img.astype(np.uint16) * 2)
    assert pg._last_plan is not None
    assert "tail" not in pg._last_plan, pg._last_plan


def test_store_at_sliding_window_carry():
    # store_at(consumer, outer) + compute_at(consumer, inner): the
    # producer's VMEM scratch persists across inner grid steps -- warm-up
    # computes the full footprint at step 0, steady state shifts by the
    # tile stride and computes only the new band (the reference's
    # SlidingWindow.cpp:347-453). Values must be identical to the
    # recompute-everything lowering, and the plan must record the carry.
    from halide_tpu.ops import pallas_group as pg
    W, H = 256, 64       # 64x16 tiles -> inner x grid of 4 steps
    x, y = hl.Var("x"), hl.Var("y")
    xo, yo, xi, yi = hl.Var("xo"), hl.Var("yo"), hl.Var("xi"), hl.Var("yi")
    rng = np.random.default_rng(11)
    img = rng.integers(0, 1 << 14, (H, W), np.uint16)
    inp = hl.Buffer(img)
    bx, by = hl.Func("sw_bx"), hl.Func("sw_by")
    # member = vertical blur, consumer = horizontal: the consumer's x
    # stencil gives the member an x overlap (tx+2 footprint) to carry
    bx[x, y] = (inp[x, y] + inp[x, y + 1] + inp[x, y + 2]) / 3
    by[x, y] = (bx[x, y] + bx[x + 1, y] + bx[x + 2, y]) / 3
    by.tile(x, y, xo, yo, xi, yi, 64, 16).vectorize(xi).parallel(yo)
    bx.compute_at(by, xo).store_at(by, yo)
    pg._last_plan = None
    out = by.realize([W - 2, H - 2], jit=False).to_numpy()
    ref = (img[:-2].astype(np.uint16) + img[1:-1] + img[2:]) // 3
    ref = (ref[:, :-2] + ref[:, 1:-1] + ref[:, 2:]) // 3
    np.testing.assert_array_equal(out, ref)
    assert pg._last_plan is not None
    assert pg._last_plan.get("sliding") == ["sw_bx"], pg._last_plan


def test_store_at_inner_level_no_carry():
    # store_at the COMPUTE level (no enclosing storage) must not carry
    from halide_tpu.ops import pallas_group as pg
    W, H = 256, 64
    x, y = hl.Var("x"), hl.Var("y")
    xo, yo, xi, yi = hl.Var("xo"), hl.Var("yo"), hl.Var("xi"), hl.Var("yi")
    rng = np.random.default_rng(12)
    img = rng.integers(0, 1 << 14, (H, W), np.uint16)
    inp = hl.Buffer(img)
    bx, by = hl.Func("swn_bx"), hl.Func("swn_by")
    bx[x, y] = (inp[x, y] + inp[x + 1, y] + inp[x + 2, y]) / 3
    by[x, y] = (bx[x, y] + bx[x, y + 1] + bx[x, y + 2]) / 3
    by.tile(x, y, xo, yo, xi, yi, 64, 16).vectorize(xi).parallel(yo)
    bx.compute_at(by, xo).store_at(by, xo)
    pg._last_plan = None
    out = by.realize([W - 2, H - 2], jit=False).to_numpy()
    ref = (img[:, :-2].astype(np.uint16) + img[:, 1:-1] + img[:, 2:]) // 3
    ref = (ref[:-2] + ref[1:-1] + ref[2:]) // 3
    np.testing.assert_array_equal(out, ref)
    assert pg._last_plan is not None
    assert pg._last_plan.get("sliding") == [], pg._last_plan


def test_band_split_pipelined_dma():
    # full-width row-band schedules run grid (gy, 1): the inner dim never
    # iterates, so the double-buffered DMA could never engage. The band
    # split remaps to (2 cores, gy/2 sequential bands) so megacore AND
    # DMA overlap compose; windows then advance along y. Forced-pipelined
    # here so the parity-DMA machinery itself is exercised in CI.
    import os
    from halide_tpu.ops import pallas_group as pg
    W, H = 256, 1026     # gy = 8 bands of 128 (even) -> grid (2, 4)
    x, y = hl.Var("x"), hl.Var("y")
    xo, yo, xi, yi = hl.Var("xo"), hl.Var("yo"), hl.Var("xi"), hl.Var("yi")
    rng = np.random.default_rng(21)
    img = rng.integers(0, 1 << 14, (H, W), np.uint16)
    inp = hl.Buffer(img)
    bx, by = hl.Func("bsp_bx"), hl.Func("bsp_by")
    bx[x, y] = (inp[x, y] + inp[x + 1, y] + inp[x + 2, y]) / 3
    by[x, y] = (bx[x, y] + bx[x, y + 1] + bx[x, y + 2]) / 3
    by.tile(x, y, xo, yo, xi, yi, W - 2, 128).vectorize(xi).parallel(yo)
    bx.compute_at(by, xo)
    os.environ["HALIDE_TPU_FORCE_PIPELINE"] = "1"
    try:
        pg._last_plan = None
        out = by.realize([W - 2, H - 2], jit=False).to_numpy()
    finally:
        os.environ.pop("HALIDE_TPU_FORCE_PIPELINE", None)
    ref = (img[:, :-2].astype(np.uint16) + img[:, 1:-1] + img[:, 2:]) // 3
    ref = (ref[:-2] + ref[1:-1] + ref[2:]) // 3
    np.testing.assert_array_equal(out, ref)
    p = pg._last_plan
    assert p and p["band_split"] and p["grid"] == (2, 4) \
        and p["pipelined"] and p["n_buf"] == 2, p


def test_band_split_even_interior_with_tail():
    # the flagship blur shape: full-width bands, odd floor band count
    # (1534/128 = 11), non-multiple y extent. The partitioner must hand
    # one band to the strip so the interior stays even and band-splits.
    from halide_tpu.ops import pallas_group as pg
    W, H = 256, 1536
    x, y = hl.Var("x"), hl.Var("y")
    xo, yo, xi, yi = hl.Var("xo"), hl.Var("yo"), hl.Var("xi"), hl.Var("yi")
    rng = np.random.default_rng(23)
    img = rng.integers(0, 1 << 14, (H, W), np.uint16)
    inp = hl.Buffer(img)
    bx, by = hl.Func("ei_bx"), hl.Func("ei_by")
    bx[x, y] = (inp[x, y] + inp[x + 1, y] + inp[x + 2, y]) / 3
    by[x, y] = (bx[x, y] + bx[x, y + 1] + bx[x, y + 2]) / 3
    by.tile(x, y, xo, yo, xi, yi, W - 2, 128).vectorize(xi).parallel(yo)
    bx.compute_at(by, xo)
    pg._last_plan = None
    out = by.realize([W - 2, H - 2], jit=False).to_numpy()
    ref = (img[:, :-2].astype(np.uint16) + img[:, 1:-1] + img[:, 2:]) // 3
    ref = (ref[:-2] + ref[1:-1] + ref[2:]) // 3
    np.testing.assert_array_equal(out, ref)
    p = pg._last_plan
    assert p and p["band_split"] and p["grid"] == (2, 5) \
        and p.get("tail") == "shift_inwards", p


def test_band_split_sliding_window_y():
    # under the band split the inner sequential dim is the y band index:
    # a store_root'd producer carries its VMEM tile along y (sublane
    # shifts) -- warm-up per core, new band only in steady state;
    # composed with the forced parity-DMA pipeline
    import os
    from halide_tpu.ops import pallas_group as pg
    W, H = 256, 1026
    x, y = hl.Var("x"), hl.Var("y")
    xo, yo, xi, yi = hl.Var("xo"), hl.Var("yo"), hl.Var("xi"), hl.Var("yi")
    rng = np.random.default_rng(22)
    img = rng.integers(0, 1 << 14, (H, W), np.uint16)
    inp = hl.Buffer(img)
    bh, bv = hl.Func("ys_bh"), hl.Func("ys_bv")
    bh[x, y] = (inp[x, y] + inp[x + 1, y] + inp[x + 2, y]) / 3
    bv[x, y] = (bh[x, y] + bh[x, y + 1] + bh[x, y + 2]) / 3
    bv.tile(x, y, xo, yo, xi, yi, W - 2, 128).vectorize(xi).parallel(yo)
    bh.compute_at(bv, xo).store_root()
    os.environ["HALIDE_TPU_FORCE_PIPELINE"] = "1"
    try:
        pg._last_plan = None
        out = bv.realize([W - 2, H - 2], jit=False).to_numpy()
    finally:
        os.environ.pop("HALIDE_TPU_FORCE_PIPELINE", None)
    ref = (img[:, :-2].astype(np.uint16) + img[:, 1:-1] + img[:, 2:]) // 3
    ref = (ref[:-2] + ref[1:-1] + ref[2:]) // 3
    np.testing.assert_array_equal(out, ref)
    p = pg._last_plan
    assert p and p["band_split"] and p["sliding"] == ["ys_bh"] \
        and p["pipelined"], p


def test_nl_means_boxsum_kernel_engages():
    # the three 4-D stages (d, blur_d_y, blur_d) fuse into one kernel per
    # (x, y) tile with the intermediates VMEM-resident
    _app_engages_and_matches("nl_means", width=256, height=64,
                             patch_size=5, search_area=5,
                             _env={"HALIDE_TPU_NLM_KERNEL": "1"})


def test_probe_disk_cache_roundtrip(tmp_path, monkeypatch):
    # probe outcomes persist across processes keyed by (jax ver, backend,
    # id): a cached PASS short-circuits the probe compile in a fresh
    # process; a cached False is only a HINT (it may be poisoned by an
    # unfaithful probe or unrecognized transient) and re-probes live
    import jax as _jax
    from halide_tpu.ops import pallas_group as pg
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path))
    pg._PROBE_DISK = None
    assert pg._probe_disk_get("feature:x") is None
    pg._probe_disk_put("feature:x", True)
    pg._PROBE_DISK = None          # simulate a fresh process
    assert pg._probe_disk_get("feature:x") is True
    pg._probe_disk_put("feature:x", False)
    assert pg._probe_disk_get("feature:x") is False
    # cached True short-circuits WITHOUT compiling: jit would blow up
    monkeypatch.setattr(pg, "_REPEAT_OK", None)
    pg._probe_disk_put("feature:kernel_repeat", True)

    def boom(*a, **k):
        raise AssertionError("cached pass must not re-compile")
    monkeypatch.setattr(_jax, "jit", boom)
    assert pg._repeat_kernel_ok() is True
    monkeypatch.undo()
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path))
    # cached False does NOT short-circuit: the live probe runs and its
    # verdict stands (self-healing when the poisoned entry was wrong)
    pg._probe_disk_put("feature:kernel_repeat", False)
    pg._REPEAT_OK = None
    res = pg._repeat_kernel_ok()
    assert isinstance(res, bool)
    if res:                        # live pass must overwrite the False
        pg._PROBE_DISK = None
        assert pg._probe_disk_get("feature:kernel_repeat") is True
    pg._REPEAT_OK = None
    pg._PROBE_DISK = None


def test_probe_transient_errors_not_cached():
    from halide_tpu.ops import pallas_group as pg
    assert pg._transient_error(RuntimeError(
        "UNAVAILABLE: failed to connect to all addresses"))
    assert pg._transient_error(TimeoutError("deadline exceeded"))
    assert not pg._transient_error(RuntimeError(
        "Mosaic failed to lower: unsupported shape cast"))
