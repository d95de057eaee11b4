"""Misc correctness parity with reference test/correctness themes:
compute_with, wrappers, implicit vars, boundary conditions, tuples,
LoopLevel late binding, non-zero-min realize."""
import numpy as np
import pytest

import halide_tpu as hl


def test_compute_with_semantics_preserved():
    x, y = hl.Var("x"), hl.Var("y")
    a, b, c = hl.Func("cw_a"), hl.Func("cw_b"), hl.Func("cw_c")
    a[x, y] = x + y
    b[x, y] = x * y
    a.compute_root()
    b.compute_root()
    a.compute_with(b, x)
    c[x, y] = a[x, y] + b[x, y]
    out = c.realize([4, 4]).to_numpy()
    xs, ys = np.arange(4), np.arange(4)[:, None]
    np.testing.assert_array_equal(out, xs + ys + xs * ys)


def test_in_wrapper_redirects():
    x = hl.Var("x")
    f = hl.Func("w_f")
    g = hl.Func("w_g")
    f[x] = x * 3
    g[x] = f[x] + 1
    w = f.in_(g)
    w.compute_root()
    out = g.realize([5]).to_numpy()
    np.testing.assert_array_equal(out, np.arange(5) * 3 + 1)


def test_implicit_placeholder():
    # lambda-style Func from an expr using `_` (reference: Var::implicit,
    # Func.h:1276-1283)
    x, y, c = hl.Var("x"), hl.Var("y"), hl.Var("c")
    f = hl.Func("imp_f")
    f[x, y, c] = x + 10 * y + 100 * c
    g = hl.Func(f[hl._] * 2, name="imp_g")
    out = g.realize([3, 2, 2]).to_numpy()
    ref = (np.arange(3)[None, None, :] + 10 * np.arange(2)[None, :, None]
           + 100 * np.arange(2)[:, None, None]) * 2
    np.testing.assert_array_equal(out, ref)


def test_boundary_mirror_and_repeat():
    x = hl.Var("x")
    data = np.array([1, 2, 3, 4], np.int32)
    b = hl.Buffer(data)
    m = hl.mirror_image(b)
    r = hl.repeat_image(b)
    mi = hl.mirror_interior(b)
    f = hl.Func("bc_probe")
    f[x] = hl.Tuple(m[x - 2], r[x - 2], mi[x - 2])
    out = f.realize([8])
    np.testing.assert_array_equal(out[0].to_numpy(), [2, 1, 1, 2, 3, 4, 4, 3])
    np.testing.assert_array_equal(out[1].to_numpy(), [3, 4, 1, 2, 3, 4, 1, 2])
    np.testing.assert_array_equal(out[2].to_numpy(), [3, 2, 1, 2, 3, 4, 3, 2])


def test_tuple_update():
    x = hl.Var("x")
    f = hl.Func("tu")
    r = hl.RDom(0, 5, "tur")
    f[x] = (0, 1.0)
    f[x] = (f[x][0] + r.x, f[x][1] * 2.0)
    out = f.realize([2])
    np.testing.assert_array_equal(out[0].to_numpy(), [10, 10])
    np.testing.assert_allclose(out[1].to_numpy(), [32.0, 32.0])


def test_looplevel_late_binding():
    x, y = hl.Var("x"), hl.Var("y")
    lvl = hl.LoopLevel()
    p = hl.Func("ll_p")
    c = hl.Func("ll_c")
    p[x, y] = x + y
    p.compute_at(lvl)
    c[x, y] = p[x, y] * 2
    lvl.set(hl.LoopLevel.root())
    out = c.realize([3, 3]).to_numpy()
    np.testing.assert_array_equal(
        out, (np.arange(3) + np.arange(3)[:, None]) * 2)


def test_realize_into_shifted_buffer():
    x = hl.Var("x")
    f = hl.Func("shift_f")
    f[x] = x * x
    dst = hl.Buffer(type=hl.Int(32), sizes=[4], mins=[10])
    f.realize(dst=dst)
    np.testing.assert_array_equal(dst.to_numpy(), [100, 121, 144, 169])


def test_specialize_accepts_variants():
    x = hl.Var("x")
    p = hl.Param(hl.Int(32), "sp_p", 1)
    f = hl.Func("sp_f")
    f[x] = x + p
    s = f.specialize(p._to_expr() == 1)
    s.vectorize(x, 8)
    p.set(1)
    np.testing.assert_array_equal(f.realize([3]).to_numpy(), [1, 2, 3])
    p.set(5)
    np.testing.assert_array_equal(f.realize([3]).to_numpy(), [5, 6, 7])


def test_reduce_over_func_output_types():
    # maximum() over a func with update defs
    x = hl.Var("x")
    f = hl.Func("rmax_f")
    f[x] = x
    f[x] *= 2
    r = hl.RDom(0, 10, "rmax_r")
    g = hl.Func("rmax_g")
    g[x] = hl.maximum(f[r.x]) + x * 0
    np.testing.assert_array_equal(g.realize([2]).to_numpy(), [18, 18])


def test_extern_stage_bounds_query():
    from halide_tpu.bounds import Box, Interval
    x, y = hl.Var("x"), hl.Var("y")
    inp = hl.ImageParam(hl.Float(32), 2, "ext_in")
    data = np.arange(48, dtype=np.float32).reshape(6, 8)
    inp.set(data)
    seen_boxes = []

    def footprint(out_box):
        seen_boxes.append([(iv.lo, iv.hi) for iv in out_box.dims])
        # needs a +1 halo in x
        return [Box([Interval(out_box.dims[0].lo,
                              out_box.dims[0].hi + 1),
                     out_box.dims[1]])]

    def callback(arr):
        return (arr[:, :-1] + arr[:, 1:]).astype(np.float32)

    ext = hl.Func("ext_stage")
    ext.define_extern("ext_stage", callback, [inp],
                      output_type=hl.Float(32), dimensions=2,
                      footprint=footprint)
    out = hl.Func("ext_out")
    out[x, y] = ext[x, y] * 2.0
    res = out.realize([7, 6]).to_numpy()
    ref = (data[:, :-1] + data[:, 1:]) * 2
    np.testing.assert_allclose(res, ref)
    assert seen_boxes and seen_boxes[0][0] == (0, 6)


def test_parallel_rvar_requires_proof():
    x = hl.Var("x")
    f = hl.Func("prv")
    r = hl.RDom(0, 10, "prv_r")
    f[x] = 0
    f[x] = hl.select(r.x > 2, f[x] * 2 + r.x, f[x])
    with pytest.raises(hl.CompileError):
        f.update().parallel(r.x)
    g = hl.Func("prv2")
    g[x] = 0
    g[x] += r.x
    g.update().atomic().parallel(r.x)   # fine with atomic()
    np.testing.assert_array_equal(g.realize([2]).to_numpy(), [45, 45])


def test_target_features_wire_into_realize():
    x = hl.Var("x")
    f = hl.Func("tgt_f")
    f[x] = x * 2
    out = f.realize([4], target="cpu-generic-no_pallas").to_numpy()
    np.testing.assert_array_equal(out, [0, 2, 4, 6])
    t = hl.Target("tpu-v5e-profile-trace_all")
    assert t.has_feature("profile") and t.generation == "v5e"


def test_clamped_strided_read():
    """clamp composed with a non-unit-stride index (repeat_edge over
    2*x + c, the wavelet/haar pattern) must replicate the CLAMP BOUND
    value at the ends -- and stay on the slice path, not gather."""
    import numpy as np
    import halide_tpu as hl
    x = hl.Var("x")
    inp = hl.ImageParam(hl.Int(32), 1, "in1")
    f = hl.Func("f")
    f[x] = inp[hl.clamp(2 * x - 3, 1, 8)]
    g = hl.Func("g")          # negative stride + interior clamp
    g[x] = inp[hl.clamp(7 - 2 * x, 2, 6)]
    a = (np.arange(10, dtype=np.int32) * 11 + 5)
    inp.set(a)
    fa = np.asarray(hl.Pipeline(f).realize([8]))
    ref = a[np.clip(2 * np.arange(8) - 3, 1, 8)]
    assert (fa == ref).all(), (fa, ref)
    ga = np.asarray(hl.Pipeline(g).realize([8]))
    gref = a[np.clip(7 - 2 * np.arange(8), 2, 6)]
    assert (ga == gref).all(), (ga, gref)


def test_extern_double_bounds_query():
    """The stage rounds its output up to a multiple of 4; inputs must be
    sized from the ROUNDED box (reference: BoundsInference.cpp:452-506)."""
    from halide_tpu.bounds import Box, Interval
    x = hl.Var("x")
    inp = hl.ImageParam(hl.Float(32), 1, "dq_in")
    data = np.arange(32, dtype=np.float32)
    inp.set(data)
    fp_boxes = []

    def bounds_query(out_box):
        lo = out_box.dims[0].lo
        hi = out_box.dims[0].hi
        ext = hi - lo + 1
        ext4 = -(-ext // 4) * 4
        return Box([Interval(lo, lo + ext4 - 1)])

    def footprint(out_box):
        fp_boxes.append((out_box.dims[0].lo, out_box.dims[0].hi))
        return [Box([out_box.dims[0]])]

    def callback(arr):
        return (arr * 3.0).astype(np.float32)

    ext = hl.Func("dq_stage")
    ext.define_extern("dq_stage", callback, [inp],
                      output_type=hl.Float(32), dimensions=1,
                      footprint=footprint, bounds_query=bounds_query)
    out = hl.Func("dq_out")
    out[x] = ext[x] + 1.0
    res = out.realize([7]).to_numpy()      # 7 -> stage produces 8
    np.testing.assert_allclose(res, data[:7] * 3 + 1)
    assert fp_boxes and fp_boxes[0] == (0, 7), fp_boxes  # rounded to 8 wide


def test_compute_with_forms_one_fused_group():
    """Fused siblings are lowered together under ONE joint barrier
    (reference: src/ScheduleFunctions.cpp:303-356)."""
    import halide_tpu.pipeline as P
    joint = []
    orig = P._evaluate_func

    def spy(f, box, ctx0, defer_barrier=False):
        if defer_barrier:
            joint.append(f.name)
        return orig(f, box, ctx0, defer_barrier)

    P._evaluate_func = spy
    try:
        x, y = hl.Var("x"), hl.Var("y")
        src = hl.Func("cwf_src")
        src[x, y] = hl.f32(x) * 2.0 + y
        src.compute_root()
        ix, iy = hl.Func("cwf_ix"), hl.Func("cwf_iy")
        ix[x, y] = src[x + 1, y] - src[x - 1, y]
        iy[x, y] = src[x, y + 1] - src[x, y - 1]
        ix.compute_root()
        iy.compute_root()
        ix.compute_with(iy, x)
        out = hl.Func("cwf_out")
        out[x, y] = ix[x, y] * iy[x, y]
        res = out.realize([4, 3], jit=False).to_numpy()
        sx = lambda xx, yy: np.float32(xx) * 2 + yy
        xs = np.arange(4)[None, :]
        ys = np.arange(3)[:, None]
        ref = (sx(xs + 1, ys) - sx(xs - 1, ys)) * (sx(xs, ys + 1)
                                                   - sx(xs, ys - 1))
        np.testing.assert_allclose(res, ref)
        assert sorted(joint) == ["cwf_ix", "cwf_iy"], joint
    finally:
        P._evaluate_func = orig


def test_compute_with_align_variants():
    """AlignStart/AlignEnd with misaligned sibling extents (reference:
    src/Schedule.h:139-152, ScheduleFunctions.cpp:303-356). The reference
    shifts iteration spaces and guards each stage to its own box, so values
    are identical across all variants; here every variant must (a) produce
    correct values with the siblings covering DIFFERENT extents, (b) be
    recorded on the schedule, and (c) round-trip through serialization."""
    from halide_tpu import LoopAlignStrategy as LAS

    for align in (None, LAS.AlignStart, LAS.AlignEnd, LAS.NoAlign,
                  {"x": LAS.AlignStart, "y": LAS.AlignEnd}):
        x, y = hl.Var("x"), hl.Var("y")
        a, b, c = hl.Func("cwa_a"), hl.Func("cwa_b"), hl.Func("cwa_c")
        a[x, y] = x + y
        b[x, y] = x * y
        a.compute_root()
        b.compute_root()
        a.compute_with(b, x, align=align)
        # misaligned extents: c reads a over [1,6) x [0,4) but b over
        # [0,3) x [1,4)
        c[x, y] = a[x + 1, y] + b[x, y + 1]
        out = c.realize([5, 3]).to_numpy()
        xs, ys = np.arange(5), np.arange(3)[:, None]
        np.testing.assert_array_equal(out, (xs + 1 + ys) + xs * (ys + 1))
        rec = a._defs[0].schedule.fused_with[0]
        assert rec[1] == "x"
        want = (LAS.Auto if align is None
                else align if isinstance(align, LAS) else align["x"])
        assert rec[2]["x"] is want
        # serialization round-trip preserves the fused pair + alignment
        p2, _imgs, _pars = hl.deserialize_pipeline(
            hl.serialize_pipeline(hl.Pipeline(c)))
        out2 = p2.realize([5, 3])
        np.testing.assert_array_equal(np.asarray(out2), out)

    # invalid align values are rejected, not dropped
    x = hl.Var("x")
    f, g = hl.Func("cwa_f"), hl.Func("cwa_g")
    f[x] = x
    g[x] = x * 2
    f.compute_root()
    g.compute_root()
    with pytest.raises(hl.CompileError, match="align"):
        f.compute_with(g, x, align="Sideways")
    with pytest.raises(hl.CompileError, match="align"):
        f.compute_with(g, x, align={"nope": None})


def test_compute_with_rejects_dependent_stages():
    x = hl.Var("x")
    a, b = hl.Func("cwd_a"), hl.Func("cwd_b")
    a[x] = x * 2
    b[x] = a[x] + 1          # b depends on a
    a.compute_root()
    b.compute_root()
    a.compute_with(b, x)
    with pytest.raises(hl.CompileError, match="independent"):
        b.realize([4])


def test_clamp_span_fully_out_of_range():
    # the whole index span clamps past one end (lens_blur's bokeh radius
    # windows): every read is the single edge element, and the phase-2
    # pads must not go negative
    x = hl.Var("x")
    data = np.arange(8, dtype=np.float32)
    inp = hl.Buffer(data)
    f = hl.Func("cor_f")
    # x in [0, 5] -> x + 10 in [10, 15], clamped to [0, 7]: all reads = 7
    f[x] = inp[hl.clamp(x + 10, 0, 7)]
    np.testing.assert_array_equal(f.realize([6]).to_numpy(),
                                  np.full(6, 7.0, np.float32))
    g = hl.Func("cor_g")
    # x - 10 in [-10, -5], clamped to [0, 7]: all reads = 0
    g[x] = inp[hl.clamp(x - 10, 0, 7)]
    np.testing.assert_array_equal(g.realize([6]).to_numpy(),
                                  np.zeros(6, np.float32))


def test_fractional_slice_top_plane_clamps():
    # regression (round-2 advisor): the fractional-slice rewrite's plane
    # loop must keep the w1*E@(i+1) term when the data-dependent index i
    # lands on the last fully-selectable plane; the rewrite now iterates
    # one extra edge-clamped plane so it matches direct (one-hot clipped)
    # evaluation for indices reaching the table top
    x = hl.Var("x")
    z = hl.Var("z")
    tbl = hl.Func("fs_tbl")
    tbl[z] = hl.f32(z) * 10.0
    tbl.compute_root()
    vals = np.array([0.25, 1.5, 3.5, 3.75, 2.0], np.float32)
    inp = hl.Buffer(vals)
    f = hl.Func("fs_out")
    iv = hl.clamp(hl.i32(inp[x]), 0, 3)     # reaches 3
    w = inp[x] - hl.f32(hl.i32(inp[x]))
    f[x] = (1.0 - w) * tbl[iv] + w * tbl[iv + 1]
    got = f.realize([5]).to_numpy()
    ivn = np.clip(vals.astype(np.int32), 0, 3)
    wn = vals - vals.astype(np.int32)
    ref = (1 - wn) * (ivn * 10.0) + wn * ((ivn + 1) * 10.0)
    np.testing.assert_allclose(got, ref.astype(np.float32), rtol=1e-6)


def test_tpu_transposed_double_scan_mitigation():
    # Round-2 found an XLA:TPU miscompile: a fully-fused transpose-
    # sandwiched double-scan graph computed wrong values under jit on
    # exactly the first half of the scanned positions (eager exact, same
    # trace). The mitigation pins every update-stage materialization with
    # optimization_barrier (pipeline._evaluate_func). This repro asserts
    # the mitigation holds; it only means anything on the TPU backend
    # (the bug is invisible on CPU).
    import jax
    if jax.default_backend() != "tpu":
        pytest.skip("TPU-only repro: the miscompile is invisible on CPU")
    W = H = 96
    alpha = 0.1
    rng = np.random.default_rng(21)
    img = rng.random((H, W)).astype(np.float32)

    x, y = hl.Var("x"), hl.Var("y")
    inp = hl.ImageParam(hl.Float(32), 2, "ds_in")
    inp.set(img)
    r = hl.RDom(1, H - 1, "ds_r")
    b1 = hl.Func("ds_b1")
    b1[x, y] = hl.undef(hl.Float(32))
    b1[x, 0] = inp[x, 0]
    b1[x, r.x] = (1 - alpha) * b1[x, r.x - 1] + alpha * inp[x, r.x]
    tr = hl.Func("ds_tr")
    tr[x, y] = b1[y, x]                     # transpose between the scans
    b2 = hl.Func("ds_b2")
    b2[x, y] = hl.undef(hl.Float(32))
    b2[x, 0] = tr[x, 0]
    b2[x, r.x] = (1 - alpha) * b2[x, r.x - 1] + alpha * tr[x, r.x]
    got = np.asarray(b2.realize([W, H]).to_numpy())

    v = img.astype(np.float64).copy()       # scan down rows (y axis)
    for i in range(1, H):
        v[i] = (1 - alpha) * v[i - 1] + alpha * img[i]
    v = v.T.copy()                          # transpose
    ref = v.copy()                          # scan down rows again
    for i in range(1, H):
        ref[i] = (1 - alpha) * ref[i - 1] + alpha * v[i]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
