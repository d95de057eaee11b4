"""RDom / update-definition coverage — the analog of the reference's
rfactor/atomics/histogram/scan correctness tests."""
import numpy as np
import pytest

import halide_tpu as hl


def test_sum_inline_reduction():
    x = hl.Var("x")
    r = hl.RDom(0, 5)
    inp = hl.Buffer(np.arange(20, dtype=np.int32))
    f = hl.Func()
    f[x] = hl.sum(inp[x + r])
    out = f.realize([10]).to_numpy()
    ref = np.array([np.arange(20)[i:i + 5].sum() for i in range(10)])
    np.testing.assert_array_equal(out, ref)


def test_sum_with_where():
    x = hl.Var("x")
    r = hl.RDom(0, 10)
    r.where(r.x % 2 == 0)
    f = hl.Func()
    f[x] = hl.sum(r.x + x * 0)
    out = f.realize([3]).to_numpy()
    np.testing.assert_array_equal(out, [20, 20, 20])


def test_maximum_minimum():
    x = hl.Var("x")
    r = hl.RDom(0, 4)
    inp = hl.Buffer(np.array([3, 1, 4, 1, 5, 9, 2, 6], dtype=np.int32))
    f = hl.Func()
    f[x] = hl.maximum(inp[x + r]) - hl.minimum(inp[x + r])
    out = f.realize([5]).to_numpy()
    ref = [np.max(np.array([3, 1, 4, 1, 5, 9, 2, 6])[i:i + 4])
           - np.min(np.array([3, 1, 4, 1, 5, 9, 2, 6])[i:i + 4])
           for i in range(5)]
    np.testing.assert_array_equal(out, ref)


def test_argmax():
    x = hl.Var("x")
    r = hl.RDom(0, 8)
    data = np.array([3, 1, 4, 1, 5, 9, 2, 6], dtype=np.int32)
    inp = hl.Buffer(data)
    f = hl.Func("am")
    am = hl.argmax(inp[r.x + 0 * x])
    f[x] = (am[0], am[1])
    out = f.realize([2])
    np.testing.assert_array_equal(out[0].to_numpy(), [5, 5])
    np.testing.assert_array_equal(out[1].to_numpy(), [9, 9])


def test_update_add():
    x = hl.Var("x")
    r = hl.RDom(0, 6)
    f = hl.Func("acc")
    f[x] = 0
    f[x] += r.x * (x + 1)
    out = f.realize([3]).to_numpy()
    np.testing.assert_array_equal(out, [15, 30, 45])


def test_implicit_init_sum():
    x = hl.Var("x")
    r = hl.RDom(1, 4)
    f = hl.Func()
    f[x] += r.x + x
    np.testing.assert_array_equal(f.realize([2]).to_numpy(), [10, 14])


def test_histogram_scatter():
    x = hl.Var("x")
    data = np.array([0, 1, 1, 2, 2, 2, 3, 3, 3, 3], dtype=np.uint8)
    inp = hl.Buffer(data)
    r = hl.RDom(0, 10)
    hist = hl.Func("hist")
    hist[x] = 0
    hist[hl.i32(inp[r.x])] += 1
    out = hist.realize([4]).to_numpy()
    np.testing.assert_array_equal(out, [1, 2, 3, 4])


def test_histogram_2d_where():
    x = hl.Var("x")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 16, size=(8, 8), dtype=np.uint8)
    inp = hl.Buffer(img)
    r = hl.RDom(0, 8, 0, 8)
    r.where(r.x > r.y)
    hist = hl.Func("hist2")
    hist[x] = 0
    hist[hl.i32(inp[r.x, r.y])] += 1
    out = hist.realize([16]).to_numpy()
    ref = np.zeros(16, np.int32)
    for yy in range(8):
        for xx in range(8):
            if xx > yy:
                ref[img[yy, xx]] += 1
    np.testing.assert_array_equal(out, ref)


def test_cumsum_scan():
    x = hl.Var("x")
    r = hl.RDom(1, 9)
    inp = hl.Buffer(np.arange(10, dtype=np.int32))
    f = hl.Func("cum")
    f[x] = inp[x]
    f[r.x] = f[r.x - 1] + inp[r.x]
    out = f.realize([10]).to_numpy()
    np.testing.assert_array_equal(out, np.cumsum(np.arange(10)))


def test_iir_scan_float():
    # first-order IIR: y[i] = a*y[i-1] + (1-a)*x[i]  (apps/iir_blur core)
    x, yv = hl.Var("x"), hl.Var("y")
    H, W = 6, 8
    rng = np.random.default_rng(1)
    data = rng.standard_normal((H, W)).astype(np.float32)
    inp = hl.Buffer(data)
    a = 0.5
    r = hl.RDom(1, W - 1)
    f = hl.Func("iir")
    f[x, yv] = inp[x, yv]
    f[r.x, yv] = a * f[r.x - 1, yv] + (1 - a) * inp[r.x, yv]
    out = f.realize([W, H]).to_numpy()
    ref = data.copy()
    for i in range(1, W):
        ref[:, i] = a * ref[:, i - 1] + (1 - a) * data[:, i]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_backward_scan():
    x = hl.Var("x")
    inp = hl.Buffer(np.arange(8, dtype=np.int32))
    r = hl.RDom(0, 7)
    f = hl.Func()
    f[x] = inp[x]
    # iterate x = 6..0: f[6-r] = f[7-r] + ...
    f[6 - r.x] = f[6 - r.x + 1] + inp[6 - r.x]
    out = f.realize([8]).to_numpy()
    ref = np.arange(8)
    res = ref.copy()
    for i in range(6, -1, -1):
        res[i] = res[i + 1] + ref[i]
    np.testing.assert_array_equal(out, res)


def test_min_scan():
    x = hl.Var("x")
    data = np.array([5, 3, 8, 1, 9, 2], dtype=np.int32)
    inp = hl.Buffer(data)
    r = hl.RDom(1, 5)
    f = hl.Func()
    f[x] = inp[x]
    f[r.x] = hl.min(f[r.x - 1], inp[r.x])
    out = f.realize([6]).to_numpy()
    np.testing.assert_array_equal(out, np.minimum.accumulate(data))


def test_update_at_fixed_point():
    x = hl.Var("x")
    f = hl.Func()
    f[x] = x
    f[0] = 100
    out = f.realize([4]).to_numpy()
    np.testing.assert_array_equal(out, [100, 1, 2, 3])


def test_multiple_updates():
    x = hl.Var("x")
    f = hl.Func()
    f[x] = 0
    f[x] += 5
    f[x] *= 2
    f[x] -= 3
    np.testing.assert_array_equal(f.realize([3]).to_numpy(), [7, 7, 7])


def test_sequential_fallback_general_update():
    # general data-dependent read-modify chain that defeats all fast paths
    x = hl.Var("x")
    data = np.array([2, 0, 1, 2], dtype=np.int32)
    inp = hl.Buffer(data)
    r = hl.RDom(0, 4)
    f = hl.Func()
    f[x] = 1
    # f[e] = f[e]*2 + r: scatter with non-trivial combine
    f[hl.clamp(inp[r.x], 0, 3)] = f[hl.clamp(inp[r.x], 0, 3)] * 2 + r.x
    out = f.realize([4]).to_numpy()
    ref = np.ones(4, np.int64)
    for rr in range(4):
        e = np.clip(data[rr], 0, 3)
        ref[e] = ref[e] * 2 + rr
    np.testing.assert_array_equal(out, ref)


def test_rdom_over_buffer():
    x = hl.Var("x")
    data = np.arange(6, dtype=np.int32)
    inp = hl.Buffer(data)
    r = hl.RDom(inp)
    f = hl.Func()
    f[x] = 0
    f[x] += inp[r.x]
    np.testing.assert_array_equal(f.realize([1]).to_numpy(), [15])


def test_rfactor_sum():
    x = hl.Var("x")
    data = np.arange(64, dtype=np.int32)
    inp = hl.Buffer(data)
    r = hl.RDom(0, 64)
    f = hl.Func("total")
    f[x] = 0
    f[x] += inp[r.x]
    u = hl.Var("u")
    # split the reduction into 8 parallel partials
    ro, ri = hl.RVar("ro"), hl.RVar("ri")
    f.update().split(r.x, ro, ri, 8)
    intm = f.update().rfactor(ro, u)
    out = f.realize([1]).to_numpy()
    np.testing.assert_array_equal(out, [data.sum()])


def test_product_update():
    x = hl.Var("x")
    r = hl.RDom(1, 5)
    f = hl.Func()
    f[x] = 1
    f[x] *= r.x
    np.testing.assert_array_equal(f.realize([2]).to_numpy(), [120, 120])


def test_slab_update_paths():
    """Box-region updates (const dims, rvar spans, reversed spans) lower to
    dynamic_update_slice (updates._slab_update); regression for the path
    only reached at full bench sizes."""
    import numpy as np
    import halide_tpu as hl
    x, y = hl.Var("x"), hl.Var("y")
    f = hl.Func("slab_f")
    f[x, y] = x + 10 * y
    f[3, y] = -1                      # const dim + axis
    r = hl.RDom([(2, 4)], "r")
    f[r.x, 5] += 100                  # rvar span + const
    g = hl.Func("slab_g")
    g[x, y] = 0
    r2 = hl.RDom([(0, 8), (0, 6)], "r2")
    g[7 - r2.x, r2.y] = r2.x + r2.y   # reversed span x span
    fa = np.asarray(hl.Pipeline(f).realize([8, 8]))
    ref = (np.arange(8)[None, :] * 0 + np.arange(8)[None, :]
           + 10 * np.arange(8)[:, None]).astype(np.int32)
    ref[:, 3] = -1
    ref[5, 2:6] += 100
    assert (fa == ref).all()
    ga = np.asarray(hl.Pipeline(g).realize([8, 6]))
    gref = np.zeros((6, 8), np.int32)
    for rx in range(8):
        for ry in range(6):
            gref[ry, 7 - rx] = rx + ry
    assert (ga == gref).all()


def test_masked_linear_scan():
    """where()-predicated linear scan: masked-out iterations carry the
    previous value through (regression: the mask was broadcast over the
    scanned pure axis and broke the scan layout)."""
    import numpy as np
    import halide_tpu as hl
    x, y = hl.Var("x"), hl.Var("y")
    inp = hl.ImageParam(hl.Float(32), 2, "pin")
    a = np.random.default_rng(0).random((16, 32), np.float32)
    inp.set(a)
    r = hl.RDom(1, 15)
    r.where(r.x % 2 == 0)
    g = hl.Func("gm")
    g[x, y] = 0.0
    g[x, 0] = inp[x, 0]
    g[x, r.x] = 0.5 * g[x, r.x - 1] + inp[x, r.x]
    got = np.asarray(hl.Pipeline(g).realize([32, 16]))
    w = np.zeros((16, 32), np.float64)
    w[0] = a[0]
    for i in range(1, 16):
        w[i] = (0.5 * w[i - 1] + a[i]) if i % 2 == 0 else w[i]
    assert np.abs(got - w).max() < 1e-6


def test_update_unroll_rvar_forces_unrolled_lowering():
    """update().unroll(rvar) on every rdom dim forces the shifted-read
    unrolled lowering even past the tap-count heuristic (reference:
    src/Func.h Stage::unroll on RVars unrolls the reduction loop)."""
    from halide_tpu import updates

    def build(mark):
        x, y = hl.Var("x"), hl.Var("y")
        r = hl.RDom(0, 5, 0, 5, "r")
        inp = hl.ImageParam(hl.Float(32), 2, "in_u")
        g = hl.repeat_edge(inp)
        f = hl.Func(f"unroll_spy_{int(mark)}")
        f[x, y] += g[x + r.x, y + r.y]
        if mark:
            f.update().unroll(r.x).unroll(r.y)
        return f, inp

    rng = np.random.default_rng(0)
    a = rng.random((12, 16), np.float32)
    ref = None
    import os
    old = os.environ.get("HALIDE_TPU_UNROLL_TAPS")
    os.environ["HALIDE_TPU_UNROLL_TAPS"] = "4"   # 25 taps > threshold
    try:
        for mark in (False, True):
            f, inp = build(mark)
            inp.set(hl.Buffer(a))
            out = f.realize([16, 12]).to_numpy()
            path = updates._last_reduce_path.get(f.name)
            if mark:
                assert path == "unrolled", path
            else:
                assert path != "unrolled", path
            if ref is None:
                ref = out
            else:
                np.testing.assert_allclose(out, ref, rtol=1e-5)
    finally:
        if old is None:
            os.environ.pop("HALIDE_TPU_UNROLL_TAPS", None)
        else:
            os.environ["HALIDE_TPU_UNROLL_TAPS"] = old


@pytest.mark.parametrize("mode", ["f32", "bf16", "int8"])
def test_scatter_add_factored_narrow_modes_exact(mode):
    # narrow MXU operand widths must stay exact: one-hot entries are 0/1
    # in every width, and int8/bf16 are only selected for values they
    # represent exactly (ints <= 127 / <= 256)
    import jax.numpy as jnp
    from halide_tpu.ops import onehot_mxu
    rng = np.random.default_rng(5)
    lin = jnp.asarray(rng.integers(0, 256, (37, 1536)), jnp.int32)
    g = jnp.asarray(rng.integers(-3, 4, (37, 1536)), jnp.int32)
    out = np.asarray(onehot_mxu.scatter_add_factored(
        lin, g, 256, (1,), mode=mode))
    want = np.zeros((37, 256), np.int64)
    ln, gn = np.asarray(lin), np.asarray(g)
    for r in range(37):
        np.add.at(want[r], ln[r], gn[r])
    np.testing.assert_array_equal(out.astype(np.int64), want)


def test_hist_factored_scatter_uses_bf16_mode(monkeypatch):
    # apps/hist's +1 counts satisfy the int8 bound; assert the mode
    # selection picks the narrow path (traffic = the perf claim)
    from halide_tpu.ops import onehot_mxu
    seen = {}
    orig = onehot_mxu.scatter_add_factored

    def spy(lin, g, K, red_axes, mode="f32"):
        seen["mode"] = mode
        return orig(lin, g, K, red_axes, mode=mode)

    monkeypatch.setattr(onehot_mxu, "scatter_add_factored", spy)
    x, y = hl.Var("x"), hl.Var("y")
    inp = hl.Buffer(np.random.default_rng(0).integers(
        0, 256, (33, 640), np.uint8))
    hr = hl.Func("hist_rows_nw")
    hr[x, y] = 0
    rx = hl.RDom(0, 640, "rx")
    hr[hl.i32(inp[rx.x, y]), y] += 1
    out = hr.realize([256, 33]).to_numpy()
    want = np.stack([np.bincount(r, minlength=256)
                     for r in inp.to_numpy()])
    np.testing.assert_array_equal(out, want)
    assert seen.get("mode") == "bf16", seen


@pytest.mark.parametrize("weight,want_mode", [(2.5, "bf16"), (0.1, "f32")])
def test_float_weight_hist_bf16_gate_under_jit(monkeypatch, weight,
                                               want_mode):
    # the bf16-exactness gate for FLOAT constant weights must evaluate on
    # the host: jnp.bfloat16(x) binds convert_element_type in the ambient
    # jit trace (returns a tracer even for a python float), and float()
    # on it raised ConcretizationTypeError -- lens_blur at small sizes
    # (kept_elems <= 4096) crashed on exactly this path
    from halide_tpu.ops import onehot_mxu
    seen = {}
    orig = onehot_mxu.scatter_add_factored

    def spy(lin, g, K, red_axes, mode="f32"):
        seen["mode"] = mode
        return orig(lin, g, K, red_axes, mode=mode)

    monkeypatch.setattr(onehot_mxu, "scatter_add_factored", spy)
    x, y = hl.Var("x"), hl.Var("y")
    inp = hl.Buffer(np.random.default_rng(2).integers(
        0, 128, (7, 640), np.uint8))
    hr = hl.Func(f"hist_fw_{want_mode}")
    hr[x, y] = hl.f32(0)
    rx = hl.RDom(0, 640, "rx")
    hr[hl.i32(inp[rx.x, y]), y] += weight
    out = hr.realize([128, 7]).to_numpy()
    want = np.stack([np.bincount(r, minlength=128)
                     for r in inp.to_numpy()]).astype(np.float64) * weight
    np.testing.assert_allclose(out.astype(np.float64), want, rtol=1e-5)
    assert seen.get("mode") == want_mode, seen


def test_rowhist_blockdiag_kernel_engages(monkeypatch):
    # batch-heavy constant-value histograms (apps/hist's hist_rows at
    # canonical size: 2560 rows) must route through the block-diagonal
    # MXU kernel -- the pure-XLA factored path materializes two
    # (grid, sqrt(K)) one-hots in HBM and measures HBM-bound
    monkeypatch.setenv("HT_PALLAS_STRICT", "1")
    monkeypatch.setenv("HT_ROWHIST_KERNEL", "1")
    from halide_tpu.ops import onehot_mxu
    seen = {}
    orig = onehot_mxu.rowhist_blockdiag

    def spy(lin2, K, interpret=False, **kw):
        seen["K"] = K
        seen["shape"] = tuple(lin2.shape)
        return orig(lin2, K, interpret=interpret, **kw)

    monkeypatch.setattr(onehot_mxu, "rowhist_blockdiag", spy)
    x, y = hl.Var("x"), hl.Var("y")
    inp = hl.Buffer(np.random.default_rng(1).integers(
        0, 256, (300, 640), np.uint8))
    hr = hl.Func("hist_rows_bd")
    hr[x, y] = 0
    rx = hl.RDom(0, 640, "rx")
    hr[hl.i32(inp[rx.x, y]), y] += 1
    out = hr.realize([256, 300]).to_numpy()
    want = np.stack([np.bincount(r, minlength=256)
                     for r in inp.to_numpy()])
    np.testing.assert_array_equal(out, want)
    assert seen.get("K") == 256 and seen.get("shape") == (300, 640), seen


def test_rowhist_blockdiag_direct_padding_and_drops():
    # non-multiple R/P padding and out-of-range drop semantics, plus a
    # non-pow2 K (pads to k1*k2 and crops)
    import jax.numpy as jnp
    from halide_tpu.ops import onehot_mxu
    rng = np.random.default_rng(2)
    for (R, P, K) in [(7, 130, 100), (64, 513, 256), (300, 128, 64)]:
        lin = rng.integers(-2, K + 3, (R, P)).astype(np.int32)
        got = np.asarray(onehot_mxu.rowhist_blockdiag(
            jnp.asarray(lin), K, interpret=True))
        want = np.zeros((R, K), np.float32)
        for r in range(R):
            v = lin[r]
            v = v[(v >= 0) & (v < K)]
            want[r] = np.bincount(v, minlength=K)
        np.testing.assert_array_equal(got, want)
