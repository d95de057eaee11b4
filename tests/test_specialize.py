"""specialize(): the chosen variant's directives change the lowering
(reference: src/Func.h:1770-1842, test/correctness/specialize.cpp)."""
import numpy as np
import pytest

import halide_tpu as hl


def _make(p):
    x, y = hl.Var("x"), hl.Var("y")
    xo, yo, xi, yi = hl.Var("xo"), hl.Var("yo"), hl.Var("xi"), hl.Var("yi")
    rng = np.random.default_rng(0)
    img = rng.standard_normal((64, 128)).astype(np.float32)
    inp = hl.Buffer(img)
    f = hl.Func("spv")
    f[x, y] = inp[x, y] * 2.0 + 1.0
    f.specialize(p._to_expr() >= 100).tile(x, y, xo, yo, xi, yi, 32, 8)
    return f, img


def test_variant_changes_lowering():
    # p >= 100 -> tiled -> the Pallas group path engages; else untiled
    from halide_tpu.ops import pallas_group as pg
    engaged = []
    orig = pg.try_pallas_group

    def spy(*a, **kw):
        r = orig(*a, **kw)
        engaged.append(r is not None)
        return r

    pg.try_pallas_group = spy
    try:
        p = hl.Param(hl.Int(32), "sp_sel", 0)
        f, img = _make(p)
        p.set(100)
        out = f.realize([128, 64], jit=False).to_numpy()
        np.testing.assert_allclose(out, img * 2 + 1, rtol=1e-6)
        assert engaged and engaged[-1], "tiled variant did not hit Pallas"
        n_before = len(engaged)
        p.set(0)
        out = f.realize([128, 64], jit=False).to_numpy()
        np.testing.assert_allclose(out, img * 2 + 1, rtol=1e-6)
        assert len(engaged) == n_before, "untiled variant hit the tile path"
    finally:
        pg.try_pallas_group = orig
    # the applied directives must not leak outside the compile
    assert not f._defs[0].schedule.splits


def test_ladder_order_first_true_wins():
    x = hl.Var("x")
    p = hl.Param(hl.Int(32), "lad_p", 0)
    f = hl.Func("lad")
    f[x] = x + p
    a = f.specialize(p._to_expr() > 10)
    b = f.specialize(p._to_expr() > 0)
    a.bound(x, 0, 8)
    b.bound(x, 0, 4)
    p.set(20)   # first branch -> bound 8 applies; realize([4]) violates it?
    # bound() constrains the realized extent: with bound 8 a size-8 realize
    # is legal, size-4 would conflict for branch a but not b
    out = f.realize([8]).to_numpy()
    np.testing.assert_array_equal(out, np.arange(8) + 20)
    assert not f._fschedule.bounds     # restored


def test_specialize_fail_raises():
    x = hl.Var("x")
    p = hl.Param(hl.Int(32), "sf_p", 0)
    f = hl.Func("sf")
    f[x] = x + p
    f.specialize(p._to_expr() == 1).vectorize(x, 8)
    f.specialize_fail("unsupported parameter value")
    p.set(1)
    np.testing.assert_array_equal(f.realize([3]).to_numpy(), [1, 2, 3])
    p.set(2)
    with pytest.raises(hl.CompileError, match="unsupported parameter"):
        f.realize([3])


def test_condition_must_be_static():
    x = hl.Var("x")
    f = hl.Func("sns")
    f[x] = x
    f.specialize(x > 2).vectorize(x, 4)
    with pytest.raises(hl.CompileError):
        f.realize([4])
