"""Error-path parity (reference: test/error/ suite — expected CompileErrors)."""
import numpy as np
import pytest

import halide_tpu as hl


def test_inline_func_with_updates_rejected():
    x = hl.Var("x")
    f = hl.Func("e_f")
    f[x] = 0
    f[x] += 1
    f.compute_inline()
    g = hl.Func("e_g")
    g[x] = f[x]
    with pytest.raises(hl.CompileError):
        g.realize([4])


def test_pure_def_requires_vars():
    f = hl.Func("e_p")
    x = hl.Var("x")
    with pytest.raises(hl.CompileError):
        f[x + 1] = 0


def test_duplicate_pure_vars():
    f = hl.Func("e_d")
    x = hl.Var("x")
    with pytest.raises(hl.CompileError):
        f[x, x] = 0


def test_two_rdoms_in_definition():
    f = hl.Func("e_r")
    x = hl.Var("x")
    r1, r2 = hl.RDom(0, 3), hl.RDom(0, 4)
    f[x] = 0
    with pytest.raises(hl.CompileError):
        f[x] += r1.x + r2.x


def test_adorned_pure_var_in_update():
    f = hl.Func("e_a")
    x = hl.Var("x")
    f[x] = 0
    with pytest.raises(hl.CompileError):
        f[x + 1] = f[x] + 1


def test_update_arity_mismatch():
    f = hl.Func("e_ar")
    x, y = hl.Var("x"), hl.Var("y")
    f[x, y] = 0
    with pytest.raises(hl.CompileError):
        f[x] = 1


def test_wrong_call_arity():
    f = hl.Func("e_c")
    x, y = hl.Var("x"), hl.Var("y")
    f[x, y] = x + y
    g = hl.Func("e_c2")
    with pytest.raises(hl.CompileError):
        g[x] = f[x]


def test_realize_undefined():
    f = hl.Func("e_u")
    with pytest.raises(hl.CompileError):
        f.realize([4])


def test_unbound_imageparam():
    x = hl.Var("x")
    img = hl.ImageParam(hl.Float(32), 1, "e_img")
    f = hl.Func("e_ub")
    f[x] = img[x]
    img.reset()
    with pytest.raises(hl.CompileError):
        f.realize([4])


def test_unset_param():
    x = hl.Var("x")
    p = hl.Param(hl.Int(32), "e_param")
    f = hl.Func("e_up")
    f[x] = x + p
    with pytest.raises(hl.CompileError):
        f.realize([4])


def test_bound_too_small():
    x = hl.Var("x")
    f = hl.Func("e_b")
    f[x] = x
    f.bound(x, 0, 8)
    with pytest.raises(hl.CompileError):
        f.realize([16])


def test_unbounded_index_needs_clamp():
    x = hl.Var("x")
    img = hl.ImageParam(hl.Int(32), 1, "e_lut_src")
    lut = hl.Func("e_lut")
    lut[x] = x * 2
    lut.compute_root()
    f = hl.Func("e_gather")
    f[x] = lut[img[x]]     # i32 values: unbounded
    img.set(np.zeros(4, np.int32))
    with pytest.raises(hl.CompileError):
        f.realize([4])


def test_select_condition_must_be_bool():
    with pytest.raises(hl.CompileError):
        hl.select(hl.i32(1), 2, 3)


def test_rfactor_requires_associative():
    x = hl.Var("x")
    f = hl.Func("e_rf")
    r = hl.RDom(0, 10)
    f[x] = 0
    f[x] = f[x] - r.x * f[x]    # not a simple associative combine
    u = hl.Var("u")
    with pytest.raises(hl.CompileError):
        f.update().rfactor(r.x, u)


def test_fold_storage_factor_too_small():
    # reference: halide_error_fold_factor_too_small
    # (StorageFolding.cpp:219-264) -- a fold factor smaller than the
    # per-tile live window must error, not silently ignore the fold
    x, y = hl.Var("x"), hl.Var("y")
    xo, yo, xi, yi = hl.Var("xo"), hl.Var("yo"), hl.Var("xi"), hl.Var("yi")
    img = np.zeros((32, 64), np.float32)
    inp = hl.Buffer(img)
    bx, by = hl.Func("fs_bx"), hl.Func("fs_by")
    bx[x, y] = inp[x, y] * 2.0
    by[x, y] = bx[x, y] + bx[x, hl.clamp(y + 1, 0, 31)]
    by.tile(x, y, xo, yo, xi, yi, 64, 8)
    bx.compute_at(by, xo)
    bx.fold_storage(y, 4)      # tile needs 9 live rows of bx
    with pytest.raises(hl.CompileError, match="fold_storage"):
        by.realize([64, 31])


def test_unclamped_data_dependent_index_errors():
    # reference: BoundsInference's constant-bound check -- an index whose
    # only bound is its TYPE range (i32(float_input[x]) is "bounded" by
    # [-2^31, 2^31-1]) must raise the clamp()-hint diagnostic, not
    # overflow deep inside the gather lowering with a 2^32+1-extent
    # footprint (the interval union of tab[iv] and tab[iv+1])
    x, y = hl.Var("x"), hl.Var("y")
    tab = hl.Func("ub_tab")
    tab[x, y] = hl.f32(x) * 0.25 + hl.f32(y)
    tab.compute_root()
    inp = hl.ImageParam(hl.Float(32), 2, "ub_in")
    inp.set(np.full((4, 8), 2.5, np.float32))
    iv = hl.i32(inp[x, y])          # data-dependent, unclamped
    out = hl.Func("ub_out")
    out[x, y] = tab[iv, y] + tab[iv + 1, y]
    with pytest.raises(hl.CompileError, match="clamp"):
        hl.Pipeline(out).realize([8, 4])
