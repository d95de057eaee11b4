"""Autoscheduler v0 (reference: src/autoschedulers/mullapudi2016)."""
import numpy as np

import halide_tpu as hl


def test_autoschedule_blur():
    x, y = hl.Var("x"), hl.Var("y")
    img = hl.ImageParam(hl.UInt(16), 2, "as_in")
    bx, by = hl.Func("as_bx"), hl.Func("as_by")
    bx[x, y] = (img[x, y] + img[x + 1, y] + img[x + 2, y]) / 3
    by[x, y] = (bx[x, y] + bx[x, y + 1] + bx[x, y + 2]) / 3
    by.set_estimates([(0, 254), (0, 126)])
    p = hl.Pipeline(by)
    res = p.apply_autoscheduler()
    assert "tile" in res["schedule_source"]
    assert "as_bx.compute_at" in res["schedule_source"]
    rng = np.random.default_rng(0)
    data = rng.integers(0, 1 << 14, (128, 256), np.uint16)
    img.set(data)
    out = p.realize([254, 126]).to_numpy()
    ref = (data[:, :-2].astype(np.uint16) + data[:, 1:-1] + data[:, 2:]) // 3
    ref = (ref[:-2] + ref[1:-1] + ref[2:]) // 3
    np.testing.assert_array_equal(out, ref)


def _pyramid_pipeline():
    """2x downsample chain: the cost model must materialize between the
    separable strided stages (the measured dual-strided fusion cliff)."""
    x, y = hl.Var("x"), hl.Var("y")
    img = hl.ImageParam(hl.Float(32), 2, "pyr_in")
    dx, d1 = hl.Func("pyr_dx"), hl.Func("pyr_d1")
    dx[x, y] = (img[hl.clamp(2 * x - 1, 0, 511), y]
                + 2.0 * img[hl.clamp(2 * x, 0, 511), y]
                + img[hl.clamp(2 * x + 1, 0, 511), y]) * 0.25
    d1[x, y] = (dx[x, hl.clamp(2 * y - 1, 0, 255)]
                + 2.0 * dx[x, hl.clamp(2 * y, 0, 255)]
                + dx[x, hl.clamp(2 * y + 1, 0, 255)]) * 0.25
    d1.set_estimates([(0, 256), (0, 128)])
    return hl.Pipeline(d1), img, dx


def test_greedy_materializes_strided_stage():
    p, img, dx = _pyramid_pipeline()
    res = p.apply_autoscheduler()
    assert "pyr_dx.compute_root()" in res["schedule_source"], res
    rng = np.random.default_rng(1)
    data = rng.standard_normal((256, 512)).astype(np.float32)
    img.set(data)
    out = p.realize([256, 128]).to_numpy()
    dxr = (data[:, np.clip(2 * np.arange(256) - 1, 0, 511)]
           + 2 * data[:, np.clip(2 * np.arange(256), 0, 511)]
           + data[:, np.clip(2 * np.arange(256) + 1, 0, 511)]) * np.float32(0.25)
    ref = (dxr[np.clip(2 * np.arange(128) - 1, 0, 255)]
           + 2 * dxr[np.clip(2 * np.arange(128), 0, 255)]
           + dxr[np.clip(2 * np.arange(128) + 1, 0, 255)]) * np.float32(0.25)
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_beam_search_not_worse_than_greedy():
    from halide_tpu.autoschedule import _Analysis, _beam, _cost, _greedy
    p, _img, _dx = _pyramid_pipeline()
    an = _Analysis(p)
    cg = _cost(an, _greedy(an))
    cb = _cost(an, _beam(an))
    assert cb <= cg + 1e-6


def test_li2018_is_honestly_unimplemented():
    import pytest
    p, _img, _dx = _pyramid_pipeline()
    with pytest.raises(hl.CompileError, match="not implemented"):
        p.apply_autoscheduler(params={"name": "Li2018"})
