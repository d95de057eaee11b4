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


def test_li2018_schedules_gradient_style_pipeline():
    """Li2018 template (reference: li2018/GradientAutoscheduler.cpp
    apply_schedule @573): compute_root + loop marks per func, and rfactor'd
    reduction parallelism for a small-pure-domain associative update —
    the exact shape reverse-mode autodiff emits (a scalar loss reduced
    over a big domain, lesson_26)."""
    x = hl.Var("x")
    img = hl.ImageParam(hl.Float(32), 1, "li_in")
    sq = hl.Func("li_sq")
    sq[x] = img[x] * img[x]
    r = hl.RDom(0, 4096)
    loss = hl.Func("li_loss")
    loss[x] = 0.0
    loss[x] += sq[r.x]
    loss.set_estimates([(0, 1)])
    p = hl.Pipeline(loss)
    res = p.apply_autoscheduler(params={"name": "Li2018"})
    src = res["schedule_source"]
    assert "li_loss.compute_root()" in src, src
    # the 1-point pure domain forces the rfactor path (reference @599-684)
    assert "rfactor" in src and ".split(" in src, src
    data = np.arange(4096, dtype=np.float32) / 4096.0
    img.set(data)
    out = p.realize([1]).to_numpy()
    np.testing.assert_allclose(out, [(data * data).sum()], rtol=1e-4)


def test_li2018_large_pure_domain_no_rfactor():
    """A wide pure domain already parallelizes; Li2018 must not rfactor."""
    x, y = hl.Var("x"), hl.Var("y")
    img = hl.ImageParam(hl.Float(32), 2, "li2_in")
    r = hl.RDom(0, 16)
    acc = hl.Func("li2_acc")
    acc[x, y] = 0.0
    acc[x, y] += img[x, hl.clamp(y + r.x, 0, 127)]
    acc.set_estimates([(0, 512), (0, 128)])
    p = hl.Pipeline(acc)
    res = p.apply_autoscheduler(params={"name": "Li2018"})
    src = res["schedule_source"]
    assert "rfactor" not in src, src
    assert "li2_acc.compute_root()" in src
    rng = np.random.default_rng(0)
    data = rng.standard_normal((128, 512)).astype(np.float32)
    img.set(data)
    out = p.realize([512, 128]).to_numpy()
    idx = np.clip(np.arange(128)[:, None] + np.arange(16)[None, :], 0, 127)
    ref = data[idx, :].sum(axis=1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_anderson2021_autotunes_by_measurement():
    """Anderson2021 (reference: src/autoschedulers/anderson2021 — beam +
    measured autotune loop): top-K beam candidates are timed on serialized
    clones and the measured winner is applied; the report carries the
    sample times."""
    x, y = hl.Var("x"), hl.Var("y")
    img = hl.ImageParam(hl.Float(32), 2, "an_in")
    a, b, out = hl.Func("an_a"), hl.Func("an_b"), hl.Func("an_out")
    a[x, y] = img[x, y] * 2.0 + img[x + 1, y]
    b[x, y] = a[x, y] + a[x, y + 1]
    out[x, y] = b[x, y] * 0.5 + a[x, y]
    out.set_estimates([(0, 256), (0, 64)])
    rng = np.random.default_rng(3)
    data = rng.random((66, 258), np.float32)
    img.set(data)
    p = hl.Pipeline(out)
    res = p.apply_autoscheduler(params={"name": "Anderson2021",
                                        "samples": 3, "benchmarks": 2})
    assert "autotuned" in res, res
    assert res["autotuned"]["samples"] >= 2
    assert res["autotuned"]["best_ms"] <= min(
        res["autotuned"]["times_ms"]) + 1e-3   # times_ms are rounded
    got = p.realize([256, 64]).to_numpy()
    a_full = data[:66, :257] * 2.0 + data[:66, 1:258]
    b_full = a_full[:65] + a_full[1:66]
    want = b_full[:64, :256] * 0.5 + a_full[:64, :256]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_anderson2021_unbound_inputs_degrades_to_model():
    """With nothing to time against (unbound inputs), Anderson2021 must
    still produce a schedule — model-ranked, no autotuned report."""
    x, y = hl.Var("x"), hl.Var("y")
    img = hl.ImageParam(hl.Float(32), 2, "an2_in")
    f = hl.Func("an2_f")
    f[x, y] = img[x, y] + 1.0
    f.set_estimates([(0, 128), (0, 32)])
    p = hl.Pipeline(f)
    res = p.apply_autoscheduler(params={"name": "Anderson2021"})
    assert "schedule_source" in res
    assert "autotuned" not in res
