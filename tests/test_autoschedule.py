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
