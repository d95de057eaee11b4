"""Front-end + realize basics — the analog of the reference's early
test/correctness files (basics.cpp, simple pipelines vs straight loops)."""
import numpy as np
import pytest

import halide_tpu as hl


def test_gradient():
    x, y = hl.Var("x"), hl.Var("y")
    f = hl.Func("grad")
    f[x, y] = x + y
    out = f.realize([4, 3])
    ref = np.add.outer(np.arange(3), np.arange(4))  # np[y, x]
    np.testing.assert_array_equal(out.to_numpy(), ref)


def test_types_and_cast():
    x = hl.Var("x")
    f = hl.Func()
    f[x] = hl.cast(hl.UInt(8), x * 3)
    out = f.realize([200]).to_numpy()
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, (np.arange(200) * 3 % 256).astype(np.uint8))


def test_uint8_wraparound():
    x = hl.Var("x")
    f = hl.Func()
    f[x] = hl.u8(x) + hl.u8(250)
    out = f.realize([20]).to_numpy()
    ref = (np.arange(20, dtype=np.uint8) + np.uint8(250))
    np.testing.assert_array_equal(out, ref)


def test_euclidean_div_mod():
    x = hl.Var("x")
    f = hl.Func()
    g = hl.Func()
    f[x] = (x - 10) / 3
    g[x] = (x - 10) % 3
    fo = f.realize([20]).to_numpy()
    go = g.realize([20]).to_numpy()
    xs = np.arange(20) - 10
    np.testing.assert_array_equal(fo, xs // 3)
    np.testing.assert_array_equal(go, xs % 3)


def test_div_by_zero_is_zero():
    x = hl.Var("x")
    f = hl.Func()
    f[x] = 7 / (x - 2) + 100 % (x - 2)
    out = f.realize([3]).to_numpy()
    assert out[2] == 0


def test_select_clamp():
    x = hl.Var("x")
    f = hl.Func()
    f[x] = hl.select(x < 5, hl.clamp(x, 2, 3), 99)
    out = f.realize([8]).to_numpy()
    np.testing.assert_array_equal(out, [2, 2, 2, 3, 3, 99, 99, 99])


def test_multiway_select():
    x = hl.Var("x")
    f = hl.Func()
    f[x] = hl.select(x == 0, 10, x == 1, 20, 30)
    np.testing.assert_array_equal(f.realize([3]).to_numpy(), [10, 20, 30])


def test_inline_producer_consumer():
    x, y = hl.Var("x"), hl.Var("y")
    p = hl.Func("p")
    c = hl.Func("c")
    p[x, y] = x * y
    c[x, y] = p[x, y] + p[x + 1, y]
    out = c.realize([4, 4]).to_numpy()
    xs = np.arange(4)
    ys = np.arange(4)[:, None]
    np.testing.assert_array_equal(out, xs * ys + (xs + 1) * ys)


def test_compute_root_same_result():
    x, y = hl.Var("x"), hl.Var("y")
    p = hl.Func("p")
    c = hl.Func("c")
    p[x, y] = x * 2 + y
    p.compute_root()
    c[x, y] = p[x, y] * 3
    out = c.realize([5, 5]).to_numpy()
    np.testing.assert_array_equal(
        out, (np.arange(5) * 2 + np.arange(5)[:, None]) * 3)


def test_stencil_needs_bigger_producer_region():
    # bounds inference must realize p over [0, 6] x [0, 5] for c over 5x5
    x, y = hl.Var("x"), hl.Var("y")
    p = hl.Func("p")
    c = hl.Func("c")
    p[x, y] = x + y * 10
    p.compute_root()
    c[x, y] = p[x, y] + p[x + 2, y]
    out = c.realize([5, 5]).to_numpy()
    xs, ys = np.arange(5), np.arange(5)[:, None]
    np.testing.assert_array_equal(out, (xs + 10 * ys) + (xs + 2 + 10 * ys))


def test_input_buffer_and_boundary():
    x, y = hl.Var("x"), hl.Var("y")
    data = np.arange(12, dtype=np.float32).reshape(3, 4)  # np[y, x]
    inp = hl.Buffer(data, name="in")
    clamped = hl.repeat_edge(inp)
    f = hl.Func()
    f[x, y] = clamped[x - 1, y] + clamped[x + 1, y]
    out = f.realize([4, 3]).to_numpy()
    padded = np.pad(data, ((0, 0), (1, 1)), mode="edge")
    ref = padded[:, :-2] + padded[:, 2:]
    np.testing.assert_allclose(out, ref)


def test_out_of_bounds_input_errors():
    x = hl.Var("x")
    data = np.arange(4, dtype=np.float32)
    inp = hl.Buffer(data)
    f = hl.Func()
    f[x] = inp[x + 1]
    with pytest.raises(hl.CompileError):
        f.realize([4])


def test_undefined_func_error():
    x = hl.Var("x")
    f = hl.Func("undefined_f")
    g = hl.Func()
    with pytest.raises(hl.CompileError):
        g[x] = f[x] + 1
        g.realize([4])


def test_math_ops():
    x = hl.Var("x")
    f = hl.Func()
    f[x] = hl.sqrt(hl.f32(x)) + hl.exp(hl.f32(x) * 0.1)
    out = f.realize([10]).to_numpy()
    xs = np.arange(10, dtype=np.float32)
    np.testing.assert_allclose(out, np.sqrt(xs) + np.exp(xs * 0.1), rtol=1e-6)


def test_tuple_func():
    x = hl.Var("x")
    f = hl.Func("tup")
    f[x] = (x + 1, hl.f32(x) * 0.5)
    r = f.realize([4])
    np.testing.assert_array_equal(r[0].to_numpy(), np.arange(4) + 1)
    np.testing.assert_allclose(r[1].to_numpy(), np.arange(4) * 0.5)


def test_param():
    x = hl.Var("x")
    p = hl.Param(hl.Int(32), "offset")
    f = hl.Func()
    f[x] = x + p
    p.set(5)
    np.testing.assert_array_equal(f.realize([3]).to_numpy(), [5, 6, 7])
    p.set(9)
    np.testing.assert_array_equal(f.realize([3]).to_numpy(), [9, 10, 11])


def test_imageparam():
    x = hl.Var("x")
    img = hl.ImageParam(hl.Float(32), 1, "img")
    f = hl.Func()
    f[x] = img[x] * 2.0
    img.set(np.arange(5, dtype=np.float32))
    np.testing.assert_allclose(f.realize([5]).to_numpy(),
                               np.arange(5, dtype=np.float32) * 2)


def test_nonzero_min_buffer():
    # buffers carry non-zero mins (Appendix A #13)
    x = hl.Var("x")
    data = np.arange(4, dtype=np.int32)
    inp = hl.Buffer(data).set_min(10)
    f = hl.Func()
    f[x] = inp[hl.clamp(x, 10, 13)]
    out = f.realize([20]).to_numpy()
    ref = data[np.clip(np.arange(20), 10, 13) - 10]
    np.testing.assert_array_equal(out, ref)


def test_widening_saturating():
    x = hl.Var("x")
    f = hl.Func()
    f[x] = hl.saturating_add(hl.u8(x * 20), hl.u8(100))
    out = f.realize([13]).to_numpy()
    ref = np.minimum(np.arange(13) * 20 % 256 + 100, 255).astype(np.uint8)
    np.testing.assert_array_equal(out, ref)


def test_lerp():
    x = hl.Var("x")
    f = hl.Func()
    f[x] = hl.lerp(0.0, 10.0, hl.f32(x) / 9.0)
    np.testing.assert_allclose(f.realize([10]).to_numpy(),
                               np.linspace(0, 10, 10), rtol=1e-6)


def test_strided_and_reversed_access():
    x = hl.Var("x")
    data = np.arange(16, dtype=np.int32)
    inp = hl.Buffer(data)
    f = hl.Func()
    f[x] = inp[x * 2] + inp[15 - x]
    out = f.realize([8]).to_numpy()
    np.testing.assert_array_equal(out, data[::2] + data[15:7:-1])


def test_func_of_func_diagonal():
    x, y = hl.Var("x"), hl.Var("y")
    p = hl.Func("p")
    p[x, y] = x * 10 + y
    p.compute_root()
    f = hl.Func()
    f[x] = p[x, x]
    np.testing.assert_array_equal(f.realize([4]).to_numpy(), [0, 11, 22, 33])
