"""linear_blur: srgb->linear, blur, linear->srgb chain
(reference: apps/linear_blur/*_generator.cpp stubs composed by
linear_blur_generator.cpp)."""
from __future__ import annotations

import numpy as np

import halide_tpu as hl

from . import App, register


def srgb_to_linear(srgb, vars_):
    f = hl.Func("srgb_to_linear")
    e = srgb[vars_]
    f[vars_] = hl.select(e <= 0.04045, e / 12.92,
                         hl.pow((e + 0.055) / 1.055, 2.4))
    return f


def linear_to_srgb(linear, vars_):
    f = hl.Func("linear_to_srgb")
    e = linear[vars_]
    f[vars_] = hl.select(e <= 0.0031308, e * 12.92,
                         1.055 * hl.pow(e, 1.0 / 2.4) - 0.055)
    return f


@register("linear_blur")
def build(width: int = 1536, height: int = 2560) -> App:
    x, y, c = hl.Var("x"), hl.Var("y"), hl.Var("c")
    inp = hl.ImageParam(hl.Float(32), 3, "input")
    vars_ = (x, y, c)

    linear = srgb_to_linear(inp, vars_)
    linear.compute_root()
    bounded = hl.repeat_edge(
        linear, [(0, width), (0, height), None])
    blur_x = hl.Func("blur_x")
    blur_x[x, y, c] = (bounded[x, y, c] + bounded[x + 1, y, c]
                       + bounded[x + 2, y, c]) / 3
    blurred = hl.Func("simple_blur")
    blurred[x, y, c] = (blur_x[x, y, c] + blur_x[x, y + 1, c]
                        + blur_x[x, y + 2, c]) / 3
    output = linear_to_srgb(blurred, vars_)

    # TPU schedule: the tile the measured search picked (it is also the
    # analytical autoscheduler's choice) -- full-width row bands with the
    # blur stages staged into VMEM. Measured v5e at 1536x2560x3 f32:
    # 3.08 ms unscheduled fused-XLA -> 1.52 ms through the kernel path.
    xo, yo, xi, yi = hl.Var("xo"), hl.Var("yo"), hl.Var("xi"), hl.Var("yi")
    # clamp the y-tile so small test sizes exercise the same tiled loop
    # structure as the canonical build (a 256 split over height<256 would
    # silently degenerate to a single tile)
    output.tile(x, y, xo, yo, xi, yi, width,
                min(256, height)).vectorize(xi).parallel(yo)
    blurred.compute_at(output, xo).store_root()
    blur_x.compute_at(output, xo).store_root()

    def make_inputs(seed=0):
        rng = np.random.default_rng(seed)
        return {"input": rng.random((4, height, width), np.float32)[:3]}

    def reference(input):
        f = np.float32
        a = input
        lin = np.where(a <= f(0.04045), a / f(12.92),
                       np.power((a + f(0.055)) / f(1.055), f(2.4))).astype(f)
        p = np.pad(lin, ((0, 0), (0, 2), (0, 2)), mode="edge")
        bx = (p[:, :, :-2] + p[:, :, 1:-1] + p[:, :, 2:]) / f(3)
        bl = (bx[:, :-2, :] + bx[:, 1:-1, :] + bx[:, 2:, :]) / f(3)
        out = np.where(bl <= f(0.0031308), bl * f(12.92),
                       f(1.055) * np.power(bl, f(1 / 2.4)) - f(0.055))
        return out.astype(f)

    return App("linear_blur", hl.Pipeline(output), [inp], make_inputs,
               reference, [width, height, 3],
               megapixels=width * height / 1e6, tolerance=1e-4, atol=1e-4)
