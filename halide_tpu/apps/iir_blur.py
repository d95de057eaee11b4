"""iir_blur: first-order IIR low-pass, down+up each axis via transpose
(reference: apps/iir_blur/iir_blur_generator.cpp:13-33,147-156). The scans
lower to log-depth associative scans (SURVEY.md §5.7)."""
from __future__ import annotations

import numpy as np

import halide_tpu as hl

from . import App, register


def _blur_cols_transpose(inp, height, alpha):
    x, y, c = hl.Var("x"), hl.Var("y"), hl.Var("c")
    blur = hl.Func("iblur")
    blur[x, y, c] = hl.undef(hl.Float(32))
    blur[x, 0, c] = inp[x, 0, c]
    ry = hl.RDom(1, height - 1)
    blur[x, ry.x, c] = (1 - alpha) * blur[x, ry.x - 1, c] \
        + alpha * inp[x, ry.x, c]
    flip = height - ry.x - 1
    blur[x, flip, c] = (1 - alpha) * blur[x, flip + 1, c] \
        + alpha * blur[x, flip, c]

    transpose = hl.Func("itranspose")
    transpose[x, y, c] = blur[y, x, c]
    return transpose


@register("iir_blur")
def build(width: int = 1536, height: int = 2560, alpha: float = 0.1) -> App:
    inp = hl.ImageParam(hl.Float(32), 3, "input")
    blury_T = _blur_cols_transpose(inp, height, alpha)
    blur = _blur_cols_transpose(blury_T, width, alpha)

    def make_inputs(seed=0):
        rng = np.random.default_rng(seed)
        return {"input": rng.random((3, height, width), np.float32)}

    def reference(input):
        a = np.float64(alpha)

        def iir_cols(img):  # img np[c, h, w]; filter along h, then transpose
            v = img.astype(np.float64).copy()
            for i in range(1, v.shape[1]):
                v[:, i] = (1 - a) * v[:, i - 1] + a * img[:, i]
            for i in range(v.shape[1] - 2, -1, -1):
                v[:, i] = (1 - a) * v[:, i + 1] + a * v[:, i]
            return np.swapaxes(v, 1, 2)

        return iir_cols(iir_cols(input)).astype(np.float32)

    return App("iir_blur", hl.Pipeline(blur), [inp], make_inputs, reference,
               [width, height, 3], megapixels=width * height / 1e6,
               tolerance=2e-3, atol=2e-3)
