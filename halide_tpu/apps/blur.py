"""blur: 2-stage separable 3x3 box blur, uint16
(reference: apps/blur/halide_blur_generator.cpp:39-40 — algorithm:
blur_x = (in(x,y)+in(x+1,y)+in(x+2,y))/3; blur_y likewise in y).

The hot loop is pure HBM-bandwidth: TPU lowering is a single fused XLA
(or Pallas) program of shifts+adds, output (W-2, H-2) of a WxH input.
"""
from __future__ import annotations

import numpy as np

import halide_tpu as hl

from . import App, register


@register("blur")
def build(width: int = 2560, height: int = 1536) -> App:
    x, y = hl.Var("x"), hl.Var("y")
    inp = hl.ImageParam(hl.UInt(16), 2, "input")

    blur_x = hl.Func("blur_x")
    blur_y = hl.Func("blur_y")
    blur_x[x, y] = (inp[x, y] + inp[x + 1, y] + inp[x + 2, y]) / 3
    blur_y[x, y] = (blur_x[x, y] + blur_x[x, y + 1] + blur_x[x, y + 2]) / 3

    # schedule: one Pallas kernel per row-band -- full-width tiles, blur_x
    # staged in VMEM (reference: apps/blur/halide_blur_generator.cpp:98-110
    # tile+vectorize+parallel). Measured v5e: 0.081ms (XLA fusion) ->
    # 0.048ms through the kernel path at 2560x1536 u16 (megacore split
    # over row-bands; narrower tiles engage double-buffered DMA but
    # full-width wins here).
    xo, yo, xi, yi = hl.Var("xo"), hl.Var("yo"), hl.Var("xi"), hl.Var("yi")
    import os
    _tile = os.environ.get("HALIDE_TPU_BLUR_TILE")
    if _tile:   # tile-shape A/B on hardware (tools/abtest.py)
        tx_, ty_ = (int(v) for v in _tile.split("x"))
    else:
        # round-4 sweep at 2560x1536 u16 (us/frame): full-width x128
        # 55.4, x256 45.1, 1280x128 71.4, **1280x256 36.4** (x-split
        # doubles the DMA pipeline depth; 256-row bands amortize the
        # per-step fixed cost), 1280x512 50.0. Clamped so small test
        # sizes keep the same tiled structure.
        tx_, ty_ = min(1280, max(width - 2, 8)), min(256, height - 2)
    blur_y.tile(x, y, xo, yo, xi, yi, tx_, ty_) \
          .vectorize(xi).parallel(yo)
    blur_x.compute_at(blur_y, xo)

    def make_inputs(seed=0):
        rng = np.random.default_rng(seed)
        return {"input": rng.integers(
            0, 1 << 14, size=(height, width), dtype=np.uint16)}

    def reference(input):
        a = input.astype(np.uint16)
        bx = (a[:, :-2] + a[:, 1:-1] + a[:, 2:]) // 3
        by = (bx[:-2, :] + bx[1:-1, :] + bx[2:, :]) // 3
        return by

    return App(
        name="blur",
        pipeline=hl.Pipeline(blur_y),
        inputs=[inp],
        make_inputs=make_inputs,
        reference=reference,
        output_sizes=[width - 2, height - 2],
    )
