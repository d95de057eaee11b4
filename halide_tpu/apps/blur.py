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

    # schedule: MEASURED default is the fused-XLA lowering (blur_x inline,
    # one XLA fusion of shifts+adds) -- reference schedule analog:
    # apps/blur/halide_blur_generator.cpp:98-110 tile+vectorize+parallel.
    # Round-5 honest sweep at 2560x1536 u16 (poke-chain protocol,
    # us/frame): fused XLA 41.8, kernel 2560x256 51.1, 2560x128 68.8,
    # 1280x256 138.5, 1280x512 132.4. (The round-4 "36.4us @ 1280x256"
    # was k=24-regime tunnel noise: the per-call RTT is ~33 ms, so short
    # chains cannot resolve sub-0.5ms frames.) HALIDE_TPU_BLUR_TILE=WxH
    # opts into the Pallas row-band kernel for hardware A/B.
    import os
    _tile = os.environ.get("HALIDE_TPU_BLUR_TILE")
    if _tile:   # tile-shape A/B on hardware (tools/abtest.py)
        xo, yo = hl.Var("xo"), hl.Var("yo")
        xi, yi = hl.Var("xi"), hl.Var("yi")
        tx_, ty_ = (int(v) for v in _tile.split("x"))
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
