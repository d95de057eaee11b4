"""stencil_chain: N chained 5x5 stencils, uint16 — fusion-depth stress test
(reference: apps/stencil_chain/stencil_chain_generator.cpp:14-34)."""
from __future__ import annotations

import numpy as np

import halide_tpu as hl

from . import App, register


@register("stencil_chain")
def build(width: int = 1536, height: int = 2560, stencils: int = 32) -> App:
    x, y = hl.Var("x"), hl.Var("y")
    inp = hl.ImageParam(hl.UInt(16), 2, "input")

    # TPU-first formulation: the (i+3)*(j+3) weight grid is SEPARABLE and
    # u16 arithmetic is a ring, so each 25-tap stencil factors exactly into
    # a 5-tap row pass then a 5-tap column pass; both passes run in f32
    # (row sum <= 15*65535 = 983k, column sum <= 15*983k = 14.7M, both
    # < 2^24, so every intermediate is an exactly-represented integer) with
    # one wrap mod 2^16 at stage end. Bit-identical to the u16 form, 10
    # FMAs/pixel instead of 25 integer multiplies (i32-promoted integer
    # multiply is multi-pass on the VPU; f32 FMA is single-issue).
    stages = [hl.repeat_edge(inp)]
    rows = []
    for s in range(stencils):
        prev = stages[-1]
        row = hl.Func(f"row_{s}")
        er = hl.f32(0)
        for j in range(-2, 3):
            er = er + float(j + 3) * hl.f32(prev[x, y + j])
        row[x, y] = er
        f = hl.Func(f"stage_{s}")
        ec = hl.f32(0)
        for i in range(-2, 3):
            ec = ec + float(i + 3) * row[x + i, y]
        # exact wrap: ec/65536 is a power-of-two scale (exact), floor of an
        # exact integer is exact, the difference is < 2^16
        f[x, y] = hl.u16(ec - 65536.0 * hl.floor(ec * (1.0 / 65536.0)))
        # materialize every stage (the reference's CPU schedule stages every
        # other one; XLA re-fuses neighbors anyway)
        row.compute_root()
        f.compute_root()
        rows.append(row)
        stages.append(f)

    output = hl.Func("chain_out")
    output[x, y] = stages[-1][x, y]

    # Kernel-path schedule (OPT-IN): a handful of Pallas kernels, each
    # covering GROUP consecutive stencils over full-width row bands with
    # the intermediate stages VMEM-resident. Measured on v5e at canonical
    # size it LOSES to the fused-XLA path (12.6 ms vs 6.1 ms -- the
    # i32-promoted u16 arithmetic in-kernel costs more than the saved
    # HBM round-trips), so the default stays XLA. (reference:
    # apps/stencil_chain/stencil_chain_generator.cpp:53-106.)
    import os
    group = 8
    # HALIDE_TPU_SC_SLIDE=<tx>: narrower tiles + store_at(anchor, yo) so
    # the member stages' VMEM windows CARRY across the inner x steps
    # (sliding-window reuse, reference SlidingWindow.cpp) instead of
    # recomputing the accumulated x halos (stage m under anchor s has a
    # 4*(s-m)-column overlap) -- the hardware A/B for the carry
    # Default stays the fused-XLA separable rewrite BY MEASUREMENT, not
    # because the kernel fails: the round-4 hardware A/B at canonical
    # size put the kernel path at 3.35 ms vs 1.83 ms fused (the
    # i32-promoted u16 arithmetic in-kernel costs more than the saved
    # HBM round-trips). HALIDE_TPU_SC_KERNEL=1 opts in.
    _slide = os.environ.get("HALIDE_TPU_SC_SLIDE")
    if (os.environ.get("HALIDE_TPU_SC_KERNEL") or _slide) \
            and height % 128 == 0 and width >= 128:
        sc_tx = int(_slide) if _slide and _slide != "1" else (
            512 if _slide else width)
        anchors = [s for s in range(stencils)
                   if (s + 1) % group == 0 or s == stencils - 1]
        prev_a = -1
        for ai, s_idx in enumerate(anchors):
            f = stages[1 + s_idx]
            xo, yo, xi2, yi2 = (hl.Var(f"xo{ai}"), hl.Var(f"yo{ai}"),
                                hl.Var(f"xi{ai}"), hl.Var(f"yi{ai}"))
            f.tile(x, y, xo, yo, xi2, yi2, min(sc_tx, width), 128) \
             .vectorize(xi2).parallel(yo)
            for m in range(prev_a + 1, s_idx):
                stages[1 + m].compute_at(f, xo)
                rows[m].compute_at(f, xo)
                if _slide:
                    stages[1 + m].store_at(f, yo)
                    rows[m].store_at(f, yo)
            rows[s_idx].compute_at(f, xo)
            if _slide:
                rows[s_idx].store_at(f, yo)
            prev_a = s_idx

    def make_inputs(seed=0):
        rng = np.random.default_rng(seed)
        return {"input": rng.integers(0, 1 << 16, (height, width), np.uint16)}

    def reference(input):
        # only the *input* is edge-clamped; intermediate stages are computed
        # over regions grown by the remaining stencil reach
        cur = np.pad(input, 2 * stencils, mode="edge")
        for s in range(stencils):
            H2, W2 = cur.shape[0] - 4, cur.shape[1] - 4
            acc = np.zeros((H2, W2), np.uint16)
            for i in range(-2, 3):
                for j in range(-2, 3):
                    w = np.uint16((i + 3) * (j + 3))
                    acc = acc + w * cur[2 + j:2 + j + H2, 2 + i:2 + i + W2]
            cur = acc
        return cur

    return App("stencil_chain", hl.Pipeline(output), [inp], make_inputs,
               reference, [width, height])
