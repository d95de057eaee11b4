"""Lesson 24: asynchronous producers — double-buffered DMA
(reference: tutorial/lesson_24_async.cpp, src/AsyncProducers.cpp).

The reference overlaps a producer's work with its consumer via async() +
ring buffers and semaphores. The TPU analog lives inside the Pallas
group lowering: when a tiled group's inner grid dimension iterates, the
NEXT tile's HBM->VMEM input DMA is issued before computing the current
tile, alternating between two VMEM scratch buffers — the DMA engine runs
ahead of the VPU, hiding load latency exactly like the reference's
producer thread. No directive is needed; the lowering plans it whenever
it is legal and profitable (and records the decision for inspection).
"""
import numpy as np
import halide_tpu as hl


def main():
    x, y = hl.Var("x"), hl.Var("y")
    xo, yo, xi, yi = (hl.Var(n) for n in "xo yo xi yi".split())
    rng = np.random.default_rng(24)
    img = rng.integers(0, 1 << 14, (512, 1024), np.uint16)
    inp = hl.Buffer(img, name="l24_in")

    bx, by = hl.Func("l24_bx"), hl.Func("l24_by")
    bx[x, y] = (inp[x, y] + inp[x + 1, y] + inp[x + 2, y]) / 3
    by[x, y] = (bx[x, y] + bx[x, y + 1] + bx[x, y + 2]) / 3
    # 4 tiles along x -> the inner grid dim iterates -> pipelined DMA;
    # parallel(yo) additionally splits row-bands across megacore cores
    by.tile(x, y, xo, yo, xi, yi, 256, 128).vectorize(xi).parallel(yo)
    bx.compute_at(by, xo)

    from halide_tpu.ops import pallas_group as pg
    pg._last_plan = None
    out = by.realize([1022, 510], jit=False).to_numpy()

    a = img.astype(np.uint16)
    r1 = (a[:, :-2] + a[:, 1:-1] + a[:, 2:]) // 3
    ref = (r1[:-2] + r1[1:-1] + r1[2:]) // 3
    np.testing.assert_array_equal(out, ref)

    plan = pg._last_plan
    assert plan is not None and plan["pipeline_capable"], plan
    assert plan["semantics"][0] == "parallel", plan
    print("lesson 24: async DMA plan:", plan)


if __name__ == "__main__":
    main()
