"""Lesson 30: sliding-window storage and tail strategies
(reference: tutorial/lesson_08_scheduling_2.cpp store_at/compute_at,
src/SlidingWindow.cpp, src/Schedule.h:35-139 TailStrategy).

Two classic Halide scheduling ideas and their TPU lowerings:

1. SLIDING WINDOW — `store_at(consumer, outer)` + `compute_at(consumer,
   inner)`: the producer's storage outlives the inner loop, so only the
   NEW slice is computed each step. Here the producer's VMEM scratch
   persists across the Pallas grid's inner steps: warm-up computes the
   full footprint at step 0; steady state shifts by the tile stride and
   evaluates only the new band.

2. TAIL STRATEGIES — what happens when an extent is not a tile
   multiple. RoundUp pads the grid and crops the output (over-compute +
   an extra HBM pass for the input edge-pad). Auto/ShiftInwards/
   GuardWithIf instead PARTITION the grid: an interior program over the
   floor tiles plus edge strips shifted inward by one tile, recomputing
   only the overlap band (the reference's ShiftInwards + loop
   partitioning, src/PartitionLoops.cpp).
"""
import numpy as np
import halide_tpu as hl


def main():
    x, y = hl.Var("x"), hl.Var("y")
    xo, yo, xi, yi = (hl.Var(n) for n in "xo yo xi yi".split())
    rng = np.random.default_rng(30)
    img = rng.integers(0, 1 << 14, (256, 512), np.uint16)
    inp = hl.Buffer(img, name="l30_in")

    # vertical blur producer, horizontal blur consumer: the consumer's
    # x stencil gives the producer a 2-column overlap between adjacent
    # x tiles -- exactly what the sliding window carries
    bv, bh = hl.Func("l30_bv"), hl.Func("l30_bh")
    bv[x, y] = (inp[x, y] + inp[x, y + 1] + inp[x, y + 2]) / 3
    bh[x, y] = (bv[x, y] + bv[x + 1, y] + bv[x + 2, y]) / 3

    bh.tile(x, y, xo, yo, xi, yi, 128, 64).vectorize(xi).parallel(yo)
    bv.compute_at(bh, xo).store_at(bh, yo)   # storage encloses the x loop

    W, H = 510, 254       # NOT tile multiples: the tail path engages too
    out = bh.realize([W, H]).to_numpy()

    ref = (img[:-2].astype(np.uint16) + img[1:-1] + img[2:]) // 3
    ref = (ref[:, :-2] + ref[:, 1:-1] + ref[:, 2:]) // 3
    assert np.array_equal(out, ref[:H, :W])

    # the lowering records both decisions for inspection
    from halide_tpu.ops import pallas_group as pg
    plan = pg._last_plan
    assert plan is not None
    assert plan.get("sliding") == ["l30_bv"], plan
    assert plan.get("tail") == "shift_inwards", plan
    print("lesson_30: sliding window carried l30_bv;",
          f"partitioned into {plan['parts']} programs")
    print("Success!")


if __name__ == "__main__":
    main()
