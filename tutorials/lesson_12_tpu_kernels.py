"""Lesson 12: offloading a scheduled group to a TPU kernel — the GPU
lesson's analog (reference: tutorial/lesson_12_using_the_gpu.cpp).

The reference's gpu_tile() maps a tile onto CUDA blocks/threads. Here the
same schedule shape — tile the consumer, compute producers at the tile —
lowers the whole group into ONE Pallas kernel:

    tile          -> the kernel grid (one program per tile)
    compute_at    -> producer evaluated inside the kernel, VMEM-resident
    parallel(yo)  -> megacore core-splitting ("parallel" grid semantics)
    vectorize(xi) -> advisory; arrays are already VPU lanes

On a machine without a TPU the kernel runs in Pallas interpret mode; the
schedule is semantics-preserving either way, and anything the kernel
tracer cannot lower falls back to fused XLA silently.
"""
import numpy as np
import halide_tpu as hl


def main():
    x, y = hl.Var("x"), hl.Var("y")
    xo, yo, xi, yi = (hl.Var(n) for n in "xo yo xi yi".split())

    rng = np.random.default_rng(12)
    img = rng.integers(0, 1 << 14, (128, 256), np.uint16)
    inp = hl.Buffer(img, name="l12_in")

    blur_x = hl.Func("l12_bx")
    blur_y = hl.Func("l12_by")
    blur_x[x, y] = (inp[x, y] + inp[x + 1, y] + inp[x + 2, y]) / 3
    blur_y[x, y] = (blur_x[x, y] + blur_x[x, y + 1] + blur_x[x, y + 2]) / 3

    # the "gpu_tile" of this world:
    blur_y.tile(x, y, xo, yo, xi, yi, 128, 32).vectorize(xi).parallel(yo)
    blur_x.compute_at(blur_y, xo)

    # confirm the kernel path actually engages (not a silent fallback)
    from halide_tpu.ops import pallas_group as pg
    engaged = []
    orig = pg.try_pallas_group

    def spy(*a, **kw):
        r = orig(*a, **kw)
        engaged.append(r is not None)
        return r

    pg.try_pallas_group = spy
    try:
        out = blur_y.realize([254, 126], jit=False).to_numpy()
    finally:
        pg.try_pallas_group = orig
    a = img.astype(np.uint16)
    bx = (a[:, :-2] + a[:, 1:-1] + a[:, 2:]) // 3
    ref = (bx[:-2] + bx[1:-1] + bx[2:]) // 3
    np.testing.assert_array_equal(out, ref)
    assert engaged and engaged[-1], "kernel lowering did not engage"
    # the lowering plan records megacore + DMA-pipelining decisions
    print("lesson 12: Pallas group engaged; plan:", pg._last_plan)


if __name__ == "__main__":
    main()
