"""Lesson 22: JIT compilation caches and how to benchmark
(reference: tutorial/lesson_22_jit_performance.cpp).

The first realize traces the graph and compiles it (XLA: tens of ms on
CPU, tens of seconds cold on TPU). Re-realizing with the same graph
SIGNATURE — same structure, shapes, dtypes, schedules — reuses the
compiled executable; only parameter VALUES change. Benchmark steady
state, never the first call; on a remote TPU also exclude the per-call
host/device transfer (bench.py chains K frames inside one jit with a
data dependency so iterations serialize on device).
"""
import time

import numpy as np
import halide_tpu as hl


def main():
    x, y = hl.Var("x"), hl.Var("y")
    img = hl.ImageParam(hl.Float(32), 2, "l22_in")
    f = hl.Func("l22_f")
    f[x, y] = hl.sqrt(img[x, y] * 2.0 + 1.0) + hl.sin(img[x, y])
    pipe = hl.Pipeline(f)

    rng = np.random.default_rng(22)
    img.set(rng.random((256, 256), np.float32))

    t0 = time.perf_counter()
    pipe.realize([256, 256])
    cold = time.perf_counter() - t0

    # warm calls hit the executable cache
    t0 = time.perf_counter()
    for _ in range(5):
        out = pipe.realize([256, 256])
    warm = (time.perf_counter() - t0) / 5
    assert warm < cold, (warm, cold)

    # new VALUES don't recompile...
    img.set(rng.random((256, 256), np.float32))
    t0 = time.perf_counter()
    pipe.realize([256, 256])
    revalue = time.perf_counter() - t0
    # ...but a new SHAPE is a new signature (recompile)
    img.set(rng.random((128, 128), np.float32))
    t0 = time.perf_counter()
    pipe.realize([128, 128])
    reshape = time.perf_counter() - t0
    print(f"lesson 22: cold {cold*1e3:.1f}ms warm {warm*1e3:.2f}ms "
          f"new-values {revalue*1e3:.2f}ms new-shape {reshape*1e3:.1f}ms")
    np.asarray(out.to_numpy())


if __name__ == "__main__":
    main()
