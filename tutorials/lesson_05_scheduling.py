"""Lesson 5: scheduling — reorder/split/tile/vectorize/parallel and what
they mean on TPU (reference: lesson_05)."""
import numpy as np
import halide_tpu as hl


def main():
    x, y = hl.Var("x"), hl.Var("y")
    xo, yo, xi, yi = (hl.Var(n) for n in "xo yo xi yi".split())
    gradient = hl.Func("gradient_tiled")
    gradient[x, y] = x + y
    # tile -> Pallas grid; vectorize -> VPU lanes; parallel -> grid
    # partitioning (all semantics-preserving)
    gradient.tile(x, y, xo, yo, xi, yi, 64, 16).vectorize(xi).parallel(yo)
    out = gradient.realize([256, 128]).to_numpy()
    np.testing.assert_array_equal(
        out, np.add.outer(np.arange(128), np.arange(256)))
    print("lesson 05: tiled schedule matches")


if __name__ == "__main__":
    main()
