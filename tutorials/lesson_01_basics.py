"""Lesson 1: Funcs, Vars, Exprs, realize (reference: tutorial/lesson_01)."""
import numpy as np
import halide_tpu as hl


def main():
    x, y = hl.Var("x"), hl.Var("y")
    gradient = hl.Func("gradient")
    gradient[x, y] = x + y                      # the algorithm
    out = gradient.realize([800, 600])          # jit-compile + run
    assert out.at(10, 20) == 30
    print("lesson 01: gradient(10,20) =", out.at(10, 20))


if __name__ == "__main__":
    main()
