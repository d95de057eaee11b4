"""Lesson 11: targets and feature flags — the cross-compilation analog
(reference: tutorial/lesson_11_cross_compilation.cpp).

The reference compiles object files for foreign architectures. Here the
architecture axis is owned by XLA (one StableHLO module serves any
backend), so the Target carries FEATURES that change lowering/behavior
instead: `no_pallas` (force the fused-XLA path), `interpret` (run Pallas
kernels in interpret mode), `trace_all`, `profile`. Targets parse from
strings exactly like the reference's `host-feature1-feature2`, and
HL_JIT_TARGET in the environment overrides the default.
"""
import numpy as np
import halide_tpu as hl
from halide_tpu.target import Target, get_host_target


def main():
    host = get_host_target()
    print("host target:", host)

    t = Target("host-no_pallas-trace_all")
    assert t.has_feature("no_pallas") and t.has_feature("trace_all")
    assert not t.has_feature("profile")

    # the same pipeline realized under different targets
    x, y = hl.Var("x"), hl.Var("y")
    xo, yo, xi, yi = (hl.Var(n) for n in "xo yo xi yi".split())
    f = hl.Func("l11_f")
    g = hl.Func("l11_g")
    f[x, y] = x * 3 + y
    g[x, y] = f[x, y] + 1
    g.tile(x, y, xo, yo, xi, yi, 32, 16)
    f.compute_at(g, xo)

    want = (np.arange(96)[None, :] * 3 + np.arange(48)[:, None]) + 1

    # default: the tiled group may lower to a Pallas kernel
    out_default = g.realize([96, 48]).to_numpy()
    np.testing.assert_array_equal(out_default, want)

    # no_pallas: identical VALUES through the plain fused-XLA path --
    # features change lowering, never semantics
    out_xla = g.realize([96, 48],
                        target=Target("host-no_pallas")).to_numpy()
    np.testing.assert_array_equal(out_xla, want)
    print("lesson 11: feature-gated lowerings agree")


if __name__ == "__main__":
    main()
