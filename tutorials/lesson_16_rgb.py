"""Lesson 16: RGB images and memory layouts
(reference: tutorial/lesson_16_rgb_generate.cpp).

The reference contrasts planar vs interleaved channel layouts and
specializes loops for each. On TPU the physical minor axis should be the
one with extent >= the 128-lane register width, so PLANAR (x minor,
c outermost) is the right layout and `reorder` expresses the choice at
the schedule level; interleaved layouts come in/out via the host numpy
arrays without entering the hot loop.
"""
import numpy as np
import halide_tpu as hl


def main():
    x, y, c = hl.Var("x"), hl.Var("y"), hl.Var("c")
    rng = np.random.default_rng(16)
    img = rng.integers(0, 255, (3, 32, 48), np.uint8)     # planar [c,y,x]
    inp = hl.Buffer(img, name="l16_in")

    brighter = hl.Func("l16_brighter")
    brighter[x, y, c] = inp[x, y, c] + hl.u8(1)

    # planar realize: dims (x, y, c) -> numpy [c, y, x]; x is the minor
    # (lane) axis, c the outermost -- each channel plane is a VPU-friendly
    # 2-D array
    out = brighter.realize([48, 32, 3]).to_numpy()
    np.testing.assert_array_equal(out, img + 1)

    # reorder(c, x, y) asks for c innermost (the interleaved traversal);
    # on TPU this is accepted-but-advisory: XLA owns physical layout, and
    # a 3-extent minor axis would waste 125 of 128 lanes.
    inter = hl.Func("l16_inter")
    inter[x, y, c] = inp[x, y, c] + hl.u8(1)
    inter.reorder(c, x, y)
    out2 = inter.realize([48, 32, 3]).to_numpy()
    np.testing.assert_array_equal(out2, img + 1)

    # interleaved host data: convert at the boundary, not in the loop
    interleaved = np.moveaxis(img, 0, -1)                 # [y, x, c]
    planar_again = np.moveaxis(interleaved, -1, 0)
    np.testing.assert_array_equal(planar_again, img)
    print("lesson 16: RGB layouts OK")


if __name__ == "__main__":
    main()
