"""Lesson 29: multi-chip reductions — distribute(rvar) slices the
reduction domain across devices; partials combine with psum over ICI
(the SURVEY §2.6 plan; the reference is single-node)."""
import numpy as np

import halide_tpu as hl


def main():
    import jax
    n = min(4, len(jax.devices()))
    if n < 2:
        print("lesson 29: needs >=2 devices (virtual CPU mesh); skipped")
        return
    from jax.sharding import Mesh

    W, H, B = 32, 8 * n, 16
    rng = np.random.default_rng(0)
    img = rng.integers(0, B, (H, W)).astype(np.int32)

    b = hl.Var("b")
    inp = hl.ImageParam(hl.Int(32), 2, "l29_in")
    inp.set(img)
    r = hl.RDom(0, W, 0, H, "l29_r")
    hist = hl.Func("l29_hist")
    hist[b] = 0
    hist[hl.clamp(inp[r.x, r.y], 0, B - 1)] += 1
    # slice the ROW axis of the reduction across the mesh: each device
    # histograms its slab of the input, then partials psum over ICI
    hist.distribute(r.y, "shards")
    mesh = Mesh(np.array(jax.devices()[:n]), ("shards",))
    out = hl.Pipeline(hist).realize([B], mesh=mesh).to_numpy()
    np.testing.assert_array_equal(
        np.asarray(out), np.bincount(img.ravel(), minlength=B))
    print(f"lesson 29: distributed histogram over {n} devices matches")


if __name__ == "__main__":
    main()
