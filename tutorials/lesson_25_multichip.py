"""Lesson 24: scaling out — row sharding with halo exchange over the mesh
(this replaces the reference's single-node async lesson with the TPU-native
distribution story)."""
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import halide_tpu as hl
    from halide_tpu.parallel import sharded_realize_rows

    n = max(1, min(4, len(jax.devices())))
    if len(jax.devices()) < 2:
        print("lesson 24: single device; see tests/test_distribute.py")
        return
    W, H = 64, 8 * n
    mesh = Mesh(np.array(jax.devices()[:n]), ("y",))

    def build(inp):
        x, y = hl.Var("x"), hl.Var("y")
        f = hl.Func("l24")
        f[x, y] = (inp[hl.clamp(x - 1, 0, W - 1), y]
                   + inp[hl.clamp(x + 1, 0, W - 1), y]
                   + inp[x, y - 1] + inp[x, y + 1]) / 4
        return hl.Pipeline(f)

    fn = sharded_realize_rows(build, W, H, mesh, "y", halo=1)
    img = np.random.default_rng(0).random((H, W)).astype(np.float32)
    out = fn(jax.device_put(jnp.asarray(img),
                            NamedSharding(mesh, P("y", None))))
    print("lesson 24: sharded realize ->", np.asarray(out).shape)


if __name__ == "__main__":
    main()
