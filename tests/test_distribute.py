"""Multi-chip sharding on the virtual 8-device CPU mesh: row-sharded pipeline
with halo exchange must match the single-device result exactly."""
import numpy as np
import pytest


def test_sharded_rows_matches_single_device():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import halide_tpu as hl
    from halide_tpu.parallel import sharded_realize_rows

    n = min(8, len(jax.devices()))
    if n < 2:
        pytest.skip("needs multiple devices")
    W, Hs = 32, 4
    H = Hs * n
    mesh = Mesh(np.array(jax.devices()[:n]), ("y",))

    def build(inp):
        x, y = hl.Var("x"), hl.Var("y")
        cl = hl.Func("cl")
        cl[x, y] = inp[hl.clamp(x, 0, W - 1), y]
        bx, by = hl.Func("bx"), hl.Func("by")
        bx[x, y] = (cl[x - 1, y] + cl[x, y] + cl[x + 1, y]) / 3
        by[x, y] = (bx[x, y - 1] + bx[x, y] + bx[x, y + 1]) / 3
        return hl.Pipeline(by)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 1 << 12, size=(H, W), dtype=np.uint16)

    fn = sharded_realize_rows(build, W, H, mesh, "y", halo=1)
    sharded = jax.device_put(jnp.asarray(img),
                             NamedSharding(mesh, P("y", None)))
    out = np.asarray(fn(sharded))

    # single-device reference via the same front-end with repeat_edge in y
    x, y = hl.Var("x"), hl.Var("y")
    buf = hl.Buffer(img)
    cl = hl.repeat_edge(buf)
    bx, by = hl.Func("bx1"), hl.Func("by1")
    bx[x, y] = (cl[x - 1, y] + cl[x, y] + cl[x + 1, y]) / 3
    by[x, y] = (bx[x, y - 1] + bx[x, y] + bx[x, y + 1]) / 3
    ref = by.realize([W, H]).to_numpy()
    np.testing.assert_array_equal(out, ref)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(4)
