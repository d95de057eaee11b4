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


def test_distribute_directive_stencil():
    # f.distribute(y) + realize(mesh=...): bounds-inferred halos, ppermute
    # exchange, replicated global edges -- matches the single-device result
    import jax
    from jax.sharding import Mesh

    import halide_tpu as hl
    n = min(4, len(jax.devices()))
    if n < 2:
        pytest.skip("needs >=2 devices")
    W, H = 64, 8 * n
    rng = np.random.default_rng(3)
    img = rng.random((H, W)).astype(np.float32)

    def build():
        x, y = hl.Var("x"), hl.Var("y")
        inp = hl.ImageParam(hl.Float(32), 2, "dd_in")
        inp.set(img)
        cl = hl.repeat_edge(inp)
        bx = hl.Func("dd_bx")
        by = hl.Func("dd_by")
        bx[x, y] = (cl[x - 1, y] + cl[x, y] + cl[x + 1, y]) / 3.0
        by[x, y] = (bx[x, y - 1] + bx[x, y] + bx[x, y + 1]) / 3.0
        bx.compute_root()
        return by

    ref = np.asarray(hl.Pipeline(build()).realize([W, H]).to_numpy())

    by2 = build()
    y2 = by2._args[1]
    by2.distribute(y2, "shards")
    mesh = Mesh(np.array(jax.devices()[:n]), ("shards",))
    out = hl.Pipeline(by2).realize([W, H], mesh=mesh).to_numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)


def test_distribute_two_shards_forward_stencil():
    # regression: with a 2-shard mesh EVERY shard is an edge shard, so halo
    # inference must not probe shard 1 as "interior" (its high-side clamp
    # used to truncate h_hi to 0 and shard 0 never received its y+1 halo)
    import jax
    from jax.sharding import Mesh

    import halide_tpu as hl
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    W, H = 16, 8
    rng = np.random.default_rng(7)
    img = rng.random((H, W)).astype(np.float32)

    def build():
        x, y = hl.Var("x"), hl.Var("y")
        inp = hl.ImageParam(hl.Float(32), 2, "d2_in")
        inp.set(img)
        cl = hl.repeat_edge(inp)
        f = hl.Func("d2_out")
        # purely forward stencil: only a high-side (y+1, y+2) halo exists
        f[x, y] = cl[x, y + 1] * 2.0 + cl[x, y + 2]
        return f

    ref = np.asarray(hl.Pipeline(build()).realize([W, H]).to_numpy())
    f2 = build()
    f2.distribute(f2._args[1], "shards")
    mesh = Mesh(np.array(jax.devices()[:2]), ("shards",))
    out = hl.Pipeline(f2).realize([W, H], mesh=mesh).to_numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)


def test_distribute_replicates_shard_independent_inputs():
    # a LUT read with a shard-independent footprint must be replicated
    import jax
    from jax.sharding import Mesh

    import halide_tpu as hl
    n = min(4, len(jax.devices()))
    if n < 2:
        pytest.skip("needs >=2 devices")
    W, H = 32, 8 * n
    rng = np.random.default_rng(4)
    img = (rng.random((H, W)) * 255).astype(np.float32)
    lut = np.sqrt(np.arange(256, dtype=np.float32))

    def build():
        x, y = hl.Var("x"), hl.Var("y")
        inp = hl.ImageParam(hl.Float(32), 2, "dr_in")
        lutp = hl.ImageParam(hl.Float(32), 1, "dr_lut")
        inp.set(img)
        lutp.set(lut)
        cl = hl.repeat_edge(inp)
        f = hl.Func("dr_out")
        f[x, y] = lutp[hl.clamp(hl.i32(inp[x, y]), 0, 255)] \
            + cl[x, y - 1]
        return f

    ref = np.asarray(hl.Pipeline(build()).realize([W, H]).to_numpy())
    f2 = build()
    f2.distribute(f2._args[1], "shards")
    mesh = Mesh(np.array(jax.devices()[:n]), ("shards",))
    out = hl.Pipeline(f2).realize([W, H], mesh=mesh).to_numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)


def test_distribute_sharded_reduction_rowsum():
    # f.distribute(r.y): the RDom is sliced across shards, each device
    # reduces its input slab, partials combine with psum (SURVEY 2.6 (b))
    import jax
    from jax.sharding import Mesh

    import halide_tpu as hl
    n = min(4, len(jax.devices()))
    if n < 2:
        pytest.skip("needs >=2 devices")
    W, H = 32, 8 * n
    rng = np.random.default_rng(11)
    img = rng.integers(0, 100, (H, W)).astype(np.float32)

    x = hl.Var("x")
    inp = hl.ImageParam(hl.Float(32), 2, "rs_in")
    inp.set(img)
    r = hl.RDom(0, H, "rr")
    f = hl.Func("rs_out")
    f[x] = 0.0
    f[x] += inp[x, r.x]
    f.distribute(r.x, "shards")
    mesh = Mesh(np.array(jax.devices()[:n]), ("shards",))
    out = hl.Pipeline(f).realize([W], mesh=mesh).to_numpy()
    np.testing.assert_allclose(np.asarray(out), img.sum(axis=0), rtol=1e-6)


def test_distribute_sharded_histogram():
    # data-dependent scatter with a sharded reduction row-axis: each
    # device histograms its slab, psum merges -- bit-exact vs one device
    import jax
    from jax.sharding import Mesh

    import halide_tpu as hl
    n = min(4, len(jax.devices()))
    if n < 2:
        pytest.skip("needs >=2 devices")
    W, H, B = 32, 8 * n, 16
    rng = np.random.default_rng(12)
    img = rng.integers(0, B, (H, W)).astype(np.int32)

    def build():
        b = hl.Var("b")
        inp = hl.ImageParam(hl.Int(32), 2, "hg_in")
        inp.set(img)
        r = hl.RDom(0, W, 0, H, "hr")
        h = hl.Func("hg_out")
        h[b] = 0
        h[hl.clamp(inp[r.x, r.y], 0, B - 1)] += 1
        return h

    ref = np.asarray(hl.Pipeline(build()).realize([B]).to_numpy())
    h2 = build()
    rv = h2._defs[1].rdom.dims[1]      # hr$y
    h2.distribute(rv, "shards")
    mesh = Mesh(np.array(jax.devices()[:n]), ("shards",))
    out = hl.Pipeline(h2).realize([B], mesh=mesh).to_numpy()
    np.testing.assert_array_equal(np.asarray(out), ref)
    np.testing.assert_array_equal(
        ref, np.bincount(img.ravel(), minlength=B))


def test_distribute_sharded_max_reduction():
    import jax
    from jax.sharding import Mesh

    import halide_tpu as hl
    n = min(4, len(jax.devices()))
    if n < 2:
        pytest.skip("needs >=2 devices")
    W, H = 16, 4 * n
    rng = np.random.default_rng(13)
    img = rng.random((H, W)).astype(np.float32)

    x = hl.Var("x")
    inp = hl.ImageParam(hl.Float(32), 2, "mx_in")
    inp.set(img)
    r = hl.RDom(0, H, "mr")
    f = hl.Func("mx_out")
    f[x] = hl.Float(32).min_value()
    f[x] = hl.max(f[x], inp[x, r.x])
    f.distribute(r.x, "shards")
    mesh = Mesh(np.array(jax.devices()[:n]), ("shards",))
    out = hl.Pipeline(f).realize([W], mesh=mesh).to_numpy()
    np.testing.assert_allclose(np.asarray(out), img.max(axis=0), rtol=1e-6)


def test_distribute_multi_output():
    # two outputs sharing the distributed dim shard together
    import jax
    from jax.sharding import Mesh

    import halide_tpu as hl
    n = min(4, len(jax.devices()))
    if n < 2:
        pytest.skip("needs >=2 devices")
    W, H = 16, 8 * n
    rng = np.random.default_rng(14)
    img = rng.random((H, W)).astype(np.float32)

    def build():
        x, y = hl.Var("x"), hl.Var("y")
        inp = hl.ImageParam(hl.Float(32), 2, "mo_in")
        inp.set(img)
        cl = hl.repeat_edge(inp)
        f1 = hl.Func("mo_a")
        f2 = hl.Func("mo_b")
        f1[x, y] = (cl[x, y - 1] + cl[x, y + 1]) * 0.5
        f2[x, y] = cl[x, y] * 2.0
        return f1, f2

    f1r, f2r = build()
    pr = hl.Pipeline([f1r, f2r]).realize([W, H])
    ref1 = np.asarray(pr[0].to_numpy())
    ref2 = np.asarray(pr[1].to_numpy())

    f1, f2 = build()
    f1.distribute(f1._args[1], "shards")
    mesh = Mesh(np.array(jax.devices()[:n]), ("shards",))
    out = hl.Pipeline([f1, f2]).realize([W, H], mesh=mesh)
    np.testing.assert_allclose(np.asarray(out[0].to_numpy()), ref1,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1].to_numpy()), ref2,
                               rtol=1e-6)


def test_distribute_uneven_extent():
    # non-divisible extents: ceil-sized shards, repeat_edge input padding,
    # outputs cropped back -- the SPMD RoundUp tail. H=52 over 8 devices
    # means 7-row shards with a 4-row pad on the last one.
    import jax
    from jax.sharding import Mesh

    import halide_tpu as hl
    n = min(8, len(jax.devices()))
    if n < 2:
        pytest.skip("needs >=2 devices")
    W, H = 16, 7 * n - 4
    rng = np.random.default_rng(21)
    img = rng.random((H, W)).astype(np.float32)

    def build():
        x, y = hl.Var("x"), hl.Var("y")
        inp = hl.ImageParam(hl.Float(32), 2, "ue_in")
        inp.set(img)
        cl = hl.repeat_edge(inp)
        f = hl.Func("ue_out")
        f[x, y] = (cl[x, y - 1] + cl[x, y] + cl[x, y + 1]) / 3.0
        return f

    ref = np.asarray(hl.Pipeline(build()).realize([W, H]).to_numpy())
    f2 = build()
    f2.distribute(f2._args[1], "shards")
    mesh = Mesh(np.array(jax.devices()[:n]), ("shards",))
    out = hl.Pipeline(f2).realize([W, H], mesh=mesh).to_numpy()
    assert np.asarray(out).shape == (H, W)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)


def test_distribute_tuple_output():
    # tuple-valued output Func: each tuple member is a sharded global
    # array; realize(mesh=...) packages them as a Realization
    import jax
    from jax.sharding import Mesh

    import halide_tpu as hl
    n = min(4, len(jax.devices()))
    if n < 2:
        pytest.skip("needs >=2 devices")
    W, H = 16, 8 * n
    rng = np.random.default_rng(22)
    img = rng.random((H, W)).astype(np.float32)

    def build():
        x, y = hl.Var("x"), hl.Var("y")
        inp = hl.ImageParam(hl.Float(32), 2, "tp_in")
        inp.set(img)
        cl = hl.repeat_edge(inp)
        f = hl.Func("tp_out")
        f[x, y] = (cl[x, y - 1] + cl[x, y + 1], cl[x, y] * 3.0)
        return f

    pr = hl.Pipeline(build()).realize([W, H])
    ref0 = np.asarray(pr[0].to_numpy())
    ref1 = np.asarray(pr[1].to_numpy())

    f2 = build()
    f2.distribute(f2._args[1], "shards")
    mesh = Mesh(np.array(jax.devices()[:n]), ("shards",))
    out = hl.Pipeline(f2).realize([W, H], mesh=mesh)
    np.testing.assert_allclose(np.asarray(out[0].to_numpy()), ref0,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1].to_numpy()), ref1,
                               rtol=1e-6)


def test_distribute_uneven_tuple_combined():
    # both generalizations at once: 5 devices' worth of rows on a 4-shard
    # mesh... uneven AND tuple-valued
    import jax
    from jax.sharding import Mesh

    import halide_tpu as hl
    n = min(4, len(jax.devices()))
    if n < 2:
        pytest.skip("needs >=2 devices")
    W, H = 16, 4 * n + 3
    rng = np.random.default_rng(23)
    img = rng.random((H, W)).astype(np.float32)

    def build():
        x, y = hl.Var("x"), hl.Var("y")
        inp = hl.ImageParam(hl.Float(32), 2, "ut_in")
        inp.set(img)
        cl = hl.repeat_edge(inp)
        f = hl.Func("ut_out")
        f[x, y] = (cl[x, y + 1] - cl[x, y - 1], cl[x, y] + 1.0)
        return f

    pr = hl.Pipeline(build()).realize([W, H])
    ref0 = np.asarray(pr[0].to_numpy())
    ref1 = np.asarray(pr[1].to_numpy())
    f2 = build()
    f2.distribute(f2._args[1], "shards")
    mesh = Mesh(np.array(jax.devices()[:n]), ("shards",))
    out = hl.Pipeline(f2).realize([W, H], mesh=mesh)
    np.testing.assert_allclose(np.asarray(out[0].to_numpy()), ref0,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1].to_numpy()), ref1,
                               rtol=1e-6, atol=1e-6)


def test_distribute_rvar_uneven_extent():
    # VERDICT r4 #9 / SURVEY 2.6: a 10-row reduction on an 8-mesh --
    # ceil chunks (2/shard), pad iterations contribute the identity via
    # the sharded 0/1 mask input; bit-exact vs the serial reduction
    import jax
    from jax.sharding import Mesh

    import halide_tpu as hl
    n = min(8, len(jax.devices()))
    if n < 2:
        pytest.skip("needs >=2 devices")
    W, H = 32, 10
    assert H % n != 0
    rng = np.random.default_rng(21)
    img = rng.integers(0, 100, (H, W)).astype(np.float32)

    x = hl.Var("x")
    inp = hl.ImageParam(hl.Float(32), 2, "ru_in")
    inp.set(img)
    r = hl.RDom(0, H, "rru")
    f = hl.Func("ru_out")
    f[x] = 0.0
    f[x] += inp[x, r.x]
    f.distribute(r.x, "shards")
    mesh = Mesh(np.array(jax.devices()[:n]), ("shards",))
    out = hl.Pipeline(f).realize([W], mesh=mesh).to_numpy()
    np.testing.assert_allclose(np.asarray(out), img.sum(axis=0), rtol=1e-6)


def test_distribute_rvar_uneven_max():
    # min/max identities flow through the mask select too
    import jax
    from jax.sharding import Mesh

    import halide_tpu as hl
    n = min(8, len(jax.devices()))
    if n < 2:
        pytest.skip("needs >=2 devices")
    W, H = 16, 11
    rng = np.random.default_rng(22)
    img = rng.random((H, W)).astype(np.float32)

    x = hl.Var("x")
    inp = hl.ImageParam(hl.Float(32), 2, "rumx_in")
    inp.set(img)
    r = hl.RDom(0, H, "rmu")
    f = hl.Func("rumx_out")
    f[x] = hl.Float(32).min_value()
    f[x] = hl.max(f[x], inp[x, r.x])
    f.distribute(r.x, "shards")
    mesh = Mesh(np.array(jax.devices()[:n]), ("shards",))
    out = hl.Pipeline(f).realize([W], mesh=mesh).to_numpy()
    np.testing.assert_allclose(np.asarray(out), img.max(axis=0), rtol=1e-6)
