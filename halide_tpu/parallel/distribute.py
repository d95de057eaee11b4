"""Multi-chip distribution: the `distribute()` schedule dimension.

The reference is single-node (SURVEY.md §2.6 — no collectives of any kind);
this subsystem is the TPU-native extension: spatial sharding over a
jax.sharding.Mesh with automatic halo exchange riding ICI via ppermute,
exactly the "distributed schedule directive" planned in SURVEY.md §2.5.

v1: row sharding (`sharded_realize_rows`) — the consumer's y extent is split
across a mesh axis; each device realizes its slab after receiving `halo` rows
from each neighbor; global edges replicate (repeat_edge semantics). The halo
width must cover the pipeline's y footprint (bounds inference can supply it).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map  # type: ignore


def _exchange_rows(x, h: int, axis_name: str, n: int):
    """Return (top_halo, bottom_halo) for the local row shard x (rows, cols).
    Interior halos travel over ICI (ppermute ring); global edges replicate."""
    idx = jax.lax.axis_index(axis_name)
    # send my last h rows down; device i receives from i-1 (its previous)
    from_prev = jax.lax.ppermute(
        x[-h:], axis_name, [(i, (i + 1) % n) for i in range(n)])
    from_next = jax.lax.ppermute(
        x[:h], axis_name, [(i, (i - 1) % n) for i in range(n)])
    edge_top = jnp.broadcast_to(x[:1], (h,) + x.shape[1:])
    edge_bot = jnp.broadcast_to(x[-1:], (h,) + x.shape[1:])
    top = jnp.where(idx == 0, edge_top, from_prev)
    bot = jnp.where(idx == n - 1, edge_bot, from_next)
    return top, bot


def sharded_realize_rows(build_pipeline, width: int, height: int,
                         mesh: Mesh, axis_name: str, halo: int):
    """Distribute a same-size 2D pipeline across mesh[axis_name] by rows.

    build_pipeline(input_buffer) -> Pipeline: called per shard with a Buffer
    whose y-min is -halo (rows [-halo, shard+halo) are materialized locally).
    Returns a jitted fn(global_input_array[H, W]) -> global_output[H, W]
    with input/output sharded P(axis_name, None).
    """
    from ..buffer import Buffer

    n = mesh.shape[axis_name]
    if height % n != 0:
        raise ValueError(f"height {height} not divisible by mesh axis {n}")
    hs = height // n

    def local(x):
        top, bot = _exchange_rows(x, halo, axis_name, n)
        padded = jnp.concatenate([top, x, bot], axis=0)
        inp = Buffer(padded, name="shard_in").set_min(0, -halo)
        p = build_pipeline(inp)
        out = p.realize([width, hs], jit=False)
        data = out.data if hasattr(out, "data") else out[0].data
        return data

    f = shard_map(local, mesh=mesh,
                  in_specs=P(axis_name, None),
                  out_specs=P(axis_name, None))
    return jax.jit(f)


def _exchange(x, h_lo: int, h_hi: int, npax: int, axis_name: str, n: int):
    """Halo slabs along np axis `npax` for the local shard x: (top, bottom)
    with asymmetric widths. Interior halos ride ICI (ppermute ring); global
    edges replicate the boundary slab (repeat_edge semantics)."""
    idx = jax.lax.axis_index(axis_name)

    def take(lo, hi):
        sl = [slice(None)] * x.ndim
        sl[npax] = slice(lo, hi)
        return x[tuple(sl)]

    def bcast(sl1, h):
        shape = list(x.shape)
        shape[npax] = h
        return jnp.broadcast_to(sl1, shape)

    top = bot = None
    if h_lo:
        from_prev = jax.lax.ppermute(
            take(x.shape[npax] - h_lo, x.shape[npax]), axis_name,
            [(i, (i + 1) % n) for i in range(n)])
        top = jnp.where(idx == 0, bcast(take(0, 1), h_lo), from_prev)
    if h_hi:
        from_next = jax.lax.ppermute(
            take(0, h_hi), axis_name,
            [(i, (i - 1) % n) for i in range(n)])
        bot = jnp.where(idx == n - 1,
                        bcast(take(x.shape[npax] - 1, x.shape[npax]), h_hi),
                        from_next)
    return top, bot


def _input_footprints(pipeline, regions):
    """Required box of every graph input for the given output regions."""
    from ..bounds import BoundsEngine, Box
    from ..pipeline import _BoundsPass, gather_graph
    g = gather_graph(pipeline.outputs)
    realz = {}
    for t in g.inputs.values():
        buf = t.get() if hasattr(t, "get") else t
        realz[id(t)] = (buf._mins, buf.data.shape)

    def resolver(name, args):
        if name == "param":
            p = args[0]
            return p.get() if hasattr(p, "get") else None
        r = realz.get(id(args[0]))
        if r is None:
            return None
        mins, shape = r
        i = args[1]
        if name == "buffer_min":
            return mins[i]
        return shape[len(shape) - 1 - i]

    engine = BoundsEngine(resolver=resolver)
    bp = _BoundsPass(g, engine)
    bp.run(pipeline.outputs, {k: Box(list(v.dims))
                              for k, v in regions.items()})
    return g, {id(t): bp.boxes.get(id(t)) for t in g.inputs.values()}


def distributed_realize(pipeline, sizes, mesh: Mesh, axis_name: str,
                        dim: int):
    """Realize `pipeline` with output dim `dim` sharded across
    mesh[axis_name] (the distribute() schedule directive's engine).

    Inputs whose dim-`dim` footprint tracks the shard are sharded with
    bounds-inferred halos (exchanged over ICI via ppermute, global edges
    replicated); inputs whose footprint is shard-independent are
    replicated whole. Returns the global output array (numpy axis order),
    sharded P(axis_name) along the distributed dim."""
    from ..buffer import Buffer, ImageParam
    from ..bounds import Box, Interval
    from ..expr import CompileError

    n = int(mesh.shape[axis_name])
    out_f = pipeline.outputs[0]
    if len(pipeline.outputs) != 1:
        raise CompileError("distribute: single-output pipelines only (v2)")
    nd = out_f.dimensions()
    if isinstance(sizes, int):
        sizes = [sizes]
    H = int(sizes[dim])
    if H % n != 0:
        raise CompileError(
            f"distribute: extent {H} of dim {dim} not divisible by "
            f"mesh axis {axis_name}={n}")
    s = H // n

    # Halo inference: footprint-probe several shards and take per-side
    # maxima. No single shard is reliable — an edge shard's footprint is
    # truncated by boundary-condition clamps on its outward side (on a
    # 2-shard mesh EVERY shard is an edge shard), so the first shard
    # supplies the true high-side halo, the last shard the low-side halo,
    # and a middle shard (when one exists) both.
    full_box = Box([Interval(0, int(sz) - 1) for sz in sizes])
    probe_idx = sorted({0, n // 2, n - 1})
    g = None
    probes = []      # (shard_lo, {id(input): Box})
    for pi in probe_idx:
        lo = pi * s
        dims = list(full_box.dims)
        dims[dim] = Interval(lo, lo + s - 1)
        gi, fp = _input_footprints(pipeline, {id(out_f): Box(dims)})
        g = g or gi
        probes.append((lo, fp))
    _g2, fp_full = _input_footprints(pipeline, {id(out_f): full_box})

    plans = []       # per input: (obj, buf, sharded?, h_lo, h_hi, npax)
    for t in g.inputs.values():
        buf = t.get() if isinstance(t, ImageParam) else t
        bf = fp_full.get(id(t))
        ndt = buf.data.ndim
        boxes = [(lo, fp.get(id(t))) for lo, fp in probes]
        if bf is None or dim >= ndt or any(
                b is None or not b.bounded() for _lo, b in boxes):
            plans.append((t, buf, False, 0, 0, 0))
            continue
        lo_f, hi_f = int(bf.dims[dim].lo), int(bf.dims[dim].hi)
        # shard-independent footprint (LUTs, transposed reads): replicate
        if all(int(b.dims[dim].lo) == lo_f and int(b.dims[dim].hi) == hi_f
               for _lo, b in boxes):
            plans.append((t, buf, False, 0, 0, 0))
            continue
        h_lo = h_hi = 0
        for shard_lo, b in boxes:
            lo_s, hi_s = int(b.dims[dim].lo), int(b.dims[dim].hi)
            h_lo = max(h_lo, shard_lo - lo_s)
            h_hi = max(h_hi, hi_s - (shard_lo + s - 1))
        if h_lo > s or h_hi > s:
            raise CompileError(
                f"distribute: halo ({h_lo},{h_hi}) wider than the shard "
                f"extent {s} (exchange is single-hop); use fewer shards")
        npax = ndt - 1 - dim
        if buf.data.shape[npax] != H:
            raise CompileError(
                f"distribute: input {getattr(t, 'name', '?')} dim {dim} "
                f"extent {buf.data.shape[npax]} != output extent {H}")
        plans.append((t, buf, True, h_lo, h_hi, npax))

    # prepare the per-shard executor against local dummy bindings
    local_sizes = list(sizes)
    local_sizes[dim] = s
    saved = []
    try:
        for (t, buf, sharded, h_lo, h_hi, npax) in plans:
            if not (sharded and isinstance(t, ImageParam)):
                continue
            saved.append((t, buf))
            shape = list(buf.data.shape)
            shape[npax] = s + h_lo + h_hi
            mins = list(buf._mins)
            mins[dim] = -h_lo
            dummy = Buffer(jnp.zeros(tuple(shape), buf.data.dtype),
                           mins=tuple(mins), name=buf.name)
            t.set(dummy)
        fn, local_arrays, _r, presets = pipeline._prepare(
            local_sizes, jit=False)
    finally:
        for t, buf in saved:
            t.set(buf)

    order = list(g.inputs.values())
    in_specs = []
    for (t, buf, sharded, h_lo, h_hi, npax) in plans:
        spec = [None] * buf.data.ndim
        if sharded:
            spec[npax] = axis_name
        in_specs.append(P(*spec))

    def shard_fn(*global_shards):
        locals_ = []
        for x, (t, buf, sharded, h_lo, h_hi, npax) in zip(
                global_shards, plans):
            if sharded and (h_lo or h_hi):
                top, bot = _exchange(x, h_lo, h_hi, npax, axis_name, n)
                parts = [p for p in (top, x, bot) if p is not None]
                x = jnp.concatenate(parts, axis=npax)
            locals_.append(x)
        out = fn(tuple(locals_), presets)
        # run() returns per-output tuples of value arrays; v2 is
        # single-output single-value
        while isinstance(out, (tuple, list)):
            out = out[0]
        return out

    out_npax = nd - 1 - dim
    out_spec_l = [None] * nd
    out_spec_l[out_npax] = axis_name
    jf = jax.jit(shard_map(shard_fn, mesh=mesh,
                           in_specs=tuple(in_specs),
                           out_specs=P(*out_spec_l)))
    return jf(*[buf.data for (_t, buf, *_rest) in plans])
