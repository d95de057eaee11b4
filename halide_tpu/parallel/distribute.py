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
