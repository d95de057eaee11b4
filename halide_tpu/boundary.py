"""Boundary conditions (reference: src/BoundaryConditions.h:95-156).

Each returns a new Func wrapping the source with the given edge behavior.
`repeat_edge` lowers to the clamp fast path (edge-pad + slice) in eval_jnp;
the modular ones currently take the gather path.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from .buffer import Buffer, ImageParam
from .expr import CompileError, to_expr
from .func import Func, Var
from .iroperator import clamp, select, logical_and

__all__ = ["repeat_edge", "constant_exterior", "repeat_image",
           "mirror_image", "mirror_interior"]


def _source_bounds(source, bounds):
    if bounds is not None:
        out = []
        for b in bounds:
            if b is None:
                out.append(None)
            else:
                mn, ex = b
                out.append((to_expr(mn), to_expr(ex)))
        return out
    if isinstance(source, (Buffer, ImageParam)):
        n = source.dimensions()
        out = []
        for i in range(n):
            d = source.dim(i)
            if callable(getattr(d, "min", None)):
                out.append((d.min(), d.extent()))
            else:
                out.append((to_expr(d.min), to_expr(d.extent)))
        return out
    raise CompileError(
        "boundary conditions on a Func need explicit bounds "
        "[(min, extent), ...]")


def _wrap(source, bounds, coord_fn, name):
    bounds = _source_bounds(source, bounds)
    if isinstance(source, Func) and source.defined():
        # unbounded trailing dims pass through (reference allows partial
        # bounds lists)
        bounds = bounds + [None] * (source.dimensions() - len(bounds))
    n = len(bounds)
    vs = [Var(f"_bc{i}") for i in range(n)]
    f = Func(name)
    coords = []
    conds = []
    for i, b in enumerate(bounds):
        if b is None:
            coords.append(vs[i])
        else:
            mn, ex = b
            c, cond = coord_fn(vs[i], mn, ex)
            coords.append(c)
            if cond is not None:
                conds.append(cond)
    val = source(*coords) if not isinstance(source, Func) else \
        source(*coords)._to_expr()
    if conds:
        f._bc_conds = conds
    f[tuple(vs)] = val
    return f, vs, bounds


def repeat_edge(source, bounds=None) -> Func:
    def fn(v, mn, ex):
        return clamp(v, mn, mn + ex - 1), None

    f, _, _ = _wrap(source, bounds, fn, "repeat_edge")
    return f


def constant_exterior(source, value, bounds=None) -> Func:
    bounds = _source_bounds(source, bounds)
    n = len(bounds)
    vs = [Var(f"_bc{i}") for i in range(n)]
    coords = []
    conds = []
    for i, b in enumerate(bounds):
        if b is None:
            coords.append(vs[i])
        else:
            mn, ex = b
            coords.append(clamp(vs[i], mn, mn + ex - 1))
            conds.append(logical_and(vs[i] >= mn, vs[i] < mn + ex))
    inner = source(*coords)
    if not isinstance(inner, type(to_expr(0))):
        inner = to_expr(inner)
    cond = conds[0]
    for c in conds[1:]:
        cond = logical_and(cond, c)
    f = Func("constant_exterior")
    f[tuple(vs)] = select(cond, inner, value)
    return f


def repeat_image(source, bounds=None) -> Func:
    def fn(v, mn, ex):
        # the clamp is a value-level no-op that keeps interval bounds tight
        # (select/mod bounds are conservative in the engine)
        return clamp(((v - mn) % ex) + mn, mn, mn + ex - 1), None

    f, _, _ = _wrap(source, bounds, fn, "repeat_image")
    return f


def mirror_image(source, bounds=None) -> Func:
    def fn(v, mn, ex):
        t = (v - mn) % (2 * ex)
        return clamp(mn + select(t < ex, t, 2 * ex - 1 - t),
                     mn, mn + ex - 1), None

    f, _, _ = _wrap(source, bounds, fn, "mirror_image")
    return f


def mirror_interior(source, bounds=None) -> Func:
    def fn(v, mn, ex):
        period = 2 * ex - 2
        t = (v - mn) % period
        return clamp(mn + select(t < ex, t, period - t),
                     mn, mn + ex - 1), None

    f, _, _ = _wrap(source, bounds, fn, "mirror_interior")
    return f
