"""Autoscheduler (reference: src/autoschedulers/, plugins registered via
Pipeline::add_autoscheduler @ Pipeline.cpp:280).

"Mullapudi2016": greedy TPU scheduling — pick which stages materialize, tile
the outputs onto VMEM-friendly lane-aligned grids, and stage small-footprint
producers into the consumer's kernel (compute_at), sized by a VMEM cost
model. Wide/scatter stages stay at root where XLA owns fusion. Emits the
applied schedule as source, like the reference's AutoSchedulerResults.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

_REGISTRY = {}

_VMEM_BUDGET = 8 * 1024 * 1024


def register_autoscheduler(name: str, fn):
    _REGISTRY[name] = fn


def apply_autoscheduler(pipeline, target=None, params=None):
    params = params or {}
    name = params.get("name", "Mullapudi2016")
    if name not in _REGISTRY:
        from .expr import CompileError
        raise CompileError(
            f"unknown autoscheduler {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](pipeline, target, params)


def _estimate_extents(f):
    """Estimated extents per dim from set_estimates, else None."""
    est = {b.var: b for b in f._fschedule.estimates}
    out = []
    for v in f._args:
        b = est.get(v.name)
        if b is None or b.extent is None:
            return None
        from . import expr as E
        if isinstance(b.extent, E.IntImm):
            out.append(b.extent.value)
        else:
            return None
    return out


def _stencil_footprint(consumer, producer):
    """Max |offset| of producer accesses from the consumer's defs (affine
    constant part), or None if non-affine."""
    from . import expr as E
    from .visitors import walk
    worst = 0

    def fn(n):
        nonlocal worst
        if isinstance(n, E.Call) and n.target is producer:
            for a in n.args:
                c = _affine_const(a)
                if c is None:
                    worst = max(worst, 1 << 20)
                else:
                    worst = max(worst, abs(c))

    for d in consumer._defs:
        for v in d.values:
            walk(v, fn)
    return worst


def _affine_const(e):
    from . import expr as E
    if isinstance(e, E.Variable):
        return 0
    if isinstance(e, E.Binary) and e.op in ("add", "sub"):
        if isinstance(e.a, E.Variable) and isinstance(e.b, E.IntImm):
            return e.b.value if e.op == "add" else -e.b.value
        if isinstance(e.b, E.Variable) and isinstance(e.a, E.IntImm) \
                and e.op == "add":
            return e.a.value
    return None


def _greedy_tpu(pipeline, target, params):
    """Greedy grouping + tiling (the mullapudi2016 analog, re-derived for
    TPU: tiles sized to VMEM, lane dim aligned to 128, sublane to 8)."""
    from .func import Var
    from .pipeline import gather_graph

    g = gather_graph(pipeline.outputs)
    src: List[str] = []

    consumers: Dict[int, List] = {}
    for f in g.funcs:
        seen = set()
        from .visitors import walk as _walk
        from . import expr as E

        def fn(n, f=f):
            if isinstance(n, E.Call) and isinstance(n.target, type(f)) \
                    and id(n.target) != id(f):
                consumers.setdefault(id(n.target), []).append(f)

        for d in f._defs:
            for v in d.values:
                _walk(v, fn)

    for out in pipeline.outputs:
        if len(out._defs) != 1 or len(out._defs[0].values) != 1:
            continue
        if out._defs[0].schedule.splits:
            continue   # user already scheduled it
        ext = _estimate_extents(out)
        n = out.dimensions()
        if n < 2:
            continue
        x, y = out._args[0], out._args[1]
        itemsize = out.output_type(0).to_np().itemsize
        # lane-aligned tile sized so a few tiles of in+out fit VMEM
        tx = 256
        ty = 128
        if ext is not None:
            while tx > ext[0] and tx > 128:
                tx //= 2
            while ty > ext[1] and ty > 8:
                ty //= 2
        while tx * ty * itemsize * 6 > _VMEM_BUDGET and ty > 8:
            ty //= 2
        xo, yo, xi, yi = (Var(f"{v}_as") for v in ("xo", "yo", "xi", "yi"))
        out.tile(x, y, xo, yo, xi, yi, tx, ty)
        out.vectorize(xi)
        out.parallel(yo)
        src.append(f"{out.name}.tile({x.name}, {y.name}, xo, yo, xi, yi, "
                   f"{tx}, {ty}).vectorize(xi).parallel(yo)")

        # stage pure small-halo producers consumed only by this output
        for p in g.funcs:
            if p is out or len(p._defs) != 1 or len(p._defs[0].values) != 1:
                continue
            if p._fschedule.compute_level.defined():
                continue
            cons = consumers.get(id(p), [])
            if len(set(id(c) for c in cons)) != 1 or cons[0] is not out:
                continue
            names = {v.name for v in p._args}
            if x.name not in names or y.name not in names:
                continue
            halo = _stencil_footprint(out, p)
            if halo is None or halo > 8:
                continue
            p.compute_at(out, xo)
            src.append(f"{p.name}.compute_at({out.name}, xo)")

    # update-heavy funcs stay at root
    for f in g.funcs:
        if len(f._defs) > 1 and not f._fschedule.compute_level.defined():
            f.compute_root()
            src.append(f"{f.name}.compute_root()")
    return {"schedule_source": ";\n".join(src)}


register_autoscheduler("Mullapudi2016", _greedy_tpu)
register_autoscheduler("Adams2019", _greedy_tpu)     # alias until learned
register_autoscheduler("Anderson2021", _greedy_tpu)  # cost model lands
register_autoscheduler("Li2018", _greedy_tpu)
