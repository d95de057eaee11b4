"""Pipeline: lowering driver + JIT execution.

The analog of the reference's Pipeline/realize/compile_jit path
(reference: src/Pipeline.cpp:512-1024, src/Lower.cpp:136-608). Lowering here is:

1. gather the func graph (reference: RealizationOrder.cpp / FindCalls.cpp)
2. pick materialized vs inlined stages from the schedules
3. required-region inference outside-in (reference: BoundsInference.cpp —
   Appendix A #1 "pull" semantics), with self-read/write fixpoint for updates
4. evaluate each materialized stage as a jnp array program (eval_jnp/updates)
5. jit + cache the whole thing (reference: Pipeline.cpp:554 same-compile reuse)

XLA then fuses inline stages into consumers exactly where the reference's
inlining would, and the scheduled Pallas path (lower_pallas.py) takes over for
fused stencil groups.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import expr as E
from .bounds import BoundsEngine, Box, Interval
from .buffer import Buffer, ImageParam, Param, Realization
from .eval_jnp import Axis, Ctx, Realized, eval_array
from .expr import CompileError, Expr
from .func import Func
from .rdom import RDom
from .updates import apply_update
from .visitors import walk

__all__ = ["Pipeline"]


class _Graph:
    def __init__(self):
        self.funcs: List[Func] = []          # topo order, producers first
        self.materialized: Dict[int, Func] = {}
        self.inputs: Dict[int, object] = {}  # ImageParam/Buffer by id
        self.params: Dict[int, Param] = {}
        self.deps: Dict[int, set] = {}


def _all_def_exprs(f: Func):
    for d in f._defs:
        for v in d.values:
            yield v
        for a in d.args:
            if isinstance(a, Expr):
                yield a
        for p in d.predicates:
            yield p
        if d.rdom is not None:
            for rv in d.rdom.dims:
                if rv.rmin is not None:
                    yield rv.rmin
                if rv.rextent is not None:
                    yield rv.rextent
    # specialization conditions reference params/input dims that must enter
    # the jit key (they select the compiled variant)
    for s in getattr(f, "_specializations", ()):
        yield s.condition


def _scan_expr_targets(e: Expr, on_func, on_input, on_param):
    def fn(n):
        if isinstance(n, E.Call):
            t = n.target
            if isinstance(t, Func):
                on_func(t)
            else:
                on_input(t)
        elif isinstance(n, E.Intrin):
            if n.name == "param":
                on_param(n.args[0])
            elif n.name in ("buffer_min", "buffer_extent"):
                on_input(n.args[0])
            elif n.name in ("sum", ):
                pass
        elif isinstance(n, E.Reduce):
            rd = n.rdom
            for rv in rd.dims:
                for b in (rv.rmin, rv.rextent):
                    if b is not None:
                        walk(b, fn)
            for p in rd.predicates:
                walk(p, fn)

    walk(e, fn)


def gather_graph(outputs: List[Func]) -> _Graph:
    g = _Graph()
    seen: Dict[int, Func] = {}
    order: List[Func] = []
    visiting: set = set()

    def want_materialize(f: Func) -> bool:
        if f.is_extern():
            return True
        lvl = f._fschedule.compute_level
        if lvl.is_inlined():
            if len(f._defs) > 1:
                raise CompileError(
                    f"Func {f.name} with update definitions cannot be inlined")
            return False
        if lvl.is_root() or lvl.kind == "at":
            return True
        # defaults: inline pure single-value defs; materialize the rest
        if len(f._defs) > 1:
            return True
        if len(f._defs[0].values) > 1:
            return True
        if f._fschedule.memoized:
            return True
        if getattr(f, "_specializations", None):
            return True
        if any(d.schedule.fused_with for d in f._defs):
            return True   # compute_with members share one materialization
        return False

    def visit(f: Func):
        if id(f) in seen:
            return
        if id(f) in visiting:
            raise CompileError(f"cyclic func graph at {f.name}")
        if not f.defined():
            raise CompileError(f"Func {f.name} is used before it is defined")
        visiting.add(id(f))
        if f.is_extern():
            for src in f._extern["inputs"]:
                if isinstance(src, Func):
                    visit(src)
                else:
                    g.inputs.setdefault(id(src), src)
        for e in _all_def_exprs(f):
            _scan_expr_targets(
                e,
                on_func=lambda t: t is not f and visit(t),
                on_input=lambda t: g.inputs.setdefault(id(t), t),
                on_param=lambda p: g.params.setdefault(id(p), p),
            )
        visiting.discard(id(f))
        seen[id(f)] = f
        order.append(f)

    for f in outputs:
        visit(f)
    g.funcs = order
    for f in order:
        from .func import Func as _F
        if f in outputs or want_materialize(f):
            g.materialized[id(f)] = f
    return g


def _fusion_cliques(g: _Graph) -> Dict[int, List[Func]]:
    """compute_with cliques among materialized funcs: id(member) -> clique
    (funcs in dependency order). Members must be mutually independent
    (reference: Func::compute_with legality, src/ScheduleFunctions.cpp)."""
    parent: Dict[int, int] = {}

    def find(a):
        while parent.get(a, a) != a:
            parent[a] = parent.get(parent[a], parent[a])
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    by_id = {id(f): f for f in g.funcs}
    any_fused = False
    for f in g.funcs:
        for d in f._defs:
            for (other, _var, *_align) in d.schedule.fused_with:
                of = other[0] if isinstance(other, tuple) else other
                if id(of) in by_id and id(f) in g.materialized \
                        and id(of) in g.materialized \
                        and not f.is_extern() and not of.is_extern():
                    union(id(f), id(of))
                    any_fused = True
    if not any_fused:
        return {}
    groups: Dict[int, List[Func]] = {}
    for f in g.funcs:
        if id(f) not in g.materialized:
            continue
        groups.setdefault(find(id(f)), []).append(f)
    out: Dict[int, List[Func]] = {}
    for clique in groups.values():
        if len(clique) < 2:
            continue
        ids = {id(m) for m in clique}
        for m in clique:
            for e in _all_def_exprs(m):
                def check(n):
                    if isinstance(n, E.Call) and id(n.target) in ids \
                            and n.target is not m:
                        raise CompileError(
                            f"compute_with: {m.name} reads "
                            f"{n.target.name}; fused stages must be "
                            f"independent")
                walk(e, check)
        for m in clique:
            out[id(m)] = clique
    return out


def _multi_read_ids(g: _Graph) -> set:
    """ids of funcs read from more than one call site anywhere in the graph
    (their materializations get fusion barriers; single-read producers stay
    fusable)."""
    counts: Dict[int, int] = {}

    def on_call(n):
        if isinstance(n, E.Call) and isinstance(n.target, Func):
            counts[id(n.target)] = counts.get(id(n.target), 0) + 1

    for f in g.funcs:
        for e in _all_def_exprs(f):
            walk(e, on_call)
    return {fid for fid, c in counts.items() if c > 1}


# ---------------------------------------------------------------------------
# bounds inference
# ---------------------------------------------------------------------------

# Largest per-dim extent bounds inference will size a required region to.
# A data-dependent index whose only bound is its TYPE range (e.g.
# i32(float_input[x]) -- bounds.py Cast falls back to [t.min, t.max]) is
# "bounded" but never realizable: the reference errors with "accessed over
# an unreasonably large range" (src/BoundsInference.cpp constant-bound
# check) instead of allocating. The threshold matches the reference's
# 2^31-element allocation guard (src/BoundSmallAllocations.cpp) so a
# legitimate large-but-realizable axis (e.g. a 10^8-element 1-D func,
# ~400 MB f32 in HBM) still compiles; _too_big_region below additionally
# caps the PRODUCT of extents at the same 2^31 elements, which is what
# catches multi-dim type-range footprints.
_MAX_REGION_EXTENT = 1 << 31


def _unreasonable(iv) -> bool:
    return (iv.hi - iv.lo + 1) > _MAX_REGION_EXTENT


def _too_big_region(box) -> bool:
    total = 1
    for iv in box.dims:
        total *= max(iv.hi - iv.lo + 1, 1)
        if total > _MAX_REGION_EXTENT:
            return True
    return False


class _BoundsPass:
    def __init__(self, g: _Graph, engine: BoundsEngine):
        self.g = g
        self.engine = engine
        self.boxes: Dict[int, Box] = {}
        self._inline_memo: Dict[Tuple, bool] = {}

    def input_box(self, t) -> Box:
        return self.boxes.setdefault(
            id(t), Box.empty(t.dimensions()))

    def run(self, outputs: List[Func], out_regions: Dict[int, Box]):
        for f in outputs:
            self.boxes[id(f)] = out_regions[id(f)]
        # consumers first
        for f in reversed(self.g.funcs):
            if id(f) not in self.g.materialized:
                continue
            box = self.boxes.get(id(f))
            if box is None or not box.defined():
                # materialized but unused (e.g. wrapper target) — skip
                continue
            self._self_fixpoint(f, box)
            if _too_big_region(box):
                raise CompileError(
                    f"required region of {f.name} exceeds "
                    f"{_MAX_REGION_EXTENT} total elements (accessed over an "
                    "unreasonably large range); add clamp() or bound()")
            self._footprints(f, box)

    def _def_scope(self, f: Func, d, box: Box) -> Dict[str, Interval]:
        scope: Dict[str, Interval] = {}
        for i, v in enumerate(f._args):
            scope[v.name] = box.dims[i]
        if d.rdom is not None:
            for rv in d.rdom.dims:
                mn = self.engine.bounds(rv.rmin, scope)
                ex = self.engine.bounds(rv.rextent, scope)
                scope[rv.name] = Interval(mn.lo, mn.hi + ex.hi - 1)
        return scope

    def _self_fixpoint(self, f: Func, box: Box):
        """Grow box[f] to cover its own updates' reads and writes."""
        if f.is_extern():
            return
        for _ in range(16):
            changed = False
            for d in f._defs[1:]:
                scope = self._def_scope(f, d, box)
                # write bounds
                for i, a in enumerate(d.args):
                    iv = self.engine.bounds(a, scope)
                    if not iv.is_bounded():
                        raise CompileError(
                            f"{f.name}: cannot bound update write on dim {i}: "
                            f"{a!r}")
                    old = box.dims[i]
                    box.union_dim(i, iv)
                    if box.dims[i] != old:
                        changed = True
                # self-read bounds
                for e in list(d.values) + list(d.predicates):
                    for call in _find_calls_to(e, f):
                        for i, a in enumerate(call.args):
                            iv = self.engine.bounds(a, scope)
                            if not iv.is_bounded():
                                raise CompileError(
                                    f"{f.name}: unbounded self-read dim {i}")
                            old = box.dims[i]
                            box.union_dim(i, iv)
                            if box.dims[i] != old:
                                changed = True
            if not changed:
                return
        raise CompileError(f"{f.name}: self-bounds did not converge")

    def _footprints(self, f: Func, box: Box):
        if f.is_extern():
            # double bounds-query protocol (reference:
            # BoundsInference.cpp:452-506): first let the stage round UP the
            # output region it will actually produce, then size the inputs
            # from that rounded region
            bq = f._extern.get("bounds_query")
            if bq is not None:
                grown = bq(Box(list(box.dims)))
                box.union(grown)
            fp = f._extern["footprint"]
            in_boxes = fp(Box(list(box.dims))) if fp is not None else [
                Box(list(box.dims)) for _ in f._extern["inputs"]]
            for src, b2 in zip(f._extern["inputs"], in_boxes):
                dst = self.boxes.setdefault(
                    id(src), Box.empty(src.dimensions()))
                dst.union(b2)
            return
        for d in f._defs:
            scope = self._def_scope(f, d, box)
            exprs = list(d.values) + list(d.predicates) + [
                a for a in d.args if not isinstance(a, E.Variable)]
            for e in exprs:
                self._visit(e, scope, skip_self=f)

    def _visit(self, e: Expr, scope: Dict[str, Interval], skip_self=None):
        if isinstance(e, E.Call):
            for a in e.args:
                self._visit(a, scope, skip_self)
            t = e.target
            if isinstance(t, Func) and t is skip_self:
                return
            ivs = [self.engine.bounds(a, scope) for a in e.args]
            if isinstance(t, Func):
                if id(t) in self.g.materialized:
                    box = self.boxes.setdefault(
                        id(t), Box.empty(t.dimensions()))
                    for i, iv in enumerate(ivs):
                        if not iv.is_bounded() or _unreasonable(iv):
                            raise CompileError(
                                f"cannot bound required region of {t.name} "
                                f"dim {i} (accessed from an unbounded index"
                                " or over an unreasonably large range); "
                                "add clamp() or bound()")
                        box.union_dim(i, iv)
                else:
                    child = {v.name: iv
                             for v, iv in zip(t.args(), ivs)}
                    self._visit(t._defs[0].values[e.value_index], child,
                                skip_self=None)
            else:
                box = self.input_box(t)
                for i, iv in enumerate(ivs):
                    if not iv.is_bounded() or _unreasonable(iv):
                        raise CompileError(
                            f"cannot bound read of input "
                            f"{getattr(t, 'name', '?')} dim {i}; add clamp()")
                    box.union_dim(i, iv)
            return
        if isinstance(e, E.Let):
            self._visit(e.value, scope, skip_self)
            child = dict(scope)
            child[e.name] = self.engine.bounds(e.value, scope)
            self._visit(e.body, child, skip_self)
            return
        if isinstance(e, E.Reduce):
            child = dict(scope)
            for rv in e.rdom.dims:
                mn = self.engine.bounds(rv.rmin, scope)
                ex = self.engine.bounds(rv.rextent, scope)
                child[rv.name] = Interval(mn.lo, mn.hi + ex.hi - 1)
            self._visit(e.value, child, skip_self)
            if e.where is not None:
                self._visit(e.where, child, skip_self)
            for p in e.rdom.predicates:
                self._visit(p, child, skip_self)
            return
        for c in e.children():
            self._visit(c, scope, skip_self)


def _find_calls_to(e: Expr, f: Func):
    out = []

    def fn(n):
        if isinstance(n, E.Call) and n.target is f:
            out.append(n)

    walk(e, fn)
    return out


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------

class Pipeline:
    def __init__(self, outputs):
        if isinstance(outputs, Func):
            outputs = [outputs]
        self.outputs: List[Func] = list(outputs)
        self._jit_cache: Dict = {}
        self.trace = None

    # -- graph signature for the compile cache ---------------------------
    def _signature(self, g: _Graph) -> Tuple:
        sig = []
        for f in g.funcs:
            fs = f._fschedule
            sig.append((
                id(f), len(f._defs),
                fs.compute_level.kind,
                id(fs.compute_level.func) if fs.compute_level.func else 0,
                tuple((d.schedule and len(d.schedule.splits)) or 0
                      for d in f._defs),
                tuple(tuple((dm.var, dm.for_type.value)
                            for dm in d.schedule.dims) for d in f._defs),
                fs.memoized, fs.is_async, fs.ring_buffer_extent,
                tuple((b.var, repr(b.min), repr(b.extent))
                      for b in fs.bounds),
            ))
        return tuple(sig)

    # -- region helpers ---------------------------------------------------
    def _out_regions(self, sizes, dst=None) -> Dict[int, Box]:
        regions: Dict[int, Box] = {}
        if dst is not None:
            bufs = dst if isinstance(dst, (list, tuple)) else [dst]
            bi = 0
            for f in self.outputs:
                n = f.dimensions()
                b = bufs[bi]
                bi += 1
                box = Box([Interval(b.dim(i).min, b.dim(i).max())
                           for i in range(n)])
                regions[id(f)] = box
            return regions
        if sizes is None:
            raise CompileError("realize() needs sizes or a destination buffer")
        if isinstance(sizes, int):
            sizes = [sizes]
        for f in self.outputs:
            n = f.dimensions()
            if len(sizes) != n:
                raise CompileError(
                    f"realize: {f.name} has {n} dims, got {len(sizes)} sizes")
            box = Box([Interval(0, int(s) - 1) for s in sizes])
            # apply explicit bound() constraints
            for b in f._fschedule.bounds:
                if b.min is not None and b.extent is not None:
                    for i, v in enumerate(f._args):
                        if v.name == b.var:
                            mn = _static_expr_int(b.min)
                            ex = _static_expr_int(b.extent)
                            req = box.dims[i]
                            if req.lo < mn or req.hi > mn + ex - 1:
                                raise CompileError(
                                    f"{f.name}: realized region "
                                    f"{req} exceeds bound({b.var}, {mn}, {ex})")
            regions[id(f)] = box
        return regions

    # -- main entry --------------------------------------------------------
    def _prepare(self, sizes=None, dst=None, jit: bool = True):
        """Compile (or fetch from cache) the jitted executor for the current
        graph + sizes + bound inputs. Returns (fn, input_arrays, regions)."""
        g = gather_graph(self.outputs)
        regions = self._out_regions(sizes, dst)
        input_arrays = []
        input_objs = []
        for t in g.inputs.values():
            if isinstance(t, ImageParam):
                buf = t.get()
            elif isinstance(t, Buffer):
                buf = t
            else:
                raise CompileError(f"unbound input {t!r}")
            input_objs.append((t, buf))
            input_arrays.append(buf.data)
        param_vals = tuple(
            (id(p), p.get()) for p in g.params.values())
        key = (self._signature(g),
               tuple(tuple(b.dims[i].lo for i in range(len(b.dims)))
                     + tuple(b.dims[i].hi for i in range(len(b.dims)))
                     for b in regions.values()),
               tuple((a.shape, str(a.dtype)) for a in input_arrays),
               tuple((buf._mins) for (_, buf) in input_objs),
               param_vals,
               id(self.trace) if self.trace is not None else 0,
               tuple((f._fschedule.trace_stores,
                      f._fschedule.trace_realizations)
                     for f in g.funcs))
        # memoized stages precompute outside jit through the host LRU cache
        # (reference: src/Memoization.cpp + runtime/cache.cpp)
        self._last_regions = regions
        presets = self._memo_precompute(g, input_objs, dict(param_vals))
        preset_meta = tuple(
            (fid, mins, tuple((a.shape, str(a.dtype)) for a in arrs))
            for fid, (mins, arrs) in presets.items())
        key = key + (preset_meta,)
        preset_args = tuple(a for (_m, arrs) in presets.values()
                            for a in arrs)
        fn = self._jit_cache.get(key)
        if fn is None:
            run = self._build_fn(g, regions, input_objs, dict(param_vals),
                                 presets)
            if any(getattr(f, "_specializations", None) for f in g.funcs):
                # specialization ladders: the key above pins every param
                # value and input shape, so one compile = one branch of each
                # ladder (reference: src/Func.h:1770-1842). Conditions are
                # resolved HERE (outside any trace); the lowering happens
                # when `run` traces, so the chosen variants' directives are
                # applied around each invocation (idempotent; under jit this
                # is trace time only).
                from .specialize import apply_all as _spec_apply
                from .specialize import restore as _spec_restore
                from .specialize import select as _spec_select
                cond_realz = {
                    id(t): Realized((buf.data,), buf._mins,
                                    getattr(t, "name", "buf"))
                    for (t, buf) in input_objs}
                chosen = _spec_select(g, cond_realz, dict(param_vals))
                inner_run = run

                def run(inp_arrays, preset_arrays=(), param_arrays=()):
                    undo = _spec_apply(chosen)
                    try:
                        return inner_run(inp_arrays, preset_arrays,
                                         param_arrays)
                    finally:
                        _spec_restore(undo)
            fn = jax.jit(run) if jit else run
            self._jit_cache[key] = fn
        return fn, input_arrays, regions, preset_args

    def _memo_precompute(self, g: _Graph, input_objs, param_vals):
        memo_funcs = [f for f in g.funcs
                      if id(f) in g.materialized
                      and f._fschedule.memoized
                      and f not in self.outputs]
        if not memo_funcs:
            return {}
        # host-side bounds pass to size the memoized stages
        lookup = {id(t): buf for (t, buf) in input_objs}

        def resolver(name, args):
            if name == "param":
                return param_vals.get(id(args[0]))
            obj, i = args[0], args[1]
            buf = lookup.get(id(obj))
            if buf is None:
                return None
            return buf.dim(i).min if name == "buffer_min" \
                else buf.dim(i).extent
        engine = BoundsEngine(resolver=resolver)
        bp = _BoundsPass(g, engine)
        return self._memo_boxes_and_values(g, bp, param_vals, lookup,
                                           memo_funcs)

    def _memo_boxes_and_values(self, g, bp, param_vals, lookup, memo_funcs):
        # boxes come from the most recent realize regions; compute them on
        # demand using the last-requested regions stored by _prepare
        regions = getattr(self, "_last_regions", None)
        if regions is None:
            return {}
        out_regions = {k: Box(list(v.dims)) for k, v in regions.items()}
        bp.run(self.outputs, out_regions)
        import hashlib
        from .buffer import Buffer as _Buffer
        from .runtime import memo_cache
        cache = memo_cache()
        presets = {}
        for f in memo_funcs:
            box = bp.boxes.get(id(f))
            if box is None or not box.bounded():
                continue
            sub = Pipeline(f)
            sub_g = gather_graph([f])
            h = hashlib.sha1()
            h.update(repr(self._signature(sub_g)).encode())
            h.update(repr((box.mins(), box.extents())).encode())
            h.update(repr(sorted(
                (p.name, repr(v)) for p, v in
                [(pp, param_vals.get(id(pp))) for pp in
                 sub_g.params.values()])).encode())
            for t in sub_g.inputs.values():
                buf = lookup.get(id(t))
                if buf is None:
                    continue
                arr = np.asarray(buf.data)
                h.update(str(arr.shape).encode())
                h.update(str(arr.dtype).encode())
                if arr.nbytes <= (8 << 20):
                    h.update(arr.tobytes())
                else:
                    h.update(str(id(buf)).encode())
            key = h.digest()
            types = f.output_types()
            hit = cache.lookup(key)
            if hit is not None:
                arrs = []
                off = 0
                for t in types:
                    nbytes = int(np.prod(box.extents())) * t.to_np().itemsize
                    a = np.frombuffer(hit[off:off + nbytes],
                                      dtype=t.to_np()).reshape(
                        tuple(reversed(box.extents())))
                    arrs.append(jnp.asarray(a))
                    off += nbytes
                presets[id(f)] = (box.mins(), arrs)
                continue
            dsts = [
                _Buffer(type=t, sizes=box.extents(), mins=box.mins())
                for t in types]
            sub.realize(dst=dsts if len(dsts) > 1 else dsts[0])
            arrs = [d.data for d in dsts]
            blob = b"".join(np.asarray(a).tobytes() for a in arrs)
            cache.store(key, blob)
            presets[id(f)] = (box.mins(), [jnp.asarray(a) for a in arrs])
        return presets

    def realize(self, sizes=None, target=None, dst=None, jit: bool = True,
                device=None, mesh=None, custom_print=None,
                custom_error=None):
        """custom_print / custom_error: PER-CALL handler overrides --
        installed for this realization only and restored on exit (the
        reference's JITUserContext handler table,
        src/runtime/HalideRuntime.h:178-196, installed per call at
        Pipeline.cpp:818)."""
        if custom_print is not None or custom_error is not None:
            from . import hooks
            prev_p = hooks.set_custom_print(custom_print) \
                if custom_print is not None else None
            prev_e = hooks.set_error_handler(custom_error) \
                if custom_error is not None else None
            try:
                return self.realize(sizes, target, dst, jit, device, mesh)
            finally:
                if custom_print is not None:
                    hooks.set_custom_print(prev_p)
                if custom_error is not None:
                    hooks.set_error_handler(prev_e)
        from .target import Target, get_jit_target_from_environment
        if target is None:
            target = get_jit_target_from_environment()
        elif isinstance(target, str):
            target = Target(target)
        # distribute() directive + a mesh: shard across chips with
        # bounds-inferred halo exchange, or -- when the named var is a
        # reduction var -- local partials + a psum-family collective
        # (parallel/distribute.py)
        dist = self.outputs[0]._fschedule.distributed
        if mesh is not None and dist is not None:
            from .buffer import Buffer
            from .parallel.distribute import distributed_realize
            var_name, axis_name = dist
            datas = distributed_realize(self, sizes, mesh, axis_name,
                                        var_name)
            bufs = []
            for f, d in zip(self.outputs, datas):
                if isinstance(d, tuple):   # tuple-valued Func
                    bufs.append(Realization(
                        [Buffer(v, name=f.name) for v in d]))
                else:
                    bufs.append(Buffer(d, name=f.name))
            return bufs[0] if len(bufs) == 1 else Realization(bufs)
        # target feature wiring (reference: Target.h features + JIT env)
        tr_installed = False
        if target.has_feature("trace_all") and self.trace is None:
            from .trace import Trace
            g0 = gather_graph(self.outputs)
            for f in g0.funcs:
                f._fschedule.trace_realizations = True
                f._fschedule.trace_stores = True
            self.trace = Trace()
            tr_installed = True
        no_pallas = target.has_feature("no_pallas") or             target.has_feature("interpret")
        try:
            if no_pallas:
                from .ops import pallas_group as _pg
                _orig = _pg.try_pallas_group
                _pg.try_pallas_group = lambda *a, **k: None
            fn, input_arrays, regions, preset_args = self._prepare(
                sizes, dst, jit)
            arrays = fn(tuple(input_arrays), preset_args)
        finally:
            if no_pallas:
                _pg.try_pallas_group = _orig
            if tr_installed:
                self.trace = None
        if target.has_feature("profile"):
            print(self.profile(sizes, dst))
        return self._package(arrays, regions, sizes, dst)

    def _build_fn(self, g: _Graph, regions, input_objs, param_vals,
                  presets=None, traced_param_ids=()):
        """traced_param_ids: scalar Params whose VALUES are passed as traced
        arrays (third argument of the returned fn) so jax.grad can
        differentiate through them (reference: src/Derivative.h:52-71 scalar
        param adjoints); their bounds-time values stay the static ones."""
        presets = presets or {}
        preset_shapes = [(fid, mins, len(arrs))
                         for fid, (mins, arrs) in presets.items()]

        def run(inp_arrays, preset_arrays=(), param_arrays=()):
            realizations: Dict[int, Realized] = {}
            for (t, buf), arr in zip(input_objs, inp_arrays):
                realizations[id(t)] = Realized(
                    (arr,), buf._mins, getattr(t, "name", "buf"))
            off = 0
            for fid, mins_p, narr in preset_shapes:
                realizations[fid] = Realized(
                    tuple(preset_arrays[off:off + narr]), mins_p, "memo")
                off += narr

            def resolver(name, args):
                if name == "param":
                    return param_vals.get(id(args[0]))
                obj = args[0]
                i = args[1]
                real = realizations.get(id(obj))
                if real is None:
                    return None
                if name == "buffer_min":
                    return real.mins[i]
                if name == "buffer_extent":
                    return real.arrays[0].shape[real.arrays[0].ndim - 1 - i]
                return None

            engine = BoundsEngine(resolver=resolver)
            bp = _BoundsPass(g, engine)
            out_regions = {k: Box(list(v.dims)) for k, v in regions.items()}
            bp.run(self.outputs, out_regions)
            # validate input required regions
            for t in g.inputs.values():
                box = bp.boxes.get(id(t))
                if box is None or not box.defined():
                    continue
                real = realizations[id(t)]
                nd = real.arrays[0].ndim
                for i in range(t.dimensions()):
                    iv = box.dims[i]
                    lo = real.mins[i]
                    hi = lo + real.arrays[0].shape[nd - 1 - i] - 1
                    if iv.lo < lo or iv.hi > hi:
                        raise CompileError(
                            f"input {getattr(t, 'name', '?')} is accessed at "
                            f"dim {i} over {iv}, but its bounds are "
                            f"[{lo}, {hi}]; add a boundary condition "
                            "(e.g. repeat_edge) or clamp")
            # evaluate producers-first; funcs scheduled compute_at an anchor
            # are deferred so the anchor can lower the whole group to one
            # Pallas kernel (ops/pallas_group.py); on fallback they are
            # evaluated standalone (same values — schedules are
            # semantics-preserving)
            from .ops.pallas_group import find_tile, try_pallas_group
            pdict = {k: v for k, v in param_vals.items()}
            for pid, arr in zip(traced_param_ids, param_arrays):
                pdict[pid] = arr
            ctx0 = Ctx(0, {}, {}, realizations, pdict, trace=self.trace)
            ctx0.multi_read = _multi_read_ids(g)
            deferred: Dict[int, List[Func]] = {}

            def eval_standalone(fn):
                if id(fn) in realizations and any(
                        id(fn) == fid for fid, _m, _n in preset_shapes):
                    return   # memoized: precomputed on the host
                b = bp.boxes.get(id(fn))
                if b is None or not b.defined():
                    return
                realizations[id(fn)] = _evaluate_func(fn, b, ctx0)
                fs = fn._fschedule
                if self.trace is not None and (
                        fs.trace_stores or fs.trace_realizations
                        or fs.trace_loads):
                    self.trace.record_realization(
                        fn, b, realizations[id(fn)].arrays)

            cliques = _fusion_cliques(g)

            def eval_clique(clique):
                """compute_with: members are lowered together and pinned by
                ONE joint barrier, so XLA forms a single multi-output fusion
                over their shared producers instead of one pass per func
                (reference: src/ScheduleFunctions.cpp:303-356 fused loop
                nests; the array analog of sharing the loop)."""
                evald = []
                for m in clique:
                    b = bp.boxes.get(id(m))
                    if b is None or not b.defined():
                        continue
                    evald.append((m, b, _evaluate_func(m, b, ctx0,
                                                       defer_barrier=True)))
                flat = []
                counts = []
                for (_m, _b, r) in evald:
                    flat.extend(r.arrays)
                    counts.append(len(r.arrays))
                flat = list(jax.lax.optimization_barrier(tuple(flat)))
                off2 = 0
                for (m, b, r), narr in zip(evald, counts):
                    arrs = tuple(flat[off2:off2 + narr])
                    off2 += narr
                    realizations[id(m)] = Realized(arrs, r.mins, m.name)
                    fs = m._fschedule
                    if self.trace is not None and (
                            fs.trace_stores or fs.trace_realizations
                            or fs.trace_loads):
                        self.trace.record_realization(m, b, arrs)

            for f in g.funcs:
                if id(f) not in g.materialized:
                    continue
                box = bp.boxes.get(id(f))
                if box is None or not box.defined():
                    continue
                lvl = f._fschedule.compute_level
                if lvl.kind == "at" and id(lvl.func) in g.materialized:
                    deferred.setdefault(id(lvl.func), []).append(f)
                    continue
                clique = cliques.get(id(f))
                if clique is not None:
                    if f is not clique[-1]:
                        continue       # lowered together when the last
                    eval_clique(clique)
                    continue
                members = deferred.pop(id(f), [])
                real = None
                if find_tile(f) is not None:
                    real = try_pallas_group(f, box, ctx0, g, bp.boxes)
                if real is not None:
                    realizations[id(f)] = real
                    _emit_debug_dump(f, real.arrays)
                else:
                    for m in members:
                        eval_standalone(m)
                    eval_standalone(f)
            # any remaining deferred members (anchor unprocessed) run alone
            for ms in deferred.values():
                for m in ms:
                    eval_standalone(m)
            outs = []
            for f in self.outputs:
                real = realizations[id(f)]
                req = regions[id(f)]
                box = bp.boxes[id(f)]
                arrs = []
                for arr in real.arrays:
                    # crop grown box back to the requested region
                    idx = []
                    n = f.dimensions()
                    for i in reversed(range(n)):
                        off = req.dims[i].lo - box.dims[i].lo
                        idx.append(slice(int(off),
                                         int(off + req.dims[i].extent())))
                    arrs.append(arr[tuple(idx)])
                outs.append(tuple(arrs))
            return tuple(outs)

        return run

    def _package(self, arrays, regions, sizes, dst):
        results = []
        for f, arrs in zip(self.outputs, arrays):
            req = regions[id(f)]
            bufs = [Buffer(a, mins=req.mins(), name=f.name) for a in arrs]
            results.append(bufs[0] if len(bufs) == 1 else Realization(bufs))
        if dst is not None:
            # fill destination buffers
            flat = []
            for r in results:
                flat.extend(r if isinstance(r, Realization) else [r])
            dsts = dst if isinstance(dst, (list, tuple)) else [dst]
            for d, s in zip(dsts, flat):
                d._data = s.data
            return dst
        if len(results) == 1:
            return results[0]
        return Realization(results) if all(
            not isinstance(r, Realization) for r in results) else results

    # -- AOT-style compiled callable --------------------------------------
    def compile_to_callable(self, arguments=None, target=None):
        """Returns fn(*buffers_or_arrays, sizes=[...]) -> Buffer(s), jitted.
        The analog of Pipeline::compile_to_callable (reference:
        src/Callable.h:82)."""
        pipeline = self

        class Callable:
            def __init__(self):
                self.arguments = arguments

            def __call__(self, *args, sizes=None):
                if arguments:
                    for spec, val in zip(arguments, args):
                        if isinstance(spec, ImageParam):
                            spec.set(val if isinstance(val, Buffer)
                                     else Buffer(val))
                        elif isinstance(spec, Param):
                            spec.set(val)
                return pipeline.realize(sizes)

        return Callable()

    def compile_jit(self, target=None):
        return self

    def infer_input_bounds(self, sizes, target=None):
        """Allocate+bind zero-filled buffers for unbound ImageParams sized to
        the required regions (reference: Pipeline.cpp:1126-1240)."""
        g = gather_graph(self.outputs)
        regions = self._out_regions(sizes)
        # temporarily bind unbound images with 1x1 probes? Instead: run the
        # bounds pass with estimates/zero mins, using symbolic-free resolver.
        unbound = [t for t in g.inputs.values()
                   if isinstance(t, ImageParam) and t._bound is None]
        param_vals = {}
        for p in g.params.values():
            try:
                param_vals[id(p)] = p.get()
            except CompileError:
                if p._estimate is not None:
                    param_vals[id(p)] = p._estimate
                else:
                    raise

        def resolver(name, args):
            if name == "param":
                return param_vals.get(id(args[0]))
            obj, i = args[0], args[1]
            if isinstance(obj, ImageParam) and obj._bound is not None:
                b = obj._bound
                if name == "buffer_min":
                    return b.dim(i).min
                return b.dim(i).extent
            if isinstance(obj, ImageParam) and i in obj.estimates:
                mn, ex = obj.estimates[i]
                v = _static_expr_int(mn if name == "buffer_min" else ex)
                return v
            return None

        engine = BoundsEngine(resolver=resolver)
        bp = _BoundsPass(g, engine)
        bp.run(self.outputs, regions)
        for t in unbound:
            box = bp.boxes.get(id(t))
            if box is None or not box.bounded():
                raise CompileError(
                    f"cannot infer bounds for {t.name}")
            buf = Buffer(type=t.type, sizes=box.extents(),
                         mins=box.mins(), name=t.name)
            t.set(buf)
        return [t.get() for t in unbound]

    def profile(self, sizes=None, dst=None, mode="stages"):
        """Per-stage time/memory report.

        mode="stages": executed stage-at-a-time; each stage attributable
        but unfused, and on a remote-tunnel device the numbers include
        per-stage transfers — good for ranking compute within one host.
        mode="fused": prefix differencing — time the pipeline truncated
        after each materialized stage, fused exactly as production
        realize() fuses it, in steady state; consecutive deltas attribute
        per-stage cost in the REAL program (the analog of the reference's
        sampling profiler, runtime/profiler_common.cpp:151, under the
        jit compilation model).
        (reference: src/Profiling.cpp; HL_PROFILER_JSON_OUTPUT-style dict
        + formatted __str__)."""
        if mode == "fused":
            return self._profile_fused(sizes, dst)
        import time as _time

        g = gather_graph(self.outputs)
        regions = self._out_regions(sizes, dst)
        input_objs = []
        for t in g.inputs.values():
            buf = t.get() if isinstance(t, ImageParam) else t
            input_objs.append((t, buf))
        param_vals = {id(p): p.get() for p in g.params.values()}
        realizations: Dict[int, Realized] = {}
        for (t, buf) in input_objs:
            realizations[id(t)] = Realized((buf.data,), buf._mins,
                                           getattr(t, "name", "buf"))

        def resolver(name, args):
            if name == "param":
                return param_vals.get(id(args[0]))
            obj, i = args[0], args[1]
            real = realizations.get(id(obj))
            if real is None:
                return None
            if name == "buffer_min":
                return real.mins[i]
            return real.arrays[0].shape[real.arrays[0].ndim - 1 - i]

        engine = BoundsEngine(resolver=resolver)
        bp = _BoundsPass(g, engine)
        bp.run(self.outputs, {k: Box(list(v.dims))
                              for k, v in regions.items()})
        ctx0 = Ctx(0, {}, {}, realizations, param_vals)
        entries = []
        total = 0.0
        for f in g.funcs:
            if id(f) not in g.materialized:
                continue
            box = bp.boxes.get(id(f))
            if box is None or not box.defined():
                continue
            t0 = _time.perf_counter()
            real = _evaluate_func(f, box, ctx0)
            jax.block_until_ready(real.arrays)
            np.asarray(jax.tree_util.tree_leaves(real.arrays)[0]
                       .reshape(-1)[:1])
            dt = _time.perf_counter() - t0
            realizations[id(f)] = real
            nbytes = sum(a.size * a.dtype.itemsize for a in real.arrays)
            if not f._fschedule.no_profiling:
                entries.append({"name": f.name, "ms": dt * 1e3,
                                "bytes": nbytes,
                                "box": list(zip(box.mins(), box.extents()))})
            total += dt

        class ProfileReport(dict):
            def __str__(self):
                lines = [f"total (stage-at-a-time): "
                         f"{self['total_ms']:.3f} ms"]
                for e2 in sorted(self["funcs"], key=lambda d: -d["ms"]):
                    pct = 100 * e2["ms"] / max(self["total_ms"], 1e-9)
                    lines.append(
                        f"  {e2['name']:28s} {e2['ms']:9.3f}ms "
                        f"({pct:5.1f}%)  {e2['bytes'] / 1e6:8.2f} MB")
                return "\n".join(lines)

        return ProfileReport(total_ms=total * 1e3, funcs=entries)

    def _profile_fused(self, sizes=None, dst=None):
        import time as _time

        g = gather_graph(self.outputs)
        regions = self._out_regions(sizes, dst)
        input_objs = []
        for t in g.inputs.values():
            buf = t.get() if isinstance(t, ImageParam) else t
            input_objs.append((t, buf))
        param_vals = {id(p): p.get() for p in g.params.values()}
        realizations: Dict[int, Realized] = {}
        for (t, buf) in input_objs:
            realizations[id(t)] = Realized((buf.data,), buf._mins,
                                           getattr(t, "name", "buf"))

        def resolver(name, args):
            if name == "param":
                return param_vals.get(id(args[0]))
            obj, i = args[0], args[1]
            real = realizations.get(id(obj))
            if real is None:
                return None
            if name == "buffer_min":
                return real.mins[i]
            return real.arrays[0].shape[real.arrays[0].ndim - 1 - i]

        engine = BoundsEngine(resolver=resolver)
        bp = _BoundsPass(g, engine)
        bp.run(self.outputs, {k: Box(list(v.dims))
                              for k, v in regions.items()})

        def _steady_ms(p, p_sizes=None, p_dst=None):
            fn, arrays, _r2, presets = p._prepare(p_sizes, p_dst, jit=False)
            jfn = jax.jit(lambda a: fn(a, presets))
            args = tuple(arrays)
            out = jfn(args)
            np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])

            def run_n(n2):
                t0 = _time.perf_counter()
                o = None
                for _ in range(n2):
                    o = jfn(args)
                np.asarray(jax.tree_util.tree_leaves(o)[0].reshape(-1)[:1])
                return _time.perf_counter() - t0

            n2 = 2
            while True:
                t1 = run_n(n2)
                t2 = run_n(2 * n2)
                if t2 - t1 > 0.05 or n2 >= 64:
                    break
                n2 *= 2
            return max((t2 - t1) / n2, 0.0) * 1e3

        out_ids = {id(f) for f in self.outputs}
        entries = []
        prev = 0.0
        for f in g.funcs:
            is_out = id(f) in out_ids
            if id(f) not in g.materialized and not is_out:
                continue
            box = bp.boxes.get(id(f))
            if box is None or not box.defined():
                continue
            if is_out:
                cum = _steady_ms(self, sizes, dst)
            else:
                db = Buffer(type=f.output_type(0), sizes=box.extents(),
                            mins=box.mins(), name=f.name)
                try:
                    cum = _steady_ms(Pipeline(f), None, db)
                except Exception:
                    continue   # unprofilable prefix (e.g. tuple dst)
            entries.append({"name": f.name, "ms": max(0.0, cum - prev),
                            "cum_ms": cum,
                            "box": list(zip(box.mins(), box.extents()))})
            prev = cum

        class FusedReport(dict):
            def __str__(self):
                lines = [f"total (fused): {self['total_ms']:.3f} ms "
                         f"(per-stage = prefix deltas)"]
                for e2 in sorted(self["funcs"], key=lambda d: -d["ms"]):
                    pct = 100 * e2["ms"] / max(self["total_ms"], 1e-9)
                    lines.append(f"  {e2['name']:28s} {e2['ms']:9.3f}ms "
                                 f"({pct:5.1f}%)  cum {e2['cum_ms']:9.3f}ms")
                return "\n".join(lines)

        return FusedReport(total_ms=prev, funcs=entries)

    def apply_autoscheduler(self, target=None, params=None):
        from .autoschedule import apply_autoscheduler
        return apply_autoscheduler(self, target, params)

    def get_func(self, i):
        g = gather_graph(self.outputs)
        return g.funcs[i]

    def print_loop_nest(self):
        from .loopnest import print_loop_nest
        print_loop_nest(self.outputs[0])


def _evaluate_extern(f: Func, box: Box, ctx0: Ctx) -> Realized:
    """Run the extern stage's host callback via jax.pure_callback
    (reference: SURVEY.md §2.1 'Extern stages' — jax.pure_callback with the
    same bounds-query contract)."""
    meta = f._extern
    fp = meta.get("footprint")
    in_boxes = fp(Box(list(box.dims))) if fp is not None else [
        Box(list(box.dims)) for _ in meta["inputs"]]
    in_arrays = []
    for src, b2 in zip(meta["inputs"], in_boxes):
        real = ctx0.realizations.get(id(src))
        if real is None:
            raise CompileError(
                f"extern stage {f.name}: input "
                f"{getattr(src, 'name', src)} not realized")
        arr = real.arrays[0]
        # the callback sees exactly the queried region (reference: the
        # extern receives halide_buffer_ts cropped to the bounds query)
        nd = arr.ndim
        idx = []
        for i in reversed(range(len(b2.dims))):
            off = int(b2.dims[i].lo) - int(real.mins[i])
            ext = int(b2.dims[i].extent())
            if off < 0 or off + ext > arr.shape[len(idx)]:
                raise CompileError(
                    f"extern stage {f.name}: queried region of "
                    f"{getattr(src, 'name', src)} exceeds its realization")
            idx.append(slice(off, off + ext))
        in_arrays.append(arr[tuple(idx)])
    out_shape = tuple(reversed(box.extents()))
    result = jax.pure_callback(
        meta["callback"],
        jax.ShapeDtypeStruct(out_shape, meta["type"].to_np()),
        *in_arrays)
    return Realized((result,), box.mins(), f.name)


def _static_expr_int(e) -> int:
    if isinstance(e, E.IntImm):
        return e.value
    if isinstance(e, int):
        return e
    from .eval_jnp import Ctx as _C, _static_int
    return _static_int(e, _C(0, {}, {}, {}, {}))


def _debug_dump_cb(fname: str, arr) -> None:
    """debug_to_file writer (reference: src/DebugToFile.cpp;
    runtime/halide_image_io-independent .tmp layout). `.npy` gets the
    numpy format; otherwise a 5-int32 header (four extents minor-first,
    padded with 1s, then a type code per HalideRuntime's debug_to_file
    table) followed by the raw data."""
    import numpy as _np
    a = _np.asarray(arr)
    if fname.endswith(".npy"):
        _np.save(fname, a)
        return
    codes = {"float32": 0, "float64": 1, "uint8": 2, "int8": 3,
             "uint16": 4, "int16": 5, "uint32": 6, "int32": 7,
             "uint64": 8, "int64": 9}
    ext = list(reversed(a.shape)) + [1] * max(0, 4 - a.ndim)
    hdr = _np.asarray(ext[:4] + [codes.get(a.dtype.name, 0)], _np.int32)
    with open(fname, "wb") as fh:
        hdr.tofile(fh)
        a.tofile(fh)


def _emit_debug_dump(f: Func, arrays) -> None:
    fname = f._fschedule.debug_file
    if not fname:
        return
    for i, arr in enumerate(arrays):
        out = fname if len(arrays) == 1 else f"{fname}.{i}"
        jax.debug.callback(
            lambda a, _fn=out: _debug_dump_cb(_fn, a), arr)


def _evaluate_func(f: Func, box: Box, ctx0: Ctx,
                   defer_barrier: bool = False) -> Realized:
    if f.is_extern():
        return _evaluate_extern(f, box, ctx0)
    n = f.dimensions()
    axes = {}
    for i, v in enumerate(f._args):
        axes[v.name] = Axis(v.name, i, int(box.dims[i].lo),
                            int(box.dims[i].extent()))
    ctx = Ctx(n, axes, {}, ctx0.realizations, ctx0.params,
              trace=ctx0.trace)
    from .eval_jnp import full_shape
    shape = full_shape(ctx, list(axes.values()))
    init = f._defs[0]
    arrays = []
    for i, v in enumerate(init.values):
        if isinstance(v, E.Intrin) and v.name == "undef":
            # undef(): leave storage uninitialized (reference: undef<T>());
            # zeros keep determinism
            arrays.append(jnp.zeros(shape, dtype=v.dtype.to_np()))
            continue
        arr = eval_array(v, ctx)
        arr = jnp.broadcast_to(arr, shape)
        arr = arr.astype(v.dtype.to_np())
        arrays.append(arr)
    current = arrays
    if len(f._defs) > 1:
        for d in f._defs[1:]:
            ctx_u = Ctx(n, axes, {}, dict(ctx0.realizations), ctx0.params,
                        trace=ctx0.trace)
            ctx_u.realizations[id(f)] = Realized(current, box.mins(), f.name)
            current = apply_update(f, d, current, ctx_u)
            # pin EVERY update step as a real materialization: each step's
            # result is consumed several times by the next (self-reads,
            # init slices, the update-slice base). This is Halide's
            # "updates are serialized in place" semantics, honestly.
            current = list(jax.lax.optimization_barrier(tuple(current)))
    # pin the materialization when the func has updates or is read from
    # several sites: compute_root MEANS materialize, and on TPU this is
    # also a correctness requirement -- XLA:TPU MISCOMPILED iir_blur's
    # fully-fused multi-consumer scan graph (jit maxerr 0.55 vs eager
    # 6.6e-7 on identical traces, v5e). Single-read pure producers (conv
    # chains) stay fusable: barriering them ballooned resnet-50's compile
    # past 8 minutes.
    import os as _os
    if _os.environ.get("HT_NO_BARRIER") or defer_barrier:
        pass   # compute_with cliques barrier jointly at the caller
    elif len(f._defs) > 1 or getattr(ctx0, "multi_read", None) is None \
            or id(f) in ctx0.multi_read:
        current = list(jax.lax.optimization_barrier(tuple(current)))
    _emit_debug_dump(f, current)
    return Realized(current, box.mins(), f.name)
