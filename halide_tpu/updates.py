"""Update-definition evaluation.

The TPU lowering of the reference's reduction machinery (reference:
src/Func.h update defs, src/Associativity.cpp, SURVEY.md §2.5 "Reduction
parallelism"). Update definitions are classified into array-parallel forms:

- dense combine   f(x) = f(x) op g(r, x)        -> masked reduce over rdom axes
- scan            f(.., s*r+c, ..) self at -s   -> associative scan along the dim
                  (linear a*prev+b, or min/max segmented op-scan; direction
                  and flipped indices like `height-r-1` both handled)
- slab            f(x, r, c) = v(r, ..)         -> dynamic_update_slice of a
                  contiguous block (rvar covers the dim with stride +-1)
- scatter         f(e(r)) = f(e(r)) op v(r)     -> jnp scatter-add/min/max/set
- overwrite       f(x) = g(x)                   -> whole-array assignment
- outer loop      one small rdom dim sequential, rest re-classified per step
                  (proves self-reads disjoint from writes via interval bounds)
- sequential      anything else                 -> lax.fori_loop over the rdom

The classification mirrors what the reference proves with its associativity
table and ParallelRVar analysis, but the *execution* is jnp/XLA array ops.
"""
from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from . import expr as E
from .bounds import BoundsEngine, Interval
from .expr import CompileError, Expr
from .eval_jnp import (AVal, Axis, Ctx, Realized, _static_int, _kastype,
                       _kwhere, eval_array, evaluate, full_shape,
                       materialize)
from .ops import onehot_mxu
from .visitors import exprs_equal, mutate, substitute, walk

_COMBINE_OPS = ("add", "sub", "mul", "min", "max")

# full dense-combine grid cap (elements); larger reductions step the
# outermost rdom dim sequentially
_DENSE_COMBINE_MAX = 1 << 27

# small-tap reductions (<= this many rdom points) unroll to shifted reads
# XLA fuses into ONE pass over the output; both the einsum path and the
# dense fallback would materialize a taps-x-larger stacked temporary
# (HBM-bound), and a taps-deep MXU contraction wastes the systolic array
import os as _os

import ml_dtypes as _ml_dtypes
import numpy as _np


def _unroll_taps() -> int:
    return int(_os.environ.get("HALIDE_TPU_UNROLL_TAPS", "16"))


# last reduction-lowering decision per func name (tests/debugging spy,
# like pallas_group._last_plan): "conv" | "einsum" | "unrolled" | "dense"
_last_reduce_path: dict = {}


def _rdom_marked_unrolled(d, rdom_axes) -> bool:
    """True iff EVERY rdom dim of this update is marked unrolled()."""
    from .schedule import ForType
    names = {a.name for a in rdom_axes}
    if not names:
        return False
    marked = {dim.var for dim in d.schedule.dims
              if dim.is_rvar and dim.for_type == ForType.UNROLLED}
    return names <= marked


def _is_undef(e: Expr) -> bool:
    return isinstance(e, E.Intrin) and e.name == "undef"


def find_self_calls(e: Expr, func) -> List[E.Call]:
    out = []

    def fn(n):
        if isinstance(n, E.Call) and n.target is func:
            out.append(n)

    walk(e, fn)
    return out


def _aligned_self(call: E.Call, lhs_args) -> bool:
    return len(call.args) == len(lhs_args) and all(
        exprs_equal(a, b) for a, b in zip(call.args, lhs_args))


def _decompose_combine(value: Expr, func, lhs_args, value_index: int):
    """value == op(self, g) with self == func(lhs_args)[value_index] and g
    self-free. Returns (op, g) or None."""
    if isinstance(value, E.Call) and value.target is func:
        return None
    if not isinstance(value, E.Binary) or value.op not in _COMBINE_OPS:
        return None
    a, b = value.a, value.b
    a_self = isinstance(a, E.Call) and a.target is func and \
        a.value_index == value_index and _aligned_self(a, lhs_args)
    b_self = isinstance(b, E.Call) and b.target is func and \
        b.value_index == value_index and _aligned_self(b, lhs_args)
    if a_self and not find_self_calls(b, func):
        return (value.op, b)
    if b_self and value.op in ("add", "mul", "min", "max") and \
            not find_self_calls(a, func):
        return (value.op, a)
    return None


def _identity_for(op: str, t):
    if op in ("add", "sub"):
        return 0
    if op == "mul":
        return 1
    if op == "min":
        return t.max_value()
    if op == "max":
        return t.min_value()
    raise CompileError(op)


def _linear_decompose(value: Expr, func, self_call: E.Call, lhs_args):
    """value == a * self + b with a, b free of the *scanned* self-call.
    Self-calls exactly aligned with the LHS are pre-update reads of the
    current array and count as free terms. Returns (a, b) Exprs or None."""
    from .iroperator import select as hselect

    def scanned_refs(e):
        return [c for c in find_self_calls(e, func)
                if not _aligned_self(c, lhs_args)]

    def rec(e) -> Optional[Tuple[Expr, Expr]]:
        if isinstance(e, E.Call) and e.target is func:
            if exprs_equal(e, self_call):
                return (E.const(1, e.dtype), E.const(0, e.dtype))
            if _aligned_self(e, lhs_args):
                return (E.const(0, e.dtype), e)
            return None
        if not scanned_refs(e):
            return (E.const(0, e.dtype), e)
        if isinstance(e, E.Binary):
            ra = rec(e.a)
            rb = rec(e.b)
            if ra is None or rb is None:
                return None
            (aa, ba), (ab, bb) = ra, rb
            if e.op == "add":
                return (aa + ab, ba + bb)
            if e.op == "sub":
                return (aa - ab, ba - bb)
            if e.op == "mul":
                if not scanned_refs(e.a):
                    return (e.a * ab, e.a * bb)
                if not scanned_refs(e.b):
                    return (aa * e.b, ba * e.b)
                return None
            if e.op == "div" and not scanned_refs(e.b):
                return (aa / e.b, ba / e.b)
            return None
        if isinstance(e, E.Select) and not scanned_refs(e.cond):
            rt = rec(e.true_value)
            rf = rec(e.false_value)
            if rt is None or rf is None:
                return None
            return (hselect(e.cond, rt[0], rf[0]),
                    hselect(e.cond, rt[1], rf[1]))
        return None

    return rec(value)


def _resolve_rdom(d, base_ctx: Ctx) -> List[Axis]:
    axes = []
    for i, rv in enumerate(d.rdom.dims):
        mn = _static_int(rv.rmin, base_ctx)
        ex = _static_int(rv.rextent, base_ctx)
        axes.append(Axis(rv.name, base_ctx.ndim + i, mn, ex))
    return axes


def _eval_mask(preds, ctx: Ctx):
    if not preds:
        return None
    m = None
    for p in preds:
        pm = eval_array(p, ctx)
        m = pm if m is None else jnp.logical_and(m, pm)
    return m


def apply_update(func, d, current: List, base_ctx: Ctx,
                 allow_self_reads: bool = False) -> List:
    """Apply one update definition to `current` (list of full-shape arrays).

    base_ctx: axes = func pure dims over its realized box; realizations
    already map id(func) -> Realized(current arrays)."""
    lhs = d.args
    init_args = func._defs[0].args
    aligned = all(
        isinstance(a, E.Variable) and a.name == v.name
        for a, v in zip(lhs, init_args))

    if d.rdom is None:
        if aligned:
            return _dense_overwrite(func, d, current, base_ctx)
        r = _scatter_update(func, d, current, base_ctx, rdom_axes=[],
                            allow_self_reads=allow_self_reads)
        if r is not None:
            return r
        return _sequential_update(func, d, current, base_ctx, [])

    rdom_axes = _resolve_rdom(d, base_ctx)
    if any(ax.extent <= 0 for ax in rdom_axes):
        # zero iterations: a no-op -- and 0-sized intermediates fault the
        # TPU compiler (max_filter's empty log-slice level crashed the
        # worker process)
        return current

    if aligned:
        r = _try_dense_combine(func, d, current, base_ctx, rdom_axes)
        if r is not None:
            return r
    else:
        r = _try_scan(func, d, current, base_ctx, rdom_axes)
        if r is not None:
            return r
        r = _scatter_update(func, d, current, base_ctx, rdom_axes,
                            allow_self_reads=allow_self_reads)
        if r is not None:
            return r
    r = _try_outer_loop(func, d, current, base_ctx, rdom_axes)
    if r is not None:
        return r
    return _sequential_update(func, d, current, base_ctx, rdom_axes)


# ---------------------------------------------------------------------------

def _out_shape(base_ctx: Ctx):
    return full_shape(base_ctx, list(base_ctx.axes.values()))


def _dense_overwrite(func, d, current, base_ctx: Ctx):
    out = []
    shape = _out_shape(base_ctx)
    mask = _eval_mask(d.predicates, base_ctx)
    for i, v in enumerate(d.values):
        if _is_undef(v):
            out.append(current[i])
            continue
        arr = eval_array(v, base_ctx)
        arr = _kastype(jnp.broadcast_to(arr, shape), current[i].dtype,
                       base_ctx)
        if mask is not None:
            arr = _kwhere(jnp.broadcast_to(mask, shape), arr, current[i],
                          base_ctx)
        out.append(arr)
    return out


def _try_dense_combine(func, d, current, base_ctx: Ctx, rdom_axes):
    decomps = []
    for i, v in enumerate(d.values):
        if _is_undef(v):
            decomps.append(None)
            continue
        dc = _decompose_combine(v, func, d.args, i)
        if dc is None:
            # value entirely self-free: last-iteration-wins overwrite
            if not find_self_calls(v, func) and not d.predicates:
                dc = ("overwrite", v)
            else:
                return None
        decomps.append(dc)
    inner = base_ctx.extended(rdom_axes)
    grid = 1
    for a in rdom_axes:
        grid *= a.extent
    for sdim in _out_shape(base_ctx):
        grid *= sdim
    mask = _eval_mask(d.predicates, inner)
    shape = _out_shape(base_ctx)
    red_axes = tuple(inner.ndim - 1 - a.rpos for a in rdom_axes)
    out = []
    for i, dc in enumerate(decomps):
        if dc is None:
            out.append(current[i])
            continue
        op, g = dc
        if op == "overwrite":
            bind = dict(inner.bindings)
            for a in rdom_axes:
                bind[a.name] = AVal({}, a.min + a.extent - 1)
            arr = eval_array(g, base_ctx.with_bindings(bind))
            out.append(jnp.broadcast_to(
                _kastype(arr, current[i].dtype, base_ctx), shape))
            continue
        taps = 1
        for a in rdom_axes:
            taps *= a.extent
        # update().unroll(rvar) on every rdom dim forces the unrolled
        # lowering (reference: src/Func.h Stage::unroll on RVars unrolls
        # the reduction loop); without marks the tap-count heuristic picks
        unroll_forced = _rdom_marked_unrolled(d, rdom_axes)
        if op == "add" and mask is None and not unroll_forced:
            # contraction fast paths (convolutions / matmuls on the MXU).
            # Small-tap sums skip the einsum path: it stacks the shifted
            # reads into a taps-x-larger temporary and feeds the MXU a
            # taps-deep contraction (reference depthwise_separable_conv:
            # 9-tap channel-batched filter ran 12x slower that way)
            from .eval_jnp import (PallasUnsupported, try_conv_reduce,
                                   try_einsum_reduce)
            try:
                red = try_conv_reduce(g, inner,
                                      [a.name for a in rdom_axes])
                path = "conv"
            except (CompileError, PallasUnsupported):
                red = None
            if red is None and taps > _unroll_taps():
                red = try_einsum_reduce(g, inner, red_axes)
                path = "einsum"
            if red is not None:
                _last_reduce_path[func.name] = path
                red = red.reshape(red.shape[-base_ctx.ndim:]) if \
                    red.ndim > base_ctx.ndim else red
                nv = current[i] + _kastype(red, current[i].dtype, base_ctx)
                out.append(jnp.broadcast_to(nv, shape))
                continue
        if op in _COMBINE_OPS and (unroll_forced
                                   or 1 < taps <= _unroll_taps()):
            # static unroll: bind each rdom point to a constant and fold.
            # Every term is a (shifted) read over the plain output grid, so
            # XLA fuses the whole reduction into one pass -- no stacked
            # temporary, no reduce dimension at all (reference:
            # src/Func.h unroll(); the reference reaches the same code by
            # unrolling the reduction loop)
            import itertools
            try:
                acc = None
                for combo in itertools.product(
                        *[range(a.extent) for a in rdom_axes]):
                    bind = dict(base_ctx.bindings)
                    for a, k in zip(rdom_axes, combo):
                        bind[a.name] = AVal({}, a.min + k)
                    cb = base_ctx.with_bindings(bind)
                    v = jnp.asarray(eval_array(g, cb))
                    if d.predicates:
                        m = _eval_mask(d.predicates, cb)
                        if m is not None:
                            ident = jnp.asarray(_identity_for(
                                op, d.values[i].dtype), v.dtype)
                            v = jnp.where(m, v, ident)
                    if acc is None:
                        acc = v
                    elif op in ("add", "sub"):
                        acc = acc + v
                    elif op == "mul":
                        acc = acc * v
                    elif op == "min":
                        acc = jnp.minimum(acc, v)
                    else:
                        acc = jnp.maximum(acc, v)
                _last_reduce_path[func.name] = "unrolled"
                red = _kastype(jnp.asarray(acc), current[i].dtype, base_ctx)
                red = red.reshape(red.shape[-base_ctx.ndim:]) if \
                    red.ndim > base_ctx.ndim else red
                cur = current[i]
                if op == "add":
                    nv = cur + red
                elif op == "sub":
                    nv = cur - red
                elif op == "mul":
                    nv = cur * red
                elif op == "min":
                    nv = jnp.minimum(cur, red)
                else:
                    nv = jnp.maximum(cur, red)
                out.append(jnp.broadcast_to(nv, shape))
                continue
            except CompileError:
                pass
        if grid > _DENSE_COMBINE_MAX and len(rdom_axes) > 1:
            # MXU contractions above never materialize the product grid;
            # this fallback does -- multi-GB temporaries at full res
            # (nl_means' 49-point search OOMed the TPU compiler). Step the
            # outermost rdom dim sequentially instead.
            return None
        _last_reduce_path[func.name] = "dense"
        garr = eval_array(g, inner)
        garr = jnp.broadcast_to(garr, jnp.broadcast_shapes(
            garr.shape if hasattr(garr, "shape") else (),
            full_shape(inner, rdom_axes)))
        if mask is not None:
            ident = jnp.array(_identity_for(op, d.values[i].dtype),
                              dtype=garr.dtype)
            garr = jnp.where(mask, garr, ident)
        if op in ("add", "sub"):
            red = jnp.sum(garr, axis=red_axes, keepdims=True)
        elif op == "mul":
            red = jnp.prod(garr, axis=red_axes, keepdims=True)
        elif op == "min":
            red = jnp.min(garr, axis=red_axes, keepdims=True)
        else:
            red = jnp.max(garr, axis=red_axes, keepdims=True)
        red = red.reshape(red.shape[-base_ctx.ndim:]) if red.ndim > \
            base_ctx.ndim else red
        red = _kastype(red, current[i].dtype, base_ctx)
        cur = current[i]
        if op == "add":
            nv = cur + red
        elif op == "sub":
            nv = cur - red
        elif op == "mul":
            nv = cur * red
        elif op == "min":
            nv = jnp.minimum(cur, red)
        else:
            nv = jnp.maximum(cur, red)
        out.append(jnp.broadcast_to(nv, shape))
    return out


# ---------------------------------------------------------------------------
# scans
# ---------------------------------------------------------------------------

def _affine_in_var(e: Expr, name: str, ctx: Ctx):
    """e == s*var + c with s in {+1,-1} and c static -> (s, c), else None."""
    try:
        v = evaluate(e, ctx.extended(
            [Axis(name, ctx.ndim, 0, 1)]))
    except CompileError:
        return None
    if not isinstance(v, AVal):
        return None
    if set(v.coeffs) != {name}:
        return None
    s = v.coeffs[name]
    if s not in (1, -1):
        return None
    return (s, v.const)


def _try_scan(func, d, current, base_ctx: Ctx, rdom_axes):
    """f(.., s*r + c, ..) = a * f(.. prev ..) + b  or  op(prev, g)."""
    if len(rdom_axes) != 1:
        return None
    rax = rdom_axes[0]
    rname = rax.name
    init_args = func._defs[0].args
    # locate the scanned dim: arg affine in r with stride +-1; others bare
    # pure vars at their own positions
    scan_dim = None
    s_c = None
    for i, a in enumerate(d.args):
        if isinstance(a, E.Variable) and a.name == init_args[i].name:
            continue
        aff = _affine_in_var(a, rname, base_ctx)
        if aff is None or scan_dim is not None:
            return None
        scan_dim = i
        s_c = aff
    if scan_dim is None:
        return None
    s, c0 = s_c
    if len(d.values) != 1:
        return None
    value = d.values[0]
    self_calls = find_self_calls(value, func)
    if not self_calls:
        return None
    # classify self-calls: aligned (pre-update reads) vs the scan reference
    scan_ref = None
    for sc in self_calls:
        if _aligned_self(sc, d.args):
            continue
        ok = True
        for i, a in enumerate(sc.args):
            if i == scan_dim:
                aff = _affine_in_var(a, rname, base_ctx)
                if aff is None or aff[0] != s or aff[1] - c0 != -s:
                    ok = False
            else:
                if not (isinstance(a, E.Variable)
                        and a.name == d.args[i].name):
                    ok = False
        if not ok:
            return None
        if scan_ref is None:
            scan_ref = sc
        elif not exprs_equal(sc, scan_ref):
            return None
    if scan_ref is None:
        return None

    lin = _linear_decompose(value, func, scan_ref, d.args)
    opscan = None
    if lin is None:
        if isinstance(value, E.Binary) and value.op in ("min", "max"):
            a, b = value.a, value.b
            def free(e):
                return not [c for c in find_self_calls(e, func)
                            if not _aligned_self(c, d.args)]
            if exprs_equal(a, scan_ref) and free(b):
                opscan = (value.op, b)
            elif exprs_equal(b, scan_ref) and free(a):
                opscan = (value.op, a)
        if opscan is None:
            return None

    inner = base_ctx.extended([rax])
    mask = _eval_mask(d.predicates, inner)
    cur = current[0]
    dtype = cur.dtype
    nd = cur.ndim
    scan_np = nd - 1 - scan_dim
    ax = base_ctx.axes[init_args[scan_dim].name]
    n = rax.extent
    # positions p(r) = c0 + s*r over r in [rmin, rmin+n)
    if s == 1:
        pos_lo = c0 + rax.min
    else:
        pos_lo = c0 - (rax.min + n - 1)
    arr_lo = pos_lo - ax.min

    layout_axes = [a for nm, a in inner.axes.items()
                   if nm != init_args[scan_dim].name]
    inner_shape = full_shape(inner, layout_axes)
    r_np_inner = inner.ndim - 1 - rax.rpos

    def to_array_layout(x):
        """inner-ctx (r-indexed) array -> full layout, r mapped to positions
        along the scanned dim (ascending array order)."""
        x = jnp.broadcast_to(x, inner_shape)
        x = jnp.moveaxis(x, r_np_inner, 0)
        x = x.reshape((n,) + tuple(x.shape[-nd:]))
        x = jnp.squeeze(x, axis=1 + scan_np)
        x = jnp.moveaxis(x, 0, scan_np)
        if s == -1:
            x = jnp.flip(x, scan_np)   # ascending r == descending position
        return x.astype(dtype)

    # initial value lives just before the first scanned position
    init_idx = arr_lo - 1 if s == 1 else arr_lo + n
    idx = [slice(None)] * nd
    idx[scan_np] = slice(init_idx, init_idx + 1)
    init_vals = cur[tuple(idx)]
    span = [slice(None)] * nd
    span[scan_np] = slice(arr_lo, arr_lo + n)
    cur_span = cur[tuple(span)]
    backward = (s == -1)

    def run_scan(elems, combine):
        """elems are in array layout; for s==-1 scan toward lower positions:
        flip, scan, flip back."""
        if backward:
            elems = tuple(jnp.flip(e, scan_np) for e in elems)
        init_e = elems_init
        full = tuple(jnp.concatenate([i0, e], axis=scan_np)
                     for i0, e in zip(init_e, elems))
        res = jax.lax.associative_scan(combine, full, axis=scan_np)
        outv = res[-1]
        outv = jax.lax.slice_in_dim(outv, 1, n + 1, axis=scan_np)
        if backward:
            outv = jnp.flip(outv, scan_np)
        return outv

    def _try_pallas(b_arr, a_const=None, a_arr=None):
        """One-pass blocked VMEM-carry scan kernel (ops/pallas_scan.py);
        returns the scanned span or None (fall back to the log-depth XLA
        rounds). Mirrors the reference's single-pass sequential loop
        (SlidingWindow.cpp carry semantics) at HBM speed-of-light."""
        import os as _os
        if _os.environ.get("HT_NO_PALLAS_SCAN"):
            return None
        from .ops.pallas_scan import linear_scan
        try:
            return linear_scan(
                b_arr, init_vals.astype(dtype), scan_np, backward,
                a_const=a_const, a=a_arr,
                interpret=jax.default_backend() != "tpu")
        except Exception:
            if _os.environ.get("HT_PALLAS_STRICT"):
                raise
            return None

    if lin is not None:
        a_e, b_e = lin
        a_val = eval_array(a_e, inner)
        import os as _os
        if (mask is None and not isinstance(a_val, jax.core.Tracer)
                and jnp.size(a_val) == 1
                and jnp.issubdtype(dtype, jnp.floating)
                and not _os.environ.get("HT_NO_DECAY_SCAN")):
            # constant-coefficient linear recurrence (IIR with static
            # alpha): Kogge-Stone shift-FMA rounds on ONE array with a
            # scalar per-round decay d^(2^k) -- half the traffic of the
            # (a, b) pair scan and no interleave slicing; rounds whose
            # decay underflows f32 significance are dropped
            # (reference: apps/iir_blur/iir_blur_generator.cpp:13-33)
            dconst = float(jnp.reshape(a_val, ()))
            b_arr = to_array_layout(eval_array(b_e, inner))
            res = _try_pallas(b_arr, a_const=dconst)
            if res is not None:
                new = jax.lax.dynamic_update_slice_in_dim(
                    cur, res.astype(dtype), arr_lo, axis=scan_np)
                return [new]
            e = jnp.flip(b_arr, scan_np) if backward else b_arr
            y = jnp.concatenate([init_vals.astype(dtype), e],
                                axis=scan_np)
            L = n + 1
            k, dk = 1, dconst
            while k < L and abs(dk) > 1e-12:
                head = jax.lax.slice_in_dim(y, 0, L - k, axis=scan_np)
                zshape = list(y.shape)
                zshape[scan_np] = k
                sh = jnp.concatenate(
                    [jnp.zeros(zshape, y.dtype), head], axis=scan_np)
                y = y + jnp.asarray(dk, y.dtype) * sh
                k *= 2
                dk = dk * dk
            res = jax.lax.slice_in_dim(y, 1, n + 1, axis=scan_np)
            if backward:
                res = jnp.flip(res, scan_np)
            new = jax.lax.dynamic_update_slice_in_dim(
                cur, res.astype(dtype), arr_lo, axis=scan_np)
            return [new]
        a_arr = to_array_layout(a_val)
        b_arr = to_array_layout(eval_array(b_e, inner))
        if mask is not None:
            m = to_array_layout(jnp.asarray(mask).astype(jnp.int32)) != 0
            a_arr = jnp.where(m, a_arr, jnp.zeros_like(a_arr))
            b_arr = jnp.where(m, b_arr, cur_span)
        res = _try_pallas(b_arr, a_arr=a_arr)
        if res is not None:
            new = jax.lax.dynamic_update_slice_in_dim(
                cur, res.astype(dtype), arr_lo, axis=scan_np)
            return [new]
        elems_init = (jnp.zeros_like(init_vals), init_vals)

        def combine(l, r):
            (al, bl), (ar, br) = l, r
            return (ar * al, ar * bl + br)

        res = run_scan((a_arr, b_arr), combine)
    else:
        op, g = opscan
        fnc = jnp.minimum if op == "min" else jnp.maximum
        g_arr = to_array_layout(eval_array(g, inner))
        if mask is not None:
            m = to_array_layout(jnp.asarray(mask).astype(jnp.int32)) != 0
            seg_reset = jnp.logical_not(m)
            u = jnp.where(m, g_arr, cur_span)
        else:
            seg_reset = jnp.zeros(g_arr.shape, dtype=bool)
            u = g_arr
        elems_init = (jnp.zeros(init_vals.shape, dtype=bool), init_vals)

        def combine(l, r):
            (sl, ul), (sr, ur) = l, r
            return (jnp.logical_or(sl, sr), jnp.where(sr, ur, fnc(ul, ur)))

        res = run_scan((seg_reset, u), combine)

    new = jax.lax.dynamic_update_slice_in_dim(
        cur, res.astype(dtype), arr_lo, axis=scan_np)
    return [new]


def _bool_layout(mask, inner):
    return jnp.broadcast_to(mask, full_shape(inner, list(inner.axes.values())))


# ---------------------------------------------------------------------------
# scatter / slab updates
# ---------------------------------------------------------------------------

def _scatter_update(func, d, current, base_ctx: Ctx, rdom_axes,
                    allow_self_reads: bool = False):
    """LHS has computed indices. Tries the dense-slab fast path (contiguous
    rvar spans -> dynamic_update_slice) before falling back to jnp scatter."""
    inner = base_ctx.extended(rdom_axes) if rdom_axes else base_ctx
    init_args = func._defs[0].args
    ops = []
    for i, v in enumerate(d.values):
        if _is_undef(v):
            return None
        dc = _decompose_combine(v, func, d.args, i)
        if dc is not None and dc[0] in ("add", "sub", "mul", "min", "max"):
            ops.append(dc)
        else:
            selfs = find_self_calls(v, func)
            if not selfs:
                ops.append(("set", v))
            elif allow_self_reads:
                # caller proved the reads are disjoint from the writes
                ops.append(("set", v))
            else:
                return None

    # classify LHS dims
    kinds = []    # ('axis',) | ('const', c) | ('rspan', Axis, stride, c)
    used_rvars = {}
    rax_by_name = {a.name: a for a in rdom_axes}
    for i, a in enumerate(d.args):
        if isinstance(a, E.Variable) and a.name == init_args[i].name:
            kinds.append(("axis",))
            continue
        v = evaluate(a, inner)
        av = v.aval if hasattr(v, "aval") else v
        if isinstance(av, AVal) and av.is_const() and not hasattr(v, "aval"):
            kinds.append(("const", av.const))
            continue
        sv = av.single_var() if isinstance(av, AVal) else None
        if (sv is not None and sv in rax_by_name and not hasattr(v, "aval")
                and av.coeffs[sv] in (1, -1) and sv not in used_rvars):
            used_rvars[sv] = i
            kinds.append(("rspan", rax_by_name[sv], av.coeffs[sv], av.const))
            continue
        kinds.append(None)

    mask = _eval_mask(d.predicates, inner)
    if all(k is not None for k in kinds):
        r = _slab_update(func, d, current, base_ctx, inner, rdom_axes,
                         kinds, ops, mask)
        if r is not None:
            return r
    if not _dense_scatter_applies(func, d, current, base_ctx, rdom_axes,
                                  ops):
        # the single-pass dense compare/MXU reduction (inside
        # _general_scatter) beats `total` sequential whole-array one-hot
        # passes whenever it applies; only fall back to the unrolled loop
        # when it does not
        r = _try_unrolled_onehot(func, d, current, base_ctx, rdom_axes, ops)
        if r is not None:
            return r
    if rdom_axes and any(op == "set" for op, _ in ops):
        # XLA's scatter-set is order-undefined for duplicate indices, but
        # Halide defines sequential RDom order for overwrites. 'set' may
        # reach the general scatter only when every rdom var addresses its
        # own LHS dim with unit stride (index tuples then provably unique
        # across the domain); otherwise decline so apply_update routes to
        # the order-preserving outer-loop/sequential paths.
        covered = {k[1].name for k in kinds
                   if k is not None and k[0] == "rspan"}
        if any(ax.name not in covered for ax in rdom_axes):
            return None
    return _general_scatter(func, d, current, base_ctx, inner, rdom_axes,
                            ops, mask)


def _slab_update(func, d, current, base_ctx, inner, rdom_axes, kinds, ops,
                 mask):
    """All LHS dims are identity axes, constants, or full rvar spans: the
    write region is a box -> evaluate the block and dynamic_update_slice.
    rvar axes not consumed by the LHS ("free") are reduced per the combine
    op; a masked or `set` update with free rvars stays on the scatter path
    (duplicate writes are order-sensitive)."""
    init_args = func._defs[0].args
    nd = current[0].ndim
    spanned = {k[1].name for k in kinds if k is not None and k[0] == "rspan"}
    free_rvars = [a for a in rdom_axes if a.name not in spanned]
    if free_rvars and (mask is not None or any(o[0] == "set" for o in ops)):
        return None

    # target box: offsets + sizes per np axis
    offsets = [0] * nd
    sizes = list(current[0].shape)
    for j, k in enumerate(kinds):
        npax = nd - 1 - j
        ax_min = base_ctx.axes[init_args[j].name].min
        if k[0] == "axis":
            continue
        if k[0] == "const":
            offsets[npax] = k[1] - ax_min
            sizes[npax] = 1
        else:
            _, rax, stride, c = k
            lo = c + rax.min if stride == 1 else c - (rax.min + rax.extent - 1)
            offsets[npax] = lo - ax_min
            sizes[npax] = rax.extent
    if any(o < 0 or o + s > cs
           for o, s, cs in zip(offsets, sizes, current[0].shape)):
        return None   # box exceeds the realization: let scatter drop OOB

    def layout(x, reduce_op=None, identity=None):
        """inner-ctx value -> block of shape `sizes` (np order)."""
        # broadcast only over rvar axes + identity-dim base axes; base axes
        # of const/rspan dims must stay size 1 (their pure vars cannot
        # appear in the update)
        layout_axes = list(rdom_axes) + [
            base_ctx.axes[init_args[j].name]
            for j, k2 in enumerate(kinds) if k2[0] == "axis"]
        tgt = full_shape(inner, layout_axes)
        x = jnp.broadcast_to(x, tgt)
        if free_rvars:
            red = tuple(inner.ndim - 1 - a.rpos for a in free_rvars)
            fn = {"add": jnp.sum, "sub": jnp.sum, "mul": jnp.prod,
                  "min": jnp.min, "max": jnp.max}[reduce_op]
            x = fn(x, axis=red, keepdims=True)
        # permutation: output base axis p takes either the base part axis or
        # the spanned rvar axis
        perm = []
        flips = []
        for p in range(nd):
            j = nd - 1 - p   # pipeline dim
            k = kinds[j]
            if k[0] == "rspan":
                _, rax, stride, _c = k
                perm.append(inner.ndim - 1 - rax.rpos)
                if stride == -1:
                    flips.append(p)
            else:
                perm.append(inner.ndim - nd + p)
        unused = [a for a in range(inner.ndim) if a not in perm]
        x = jnp.transpose(x, unused + perm)
        x = x.reshape(tuple(x.shape[len(unused):]))
        if flips:
            x = jnp.flip(x, axis=tuple(flips))
        # const dims carry the full box axis (size box-extent or 1): crop to 1
        idx = tuple(
            slice(0, 1) if sizes[p] == 1 and x.shape[p] != 1 else slice(None)
            for p in range(nd))
        return jnp.broadcast_to(x[idx], tuple(sizes))

    out = []
    for i, (op, g) in enumerate(ops):
        cur = current[i]
        garr = eval_array(g, inner)
        if mask is not None and op != "set":
            ident = jnp.array(_identity_for(op, d.values[i].dtype),
                              dtype=jnp.asarray(garr).dtype)
            garr = jnp.where(mask, garr, ident)
        block = layout(garr, reduce_op=op if op != "set" else None)
        block = block.astype(cur.dtype)
        sub = jax.lax.dynamic_slice(cur, offsets, sizes)
        if op == "set":
            if mask is not None:
                mblock = layout(mask)
                nv = jnp.where(mblock, block, sub)
            else:
                nv = block
        elif op == "add":
            nv = sub + block
        elif op == "sub":
            nv = sub - block
        elif op == "mul":
            nv = sub * block
        elif op == "min":
            nv = jnp.minimum(sub, block)
        else:
            nv = jnp.maximum(sub, block)
        out.append(jax.lax.dynamic_update_slice(cur, nv, offsets))
    return out


_ONEHOT_MAX_RDOM = 128


def _try_unrolled_onehot(func, d, current, base_ctx: Ctx, rdom_axes, ops):
    """Small-rdom scatter -> dense one-hot accumulation: evaluate the index
    and value fields ONCE over the rdom grid, then fori_loop over rdom
    points applying out (op)= where(written_coords == idx, v, identity).
    TPU scatters are slow; this turns bilateral_grid's construction into 64
    fused VPU passes (SURVEY.md §7 'scatter stages fight TPU's vector
    model')."""
    if not rdom_axes:
        return None
    total = 1
    for a in rdom_axes:
        total *= a.extent
    if total > _ONEHOT_MAX_RDOM:
        return None
    if any(op[0] not in ("add", "sub", "min", "max", "mul") for op in ops):
        return None
    # the batched pre-evaluation reads the pre-update state once, which is
    # only sequential-equivalent if nothing here reads the func itself
    for _op, g in ops:
        if find_self_calls(g, func):
            return None
    for p in d.predicates:
        if find_self_calls(p, func):
            return None
    init_args = func._defs[0].args
    identity = [isinstance(a, E.Variable) and a.name == init_args[i].name
                for i, a in enumerate(d.args)]
    if all(identity):
        return None
    from .eval_jnp import axis_array

    inner = base_ctx.extended(rdom_axes)
    base_nd = base_ctx.ndim
    shape = _out_shape(base_ctx)
    inner_full = full_shape(inner, list(inner.axes.values()))

    def flat(x):
        """inner-ctx value -> (R, *base shape) with rdom axes flattened."""
        x = jnp.broadcast_to(jnp.asarray(x), inner_full)
        return x.reshape((-1,) + tuple(x.shape[-base_nd:]))

    mask_full = _eval_mask(d.predicates, inner)
    mask_full = flat(mask_full) if mask_full is not None else None
    idx_full = {}
    for j, a2 in enumerate(d.args):
        if identity[j]:
            continue
        idx_full[j] = flat(materialize(evaluate(a2, inner), inner))
    g_full = [flat(materialize(evaluate(g, inner), inner)
                   ).astype(current[i].dtype)
              for i, (_op, g) in enumerate(ops)]
    coords = {j: axis_array(base_ctx.axes[init_args[j].name], base_ctx)
              for j in idx_full}

    def body(r, cur_tuple):
        m = None
        if mask_full is not None:
            m = jax.lax.dynamic_index_in_dim(mask_full, r, 0,
                                             keepdims=False)
        for j, arr in idx_full.items():
            idx_r = jax.lax.dynamic_index_in_dim(arr, r, 0, keepdims=False)
            hit = jnp.equal(idx_r, coords[j])
            m = hit if m is None else jnp.logical_and(m, hit)
        news = []
        for i, (op, _g) in enumerate(ops):
            cur = cur_tuple[i]
            v = jax.lax.dynamic_index_in_dim(g_full[i], r, 0,
                                             keepdims=False)
            v = jnp.broadcast_to(v, shape)
            if op == "add":
                upd = cur + jnp.where(m, v, jnp.zeros(shape, cur.dtype))
            elif op == "sub":
                upd = cur - jnp.where(m, v, jnp.zeros(shape, cur.dtype))
            elif op == "mul":
                upd = cur * jnp.where(m, v, jnp.ones(shape, cur.dtype))
            elif op == "min":
                upd = jnp.minimum(cur, jnp.where(
                    m, v, jnp.full(shape, d.values[i].dtype.max_value(),
                                   cur.dtype)))
            else:
                upd = jnp.maximum(cur, jnp.where(
                    m, v, jnp.full(shape, d.values[i].dtype.min_value(),
                                   cur.dtype)))
            news.append(upd)
        return tuple(news)

    out = jax.lax.fori_loop(
        0, total, body,
        tuple(jnp.broadcast_to(c, shape) for c in current))
    return list(out)


_DENSE_SCATTER_MAX = 1024


def _dense_scatter_applies(func, d, current, base_ctx, rdom_axes, ops):
    """Predicts whether _general_scatter will take its dense compare/MXU
    reduction (mirrors the gate inside _general_scatter so _scatter_update
    can prefer it over the unrolled one-hot loop)."""
    if not rdom_axes:
        return False
    if any(op not in ("add", "sub", "mul", "min", "max") for op, _ in ops):
        return False
    init_args = func._defs[0].args
    identity = [isinstance(a, E.Variable) and a.name == init_args[i].name
                for i, a in enumerate(d.args)]
    cur0 = current[0]
    nd = cur0.ndim
    k_dd = 1
    for a in range(nd):
        if not identity[nd - 1 - a]:
            k_dd *= cur0.shape[a]
    if k_dd > _DENSE_SCATTER_MAX:
        return False
    inner = base_ctx.extended(rdom_axes)
    grid_axes = list(rdom_axes) + [
        base_ctx.axes[init_args[i].name]
        for i, ident in enumerate(identity) if ident]
    grid = 1
    for s in full_shape(inner, grid_axes):
        grid *= s
    # mirror _dense_small_scatter's path choice and footprint
    red_elems = 1
    for ax in rdom_axes:
        red_elems *= max(1, ax.extent)
    kept = max(1, grid // max(red_elems, 1))
    all_add = all(op == "add" for op, _ in ops)
    if all_add and red_elems <= 64 and kept > 4096:
        # unrolled-reduction path: one (kept, K) accumulator
        return kept * k_dd <= (1 << 31)
    fact = (all_add and k_dd >= onehot_mxu.MIN_FACTOR_K
            and kept <= 4096 and cur0.dtype.kind == "f")
    eff_k = 2 * int(math.isqrt(k_dd - 1) + 1) if fact else k_dd
    return eff_k * grid <= (1 << 31)


def _value_abs_bound(vexpr, vtype):
    """Max |value| if statically known (constant literal or narrow integer
    type), for the f32-exactness gate of the factored MXU scatter."""
    e = vexpr
    while isinstance(e, E.Cast):
        e = e.value
    if isinstance(e, (E.IntImm, E.FloatImm)) \
            and isinstance(e.value, (int, float, _np.integer, _np.floating)):
        # concrete literals only: an Imm can carry a traced scalar (weight
        # exprs folded from jit-traced Params), and float(tracer) raises
        return abs(float(e.value))
    if vtype.is_integer() and vtype.bits <= 16:
        return max(abs(vtype.min_value()), abs(vtype.max_value()))
    return None


def _dense_small_scatter(cur, op, garr, np_idx, vtype, identity, inner,
                         rdom_axes, vexpr=None):
    """Scatter whose data-dependent target dims are SMALL (histograms, bin
    reductions) as a dense compare-and-reduce over the rdom:
        out[.., k, ..] op= reduce_r(g[r, ..] where lin(r, ..) == k)
    Identity-indexed dims are batch dims (per-row histograms keep their row
    axis); only the data-dependent dims are flattened into the compared K.
    TPU scatters serialize per element (hist: 34ms/frame scatter vs 0.2ms
    compare-reduce measured on v5e). Reorderable ops only -- `set` with
    duplicate indices is order-sensitive."""
    nd = cur.ndim
    dd_np = [a for a in range(nd) if not identity[nd - 1 - a]]
    K = 1
    for a in dd_np:
        K *= cur.shape[a]
    lin = jnp.zeros((), jnp.int32)
    oob = jnp.zeros((), bool)
    for a in dd_np:                       # np-major flattening
        ia = jnp.asarray(np_idx[a], jnp.int32)
        lin = lin * cur.shape[a] + ia
        oob = oob | (ia < 0) | (ia >= cur.shape[a])
    lin = jnp.where(oob, K, lin)          # out-of-bounds writes drop
    red_np = tuple(inner.ndim - 1 - ax.rpos for ax in rdom_axes)
    import os as _os
    contrib = None
    red_elems = 1
    for a in red_np:
        red_elems *= garr.shape[a] if a < garr.ndim else 1
    kept_elems = max(1, garr.size // max(red_elems, 1))
    if op in ("add", "sub") and red_elems <= 64 and kept_elems > 4096:
        # batch-heavy histogram with a SMALL reduction (lens_blur's
        # per-pixel 32-sample offset histogram): unroll the reduction in
        # python with the K axis on lanes -- one fused accumulation pass.
        # Both the factored-MXU path (307K batched tiny matmuls) and the
        # all-at-once compare-reduce degenerate here (4.3 s / timeout
        # measured at (480,640,32)->361 on v5e); this form runs in the
        # compute-bound few-ms regime.
        if jnp.issubdtype(cur.dtype, jnp.floating):
            acc_t0 = jnp.float32
        else:
            acc_t0 = jnp.int32
        lin_b = jnp.broadcast_to(lin, jnp.broadcast_shapes(
            jnp.shape(lin), jnp.shape(garr)))
        g_b = jnp.broadcast_to(garr, lin_b.shape)
        # the K axis goes FIRST, not last: a trailing K (often ~16 bins)
        # would sit on the 128-lane minor axis and waste 7/8 of every VPU
        # op; leading-K keeps the batch x axis on lanes (bilateral_grid's
        # construction measured ~4x faster on v5e with K leading)
        ks_lead = jnp.arange(K, dtype=jnp.int32).reshape(
            (K,) + (1,) * (lin_b.ndim - len(red_np)))
        import itertools
        acc = None
        for pos in itertools.product(
                *[range(lin_b.shape[a]) for a in red_np]):
            sl = [slice(None)] * lin_b.ndim
            for a, i in zip(red_np, pos):
                sl[a] = i
            lin_s = lin_b[tuple(sl)]
            g_s = g_b[tuple(sl)]
            term = jnp.where(lin_s[None] == ks_lead,
                             g_s[None].astype(acc_t0),
                             jnp.zeros((), acc_t0))
            acc = term if acc is None else acc + term
        if op == "sub":
            acc = -acc
            op = "add"
        # move K to the trailing slot the unflatten code below expects
        # (the transpose runs on the small reduced output, not the full
        # (batch, K) tensor)
        contrib = jnp.moveaxis(acc, 0, -1)
    if contrib is None and op in ("add", "sub") \
            and K >= onehot_mxu.MIN_FACTOR_K \
            and kept_elems >= 256 and 128 <= red_elems \
            and _os.environ.get("HT_ROWHIST_KERNEL"):
        # block-diagonal MXU row-histogram kernel (ops/onehot_mxu.py
        # rowhist_blockdiag): standalone it beats the einsum path 2.4x
        # (0.226 vs ~0.55 ms for hist's 2560x1536 scatter on v5e), BUT a
        # pallas_call is a fusion boundary -- the bins operand must
        # MATERIALIZE in HBM, while the einsum path consumes bins fused
        # with the Y computation. Measured end-to-end on apps/hist the
        # boundary costs more than the kernel saves (0.96 vs 0.79 ms
        # total), so this is OPT-IN (HT_ROWHIST_KERNEL=1): it wins when
        # the bins are already materialized (an input or a compute_root
        # producer). Constant-value case only (g folds into a post-scale
        # of the counts).
        e = vexpr
        while isinstance(e, E.Cast):
            e = e.value
        gconst = None
        if isinstance(e, (E.IntImm, E.FloatImm)):
            gconst = float(e.value)
        if gconst is not None:
            # bf16-exactness via ml_dtypes (jnp.bfloat16(x) under an
            # active trace constructs a tracer, not a numpy scalar)
            import ml_dtypes
            import numpy as _np
            ok = (float(_np.float32(ml_dtypes.bfloat16(gconst))) == gconst
                  and abs(gconst) * red_elems < (1 << 24))
        else:
            ok = False
        if ok and not jnp.issubdtype(cur.dtype, jnp.floating):
            ok = gconst == int(gconst)
        if ok:
            lin_b = jnp.broadcast_to(lin, jnp.broadcast_shapes(
                jnp.shape(lin), jnp.shape(garr)))
            nd_g = lin_b.ndim
            dst = tuple(range(nd_g - len(red_np), nd_g))
            linm = jnp.moveaxis(lin_b, red_np, dst)
            kept_shape = linm.shape[:-len(red_np)]
            lin2 = linm.reshape((kept_elems, red_elems))
            try:
                interp = jax.default_backend() != "tpu"
                if not interp:
                    # plan-time compile probe (persistent-cached): a Mosaic
                    # rejection must surface HERE, where the factored-XLA
                    # fallback below still exists -- at whole-pipeline
                    # compile time nothing can fall back
                    from .ops.pallas_group import _probe_full_kernel
                    _probe_full_kernel(
                        lambda l: onehot_mxu.rowhist_blockdiag(
                            l, K, assume_in_range=True),
                        [jax.ShapeDtypeStruct(lin2.shape, jnp.int32)],
                        f"rowhist K={K}")
                # lin is already clamped to [0, K] (OOB -> K sentinel)
                counts = onehot_mxu.rowhist_blockdiag(
                    lin2, K, interpret=interp, assume_in_range=True)
                if gconst != 1.0:
                    counts = counts * jnp.float32(gconst)
                # op == "sub" stays: the caller computes cur - contrib
                contrib = counts.reshape(tuple(kept_shape) + (K,))
            except Exception:
                if _os.environ.get("HT_PALLAS_STRICT"):
                    raise
                contrib = None
    if contrib is None and op in ("add", "sub") \
            and K >= onehot_mxu.MIN_FACTOR_K and kept_elems <= 4096 \
            and not _os.environ.get("HT_NO_FACTORED_SCATTER"):
        # factored MXU histogram: two ~sqrt(K) one-hots + a batched matmul
        # replace the (grid, K) compare-reduce (see ops/onehot_mxu.py)
        if jnp.issubdtype(cur.dtype, jnp.floating):
            exact_ok = True
        else:
            n_red = 1
            for ax in rdom_axes:
                n_red *= ax.extent
            b = _value_abs_bound(vexpr, vtype) if vexpr is not None else None
            exact_ok = b is not None and b * n_red < (1 << 24)
        if exact_ok:
            # narrowest exact MXU operand width: the two one-hot operands
            # dominate HBM traffic. Measured on v5e (hist 1536x2560):
            # f32 1.01ms, bf16 0.55ms, int8 0.70ms -- bf16 wins (the s8
            # dot pays a layout conversion), so bf16 whenever the values
            # are exactly representable (integers |v| <= 256).
            mode = "f32"
            b2 = _value_abs_bound(vexpr, vtype) if vexpr is not None else None
            if b2 is not None:
                if vtype is not None and vtype.is_integer() \
                        and float(b2) == int(b2) and b2 <= 256:
                    mode = "bf16"
                elif float(_ml_dtypes.bfloat16(float(b2))) == float(b2):
                    # NB: jnp.bfloat16(x) binds convert_element_type in the
                    # AMBIENT trace (returns a tracer even for a python
                    # float under jit) -- the ml_dtypes scalar stays host
                    # bf16-exact magnitude bound only helps when the value
                    # itself is a constant (bound == |value|)
                    e = vexpr
                    while isinstance(e, E.Cast):
                        e = e.value
                    if isinstance(e, (E.IntImm, E.FloatImm)):
                        mode = "bf16"
            lin_b = jnp.broadcast_to(lin, jnp.broadcast_shapes(
                jnp.shape(lin), jnp.shape(garr)))
            contrib = onehot_mxu.scatter_add_factored(
                lin_b, garr, K, red_np, mode=mode)
    if contrib is None:
        # K leads here too (see the unrolled branch above): keep the
        # batch minor axis on the 128 lanes, reduce, then transpose the
        # small result
        lin_b = jnp.broadcast_to(lin, jnp.broadcast_shapes(
            jnp.shape(lin), jnp.shape(garr)))
        ks = jnp.arange(K, dtype=jnp.int32).reshape(
            (K,) + (1,) * lin_b.ndim)
        eq = lin_b[None] == ks
        gb = garr[None]
        red_lead = tuple(a + 1 for a in red_np)
        if jnp.issubdtype(cur.dtype, jnp.floating):
            acc_t = jnp.float32
        else:
            acc_t = jnp.int32
        if op in ("add", "sub"):
            contrib = jnp.sum(jnp.where(eq, gb, jnp.zeros((), garr.dtype)),
                              axis=red_lead, dtype=acc_t)
        elif op == "mul":
            contrib = jnp.prod(jnp.where(eq, gb, jnp.ones((), garr.dtype)),
                               axis=red_lead, dtype=acc_t)
        else:
            fill = jnp.asarray(_identity_for(op, vtype), garr.dtype)
            red = jnp.min if op == "min" else jnp.max
            contrib = red(jnp.where(eq, gb, fill), axis=red_lead)
        contrib = jnp.moveaxis(contrib, 0, -1)
    # contrib: (base grid dims, 1 at dd axes) + (K,); unflatten K into the
    # dd axes and fold each back into its np slot
    contrib = contrib.reshape(contrib.shape[:-1]
                              + tuple(cur.shape[a] for a in dd_np))
    for i in range(len(dd_np) - 1, -1, -1):
        src = nd + i
        p = dd_np[i]
        contrib = jnp.squeeze(contrib, axis=p)
        contrib = jnp.moveaxis(contrib, src - 1, p)
    contrib = contrib.astype(cur.dtype)
    if op == "add":
        return cur + contrib
    if op == "sub":
        return cur - contrib
    if op == "mul":
        return cur * contrib
    if op == "min":
        return jnp.minimum(cur, contrib)
    return jnp.maximum(cur, contrib)


def _general_scatter(func, d, current, base_ctx, inner, rdom_axes, ops,
                     mask):
    init_args = func._defs[0].args
    idx_arrays = []
    for j, a in enumerate(d.args):
        arr = materialize(evaluate(a, inner), inner)
        idx_arrays.append(arr)
    identity = [isinstance(a, E.Variable) and a.name == init_args[i].name
                for i, a in enumerate(d.args)]
    grid_axes = list(rdom_axes) + [
        base_ctx.axes[init_args[i].name]
        for i, ident in enumerate(identity) if ident]
    mins = [base_ctx.axes[v.name].min for v in init_args]
    ishape = full_shape(inner, grid_axes)
    np_idx = []
    for j in reversed(range(len(idx_arrays))):
        arr = jnp.asarray(idx_arrays[j]) - mins[j]
        np_idx.append(jnp.broadcast_to(arr, ishape))
    out = []
    for i, (op, g) in enumerate(ops):
        garr = materialize(evaluate(g, inner), inner)
        garr = jnp.broadcast_to(jnp.asarray(garr, dtype=current[i].dtype),
                                ishape)
        cur = current[i]
        this_idx = list(np_idx)
        if mask is not None:
            bmask = jnp.broadcast_to(mask, ishape)
            if op in ("add", "sub"):
                garr = jnp.where(bmask, garr, jnp.zeros_like(garr))
            elif op == "mul":
                garr = jnp.where(bmask, garr, jnp.ones_like(garr))
            elif op == "min":
                garr = jnp.where(
                    bmask, garr, jnp.full_like(
                        garr, d.values[i].dtype.max_value()))
            elif op == "max":
                garr = jnp.where(
                    bmask, garr, jnp.full_like(
                        garr, d.values[i].dtype.min_value()))
            else:  # set: push masked-out writes out of bounds (drop mode)
                this_idx = [jnp.where(bmask, ix, cur.shape[k])
                            for k, ix in enumerate(this_idx)]
        t = tuple(this_idx)
        nd_cur = cur.ndim
        k_dd = 1
        for a in range(nd_cur):
            if not identity[nd_cur - 1 - a]:
                k_dd *= cur.shape[a]
        # effective widening of the compare-reduce: the factored MXU path
        # (two ~sqrt(K) one-hots, ops/onehot_mxu.py) touches grid*2*sqrt(K)
        # elements, not grid*K -- gate on what will actually materialize
        _fact = (op in ("add", "sub") and k_dd >= onehot_mxu.MIN_FACTOR_K
                 and jnp.issubdtype(cur.dtype, jnp.floating))
        _eff_k = 2 * int(math.isqrt(k_dd - 1) + 1) if _fact else k_dd
        if op != "set" and rdom_axes and k_dd <= _DENSE_SCATTER_MAX \
                and _eff_k * garr.size <= (1 << 31):
            nv = _dense_small_scatter(cur, op, garr, this_idx,
                                      d.values[i].dtype, identity, inner,
                                      rdom_axes, vexpr=g)
            out.append(nv)
            continue
        if op == "add":
            nv = cur.at[t].add(garr, mode="drop")
        elif op == "sub":
            nv = cur.at[t].add(-garr, mode="drop")
        elif op == "mul":
            nv = cur.at[t].multiply(garr, mode="drop")
        elif op == "min":
            nv = cur.at[t].min(garr, mode="drop")
        elif op == "max":
            nv = cur.at[t].max(garr, mode="drop")
        else:
            nv = cur.at[t].set(garr, mode="drop")
        out.append(nv)
    return out


# ---------------------------------------------------------------------------
# outer sequential loop
# ---------------------------------------------------------------------------

class _SubRDom:
    """Residual reduction domain after binding one dim."""
    def __init__(self, dims):
        self.dims = dims
        self.predicates: List[Expr] = []
        self.name = "sub"


def _try_outer_loop(func, d, current, base_ctx: Ctx, rdom_axes):
    """Pick one small rdom dim to iterate sequentially (trace-unrolled); the
    residual update must classify densely, with self-reads proven disjoint
    from the writes via interval bounds (the ParallelRVar analog)."""
    from .func import Definition

    if not rdom_axes:
        return None
    values_selfs = [find_self_calls(v, func) for v in d.values]

    def resolver(name, args):
        if name == "param":
            return base_ctx.params.get(id(args[0]))
        obj, i = args[0], args[1]
        real = base_ctx.realizations.get(id(obj))
        if real is None:
            return None
        if name == "buffer_min":
            return real.mins[i]
        return real.arrays[0].shape[real.arrays[0].ndim - 1 - i]

    engine = BoundsEngine(resolver=resolver)

    # only the OUTERMOST rdom dim may be unrolled: the reference iterates
    # the first dim innermost, so peeling the last dim preserves update
    # application order (compositing's layer stack depends on it)
    for k, rax in [(len(rdom_axes) - 1, rdom_axes[-1])]:
        if rax.extent > 64:
            continue
        # scope for bounds: pure vars over box, other rvars over ranges.
        # Inside a Pallas kernel the axis mins are symbolic tile origins
        # (SymOff); disjointness is shift-invariant, so bound everything
        # in the tile-relative frame instead
        rel = any(not isinstance(a.min, int)
                  for a in base_ctx.axes.values())
        scope = {}
        for nm, a in base_ctx.axes.items():
            lo = 0 if rel else a.min
            scope[nm] = Interval(lo, lo + a.extent - 1)
        for j, a2 in enumerate(rdom_axes):
            if j != k:
                scope[a2.name] = Interval(a2.min, a2.min + a2.extent - 1)
        # disjointness: for every non-aligned self-call, some dim's read
        # interval must not intersect the write interval once r_k is a point
        ok = True
        for v, selfs in zip(d.values, values_selfs):
            for sc in selfs:
                if _aligned_self(sc, d.args):
                    continue
                disjoint_dim = False
                for j in range(len(d.args)):
                    for point in (rax.min, rax.min + rax.extent - 1):
                        sp = dict(scope)
                        sp[rax.name] = Interval(point, point)
                        w = engine.bounds(d.args[j], sp)
                        r = engine.bounds(sc.args[j], sp)
                        if w.hi < r.lo or r.hi < w.lo:
                            disjoint_dim = True
                    if disjoint_dim:
                        break
                if not disjoint_dim:
                    ok = False
                    break
            if not ok:
                break
        if not ok:
            continue
        # unroll the loop at trace time
        others = [a2 for j, a2 in enumerate(rdom_axes) if j != k]
        other_rvars = [rv for rv in d.rdom.dims if rv.name != rax.name]
        sub_rdom = _SubRDom(other_rvars) if other_rvars else None
        cur = list(current)
        init_args = func._defs[0].args
        for step in range(rax.extent):
            val = E.IntImm(E.Int(32), rax.min + step)
            sub = {rax.name: val}
            args2 = tuple(substitute(a, sub) if isinstance(a, Expr) else a
                          for a in d.args)
            vals2 = tuple(substitute(v, sub) for v in d.values)
            preds2 = [substitute(p, sub) for p in d.predicates]
            d2 = Definition.__new__(Definition)
            d2.args = args2
            d2.values = vals2
            d2.rdom = sub_rdom
            d2.predicates = preds2
            d2.schedule = d.schedule
            ctx2 = Ctx(base_ctx.ndim, base_ctx.axes, base_ctx.bindings,
                       dict(base_ctx.realizations), base_ctx.params,
                       trace=base_ctx.trace, sym_vals=base_ctx.sym_vals,
                       in_kernel=base_ctx.in_kernel)
            ctx2.shared = base_ctx.shared
            ctx2.realizations[id(func)] = Realized(
                cur, [base_ctx.axes[v.name].min for v in init_args],
                func.name)
            cur = apply_update(func, d2, cur, ctx2, allow_self_reads=True)
        return cur
    return None


# ---------------------------------------------------------------------------

def _sequential_update(func, d, current, base_ctx: Ctx, rdom_axes):
    """Fully general fallback: lax.fori_loop over the flattened rdom,
    scattering one (vectorized-over-pure-vars) write per iteration."""
    init_args = func._defs[0].args
    sizes = [a.extent for a in rdom_axes]
    mins = [a.min for a in rdom_axes]
    total = 1
    for s in sizes:
        total *= s
    box_mins = [base_ctx.axes[v.name].min for v in init_args]

    identity_dims = [
        isinstance(a, E.Variable) and a.name == init_args[i].name
        for i, a in enumerate(d.args)]

    def body(k, cur_tuple):
        cur_list = list(cur_tuple)
        bind = dict(base_ctx.bindings)
        rem = k
        for i in reversed(range(len(rdom_axes))):
            if sizes[i] > 0:
                bind[rdom_axes[i].name] = (rem % sizes[i]) + mins[i]
                rem = rem // sizes[i]
        ctx2 = base_ctx.with_bindings(bind)
        ctx2.realizations = dict(base_ctx.realizations)
        ctx2.realizations[id(func)] = Realized(
            cur_list, [base_ctx.axes[v.name].min for v in init_args],
            func.name)
        pred = None
        for p in d.predicates:
            pv = eval_array(p, ctx2)
            pred = pv if pred is None else jnp.logical_and(pred, pv)
        idx = []
        for j in reversed(range(len(d.args))):
            if identity_dims[j]:
                idx.append(slice(None))
            else:
                v = materialize(evaluate(d.args[j], ctx2), ctx2)
                idx.append(jnp.asarray(v).reshape(()) - box_mins[j])
        t = tuple(idx)
        news = []
        for i, v in enumerate(d.values):
            cur = cur_list[i]
            if _is_undef(v):
                news.append(cur)
                continue
            val = eval_array(v, ctx2)
            old = cur[t]
            val = jnp.broadcast_to(jnp.asarray(val, dtype=cur.dtype),
                                   old.shape)
            if pred is not None:
                val = jnp.where(pred, val, old)
            news.append(cur.at[t].set(val, mode="drop"))
        return tuple(news)

    if total == 0:
        return current
    out = jax.lax.fori_loop(0, total, body, tuple(current))
    return list(out)
