"""Update-definition evaluation.

The TPU lowering of the reference's reduction machinery (reference:
src/Func.h update defs, src/Associativity.cpp, SURVEY.md §2.5 "Reduction
parallelism"). Update definitions are classified into array-parallel forms:

- dense combine   f(x) = f(x) op g(r, x)      -> masked reduce over rdom axes
- scan            f(x, r) = a*f(x, r-1) + b   -> associative scan along r
                  f(x, r) = op(f(x, r-1), g)  -> segmented op-scan
- scatter         f(e(r)) = f(e(r)) op v(r)   -> jnp scatter-add/min/max
- overwrite       f(x) = g(x)                 -> whole-array assignment
- sequential      anything else               -> lax.fori_loop over the rdom

The classification mirrors what the reference proves with its associativity
table, but the *execution* is jnp/XLA array ops, not loop nests.
"""
from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from . import expr as E
from .expr import CompileError, Expr
from .eval_jnp import (AVal, Axis, Ctx, Realized, _static_int, eval_array,
                       evaluate, full_shape, materialize)
from .visitors import exprs_equal, walk

_COMBINE_OPS = ("add", "sub", "mul", "min", "max")


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


def _linear_decompose(value: Expr, func, self_call: E.Call):
    """value == a * self + b with a, b free of self (structural linearity).
    Returns (a_expr, b_expr) as Exprs or None. Used for linear scans."""
    from .iroperator import select as hselect

    def rec(e) -> Optional[Tuple[Expr, Expr]]:
        if isinstance(e, E.Call) and e.target is func:
            if exprs_equal(e, self_call):
                one = E.const(1, e.dtype)
                zero = E.const(0, e.dtype)
                return (one, zero)
            return None
        if not find_self_calls(e, func):
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
                if not find_self_calls(e.a, func):
                    return (e.a * ab, e.a * bb)
                if not find_self_calls(e.b, func):
                    return (aa * e.b, ba * e.b)
                return None
            if e.op == "div" and not find_self_calls(e.b, func):
                return (aa / e.b, ba / e.b)
            return None
        if isinstance(e, E.Select) and not find_self_calls(e.cond, func):
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


def apply_update(func, d, current: List, base_ctx: Ctx) -> List:
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
        return _scatter_update(func, d, current, base_ctx, rdom_axes=[])

    rdom_axes = _resolve_rdom(d, base_ctx)

    if aligned:
        r = _try_dense_combine(func, d, current, base_ctx, rdom_axes)
        if r is not None:
            return r
    else:
        r = _try_scan(func, d, current, base_ctx, rdom_axes)
        if r is not None:
            return r
        r = _scatter_update(func, d, current, base_ctx, rdom_axes)
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
        arr = jnp.broadcast_to(arr, shape).astype(current[i].dtype)
        if mask is not None:
            arr = jnp.where(jnp.broadcast_to(mask, shape), arr, current[i])
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
            # evaluate at the last rdom iteration
            bind = dict(inner.bindings)
            for a in rdom_axes:
                bind[a.name] = AVal({}, a.min + a.extent - 1)
            arr = eval_array(g, base_ctx.with_bindings(bind))
            out.append(jnp.broadcast_to(arr, shape).astype(current[i].dtype))
            continue
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
        red = red.astype(current[i].dtype)
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

def _try_scan(func, d, current, base_ctx: Ctx, rdom_axes):
    """f(..., r, ...) = a*f(..., r-1, ...) + b   or   op(f(r-1), g)."""
    if len(rdom_axes) != 1:
        return None
    rax = rdom_axes[0]
    rname = rax.name
    # locate the scanned dim: LHS arg == bare rvar; all others bare pure vars
    scan_dim = None
    for i, a in enumerate(d.args):
        if isinstance(a, E.Variable) and a.name == rname:
            if scan_dim is not None:
                return None
            scan_dim = i
        elif isinstance(a, E.Variable) and not isinstance(a, type(None)):
            continue
        else:
            return None
    if scan_dim is None:
        return None
    init_args = func._defs[0].args
    for i, a in enumerate(d.args):
        if i != scan_dim and a.name != init_args[i].name:
            return None
    if len(d.values) != 1:
        return None   # tuple scans -> sequential
    value = d.values[0]
    self_calls = find_self_calls(value, func)
    if not self_calls:
        return None
    # all self-calls must be the same r-1 or r+1 shifted access
    shift = None
    ref = self_calls[0]
    for sc in self_calls:
        if not exprs_equal(sc, ref):
            return None
    for i, a in enumerate(ref.args):
        if i == scan_dim:
            s = _shift_of(a, rname)
            if s not in (-1, 1):
                return None
            shift = s
        else:
            if not (isinstance(a, E.Variable) and a.name == d.args[i].name):
                return None
    lin = _linear_decompose(value, func, ref)
    opscan = None
    if lin is None:
        if isinstance(value, E.Binary) and value.op in ("min", "max"):
            a, b = value.a, value.b
            if exprs_equal(a, ref) and not find_self_calls(b, func):
                opscan = (value.op, b)
            elif exprs_equal(b, ref) and not find_self_calls(a, func):
                opscan = (value.op, a)
        if opscan is None:
            return None

    inner = base_ctx.extended([rax])
    mask = _eval_mask(d.predicates, inner)
    cur = current[0]
    dtype = cur.dtype
    nd = cur.ndim
    # np axis of the scanned pipeline dim within the full array
    scan_np = nd - 1 - scan_dim
    # the rdom spans [rax.min, rax.min+extent-1] in pipeline coords; in array
    # coords subtract the box min of that dim
    ax = base_ctx.axes[init_args[scan_dim].name]
    arr_lo = rax.min - ax.min
    n = rax.extent
    if shift == 1:
        # backward scan: reverse everything, run forward, reverse back
        pass

    # layout: full inner shape but with the scanned pipeline dim held at 1
    # (the scan var r replaces that dim; its pure var cannot appear in the
    # update, so evaluated arrays are always size 1 there)
    layout_axes = [a for nm, a in inner.axes.items()
                   if nm != init_args[scan_dim].name]
    inner_shape = full_shape(inner, layout_axes)
    r_np_inner = inner.ndim - 1 - rax.rpos

    def to_scan_layout(x):
        """inner-ctx array -> full array layout with r occupying the scan dim."""
        x = jnp.broadcast_to(x, inner_shape)
        x = jnp.moveaxis(x, r_np_inner, 0)          # (n, ...base shape w/ 1)
        x = x.reshape((n,) + tuple(x.shape[-nd:]))
        x = jnp.squeeze(x, axis=1 + scan_np)        # drop the size-1 scan dim
        x = jnp.moveaxis(x, 0, scan_np)             # r takes its place
        return x.astype(dtype)

    init_slice_idx = arr_lo - 1 if shift == -1 else arr_lo + n
    idx = [slice(None)] * nd
    idx[scan_np] = slice(init_slice_idx, init_slice_idx + 1)
    init_vals = cur[tuple(idx)]                       # size-1 along scan dim
    span = [slice(None)] * nd
    span[scan_np] = slice(arr_lo, arr_lo + n)
    cur_span = cur[tuple(span)]

    if lin is not None:
        a_e, b_e = lin
        a_arr = to_scan_layout(eval_array(a_e, inner))
        b_arr = to_scan_layout(eval_array(b_e, inner))
        if mask is not None:
            m = to_scan_layout(_bool_layout(mask, inner))
            a_arr = jnp.where(m, a_arr, jnp.zeros_like(a_arr))
            b_arr = jnp.where(m, b_arr, cur_span)
        if shift == 1:
            a_arr = jnp.flip(a_arr, scan_np)
            b_arr = jnp.flip(b_arr, scan_np)
        # prepend an identity element carrying the initial value
        a_full = jnp.concatenate(
            [jnp.zeros_like(init_vals), a_arr], axis=scan_np)
        b_full = jnp.concatenate([init_vals, b_arr], axis=scan_np)

        def combine(l, r):
            (al, bl), (ar, br) = l, r
            return (ar * al, ar * bl + br)

        _, res = jax.lax.associative_scan(
            combine, (a_full, b_full), axis=scan_np)
        res = jax.lax.slice_in_dim(res, 1, n + 1, axis=scan_np)
        if shift == 1:
            res = jnp.flip(res, scan_np)
    else:
        op, g = opscan
        fn = jnp.minimum if op == "min" else jnp.maximum
        g_arr = to_scan_layout(eval_array(g, inner))
        if mask is not None:
            m = to_scan_layout(_bool_layout(mask, inner))
            seg_reset = jnp.logical_not(m)
            u = jnp.where(m, g_arr, cur_span)
        else:
            seg_reset = jnp.zeros(g_arr.shape, dtype=bool)
            u = g_arr
        if shift == 1:
            seg_reset = jnp.flip(seg_reset, scan_np)
            u = jnp.flip(u, scan_np)
        s_full = jnp.concatenate(
            [jnp.zeros(init_vals.shape, dtype=bool), seg_reset], axis=scan_np)
        u_full = jnp.concatenate([init_vals, u], axis=scan_np)

        def combine(l, r):
            (sl, ul), (sr, ur) = l, r
            return (jnp.logical_or(sl, sr), jnp.where(sr, ur, fn(ul, ur)))

        _, res = jax.lax.associative_scan(
            combine, (s_full, u_full), axis=scan_np)
        res = jax.lax.slice_in_dim(res, 1, n + 1, axis=scan_np)
        if shift == 1:
            res = jnp.flip(res, scan_np)

    new = jax.lax.dynamic_update_slice_in_dim(
        cur, res.astype(dtype), arr_lo, axis=scan_np)
    return [new]


def _bool_layout(mask, inner):
    return jnp.broadcast_to(mask, full_shape(inner, list(inner.axes.values())))


def _shift_of(e: Expr, rname: str) -> Optional[int]:
    """e == r + const (coeff 1): return const."""
    if isinstance(e, E.Variable) and e.name == rname:
        return 0
    if isinstance(e, E.Binary) and e.op == "add":
        if isinstance(e.a, E.Variable) and e.a.name == rname and \
                isinstance(e.b, E.IntImm):
            return e.b.value
        if isinstance(e.b, E.Variable) and e.b.name == rname and \
                isinstance(e.a, E.IntImm):
            return e.a.value
    if isinstance(e, E.Binary) and e.op == "sub":
        if isinstance(e.a, E.Variable) and e.a.name == rname and \
                isinstance(e.b, E.IntImm):
            return -e.b.value
    return None


# ---------------------------------------------------------------------------

def _scatter_update(func, d, current, base_ctx: Ctx, rdom_axes):
    """LHS has computed (possibly data-dependent) indices -> jnp scatter."""
    inner = base_ctx.extended(rdom_axes) if rdom_axes else base_ctx
    init_args = func._defs[0].args
    # classify values: self-combine (accumulate) or self-free (set)
    ops = []
    for i, v in enumerate(d.values):
        if _is_undef(v):
            return None
        dc = _decompose_combine(v, func, d.args, i)
        if dc is not None and dc[0] in ("add", "sub", "mul", "min", "max"):
            ops.append(dc)
        elif not find_self_calls(v, func):
            ops.append(("set", v))
        else:
            return None
    mask = _eval_mask(d.predicates, inner)
    # index arrays per pipeline dim
    idx_arrays = []
    for j, a in enumerate(d.args):
        arr = materialize(evaluate(a, inner), inner)
        idx_arrays.append(arr)
    # the scatter grid spans the rdom axes plus the identity (bare pure var)
    # dims only — pure axes not written along must not appear, or every write
    # would be replicated across them
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
            if op in ("add", "sub"):
                garr = jnp.where(mask, garr, jnp.zeros_like(garr))
            elif op == "mul":
                garr = jnp.where(mask, garr, jnp.ones_like(garr))
            elif op == "min":
                garr = jnp.where(
                    mask, garr, jnp.full_like(garr,
                                              d.values[i].dtype.max_value()))
            elif op == "max":
                garr = jnp.where(
                    mask, garr, jnp.full_like(garr,
                                              d.values[i].dtype.min_value()))
            else:  # set: push masked-out writes out of bounds (drop mode)
                this_idx = [jnp.where(mask, ix, cur.shape[k])
                            for k, ix in enumerate(this_idx)]
        t = tuple(this_idx)
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

def _sequential_update(func, d, current, base_ctx: Ctx, rdom_axes):
    """Fully general fallback: lax.fori_loop over the flattened rdom,
    scattering one (vectorized-over-pure-vars) write per iteration."""
    init_args = func._defs[0].args
    sizes = [a.extent for a in rdom_axes]
    mins = [a.min for a in rdom_axes]
    total = 1
    for s in sizes:
        total *= s
    nd = current[0].ndim if current else 0
    box_mins = [base_ctx.axes[v.name].min for v in init_args]

    identity_dims = [
        isinstance(a, E.Variable) and a.name == init_args[i].name
        for i, a in enumerate(d.args)]

    def body(k, cur_tuple):
        cur_list = list(cur_tuple)
        # bind rvars to scalars
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
        # predicate
        pred = None
        for p in d.predicates:
            pv = eval_array(p, ctx2)
            pred = pv if pred is None else jnp.logical_and(pred, pv)
        # index tuple (np order: reversed dims)
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
