"""Generic IR traversal (reference: src/IRVisitor.h, src/IRMutator.h,
src/Substitute.h, src/FindCalls.h)."""
from __future__ import annotations

from typing import Callable, Dict, Optional

from . import expr as E
from .expr import Expr


def mutate(e: Expr, fn: Callable[[Expr], Optional[Expr]],
           memo: Optional[dict] = None) -> Expr:
    """Post-order rebuild. `fn` is applied to each rebuilt node; returning None
    keeps the node."""
    if memo is None:
        memo = {}
    key = id(e)
    if key in memo:
        return memo[key]
    r = _rebuild(e, lambda c: mutate(c, fn, memo))
    out = fn(r)
    if out is None:
        out = r
    memo[key] = out
    return out


def _rebuild(e: Expr, rec) -> Expr:
    if isinstance(e, (E.IntImm, E.FloatImm, E.StringImm, E.Variable)):
        return e
    if isinstance(e, E.Cast):
        v = rec(e.value)
        return e if v is e.value else E.Cast(e.dtype, v)
    if isinstance(e, E.Reinterpret):
        v = rec(e.value)
        return e if v is e.value else E.Reinterpret(e.dtype, v)
    if isinstance(e, E.Binary):
        a, b = rec(e.a), rec(e.b)
        return e if (a is e.a and b is e.b) else E.Binary(e.op, a, b, e.dtype)
    if isinstance(e, E.Not):
        a = rec(e.a)
        return e if a is e.a else E.Not(a)
    if isinstance(e, E.Select):
        c, t, f = rec(e.cond), rec(e.true_value), rec(e.false_value)
        if c is e.cond and t is e.true_value and f is e.false_value:
            return e
        return E.Select(c, t, f)
    if isinstance(e, E.Call):
        args = tuple(rec(a) for a in e.args)
        if all(a is b for a, b in zip(args, e.args)):
            return e
        return E.Call(e.target, args, e.value_index, e.dtype)
    if isinstance(e, E.Intrin):
        args = tuple(rec(a) if isinstance(a, Expr) else a for a in e.args)
        if all(a is b for a, b in zip(args, e.args)):
            return e
        return E.Intrin(e.name, e.dtype, args)
    if isinstance(e, E.Let):
        v, b = rec(e.value), rec(e.body)
        if v is e.value and b is e.body:
            return e
        return E.Let(e.name, v, b)
    if isinstance(e, E.Reduce):
        v = rec(e.value)
        w = rec(e.where) if e.where is not None else None
        if v is e.value and w is e.where:
            return e
        return E.Reduce(e.op, v, e.rdom, w, e.value_index, e.dtype)
    return e


def walk(e: Expr, fn: Callable[[Expr], None], seen: Optional[set] = None) -> None:
    if seen is None:
        seen = set()
    if id(e) in seen:
        return
    seen.add(id(e))
    fn(e)
    for c in e.children():
        walk(c, fn, seen)


def substitute(e: Expr, bindings: Dict[str, Expr]) -> Expr:
    """Replace free Variables by name."""
    if not bindings:
        return e

    def fn(n):
        if isinstance(n, E.Variable) and n.name in bindings:
            return bindings[n.name]
        return None

    return mutate(e, fn)


def find_call_targets(e: Expr) -> list:
    """All distinct Call targets in `e`, in first-seen order
    (reference: src/FindCalls.cpp)."""
    out, seen = [], set()

    def fn(n):
        if isinstance(n, E.Call) and id(n.target) not in seen:
            seen.add(id(n.target))
            out.append(n.target)

    walk(e, fn)
    return out


def find_variables(e: Expr) -> list:
    out, seen = [], set()

    def fn(n):
        if isinstance(n, E.Variable) and n.name not in seen:
            seen.add(n.name)
            out.append(n)

    walk(e, fn)
    return out


def expr_uses_var(e: Expr, name: str) -> bool:
    found = [False]

    def fn(n):
        if isinstance(n, E.Variable) and n.name == name:
            found[0] = True

    walk(e, fn)
    return found[0]


def exprs_equal(a, b) -> bool:
    """Structural equality (reference: src/IREquality.cpp)."""
    if a is b:
        return True
    if type(a) is not type(b):
        return False
    if isinstance(a, (E.IntImm, E.FloatImm)):
        return a.dtype == b.dtype and a.value == b.value
    if isinstance(a, E.StringImm):
        return a.value == b.value
    if isinstance(a, E.Variable):
        return a.name == b.name
    if isinstance(a, (E.Cast, E.Reinterpret)):
        return a.dtype == b.dtype and exprs_equal(a.value, b.value)
    if isinstance(a, E.Binary):
        return (a.op == b.op and exprs_equal(a.a, b.a)
                and exprs_equal(a.b, b.b))
    if isinstance(a, E.Not):
        return exprs_equal(a.a, b.a)
    if isinstance(a, E.Select):
        return (exprs_equal(a.cond, b.cond)
                and exprs_equal(a.true_value, b.true_value)
                and exprs_equal(a.false_value, b.false_value))
    if isinstance(a, E.Call):
        return (a.target is b.target and a.value_index == b.value_index
                and len(a.args) == len(b.args)
                and all(exprs_equal(x, y) for x, y in zip(a.args, b.args)))
    if isinstance(a, E.Intrin):
        return (a.name == b.name and len(a.args) == len(b.args)
                and all((exprs_equal(x, y) if isinstance(x, E.Expr) else x == y)
                        if isinstance(x, E.Expr) == isinstance(y, E.Expr)
                        else False
                        for x, y in zip(a.args, b.args)))
    if isinstance(a, E.Let):
        return (a.name == b.name and exprs_equal(a.value, b.value)
                and exprs_equal(a.body, b.body))
    if isinstance(a, E.Reduce):
        return (a.op == b.op and a.rdom is b.rdom
                and a.value_index == b.value_index
                and exprs_equal(a.value, b.value))
    return False
