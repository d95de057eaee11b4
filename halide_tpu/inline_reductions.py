"""Inline reductions: sum/product/maximum/minimum/argmin/argmax
(reference: src/InlineReductions.h:40-70). These build Reduce nodes the
evaluator turns into masked jnp reductions over the RDom axes."""
from __future__ import annotations

from typing import Optional

from . import expr as E
from .expr import CompileError, Expr, to_expr
from .htypes import Int
from .rdom import RDom, RVar, collect_rdom


def _norm_args(a, b):
    """Accept sum(e), sum(r, e), sum(e, name)."""
    rd = None
    if isinstance(a, RDom):
        rd = a
        e = to_expr(b)
    elif isinstance(a, RVar) and b is not None and not isinstance(b, str):
        rd = a.rdom
        e = to_expr(b)
    else:
        e = to_expr(a)
    if rd is None:
        rd = collect_rdom([e])
        if rd is None:
            raise CompileError("inline reduction: expression uses no RDom")
    return rd, e


def sum(a, b=None, name: Optional[str] = None) -> Expr:
    rd, e = _norm_args(a, b)
    return E.Reduce("sum", e, rd, None)


def product(a, b=None, name: Optional[str] = None) -> Expr:
    rd, e = _norm_args(a, b)
    return E.Reduce("product", e, rd, None)


def maximum(a, b=None, name: Optional[str] = None) -> Expr:
    rd, e = _norm_args(a, b)
    return E.Reduce("maximum", e, rd, None)


def minimum(a, b=None, name: Optional[str] = None) -> Expr:
    rd, e = _norm_args(a, b)
    return E.Reduce("minimum", e, rd, None)


class _ArgTuple(tuple):
    """Result of argmin/argmax: coords + value, indexable like a Tuple."""


def argmax(a, b=None, name: Optional[str] = None):
    rd, e = _norm_args(a, b)
    n = len(rd.dims)
    parts = [E.Reduce("argmax", e, rd, None, value_index=i,
                      dtype=Int(32) if i < n else e.dtype)
             for i in range(n + 1)]
    return _ArgTuple(parts)


def argmin(a, b=None, name: Optional[str] = None):
    rd, e = _norm_args(a, b)
    n = len(rd.dims)
    parts = [E.Reduce("argmin", e, rd, None, value_index=i,
                      dtype=Int(32) if i < n else e.dtype)
             for i in range(n + 1)]
    return _ArgTuple(parts)
