"""Expression IR.

A small, typed, side-effect-free scalar expression language, the analog of the
reference's Expr tree (reference: src/Expr.h:233-452, src/IR.h:91-1340). Nodes are
immutable Python objects; pipelines are DAGs of these built by operator overloading
on `Var`/`FuncRef`/`Expr`. Unlike the reference there are no vector Ramp/Broadcast
nodes: vectorization is implicit because evaluation is whole-array (VPU tiles).

Design: ~20 node kinds instead of ~50 — Load/Store/For/Allocate etc. do not exist
because lowering targets XLA/Pallas array programs, not an imperative loop IR.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

from .htypes import Bool, Float, Int, Type, UInt, match_types, type_of

__all__ = [
    "Expr", "IntImm", "FloatImm", "StringImm", "Variable", "Cast", "Reinterpret",
    "Binary", "Not", "Select", "Call", "Intrin", "Let", "Reduce",
    "to_expr", "const", "make_binary",
]


class HalideError(Exception):
    """Base error (reference: src/Error.h:232-245)."""


class CompileError(HalideError):
    """User pipeline error detected at trace/lowering time."""


class Expr:
    __slots__ = ("dtype",)
    _fields: Tuple[str, ...] = ()

    dtype: Type

    # identity hashing: structural equality is a semantic operator (==) so
    # hashing must not depend on it.
    __hash__ = object.__hash__

    # ---- children traversal (generic, used by visitors) -----------------
    def children(self):
        for f in self._fields:
            v = getattr(self, f)
            if isinstance(v, Expr):
                yield v
            elif isinstance(v, (list, tuple)):
                for x in v:
                    if isinstance(x, Expr):
                        yield x

    # ---- arithmetic ------------------------------------------------------
    def __add__(self, o):
        return make_binary("add", self, o)

    def __radd__(self, o):
        return make_binary("add", o, self)

    def __sub__(self, o):
        return make_binary("sub", self, o)

    def __rsub__(self, o):
        return make_binary("sub", o, self)

    def __mul__(self, o):
        return make_binary("mul", self, o)

    def __rmul__(self, o):
        return make_binary("mul", o, self)

    def __truediv__(self, o):
        return make_binary("div", self, o)

    def __rtruediv__(self, o):
        return make_binary("div", o, self)

    def __floordiv__(self, o):
        return make_binary("div", self, o)

    def __rfloordiv__(self, o):
        return make_binary("div", o, self)

    def __mod__(self, o):
        return make_binary("mod", self, o)

    def __rmod__(self, o):
        return make_binary("mod", o, self)

    def __pow__(self, o):
        from .iroperator import pow as _pow
        return _pow(self, o)

    def __rpow__(self, o):
        from .iroperator import pow as _pow
        return _pow(o, self)

    def __neg__(self):
        return make_binary("sub", const(0, self.dtype), self)

    def __pos__(self):
        return self

    def __abs__(self):
        from .iroperator import abs as _abs
        return _abs(self)

    def __lshift__(self, o):
        return make_binary("shl", self, o)

    def __rlshift__(self, o):
        return make_binary("shl", o, self)

    def __rshift__(self, o):
        return make_binary("shr", self, o)

    def __rrshift__(self, o):
        return make_binary("shr", o, self)

    def __and__(self, o):
        return make_binary("bitand", self, o)

    def __rand__(self, o):
        return make_binary("bitand", o, self)

    def __or__(self, o):
        return make_binary("bitor", self, o)

    def __ror__(self, o):
        return make_binary("bitor", o, self)

    def __xor__(self, o):
        return make_binary("bitxor", self, o)

    def __rxor__(self, o):
        return make_binary("bitxor", o, self)

    def __invert__(self):
        return Intrin("bitnot", self.dtype, (self,))

    # ---- comparisons (build IR, not bool!) -------------------------------
    def __eq__(self, o):  # type: ignore[override]
        return make_binary("eq", self, o)

    def __ne__(self, o):  # type: ignore[override]
        return make_binary("ne", self, o)

    def __lt__(self, o):
        return make_binary("lt", self, o)

    def __le__(self, o):
        return make_binary("le", self, o)

    def __gt__(self, o):
        return make_binary("gt", self, o)

    def __ge__(self, o):
        return make_binary("ge", self, o)

    def __bool__(self):
        raise CompileError(
            "cannot convert a traced Expr to a Python bool; use hl.select() for "
            "conditionals and hl.logical_and/or for predicates"
        )

    def __repr__(self):
        from .printer import expr_to_str
        return expr_to_str(self)


# ---------------------------------------------------------------------------
# leaf nodes
# ---------------------------------------------------------------------------

class IntImm(Expr):
    __slots__ = ("value",)
    _fields = ()

    def __init__(self, dtype: Type, value: int):
        self.dtype = dtype
        if dtype.bits < 64:
            if dtype.is_uint():
                value = value & ((1 << dtype.bits) - 1)
            else:
                m = 1 << dtype.bits
                value = ((value + (m >> 1)) % m) - (m >> 1)
        self.value = int(value)


class FloatImm(Expr):
    __slots__ = ("value",)
    _fields = ()

    def __init__(self, dtype: Type, value: float):
        self.dtype = dtype
        self.value = float(value)


class StringImm(Expr):
    __slots__ = ("value",)
    _fields = ()

    def __init__(self, value: str):
        from .htypes import Handle
        self.dtype = Handle()
        self.value = value


class Variable(Expr):
    """A named scalar variable: a pure loop Var, an RVar, or a Param."""
    __slots__ = ("name",)
    _fields = ()

    def __init__(self, name: str, dtype: Type = Int(32)):
        self.dtype = dtype
        self.name = name


# ---------------------------------------------------------------------------
# operations
# ---------------------------------------------------------------------------

class Cast(Expr):
    __slots__ = ("value",)
    _fields = ("value",)

    def __init__(self, dtype: Type, value: Expr):
        self.dtype = dtype
        self.value = value


class Reinterpret(Expr):
    __slots__ = ("value",)
    _fields = ("value",)

    def __init__(self, dtype: Type, value: Expr):
        if dtype.bits != value.dtype.bits:
            raise CompileError(
                f"reinterpret requires equal bit width: {value.dtype} -> {dtype}")
        self.dtype = dtype
        self.value = value


_COMPARISONS = frozenset(["eq", "ne", "lt", "le", "gt", "ge"])
_BOOL_OPS = frozenset(["and", "or"])
_SHIFTS = frozenset(["shl", "shr"])
ARITH_OPS = frozenset(["add", "sub", "mul", "div", "mod", "min", "max",
                       "bitand", "bitor", "bitxor"])


class Binary(Expr):
    __slots__ = ("op", "a", "b")
    _fields = ("a", "b")

    def __init__(self, op: str, a: Expr, b: Expr, dtype: Optional[Type] = None):
        self.op = op
        self.a = a
        self.b = b
        if dtype is None:
            dtype = Bool() if op in _COMPARISONS or op in _BOOL_OPS else a.dtype
        self.dtype = dtype


class Not(Expr):
    __slots__ = ("a",)
    _fields = ("a",)

    def __init__(self, a: Expr):
        self.dtype = Bool()
        self.a = a


class Select(Expr):
    __slots__ = ("cond", "true_value", "false_value")
    _fields = ("cond", "true_value", "false_value")

    def __init__(self, cond: Expr, tv: Expr, fv: Expr):
        self.cond = cond
        self.true_value = tv
        self.false_value = fv
        self.dtype = tv.dtype


class Call(Expr):
    """A point access into another stage: Func, input buffer, or extern stage.

    (reference: src/IR.h Call node; call types Halide/Image/Extern.)
    """
    __slots__ = ("target", "args", "value_index")
    _fields = ("args",)

    def __init__(self, target: Any, args: Sequence[Expr], value_index: int = 0,
                 dtype: Optional[Type] = None):
        self.target = target          # Func | InputBuffer | ImageParam
        self.args = tuple(args)
        self.value_index = value_index
        if dtype is None:
            dtype = target.output_type(value_index)
        self.dtype = dtype


class Intrin(Expr):
    """Pure intrinsic call (math library, lerp, popcount, random, ...).

    (reference: src/IROperator.h math library surface.)
    """
    __slots__ = ("name", "args")
    _fields = ("args",)

    def __init__(self, name: str, dtype: Type, args: Sequence[Any]):
        self.name = name
        self.dtype = dtype
        self.args = tuple(args)


class Let(Expr):
    __slots__ = ("name", "value", "body")
    _fields = ("value", "body")

    def __init__(self, name: str, value: Expr, body: Expr):
        self.name = name
        self.value = value
        self.body = body
        self.dtype = body.dtype


class Reduce(Expr):
    """Inline reduction over an RDom (reference: src/InlineReductions.h:40-70).

    op in {'sum','product','minimum','maximum','argmin','argmax'}. For arg* ops
    value_index selects coordinates (0..n-1) then the value (n).
    """
    __slots__ = ("op", "value", "rdom", "where", "value_index")
    _fields = ("value", "where")

    def __init__(self, op: str, value: Expr, rdom, where: Optional[Expr],
                 value_index: int = 0, dtype: Optional[Type] = None):
        self.op = op
        self.value = value
        self.rdom = rdom
        self.where = where
        self.value_index = value_index
        self.dtype = dtype if dtype is not None else value.dtype


# ---------------------------------------------------------------------------
# construction helpers
# ---------------------------------------------------------------------------

def const(v, dtype: Type) -> Expr:
    if dtype.is_float():
        return FloatImm(dtype, float(v))
    return IntImm(dtype, int(v))


def to_expr(v, hint: Optional[Type] = None) -> Expr:
    """Coerce a Python value into an Expr. Bare ints adapt to `hint` when legal
    (the reference coerces constants to the other operand's type)."""
    if isinstance(v, Expr):
        return v
    if hasattr(v, "_to_expr"):          # FuncRef / Var-like wrappers
        return v._to_expr()
    if isinstance(v, bool):
        return IntImm(Bool(), int(v))
    if isinstance(v, int):
        if hint is not None and hint.is_integer() and hint.can_represent(v):
            return IntImm(hint, v)
        if hint is not None and hint.is_float():
            return FloatImm(hint, float(v))
        if not Int(32).can_represent(v):
            return IntImm(Int(64), v)
        return IntImm(Int(32), v)
    if isinstance(v, float):
        if hint is not None and hint.is_float():
            return FloatImm(hint, v)
        return FloatImm(Float(32), v)
    if isinstance(v, str):
        return StringImm(v)
    try:
        import numpy as np
        if isinstance(v, np.generic):
            t = type_of(v.dtype)
            return const(v.item(), t)
    except Exception:
        pass
    raise CompileError(f"cannot convert {v!r} to Expr")


def _unify(a, b) -> Tuple[Expr, Expr]:
    ea = a if isinstance(a, Expr) else None
    eb = b if isinstance(b, Expr) else None
    if ea is None and eb is None:
        ea, eb = to_expr(a), to_expr(b)
    elif ea is None:
        ea = to_expr(a, hint=eb.dtype)
    elif eb is None:
        eb = to_expr(b, hint=ea.dtype)
    if ea.dtype != eb.dtype:
        t = match_types(ea.dtype, eb.dtype)
        if ea.dtype != t:
            ea = Cast(t, ea)
        if eb.dtype != t:
            eb = Cast(t, eb)
    return ea, eb


def make_binary(op: str, a, b) -> Expr:
    if not isinstance(a, Expr) and hasattr(a, "_to_expr"):
        a = a._to_expr()
    if not isinstance(b, Expr) and hasattr(b, "_to_expr"):
        b = b._to_expr()
    if op in _SHIFTS:
        a = to_expr(a)
        b = to_expr(b, hint=a.dtype)
        if isinstance(a, IntImm) and isinstance(b, IntImm) and b.value >= 0:
            if op == "shl":
                return IntImm(a.dtype, a.value << b.value)
            return IntImm(a.dtype, a.value >> b.value)
        return Binary(op, a, b, dtype=a.dtype)
    a, b = _unify(a, b)
    # light constant folding keeps index algebra small for bounds inference
    if isinstance(a, IntImm) and isinstance(b, IntImm):
        folded = _fold_int(op, a, b)
        if folded is not None:
            return folded
    return Binary(op, a, b)


def _fold_int(op: str, a: IntImm, b: IntImm) -> Optional[Expr]:
    x, y = a.value, b.value
    t = a.dtype
    if op == "add":
        return IntImm(t, x + y)
    if op == "sub":
        return IntImm(t, x - y)
    if op == "mul":
        return IntImm(t, x * y)
    if op == "div":
        return IntImm(t, 0 if y == 0 else _euclid_div(x, y))
    if op == "mod":
        return IntImm(t, 0 if y == 0 else x - y * _euclid_div(x, y))
    if op == "min":
        return IntImm(t, min(x, y))
    if op == "max":
        return IntImm(t, max(x, y))
    if op in _COMPARISONS:
        r = {"eq": x == y, "ne": x != y, "lt": x < y,
             "le": x <= y, "gt": x > y, "ge": x >= y}[op]
        return IntImm(Bool(), int(r))
    return None


def _euclid_div(x: int, y: int) -> int:
    # reference semantics: int division rounds toward negative infinity
    # (reference: src/IROperator.h div_imp) — Python's // already does this.
    return x // y
