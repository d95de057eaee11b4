"""User-facing expression library.

The analog of the reference's IROperator.h surface (reference: src/IROperator.h,
1,764 LoC): select/clamp/lerp/mux, the math library, widening/saturating ops,
random numbers, likely/require/print_when.
"""
from __future__ import annotations

import builtins
from typing import Optional

from . import expr as E
from .expr import (Binary, Cast, CompileError, Expr, Intrin, Not, Select,
                   const, make_binary, to_expr)
from .htypes import BFloat, Bool, Float, Int, Type, UInt, match_types

__all__ = [
    "cast", "select", "clamp", "min", "max", "abs", "absd", "lerp", "mux",
    "sqrt", "fast_sqrt", "rsqrt", "fast_inverse", "fast_inverse_sqrt",
    "exp", "fast_exp", "log", "fast_log", "pow", "fast_pow",
    "floor", "ceil", "round", "trunc", "fract",
    "sin", "cos", "tan", "asin", "acos", "atan", "atan2",
    "sinh", "cosh", "tanh", "asinh", "acosh", "atanh", "hypot", "erf",
    "is_nan", "is_inf", "is_finite",
    "logical_and", "logical_or", "logical_not",
    "likely", "likely_if_innermost", "strict_float", "require", "print_when",
    "print_expr", "random_float", "random_uint", "random_int",
    "saturating_cast", "saturating_add", "saturating_sub",
    "widening_add", "widening_sub", "widening_mul",
    "halving_add", "rounding_halving_add", "rounding_shift_right",
    "div_round_to_zero", "mod_round_to_zero", "fast_integer_divide",
    "popcount", "count_leading_zeros", "count_trailing_zeros",
    "reinterpret", "undef", "i8", "i16", "i32", "i64",
    "u8", "u16", "u32", "u64", "f16", "f32", "f64", "bf16",
]


def cast(t: Type, e) -> Expr:
    e = to_expr(e, hint=t)
    if e.dtype == t:
        return e
    if isinstance(e, E.IntImm) and t.is_integer():
        return E.IntImm(t, e.value)
    if isinstance(e, (E.IntImm, E.FloatImm)) and t.is_float():
        return E.FloatImm(t, float(e.value))
    return Cast(t, e)


# dtype-shorthand constructors (match the reference Python bindings' hl.u8(x)…)
def _caster(t):
    return lambda e: cast(t, e)

i8, i16, i32, i64 = _caster(Int(8)), _caster(Int(16)), _caster(Int(32)), _caster(Int(64))
u8, u16, u32, u64 = _caster(UInt(8)), _caster(UInt(16)), _caster(UInt(32)), _caster(UInt(64))
f16, f32, f64 = _caster(Float(16)), _caster(Float(32)), _caster(Float(64))
bf16 = _caster(BFloat(16))


def reinterpret(t: Type, e) -> Expr:
    return E.Reinterpret(t, to_expr(e))


def select(*args) -> Expr:
    """select(c1, v1, [c2, v2, ...,] default) — multi-way select
    (reference: src/IROperator.h select overloads)."""
    if len(args) < 3 or len(args) % 2 == 0:
        raise CompileError("select needs an odd number of args >= 3")
    if len(args) == 3:
        c = to_expr(args[0])
        if not c.dtype.is_bool():
            raise CompileError("select condition must be boolean")
        t, f = E._unify(args[1], args[2])
        return Select(c, t, f)
    return select(args[0], args[1], select(*args[2:]))


def clamp(e, lo, hi) -> Expr:
    e = to_expr(e)
    lo = to_expr(lo, hint=e.dtype)
    hi = to_expr(hi, hint=e.dtype)
    return make_binary("max", make_binary("min", e, hi), lo)


def min(*args) -> Expr:
    if len(args) == 1:
        return to_expr(args[0])
    if any(isinstance(a, (Expr,)) or hasattr(a, "_to_expr") for a in args):
        r = args[0]
        for a in args[1:]:
            r = make_binary("min", r, a)
        return r
    return builtins.min(*args)


def max(*args) -> Expr:
    if len(args) == 1:
        return to_expr(args[0])
    if any(isinstance(a, (Expr,)) or hasattr(a, "_to_expr") for a in args):
        r = args[0]
        for a in args[1:]:
            r = make_binary("max", r, a)
        return r
    return builtins.max(*args)


def abs(e) -> Expr:
    if not (isinstance(e, Expr) or hasattr(e, "_to_expr")):
        return builtins.abs(e)
    e = to_expr(e)
    if e.dtype.is_uint():
        return e
    # reference: abs of int returns uint of same bits (src/IROperator.cpp abs)
    t = UInt(e.dtype.bits) if e.dtype.is_int() else e.dtype
    return Intrin("abs", t, (e,))


def absd(a, b) -> Expr:
    a, b = E._unify(a, b)
    t = UInt(a.dtype.bits) if a.dtype.is_int() else a.dtype
    return Intrin("absd", t, (a, b))


def _math1(name):
    def fn(e) -> Expr:
        e = to_expr(e)
        if not e.dtype.is_float():
            e = cast(Float(32), e)
        return Intrin(name, e.dtype, (e,))
    fn.__name__ = name
    return fn


sqrt = _math1("sqrt")
exp = _math1("exp")
log = _math1("log")
floor = _math1("floor")
ceil = _math1("ceil")
round = _math1("round")
trunc = _math1("trunc")
sin = _math1("sin")
cos = _math1("cos")
tan = _math1("tan")
asin = _math1("asin")
acos = _math1("acos")
atan = _math1("atan")
sinh = _math1("sinh")
cosh = _math1("cosh")
tanh = _math1("tanh")
asinh = _math1("asinh")
acosh = _math1("acosh")
atanh = _math1("atanh")
erf = _math1("erf")

# "fast_" variants: on TPU the VPU transcendental units already are the fast
# path; these alias the exact ops (reference: src/IROperator.h fast_exp etc.)
fast_exp, fast_log, fast_sqrt = exp, log, sqrt


def rsqrt(e) -> Expr:
    e = to_expr(e)
    if not e.dtype.is_float():
        e = cast(Float(32), e)
    return Intrin("rsqrt", e.dtype, (e,))


fast_inverse_sqrt = rsqrt


def fast_inverse(e) -> Expr:
    e = to_expr(e)
    return Intrin("recip", e.dtype, (e,))


def fract(e) -> Expr:
    e = to_expr(e)
    return e - floor(e)


def pow(a, b) -> Expr:
    a, b = E._unify(a, b)
    if not a.dtype.is_float():
        a, b = cast(Float(32), a), cast(Float(32), b)
    return Intrin("pow", a.dtype, (a, b))


fast_pow = pow


def atan2(a, b) -> Expr:
    a, b = E._unify(a, b)
    if not a.dtype.is_float():
        a, b = cast(Float(32), a), cast(Float(32), b)
    return Intrin("atan2", a.dtype, (a, b))


def hypot(a, b) -> Expr:
    return sqrt(to_expr(a) * a + to_expr(b) * b)


def is_nan(e) -> Expr:
    return Intrin("is_nan", Bool(), (to_expr(e),))


def is_inf(e) -> Expr:
    return Intrin("is_inf", Bool(), (to_expr(e),))


def is_finite(e) -> Expr:
    return Intrin("is_finite", Bool(), (to_expr(e),))


def lerp(zero, one, weight) -> Expr:
    """Linear interpolation with the reference's exact semantics
    (reference: src/IROperator.cpp lerp / doc in IROperator.h): float weight in
    [0,1]; uint weight treated as fixed point spanning its full range."""
    zero, one = E._unify(zero, one)
    weight = to_expr(weight)
    return Intrin("lerp", zero.dtype, (zero, one, weight))


def mux(index, values) -> Expr:
    """mux(i, [a, b, c]) == select(i==0, a, i==1, b, c)
    (reference: src/IROperator.h mux)."""
    index = to_expr(index)
    vals = list(values)
    if len(vals) == 1:
        return to_expr(vals[0])
    args = []
    for i, v in enumerate(vals[:-1]):
        args += [make_binary("eq", index, i), v]
    args.append(vals[-1])
    return select(*args)


def logical_and(*es) -> Expr:
    r = to_expr(es[0])
    for e in es[1:]:
        r = Binary("and", r, to_expr(e))
    return r


def logical_or(*es) -> Expr:
    r = to_expr(es[0])
    for e in es[1:]:
        r = Binary("or", r, to_expr(e))
    return r


def logical_not(e) -> Expr:
    return Not(to_expr(e))


def likely(e) -> Expr:
    """Loop-partitioning hint (reference: src/IROperator.h likely). The XLA/
    Pallas lowering handles boundaries by padding+masking, so this is identity
    with an annotation retained for schedule analysis."""
    e = to_expr(e)
    return Intrin("likely", e.dtype, (e,))


def likely_if_innermost(e) -> Expr:
    e = to_expr(e)
    return Intrin("likely", e.dtype, (e,))


def strict_float(e) -> Expr:
    e = to_expr(e)
    return Intrin("strict_float", e.dtype, (e,))


def require(cond, value, *error_args) -> Expr:
    """Value guarded by a predicate (reference: src/IROperator.h require)."""
    value = to_expr(value)
    return Intrin("require", value.dtype, (to_expr(cond), value) + tuple(
        to_expr(a) for a in error_args))


def print_expr(*args) -> Expr:
    first = to_expr(args[0])
    return Intrin("print", first.dtype, tuple(
        a if isinstance(a, str) else to_expr(a) for a in args))


def print_when(cond, *args) -> Expr:
    first = to_expr(args[0])
    return Intrin("print_when", first.dtype, (to_expr(cond),) + tuple(
        a if isinstance(a, str) else to_expr(a) for a in args))


# ---- random numbers (reference: src/IROperator.h random_float @ 1,400s) ----

_rng_counter = [0]


def _next_tag() -> int:
    _rng_counter[0] += 1
    return _rng_counter[0]


def random_float(seed=None) -> Expr:
    args = (to_expr(seed),) if seed is not None else ()
    return Intrin("random", Float(32), args + (_next_tag(),))


def random_uint(seed=None) -> Expr:
    args = (to_expr(seed),) if seed is not None else ()
    return Intrin("random", UInt(32), args + (_next_tag(),))


def random_int(seed=None) -> Expr:
    args = (to_expr(seed),) if seed is not None else ()
    return Intrin("random", Int(32), args + (_next_tag(),))


# ---- saturating / widening arithmetic (reference: src/IROperator.h:982+) ---

def saturating_cast(t: Type, e) -> Expr:
    e = to_expr(e)
    return Intrin("saturating_cast", t, (e,))


def _widen(e: Expr) -> Expr:
    t = e.dtype
    if t.is_float():
        return cast(Float(builtins.min(64, t.bits * 2)), e)
    return cast(Type(t.code, builtins.min(64, t.bits * 2)), e)


def widening_add(a, b) -> Expr:
    a, b = E._unify(a, b)
    return _widen(a) + _widen(b)


def widening_sub(a, b) -> Expr:
    a, b = E._unify(a, b)
    wt = _widen(a).dtype
    if wt.is_uint():
        wt = Int(wt.bits)
    return cast(wt, a) - cast(wt, b)


def widening_mul(a, b) -> Expr:
    a, b = E._unify(a, b)
    return _widen(a) * _widen(b)


def saturating_add(a, b) -> Expr:
    a, b = E._unify(a, b)
    return saturating_cast(a.dtype, widening_add(a, b))


def saturating_sub(a, b) -> Expr:
    a, b = E._unify(a, b)
    return saturating_cast(a.dtype, widening_sub(a, b))


def halving_add(a, b) -> Expr:
    a, b = E._unify(a, b)
    return cast(a.dtype, widening_add(a, b) / 2)


def rounding_halving_add(a, b) -> Expr:
    a, b = E._unify(a, b)
    return cast(a.dtype, (widening_add(a, b) + 1) / 2)


def rounding_shift_right(a, b) -> Expr:
    a = to_expr(a)
    b = to_expr(b, hint=Int(32))
    wide = _widen(a)
    return cast(a.dtype, (wide + (cast(wide.dtype, 1) << (b - 1))) >> b)


def fast_integer_divide(a, b) -> Expr:
    """Integer division by a runtime u8 divisor (reference:
    src/IROperator.h fast_integer_divide) — ordinary division on TPU."""
    return make_binary("div", a, b)


def div_round_to_zero(a, b) -> Expr:
    a, b = E._unify(a, b)
    return Intrin("div_rtz", a.dtype, (a, b))


def mod_round_to_zero(a, b) -> Expr:
    a, b = E._unify(a, b)
    return Intrin("mod_rtz", a.dtype, (a, b))


def popcount(e) -> Expr:
    e = to_expr(e)
    return Intrin("popcount", e.dtype, (e,))


def count_leading_zeros(e) -> Expr:
    e = to_expr(e)
    return Intrin("clz", e.dtype, (e,))


def count_trailing_zeros(e) -> Expr:
    e = to_expr(e)
    return Intrin("ctz", e.dtype, (e,))


def undef(t: Type) -> Expr:
    """Undefined value — used to leave parts of an update untouched
    (reference: src/IROperator.h undef)."""
    return Intrin("undef", t, ())
