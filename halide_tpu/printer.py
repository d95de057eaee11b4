"""IR pretty printer (reference: src/IRPrinter.cpp)."""
from __future__ import annotations

from . import expr as E

_BIN_SYM = {
    "add": "+", "sub": "-", "mul": "*", "div": "/", "mod": "%",
    "eq": "==", "ne": "!=", "lt": "<", "le": "<=", "gt": ">", "ge": ">=",
    "and": "&&", "or": "||", "shl": "<<", "shr": ">>",
    "bitand": "&", "bitor": "|", "bitxor": "^",
}


def expr_to_str(e) -> str:
    if isinstance(e, E.IntImm):
        if e.dtype.is_bool():
            return "true" if e.value else "false"
        s = str(e.value)
        if e.dtype != E.Int(32):
            return f"({e.dtype.short_name()}){s}"
        return s
    if isinstance(e, E.FloatImm):
        s = repr(e.value)
        if e.dtype.bits != 32 or e.dtype.code != "float":
            return f"({e.dtype.short_name()}){s}"
        return f"{s}f"
    if isinstance(e, E.StringImm):
        return repr(e.value)
    if isinstance(e, E.Variable):
        return e.name
    if isinstance(e, E.Cast):
        return f"{e.dtype.short_name()}({expr_to_str(e.value)})"
    if isinstance(e, E.Reinterpret):
        return f"reinterpret<{e.dtype.short_name()}>({expr_to_str(e.value)})"
    if isinstance(e, E.Binary):
        if e.op in ("min", "max"):
            return f"{e.op}({expr_to_str(e.a)}, {expr_to_str(e.b)})"
        return f"({expr_to_str(e.a)} {_BIN_SYM[e.op]} {expr_to_str(e.b)})"
    if isinstance(e, E.Not):
        return f"!({expr_to_str(e.a)})"
    if isinstance(e, E.Select):
        return (f"select({expr_to_str(e.cond)}, {expr_to_str(e.true_value)}, "
                f"{expr_to_str(e.false_value)})")
    if isinstance(e, E.Call):
        args = ", ".join(expr_to_str(a) for a in e.args)
        # NOTE: the str() fallback must be LAZY -- getattr's default arg is
        # evaluated eagerly, and str(Func) reprs the producer's whole
        # definition, making every Call print its full upstream graph
        # (exponential on deep inline chains; lens_blur hung here)
        name = e.target.name if hasattr(e.target, "name") else str(e.target)
        if e.value_index:
            return f"{name}({args})[{e.value_index}]"
        return f"{name}({args})"
    if isinstance(e, E.Intrin):
        def _arg_str(a):
            if isinstance(a, E.Expr):
                return expr_to_str(a)
            # objects (Funcs, params) print by name only -- repr(Func)
            # embeds its definition and recurses through the graph
            if hasattr(a, "name") and not isinstance(a, (int, float, str)):
                return str(a.name)
            return repr(a)
        args = ", ".join(_arg_str(a) for a in e.args)
        return f"{e.name}({args})"
    if isinstance(e, E.Let):
        return (f"(let {e.name} = {expr_to_str(e.value)} in "
                f"{expr_to_str(e.body)})")
    if isinstance(e, E.Reduce):
        w = f" where {expr_to_str(e.where)}" if e.where is not None else ""
        return f"{e.op}({expr_to_str(e.value)}, {e.rdom.name}{w})"
    return f"<{type(e).__name__}>"
