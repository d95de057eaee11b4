"""specialize(): schedule-variant ladders (reference: src/Func.h:406-407,
1770-1814). Each specialization is an independently schedulable variant chosen
by a param-dependent condition compiled as an if/else-if chain.

In the TPU build, schedule variants select among compiled executables at the
dispatch layer (the jit cache key includes param values, so each reachable
variant compiles exactly the specialization the reference would pick); the
recorded conditions are consumed by the Pallas lowering to pick tile plans.
"""
from __future__ import annotations

from typing import List

from .expr import CompileError, Expr, to_expr


class Specialization:
    def __init__(self, func, stage_index: int, condition: Expr):
        self.func = func
        self.stage_index = stage_index
        self.condition = condition
        self.failure_message = None
        self.directives: List[tuple] = []

    # accept and record any scheduling directive applied to the variant
    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)

        def record(*a, **kw):
            self.directives.append((name, a, kw))
            return self

        return record


def add_specialization(func, stage_index: int, cond) -> Specialization:
    cond = to_expr(cond)
    if not cond.dtype.is_bool():
        raise CompileError("specialize() condition must be boolean")
    s = Specialization(func, stage_index, cond)
    func._specializations.append(s)
    return s


def add_specialize_fail(func, stage_index: int, msg: str) -> None:
    s = Specialization(func, stage_index, to_expr(True))
    s.failure_message = msg
    func._specializations.append(s)
