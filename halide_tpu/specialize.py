"""specialize(): schedule-variant ladders (reference: src/Func.h:406-407,
1770-1842). Each specialization is an independently schedulable variant
chosen by a param-dependent condition compiled as an if/else-if chain.

In the TPU build the jit cache key already includes every param value and
input shape, so each compilation IS one branch of the ladder: at prepare
time the conditions are evaluated statically in declaration order, the
first true variant's recorded directives are REPLAYED onto the stage's
real schedule for that compile (and restored afterwards), and
specialize_fail raises. A condition that cannot be resolved statically
(it references loop Vars) is a CompileError, matching the reference's
requirement that specialization conditions depend only on parameters.
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

    def apply(self):
        """Replay the recorded directives onto the live schedule."""
        from .func import Stage
        if self.stage_index == 0:
            target = self.func          # Func-level API incl. compute_root
        else:
            target = Stage(self.func, self.stage_index)
        for (name, a, kw) in self.directives:
            m = getattr(target, name, None)
            if m is None:
                raise CompileError(
                    f"specialization of {self.func.name} uses unknown "
                    f"directive {name!r}")
            m(*a, **kw)


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


def select(g, realizations, param_vals):
    """Evaluate every func's specialization ladder with the compile-time
    param/input bindings (OUTSIDE any jit trace -- jnp ops stage to tracers
    inside one) and return the chosen variants, first true wins per func."""
    import numpy as np

    from .eval_jnp import Ctx, eval_array

    chosen = []
    ctx = Ctx(0, {}, {}, realizations, param_vals)
    for f in g.funcs:
        specs = getattr(f, "_specializations", [])
        if not specs:
            continue
        for s in specs:
            try:
                v = eval_array(s.condition, ctx)
                taken = bool(np.asarray(v))
            except Exception as e:
                raise CompileError(
                    f"specialize() condition on {f.name} is not statically "
                    f"resolvable at compile time: {e}")
            if not taken:
                continue
            if s.failure_message is not None:
                raise CompileError(
                    f"specialize_fail on {f.name}: {s.failure_message}")
            chosen.append(s)
            break
    return chosen


def apply_all(chosen):
    """Apply the chosen variants' directives; returns the undo list."""
    undo = []
    for s in chosen:
        f = s.func
        undo.append((f._fschedule, f._fschedule.snapshot()))
        for d in f._defs:
            undo.append((d.schedule, d.schedule.snapshot()))
        s.apply()
    return undo


def restore(undo):
    for obj, snap in reversed(undo):
        obj.restore(snap)
