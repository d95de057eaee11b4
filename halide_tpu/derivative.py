"""Autodiff (reference: src/Derivative.cpp propagate_adjoints — 2,000 LoC of
hand-rolled reverse mode; src/autoschedulers/li2018 consumes the result).

On TPU the pipeline evaluation is a pure jnp program, so reverse-mode AD is
jax.grad composed with the realizer — the entire Derivative.cpp collapses
into this module. API mirrors propagate_adjoints: gradients of a scalar
reduction of the output (optionally weighted by an adjoint buffer) with
respect to float ImageParams/Params.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from .buffer import ImageParam, Param
from .expr import CompileError
from .func import Func
from .pipeline import Pipeline, gather_graph


def propagate_adjoints(output, adjoint=None, sizes=None, wrt=None):
    """-> dict name -> gradient array, for each float input in `wrt`
    (default: every float ImageParam/Param in the pipeline).

    adjoint: array matching the realized output (default: ones — i.e.
    gradients of sum(output))."""
    import jax
    import jax.numpy as jnp

    pipeline = output if isinstance(output, Pipeline) else Pipeline(output)
    if sizes is None:
        raise CompileError("propagate_adjoints needs realize sizes")
    g = gather_graph(pipeline.outputs)
    inputs = list(g.inputs.values())
    params = list(g.params.values())
    if wrt is None:
        wrt = [t for t in inputs
               if isinstance(t, ImageParam) and t.type.is_float()] + \
              [p for p in params if p.type.is_float()]
    wrt_ids = [id(w) for w in wrt]

    # map wrt objects to argument positions; scalar Params become traced
    # value arguments of a purpose-built executor
    # (reference: src/Derivative.h:52-71 — scalar param adjoints)
    obj_order = list(g.inputs.values())
    pos = []            # (kind, index-within-kind) per wrt entry
    scalar_params = []
    for w in wrt:
        if isinstance(w, ImageParam):
            try:
                pos.append(("img", obj_order.index(w)))
            except ValueError:
                raise CompileError(f"{w.name} is not an input of the pipeline")
        elif isinstance(w, Param):
            pos.append(("param", len(scalar_params)))
            scalar_params.append(w)
        else:
            raise CompileError(f"cannot differentiate w.r.t. {w!r}")

    if scalar_params:
        regions = pipeline._out_regions(sizes)
        input_objs = []
        input_arrays = []
        for t in g.inputs.values():
            buf = t.get() if isinstance(t, ImageParam) else t
            input_objs.append((t, buf))
            input_arrays.append(buf.data)
        param_vals = {id(p): p.get() for p in g.params.values()}
        fn = pipeline._build_fn(
            g, regions, input_objs, param_vals,
            traced_param_ids=tuple(id(p) for p in scalar_params))
        presets = ()
        param_arrays0 = tuple(
            jnp.asarray(p.get(), p.type.to_np()) for p in scalar_params)
    else:
        fn, input_arrays, _regions, presets = pipeline._prepare(
            sizes, jit=False)
        param_arrays0 = ()

    adj = adjoint

    def loss(*wrt_arrays):
        full = list(input_arrays)
        pvals = list(param_arrays0)
        for (kind, p), a in zip(pos, wrt_arrays):
            if kind == "img":
                full[p] = a
            else:
                pvals[p] = a
        if scalar_params:
            outs = fn(tuple(full), presets, tuple(pvals))
        else:
            outs = fn(tuple(full), presets)
        total = 0.0
        for per_func in outs:
            for arr in per_func:
                a2 = arr.astype(jnp.float32)
                if adj is not None:
                    a2 = a2 * jnp.asarray(adj, jnp.float32)
                total = total + jnp.sum(a2)
        return total

    seeds = [input_arrays[p] if kind == "img" else param_arrays0[p]
             for (kind, p) in pos]
    grads = jax.grad(loss, argnums=tuple(range(len(pos))))(*seeds)
    return {wrt[i].name: np.asarray(grads[i]) for i in range(len(pos))}
