"""Value tracing (reference: src/Tracing.cpp inject_tracing +
runtime/tracing.cpp packet stream + HL_TRACE_FILE).

`with hl.tracing(pipeline, file=...) as t:` arms per-func trace flags
(`Func.trace_stores/loads/realizations`); each armed func emits
begin/end-realization events and a store event carrying the realized buffer
payload through an ordered io_callback into the native packet writer
(runtime/native/ht_runtime.cpp). Event granularity is per-realization (a
whole VPU tile program), not per scalar store — the TPU executes arrays, not
scalar loops."""
from __future__ import annotations

import contextlib
from typing import List, Optional

import numpy as np

from .runtime import (EVENT_BEGIN_REALIZATION, EVENT_END_REALIZATION,
                      EVENT_PRINT, EVENT_STORE, TraceWriter)

_DTYPE_CODES = {"uint": 1, "int": 0, "float": 2, "bfloat": 3, "handle": 4}


class Trace:
    def __init__(self, file: Optional[str] = None, payloads: bool = True):
        self.writer = TraceWriter(file)
        self.events: List[tuple] = []    # (event, func_name, meta)
        self.payloads = payloads

    # called at trace time from the pipeline evaluation loop
    def record_realization(self, func, box, arrays) -> None:
        import jax
        from jax.experimental import io_callback

        name = func.name
        mins = box.mins()
        extents = box.extents()
        coords = []
        for m, e in zip(mins, extents):
            coords += [int(m), int(e)]

        def begin_cb():
            self.events.append(("begin_realization", name,
                                tuple(zip(mins, extents))))
            self.writer.emit(EVENT_BEGIN_REALIZATION, name, 0, coords)
            return np.int32(0)

        def store_cb(arr):
            self.events.append(("store", name, arr.shape))
            payload = arr.tobytes() if self.payloads else b""
            code = _DTYPE_CODES.get(
                func.output_type(0).code, 0) | (
                    func.output_type(0).bits << 8)
            self.writer.emit(EVENT_STORE, name, code, coords, payload)
            return np.int32(0)

        def end_cb():
            self.events.append(("end_realization", name, ()))
            self.writer.emit(EVENT_END_REALIZATION, name, 0, coords)
            return np.int32(0)

        io_callback(begin_cb, jax.ShapeDtypeStruct((), np.int32),
                    ordered=True)
        if func._fschedule.trace_stores:
            for a in arrays:
                io_callback(store_cb, jax.ShapeDtypeStruct((), np.int32),
                            a, ordered=True)
        io_callback(end_cb, jax.ShapeDtypeStruct((), np.int32),
                    ordered=True)

    def emit_print(self, expr, val, ctx) -> None:
        import jax
        from jax.experimental import io_callback

        def cb(v):
            self.events.append(("print", "", np.asarray(v)))
            self.writer.emit(EVENT_PRINT, "print", 0, [],
                             np.asarray(v).tobytes())
            return np.int32(0)

        from .eval_jnp import materialize
        io_callback(cb, jax.ShapeDtypeStruct((), np.int32),
                    materialize(val, ctx), ordered=True)

    def counts(self):
        out = {}
        for ev, name, _ in self.events:
            out[(ev, name)] = out.get((ev, name), 0) + 1
        return out

    def close(self):
        self.writer.close()


@contextlib.contextmanager
def tracing(pipeline, file: Optional[str] = None, payloads: bool = True):
    t = Trace(file, payloads)
    old = pipeline.trace
    pipeline.trace = t
    try:
        yield t
    finally:
        pipeline.trace = old
        t.close()
