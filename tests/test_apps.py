"""Apps conformance: every app's pipeline output must match its numpy
reference implementation — the analog of the reference's apps/*/filter.cpp
correctness checks (bit-exact for integer pipelines, tolerance for float)."""
import numpy as np
import pytest

import halide_tpu as hl
from halide_tpu.apps import get, load_all

# small sizes for CI; bench.py uses canonical sizes
SMALL = dict(width=96, height=64)


def run_app(name, **kw):
    app = get(name)(**kw)
    data = app.make_inputs()
    app.bind(data)
    out = app.realize()
    ref = app.reference(**data)
    return out, ref, app


def check(name, **kw):
    out, ref, app = run_app(name, **kw)
    outs = out if isinstance(out, (list, tuple)) else [out]
    refs = ref if isinstance(ref, (list, tuple)) else [ref]
    for o, r in zip(outs, refs):
        o = o.to_numpy()
        if app.tolerance == 0.0:
            np.testing.assert_array_equal(o, r)
        else:
            np.testing.assert_allclose(o, r, rtol=app.tolerance,
                                       atol=app.tolerance)


def test_blur():
    check("blur", **SMALL)
