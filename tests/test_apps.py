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
        if app.tolerance == 0.0 and app.atol == 0.0:
            np.testing.assert_array_equal(o, r)
        else:
            np.testing.assert_allclose(
                o.astype(np.float64), np.asarray(r, dtype=np.float64),
                rtol=app.tolerance, atol=app.atol)


def test_blur():
    check("blur", **SMALL)


def test_unsharp():
    check("unsharp", **SMALL)


def test_harris():
    check("harris", **SMALL)


def test_hist():
    check("hist", **SMALL)


def test_iir_blur():
    check("iir_blur", **SMALL)


def test_gaussian_blur():
    check("gaussian_blur", **SMALL)


def test_stencil_chain():
    check("stencil_chain", width=64, height=48, stencils=5)


def test_max_filter():
    check("max_filter", width=48, height=40, radius=6)
