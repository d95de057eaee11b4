"""Blocked VMEM-carry scan kernel: correctness + engagement.

The reference's sequential-RDom scan loops must lower to the one-pass
Pallas kernel (ops/pallas_scan.py), not silently fall back to the
log-depth XLA rounds (reference: apps/iir_blur pattern, SURVEY.md §5.7)."""
import numpy as np
import jax.numpy as jnp
import pytest

import halide_tpu as hl
from halide_tpu.ops import pallas_scan as ps


def _golden(a, b, init, backward):
    g, n, m = b.shape
    y = np.zeros((g, n, m), np.float64)
    prev = init[:, 0, :].astype(np.float64)
    order = range(n - 1, -1, -1) if backward else range(n)
    for i in order:
        prev = a[:, i, :].astype(np.float64) * prev \
            + b[:, i, :].astype(np.float64)
        y[:, i, :] = prev
    return y


@pytest.mark.parametrize("backward", [False, True])
@pytest.mark.parametrize("shape", [(2, 37, 130), (1, 512, 256)])
def test_linear_scan_general(shape, backward):
    rng = np.random.default_rng(0)
    b = rng.standard_normal(shape).astype(np.float32)
    a = (rng.standard_normal(shape) * 0.5).astype(np.float32)
    init = rng.standard_normal((shape[0], 1, shape[2])).astype(np.float32)
    r = ps.linear_scan(jnp.asarray(b), jnp.asarray(init), 1, backward,
                       a=jnp.asarray(a), interpret=True)
    assert r is not None
    got = np.asarray(r, np.float64)
    np.testing.assert_allclose(got, _golden(a, b, init, backward),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("backward", [False, True])
def test_linear_scan_const(backward):
    rng = np.random.default_rng(1)
    shape = (3, 100, 140)
    b = rng.standard_normal(shape).astype(np.float32)
    a = np.full(shape, 0.9, np.float32)
    init = rng.standard_normal((3, 1, 140)).astype(np.float32)
    r = ps.linear_scan(jnp.asarray(b), jnp.asarray(init), 1, backward,
                       a_const=0.9, interpret=True)
    assert r is not None
    np.testing.assert_allclose(np.asarray(r, np.float64),
                               _golden(a, b, init, backward),
                               rtol=1e-4, atol=1e-5)


def test_scan_axis_last():
    rng = np.random.default_rng(2)
    b = rng.standard_normal((2, 40, 60)).astype(np.float32)
    init = rng.standard_normal((2, 40, 1)).astype(np.float32)
    r = ps.linear_scan(jnp.asarray(b), jnp.asarray(init), 2, False,
                       a_const=0.5, interpret=True)
    y = np.zeros(b.shape, np.float64)
    prev = init[:, :, 0].astype(np.float64)
    for i in range(b.shape[2]):
        prev = 0.5 * prev + b[:, :, i]
        y[:, :, i] = prev
    np.testing.assert_allclose(np.asarray(r, np.float64), y,
                               rtol=1e-4, atol=1e-5)


def test_iir_update_engages_pallas_scan(monkeypatch):
    """An IIR RDom update must route through the one-pass kernel (and the
    kernel must not silently decline); spy on linear_scan."""
    calls = []
    orig = ps.linear_scan

    def spy(*a, **kw):
        r = orig(*a, **kw)
        calls.append(r is not None)
        return r

    monkeypatch.setattr(ps, "linear_scan", spy)

    x, y = hl.Var("x"), hl.Var("y")
    inp = hl.ImageParam(hl.Float(32), 2, "scan_in")
    W, H = 64, 48
    f = hl.Func("scan_f")
    f[x, y] = hl.undef(hl.Float(32))
    f[x, 0] = inp[x, 0]
    r = hl.RDom(1, H - 1)
    f[x, r.x] = 0.75 * f[x, r.x - 1] + 0.25 * inp[x, r.x]
    rng = np.random.default_rng(3)
    data = rng.random((H, W), np.float32)
    inp.set(data)
    out = np.asarray(hl.Pipeline(f).realize([W, H]).data)
    assert calls and calls[-1], "pallas scan kernel did not engage"
    ref = data.astype(np.float64).copy()
    for i in range(1, H):
        ref[i] = 0.75 * ref[i - 1] + 0.25 * data[i]
    np.testing.assert_allclose(out.astype(np.float64), ref,
                               rtol=1e-4, atol=1e-5)
