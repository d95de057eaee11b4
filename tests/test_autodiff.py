"""Autodiff parity (reference: test/correctness/autodiff.cpp,
src/Derivative.cpp)."""
import numpy as np

import halide_tpu as hl


def test_gradient_pointwise():
    x = hl.Var("x")
    img = hl.ImageParam(hl.Float(32), 1, "gimg")
    f = hl.Func("gsq")
    f[x] = img[x] * img[x] + 3.0 * img[x]
    data = np.arange(5, dtype=np.float32)
    img.set(data)
    grads = hl.propagate_adjoints(f, sizes=[5])
    np.testing.assert_allclose(grads["gimg"], 2 * data + 3, rtol=1e-6)


def test_gradient_stencil_with_adjoint():
    x = hl.Var("x")
    img = hl.ImageParam(hl.Float(32), 1, "simg")
    cl = hl.repeat_edge(img)
    f = hl.Func("gst")
    f[x] = cl[x - 1] + 2.0 * cl[x] + cl[x + 1]
    data = np.arange(6, dtype=np.float32)
    img.set(data)
    adj = np.ones(6, np.float32)
    grads = hl.propagate_adjoints(f, adjoint=adj, sizes=[6])
    # d(sum f)/d img[i] = multiplicity of img[i] across the stencil taps
    ref = np.full(6, 4.0, np.float32)
    ref[0] += 1 + 2  # clamped edge taps collapse onto the borders
    ref[-1] += 1 + 2
    ref[1] -= 1
    ref[-2] -= 1
    # compute reference by finite differences instead of reasoning
    eps = 1e-2
    def val(d):
        img.set(d.astype(np.float32))
        return np.asarray(hl.Pipeline(f).realize([6]).to_numpy()).sum()
    fd = np.zeros(6, np.float32)
    base = val(data)
    for i in range(6):
        d2 = data.copy(); d2[i] += eps
        fd[i] = (val(d2) - base) / eps
    np.testing.assert_allclose(grads["simg"], fd, rtol=1e-2, atol=1e-2)


def test_gradient_through_reduction():
    x = hl.Var("x")
    img = hl.ImageParam(hl.Float(32), 1, "rimg")
    r = hl.RDom(0, 4, "rg")
    f = hl.Func("gred")
    f[x] = 0.0
    f[x] += img[x + r.x] * img[x + r.x]
    data = np.arange(8, dtype=np.float32)
    img.set(data)
    grads = hl.propagate_adjoints(f, sizes=[4])
    # sum over x of sum_r img[x+r]^2; d/d img[i] = 2*img[i]*count(i)
    count = np.zeros(8, np.float32)
    for xx in range(4):
        for rr in range(4):
            count[xx + rr] += 1
    np.testing.assert_allclose(grads["rimg"], 2 * data * count, rtol=1e-5)


def test_gradient_scalar_param():
    # reference: src/Derivative.h:52-71 -- adjoints w.r.t. scalar params
    x = hl.Var("x")
    img = hl.ImageParam(hl.Float(32), 1, "pimg")
    gain = hl.Param(hl.Float(32), "gain")
    bias = hl.Param(hl.Float(32), "bias")
    f = hl.Func("gp")
    f[x] = gain * img[x] * img[x] + bias
    data = np.arange(4, dtype=np.float32)
    img.set(data)
    gain.set(2.5)
    bias.set(0.5)
    grads = hl.propagate_adjoints(f, sizes=[4], wrt=[gain, bias, img])
    np.testing.assert_allclose(grads["gain"], np.sum(data * data), rtol=1e-6)
    np.testing.assert_allclose(grads["bias"], 4.0, rtol=1e-6)
    np.testing.assert_allclose(grads["pimg"], 2.5 * 2 * data, rtol=1e-6)
