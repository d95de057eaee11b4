"""FFT API surface parity (reference: apps/fft/fft.h fft2d_c2c/r2c/c2r,
arbitrary sizes). The registered `fft` app covers the benched c2c case;
these cover the rest of the surface."""
import numpy as np
import pytest

import halide_tpu as hl
from halide_tpu.apps.fft import fft2d_c2c, fft2d_c2r, fft2d_r2c


def _realize_complex(f, w, h):
    r = hl.Pipeline(f).realize([w, h])
    bufs = list(r) if not hasattr(r, "to_numpy") else [r]
    re = np.asarray(bufs[0].to_numpy())
    im = np.asarray(bufs[1].to_numpy())
    return re + 1j * im


def test_c2c_non_power_of_two():
    w, h = 24, 16         # 24 = 2^3 * 3 -> Bluestein on x, radix-2 on y
    rng = np.random.default_rng(0)
    z = rng.standard_normal((2, h, w)).astype(np.float32)
    inp = hl.ImageParam(hl.Float(32), 3, "fftnp_in")
    inp.set(z)
    F = _realize_complex(fft2d_c2c(inp, w, h, sign=-1, name="np2"), w, h)
    ref = np.fft.fft2(z[0] + 1j * z[1])
    np.testing.assert_allclose(F, ref, rtol=1e-3, atol=1e-3)


def test_c2c_inverse_roundtrip_non_pow2():
    w, h = 12, 8
    rng = np.random.default_rng(1)
    z = rng.standard_normal((2, h, w)).astype(np.float32)
    inp = hl.ImageParam(hl.Float(32), 3, "fftrt_in")
    inp.set(z)
    fwd = fft2d_c2c(inp, w, h, sign=-1, name="rt_f")
    back = fft2d_c2c(fwd, w, h, sign=+1, name="rt_b")
    Z = _realize_complex(back, w, h)
    np.testing.assert_allclose(Z.real, z[0], atol=1e-3)
    np.testing.assert_allclose(Z.imag, z[1], atol=1e-3)


def test_r2c_half_spectrum():
    w, h = 32, 16
    rng = np.random.default_rng(2)
    a = rng.standard_normal((h, w)).astype(np.float32)
    inp = hl.ImageParam(hl.Float(32), 2, "fftr_in")
    inp.set(a)
    f = fft2d_r2c(inp, w, h, name="r2c_t")
    r = hl.Pipeline(f).realize([w // 2 + 1, h])
    F = (np.asarray(r[0].to_numpy())
         + 1j * np.asarray(r[1].to_numpy()))
    ref = np.fft.fft2(a)[:, :w // 2 + 1]
    np.testing.assert_allclose(F, ref, rtol=1e-3, atol=1e-3)


def test_c2r_inverts_r2c():
    w, h = 16, 8
    rng = np.random.default_rng(3)
    a = rng.standard_normal((h, w)).astype(np.float32)
    inp = hl.ImageParam(hl.Float(32), 2, "fftcr_in")
    inp.set(a)
    half = fft2d_r2c(inp, w, h, name="cr_f")
    back = fft2d_c2r(half, w, h, name="cr_b")
    out = np.asarray(hl.Pipeline(back).realize([w, h]).to_numpy())
    np.testing.assert_allclose(out, a, atol=1e-3)
