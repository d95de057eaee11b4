"""fft: 2D complex FFT written in the DSL — radix-2 DIT with expression-level
twiddles and tuple-valued (re, im) stages
(reference: apps/fft/fft.h:47-58 fft2d_r2c/c2c — the reference's FFT is
likewise built from Funcs; this is the capability-parity c2c form)."""
from __future__ import annotations

import math

import numpy as np

import halide_tpu as hl

from . import App, register


def _bitrev_expr(x, bits: int):
    e = hl.i32(0)
    for i in range(bits):
        e = e | (((x >> i) & 1) << (bits - 1 - i))
    return e


def _fft1d(src, n: int, axis_vars, axis: int, inverse: bool,
           name: str):
    """src: tuple-valued Func (re, im) over axis_vars; FFT along
    axis_vars[axis] of length n. Returns the final stage Func."""
    bits = int(math.log2(n))
    assert (1 << bits) == n, "power-of-two sizes only"
    vs = axis_vars
    xv = vs[axis]
    sign = 1.0 if inverse else -1.0

    def at(f, idx_expr, vi):
        args = list(vs)
        args[axis] = idx_expr
        return f[tuple(args)][vi]

    # bit-reversal permutation (indices clamped: value-level no-ops that
    # keep the interval analysis exact across stages)
    cur = hl.Func(f"{name}_rev")
    rev = _bitrev_expr(hl.clamp(xv, 0, n - 1), bits)
    args_rev = list(vs)
    args_rev[axis] = rev
    cur[tuple(vs)] = (src[tuple(args_rev)][0], src[tuple(args_rev)][1])
    cur.compute_root()

    for s in range(1, bits + 1):
        m = 1 << s
        half = m >> 1
        nxt = hl.Func(f"{name}_s{s}")
        j = xv % m
        upper = j >= half                 # second half of the butterfly
        jw = hl.select(upper, j - half, j)
        ang = (sign * 2.0 * math.pi / m) * hl.f32(jw)
        wr, wi = hl.cos(ang), hl.sin(ang)
        even_i = hl.clamp(hl.select(upper, xv - half, xv), 0, n - 1)
        odd_i = hl.clamp(hl.select(upper, xv, xv + half), 0, n - 1)
        er, ei = at(cur, even_i, 0), at(cur, even_i, 1)
        orr, oi = at(cur, odd_i, 0), at(cur, odd_i, 1)
        tr = wr * orr - wi * oi
        ti = wr * oi + wi * orr
        outr = hl.select(upper, er - tr, er + tr)
        outi = hl.select(upper, ei - ti, ei + ti)
        nxt[tuple(vs)] = (outr, outi)
        nxt.compute_root()
        cur = nxt
    if inverse:
        fin = hl.Func(f"{name}_norm")
        fin[tuple(vs)] = (cur[tuple(vs)][0] / float(n),
                          cur[tuple(vs)][1] / float(n))
        cur = fin
    return cur


def fft2d(src, w: int, h: int, inverse: bool = False, name: str = "fft2d"):
    x, y = hl.Var("x"), hl.Var("y")
    wrap = hl.Func(f"{name}_in")
    wrap[x, y] = (src[x, y][0], src[x, y][1]) if hasattr(src, "_defs") \
        else (src[x, y, 0], src[x, y, 1])
    fx = _fft1d(wrap, w, (x, y), 0, inverse, f"{name}_x")
    fy = _fft1d(fx, h, (x, y), 1, inverse, f"{name}_y")
    return fy


@register("fft")
def build(width: int = 256, height: int = 256, **_ignored) -> App:
    x, y, c = hl.Var("x"), hl.Var("y"), hl.Var("c")
    inp = hl.ImageParam(hl.Float(32), 3, "input")   # (x, y, c=re/im)

    fwd = fft2d(inp, width, height, inverse=False, name="fwd")
    output = hl.Func("fft_out")
    output[x, y, c] = hl.mux(c, [fwd[x, y][0], fwd[x, y][1]])

    def make_inputs(seed=0):
        rng = np.random.default_rng(seed)
        return {"input": rng.standard_normal(
            (2, height, width)).astype(np.float32)}

    def reference(input):
        z = input[0].astype(np.complex128) + 1j * input[1]
        F = np.fft.fft2(z)   # np [y, x]
        return np.stack([F.real, F.imag]).astype(np.float32)

    return App("fft", hl.Pipeline(output), [inp], make_inputs, reference,
               [width, height, 2], megapixels=width * height / 1e6,
               tolerance=1e-3, atol=1e-2)
