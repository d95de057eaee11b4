"""Blocked single-pass linear-recurrence scan kernels (Pallas/TPU).

The TPU realization of the reference's sequential-RDom scan loops
(reference: apps/iir_blur/iir_blur_generator.cpp:13-33 and the
sliding-window/storage-fold machinery, src/SlidingWindow.cpp:347-453): a
first-order recurrence y[i] = a[i] * y[i-1] + b[i] is computed in ONE pass
over HBM by carrying the running value across grid steps in a VMEM scratch
register, instead of the log-depth whole-array rounds the pure-XLA lowering
uses (each round re-reads and re-writes the full array from HBM).

Layout: the scan axis is moved to the sublane (second-to-last) dimension;
every other dimension is flattened into a leading grid axis G and a lane
axis M. Within a block the recurrence is solved with log2(BN) shift-FMA
Kogge-Stone rounds entirely in VMEM; blocks chain through the carry.

Grid = (G, M_blocks, N_blocks), N innermost: the carry scratch is valid
because TPU grids execute sequentially per core; G is marked parallel so
megacore may split independent planes (schedule.parallel() analog).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_BN = 256           # scan-axis block (sublanes)
_BM = 512           # lane block
_EPS = 1e-12        # drop shift rounds whose decay underflows f32


def _cdiv(a, b):
    return -(-a // b)


def _kernel_const(b_ref, init_ref, pow_ref, out_ref, carry_ref, *,
                  a_const, bn, backward):
    """Constant-coefficient block: y = a*y_prev + b, a a python float.

    Mosaic has no in-kernel reverse; backward scans shift UP (y[i] takes
    from y[i+k]) and read a host-reversed power vector instead."""
    import jax.experimental.pallas as pl

    n = pl.program_id(2)
    y = b_ref[0]

    @pl.when(n == 0)
    def _():
        carry_ref[...] = init_ref[0]

    k, dk = 1, a_const
    while k < bn and abs(dk) > _EPS:
        zpad = jnp.zeros((k,) + y.shape[1:], y.dtype)
        if backward:
            tail = jax.lax.slice_in_dim(y, k, bn, axis=0)
            sh = jnp.concatenate([tail, zpad], axis=0)
        else:
            head = jax.lax.slice_in_dim(y, 0, bn - k, axis=0)
            sh = jnp.concatenate([zpad, head], axis=0)
        y = y + jnp.asarray(dk, y.dtype) * sh
        k *= 2
        dk = dk * dk
    y = y + pow_ref[0] * carry_ref[...]
    carry_ref[...] = y[0:1] if backward else y[bn - 1:bn]
    out_ref[0] = y


def _kernel_general(a_ref, b_ref, init_ref, out_ref, carry_ref, *,
                    bn, backward):
    """General per-element coefficient block: pairwise combine scan."""
    import jax.experimental.pallas as pl

    n = pl.program_id(2)
    A = a_ref[0]
    B = b_ref[0]

    @pl.when(n == 0)
    def _():
        carry_ref[...] = init_ref[0]

    k = 1
    while k < bn:
        pad = (k,) + A.shape[1:]
        ones = jnp.ones(pad, A.dtype)
        zeros = jnp.zeros(pad, B.dtype)
        if backward:
            A_sh = jnp.concatenate(
                [jax.lax.slice_in_dim(A, k, bn, axis=0), ones], axis=0)
            B_sh = jnp.concatenate(
                [jax.lax.slice_in_dim(B, k, bn, axis=0), zeros], axis=0)
        else:
            A_sh = jnp.concatenate(
                [ones, jax.lax.slice_in_dim(A, 0, bn - k, axis=0)], axis=0)
            B_sh = jnp.concatenate(
                [zeros, jax.lax.slice_in_dim(B, 0, bn - k, axis=0)], axis=0)
        B = B + A * B_sh
        A = A * A_sh
        k *= 2
    y = B + A * carry_ref[...]
    carry_ref[...] = y[0:1] if backward else y[bn - 1:bn]
    out_ref[0] = y


def linear_scan(b, init, scan_np, backward, a_const=None, a=None,
                interpret=False):
    """One-pass scan of y[i] = a*y[i-1] + b[i] along axis `scan_np` of `b`.

    init broadcasts b's shape with the scan axis reduced to 1 (y[-1] in
    scan order). Returns y (same shape as b) or None when unsupported.
    Exactly one of a_const (python float) / a (array like b) is given.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if b.dtype != jnp.float32:
        return None
    nd = b.ndim
    if nd < 2:
        return None
    shape = b.shape
    N = shape[scan_np]
    if N <= 1:
        return None

    # normalize: scan axis -> sublanes of a (G, N, M) view
    def to_gnm(x):
        if x is None:
            return None
        x = jnp.moveaxis(x, scan_np, -2)
        lead = x.shape[:-2]
        g = 1
        for s in lead:
            g *= s
        return x.reshape(g, x.shape[-2], x.shape[-1])

    b3 = to_gnm(b)
    a3 = to_gnm(a) if a is not None else None
    init3 = to_gnm(jnp.broadcast_to(
        init, shape[:scan_np] + (1,) + shape[scan_np + 1:]))
    G, _, M = b3.shape

    bn = min(_BN, max(8, _cdiv(N, 8) * 8))
    bm = min(_BM, max(128, _cdiv(M, 128) * 128))
    # backward scans process the highest-position block first; a partial
    # tail block would feed garbage into the carry ahead of real data, so
    # pad the START of the array axis (the scan tail) up to a block multiple
    pad_n = _cdiv(N, bn) * bn - N
    if pad_n and backward:
        cfg = [(0, 0)] * 3
        cfg[1] = (pad_n, 0)
        b3 = jnp.pad(b3, cfg)
        if a3 is not None:
            a3 = jnp.pad(a3, cfg)
    Np = b3.shape[1]
    gn = _cdiv(Np, bn)
    gm = _cdiv(M, bm)

    # literal constants in index maps trace as i64 and fail Mosaic
    # legalization (and jnp captures are rejected): derive zeros from the
    # i32 grid indices instead
    if backward:
        def nmap(g, m, n, blocks=gn):
            return (g, (blocks - 1) - n, m)
    else:
        def nmap(g, m, n):
            return (g, n, m)

    bspec = pl.BlockSpec((1, bn, bm), nmap)
    ispec = pl.BlockSpec((1, 1, bm), lambda g, m, n: (g, n * 0, m))
    out_spec = pl.BlockSpec((1, bn, bm), nmap)

    grid = (G, gm, gn)
    scratch = [pltpu.VMEM((1, bm), jnp.float32)]
    try:
        params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"))
    except Exception:
        params = None
    kwargs = dict(
        grid=grid,
        out_shape=jax.ShapeDtypeStruct(b3.shape, b3.dtype),
        out_specs=out_spec,
        scratch_shapes=scratch,
        interpret=interpret,
    )
    if params is not None:
        kwargs["compiler_params"] = params

    if a_const is not None:
        powvec = np.power(np.float32(a_const),
                          np.arange(1, bn + 1, dtype=np.float32))
        if backward:
            powvec = powvec[::-1].copy()   # y[i] += a^(bn-i) * carry
        powvec = jnp.asarray(powvec.reshape(1, bn, 1), jnp.float32)
        pspec = pl.BlockSpec((1, bn, 1), lambda g, m, n: (g * 0, n * 0, m * 0))
        kern = functools.partial(
            _kernel_const, a_const=float(a_const), bn=bn,
            backward=backward)
        res = pl.pallas_call(
            kern, in_specs=[bspec, ispec, pspec], **kwargs,
        )(b3, init3, powvec)
    else:
        kern = functools.partial(_kernel_general, bn=bn, backward=backward)
        res = pl.pallas_call(
            kern, in_specs=[bspec, bspec, ispec], **kwargs,
        )(a3, b3, init3)

    if pad_n and backward:
        res = jax.lax.slice_in_dim(res, pad_n, Np, axis=1)
    # undo the (G, N, M) view: reshape back to the moved layout then move
    moved = jnp.moveaxis(b, scan_np, -2).shape
    res = res.reshape(moved)
    return jnp.moveaxis(res, -2, scan_np)
