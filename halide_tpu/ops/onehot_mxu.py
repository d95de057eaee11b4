"""Factorized one-hot contractions for K-wide gathers and scatter-adds.

TPU gathers/scatters serialize per element, so small-domain data-dependent
indexing is lowered to one-hot compare-reduce passes (reference: the dense
strategies the repo already uses for apps/hist + apps/bilateral_grid). For
K up to ~1024 the plain one-hot costs O(P*K) VPU work and, worse, a (P, K)
materialized operand when XLA routes it through a dot. This module splits
the selection index into two digits, lin = hi*K2 + lo, so a K-wide one-hot
becomes TWO ~sqrt(K)-wide one-hots combined on the MXU:

    gather:  tbl[lin[p]]       = sum_{i,j} A[p,i] B[p,j] tbl2[i,j]
                               = rowsum(A * (B @ tbl2.T))
    scatter: hist[k] += g[p]   -> hist2[i,j] = sum_p A[p,i] (B*g)[p,j]
                               (a batched (P,K1)^T @ (P,K2) matmul)

Exactness: one-hot entries are 0/1 and each row selects exactly one (i, j),
so every f32 HIGHEST-precision partial product is either 0 or the selected
value; gathers are bit-exact for any value representable in f32 and
scatter-add sums are exact while the accumulated magnitude stays < 2^24.
Callers gate on that bound for integer data.
"""
from __future__ import annotations

import math
import os as _os

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

# below this K the plain (P, K) compare-reduce is already cheap and avoids
# the second pass over the index
MIN_FACTOR_K = 64


def split_k(K: int):
    """K -> (K1, K2), K2 a power of two near sqrt(K), K1 = ceil(K/K2)."""
    k2 = 1 << max(3, int(round(math.log2(max(K, 1)) / 2)))
    k2 = min(k2, 128)
    k1 = -(-K // k2)
    return k1, k2


def digit_pair(lin, k2: int):
    """Non-negative int32 lin -> (hi, lo) with lin = hi*k2 + lo.

    k2 is a power of two so this is shift/mask (Mosaic/VPU-friendly; no
    integer division). Out-of-range lin >= K1*K2 yields hi >= K1 which
    one_hot maps to an all-zero row, i.e. drop semantics.
    """
    sh = k2.bit_length() - 1
    lin = jnp.asarray(lin, jnp.int32)
    hi = jnp.right_shift(lin, jnp.int32(sh))
    lo = jnp.bitwise_and(lin, jnp.int32(k2 - 1))
    return hi, lo


def lut_gather(idx, tbl, oh_dtype=None):
    """Exact tbl[idx] for a 1-D f32-representable table via MXU contraction.

    idx: int array, any shape, values assumed in [0, K) (clip upstream).
    tbl: (K,) array; returned as float32 (exact selection), caller casts.
    oh_dtype: dtype of the two materialized one-hot operands -- they are
        the traffic cost of this lowering (two (pixels, ~sqrt(K)) arrays
        vs one (pixels,) index read), and 0/1 are exact in ANY float
        dtype, so bf16 halves the bytes without losing exactness (the
        products against the f32 table stay exact; only one term per row
        is nonzero so the f32 accumulation is a copy). Default from
        HALIDE_TPU_LUT_OH (f32 | bf16).
    """
    if oh_dtype is None:
        oh_dtype = (jnp.bfloat16 if _os.environ.get(
            "HALIDE_TPU_LUT_OH", "f32") == "bf16" else jnp.float32)
    K = tbl.shape[0]
    k1, k2 = split_k(K)
    pad = k1 * k2 - K
    t = jnp.asarray(tbl, jnp.float32)
    if pad:
        t = jnp.concatenate([t, jnp.zeros((pad,), jnp.float32)])
    tbl2 = t.reshape(k1, k2)
    hi, lo = digit_pair(idx, k2)
    A = jax.nn.one_hot(hi, k1, dtype=oh_dtype)
    B = jax.nn.one_hot(lo, k2, dtype=oh_dtype)
    # C[..., i] = sum_j B[..., j] * tbl2[i, j]
    C = jnp.tensordot(B.astype(jnp.float32), tbl2,
                      axes=[[-1], [1]], precision=_HI)
    return jnp.sum(A.astype(jnp.float32) * C, axis=-1)


def scatter_add_factored(lin, g, K: int, red_axes, mode: str = "f32"):
    """Histogram: out[batch..., k] = sum_{red_axes} where(lin == k, g, 0).

    lin: int32 over the full grid (out-of-range values >= K1*K2 drop; the
         caller maps its own OOB sentinel into that range).
    g:   values, same grid shape (broadcastable); accumulated in f32.
    red_axes: tuple of axes of the grid reduced over (the rdom axes).
    mode: MXU operand width -- the one-hots dominate HBM traffic (two
         (grid, ~sqrt(K)) operands vs one (grid,) index read), so the
         CALLER picks the narrowest exact width from its static value
         bound:
         - "int8":  integer g, |g| <= 127. s8 x s8 -> s32 MXU pass;
                    every partial product is 0 or g, summed in int32 --
                    exact for accumulated |sums| < 2^31.
         - "bf16":  g exactly bf16-representable (integers |g| <= 256, or
                    a constant with <= 8 significand bits). Products are
                    exact; accumulation in f32 via preferred_element_type.
         - "f32":   anything else (HIGHEST precision, exact < 2^24).
    Returns f32 (batch-dims-in-order..., K); caller reshapes/casts.
    """
    k1, k2 = split_k(K)
    hi, lo = digit_pair(lin, k2)
    if mode == "int8":
        odt, acc_t = jnp.int8, jnp.int32
    elif mode == "bf16":
        odt, acc_t = jnp.bfloat16, jnp.float32
    else:
        odt, acc_t = jnp.float32, jnp.float32
    A = jax.nn.one_hot(hi, k1, dtype=odt)
    B = jax.nn.one_hot(lo, k2, dtype=odt)
    Bg = B * jnp.asarray(g).astype(odt)[..., None]
    nd = max(A.ndim, Bg.ndim) - 1
    A = jnp.broadcast_to(A, jnp.broadcast_shapes(A.shape[:-1],
                                                 Bg.shape[:-1]) + A.shape[-1:])
    Bg = jnp.broadcast_to(Bg, A.shape[:-1] + Bg.shape[-1:])
    dims = list(range(nd))
    kept = [d for d in dims if d not in set(red_axes)]
    if mode == "f32":
        out2 = jnp.einsum(A, dims + [nd], Bg, dims + [nd + 1],
                          kept + [nd, nd + 1], precision=_HI)
    else:
        out2 = jnp.einsum(A, dims + [nd], Bg, dims + [nd + 1],
                          kept + [nd, nd + 1],
                          preferred_element_type=acc_t)
    out = out2.reshape(out2.shape[:-2] + (k1 * k2,))
    return out[..., :K].astype(jnp.float32)
