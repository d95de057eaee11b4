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


def _pow2_split(K: int):
    """K -> (k1, k2), BOTH powers of two, k1*k2 >= K, k2 ~ sqrt(K).
    The block-diagonal kernel needs pow2 digits for shift/mask and for
    the `m % k` lane/sublane masks."""
    k2 = 1 << max(3, int(round(math.log2(max(K, 1)) / 2)))
    k2 = min(k2, 128)
    k1 = 1
    while k1 * k2 < K:
        k1 <<= 1
    return k1, k2


def rowhist_blockdiag(lin2d, K: int, interpret: bool = False,
                      assume_in_range: bool = False):
    """Per-row histogram counts[r, k] = |{p : lin2d[r, p] == k}| as f32,
    one Pallas pass (reference analog: apps/hist's per-row hist_rows stage,
    apps/hist/hist_generator.cpp:28-35).

    The pure-XLA factored path (scatter_add_factored) materializes two
    (R*P, ~sqrt(K)) one-hot operands in HBM -- for hist's 2560x1536 grid
    that is ~250 MB of traffic, which measures ~0.55 ms on v5e (HBM-bound).
    This kernel builds the one-hots in VMEM and packs B = 128/max(k1,k2)
    rows into ONE block-diagonal (B*k1, P) x (B*k2, P) -> (128, 128)
    "nt"-layout MXU matmul per group (row b's joint (hi, lo) histogram is
    the b-th diagonal block), so HBM traffic collapses to the bins read
    (~16 MB) and MXU utilization rises ~B-fold over the batched 16x16
    einsum. The kernel emits the raw (M, N) block products; the cheap
    diagonal-block extraction runs in XLA on the (R/B, M, N) result
    (Mosaic-side slicing of the accumulator into (k1, k2) sub-blocks was
    rejected by the Mosaic lowering). Exact: one-hots are 0/1 in bf16,
    accumulation is f32 (preferred_element_type), counts < 2^24.

    lin2d: (R, P) int32; entries outside [0, K) drop.
    Returns (R, K) float32 counts.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, P = lin2d.shape
    k1, k2 = _pow2_split(K)
    Kp = k1 * k2
    B = 128 // max(k1, k2)
    if B < 1:
        raise ValueError(f"K={K} too wide for the block-diagonal kernel")
    M, N = B * k1, B * k2
    # prefer a lane block that DIVIDES P: jnp.pad on the minor axis is a
    # full-array copy (~40 MB round-trip for hist) that erases the win
    PB = 0
    for cand in (1024, 896, 768, 640, 512, 384, 256, 128):
        if P % cand == 0:
            PB = cand
            break
    if not PB:
        PB = min(1024, -(-P // 128) * 128)
    sh = k2.bit_length() - 1

    lin2d = jnp.asarray(lin2d, jnp.int32)
    if not (assume_in_range and K == Kp):
        # drop sentinel: anything outside [0, K) maps to Kp (hi digit ==
        # k1, which no sublane mask matches). assume_in_range callers
        # guarantee lin in [0, K]; when K == Kp the K sentinel itself
        # already lands on hi == k1, so the pass is skipped entirely.
        lin2d = jnp.where((lin2d < 0) | (lin2d >= K), jnp.int32(Kp), lin2d)
    Rp = -(-R // B) * B
    Pp = -(-P // PB) * PB
    if Rp != R or Pp != P:
        lin2d = jnp.pad(lin2d, ((0, Rp - R), (0, Pp - P)),
                        constant_values=Kp)
    n_rb = Rp // B
    n_pb = Pp // PB

    def kernel(bins_ref, out_ref, acc_ref):
        # the select runs in f32 (same (8,128) native tiling as the i32
        # compare mask -- selecting bf16 directly needs an i1 relayout to
        # (16,128) that Mosaic rejects), then casts to bf16 for the MXU.
        # Scalar literals, NOT jnp.ones(()): rank-0 array constants fail
        # Mosaic legalization ("failed to legalize func.return").
        one = jnp.float32(1)
        zero = jnp.float32(0)
        pj = pl.program_id(1)

        @pl.when(pj == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        grp = bins_ref[...]                       # (B, PB) int32
        hi = jax.lax.shift_right_logical(grp, jnp.int32(sh))
        lo = jnp.bitwise_and(grp, jnp.int32(k2 - 1))
        # sublane-repeat each row k times: (B, PB) -> (B*k, PB) with
        # m = b*k + i; compare against the per-sublane digit iota
        hi_r = jnp.broadcast_to(hi[:, None, :], (B, k1, PB)).reshape(M, PB)
        lo_r = jnp.broadcast_to(lo[:, None, :], (B, k2, PB)).reshape(N, PB)
        ii = jnp.bitwise_and(
            jax.lax.broadcasted_iota(jnp.int32, (M, PB), 0),
            jnp.int32(k1 - 1))
        jj = jnp.bitwise_and(
            jax.lax.broadcasted_iota(jnp.int32, (N, PB), 0),
            jnp.int32(k2 - 1))
        A = jnp.where(hi_r == ii, one, zero).astype(jnp.bfloat16)
        Bm = jnp.where(lo_r == jj, one, zero).astype(jnp.bfloat16)
        O = jax.lax.dot_general(                   # contract the lane axis
            A, Bm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # (M, N)
        acc_ref[...] = acc_ref[...] + O

        @pl.when(pj == n_pb - 1)
        def _():
            out_ref[0] = acc_ref[...]

    blocks = pl.pallas_call(
        kernel,
        grid=(n_rb, n_pb),
        in_specs=[pl.BlockSpec((B, PB), lambda ri, pj: (ri, pj))],
        # literal 0s here lower as i64 constants under jax_enable_x64
        # (halide_tpu enables it globally) and Mosaic rejects the mixed
        # (i32, i64, i64) window transform -- derive the zeros from the
        # i32 grid index instead
        out_specs=pl.BlockSpec((1, M, N), lambda ri, pj: (ri, pj * 0,
                                                          pj * 0)),
        out_shape=jax.ShapeDtypeStruct((n_rb, M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(lin2d)
    # diagonal-block extraction (tiny: n_rb * 128 * 128 f32):
    # out[g*B + b, i*k2 + j] = blocks[g, b*k1 + i, b*k2 + j]
    b4 = blocks.reshape(n_rb, B, k1, B, k2)
    diag = jnp.diagonal(b4, axis1=1, axis2=3)      # (n_rb, k1, k2, B)
    out = jnp.moveaxis(diag, -1, 1).reshape(Rp, Kp)
    return out[:R, :K]


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
