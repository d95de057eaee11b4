"""Fit the autoscheduler cost-model coefficients to the attached device
(the reference trains its cost model against measured runtimes:
src/autoschedulers/adams2019/DefaultCostModel.cpp:180 backprop +
retrain_cost_model.cpp; this measures the three analytical terms
directly and prints a target.FITTED_COST row).

    python -m halide_tpu.tools.fitcost

Measurements (each uses the bench run-length-differencing protocol so
tunnel dispatch cancels out):
  1. HBM stream bandwidth: jitted triad  o = a * s + b  over 256 MB
     (3 streams x 4 bytes -> bytes/s).
  2. VPU elementwise throughput: a K-deep multiply-add chain over the
     same arrays; the (t_K2 - t_K1) slope isolates compute from the
     stream time -> ops/s.
  3. ops_per_byte = ops_rate / bandwidth (machine balance).
  4. strided_penalty: DSL A/B of a pipeline whose consumer reads a
     producer at stride 2 on BOTH x and y: fused (inline, dual-strided
     reads) vs compute_root (split passes). Ratio of per-frame times.
"""
from __future__ import annotations

import sys
import time


def _per_frame(fn, args, k1=4, k2=16, reps=3):
    """Best (t_k2 - t_k1)/(k2 - k1) over reps, host-loop protocol."""
    import numpy as np

    def force(o):
        x = o
        while isinstance(x, (tuple, list)):
            x = x[0]
        np.asarray(x.reshape(-1)[:1])

    force(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k1):
            o = fn(*args)
        force(o)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(k2):
            o = fn(*args)
        force(o)
        t2 = time.perf_counter() - t0
        best = min(best, (t2 - t1) / (k2 - k1))
    return best


def main(argv=None) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    print(f"fitcost: device {dev}", flush=True)

    n = 64 * 1024 * 1024 // 4          # 64 MB per stream
    a = jnp.arange(n, dtype=jnp.float32) * 1e-6
    b = jnp.ones((n,), jnp.float32)

    # 1) triad bandwidth: reads a,b + writes o = 3 streams
    triad = jax.jit(lambda x, y: x * np.float32(1.5) + y)
    dt = _per_frame(triad, (a, b))
    bw = 3.0 * n * 4 / dt
    print(f"fitcost: triad {dt*1e3:.3f} ms -> {bw/1e9:.0f} GB/s", flush=True)

    # 2) VPU rate: K fused multiply-adds per element; slope over K
    def chain(k):
        @jax.jit
        def f(x, y):
            acc = x
            for _ in range(k):
                acc = acc * np.float32(1.0000001) + y
            return acc
        return f

    k_lo, k_hi = 8, 64
    t_lo = _per_frame(chain(k_lo), (a, b))
    t_hi = _per_frame(chain(k_hi), (a, b))
    ops = 2.0 * n * (k_hi - k_lo) / max(t_hi - t_lo, 1e-9)
    print(f"fitcost: chain slope {t_lo*1e3:.3f} -> {t_hi*1e3:.3f} ms "
          f"-> {ops/1e12:.2f} Tops/s", flush=True)
    ops_per_byte = ops / bw

    # 3) dual-strided fused-read penalty through the DSL
    import halide_tpu as hl

    def build(split: bool):
        x, y = hl.Var("x"), hl.Var("y")
        W, H = 1280, 768
        rng = np.random.default_rng(0)
        img = rng.random((2 * H, 2 * W)).astype(np.float32)
        inp = hl.Buffer(img, name="fc_in")
        dec = hl.Func("fc_dec")
        dec[x, y] = inp[2 * x, 2 * y] * 0.5
        out = hl.Func("fc_out")
        out[x, y] = dec[x, y] + dec[x + 1, y]
        if split:
            dec.compute_root()
        p = hl.Pipeline(out)
        fn, arrs, _r, presets = p._prepare([W, H], jit=False)
        jf = jax.jit(lambda ar: fn(ar, presets))
        args = tuple(jax.device_put(v) for v in arrs)
        return lambda: jf(args), ()

    fused_fn, _ = build(split=False)
    split_fn, _ = build(split=True)
    t_fused = _per_frame(lambda: fused_fn(), ())
    t_split = _per_frame(lambda: split_fn(), ())
    ratio = t_fused / max(t_split, 1e-9)
    print(f"fitcost: dual-strided fused {t_fused*1e3:.3f} ms vs split "
          f"{t_split*1e3:.3f} ms -> penalty {ratio:.1f}x", flush=True)

    from ..target import get_host_target
    gen = get_host_target().generation
    print("fitcost: suggested target.FITTED_COST row:", flush=True)
    print(f'    "{gen}": {{"ops_per_byte": {ops_per_byte:.1f}, '
          f'"strided_penalty": {max(ratio, 1.0):.1f}, '
          f'"vmem_budget": 8 * 1024 * 1024}},', flush=True)
    print(f"FITCOST {gen} ops_per_byte={ops_per_byte:.2f} "
          f"strided_penalty={ratio:.2f} bw_gbps={bw/1e9:.0f} "
          f"vpu_tops={ops/1e12:.2f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
