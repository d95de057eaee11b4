#!/usr/bin/env python
"""Benchmark harness: runs the apps suite at canonical sizes on the attached
device and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N}

Protocol mirrors the reference's min-time benchmarker
(reference: tools/halide_benchmark.h, tools/RunGen.h:1267 run_for_benchmark):
repeat batches until enough wall time has elapsed, report the best sample.

vs_baseline compares against the reference's published hand-tuned CPU times
(BASELINE.md, embedded schedule comments in apps/*_generator.cpp), converted
to megapixels/sec at each app's canonical size.
"""
import json
import math
import sys
import time

import numpy as np


# reference hand-tuned CPU ms at canonical sizes (BASELINE.md table)
REF_CPU_MS = {
    "unsharp": 1.93, "harris": 0.92, "hist": 1.0, "iir_blur": 9.7,
    "bilateral_grid": 2.04, "local_laplacian": 21.4, "interpolate": 4.54,
    "max_filter": 47.0, "nl_means": 64.0, "stencil_chain": 4.23,
    "bgu": 7.09, "compositing": 2.0, "conv_layer": 4.06,
    "depthwise_separable_conv": 0.13,
    # blur: measured with the reference harness at 2568x1922 u16 on a
    # 16-thread desktop CPU; order-of-magnitude anchor (apps/blur/test.cpp)
    "blur": 1.2,
    # camera_pipe CPU is printed by its harness, not embedded; anchor value
    "camera_pipe": 5.0,
}

# canonical megapixels for the reference numbers above (BASELINE.md).
# Every app that is both size-overridden in APP_SIZES and present in
# REF_CPU_MS MUST have an entry here, otherwise vs_ref_cpu would divide a
# canonical-size reference time by a reduced-size workload.
REF_MP = {
    "blur": 2560 * 1536 / 1e6,
    "camera_pipe": 2560 * 1920 / 1e6,
    "nl_means": 2560 * 1536 / 1e6,
    "bgu": 2560 * 1536 / 1e6,
}

CANONICAL = dict(width=2560, height=1536)

# per-app overrides where the canonical size is compile-pathological in this
# environment (noted in COVERAGE.md; MP/s stays a fair throughput metric)
APP_SIZES = {
    "fft": dict(width=256, height=256),
    "nl_means": dict(width=1280, height=768),
    "lens_blur": dict(width=640, height=480),
    "bgu": dict(width=1280, height=768),
    # resnet's `width` is the CHANNEL width (64), not an image size --
    # passing CANONICAL would silently build a 40x-wider network whose
    # compile blows every deadline
    "resnet_50": dict(),
}


def _force(out):
    """Force execution to completion with a host readback (the attached
    device tunnel defers execution past block_until_ready)."""
    x = out
    while isinstance(x, (tuple, list)):
        x = x[0]
    flat = x.reshape(-1)
    return np.asarray(flat[:1])


def bench_one(app, min_delta_s=0.1, max_n=128, chain_k=24, chain=True):
    """Per-frame steady-state time. Primary protocol: run K frames inside
    ONE jitted lax.fori_loop with a data dependency injected between
    iterations (a zero-valued token derived from the previous output is
    added to the first input), so iterations serialize on the device and
    per-call tunnel/dispatch overhead is excluded: per = (t_K - t_1)/(K-1).
    Falls back to host-loop run-length differencing.
    (Replaces the reference's min-time loop, tools/halide_benchmark.h.)"""
    import jax
    import jax.numpy as jnp

    fn, input_arrays, _r, presets = app.pipeline._prepare(
        app.output_sizes, jit=False)
    args = tuple(jax.device_put(a) for a in input_arrays)

    @jax.jit
    def chain_run(args, k):
        def body(i, tok):
            # inject an analysis-resistant (but numerically inert) data
            # dependency so XLA cannot elide iterations: the branch is
            # taken only if the previous output's first element bitcasts
            # to INT_MIN
            bump = jnp.where(tok == jnp.int32(-2147483648),
                             jnp.ones((), args[0].dtype),
                             jnp.zeros((), args[0].dtype))
            a0 = args[0] + bump
            out = fn((a0,) + args[1:], presets)
            # the token must depend on EVERY output element: a full
            # reduction per leaf (fuses into the producer's epilogue).
            # Deriving it from one element lets XLA dead-code-eliminate
            # everything outside that element's dependency cone -- local
            # stencil pipelines then "run" in microseconds.
            acc = jnp.float32(0)
            for leaf in jax.tree_util.tree_leaves(out):
                acc = acc + jnp.sum(leaf).astype(jnp.float32)
            return jax.lax.bitcast_convert_type(acc, jnp.int32)
        # k is a traced bound: one compile serves both run lengths
        return jax.lax.fori_loop(0, k, body, jnp.int32(0), unroll=False)

    try:
        if not chain:
            raise _SkipChain()
        _force(chain_run(args, jnp.int32(1)))
        _force(chain_run(args, jnp.int32(chain_k)))
        best = math.inf
        for _ in range(3):
            t0 = time.perf_counter()
            _force(chain_run(args, jnp.int32(1)))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            _force(chain_run(args, jnp.int32(chain_k)))
            tk = time.perf_counter() - t0
            best = min(best, (tk - t1) / (chain_k - 1))
        if best < 5e-4:
            # sub-noise regime: the k=24 delta is comparable to tunnel
            # jitter (one fast app measured 0.005ms, another 7x high);
            # lengthen the chain 10x for resolution -- k is traced, so no
            # recompile
            k2 = 255
            best2 = math.inf
            for _ in range(3):
                t0 = time.perf_counter()
                _force(chain_run(args, jnp.int32(1)))
                t1 = time.perf_counter() - t0
                t0 = time.perf_counter()
                _force(chain_run(args, jnp.int32(k2)))
                tk = time.perf_counter() - t0
                best2 = min(best2, (tk - t1) / (k2 - 1))
            if best2 > 0:
                return best2
        # sub-microsecond per-frame deltas mean the chain was optimized out
        # or timing noise swamped the difference: fall back to host-loop
        # run-length differencing
        if best > 1e-6:
            return best
    except Exception:
        pass

    # presets close over as constants: tracing them as arguments makes the
    # XLA compile of very deep graphs (resnet) ~6x slower
    jfn = jax.jit(lambda a: fn(a, presets))
    out = jfn(args)
    _force(out)

    def run_n(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = jfn(args)
        _force(o)
        return time.perf_counter() - t0

    n = 4
    while True:
        t1 = run_n(n)
        t2 = run_n(2 * n)
        if t2 - t1 > min_delta_s or n >= max_n:
            break
        n *= 2
    return max((t2 - t1) / n, 1e-9)


class _SkipChain(Exception):
    pass


def _emit(results, ratios, errors, device=""):
    if not results:
        print(json.dumps({"metric": "apps_geomean_mp_per_s", "value": 0.0,
                          "unit": "MP/s", "vs_baseline": 0.0,
                          "errors": errors}), flush=True)
        return
    vals = [r["mp_per_s"] for r in results.values()]
    geo = math.exp(sum(math.log(max(v, 1e-9)) for v in vals) / len(vals))
    vs = (math.exp(sum(math.log(max(r, 1e-9)) for r in ratios)
                   / len(ratios)) if ratios else 0.0)
    print(json.dumps({
        "metric": "apps_geomean_mp_per_s",
        "value": round(geo, 2),
        "unit": "MP/s",
        "vs_baseline": round(vs, 3),
        "device": device,
        "apps": {k: {kk: round(vv, 3) for kk, vv in v.items()}
                 for k, v in results.items()},
        "errors": errors,
    }), flush=True)


def main():
    import os
    import signal
    import threading
    import jax

    class _HardDeadline(Exception):
        pass

    def _on_alarm(signum, frame):
        raise _HardDeadline()

    try:
        signal.signal(signal.SIGALRM, _on_alarm)
        signal.alarm(int(os.environ.get("BENCH_HARD_S", "490")))
    except Exception:
        pass
    try:
        # persistent compile cache: repeated bench runs skip recompiles
        # (opt-out: serializing very large executables can stall under a
        # remote-tunnel backend)
        if not os.environ.get("BENCH_NO_COMPCACHE"):
            jax.config.update("jax_compilation_cache_dir",
                              "/tmp/halide_tpu_jax_cache")
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    from halide_tpu.apps import APPS, load_all
    load_all()
    results = {}
    ratios = []
    errors = {}
    only = os.environ.get("BENCH_APPS")
    deadline = time.monotonic() + float(
        os.environ.get("BENCH_BUDGET_S", "430"))

    # a blocked remote compile cannot be interrupted by signals; the
    # watchdog thread emits whatever has been measured and exits hard
    done_flag = {"done": False}

    def watchdog():
        import time as _t
        _t.sleep(float(os.environ.get("BENCH_WATCHDOG_S", "515")))
        if not done_flag["done"]:
            errors["__watchdog__"] = "hard exit during a blocked compile"
            _emit(results, ratios, errors, "watchdog")
            os._exit(0)

    threading.Thread(target=watchdog, daemon=True).start()
    # importance order: apps with reference-CPU baselines (they drive
    # vs_baseline) and the north-star set first, so a budget exhaustion
    # drops only the tail; lens_blur last (it once faulted the worker)
    _rank = {n: i for i, n in enumerate([
        "blur", "bilateral_grid", "camera_pipe", "local_laplacian",
        "interpolate", "hist", "iir_blur", "unsharp", "harris",
        "stencil_chain", "compositing", "bgu", "max_filter", "nl_means",
        "conv_layer", "depthwise_separable_conv", "gaussian_blur",
        "wavelet", "resize", "linear_blur", "fft", "sgemm", "saxpy",
        "sdot", "sgemv", "resnet_50", "lens_blur"])}
    order = sorted(APPS, key=lambda n: (_rank.get(n, 99), n))
    for name in order:
        if only and name not in only.split(","):
            continue
        if time.monotonic() > deadline:
            errors[name] = "skipped: bench budget exhausted"
            continue
        try:
            t_app = time.monotonic()
            print(f"bench: {name}...", file=sys.stderr, flush=True)
            builder = APPS[name]
            try:
                app = builder(**APP_SIZES.get(name, CANONICAL))
            except TypeError:
                app = builder()
            data = app.make_inputs()
            app.bind(data)
            if os.environ.get("BENCH_CHECK"):
                # one correctness realize against the app's numpy golden
                # (catches backend miscompiles that CPU tests cannot see)
                import numpy as _np
                got = app.realize()
                gl = [_np.asarray(g) for g in
                      (got if isinstance(got, (list, tuple)) else [got])]
                refv = app.reference(**data)
                refs = refv if isinstance(refv, (list, tuple)) else [refv]
                worst = 0.0
                for g, rf in zip(gl, refs):
                    g64 = g.astype(_np.float64)
                    r64 = _np.asarray(rf).astype(_np.float64)
                    tol = app.tolerance * _np.maximum(1.0, _np.abs(r64)) \
                        + max(app.atol, 1e-12)
                    worst = max(worst, float(
                        (_np.abs(g64 - r64) > tol).mean()))
                ok = worst <= max(app.mismatch_frac, 0.0)
                if not ok:
                    # a miscompiled-but-fast app must not inflate the
                    # headline geomean: record the failure and skip it
                    errors[name] = f"CHECK FAILED: badfrac {worst:.4f}"
                    continue
            # no-chain set: some graphs make the fori_loop chain compile
            # pathological (resnet_50: minutes; bilateral_grid: 400s vs 12s
            # plain) or fault the worker (lens_blur) -- these use the
            # host-loop differencing protocol (their frames are >=4ms, so
            # per-call dispatch stays in the noise)
            dt = bench_one(app, chain=name not in (
                "resnet_50", "lens_blur", "bilateral_grid"))
            print(f"bench: {name} done in {time.monotonic()-t_app:.1f}s "
                  f"-> {dt*1e3:.3f} ms/frame", file=sys.stderr, flush=True)
            mps = app.megapixels / dt
            results[name] = {"ms": dt * 1e3, "mp_per_s": mps}
            if name in REF_CPU_MS:
                # the reference numbers are at the same canonical workload
                # unless REF_MP overrides (blur/camera use their own sizes)
                ref_mp = REF_MP.get(name, app.megapixels)
                ref_mps = ref_mp / (REF_CPU_MS[name] * 1e-3)
                ratios.append(mps / ref_mps)
                results[name]["vs_ref_cpu"] = mps / ref_mps
        except _HardDeadline:
            errors[name] = "skipped: hard deadline"
            break
        except Exception as e:  # keep the harness robust; report what ran
            errors[name] = f"{type(e).__name__}: {e}"
    done_flag["done"] = True
    _emit(results, ratios, errors, str(jax.devices()[0]))
    return 0 if results else 1


if __name__ == "__main__":
    sys.exit(main())
