"""A/B harness: pipelined (double-buffered DMA) vs single-buffered kernels.

The group lowering overlaps the next tile's HBM->VMEM DMA with the current
tile's compute whenever the inner grid dimension iterates (the reference's
async()/ring_buffer() latency hiding, src/AsyncProducers.cpp, tutorial
lesson_24). This tool measures that decision ON HARDWARE for a scheduled
app by realizing the same pipeline with the double-buffer enabled and then
disabled (HALIDE_TPU_NO_PIPELINE=1), printing both steady-state times.

    python -m halide_tpu.tools.abtest [app] [--size WxH] [--reps N]

(reference analog: apps/*/process.cpp printing manual vs auto times;
RunGen --benchmarks=all, tools/RunGen.h:1267.)
"""
from __future__ import annotations

import argparse
import os
import sys


def _bench(app_name: str, sizes_kw: dict):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    import bench
    from halide_tpu.apps import APPS, load_all
    from halide_tpu.ops import pallas_group as pg

    load_all()
    app = APPS[app_name](**sizes_kw) if sizes_kw else APPS[app_name]()
    app.bind(app.make_inputs())
    pg._last_plan = None
    dt = bench.bench_one(app)
    return dt, pg._last_plan


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("app", nargs="?", default="blur")
    ap.add_argument("--size", default=None, help="WxH override")
    args = ap.parse_args(argv)
    kw = {}
    if args.size:
        w, h = (int(v) for v in args.size.split("x"))
        kw = dict(width=w, height=h)

    os.environ.pop("HALIDE_TPU_NO_PIPELINE", None)
    dt_pipe, plan_pipe = _bench(args.app, kw)
    os.environ["HALIDE_TPU_NO_PIPELINE"] = "1"
    dt_single, plan_single = _bench(args.app, kw)
    os.environ.pop("HALIDE_TPU_NO_PIPELINE", None)

    print(f"{args.app}: pipelined {dt_pipe*1e3:.3f} ms "
          f"(plan {plan_pipe and plan_pipe.get('pipelined')}) | "
          f"single-buffered {dt_single*1e3:.3f} ms "
          f"(plan {plan_single and plan_single.get('pipelined')}) | "
          f"speedup {dt_single/dt_pipe:.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
