"""Measured tile-size search: benchmark a menu of tile shapes ON HARDWARE
and report the winner (the reference autotunes its schedules against real
timings, src/autoschedulers/adams2019 retrain loop; here the model stays
analytical and this tool closes the loop per pipeline).

    python -m halide_tpu.tools.tilesearch [app] [--size WxH]
           [--tiles 2560x128,2560x256,1024x128,...]

Each shape rebuilds the app, applies the autoscheduler with the forced
tile (params={"tile": (tx, ty)}), verifies against the app's golden, and
times it with the bench protocol. Prints one line per shape plus the
winner vs the analytical pick.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("app", nargs="?", default="blur")
    ap.add_argument("--size", default=None, help="WxH override")
    ap.add_argument("--tiles", default=None,
                    help="comma-separated WxH tile menu; default derives "
                         "from the output width")
    args = ap.parse_args(argv)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    import bench
    from ..apps import APPS, load_all
    from ..autoschedule import apply_autoscheduler
    from ..ops import pallas_group as pg

    load_all()
    kw = {}
    if args.size:
        w, h = (int(v) for v in args.size.split("x"))
        kw = dict(width=w, height=h)

    def build(tile):
        app = APPS[args.app](**kw) if kw else APPS[args.app]()
        for out_f in app.pipeline.outputs:
            try:
                out_f.set_estimates([(0, int(s))
                                     for s in app.output_sizes])
            except Exception:
                pass
        params = {"tile": tile} if tile is not None else None
        apply_autoscheduler(app.pipeline, params=params or {})
        app.bind(app.make_inputs())
        return app

    # analytical pick first (tile=None)
    rows = []
    for label, tile in [("auto", None)] + [
            (t, tuple(int(v) for v in t.split("x")))
            for t in (args.tiles.split(",") if args.tiles else [])]:
        try:
            app = build(tile)
            data = app.make_inputs()
            app.bind(data)
            got = np.asarray(app.realize())
            refv = app.reference(**data)
            if refv is not None:
                r2 = np.asarray(refv)
                err = np.abs(got.astype(np.float64) - r2.astype(np.float64))
                tol = app.tolerance * np.maximum(1.0, np.abs(r2)) \
                    + max(app.atol, 1e-12)
                if float((err > tol).mean()) > max(app.mismatch_frac, 0.0):
                    print(f"{label}: CHECK FAILED (plan {pg._last_plan})")
                    continue
            dt = bench.bench_one(app)
            rows.append((dt, label))
            print(f"{label}: {dt*1e3:.3f} ms  plan={pg._last_plan}",
                  flush=True)
        except Exception as e:
            print(f"{label}: ERROR {type(e).__name__}: {e}", flush=True)
    if rows:
        rows.sort()
        print(f"winner: {rows[0][1]} at {rows[0][0]*1e3:.3f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
