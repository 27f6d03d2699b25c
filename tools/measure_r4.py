"""Round-4 chip-measurement battery: point family + elevation.

VERDICT r3 Weak #2: `point_triplane_occ` (whole model family; projector
hot path = ops/scatter.point_axis_pools, the spconv replacement —
reference point_triplane_projector.py:66-117) and `triplane_elev` had
ZERO chip perf coverage.  This battery sweeps their batch sizes so
bench.py's new sections can run at measured operating points, and warms
the persistent compile cache for the driver's bench invocation.

Usage: ``python tools/measure_r4.py [--iters N] [--only 1,2,3]``
(sections fault-isolated; safe to rerun).  NEVER run concurrently with
another TPU process — single-client tunnel.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: AOT compile + hard-sync timing)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--only", default=None,
                   help="comma-separated subset of 1,2,3")
    args = p.parse_args()
    only = set((args.only or "1,2,3").split(","))

    err = bench._preflight_retry()
    if err is not None:
        print(json.dumps({"error": err}))
        return

    jobs = []
    if "1" in only:  # point-family inference sweep
        jobs += [
            ("point_infer_B4",
             lambda: bench.bench_point_infer(4, args.iters)),
            ("point_infer_B8",
             lambda: bench.bench_point_infer(8, args.iters)),
        ]
    if "2" in only:  # point-family train sweep (full bwd: freeze=() in
        # the reference config, only ConvNeXt frozen_stages apply)
        jobs += [
            ("point_train_B2",
             lambda: bench.bench_point_train(2, max(8, args.iters // 2))),
            ("point_train_B4",
             lambda: bench.bench_point_train(4, max(8, args.iters // 2))),
        ]
    if "3" in only:  # elevation fine-tune sweep (frozen encoder+neck)
        jobs += [
            ("elev_train_B2",
             lambda: bench.bench_elev_train(2, max(8, args.iters // 2))),
            ("elev_train_B4",
             lambda: bench.bench_elev_train(4, max(8, args.iters // 2))),
        ]

    for name, fn in jobs:
        try:
            r = fn()
            out = {"name": name,
                   "samples_per_s": round(r["samples_per_s"], 2),
                   "step_ms": round(r["step_s"] * 1e3, 2)}
            if r.get("flops", 0) > 0:
                out["tflops_per_step"] = round(r["flops"] / 1e12, 3)
        except Exception as e:  # fault-isolate (e.g. an expected OOM)
            out = {"name": name, "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
