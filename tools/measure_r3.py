"""Round-3 chip-measurement queue: the experiments blocked on the tunnel.

Runs each pending measurement in sequence on the real chip and prints
one JSON line per result, so a single invocation settles every open
perf question the moment the axon tunnel is alive again.

Session-8+ queue (bench_mae_train now freezes stage0/stem like
production -- frozen_stages=1 in every reference config -- so MAE
numbers are a NEW baseline vs the unfrozen session-7 ledger):

1. MAE range_cam train B=1/2/4 with the production freeze (stage0+stem
   backward DCE'd); does B=4 now win?
2. occ train B=8 -- chunked interact (b37f3f7) made B=8 the inference
   operating point; does the frozen fine-tune step follow?
3. surf_sam train B=2/4/8 with the production freeze.

Usage: `python tools/measure_r3.py [--iters N] [--only 1,..,6]`
(sections fault-isolated; safe to rerun).  NEVER run concurrently with
another TPU process.
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
                   help="comma-separated subset of 1,2,3,4")
    args = p.parse_args()
    only = set((args.only or "1,2,3").split(","))

    err = bench._preflight()
    if err is not None:
        print(json.dumps({"error": err}))
        return

    jobs = []
    # Session-8+ queue: bench_mae_train now freezes stage0/stem like
    # production (frozen_stages=1 in every reference config), so every
    # MAE number below is a NEW baseline, not comparable to the
    # unfrozen session-7 ledger entries.
    if "1" in only:
        jobs += [
            ("mae_train_B1", lambda: bench.bench_mae_train(1, args.iters)),
            ("mae_train_B2", lambda: bench.bench_mae_train(2, args.iters)),
            ("mae_train_B4", lambda: bench.bench_mae_train(
                4, max(8, args.iters // 2))),
        ]
    if "2" in only:
        jobs += [
            ("occ_train_B8", lambda: bench.bench_occ_train(8, args.iters)),
        ]
    if "3" in only:
        jobs += [
            ("surf_sam_train_B2",
             lambda: bench.bench_mae_train(
                 2, max(8, args.iters // 2), config="triplane_surf_sam")),
            ("surf_sam_train_B4",
             lambda: bench.bench_mae_train(
                 4, max(8, args.iters // 2), config="triplane_surf_sam")),
            ("surf_sam_train_B8",
             lambda: bench.bench_mae_train(
                 8, max(8, args.iters // 2), config="triplane_surf_sam")),
        ]

    for name, fn in jobs:
        try:
            r = fn()
            out = {"name": name,
                   "samples_per_s": round(r["samples_per_s"], 2),
                   "step_ms": round(r["step_s"] * 1e3, 2)}
        except Exception as e:  # fault-isolate (e.g. an expected OOM)
            out = {"name": name, "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
