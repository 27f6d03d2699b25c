"""Round-3 chip-measurement queue: the experiments blocked on the tunnel.

Runs each pending measurement in sequence on the real chip and prints
one JSON line per result, so a single invocation settles every open
perf question the moment the axon tunnel is alive again:

1. occ inference B=4 vs B=8 — did the natively-batched sampler forward
   (b6b850c) fix the B=8 regression (r2 ledger: 44.8 < 47.5)?
2. occ train B=2, fused flat AdamW off/on — adopt `optimizer.fused`
   as default if it wins (ledger: optimizer ~13 ms of the step,
   ~7 ms HBM floor).
3. MAE range_cam train B=1, fused off/on — same question on the
   pretrain path (step was 141 ms, 7.05 samples/s).
4. surf_sam train B=2 vs B=4 — did the sampler-bwd H-tiling (b6b850c)
   unlock B>=4 (r2: VMEM OOM)?
5. occ train B=4 — with the frozen-encoder backward now DCE'd
   (trainer freeze_prefixes stop_gradient), the step is much lighter;
   does a bigger batch now win?
6. MAE range_cam train B=2 — the r2 "zero batching gain" verdict
   predates the fused epilogue/attention backwards; re-check.

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
    only = set((args.only or "1,2,3,4,5,6").split(","))

    err = bench._preflight()
    if err is not None:
        print(json.dumps({"error": err}))
        return

    jobs = []
    if "1" in only:
        jobs += [
            ("occ_infer_B4", lambda: bench.bench_infer(4, args.iters)),
            ("occ_infer_B8", lambda: bench.bench_infer(8, args.iters)),
        ]
    if "2" in only:
        jobs += [
            ("occ_train_B2", lambda: bench.bench_occ_train(2, args.iters)),
            ("occ_train_B2_fused",
             lambda: bench.bench_occ_train(2, args.iters, fused=True)),
        ]
    if "3" in only:
        jobs += [
            ("mae_train_B1", lambda: bench.bench_mae_train(1, args.iters)),
            ("mae_train_B1_fused",
             lambda: bench.bench_mae_train(1, args.iters, fused=True)),
        ]
    if "4" in only:
        jobs += [
            ("surf_sam_train_B2",
             lambda: bench.bench_mae_train(
                 2, max(8, args.iters // 2), config="triplane_surf_sam")),
            ("surf_sam_train_B4",
             lambda: bench.bench_mae_train(
                 4, max(8, args.iters // 2), config="triplane_surf_sam")),
        ]
    if "5" in only:
        jobs += [
            ("occ_train_B4_fused",
             lambda: bench.bench_occ_train(4, args.iters, fused=True)),
        ]
    if "6" in only:
        jobs += [
            ("mae_train_B2", lambda: bench.bench_mae_train(
                2, max(8, args.iters // 2))),
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
