"""Round-5 chip-measurement battery (VERDICT r4 #1,2,3,9).

Sections (``--only`` comma subset, fault-isolated, safe to rerun):

  1  occ inference B=8 bf16 — re-emit with the fused-prologue FLOPs
     added back (#1: BENCH_r04's mfu 0.0605 was undercounted; expect
     tflops_per_step ~2.93 at B=8 => mfu ~9%).
  2  int8-static calibrated serving battery (#2): occ infer B=8 full /
     neck+decoder / encoder-only, vs bf16 48.35 and dynamic-int8 44.63.
  3  MAE train B=2 A/B with the fused neck prologues toggled (#9: the
     10.84 -> 10.59 regression between the r3 ledger and BENCH_r04).
  4  surf_sam MAE train B=8 (new bench section sanity).
  5  point_triplane_occ train: B=2 baseline, then the three B=4
     remote-compiler-crash workarounds (#3): plain retry, --remat,
     EMP_DISABLE_GS_MM=1 (gather-form sampler).

Usage: ``python tools/measure_r5.py [--iters N] [--only 1,2,...]``.
NEVER run concurrently with another TPU process — single-client tunnel.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--only", default=None)
    args = p.parse_args()
    only = set((args.only or "1,2,3,4,5").split(","))

    err = bench._preflight_retry()
    if err is not None:
        print(json.dumps({"error": err}))
        return

    def env_job(fn, **env):
        def run():
            old = {k: os.environ.get(k) for k in env}
            try:
                for k, v in env.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
                return fn()
            finally:
                for k, v in old.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
        return run

    it = args.iters
    jobs = []
    if "1" in only:
        jobs += [("occ_infer_B8_bf16", lambda: bench.bench_infer(8, it))]
    if "2" in only:
        jobs += [
            ("occ_infer_B8_int8static_full",
             lambda: bench.bench_infer(8, it, int8=True,
                                       int8_mode="static")),
            ("occ_infer_B8_int8static_neck_dec",
             lambda: bench.bench_infer(8, it, int8=True,
                                       int8_parts=("neck", "decoder"),
                                       int8_mode="static")),
            ("occ_infer_B8_int8static_encoder",
             lambda: bench.bench_infer(8, it, int8=True,
                                       int8_parts=("encoder",),
                                       int8_mode="static")),
        ]
    if "3" in only:
        jobs += [
            ("mae_train_B2_prologue_on",
             lambda: bench.bench_mae_train(2, max(8, it // 2))),
            ("mae_train_B2_prologue_off",
             env_job(lambda: bench.bench_mae_train(2, max(8, it // 2)),
                     EMP_DISABLE_FUSED_PROLOGUE="1")),
        ]
    if "4" in only:
        jobs += [
            ("surf_sam_train_B8",
             lambda: bench.bench_mae_train(8, max(6, it // 5),
                                           config="triplane_surf_sam")),
        ]
    if "5" in only:
        jobs += [
            ("point_train_B2",
             lambda: bench.bench_point_train(2, max(8, it // 2))),
            ("point_train_B4_plain",
             lambda: bench.bench_point_train(4, max(8, it // 2))),
            ("point_train_B4_remat",
             lambda: bench.bench_point_train(4, max(8, it // 2),
                                             remat=True)),
            ("point_train_B4_no_gs_mm",
             env_job(lambda: bench.bench_point_train(4, max(8, it // 2)),
                     EMP_DISABLE_GS_MM="1")),
        ]

    for name, fn in jobs:
        try:
            r = fn()
            out = {"name": name,
                   "samples_per_s": round(r["samples_per_s"], 2),
                   "step_ms": round(r["step_s"] * 1e3, 2)}
            if r.get("flops", 0) > 0:
                out["tflops_per_step"] = round(r["flops"] / 1e12, 3)
        except Exception as e:
            out = {"name": name, "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
