"""Flagship batch sweep (VERDICT r4 #8 + the remat finding of the r5
roofline audit).

    python tools/bench_batch_sweep.py [--batches 8,12,16,24,32]

The r5 per-op roofline audit (tools/roofline_audit.py over
docs/perf/trace_flagship_r04_lpips.xplane.pb.gz) found ~80 ms/step of
``.remat``-suffixed fusion duplicates at batch 16 — XLA's automatic
HBM-pressure rematerialization re-executing ~7.5% of the step's FLOPs.
bench.py's config has remat=False, so this is the backend's choice, not
ours; the lever against it is the batch size (less live memory → no forced
recompute). This sweep measures img/s/chip at several batches and reports
each program's cost-analysis FLOPs/img — which are computed from the
OPTIMIZED HLO and therefore include any remat duplication, making the
recompute overhead directly visible as a per-image FLOP delta.

Prints one JSON line per batch. Reference role: the reference fixes batch
4/GPU by recipe (scripts/launch_hdr.sh) and never sweeps; this settles our
default with measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,12,16,24,32")
    args = ap.parse_args()

    import bench  # repo-root bench.py: build() + try_bench() reused as-is

    import jax

    n_chips = max(1, jax.device_count())
    results = []
    for b in [int(x) for x in args.batches.split(",")]:
        try:
            ips, flops_per_step, step_s = bench.try_bench(b)
        except Exception as e:
            print(json.dumps({"batch": b, "error": str(e)[:200]}), flush=True)
            continue
        rec = {
            "batch": b,
            "images_per_sec_per_chip": round(ips / n_chips, 3),
            "step_seconds": round(step_s, 4),
            "flops_per_image_T": (
                round(flops_per_step / b / 1e12, 4) if flops_per_step else None
            ),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    if results:
        best = max(results, key=lambda r: r["images_per_sec_per_chip"])
        print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
