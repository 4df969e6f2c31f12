"""Serving-engine saturation sweep: p50/p99 latency vs offered load.

r4 VERDICT stretch #10: one serving-latency row says nothing about how
the continuous-batching engine DEGRADES — the interesting number for a
deployment is where admission latency (wait for a free slot) stops being
small relative to the whole-trajectory service time.  This sweep drives
`bench._leg_serving` (16 slots, CIFAR UNet bf16, DDIM-50 CFG — the exact
BENCH serving leg) at increasing concurrent-client counts and prints one
JSON row per load point:

    python tools/bench_serving_sweep.py            # full sweep on the TPU
    python tools/bench_serving_sweep.py --workers 1,8,32

At workers <= slots every request is admitted immediately and latency is
~the per-image trajectory time; past saturation (workers > slots) each
request first waits for a slot, so p50 climbs toward
(workers/slots) x trajectory time while throughput plateaus at the
engine's steady-state samples/s.  Results land in docs/benchmarks.md's
serving section.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402  (shares the engine geometry + timing rules)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", default="1,4,8,16,32,64",
                    help="comma-separated concurrent-client counts")
    ap.add_argument("--num_slots", type=int, default=16)
    ap.add_argument("--requests_per_worker", type=int, default=8)
    ap.add_argument("--steps_per_tick", type=int, default=5)
    args = ap.parse_args()

    rows = []
    for w in [int(x) for x in args.workers.split(",")]:
        n = max(args.num_slots, w * args.requests_per_worker)
        p50_ms, extras = bench._leg_serving(
            num_slots=args.num_slots, num_requests=n, workers=w,
            steps_per_tick=args.steps_per_tick,
        )
        row = {
            "workers": w,
            "steps_per_tick": extras["steps_per_tick"],
            "num_requests": n,
            "p50_ms": round(p50_ms, 1),
            "p99_ms": extras["p99_ms"],
            "throughput_sps": extras["throughput_sps"],
            "batch_mode_latency_ms": extras["batch_mode_latency_ms"],
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"sweep": rows, "num_slots": args.num_slots}))


if __name__ == "__main__":
    main()
