"""No-Ray host-capacity control for the scaling criterion.

The sandbox stands in for an N-vs-4N-NODE cluster with a single shared
32-vCPU host, so the measured Ray scaling efficiency is bounded by the
HOST's own multi-process scaling ceiling (SMT sharing, frequency
scaling, noisy neighbors) — not only by the engine.  This control runs
the bare extraction kernel (no Ray, plain multiprocessing, OMP pinned
to 1 thread per proc exactly like Ray workers) over identical parquet
shards at two process counts and reports the host's ceiling:

    ceiling = (tput_16proc / tput_4proc) / 4

Engine-relative efficiency = ray_efficiency / ceiling.  On a real
N -> 4N node cluster per-node parallelism is constant and this
confounder does not exist.

Usage: python tools/host_capacity_control.py [n_lo] [reps]
(default 4 -> 16, 2 interleaved reps, bench transcripts at mult=300)
"""

from __future__ import annotations

import glob
import json
import multiprocessing as mp
import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")

TPATH = os.environ.get(
    "CONTROL_TPATH",
    "/tmp/prlib_bench/transcripts_v3_m300_root_testdata_sf0.1",
)


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def work(path: str) -> int:
    import sys as _sys

    if REPO not in _sys.path:  # spawn workers don't inherit sys.path[0]
        _sys.path.insert(0, REPO)
    import pyarrow.parquet as pq

    from prlib_ray.stages.boilerplate import extract_turns_batch_nospans

    t = pq.read_table(path)
    # same batch granularity as the Ray pipeline (batch_size=4096);
    # whole-block batches are ~5x slower for the string kernel (cache
    # effects, NOTES_r1) and would understate host capacity
    for off in range(0, t.num_rows, 4096):
        extract_turns_batch_nospans(t.slice(off, 4096))
    return t.num_rows


def leg(nproc: int, files: list[str]) -> float:
    t0 = time.time()
    with mp.get_context("spawn").Pool(nproc) as pool:
        rows = sum(pool.map(work, files, chunksize=1))
    return rows / (time.time() - t0)


def main() -> None:
    n_lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_hi = 4 * n_lo
    files = sorted(glob.glob(f"{TPATH}/*.parquet"))[:32]
    if not files:
        raise SystemExit(f"no bench transcripts at {TPATH}; run bench.py first")
    # warm page cache + imports untimed
    leg(n_hi, files[:n_hi])
    runs = {n_lo: [], n_hi: []}
    for _ in range(reps):  # interleaved A/B/A/B
        for n in (n_lo, n_hi):
            runs[n].append(round(leg(n, files), 1))
    best_lo, best_hi = max(runs[n_lo]), max(runs[n_hi])
    print(json.dumps({
        "metric": "host_capacity_ceiling",
        "n_lo": n_lo, "n_hi": n_hi,
        f"tput_{n_lo}": best_lo, f"tput_{n_hi}": best_hi,
        f"all_reps_{n_lo}": runs[n_lo], f"all_reps_{n_hi}": runs[n_hi],
        "per_core_lo": round(best_lo / n_lo, 1),
        "per_core_hi": round(best_hi / n_hi, 1),
        "ceiling": round((best_hi / best_lo) / 4, 3),
    }))


if __name__ == "__main__":
    main()
