"""Benchmark harness (driver contract).

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "turns_per_sec": ...}

Headline = flagship transcript extraction over materialized transcript
parquet at $GRAFT_SF_DIR (default /root/testdata/sf0.1).  Transcripts are
synthesized once per (sf, fixture-version) into /tmp and cached — the
timed region is read_parquet -> extract -> reassemble -> count, i.e. the
pipeline, not the fixture generator.

--scaling: run the headline twice in fresh processes at num_cpus=8 and
32 on the same input and report throughput at both + efficiency
(the sandbox stand-in for the N vs 4N node criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
FIXTURE_VERSION = 3
# bench-scale turn multiplier: ~4M turns at sf0.1 so fixed costs amortize
BENCH_TURNS_MULT = os.environ.setdefault("GRAFT_TURNS_MULT", "100")


def transcripts_path(sf_dir: str) -> str:
    tag = sf_dir.strip("/").replace("/", "_")
    return (f"/tmp/prlib_bench/transcripts_v{FIXTURE_VERSION}"
            f"_m{os.environ['GRAFT_TURNS_MULT']}_{tag}")


def materialize_transcripts(sf_dir: str) -> str:
    """Synthesize + write transcript parquet once; cached across runs so
    both scaling legs read identical bytes."""
    out = transcripts_path(sf_dir)
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    from prlib_ray.fixtures import transcripts_dataset

    os.makedirs(out, exist_ok=True)
    # 128 files so the read stage yields enough blocks to keep every core
    # busy (task granularity follows input blocks)
    transcripts_dataset(sf_dir).repartition(128).write_parquet(out)
    with open(done, "w") as f:
        f.write("ok")
    return out


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    from prlib_ray.pipelines.extract import extract_pipeline

    tpath = materialize_transcripts(SF_DIR)
    # warm-up (untimed): page cache AND worker processes — a long-running
    # cluster's workers already hold imports; a fresh local session pays
    # a one-time import storm that would otherwise pollute the measurement
    rd.read_parquet(tpath).count()
    import numpy as _np
    import pyarrow as _pa

    def _warm(b):
        from prlib_ray.stages import boilerplate  # noqa: F401  (import in worker)

        return b

    rd.range(NUM_CPUS * 4).map_batches(
        _warm, batch_size=1, batch_format="pyarrow"
    ).count()

    queries: dict[str, float] = {}

    # headline: full extraction + bucketed partitioned write (the
    # resumable production layout — no global sort, SURVEY §4)
    import shutil

    out_dir = f"/tmp/prlib_bench/out_{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)
    from prlib_ray.state.partitioning import write_partitioned

    t0 = time.time()
    ts = rd.read_parquet(tpath)
    extracted = extract_pipeline(ts, include_spans=False)
    manifests = write_partitioned(extracted, out_dir)
    headline = time.time() - t0
    n_turns = sum(m["rows"] for m in manifests)
    queries["flagship_extract"] = round(headline, 3)

    # secondary: materializing the total order with a global sort
    t0 = time.time()
    extract_pipeline(rd.read_parquet(tpath), include_spans=False,
                     physical="sort").count()
    queries["flagship_global_sort"] = round(time.time() - t0, 3)

    from prlib_ray.api import build_queries

    qs, _ = build_queries()
    for name in ("binarize_sauvola", "q1_pricing_summary", "deskew",
                 "dedup_exact", "token_count"):
        t0 = time.time()
        out = qs[name](SF_DIR)
        if hasattr(out, "count"):
            out.count()
        queries[name] = round(time.time() - t0, 3)

    result = {
        "metric": "extraction_wall_seconds",
        "value": queries["flagship_extract"],
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_turns": int(n_turns),
        "turns_per_sec": round(n_turns / headline, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def leg(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR)
        out = subprocess.run(
            [sys.executable, "bench.py"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = leg(8), leg(32)
    tput_lo = lo["turns_per_sec"]
    tput_hi = hi["turns_per_sec"]
    eff = (tput_hi / tput_lo) / (32 / 8)
    return {
        "metric": "scaling_efficiency",
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "turns_per_sec_8": tput_lo,
        "turns_per_sec_32": tput_hi,
        "scaling_efficiency": round(eff, 3),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
