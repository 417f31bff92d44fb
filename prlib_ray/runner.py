"""CLI entry point — the shape a production run takes via ``ray job submit``:

    ray job submit -- python -m prlib_ray.runner \\
        --sf-dir /root/testdata/sf0.001 --out /tmp/extract_out

Reads the corpus, runs the flagship extraction DAG, writes the resumable
bucketed layout, and resumes automatically: buckets already manifested
(same stage version) are skipped on rerun.

This module owns a Ray session only when executed as a script (guarded
init, per the driver contract).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="prlib_ray flagship extraction")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", required=True)
    p.add_argument("--num-buckets", type=int, default=16)
    p.add_argument("--meta-via", choices=["broadcast", "join"],
                   default="broadcast")
    p.add_argument("--no-resume", action="store_true",
                   help="rewrite every bucket even if manifested")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from prlib_ray.pipelines.extract import flagship
    from prlib_ray.state.partitioning import finished_buckets, write_partitioned

    skip = set() if args.no_resume else finished_buckets(args.out)
    t0 = time.time()
    ds = flagship(
        args.sf_dir,
        include_spans=(args.meta_via != "join"),
        meta_via=args.meta_via,
        num_buckets=args.num_buckets,
    )
    manifests = write_partitioned(
        ds, args.out, num_buckets=args.num_buckets, skip_buckets=skip,
        with_counters=True,
        input_meta={"sf_dir": args.sf_dir, "stage": "flagship",
                    "meta_via": args.meta_via},
    )
    summary = {
        "out": args.out,
        "buckets_written": len(manifests),
        "buckets_skipped": sorted(skip),
        "rows": sum(m["rows"] for m in manifests),
        "bytes": sum(m["bytes"] for m in manifests),
        "seconds": round(time.time() - t0, 2),
    }
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
