"""Memory-pressure / spill demonstration (VERDICT r3 item 2).

Runs a pipeline whose in-memory working set exceeds the Ray object
store by >=2x and records that it completes streaming, plus the spill
telemetry (peak plasma usage, spilled/restored bytes) from Ray's own
memory summary.  The object store is deliberately CAPPED via
``ray.init(object_store_memory=...)`` — the sandbox stand-in for a
100 TB input against a fixed-size cluster's aggregate store, the same
role bench.py's two-CPU-level legs play for the N->4N criterion.

Usage:
    python tools/memory_pressure.py flagship   # ~42M-turn extract
    python tools/memory_pressure.py dedup      # minhash LSH over ~1.3M docs

Env knobs: PRLIB_STORE_MB (object store cap), GRAFT_TURNS_MULT
(flagship input multiplier), PRLIB_DOCS_MULT (dedup input multiplier).
Prints ONE JSON line per run.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _session_logs() -> str:
    import ray

    try:
        return os.path.join(
            ray._private.worker.global_worker.node.get_session_dir_path(),
            "logs")
    except Exception:
        return "/tmp/ray/ray/session_latest/logs"


class SpillMonitor:
    """Peak-usage + spill telemetry.  grpc (and with it `ray memory` /
    memory_summary) is unavailable in this environment, so: peak object
    store usage is sampled from the raylet's periodically-refreshed
    debug_state.txt ('pinned objects size' + bytes pending/currently
    spilled), and cumulative spilled/restored MiB comes from the
    raylet.out log lines ('Spilled N MiB, M objects, ...')."""

    def __init__(self):
        import threading

        self.logs = _session_logs()
        self.peak_pinned = 0
        self.peak_spilled = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._poll, daemon=True)

    def _read_debug(self) -> tuple[int, int]:
        try:
            with open(os.path.join(self.logs, "debug_state.txt"),
                      errors="replace") as f:
                txt = f.read()
        except OSError:
            return 0, 0
        pin = re.findall(r"pinned objects size: (\d+)", txt)
        cur = re.findall(r"num bytes currently spilled: (\d+)", txt)
        return (max((int(x) for x in pin), default=0),
                max((int(x) for x in cur), default=0))

    def _poll(self):
        while not self._stop.wait(0.5):
            pin, cur = self._read_debug()
            self.peak_pinned = max(self.peak_pinned, pin)
            self.peak_spilled = max(self.peak_spilled, cur)

    def start(self):
        self._t.start()
        return self

    def stop(self) -> dict:
        self._stop.set()
        self._t.join(timeout=2)
        out = {
            "peak_object_store_mib": self.peak_pinned // 2**20,
            "peak_bytes_spilled_mib": self.peak_spilled // 2**20,
        }
        try:
            with open(os.path.join(self.logs, "raylet.out"),
                      errors="replace") as f:
                txt = f.read()
        except OSError:
            return out
        sp = re.findall(r"Spilled (\d+) MiB, (\d+) objects", txt)
        if sp:
            out["cumulative_spilled_mib"] = int(sp[-1][0])
            out["cumulative_spilled_objects"] = int(sp[-1][1])
        rs = re.findall(r"Restored (\d+) MiB, (\d+) objects", txt)
        if rs:
            out["cumulative_restored_mib"] = int(rs[-1][0])
        return out


def _init(store_mb: int):
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        object_store_memory=store_mb * 1024 * 1024,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def _input_mem_bytes(path_glob_dir: str) -> int:
    """Estimate the decompressed in-memory Arrow size of a parquet dir
    from one file's nbytes scaled by file count (files are uniform)."""
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(f"{path_glob_dir}/*.parquet"))
    one = pq.read_table(files[0]).nbytes
    return one * len(files)


def run_flagship(physical: str = "bucket",
                 meta_via: str = "broadcast") -> dict:
    os.environ.setdefault("GRAFT_TURNS_MULT", "1000")
    store_mb = int(os.environ.get("PRLIB_STORE_MB", "2048"))
    ray = _init(store_mb)
    import ray.data as rd

    import bench

    tpath = bench.materialize_transcripts(SF_DIR)
    in_bytes = _input_mem_bytes(tpath)
    from prlib_ray.pipelines.extract import extract_pipeline

    mon = SpillMonitor().start()
    t0 = time.time()
    n = extract_pipeline(rd.read_parquet(tpath), include_spans=False,
                         physical=physical, meta_via=meta_via).count()
    wall = time.time() - t0
    out = {
        "job": f"flagship_extract[{meta_via}/{physical}]",
        "turns_mult": os.environ["GRAFT_TURNS_MULT"],
        "n_turns": int(n),
        "object_store_mb": store_mb,
        "input_arrow_mb": in_bytes // (1024 * 1024),
        "input_over_store": round(in_bytes / (store_mb * 1024 * 1024), 2),
        "wall_sec": round(wall, 1),
        "turns_per_sec": round(n / wall, 1),
        "spill": mon.stop(),
    }
    ray.shutdown()
    return out


def _big_docs_dir(mult: int) -> str:
    """documents.parquet replicated ``mult`` times with offset doc_ids
    and PER-REPLICA text perturbation (deterministic; cached).

    The perturbation matters: verbatim replicas make EVERY doc a
    128-way near-dup, so every LSH band bucket saturates its hot-cap
    and the candidate-pair volume explodes ~ mult x corpus — an
    adversarial all-duplicate corpus, not a scale test (measured: 80+
    GiB of shuffle spill at mult=128).  Interleaving a replica-unique
    token every few words keeps shingle overlap between replicas low,
    so bucket populations stay realistic while the corpus volume
    scales."""
    out = f"/tmp/prlib_bench/bigdocs_m{mult}_v2"
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    os.makedirs(os.path.join(out, "documents.parquet"), exist_ok=True)
    ids = t["doc_id"].to_numpy().astype(np.int64)
    texts = t["text"].to_pylist()
    col = t.schema.get_field_index("text")
    for k in range(mult):
        perturbed = []
        for i, s in enumerate(texts):
            w = s.split(" ")
            tok = f"u{k}x{i % 97}"
            # a unique token every 2 words breaks every 3-shingle
            perturbed.append(" ".join(
                x for j, ww in enumerate(w)
                for x in ((ww, f"{tok}n{j}") if j % 2 == 1 else (ww,))))
        t2 = (t.set_column(t.schema.get_field_index("doc_id"), "doc_id",
                           pa.array(ids + k * 10_000_000))
              .set_column(col, "text",
                          pa.array(perturbed, type=pa.string())))
        # documents.parquet is a DIRECTORY here — every dedup op's
        # read_parquet(f"{sf_dir}/documents.parquet") accepts it
        pq.write_table(t2, os.path.join(
            out, "documents.parquet", f"part-{k:05d}.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return out


def run_dedup() -> dict:
    mult = int(os.environ.get("PRLIB_DOCS_MULT", "256"))
    store_mb = int(os.environ.get("PRLIB_STORE_MB", "1024"))
    # the 100-TB blob layout: stream the shingle-blob substrate through
    # storage instead of pinning it in the capped object store (see
    # minhash_lsh_dedup; materialize() livelocks when blobs >> store)
    os.environ.setdefault("PRLIB_BLOB_SPILL_DIR",
                          "/tmp/prlib_bench/blob_spill")
    big = _big_docs_dir(mult)
    ray = _init(store_mb)
    in_bytes = _input_mem_bytes(os.path.join(big, "documents.parquet"))
    from prlib_ray.stages.dedup import minhash_lsh_dedup

    mon = SpillMonitor().start()
    t0 = time.time()
    n = minhash_lsh_dedup(big).count()
    wall = time.time() - t0
    out = {
        "job": "dedup_minhash_lsh",
        "docs_mult": mult,
        "n_docs": 5000 * mult if "sf0.1" in SF_DIR else None,
        "n_pairs": int(n),
        "object_store_mb": store_mb,
        "input_arrow_mb": in_bytes // (1024 * 1024),
        "input_over_store": round(in_bytes / (store_mb * 1024 * 1024), 2),
        "wall_sec": round(wall, 1),
        "spill": mon.stop(),
    }
    ray.shutdown()
    return out


if __name__ == "__main__":
    job = sys.argv[1] if len(sys.argv) > 1 else "flagship"
    if job == "flagship":
        res = run_flagship()
    elif job == "sort":
        # the all-to-all variant: materializing the total order must
        # hold the dataset through the shuffle -> exercises real spill
        res = run_flagship(physical="sort")
    elif job == "joinsort":
        # the distributed-meta 10^12-conversation layout (meta via hash
        # join + total order via sort) — the shape scaling run 1 proved
        # superlinear, now driven under store pressure (r5 item 5)
        res = run_flagship(physical="sort", meta_via="join")
    else:
        res = run_dedup()
    print(json.dumps(res))
