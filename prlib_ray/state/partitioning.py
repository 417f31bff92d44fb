"""Partitioning, skew salting, and resumable partitioned output.

SURVEY §4's explicit-design items:

* conversation key statistics as a tiny partial+final aggregate
* mega-thread salting: conversations above a turn-count threshold get a
  composite shuffle key ``conv_id#shard`` so no single ``map_groups``
  task holds a 10^5-turn conversation
* resumable output: parquet partitioned by ``bucket = crc32(conv_id) %
  B`` with a per-bucket ``_manifest.json`` (rows, stage version, input);
  a rerun skips manifested buckets
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pyarrow as pa

STAGE_VERSION = 1


def bucket_of(conv_id: str, num_buckets: int) -> int:
    """Stable bucket (crc32, not PYTHONHASHSEED-dependent hash())."""
    return zlib.crc32(conv_id.encode("utf-8")) % num_buckets


# conv_stats merge="auto": above this many partial rows (>= distinct
# conversations), the final fold runs as a distributed groupby instead of
# a driver-side pyarrow group_by.  Partial rows are bounded by convs x
# batches, so this is a conservative proxy for "conversation count
# exceeds driver memory".  Module-level so tests can lower it.
CONV_STATS_DISTRIBUTED_THRESHOLD = 2_000_000


def conv_stats(ds, *, merge: str = "auto"):
    """Per-conversation (n_turns, covariance partials) — the tiny
    aggregate used for both skew detection and direction repair.

    One row per conv_id: n, sx, sy, sxy_hi, sxy_lo where x = turn_idx,
    y = seconds since epoch.  The x*y product sum is accumulated as two
    int64 halves (hi = p >> 32, lo = p & 0xFFFFFFFF): a single int64
    Σ x*y silently overflows for conversations above ~10^5 turns (epoch
    seconds ≈ 2^31 each), i.e. exactly the mega-threads the direction
    repair exists for.  The halves stay exact up to ~2^30 turns per
    conversation in any accumulation order; the final covariance is
    recombined in Python ints (arbitrary precision).

    merge="driver": the per-batch partials (<= one row per conv per
    batch) come back to the driver and a single pyarrow group_by folds
    them — Ray's all-to-all Aggregate costs seconds of fixed overhead
    that dwarfs this data size.  merge="distributed": the same fold as
    a Ray groupby — the layout for corpora whose *conversation count*
    itself exceeds driver memory (10^9+ convs).  merge="auto"
    (default): materialize the partials, count them (cheap: the
    partials are ~conversation-sized, not turn-sized) and pick
    "distributed" above CONV_STATS_DISTRIBUTED_THRESHOLD rows.  All
    modes produce identical integers."""

    # prune to the three needed columns so a parquet-backed input only
    # reads those column chunks
    ds = ds.select_columns(["conv_id", "turn_idx", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        x = b["turn_idx"].to_numpy().astype(np.int64)
        y = b["ts"].cast(pa.int64()).to_numpy() // 1_000_000
        p = x * y  # exact per row: turn_idx < 2^31, epoch-sec < 2^32
        t = pa.table(
            {
                "conv_id": b["conv_id"],
                "n": pa.array(np.ones(len(x), dtype=np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxy_hi": pa.array(p >> 32),
                "sxy_lo": pa.array(p & 0xFFFFFFFF),
            }
        )
        return t.group_by("conv_id").aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxy_hi", "sum"), ("sxy_lo", "sum")]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    if merge == "auto":
        # the partials are the gate's own input: materialize once so the
        # count and the chosen fold both reuse them (no re-execution)
        partials = partials.materialize()
        merge = (
            "distributed"
            if partials.count() > CONV_STATS_DISTRIBUTED_THRESHOLD
            else "driver"
        )
    if merge == "distributed":
        # coarse-partition the merge (a conv_id lives in exactly one
        # cpart): groupby(conv_id).aggregate() pays per-KEY scheduling
        # on conv-count keys — fatal at the 10^12-turn design point
        # where convs are ~10^9 — while one vectorized groupby-sum pass
        # per coarse part costs conv-count/64 rows of pandas work
        import zlib

        def tag(b: pa.Table) -> pa.Table:
            cp = np.asarray(
                [zlib.crc32(s.encode()) % 64
                 for s in b["conv_id"].to_pylist()],
                dtype=np.int64,
            )
            return b.append_column("cpart", pa.array(cp))

        def fold(g: pa.Table) -> pa.Table:
            cols = ("n", "sx", "sy", "sxy_hi", "sxy_lo")
            src_cols = ("n_sum", "sx_sum", "sy_sum",
                        "sxy_hi_sum", "sxy_lo_sum")
            if g.num_rows == 0:
                return pa.table({"conv_id": pa.array([], type=pa.string()),
                                 **{c: pa.array([], type=pa.int64())
                                    for c in cols}})
            conv = np.asarray(g["conv_id"].to_pylist(), dtype=object)
            o = np.argsort(conv, kind="stable")
            c_s = conv[o]
            starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]])
            out = {"conv_id": pa.array(c_s[starts], type=pa.string())}
            for dst, srcc in zip(cols, src_cols):
                v = g[srcc].to_numpy(zero_copy_only=False).astype(
                    np.int64)[o]
                out[dst] = pa.array(np.add.reduceat(v, starts))
            return pa.table(out)

        return (
            partials.map_batches(tag, batch_format="pyarrow",
                                 zero_copy_batch=True)
            .groupby("cpart")
            .map_groups(fold, batch_format="pyarrow")
        )
    import ray

    tables = ray.get(list(partials.to_arrow_refs()))  # one batched get
    big = pa.concat_tables([t for t in tables if t.num_rows])
    out = big.group_by("conv_id").aggregate(
        [("n_sum", "sum"), ("sx_sum", "sum"), ("sy_sum", "sum"),
         ("sxy_hi_sum", "sum"), ("sxy_lo_sum", "sum")]
    )
    return out.rename_columns(["conv_id", "n", "sx", "sy", "sxy_hi", "sxy_lo"])


def directions_and_sizes(stats) -> dict[str, tuple[int, int]]:
    """conv_id -> (n_turns, direction) from the stats aggregate.

    direction = sign of n*sxy - sx*sy (integer covariance of turn_idx vs
    ts; recombined from the hi/lo halves in Python ints — exact at any
    conversation size, so distributed == straight-line).  cov == 0
    (singleton turns) -> +1."""
    if isinstance(stats, pa.Table):
        stats_rows = stats.to_pylist()
    elif hasattr(stats, "take_all"):
        stats_rows = stats.take_all()
    else:
        stats_rows = stats
    out = {}
    for r in stats_rows:
        sxy = (int(r["sxy_hi"]) << 32) + int(r["sxy_lo"])
        cov = int(r["n"]) * sxy - int(r["sx"]) * int(r["sy"])
        out[r["conv_id"]] = (int(r["n"]), 1 if cov >= 0 else -1)
    return out


def add_order_idx(ds, meta_ref):
    """Add only ``order_idx`` (direction-corrected final position) — the
    sort-based reassembly needs no salt column (the range partitioner
    bounds task sizes on its own)."""
    import ray

    def apply(b: pa.Table) -> pa.Table:
        meta = ray.get(meta_ref)
        convs = b["conv_id"].to_pylist()
        tidx = b["turn_idx"].to_numpy().astype(np.int64)
        import pandas as pd

        inv, uniq = pd.factorize(np.asarray(convs, dtype=object))
        try:
            n_u = np.fromiter(
                (meta[c][0] for c in uniq), dtype=np.int64, count=len(uniq)
            )
            d_u = np.fromiter(
                (meta[c][1] for c in uniq), dtype=np.int64, count=len(uniq)
            )
        except KeyError as e:
            raise KeyError(
                f"conversation {e.args[0]!r} missing from direction meta — "
                "the stats pass and this pass saw different rows; input "
                "must be deterministic across executions (avoid limit()/"
                "random_sample() upstream of extract_pipeline)"
            ) from e
        order = np.where(d_u[inv] >= 0, tidx, n_u[inv] - 1 - tidx)
        return b.append_column("order_idx", pa.array(order, type=pa.int64()))

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


def add_order_idx_join(cleaned_ds, stats_ds, *, num_partitions: int | None = None):
    """Join-based order assignment: the 10^12-turn layout.

    The broadcast path ships a {conv_id: (n, dir)} dict to every task —
    fine for 10^6 conversations, impossible for 10^9.  Here the per-conv
    stats stay distributed: directions are computed on the (tiny) stats
    Dataset, then hash-joined to the cleaned rows on conv_id with the
    native ``Dataset.join``; order_idx is computed vectorized from the
    joined columns.  Same integers as the broadcast path (tests assert
    byte-equality)."""

    def to_dir(b: pa.Table) -> pa.Table:
        # cov = n*sxy - sx*sy exceeds int64 for mega-threads (n*sxy needs
        # 63+ bits above ~5k-turn convs with epoch-second ts); recombine
        # the hi/lo halves in Python ints — one op per CONVERSATION (the
        # stats table is ~10^6x smaller than the turn data), so exactness
        # costs nothing measurable.
        d = np.fromiter(
            (
                1 if n_ * ((hi << 32) + lo) - sx_ * sy_ >= 0 else -1
                for n_, sx_, sy_, hi, lo in zip(
                    b["n"].to_pylist(), b["sx"].to_pylist(),
                    b["sy"].to_pylist(), b["sxy_hi"].to_pylist(),
                    b["sxy_lo"].to_pylist(),
                )
            ),
            dtype=np.int64,
            count=b.num_rows,
        )
        return pa.table({"conv_id": b["conv_id"], "n": b["n"],
                         "dir": pa.array(d)})

    dirs = stats_ds.map_batches(to_dir, batch_format="pyarrow",
                                zero_copy_batch=True)
    if num_partitions is None:
        # join aggregators are actors: more partitions than CPUs starves
        # the producer stages and the pipeline stalls
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, ncpu // 2)
    joined = cleaned_ds.join(
        dirs, "inner", num_partitions=num_partitions, on=("conv_id",)
    )

    def apply(b: pa.Table) -> pa.Table:
        tidx = b["turn_idx"].to_numpy().astype(np.int64)
        n = b["n"].to_numpy().astype(np.int64)
        d = b["dir"].to_numpy().astype(np.int64)
        order = np.where(d >= 0, tidx, n - 1 - tidx)
        out = b.drop_columns(["n", "dir"])
        return out.append_column("order_idx", pa.array(order, type=pa.int64()))

    return joined.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


NUM_BUCKETS_DEFAULT = 64


def add_bucket_sorted(ds, *, num_buckets: int = NUM_BUCKETS_DEFAULT):
    """Add ``bucket = crc32(conv_id) % B`` and sort each block locally by
    (bucket, conv_id, order_idx) — the shuffle-free reassembly layout."""

    def apply(b: pa.Table) -> pa.Table:
        import pandas as pd

        convs = b["conv_id"].to_pylist()
        inv, uniq = pd.factorize(np.asarray(convs, dtype=object))
        bk_u = np.fromiter(
            (bucket_of(c, num_buckets) for c in uniq), dtype=np.int32,
            count=len(uniq),
        )
        out = b.append_column("bucket", pa.array(bk_u[inv], type=pa.int32()))
        order = np.lexsort(
            (out["order_idx"].to_numpy(), inv, bk_u[inv])
        )
        return out.take(pa.array(order))

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


def add_salted_key(ds, meta_ref, *, salt_threshold: int, shard_size: int):
    """Add ``salt_key`` (= conv_id, or conv_id#shard for mega threads) and
    ``order_idx`` (direction-corrected final position).

    meta_ref: ray.ObjectRef of the directions_and_sizes dict (broadcast
    once; at 10^12-turn scale this becomes a partitioned join on conv_id
    instead of a driver broadcast — same dataflow, different physical op).
    """
    import ray

    def apply(b: pa.Table) -> pa.Table:
        meta = ray.get(meta_ref)
        convs = b["conv_id"].to_pylist()
        tidx = b["turn_idx"].to_numpy().astype(np.int64)
        # vectorize the per-row lookup: resolve meta once per DISTINCT conv
        uniq, inv = np.unique(np.asarray(convs, dtype=object), return_inverse=True)
        n_u = np.fromiter((meta[c][0] for c in uniq), dtype=np.int64, count=len(uniq))
        d_u = np.fromiter((meta[c][1] for c in uniq), dtype=np.int64, count=len(uniq))
        n_row = n_u[inv]
        d_row = d_u[inv]
        order = np.where(d_row >= 0, tidx, n_row - 1 - tidx)
        salt = convs  # reuse; only hot-conv rows get rewritten
        hot_rows = np.flatnonzero((n_u > salt_threshold)[inv])
        for i in hot_rows:
            salt[i] = f"{convs[i]}#{order[i] // shard_size:06d}"
        out = b.append_column("order_idx", pa.array(order, type=pa.int64()))
        return out.append_column("salt_key", pa.array(salt, type=pa.string()))

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


class _CounterSink:
    """Streaming per-bucket lineage counters (clean_chars sum + distinct
    conversations), fed from the write stage's map tasks — manifests no
    longer need a second driver-side read of the written parquet.

    Distinct conversations are tracked as 64-bit md5-prefix hash sets
    (8 B per conversation, collision odds ~n^2/2^65); the 10^9-conv
    upgrade path is an HLL sketch behind the same ``add`` interface.

    ``add`` is IDEMPOTENT per batch: each partial carries a
    deterministic content-derived batch key (md5 over the batch's
    bucket/conv/length arrays) and a re-sent partial — a retried or
    speculative write map task replays its adds — is dropped, so
    clean_chars cannot double-count under task retry.  (Two *distinct*
    batches share a key only if they hold identical rows, in which case
    the dedup is also the right answer.)  Authoritative row/byte counts
    still come from the written files' parquet metadata."""

    def __init__(self):
        self.chars: dict[int, int] = {}
        self.convs: dict[int, set[int]] = {}
        self.seen: set[bytes] = set()

    def add(self, batch_key: bytes, chars: dict[int, int],
            convs: dict[int, list[int]]) -> None:
        if batch_key in self.seen:
            return  # retried/speculative task replaying its partial
        self.seen.add(batch_key)
        for b, c in chars.items():
            self.chars[b] = self.chars.get(b, 0) + c
        for b, hs in convs.items():
            self.convs.setdefault(b, set()).update(hs)

    def totals(self) -> tuple[dict[int, int], dict[int, int]]:
        return {b: len(s) for b, s in self.convs.items()}, dict(self.chars)


def _counter_partials(out: pa.Table) -> tuple[bytes, dict, dict]:
    """Per-batch (batch_key, bucket -> clean_chars, bucket -> conv-hash
    list).  batch_key is a deterministic content hash so the sink can
    drop replayed partials from retried tasks."""
    import hashlib

    import pyarrow.compute as pc

    buckets = np.asarray(out["bucket"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
    chars: dict[int, int] = {}
    convs: dict[int, list[int]] = {}
    if "clean_text" in out.column_names:
        lens = pc.utf8_length(out["clean_text"]).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
    else:
        lens = np.zeros(len(buckets), dtype=np.int64)
    order = np.argsort(buckets, kind="stable")
    ub, starts = np.unique(buckets[order], return_index=True)
    bounds = np.append(starts, len(buckets))
    conv_col = out["conv_id"].to_numpy(zero_copy_only=False)
    for b, lo, hi in zip(ub.tolist(), bounds[:-1], bounds[1:]):
        rows = order[lo:hi]
        chars[b] = int(lens[rows].sum())
        uniq = set(conv_col[rows])
        convs[b] = [
            int.from_bytes(hashlib.md5(c.encode()).digest()[:8], "big")
            for c in uniq
        ]
    key = hashlib.md5()
    key.update(buckets.tobytes())
    key.update(lens.tobytes())
    key.update("\x00".join(conv_col.tolist()).encode("utf-8"))
    return key.digest(), chars, convs


def write_partitioned(ds, out_dir: str, *, num_buckets: int = 16,
                      skip_buckets: set[int] | None = None,
                      with_counters: bool = False,
                      clean: bool = False,
                      input_meta: dict | None = None) -> list[dict]:
    """Resumable sink: one directory per bucket + per-bucket manifest.

    Returns the manifests written.  ``skip_buckets`` (from
    ``finished_buckets``) lets a rerun skip completed partitions;
    when ``None`` (the default) the skip set is derived from
    ``finished_buckets(out_dir)`` internally, so a bare rerun RESUMES —
    committed buckets are never silently deleted or rewritten.  Pass
    ``clean=True`` (or an explicit smaller ``skip_buckets``) to opt
    into rebuilding committed buckets.

    Crash safety: a run that died mid-write leaves partial parquet files
    in bucket dirs with no ``_manifest.json``; a rerun's
    ``write_parquet`` would append new files ALONGSIDE the stale ones,
    silently duplicating those buckets' rows (the manifest row count
    sums all files, masking it).  So before writing, any bucket dir
    that is about to be rewritten — crashed manifest-less dirs, plus
    manifested dirs deliberately excluded from the skip set — is
    deleted and rebuilt from scratch; the manifest is the commit
    record.

    ``input_meta`` (e.g. ``{"path": ..., "stage": ...}``) is recorded
    verbatim in every bucket manifest as the ``input`` lineage field,
    so a resumed or audited run can tell WHICH source each committed
    partition came from without re-deriving it."""
    import shutil

    import pyarrow.parquet as pq

    if clean:
        skip: set[int] = set() if skip_buckets is None else set(skip_buckets)
    elif skip_buckets is None:
        skip = finished_buckets(out_dir)
    else:
        skip = set(skip_buckets)
    if os.path.isdir(out_dir):
        for name in os.listdir(out_dir):
            path = os.path.join(out_dir, name)
            if not (name.startswith("bucket=") and os.path.isdir(path)):
                continue
            bkt = int(name.split("=", 1)[1])
            if bkt not in skip:
                # about to be rewritten: clear it (covers both crashed
                # manifest-less dirs and deliberate non-skip rebuilds)
                shutil.rmtree(path)

    sink = None
    if with_counters:
        import ray

        sink = ray.remote(num_cpus=0)(_CounterSink).remote()

    def add_bucket(b: pa.Table) -> pa.Table:
        if "bucket" in b.column_names:
            out = b
            buckets = b["bucket"].to_pylist()
        else:
            buckets = [
                bucket_of(c, num_buckets) for c in b["conv_id"].to_pylist()
            ]
            out = b.append_column("bucket", pa.array(buckets, type=pa.int32()))
        if skip:
            keep = pa.array([bk not in skip for bk in buckets])
            out = out.filter(keep)
        if sink is not None and out.num_rows:
            import ray

            key, chars, convs = _counter_partials(out)
            # block on the ack: the partial is applied before this map
            # task completes, so write completion implies counter
            # completeness (no in-flight-message race with totals())
            ray.get(sink.add.remote(key, chars, convs))
        return out

    with_bucket = ds.map_batches(add_bucket, batch_format="pyarrow",
                                 zero_copy_batch=True)
    # single streaming pass; the writer splits by the partition column
    with_bucket.write_parquet(out_dir, partition_cols=["bucket"])
    counter_convs: dict[int, int] = {}
    counter_chars: dict[int, int] = {}
    if sink is not None:
        import ray

        # the write has completed, so every add.remote partial has been
        # submitted; one get drains the actor
        counter_convs, counter_chars = ray.get(sink.totals.remote())
        ray.kill(sink)
    manifests = []
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not (name.startswith("bucket=") and os.path.isdir(path)):
            continue
        bkt = int(name.split("=", 1)[1])
        if bkt in skip:
            continue
        files = [f for f in os.listdir(path) if f.endswith(".parquet")]
        rows = sum(
            pq.read_metadata(os.path.join(path, f)).num_rows for f in files
        )
        nbytes = sum(os.path.getsize(os.path.join(path, f)) for f in files)
        manifest = {
            "bucket": bkt,
            "rows": int(rows),
            "bytes": int(nbytes),
            "files": len(files),
            "stage_version": STAGE_VERSION,
        }
        if input_meta is not None:
            manifest["input"] = input_meta
        if with_counters:
            # per-bucket lineage counters, streamed from the write
            # stage's own map tasks (no second read of written parquet)
            manifest["n_convs"] = counter_convs.get(bkt, 0)
            manifest["clean_chars"] = counter_chars.get(bkt, 0)
        _write_manifest_atomic(path, manifest)
        manifests.append(manifest)
    return manifests


def _write_manifest_atomic(path: str, manifest: dict) -> None:
    """Manifest writes commit via tmp + rename: a crash mid-write must
    leave either no manifest (the bucket reads unfinished and rebuilds)
    or a complete one — never a truncated JSON that breaks resume."""
    mpath = os.path.join(path, "_manifest.json")
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, mpath)


def finished_buckets(out_dir: str) -> set[int]:
    done = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        mpath = os.path.join(out_dir, name, "_manifest.json")
        if name.startswith("bucket=") and os.path.exists(mpath):
            try:
                with open(mpath) as f:
                    m = json.load(f)
            except (json.JSONDecodeError, OSError):
                # a torn manifest (pre-atomic-write crash) means the
                # bucket is NOT committed — rebuild, don't crash resume
                continue
            if m.get("stage_version") == STAGE_VERSION:
                done.add(m["bucket"])
    return done


def compact_buckets(out_dir: str, *, max_files: int = 1) -> list[dict]:
    """Small-file compaction for the resumable sink: rewrite every
    COMMITTED bucket holding more than ``max_files`` parquet files into
    one file, preserving rows, counters and resumability.  At 100 TB
    the sink accumulates one file per write task per run segment;
    readers pay per-file open cost, so periodic compaction is part of
    operating the layout.  Buckets are independent — each compacts in
    its own Ray task, no data moves through the driver.

    Crash-safe ordering per bucket (the manifest is the commit record):
    1. write the merged rows to ``_compact.tmp`` (invisible to
       ``*.parquet`` readers) and verify its row count equals the
       manifest's;
    2. DELETE the manifest — from here the bucket reads as unfinished,
       so a crash anywhere below makes the next ``write_partitioned``
       rebuild it from scratch (wasteful, never wrong);
    3. delete the originals, rename the tmp in, rewrite the manifest
       with the same rows/counters and ``compacted: true``.

    Returns the updated manifests of the buckets it touched."""
    import ray

    @ray.remote
    def _compact_one(path: str) -> dict | None:
        import json as _json
        import os as _os

        import pyarrow.parquet as _pq

        mpath = _os.path.join(path, "_manifest.json")
        try:
            with open(mpath) as f:
                manifest = _json.load(f)
        except (_json.JSONDecodeError, OSError):
            # torn manifest (pre-atomic-write crash): the bucket is NOT
            # committed — same contract as finished_buckets; skip it so
            # one bad bucket can't abort compaction of the healthy ones
            return None
        files = sorted(
            f for f in _os.listdir(path) if f.endswith(".parquet")
        )
        if len(files) <= max_files:
            return None
        tmp = _os.path.join(path, "_compact.tmp")
        # stream row groups file-by-file through one writer: a bucket at
        # the 100 TB operating point does not fit in a task's heap, and
        # compaction must work exactly where it is needed
        writer = None
        got_rows = 0
        try:
            for f in files:
                pf = _pq.ParquetFile(_os.path.join(path, f))
                for rg in range(pf.num_row_groups):
                    t = pf.read_row_group(rg)
                    if writer is None:
                        writer = _pq.ParquetWriter(tmp, t.schema)
                    writer.write_table(t)
                    got_rows += t.num_rows
        finally:
            if writer is not None:
                writer.close()
        if got_rows != manifest["rows"]:
            if _os.path.exists(tmp):
                _os.remove(tmp)
            raise RuntimeError(
                f"compaction row mismatch in {path}: "
                f"{got_rows} != {manifest['rows']}"
            )
        _os.remove(mpath)  # commit point: bucket now reads unfinished
        for f in files:
            _os.remove(_os.path.join(path, f))
        final = _os.path.join(path, "part-compacted-0.parquet")
        _os.rename(tmp, final)
        manifest["files"] = 1
        manifest["bytes"] = int(_os.path.getsize(final))
        manifest["compacted"] = True
        # atomic commit: dump to a tmp path, rename over — a crash
        # mid-write must leave either no manifest (bucket rebuilds) or
        # a complete one, never a truncated file that breaks resume
        tmp_m = mpath + ".tmp"
        with open(tmp_m, "w") as f:
            _json.dump(manifest, f)
        _os.rename(tmp_m, mpath)
        return manifest

    refs = []
    for name in sorted(os.listdir(out_dir)) if os.path.isdir(out_dir) else []:
        path = os.path.join(out_dir, name)
        if (name.startswith("bucket=") and os.path.isdir(path)
                and os.path.exists(os.path.join(path, "_manifest.json"))):
            refs.append(_compact_one.remote(path))
    return [m for m in ray.get(refs) if m is not None]
