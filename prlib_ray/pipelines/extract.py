"""Flagship pipeline: transcript main-content extraction end-to-end.

Dataflow (the north-star DAG):

  documents.parquet
    -> synth transcripts (1 doc -> N turns; deterministic fixture stage)
    -> ExtractTurns actor pool (fused per-turn clean + boilerplate
       threshold + spans; zero-copy Arrow)
    -> conv_stats partial+final aggregate (tiny: one row per conv)
    -> broadcast (n_turns, direction) -> order_idx + salted shuffle key
    -> groupby(salt_key).map_groups: stable within-group ordering
       (mega-threads sharded so no task holds a whole 10^5-turn conv)
    -> extracted rows (conv_id, turn_idx, role, tool, ts, clean_text,
       spans, order_idx)

The only all-to-all exchange moves already-cleaned rows once; every
statistic the shuffle needs was reduced to a per-conversation row first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SALT_THRESHOLD = 64  # convs with more turns than this get sharded keys
SHARD_SIZE = 64


def extract_pipeline(ts_ds, *, reassemble: bool = True,
                     include_spans: bool = True, physical: str = "bucket",
                     compute: str = "tasks", meta_via: str = "broadcast",
                     num_buckets: int | None = None):
    """Run the extraction DAG over a transcript Dataset.

    physical="bucket" (default): no all-to-all — emit the stable order as
    (bucket, conv_id, order_idx) columns with block-local sorting; the
    partitioned sink groups buckets and a per-bucket read merges.  This
    is SURVEY §4's "hash bucket + within-file sort" layout.
    physical="sort": materialize the total order with one
    range-partitioned sort on (conv_id, order_idx).
    physical="groupby": hash shuffle on the salted key +
    ``map_groups`` — the explicit-salting layout; semantically identical
    (tests assert both paths byte-equal) but pays per-group overhead, so
    it's the reference path, not the default.
    compute="tasks" (default) | "actors" for the extract stage.
    meta_via="broadcast" (default; conv meta dict via ray.put) | "join"
    (distributed stats + native hash join — the layout when the
    conversation count itself exceeds driver memory).
    """
    import ray

    from prlib_ray.stages.boilerplate import ExtractTurns
    from prlib_ray.state import partitioning as part

    if compute == "actors":
        # Actor-pool variant (the layout for genuinely stateful parser /
        # classifier stages).  Sized to leave headroom for the
        # read/synth/shuffle stages — a pool that reserves every CPU
        # starves the producers and the pipeline stalls.
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        pool = max(2, int(ncpu * 2 // 3))
        cleaned = ts_ds.map_batches(
            ExtractTurns,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=1024,
            concurrency=(1, pool),
            num_cpus=1,
        )
    else:
        # Default: stateless tasks.  The extract kernel's only "state" is
        # module-level compiled regexes, which warm workers already hold —
        # an actor pool would pay per-execution spin-up for nothing.
        from prlib_ray.stages.boilerplate import (
            extract_turns_batch,
            extract_turns_batch_nospans,
        )

        fn = extract_turns_batch if include_spans else extract_turns_batch_nospans
        # batch_size: interleaved A/B at sf0.1 measured a 512-2048 plateau
        # with 4096 consistently slower (worse pipelining + higher peak
        # intermediate memory per task) and whole-block 2-5x slower
        cleaned = ts_ds.map_batches(
            fn,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=2048,
        )
    if not include_spans and compute == "actors":
        cleaned = cleaned.map_batches(
            lambda b: b.drop_columns(["spans"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    if not reassemble:
        return cleaned

    if meta_via == "join":
        # 10^12-turn layout: stats stay distributed; direction reaches the
        # rows through a hash join instead of a driver broadcast.  Acero
        # joins reject every list-typed payload column, so spans travel
        # PACKED as plain binary columns through the join and unpack to
        # list<struct> afterwards (boilerplate.extract_turns_batch_
        # packed_spans / unpack_spans_batch).
        if include_spans:
            from prlib_ray.stages.boilerplate import (
                extract_turns_batch_packed_spans,
                unpack_spans_batch,
            )

            cleaned = ts_ds.map_batches(
                extract_turns_batch_packed_spans,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=2048,
            )
        stats_ds = part.conv_stats(ts_ds, merge="distributed")
        ordered_in = part.add_order_idx_join(cleaned, stats_ds)
        if include_spans:
            ordered_in = ordered_in.map_batches(
                unpack_spans_batch, batch_format="pyarrow",
                zero_copy_batch=True,
            )
        if physical == "sort":
            return ordered_in.sort(["conv_id", "order_idx"])
        return part.add_bucket_sorted(
            ordered_in,
            **({"num_buckets": num_buckets} if num_buckets else {}),
        )

    meta = part.directions_and_sizes(part.conv_stats(ts_ds))
    meta_ref = ray.put(meta)
    if physical == "bucket":
        # SURVEY §4 layout: no global sort — emit (bucket, conv_id,
        # order_idx) with each block locally sorted; the partitioned
        # writer groups by bucket and a per-bucket consumer merges on
        # (conv_id, order_idx).  Everything scales like the map stages.
        ordered_in = part.add_order_idx(cleaned, meta_ref)
        return part.add_bucket_sorted(
            ordered_in,
            **({"num_buckets": num_buckets} if num_buckets else {}),
        )
    if physical == "sort":
        ordered_in = part.add_order_idx(cleaned, meta_ref)
        return ordered_in.sort(["conv_id", "order_idx"])

    salted = part.add_salted_key(
        cleaned, meta_ref, salt_threshold=SALT_THRESHOLD, shard_size=SHARD_SIZE
    )

    def order_group(g: pa.Table) -> pa.Table:
        idx = g["order_idx"].to_numpy(zero_copy_only=False)
        o = np.argsort(idx, kind="stable")
        return g.take(pa.array(o)).drop_columns(["salt_key"])

    return salted.groupby("salt_key").map_groups(
        order_group, batch_format="pyarrow"
    )


def flagship(sf_dir: str, *, reassemble: bool = True,
             include_spans: bool = True, **kw):
    """Flagship extraction at ``sf_dir`` scale; returns a Dataset.

    Extra keyword args (physical=, compute=, meta_via=) pass through to
    ``extract_pipeline``."""
    from prlib_ray.fixtures import transcripts_dataset

    return extract_pipeline(
        transcripts_dataset(sf_dir),
        reassemble=reassemble,
        include_spans=include_spans,
        **kw,
    )


def reference_flagship(sf_dir: str) -> pd.DataFrame:
    """Straight-line single-process oracle of the whole flagship (FIXTURES.md
    golden discipline): same per-turn code, same integer direction rule,
    no Ray.  The distributed pipeline must match this exactly."""
    import pyarrow.parquet as pq

    from prlib_ray.fixtures import conv_rows
    from prlib_ray.stages.boilerplate import extract_turn

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = []
    for did, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        rows = conv_rows(int(did), text)
        n = len(rows)
        # Python-int covariance: exact at any conversation size (the
        # distributed path accumulates hi/lo int64 halves and recombines
        # in Python ints — see partitioning.conv_stats)
        xs = [int(r["turn_idx"]) for r in rows]
        ys = [int(r["ts"]) // 1_000_000 for r in rows]
        cov = n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
        direction = 1 if cov >= 0 else -1
        for r in rows:
            clean, spans = extract_turn(r["text"])
            o = r["turn_idx"] if direction >= 0 else n - 1 - r["turn_idx"]
            out.append(
                {
                    "conv_id": r["conv_id"],
                    "turn_idx": r["turn_idx"],
                    "role": r["role"],
                    "tool": r["tool"],
                    "ts": r["ts"],
                    "clean_text": clean,
                    "spans": spans,
                    "order_idx": o,
                }
            )
    df = pd.DataFrame(out)
    df["ts"] = df["ts"].astype("datetime64[us]")
    return df
