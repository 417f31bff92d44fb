"""Sources & sinks beyond parquet.

The reference's only I/O is ``cv::imread``/``imwrite`` per sample binary
(e.g. samples/deskew_sample.cpp:49-58); parquet read/write is this
engine's equivalent and is used everywhere.  This module adds the other
ingest formats a transcript pipeline meets in practice — JSON-lines and
CSV event logs — as thin, pruned `ray.data` readers, plus deterministic
writers used by the format-roundtrip query/tests.
"""

from __future__ import annotations

import os


def read_transcripts(path: str, *, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(path, columns=columns)


def events_to_csv(sf_dir: str, out_path: str) -> str:
    """Deterministically export the events table's CSV-safe columns
    (ints + strings only — float/timestamp text roundtrips are lossy and
    belong in parquet)."""
    import duckdb

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT event_id, user_id, event_type
              FROM read_parquet('{sf_dir}/events.parquet') ORDER BY event_id)
        TO '{out_path}' (HEADER, DELIMITER ',')"""
    )
    return out_path


def events_to_jsonl(sf_dir: str, out_path: str) -> str:
    import duckdb

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT event_id, user_id, event_type
              FROM read_parquet('{sf_dir}/events.parquet') ORDER BY event_id)
        TO '{out_path}' (FORMAT JSON)"""
    )
    return out_path


def csv_roundtrip_counts(sf_dir: str):
    """Coverage query: parquet -> CSV -> ray.data.read_csv -> grouped
    count.  Oracle: the same aggregate straight off the parquet view
    (identical values — only int/string columns cross the text format)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max

    tag = sf_dir.strip("/").replace("/", "_")
    path = f"/tmp/prlib_io/{tag}/events.csv"
    events_to_csv(sf_dir, path)
    ds = rd.read_csv(path)
    return ds.groupby("event_type").aggregate(
        Count(alias_name="n"), Max("event_id", alias_name="max_event_id")
    )


def jsonl_roundtrip_counts(sf_dir: str):
    """Same as csv_roundtrip_counts through JSON-lines."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max

    tag = sf_dir.strip("/").replace("/", "_")
    path = f"/tmp/prlib_io/{tag}/events.json"
    events_to_jsonl(sf_dir, path)
    ds = rd.read_json(path)
    return ds.groupby("event_type").aggregate(
        Count(alias_name="n"), Max("event_id", alias_name="max_event_id")
    )


ROUNDTRIP_SQL = """
SELECT event_type, count(*) AS n, max(event_id) AS max_event_id
FROM events GROUP BY event_type ORDER BY event_type"""
