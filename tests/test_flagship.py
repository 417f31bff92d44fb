"""Flagship extraction: distributed output must equal the straight-line
single-process golden exactly (FIXTURES.md discipline), under arbitrary
partitioning and through the salted shuffle; partitioned output resumes."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["spans"] = df["spans"].map(
        lambda sp: ";".join(f"{s['start']}:{s['end']}:{s['kind']}" for s in sp)
    )
    df["ts"] = pd.to_datetime(df["ts"])
    df["turn_idx"] = df["turn_idx"].astype(np.int64)
    df["order_idx"] = df["order_idx"].astype(np.int64)
    cols = ["conv_id", "turn_idx", "role", "tool", "ts", "clean_text", "spans", "order_idx"]
    return (
        df[cols]
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def golden(sf_dir):
    from prlib_ray.pipelines.extract import reference_flagship

    return _canon(reference_flagship(sf_dir))


def test_flagship_matches_golden(ray_session, sf_dir, golden):
    from prlib_ray.pipelines.extract import flagship

    got = _canon(flagship(sf_dir).to_pandas())
    assert len(got) == len(golden)
    for c in golden.columns:
        assert got[c].equals(golden[c]), f"column {c} differs"


def test_flagship_partition_invariance(ray_session, sf_dir, golden):
    """Same result with adversarial input partitioning (7 shuffled blocks)."""
    from prlib_ray.fixtures import transcripts_dataset
    from prlib_ray.pipelines.extract import extract_pipeline

    ts = transcripts_dataset(sf_dir).repartition(7)
    got = _canon(extract_pipeline(ts).to_pandas())
    for c in golden.columns:
        assert got[c].equals(golden[c]), f"column {c} differs"


def test_sort_and_groupby_paths_equal(ray_session, sf_dir, golden):
    """The sort-based physical plan and the salted-groupby plan must be
    byte-identical (and both equal the golden)."""
    from prlib_ray.fixtures import transcripts_dataset
    from prlib_ray.pipelines.extract import extract_pipeline

    got = _canon(
        extract_pipeline(
            transcripts_dataset(sf_dir), physical="groupby"
        ).to_pandas()
    )
    for c in golden.columns:
        assert got[c].equals(golden[c]), f"column {c} differs"


def test_actor_pool_compute_equals_tasks(ray_session, sf_dir, golden):
    """compute='actors' (ExtractTurns pool) must match the task path."""
    from prlib_ray.fixtures import transcripts_dataset
    from prlib_ray.pipelines.extract import extract_pipeline

    got = _canon(
        extract_pipeline(
            transcripts_dataset(sf_dir), compute="actors"
        ).to_pandas()
    )
    for c in golden.columns:
        assert got[c].equals(golden[c]), f"column {c} differs"


def test_join_meta_path_equals_broadcast(ray_session, sf_dir, golden):
    """meta_via='join' (distributed stats + hash join) must be
    byte-identical to the broadcast path and the golden (modulo spans,
    which Acero joins cannot carry — include_spans=False)."""
    import numpy as np
    import pandas as pd

    from prlib_ray.fixtures import transcripts_dataset
    from prlib_ray.pipelines.extract import extract_pipeline

    df = extract_pipeline(
        transcripts_dataset(sf_dir), meta_via="join", include_spans=False
    ).to_pandas()
    df["ts"] = pd.to_datetime(df["ts"])
    df["turn_idx"] = df["turn_idx"].astype(np.int64)
    df["order_idx"] = df["order_idx"].astype(np.int64)
    cols = ["conv_id", "turn_idx", "role", "tool", "ts", "clean_text", "order_idx"]
    got = (
        df[cols].sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    for c in cols:
        assert got[c].equals(golden[c]), f"column {c} differs"


def test_join_meta_path_with_packed_spans(ray_session, sf_dir, golden):
    """meta_via='join' WITH spans: the packed-binary spans survive the
    Acero join and unpack byte-identically to the broadcast path's
    list<struct> (full golden equality including spans)."""
    from prlib_ray.fixtures import transcripts_dataset
    from prlib_ray.pipelines.extract import extract_pipeline

    got = _canon(
        extract_pipeline(
            transcripts_dataset(sf_dir), meta_via="join", include_spans=True
        ).to_pandas()
    )
    for c in golden.columns:
        assert got[c].equals(golden[c]), f"column {c} differs"


def test_mega_thread_salting(ray_session, sf_dir):
    """Mega conversations (doc_id % 211 == 0 -> 400 turns) must be sharded
    into multiple groups yet produce contiguous order_idx 0..n-1."""
    from prlib_ray.pipelines.extract import SALT_THRESHOLD, flagship

    got = flagship(sf_dir).to_pandas()
    mega = got[got["conv_id"] == "conv-00000000"]
    assert len(mega) == 400 > SALT_THRESHOLD
    assert sorted(mega["order_idx"]) == list(range(400))


def test_reversed_conversation_repaired(ray_session, sf_dir):
    """doc_id % 17 == 3 conversations have reversed timestamps; order_idx
    must run opposite to turn_idx."""
    from prlib_ray.pipelines.extract import flagship

    got = flagship(sf_dir).to_pandas()
    rev = got[got["conv_id"] == "conv-00000003"].sort_values("turn_idx")
    n = len(rev)
    assert n > 1
    assert rev["order_idx"].tolist() == [n - 1 - i for i in range(n)]
    fwd = got[got["conv_id"] == "conv-00000001"].sort_values("turn_idx")
    assert fwd["order_idx"].tolist() == list(range(len(fwd)))


def test_write_partitioned_resume(ray_session, sf_dir, tmp_path):
    from prlib_ray.fixtures import transcripts_dataset
    from prlib_ray.state import partitioning as part

    ds = transcripts_dataset(sf_dir)
    out = str(tmp_path / "out")
    manifests = part.write_partitioned(ds, out, num_buckets=4)
    assert {m["bucket"] for m in manifests} == {0, 1, 2, 3}
    total = sum(m["rows"] for m in manifests)
    assert total == ds.count()
    # resume: everything finished -> nothing rewritten
    done = part.finished_buckets(out)
    assert done == {0, 1, 2, 3}
    again = part.write_partitioned(ds, out, num_buckets=4, skip_buckets=done)
    assert again == []


def test_compact_buckets_preserves_rows_and_resume(ray_session, sf_dir,
                                                   tmp_path):
    """Compaction merges a multi-file bucket into one file with
    byte-identical content, keeps the manifest committed (the bucket
    still reads as finished), and skips already-compact buckets."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq2

    from prlib_ray.fixtures import transcripts_dataset
    from prlib_ray.state import partitioning as part

    ds = transcripts_dataset(sf_dir)
    out = str(tmp_path / "out")
    part.write_partitioned(ds, out, num_buckets=4)

    # force a multi-file bucket: split bucket 0's single file in two
    b0 = os.path.join(out, "bucket=0")
    files = [f for f in os.listdir(b0) if f.endswith(".parquet")]
    t = pa.concat_tables(
        [pq2.read_table(os.path.join(b0, f)) for f in files]
    )
    before = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    for f in files:
        os.remove(os.path.join(b0, f))
    half = t.num_rows // 2
    pq2.write_table(t.slice(0, half), os.path.join(b0, "part-a.parquet"))
    pq2.write_table(t.slice(half), os.path.join(b0, "part-b.parquet"))
    with open(os.path.join(b0, "_manifest.json")) as f:
        m = json.load(f)
    m["files"] = 2
    with open(os.path.join(b0, "_manifest.json"), "w") as f:
        json.dump(m, f)

    touched = part.compact_buckets(out)
    by_bucket = {x["bucket"]: x for x in touched}
    # bucket 0 (force-split) compacts; others too if the parallel write
    # left them multi-file — every touched manifest must be 1-file
    assert 0 in by_bucket
    assert all(x["files"] == 1 and x["compacted"] is True for x in touched)
    assert by_bucket[0]["rows"] == t.num_rows

    files2 = [f for f in os.listdir(b0) if f.endswith(".parquet")]
    assert len(files2) == 1
    after = pq2.read_table(os.path.join(b0, files2[0])).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    assert after.equals(before)
    # still committed: a bare resume rewrites nothing
    assert part.finished_buckets(out) == {0, 1, 2, 3}
    assert part.write_partitioned(ds, out, num_buckets=4) == []
    # idempotent: a second compaction touches nothing
    assert part.compact_buckets(out) == []


def test_mega_thread_cov_no_overflow(ray_session):
    """A >5k-turn conversation with epoch-second timestamps overflows a
    single-int64 n*sxy (needs 63+ bits); the hi/lo-split accumulation
    must still get the covariance SIGN right in both meta paths."""
    import pyarrow as pa
    import ray.data as rd

    from prlib_ray.state import partitioning as part

    n = 6000
    ts_us = [(1_700_000_000 - i) * 1_000_000 for i in range(n)]  # decreasing
    tbl = pa.table(
        {
            "conv_id": pa.array(["mega"] * n),
            "turn_idx": pa.array(range(n), type=pa.int32()),
            "role": pa.array(["user"] * n),
            "text": pa.array(["hello world"] * n),
            "tool": pa.array([""] * n),
            "ts": pa.array(ts_us, type=pa.timestamp("us")),
        }
    )
    # exact Python-int ground truth
    xs = list(range(n))
    ys = [t // 1_000_000 for t in ts_us]
    cov = n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
    assert cov < 0  # decreasing ts -> negative covariance
    assert abs(n * sum(a * b for a, b in zip(xs, ys))) > 2**63  # would wrap

    ds = rd.from_arrow(tbl)
    meta = part.directions_and_sizes(part.conv_stats(ds))
    assert meta["mega"] == (n, -1)
    # join path: same direction through to order_idx
    stats = part.conv_stats(ds, merge="distributed")
    ordered = part.add_order_idx_join(
        ds.map_batches(lambda b: b, batch_format="pyarrow"), stats,
        num_partitions=2,
    ).to_pandas()
    got = ordered.sort_values("turn_idx")["order_idx"].tolist()
    assert got == [n - 1 - i for i in range(n)]


def test_write_partitioned_crash_resume(ray_session, sf_dir, tmp_path):
    """A crashed run leaves partial parquet in a manifest-less bucket dir;
    the rerun must rebuild that bucket from scratch, not append."""
    import os

    from prlib_ray.fixtures import transcripts_dataset
    from prlib_ray.state import partitioning as part

    ds = transcripts_dataset(sf_dir)
    out = str(tmp_path / "out")
    part.write_partitioned(ds, out, num_buckets=4)
    expect = ds.count()
    # simulate the crash: bucket 2 lost its manifest mid-write
    os.remove(os.path.join(out, "bucket=2", "_manifest.json"))
    done = part.finished_buckets(out)
    assert done == {0, 1, 3}
    manifests = part.write_partitioned(ds, out, num_buckets=4, skip_buckets=done)
    assert [m["bucket"] for m in manifests] == [2]
    # no duplicated rows anywhere
    import pyarrow.parquet as pq

    total = 0
    for name in sorted(os.listdir(out)):
        bdir = os.path.join(out, name)
        if not name.startswith("bucket="):
            continue
        for f in os.listdir(bdir):
            if f.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(bdir, f)).num_rows
    assert total == expect


def test_streamed_counters_match_files(ray_session, sf_dir, tmp_path):
    """with_counters=True counters stream from the write stage's own map
    tasks; they must equal what a full re-read of the written files
    computes (the old driver-side implementation's ground truth)."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from prlib_ray.pipelines.extract import flagship
    from prlib_ray.state.partitioning import write_partitioned

    out = str(tmp_path / "out")
    ds = flagship(sf_dir, include_spans=False)
    manifests = write_partitioned(ds, out, num_buckets=8, with_counters=True)
    assert manifests
    for m in manifests:
        convs: set[str] = set()
        chars = 0
        bdir = os.path.join(out, f"bucket={m['bucket']}")
        for f in os.listdir(bdir):
            if f.endswith(".parquet"):
                t = pq.read_table(
                    os.path.join(bdir, f), columns=["conv_id", "clean_text"]
                )
                convs.update(t["conv_id"].to_pylist())
                chars += int(pc.sum(pc.utf8_length(t["clean_text"])).as_py() or 0)
        assert m["n_convs"] == len(convs), m
        assert m["clean_chars"] == chars, m


def test_extract_turn_spans_cover_source():
    from prlib_ray.stages.boilerplate import _clean_source, extract_turn

    text = "Home | About | Products | Pricing | Contact\nreal content line with many words here\n--------\n“quoted line” with more actual content words\n(c) 2020 ExampleCorp Inc. All rights reserved. Privacy"
    clean, spans = extract_turn(text)
    src = _clean_source(text)
    # spans tile the cleaned source exactly
    assert spans[0]["start"] == 0
    for a, b in zip(spans, spans[1:]):
        assert b["start"] == a["end"] + 1
    assert spans[-1]["end"] == len(src)
    kinds = [s["kind"] for s in spans]
    assert kinds[0] == "furniture" and kinds[2] == "furniture" and kinds[-1] == "furniture"
    assert "content" in kinds


def test_write_partitioned_default_resume(ray_session, sf_dir, tmp_path):
    """A bare rerun (no skip_buckets) must RESUME — committed buckets are
    neither deleted nor rewritten by default; clean=True opts into the
    full rebuild."""
    import os

    from prlib_ray.fixtures import transcripts_dataset
    from prlib_ray.state import partitioning as part

    ds = transcripts_dataset(sf_dir)
    out = str(tmp_path / "out")
    first = part.write_partitioned(ds, out, num_buckets=4)
    assert {m["bucket"] for m in first} == {0, 1, 2, 3}
    mtimes = {
        n: os.path.getmtime(os.path.join(out, n, "_manifest.json"))
        for n in os.listdir(out) if n.startswith("bucket=")
    }
    # bare rerun: everything already committed -> nothing written
    again = part.write_partitioned(ds, out, num_buckets=4)
    assert again == []
    for n, t in mtimes.items():
        assert os.path.getmtime(os.path.join(out, n, "_manifest.json")) == t
    # clean=True: full rebuild, all four manifests rewritten
    rebuilt = part.write_partitioned(ds, out, num_buckets=4, clean=True)
    assert {m["bucket"] for m in rebuilt} == {0, 1, 2, 3}
    assert sum(m["rows"] for m in rebuilt) == ds.count()


def test_counter_sink_idempotent_add():
    """A retried write task replays its partial; the sink must drop the
    duplicate (keyed by the content-derived batch key)."""
    import pyarrow as pa

    from prlib_ray.state.partitioning import _counter_partials, _CounterSink

    tbl = pa.table(
        {
            "bucket": pa.array([0, 0, 1], type=pa.int32()),
            "conv_id": pa.array(["a", "b", "c"]),
            "clean_text": pa.array(["xx", "yyy", "z"]),
        }
    )
    key, chars, convs = _counter_partials(tbl)
    sink = _CounterSink()
    sink.add(key, chars, convs)
    sink.add(key, chars, convs)  # replay (task retry)
    n_convs, n_chars = sink.totals()
    assert n_chars == {0: 5, 1: 1}
    assert n_convs == {0: 2, 1: 1}


def test_conv_stats_auto_gate(ray_session, sf_dir, monkeypatch):
    """merge="auto" picks the distributed fold above the threshold and
    the driver fold below it — identical integers either way."""
    import pyarrow as pa

    from prlib_ray.fixtures import transcripts_dataset
    from prlib_ray.state import partitioning as part

    ds = transcripts_dataset(sf_dir)
    drv = part.conv_stats(ds, merge="driver")
    assert isinstance(drv, pa.Table)  # small corpus -> driver fold
    auto_small = part.conv_stats(ds, merge="auto")
    assert isinstance(auto_small, pa.Table)

    monkeypatch.setattr(part, "CONV_STATS_DISTRIBUTED_THRESHOLD", 1)
    auto_big = part.conv_stats(ds, merge="auto")
    assert not isinstance(auto_big, pa.Table)  # Dataset: distributed fold
    a = part.directions_and_sizes(drv)
    b = part.directions_and_sizes(auto_big)
    assert a == b


def test_manifest_records_input_lineage(ray_session, tmp_path, sf_dir):
    """input_meta is recorded verbatim in every bucket manifest and
    survives on disk, so a resumed/audited run can trace which source
    each committed partition came from."""
    import json
    import os

    from prlib_ray.pipelines.extract import flagship
    from prlib_ray.state.partitioning import write_partitioned

    out = str(tmp_path / "out")
    meta = {"sf_dir": sf_dir, "stage": "flagship"}
    ds = flagship(sf_dir, include_spans=False)
    manifests = write_partitioned(ds, out, num_buckets=4, input_meta=meta)
    assert manifests and all(m["input"] == meta for m in manifests)
    for m in manifests:
        with open(os.path.join(out, f"bucket={m['bucket']}",
                               "_manifest.json")) as f:
            assert json.load(f)["input"] == meta
