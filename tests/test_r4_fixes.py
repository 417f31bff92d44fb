"""Round-4 ADVICE fixes: exact-int64 grouped sums, empty-group guards,
the corpus_merkle empty-corpus contract, and `via` validation."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from prlib_ray.blocks import int_bincount


class TestIntBincount:
    def test_matches_bincount_on_small_ints(self):
        rng = np.random.RandomState(7)
        idx = rng.randint(0, 50, size=10_000)
        w = rng.randint(-1000, 1000, size=10_000).astype(np.int64)
        ref = np.zeros(50, dtype=np.int64)
        np.add.at(ref, idx, w)
        got = int_bincount(idx, w, minlength=50)
        assert got.dtype == np.int64
        np.testing.assert_array_equal(got, ref)

    def test_exact_above_2_53(self):
        # np.bincount(weights=...) accumulates in float64 and loses the
        # +1 here; the int64 fold must not
        big = np.int64(2) ** 53
        idx = np.array([0, 0, 0], dtype=np.int64)
        w = np.array([big, 1, big], dtype=np.int64)
        got = int_bincount(idx, w)
        assert got[0] == 2 * big + 1
        lossy = np.bincount(idx, weights=w).astype(np.int64)
        assert lossy[0] != 2 * big + 1  # documents why the helper exists

    def test_sorted_and_unsorted_agree(self):
        rng = np.random.RandomState(11)
        idx = rng.randint(0, 17, size=513)
        w = rng.randint(0, 10, size=513)
        o = np.argsort(idx, kind="stable")
        np.testing.assert_array_equal(
            int_bincount(idx, w), int_bincount(idx[o], w[o]))

    def test_empty_and_minlength(self):
        out = int_bincount(np.array([], dtype=np.int64), np.array([]),
                           minlength=4)
        np.testing.assert_array_equal(out, np.zeros(4, dtype=np.int64))
        assert int_bincount(np.array([], dtype=np.int64),
                            np.array([])).size == 0

    def test_bool_weights(self):
        idx = np.array([1, 1, 0, 1])
        w = np.array([True, False, True, True])
        np.testing.assert_array_equal(int_bincount(idx, w),
                                      np.array([1, 2], dtype=np.int64))

    def test_negative_ids_raise(self):
        # np.bincount raises on negatives; the int64 fold must not
        # wrap Python-style into other groups' sums (round-5 ADVICE)
        with pytest.raises(ValueError, match="negative"):
            int_bincount(np.array([-1, 0, 1]), np.array([5, 6, 7]))
        with pytest.raises(ValueError, match="negative"):
            int_bincount(np.array([2, 0, -3]), np.array([5, 6, 7]))


def test_bounded_baselines_are_loud(sf_dir, ray_session, caplog):
    """VERDICT r3 item 4: the bounded all-pairs baselines must announce
    truncation instead of silently ignoring out-of-bound rows."""
    import logging

    from prlib_ray.api import build_queries
    from prlib_ray.blocks import note_bounded_input

    assert note_bounded_input("x", 10, "B", 10) is False
    assert note_bounded_input("x", 11, "B", 10) is True
    # once-per-op: the repeat truncation still returns True, silently
    assert note_bounded_input("x", 11, "B", 10) is True

    from prlib_ray import blocks as _blocks

    _blocks._BOUND_SEEN.clear()  # earlier tests may have warned already
    queries, _ = build_queries()
    with caplog.at_level(logging.WARNING, logger="prlib_ray.bounded"):
        queries["dedup_ngram_jaccard"](sf_dir)
    msgs = [r.message for r in caplog.records
            if r.name == "prlib_ray.bounded"]
    # sf0.001 documents has > MAX_PAIR_ID rows, so the warning fires
    assert any("dedup_ngram_jaccard" in m and "MAX_PAIR_ID" in m
               for m in msgs)


def test_propagate_min_labels_rejects_bad_via(ray_session):
    import ray.data as rd

    from prlib_ray.stages.dedup import _propagate_min_labels

    pairs = rd.from_items([{"doc_a": 1, "doc_b": 2}])
    with pytest.raises(ValueError, match="via must be"):
        _propagate_min_labels(pairs, via="drvier")


def test_corpus_merkle_empty_corpus_matches_oracle(
        tmp_path, ray_session):
    """Zero-document corpus: engine emits root = md5('') and the oracle's
    COALESCE pins the same value (a bare string_agg would yield NULL)."""
    import hashlib

    import duckdb

    from prlib_ray.api import build_queries

    d = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string()),
        "source": pa.array([], type=pa.string()),
    }), os.path.join(d, "documents.parquet"))

    queries, sqls = build_queries()
    out = queries["corpus_merkle"](d)
    df = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')")
    odf = con.execute(sqls["corpus_merkle"]).df()
    assert len(df) == len(odf) == 1
    assert df["node"].tolist() == ["root"]
    want = hashlib.md5(b"").hexdigest()
    assert df["hash"].tolist() == [want]
    assert odf["hash"].tolist() == [want]
