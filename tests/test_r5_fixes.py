"""Round-5 ADVICE fixes: the blob-spill directory is tool-owned (a
misconfigured PRLIB_BLOB_SPILL_DIR must never delete user data)."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest


def _run_lsh(sf_dir, spill_dir, monkeypatch):
    from prlib_ray.stages.dedup import minhash_lsh_dedup

    monkeypatch.setenv("PRLIB_BLOB_SPILL_DIR", str(spill_dir))
    return minhash_lsh_dedup(sf_dir)


class TestBlobSpillOwnership:
    def test_spill_writes_into_owned_subdir(self, sf_dir, ray_session,
                                            tmp_path, monkeypatch):
        out = _run_lsh(sf_dir, tmp_path, monkeypatch)
        assert isinstance(out, pa.Table) or out is not None
        blob_dir = tmp_path / "prlib_blob"
        assert blob_dir.is_dir()
        assert (blob_dir / ".prlib_blob_owned").exists()
        # a second run reclaims its own directory without complaint
        out2 = _run_lsh(sf_dir, tmp_path, monkeypatch)
        assert out2 is not None
        # sibling user data in the spill root is untouched
        user_file = tmp_path / "precious.txt"
        user_file.write_text("do not delete")
        _run_lsh(sf_dir, tmp_path, monkeypatch)
        assert user_file.read_text() == "do not delete"

    def test_refuses_foreign_directory(self, sf_dir, ray_session,
                                       tmp_path, monkeypatch):
        # a pre-existing prlib_blob dir WITHOUT the sentinel is someone
        # else's data: refuse loudly instead of deleting it
        foreign = tmp_path / "prlib_blob"
        foreign.mkdir()
        (foreign / "data.parquet").write_bytes(b"not ours")
        with pytest.raises(RuntimeError, match="sentinel"):
            _run_lsh(sf_dir, tmp_path, monkeypatch)
        assert (foreign / "data.parquet").read_bytes() == b"not ours"
