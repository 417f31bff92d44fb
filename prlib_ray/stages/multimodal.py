"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are not available in this environment, so the
*decode kernel* is a deterministic stub — but the Ray-side plumbing is
real and tested: binary Arrow columns, an actor-pool ``map_batches`` stage
whose ``__init__`` does the once-per-actor "model load", small batch
sizes for wide rows, and integer metadata outputs with a DuckDB oracle.

Swap ``DecoderStub._decode`` for a real PIL/ffmpeg call on a cluster with
the libs installed; nothing else changes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def encode_payload_batch(batch: pa.Table) -> pa.Table:
    """documents -> (doc_id, payload: binary, mime) — the ingest step that
    turns an opaque blob column into the standard multimodal layout."""
    payloads = [t.encode("utf-8") for t in batch["text"].to_pylist()]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["application/octet-stream"] * batch.num_rows),
        }
    )


class DecoderStub:
    """Actor-pool decode stage: __init__ = once-per-actor model load
    (stubbed), __call__ = per-batch vectorized decode (stubbed to
    deterministic geometry derived from payload size)."""

    def __init__(self):
        # Real pipeline: load libjpeg/ffmpeg/model weights here, ONCE.
        self.model_loaded = True
        self.frame_bytes = 1024

    def _decode(self, payload: bytes) -> tuple[int, int, int, int]:
        n = len(payload)
        # STUB: a real decoder returns actual dims; this fake is
        # deterministic so tests and oracles can pin it.
        return n, n % 640, n % 480, (n + self.frame_bytes - 1) // self.frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        assert self.model_loaded
        meta = [self._decode(p) for p in batch["payload"].to_pylist()]
        arr = np.array(meta, dtype=np.int64).reshape(-1, 4)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bytes": pa.array(arr[:, 0]),
                "width": pa.array(arr[:, 1]),
                "height": pa.array(arr[:, 2]),
                "n_frames": pa.array(arr[:, 3]),
            }
        )


def decode_pipeline(sf_dir: str):
    """encode -> actor-pool decode.  Small batches + modest pool: wide
    binary rows must not blow a worker heap (SURVEY §4 memory note)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = ds.map_batches(
        encode_payload_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return ds.map_batches(
        DecoderStub,
        batch_format="pyarrow",
        batch_size=512,
        concurrency=2,
        num_cpus=1,
    )
