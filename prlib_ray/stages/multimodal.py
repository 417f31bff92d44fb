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
    """Actor-pool decode stage: __init__ = once-per-actor model load,
    __call__ = per-batch decode.

    The decoder is REAL where an image library exists: PIL is imported
    once per actor (the model-load slot) and any payload it can open
    yields actual (width, height, n_frames).  Payloads PIL cannot open
    — including every payload in this environment, which has no image
    libs and synthesizes text blobs — fall back to the deterministic
    geometry stub the DuckDB oracle pins (the driver's documents-table
    payloads are never decodable images, so the oracle holds on both
    paths)."""

    def __init__(self):
        # once-per-actor library/model load; optional import so the
        # stage works identically in lib-less environments
        try:
            from PIL import Image  # type: ignore[import-not-found]

            self._pil = Image
        except ImportError:
            self._pil = None
        self.model_loaded = True
        self.frame_bytes = 1024

    def _decode(self, payload: bytes) -> tuple[int, int, int, int]:
        if self._pil is not None:
            import io

            try:
                with self._pil.open(io.BytesIO(payload)) as im:
                    w, h = im.size
                    return (len(payload), int(w), int(h),
                            int(getattr(im, "n_frames", 1)))
            except Exception:
                pass  # not a decodable image -> deterministic stub
        n = len(payload)
        # STUB: deterministic fake geometry so tests and oracles can pin
        # it in environments without image libraries.
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


class ResizerStub:
    """Actor-pool resize stage (the decode -> transform -> re-encode
    shape): bound the longest side to ``max_dim`` with exact integer
    scaling.  The pixel transform is stubbed (no image libs in this
    env); the geometry arithmetic, actor signature, batch sizing and
    output layout are real and oracle-checked."""

    def __init__(self, max_dim: int = 256):
        self.max_dim = max_dim  # once-per-actor "kernel setup"

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy().astype(np.int64)
        h = batch["height"].to_numpy().astype(np.int64)
        n = batch["n_bytes"].to_numpy().astype(np.int64)
        m = np.maximum(w, h)
        big = m > self.max_dim
        safe_m = np.maximum(m, 1)
        out_w = np.where(big, (w * self.max_dim) // safe_m, w)
        out_h = np.where(big, (h * self.max_dim) // safe_m, h)
        out_bytes = np.minimum(n, np.maximum(out_w * out_h, 1))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "out_w": pa.array(out_w),
                "out_h": pa.array(out_h),
                "out_bytes": pa.array(out_bytes),
            }
        )


def resize_pipeline(sf_dir: str, *, max_dim: int = 256):
    """encode -> decode pool -> resize pool (chained actor-pool stages
    over the binary column; small batches for wide rows)."""
    decoded = decode_pipeline(sf_dir)
    return decoded.map_batches(
        ResizerStub,
        fn_constructor_kwargs={"max_dim": max_dim},
        batch_format="pyarrow",
        batch_size=512,
        concurrency=2,
        num_cpus=1,
    )


def frame_sample_batch(batch: pa.Table, *, every: int = 4) -> pa.Table:
    """Frame sampling: one row per kept frame (frame 0, every-th after)
    — the 1-row -> N-rows flat_map shape over multimodal metadata,
    fully vectorized (repeat + global arange offsets)."""
    nf = batch["n_frames"].to_numpy().astype(np.int64)
    n_keep = (nf + every - 1) // every
    ids = np.repeat(batch["doc_id"].to_numpy().astype(np.int64), n_keep)
    # per-row local arange via global arange minus repeated starts
    starts = np.concatenate(([0], np.cumsum(n_keep)))
    local = np.arange(int(starts[-1]), dtype=np.int64) - np.repeat(
        starts[:-1], n_keep
    )
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "frame_idx": pa.array(local * every),
        }
    )


def frame_sample_pipeline(sf_dir: str, *, every: int = 4):
    """encode -> decode pool -> frame-sample explode."""
    decoded = decode_pipeline(sf_dir)
    return decoded.map_batches(
        lambda b: frame_sample_batch(b, every=every),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def decode_pipeline(sf_dir: str):
    """encode -> actor-pool decode.  Small batches + a pool sized to
    2/3 of the CPUs (producer headroom; a fixed tiny pool would bound
    throughput at cluster scale, an all-CPU pool starves the encode
    stage): wide binary rows must not blow a worker heap (SURVEY §4)."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = ds.map_batches(
        encode_payload_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    pool = max(2, int(ncpu * 2 // 3))
    return ds.map_batches(
        DecoderStub,
        batch_format="pyarrow",
        batch_size=512,
        concurrency=(1, pool),
        num_cpus=1,
    )
