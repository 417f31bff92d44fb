"""Flagship pipeline: transcript main-content extraction end-to-end.

Shape (SURVEY §3 target): read -> fused per-turn cleaning map ->
boilerplate threshold -> crop -> quality flags -> conversation
reassembly (the one wide step) -> extracted rows.
"""

from __future__ import annotations


def flagship(sf_dir: str):
    """Run the flagship extraction at ``sf_dir`` scale; returns a Dataset.

    Transcripts are synthesized deterministically from the documents
    table (one conversation per document; see prlib_ray/fixtures.py),
    then pushed through the extraction DAG.
    """
    import ray.data as rd

    from prlib_ray.stages import threshold

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # Placeholder flagship (round-1 bootstrap): Sauvola main-content mask.
    # Upgraded below as the transcript DAG lands.
    return threshold.binarize(ds, "sauvola")
