"""prlib_ray — a Ray-Data-native main-content extraction engine.

A from-scratch reinterpretation of the PRLib pre-recognition chain
(reference: /root/reference, zamazan4ik/PRLib) as a staged per-turn
text-cleaning DAG over Parquet tables of multi-turn transcripts:

* binarization family  -> windowed block keep/drop thresholding (stages/threshold.py)
* deskew/rotate        -> conversation reassembly shuffle (stages/reassemble.py)
* autoCrop             -> main-content region detection + span slice (stages/crop.py)
* denoise/deblur       -> noise-run removal, wrap rejoin (stages/denoise.py)
* dots/holepunch/lines -> furniture & separator removal (stages/furniture.py)
* balance/background   -> whitespace & char canonicalization (stages/normalize.py)
* detectors/thinning   -> quality flags + markup skeletonization (stages/quality.py,
                          stages/thinning.py)

plus the large-scale training-data operators the reference never had:
dedup (exact/MinHash/SimHash/Jaccard/embedding), ANN similarity search,
text analysis (lang-id, quality, tokens, fingerprints), and multimodal
binary-column plumbing.

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches, actor pools for stateful
stages, explicit partial aggregation before shuffles, and hash
partitioning with skew salting for the one wide step (conversation
reassembly).  Nothing here calls ``ray.init``.
"""

__version__ = "0.1.0"
