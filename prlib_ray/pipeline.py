"""Stage protocol + config-driven pipeline assembly (SURVEY §2.7).

The reference's extension surface is flat C functions chained by the
caller (only ``deskew`` and ``autoCrop`` are pre-composed); parameter
bags like ``FBCITB_ParamsMap`` (binarizeFBCITB.h:76) and the
``OPERATIONS`` flag enum drive variants.  Here that becomes a declared
``Stage`` registry and ``build_pipeline(config)``: a config is a list of
``{"stage": name, "params": {...}}`` dicts; stateless stages chain as
``map_batches`` task stages (Ray fuses them), stateful ones as actor
pools.  User hooks are plain callables registered the same way.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import pyarrow as pa


@dataclass
class Stage:
    name: str
    fn: Callable[..., pa.Table]  # (batch, **params) -> batch
    is_stateful: bool = False
    defaults: dict[str, Any] = field(default_factory=dict)


_REGISTRY: dict[str, Stage] = {}


def register_stage(name: str, fn, *, is_stateful: bool = False, **defaults):
    _REGISTRY[name] = Stage(name, fn, is_stateful, defaults)
    return _REGISTRY[name]


def get_stage(name: str) -> Stage:
    return _REGISTRY[name]


def _register_builtins() -> None:
    from prlib_ray.stages import crop, denoise, furniture, normalize, thinning
    from prlib_ray.stages.threshold import binarize_batch

    register_stage("normalize_whitespace", normalize.background_normalization_batch)
    register_stage("clean_background", normalize.clean_background_batch)
    register_stage("fold_chars", normalize.gamma_correction_batch)
    register_stage("color_balance", normalize.color_balance_batch)
    register_stage("salt_pepper", denoise.denoise_salt_pepper_batch)
    register_stage("deblur", denoise.basic_deblur_batch)
    register_stage("remove_lines", furniture.remove_lines_batch)
    register_stage("remove_hole_punch", furniture.remove_hole_punch_batch)
    register_stage("thin_zhang_suen", thinning.thin_zhang_suen_batch)
    register_stage("thin_guo_hall", thinning.thin_guo_hall_batch)
    register_stage("auto_crop", crop.autocrop_batch)
    register_stage("resize", crop.resize_batch)
    register_stage("binarize", binarize_batch, rule="sauvola")


_register_builtins()


def _rechain(batch: pa.Table) -> pa.Table:
    """Feed a stage's (doc_id, clean_text) output into the next stage's
    (doc_id, text) input — the reference's out-param -> in-param chain."""
    if "clean_text" in batch.column_names:
        idx = batch.column_names.index("clean_text")
        batch = batch.rename_columns(
            [("text" if i == idx else n) for i, n in enumerate(batch.column_names)]
        )
    return batch


def build_pipeline(ds, config: list[dict]):
    """Chain configured stages over a Dataset of (doc_id, text).

    Stateless stages are task ``map_batches`` (Ray fuses the chain into
    one pass — the reference's fused per-op chains, SURVEY §4); stateful
    stages get actor pools.
    """
    for i, step in enumerate(config):
        stage = get_stage(step["stage"])
        params = dict(stage.defaults)
        params.update(step.get("params", {}))
        last = i == len(config) - 1

        def make(fn=stage.fn, params=params, last=last):
            def run(b: pa.Table) -> pa.Table:
                out = fn(b, **params) if params else fn(b)
                return out if last else _rechain(out)

            return run

        kwargs = {"batch_format": "pyarrow", "zero_copy_batch": True}
        if stage.is_stateful:
            kwargs.update(concurrency=2, num_cpus=1)
        ds = ds.map_batches(make(), **kwargs)
    return ds


def run_config(sf_dir: str, config: list[dict]):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return build_pipeline(ds, config)
