"""Query registry: the driver-facing surface of the engine.

``build_queries()`` returns ``(queries, oracles)`` — one entry per
implemented operator from SURVEY.md §2 (plus the training-data operators).
Each query callable takes ``sf_dir`` and returns a ``ray.data.Dataset``
(or pandas/pyarrow for small results); the matching oracle is ANSI SQL
DuckDB runs over the same parquet tables.  Nothing here calls
``ray.init`` — the caller owns the Ray session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from prlib_ray import oracles
from prlib_ray.stages import threshold


def _binarize_query(rule: str, **params) -> Callable[[str], Any]:
    def q(sf_dir: str):
        import ray.data as rd

        ds = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return threshold.binarize(ds, rule, **params)

    q.__name__ = f"binarize_{rule}"
    return q


def build_queries() -> tuple[dict[str, Callable[[str], Any]], dict[str, str]]:
    queries: dict[str, Callable[[str], Any]] = {}
    sql: dict[str, str] = {}

    # §2.1 binarization family — windowed block keep/drop over documents.
    for rule in threshold.RULES:
        name = f"binarize_{rule}"
        queries[name] = _binarize_query(rule)
        sql[name] = oracles.binarize_sql(rule)

    # FBCITB OPERATIONS flags (binarizeFBCITB.h:39-51): the edge-only and
    # variance-only detection paths as param-driven query variants
    queries["binarize_fbcitb_edges"] = _binarize_query("fbcitb", paths="edge")
    sql["binarize_fbcitb_edges"] = oracles.binarize_sql("fbcitb_edges")
    queries["binarize_fbcitb_var"] = _binarize_query("fbcitb", paths="var")
    sql["binarize_fbcitb_var"] = oracles.binarize_sql("fbcitb_var")

    # binarizeByLocalVariancesWithoutFilters: same rule, reference's
    # lighter parameters (binarizeByLocalVariances.cpp:143-292)
    queries["binarize_local_variances_nofilter"] = _binarize_query(
        "local_variances", min_var=10.0
    )
    sql["binarize_local_variances_nofilter"] = oracles.binarize_sql(
        "local_variances_nofilter"
    )

    # corpus-global WolfJolion variant (aggregate-then-broadcast pattern);
    # the global min/max make it non-expressible as a per-row SQL mirror of
    # the same *structure*, but the value is still SQL-expressible:
    def binarize_wolf_global(sf_dir: str):
        import ray.data as rd

        ds = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return threshold.binarize_wolf_global(ds)

    queries["binarize_wolf_global"] = binarize_wolf_global
    sql["binarize_wolf_global"] = oracles.wolf_global_sql()

    _register_more(queries, sql)
    return queries, sql


def _register_more(queries, sql) -> None:
    """Extended families appended as they are implemented (see api_ext)."""
    from prlib_ray import api_ext

    api_ext.register(queries, sql)
