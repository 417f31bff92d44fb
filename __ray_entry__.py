"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in prlib_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_SMOKE_SF = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from prlib_ray.pipelines.extract import flagship

    return flagship(_SMOKE_SF)


def queries() -> dict[str, Callable[[str], Any]]:
    from prlib_ray.api import build_queries

    return build_queries()[0]


def oracle_sql() -> dict[str, str]:
    from prlib_ray.api import build_queries

    return build_queries()[1]
