"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship CEP pipeline over the deterministic synthetic pages
stream; ``queries()`` — one callable per implemented operator from
SURVEY.md §2 (+ the training-data operators); ``oracle_sql()`` — DuckDB
equivalents for the SQL-expressible subset.

Ray is initialised by the driver BEFORE this module is imported: nothing
in here or in gush_ray calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
# Ray workers resolve imports from PYTHONPATH at worker-process spawn;
# setting it here covers lazily-spawned workers even when the driver's
# cwd is not the repo root.
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)


def entry() -> Any:
    """Flagship pipeline (read → extract → filter → classify → join →
    windowed aggregate) on the deterministic synthetic pages stream."""
    from gush_ray.pipelines.flagship import entry_pipeline

    return entry_pipeline()


def _all_query_entries() -> dict[str, tuple]:
    from gush_ray.pipelines.queries import CORE_QUERIES
    from gush_ray.pipelines.queries_analytic import ANALYTIC_QUERIES
    from gush_ray.pipelines.queries_extra import EXTRA_QUERIES

    out: dict[str, tuple] = {}
    out.update(CORE_QUERIES)
    out.update(ANALYTIC_QUERIES)
    out.update(EXTRA_QUERIES)
    return out


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: fn for name, (fn, _sql) in _all_query_entries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql
        for name, (_fn, sql) in _all_query_entries().items()
        if sql
    }
