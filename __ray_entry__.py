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


def queries() -> dict[str, Callable[[str], Any]]:
    from gush_ray.pipelines.queries import CORE_QUERIES

    from gush_ray.pipelines.queries_extra import EXTRA_QUERIES

    out = {name: fn for name, (fn, _sql) in CORE_QUERIES.items()}
    out.update({n: fn for n, (fn, _sql) in EXTRA_QUERIES.items()})
    return out


def oracle_sql() -> dict[str, str]:
    from gush_ray.pipelines.queries import CORE_QUERIES

    from gush_ray.pipelines.queries_extra import EXTRA_QUERIES

    out = {name: sql for name, (_fn, sql) in CORE_QUERIES.items() if sql}
    out.update({n: sql for n, (_fn, sql) in EXTRA_QUERIES.items() if sql})
    return out
