"""Change classification + exact dedup over the keyed stream (batch form).

Graft of gush's statement→event mapping (reference:
binlog/BinlogEvent.scala:20-25 — InsertStatement→BinlogInsertEvent,
UpdateStatement→BinlogUpdateEvent): in the web-change-stream transposition
the *first sighting* of a ``url`` is an ``insert`` and every later
re-crawl (greater ``warc_ts``) is an ``update`` carrying a version number;
exact duplicate ``(url, warc_ts)`` rows are replays and are dropped
(row-version dedup map V1 in SURVEY.md §2.5 — the streaming actor form
lives in gush_ray.state.store).

All per-partition work is vectorized pandas over hash(url) partitions —
one shuffle, O(P) Python calls.
"""

from __future__ import annotations

import pandas as pd

from gush_ray.stages.shuffle import partition_map


def classify_changes(ds, key: str = "url", ts_col: str = "warc_ts",
                     num_partitions: int = 32, drop_replays: bool = True,
                     tie_col: str | None = None):
    """Add ``version`` (0-based per key, ts order) and ``change_kind``
    ('insert' | 'update'); drop exact (key, ts) replay duplicates.

    ``tie_col`` (e.g. an event id) breaks (key, ts) ties deterministically
    — without it, Ray's nondeterministic block order makes the version
    assignment of tied rows vary across runs (the paired oracles order by
    ``ts, event_id``). Leave ``None`` only when (key, ts) is unique.
    """
    sort_cols = [key, ts_col] + ([tie_col] if tie_col else [])

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, kind="mergesort")
        if drop_replays:
            df = df.drop_duplicates([key, ts_col], keep="first")
        df = df.copy()
        df["version"] = df.groupby(key, sort=False).cumcount()
        df["change_kind"] = "update"
        df.loc[df["version"] == 0, "change_kind"] = "insert"
        return df

    return partition_map(ds, key, per_part, num_partitions)


def latest_snapshot(ds, key: str = "url", ts_col: str = "warc_ts"):
    """D1: dimension snapshot of the change stream — one row per key with
    last_ts + n_versions. Partial-friendly (Max/Count merge associatively)."""
    from gush_ray.stages.agg import partial_aggregate

    return partial_aggregate(
        ds, [key],
        {"last_ts": (ts_col, "max"), "first_ts": (ts_col, "min"),
         "n_versions": (None, "count")},
    )
