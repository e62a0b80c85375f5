"""Partial (combiner) aggregation — the canonical scale pattern.

Graft of gush's windowed fold sinks (reference: cep/Cep.scala:29-49 —
``groupedWithin`` then ``foldLeft`` sum / size): instead of shuffling
every row into a ``groupby``, each ``map_batches`` task first collapses
its batch to one row per (key) with partial ``sum/count/min/max``; the
global shuffle then only moves the tiny partials (ray_guide.md
"Aggregation at scale"). At 100 TB this is the difference between an
all-to-all of the stream and an all-to-all of ~P × num_keys rows.
"""

from __future__ import annotations

import pandas as pd

# spec: out_col -> (src_col, op) with op in {sum,count,min,max}
Spec = dict[str, tuple[str | None, str]]

_PARTIAL_OPS = {"sum": "sum", "count": "size", "min": "min", "max": "max"}
# merging partials: counts merge by summing; the rest are idempotent
_MERGE_OPS = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def partial_aggregate(ds, keys: list[str], specs: Spec,
                      num_partitions: int = 8):
    """groupby(keys) with per-batch combining. Returns a small Dataset.

    specs example::

        {"n": (None, "count"), "sum_v": ("value", "sum"), "max_ts": ("ts", "max")}

    The merge of partials deliberately avoids Ray's sort-based
    ``groupby().aggregate()`` (per-group Python overhead makes it ~20x
    slower at moderate key cardinality); instead partials are
    hash-partitioned and merged with one vectorized pandas groupby per
    partition (O(P) Python calls).
    """
    named = {}
    for out, (src, op) in specs.items():
        if op == "count":
            named[out] = (keys[0], "size")
        else:
            named[out] = (src, _PARTIAL_OPS[op])

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: SQL GROUP BY keeps a NULL group; pandas' default
        # silently discards null-keyed rows
        return batch.groupby(keys, as_index=False, sort=False,
                             dropna=False).agg(**named)

    partials = ds.map_batches(combine, batch_format="pandas")

    merge_named = {
        out: (out, _MERGE_OPS[op]) for out, (_, op) in specs.items()
    }

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, as_index=False, sort=False,
                          dropna=False).agg(**merge_named)

    from gush_ray.stages.shuffle import partition_map

    return partition_map(partials, keys, merge, num_partitions)


def finalize_mean(
    df: pd.DataFrame, sum_col: str, count_col: str, out_col: str, ndigits: int | None = 4
) -> pd.DataFrame:
    df[out_col] = df[sum_col] / df[count_col]
    if ndigits is not None:
        df[out_col] = df[out_col].round(ndigits)
    return df
