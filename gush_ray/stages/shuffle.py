"""Hash partitioning and partition-wise vectorized processing.

The engine's ONE partitioning discipline (SURVEY.md §7): hash the change
key (``url`` / ``user_id``) into a stable ``__part`` column and reuse that
partitioning for dedup, windows, NFA state and joins, so one shuffle per
epoch serves every stateful stage.

``partition_map`` is the scalable alternative to per-group
``groupby(key).map_groups`` when key cardinality is high: it shuffles by
the *partition* column (P groups, not millions) and hands each partition
to a vectorized pandas/pyarrow function — Python overhead is O(P), not
O(num_keys).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

PART_COL = "__part"


def stable_hash(values: np.ndarray | pd.Series) -> np.ndarray:
    """Deterministic (cross-process, seed-independent) vectorized uint64 hash."""
    arr = np.asarray(values)
    return pd.util.hash_array(arr, categorize=False)


def add_partition_column(
    ds,
    key_cols: list[str] | str,
    num_partitions: int,
    col: str = PART_COL,
):
    """Append ``col = hash(key) % P`` (vectorized, deterministic)."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]

    def assign(batch: pa.Table) -> pa.Table:
        h = np.zeros(batch.num_rows, dtype=np.uint64)
        for k in key_cols:
            h = h * np.uint64(1000003) + stable_hash(
                batch[k].to_numpy(zero_copy_only=False)
            )
        part = (h % np.uint64(num_partitions)).astype(np.int64)
        return batch.append_column(col, pa.array(part))

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def partition_map(
    ds,
    key_cols: list[str] | str,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_partitions: int = 32,
    batch_format: str = "pandas",
):
    """Shuffle by hash(key) % P, apply ``fn`` once per partition.

    ``fn`` sees every row of every key in its partition in one vectorized
    batch (use pandas ``sort_values`` + ``groupby`` inside). The ``__part``
    column is dropped from the output automatically if ``fn`` leaves it.
    """
    with_part = add_partition_column(ds, key_cols, num_partitions)

    def apply(group):
        out = fn(group)
        if isinstance(out, pa.Table):
            if PART_COL in out.column_names:
                out = out.drop_columns([PART_COL])
        elif PART_COL in getattr(out, "columns", []):
            out = out.drop(columns=[PART_COL])
        return out

    return with_part.groupby(PART_COL).map_groups(apply, batch_format=batch_format)
