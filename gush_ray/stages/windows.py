"""Event-time windows: tumbling / sliding / session (batch form).

Graft of gush's processing-time windows (reference: cep/Cep.scala:29-49,
``groupedWithin(Int.MaxValue, interval)`` feeding count / fold-average,
used with a 10 s interval in gush_example/GushCEP.scala:40-46) onto event
time: rows are assigned ``window_id`` from the event-time column
(``warc_ts`` / ``ts``), aggregated with the partial-combiner machinery in
:mod:`gush_ray.stages.agg`. The streaming (cross-epoch, watermark-closed)
form of the same accumulators lives in :mod:`gush_ray.state.store`.

Window ids are integer ``floor(epoch_us / size)`` — DuckDB-oracle-friendly
(``epoch_us(ts) // size``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from gush_ray.stages.agg import Spec, partial_aggregate
from gush_ray.stages.shuffle import partition_map


def ts_to_us(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Event time → int64 MICROSECONDS, whatever the storage precision.

    A bare int64 cast reads a timestamp's raw ticks: a producer that
    switches to timestamp[ns] mid-stream would silently inflate event
    time 1000x, jump the watermark past every later µs row and
    late-route the whole stream (round-3 drift probe). Normalize to µs
    first; sub-µs precision truncates (µs is the engine's event-time
    resolution — documented, loud in tests, never silent corruption)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_timestamp(arr.type) and arr.type.unit != "us":
        import pyarrow.compute as pc

        arr = pc.cast(arr, pa.timestamp("us", tz=arr.type.tz), safe=False)
    return arr.cast(pa.int64())


def assign_tumbling(batch: pa.Table, ts_col: str, size_us: int,
                    out_col: str = "window_id") -> pa.Table:
    """Vectorized tumbling window assignment (one window per row)."""
    us = ts_to_us(batch[ts_col]).to_numpy()
    wid = us // size_us
    return batch.append_column(out_col, pa.array(wid))


def assign_sliding(batch: pa.Table, ts_col: str, size_us: int, slide_us: int,
                   out_col: str = "window_id") -> pa.Table:
    """Vectorized sliding window assignment — flat-map each row to the
    ``k = size/slide`` windows that contain it (SURVEY.md W3).

    ``window_id`` is in slide units; window w covers
    ``[w*slide, w*slide + size)``.
    """
    if size_us % slide_us != 0:
        raise ValueError("size_us must be a multiple of slide_us")
    k = size_us // slide_us
    n = batch.num_rows
    us = ts_to_us(batch[ts_col]).to_numpy()
    base = us // slide_us
    idx = np.repeat(np.arange(n), k)
    offs = np.tile(np.arange(k, dtype=np.int64), n)
    wid = base[idx] - offs
    out = batch.take(pa.array(idx))
    return out.append_column(out_col, pa.array(wid))


def tumbling_aggregate(ds, keys: list[str], ts_col: str, size_us: int,
                       specs: Spec, window_col: str = "window_id",
                       num_partitions: int = 8):
    """Tumbling-window grouped aggregate with partial combining (W1/W2)."""
    withw = ds.map_batches(
        lambda b: assign_tumbling(b, ts_col, size_us, window_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return partial_aggregate(withw, keys + [window_col], specs,
                             num_partitions=num_partitions)


def sliding_aggregate(ds, keys: list[str], ts_col: str, size_us: int,
                      slide_us: int, specs: Spec, window_col: str = "window_id",
                      num_partitions: int = 8):
    """Sliding-window grouped aggregate (W3): row replication + combiner.

    Replication happens inside ``map_batches`` immediately before the
    per-batch combine, so the shuffle still only moves partials.
    """
    withw = ds.map_batches(
        lambda b: assign_sliding(b, ts_col, size_us, slide_us, window_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return partial_aggregate(withw, keys + [window_col], specs,
                             num_partitions=num_partitions)


def _session_assign(df: pd.DataFrame, key: str, ts_col: str, gap_us: int) -> pd.DataFrame:
    """Vectorized per-partition session assignment (all rows of each key
    are co-partitioned by the caller)."""
    df = df.sort_values([key, ts_col], kind="mergesort")
    us = df[ts_col].astype("int64")
    new_key = df[key].ne(df[key].shift())
    gap_break = us.diff() > gap_us
    df["session_id"] = (new_key | gap_break).cumsum()
    return df


def session_windows(ds, key: str, ts_col: str, gap_us: int,
                    num_partitions: int = 32, agg_value: str | None = None):
    """Session windows (W4): gap-merge per key, one shuffle by hash(key).

    Returns one row per session: key, session_start_us, session_end_us,
    n_events (+ sum_value if ``agg_value``).
    """

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = _session_assign(df, key, ts_col, gap_us)
        us = df[ts_col].astype("int64")
        df = df.assign(__us=us)
        named = dict(
            session_start_us=("__us", "min"),
            session_end_us=("__us", "max"),
            n_events=("__us", "size"),
        )
        if agg_value is not None:
            named["sum_value"] = (agg_value, "sum")
        out = df.groupby([key, "session_id"], as_index=False, sort=False).agg(**named)
        return out.drop(columns=["session_id"])

    return partition_map(ds, key, per_part, num_partitions)
