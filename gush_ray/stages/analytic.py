"""Per-key ordered analytics — the SQL window-function family.

gush itself has no analytic operators (SURVEY.md §2.5: the reference's
only per-key ordered state is the row-version map, grafted as V1); these
are the ``OVER (PARTITION BY key ORDER BY ts)`` primitives a
change-stream / training-data pipeline needs on top: running aggregates,
lag deltas, ranks, ntile bucketing, rollup and pivot.

Scale shape: ONE hash shuffle by key (``partition_map``) co-locates every
row of a key, then each partition is processed with vectorized pandas
(sort + groupby-cum*/rank — O(P) Python calls, not O(num_keys)).
Documented partitioning assumption (same as asof/interval joins): all
rows of one key fit one partition's memory; keys themselves are spread
by hash, so only a single pathological key can concentrate load.

Rollup/pivot instead reuse the partial-combiner aggregation
(:mod:`gush_ray.stages.agg`): the shuffle moves one partial row per
(key-combination, batch), never the input.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from gush_ray.stages.agg import Spec, partial_aggregate
from gush_ray.stages.shuffle import partition_map


def running_aggregate(ds, key: str, order_cols: Sequence[str],
                      cum_specs: dict[str, tuple[str, str]],
                      row_number_col: str | None = "rn",
                      num_partitions: int = 32):
    """Per-key running (cumulative) aggregates in deterministic order.

    ``cum_specs``: ``{out_col: (src_col, op)}`` with op in
    {"sum", "min", "max", "count"} — the classic
    ``SUM(x) OVER (PARTITION BY key ORDER BY order_cols ROWS UNBOUNDED
    PRECEDING)``. ``order_cols`` must be a total order within each key
    (include a unique id as tie-break) or the result is nondeterministic
    across runs — same contract the change classifier enforces.
    """
    order_cols = list(order_cols)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, *order_cols], kind="mergesort")
        g = df.groupby(key, sort=False)
        out = df.copy()
        for out_col, (src, op) in cum_specs.items():
            if op == "sum":
                out[out_col] = g[src].cumsum()
            elif op == "min":
                out[out_col] = g[src].cummin()
            elif op == "max":
                out[out_col] = g[src].cummax()
            elif op == "count":
                out[out_col] = g.cumcount() + 1
            else:
                raise ValueError(f"unsupported running op {op!r}")
        if row_number_col is not None:
            out[row_number_col] = g.cumcount() + 1
        return out

    return partition_map(ds, key, per_part, num_partitions)


def lag_columns(ds, key: str, order_cols: Sequence[str],
                lag_specs: dict[str, str], delta_specs: dict[str, str] | None = None,
                num_partitions: int = 32):
    """Per-key ``LAG(col, 1)`` (and optional ``col - LAG(col)`` deltas).

    ``lag_specs``: {out_col: src_col} → previous row's value (null on the
    first row of each key). ``delta_specs``: {out_col: src_col} → current
    minus previous (null on first). Ordering contract as in
    :func:`running_aggregate`.
    """
    order_cols = list(order_cols)
    delta_specs = delta_specs or {}

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, *order_cols], kind="mergesort")
        g = df.groupby(key, sort=False)
        out = df.copy()
        for out_col, src in lag_specs.items():
            out[out_col] = g[src].shift(1)
        for out_col, src in delta_specs.items():
            out[out_col] = df[src] - g[src].shift(1)
        return out

    return partition_map(ds, key, per_part, num_partitions)


def rank_per_key(ds, key: str, order_col: str, ascending: bool = True,
                 rank_col: str = "rnk", dense_col: str | None = "drnk",
                 num_partitions: int = 32):
    """SQL ``RANK()`` / ``DENSE_RANK()`` per key over ``order_col``.

    Ties share a rank (method='min' == RANK; method='dense' ==
    DENSE_RANK), so the output is deterministic even with ties.
    """

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, sort=False)[order_col]
        out = df.copy()
        out[rank_col] = g.rank(method="min", ascending=ascending).astype("int64")
        if dense_col is not None:
            out[dense_col] = g.rank(method="dense",
                                    ascending=ascending).astype("int64")
        return out

    return partition_map(ds, key, per_part, num_partitions)


def ntile_per_key(ds, key: str, order_cols: Sequence[str], n: int,
                  out_col: str = "tile", num_partitions: int = 32):
    """SQL ``NTILE(n)`` per key: rows in ``order_cols`` order split into n
    buckets; the first ``count % n`` buckets get the extra row — exactly
    DuckDB/ANSI NTILE semantics, so the oracle pairs bit-for-bit.

    ``order_cols`` must be a total order per key (tie-break included):
    NTILE assigns different buckets to tied rows, so without a total
    order the assignment is nondeterministic in ANY engine.
    """
    order_cols = list(order_cols)

    def tiles(count: int) -> np.ndarray:
        q, r = divmod(count, n)
        sizes = np.full(min(n, count), q, dtype=np.int64)
        sizes[:r] += 1
        sizes = sizes[sizes > 0]
        return np.repeat(np.arange(1, len(sizes) + 1, dtype=np.int64), sizes)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, *order_cols], kind="mergesort")
        out = df.copy()
        counts = df.groupby(key, sort=False).size()
        out[out_col] = np.concatenate([tiles(c) for c in counts]) if len(df) \
            else np.array([], dtype=np.int64)
        return out

    return partition_map(ds, key, per_part, num_partitions)


def moving_aggregate(ds, key: str, ts_col: str, range_span: int,
                     sum_specs: dict[str, str],
                     count_col: str | None = "n_win",
                     num_partitions: int = 32):
    """Per-key time-RANGE moving window: ``SUM(x) OVER (PARTITION BY key
    ORDER BY ts RANGE BETWEEN range_span PRECEDING AND CURRENT ROW)``.

    ANSI RANGE semantics: the frame is every row of the key whose ts lies
    in ``[cur_ts - range_span, cur_ts]`` — including PEERS of the current
    row (equal ts) that sort after it.

    Fully vectorized across keys: rows sort by (key, ts); each key's
    contiguous segment gets a disjoint offset added to ts so one global
    ``np.searchsorted`` yields every row's frame bounds at once (frames
    cannot cross key boundaries because the offsets separate segments by
    more than the global ts span); frame sums are prefix-sum differences.
    O(P) Python work per partition, one hash shuffle total.

    ``sum_specs``: {out_col: src_col} (int64 sources recommended — exact).
    """

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="mergesort")
        out = df.copy()
        n = len(df)
        if n == 0:
            for out_col in sum_specs:
                out[out_col] = np.array([], dtype=np.int64)
            if count_col is not None:
                out[count_col] = np.array([], dtype=np.int64)
            return out
        ts = df[ts_col].to_numpy().astype(np.int64)
        keys_arr = df[key].to_numpy()
        seg_start = np.empty(n, dtype=bool)
        seg_start[0] = True
        seg_start[1:] = keys_arr[1:] != keys_arr[:-1]
        seg_id = np.cumsum(seg_start) - 1
        # separate segments by more than span+ts-range so a frame's lower
        # bound can never reach into the previous key's segment
        n_seg = int(seg_id[-1]) + 1
        stride = np.int64(ts.max() - ts.min() + range_span + 2)
        if float(stride) * n_seg < 2.0**62:
            adj = ts - ts.min() + seg_id * stride
            lo = np.searchsorted(adj, adj - range_span, side="left")
            hi = np.searchsorted(adj, adj, side="right")  # peers included
        else:
            # many segments x a wide ts range would overflow the offset
            # trick; fall back to one searchsorted per key segment
            bounds = np.append(np.flatnonzero(seg_start), n)
            lo = np.empty(n, dtype=np.int64)
            hi = np.empty(n, dtype=np.int64)
            for a, b in zip(bounds[:-1], bounds[1:]):
                seg = ts[a:b]
                lo[a:b] = a + np.searchsorted(seg, seg - range_span,
                                              side="left")
                hi[a:b] = a + np.searchsorted(seg, seg, side="right")
        if count_col is not None:
            out[count_col] = (hi - lo).astype(np.int64)
        for out_col, src in sum_specs.items():
            v = df[src].to_numpy()
            csum = np.concatenate([[0], np.cumsum(v)])
            out[out_col] = csum[hi] - csum[lo]
        return out

    return partition_map(ds, key, per_part, num_partitions)


def group_share(ds, keys: list[str], value_col: str,
                out_col: str = "share_bp", scale: int = 10_000,
                num_partitions: int = 32):
    """Each row's integer share of its group total:
    ``floor(value * scale / SUM(value) OVER (PARTITION BY keys))`` —
    basis points by default. Integer throughout (exact, order-free), so
    results hash bit-identically against any engine. One hash shuffle.
    Precondition: non-negative int64 values (floor-div of negatives
    differs between engines).
    """

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        v = df[value_col].to_numpy().astype(np.int64)
        totals = df.groupby(keys, sort=False, dropna=False)[value_col] \
                   .transform("sum").to_numpy().astype(np.int64)
        out[out_col] = np.where(totals > 0, (v * scale) // np.maximum(totals, 1), 0)
        return out

    # hash-partition by the first key: all keys of a group agree on it,
    # so every group lands whole in one partition
    return partition_map(ds, keys[0], per_part, num_partitions)


def group_zscore(ds, key: str, value_col: str, z_col: str = "z",
                 ndigits: int = 6, num_partitions: int = 32):
    """Per-group z-score over an int64 value column.

    mean/var derive from EXACT integer sums (sum, sum of squares, n), so
    the float expression ``(v - s/n) / sqrt(sq/n - (s/n)*(s/n))`` is
    evaluated over identical operands in any engine; the result is
    rounded to ``ndigits`` on both sides of an oracle compare. Groups
    with zero variance emit z=0.
    """

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        v = df[value_col].to_numpy().astype(np.int64)
        g = df.groupby(key, sort=False, dropna=False)[value_col]
        s = g.transform("sum").to_numpy().astype(np.int64)
        n = g.transform("size").to_numpy().astype(np.int64)
        sq = (df.assign(__sq=v * v)
              .groupby(key, sort=False, dropna=False)["__sq"]
              .transform("sum").to_numpy().astype(np.int64))
        mean = s / n
        var = sq / n - mean * mean
        sd = np.sqrt(np.maximum(var, 0.0))
        z = np.where(sd > 0, (v - mean) / np.where(sd > 0, sd, 1.0), 0.0)
        out[z_col] = np.round(z, ndigits)
        return out

    return partition_map(ds, key, per_part, num_partitions)


def rollup_aggregate(ds, keys: list[str], specs: Spec,
                     num_partitions: int = 8):
    """``GROUP BY ROLLUP(keys)``: aggregates at every prefix level of
    ``keys`` plus the grand total, rolled-up columns set to null (SQL
    semantics). Level k is re-aggregated FROM level k+1's partials —
    the input is scanned once; every coarser level shuffles only the
    (tiny) finer aggregate.

    Restriction: every spec op must be re-aggregatable from its own
    output (sum/count→sum, min/max→idempotent) — true for all Spec ops.
    """
    import pyarrow as pa

    from gush_ray.stages.agg import _MERGE_OPS

    # materialize: the finest aggregate is small by definition (one row
    # per key combination) and every coarser level re-reads it
    finest = partial_aggregate(ds, keys, specs, num_partitions).materialize()
    if finest.count() == 0:
        # ROLLUP of an empty input is empty (matches SQL); take_batch(1)
        # below would raise on an empty dataset
        return finest
    # Arrow types via a one-row sample: Dataset.schema().types can yield
    # plain Python classes for pandas-block datasets, which pa.nulls
    # rejects; a real Arrow batch always carries true DataTypes
    sample = finest.take_batch(1, batch_format="pyarrow")
    col_type = {f.name: f.type for f in sample.schema}
    out_names = [*keys, *specs.keys()]

    def normalize(nulled: tuple):
        """Project to the rollup schema: fixed column order, rolled-up
        key columns as TYPED nulls (untyped pandas None columns infer
        Arrow null type, which breaks the union's schema match)."""
        def f(b: pa.Table) -> pa.Table:
            return pa.table({
                c: (pa.nulls(b.num_rows, type=col_type[c]) if c in nulled
                    else b[c])
                for c in out_names
            })
        return f

    levels = [finest.map_batches(normalize(()), batch_format="pyarrow",
                                 zero_copy_batch=True)]
    merge_specs: Spec = {
        out: (out, _MERGE_OPS[op]) for out, (_, op) in specs.items()
    }
    cur = finest  # raw (un-nulled) aggregate chain
    for k in range(len(keys) - 1, -1, -1):
        kept = keys[:k]
        if kept:
            cur = partial_aggregate(cur, kept, merge_specs,
                                    num_partitions).materialize()
            lv = cur
        else:
            # grand total: distributed fold of the previous level on a
            # constant key (that level is already tiny)
            def add_g(b: pd.DataFrame) -> pd.DataFrame:
                b = b.copy()
                b["__g"] = 0
                return b

            lv = partial_aggregate(
                cur.map_batches(add_g, batch_format="pandas"),
                ["__g"], merge_specs, num_partitions=1,
            )
        levels.append(lv.map_batches(normalize(tuple(keys[k:])),
                                     batch_format="pyarrow"))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def cube_aggregate(ds, keys: list[str], specs: Spec,
                   num_partitions: int = 8):
    """``GROUP BY CUBE(keys)``: aggregates at EVERY subset of ``keys``
    (2^k levels), absent keys as typed nulls. Each level is
    re-aggregated from the finest level's partials — one input scan
    regardless of k. Practical for the usual 2-3 cube dimensions; the
    2^k blowup is inherent to CUBE itself.
    """
    from itertools import combinations

    import pyarrow as pa

    from gush_ray.stages.agg import _MERGE_OPS

    finest = partial_aggregate(ds, keys, specs, num_partitions).materialize()
    if finest.count() == 0:
        return finest  # CUBE of empty input is empty (matches SQL)
    sample = finest.take_batch(1, batch_format="pyarrow")
    col_type = {f.name: f.type for f in sample.schema}
    out_names = [*keys, *specs.keys()]
    merge_specs: Spec = {
        out: (out, _MERGE_OPS[op]) for out, (_, op) in specs.items()
    }

    def normalize(nulled: tuple):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({
                c: (pa.nulls(b.num_rows, type=col_type[c]) if c in nulled
                    else b[c])
                for c in out_names
            })
        return f

    levels = [finest.map_batches(normalize(()), batch_format="pyarrow",
                                 zero_copy_batch=True)]
    for r in range(len(keys) - 1, -1, -1):
        for kept in combinations(keys, r):
            nulled = tuple(c for c in keys if c not in kept)
            if kept:
                lv = partial_aggregate(finest, list(kept), merge_specs,
                                       num_partitions)
            else:
                def add_g(b: pd.DataFrame) -> pd.DataFrame:
                    b = b.copy()
                    b["__g"] = 0
                    return b

                lv = partial_aggregate(
                    finest.map_batches(add_g, batch_format="pandas"),
                    ["__g"], merge_specs, num_partitions=1,
                )
            levels.append(lv.map_batches(normalize(nulled),
                                         batch_format="pyarrow"))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def pivot_counts(ds, key: str, pivot_col: str, pivot_values: list,
                 prefix: str = "n_", total_col: str | None = "n_total",
                 num_partitions: int = 32):
    """Crosstab: one row per key with a count column per pivot value
    (SQL ``COUNT(*) FILTER (WHERE pivot=v) AS n_v``).

    Two-stage: partial_aggregate((key, pivot)) shrinks the input to
    ≤ |keys|×|values| rows, then ONE more hash shuffle by key pivots each
    partition vectorized — no driver materialization, so key cardinality
    can be unbounded. ``pivot_values`` must be the closed value list
    (unknown values are dropped, as with an explicit FILTER list).
    """
    counts = partial_aggregate(ds, [key, pivot_col], {"n": (None, "count")},
                               num_partitions)

    def pivot(df: pd.DataFrame) -> pd.DataFrame:
        wide = df.pivot_table(index=key, columns=pivot_col, values="n",
                              aggfunc="sum", fill_value=0)
        wide = wide.reindex(columns=pivot_values, fill_value=0).astype("int64")
        wide.columns = [f"{prefix}{v}" for v in pivot_values]
        out = wide.reset_index()
        if total_col is not None:
            out[total_col] = out[[f"{prefix}{v}" for v in pivot_values]].sum(
                axis=1
            )
        return out

    return partition_map(counts, key, pivot, num_partitions)
