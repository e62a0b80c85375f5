"""Joins: broadcast small-side, hash-shuffle, and salted-skew variants.

gush has no join operator (SURVEY.md §2.5 — verified over all 12 main
files); the north rule adds a stateful change-stream × dimension-snapshot
join with "groupby-shuffle hash join with explicit salt-based skew
splitting for hot urls" (BASELINE.json north_star). Three strategies:

* :func:`broadcast_join` — dimension fits in memory: ``ray.put`` once,
  pandas merge per batch inside ``map_batches``. No shuffle at all.
* :func:`hash_join` — both sides large: Ray Data's hash-partitioned
  ``Dataset.join`` (Ray 2.46+).
* :func:`salted_join` — hash join with hot-key salting: hot keys on the
  probe side are spread across S salt buckets, the build side replicates
  its hot rows ×S, so no single join partition receives a whole hot key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from gush_ray.stages.agg import partial_aggregate

SALT_COL = "__salt"


def _get_cached(ref, max_entries: int = 4):
    # ray.get on a worker hits the local plasma store (zero-copy after the
    # first fetch per node); a tiny BOUNDED per-process memo avoids
    # repeated deserialization of pandas objects without leaking every
    # broadcast a long-lived worker ever saw.
    cache = _get_cached.__dict__.setdefault("cache", {})
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in cache:
        while len(cache) >= max_entries:
            cache.pop(next(iter(cache)))  # evict oldest insertion
        cache[key] = ray.get(ref)
    return cache[key]


def broadcast_join(ds, small: pd.DataFrame, on: list[str] | str,
                   how: str = "inner"):
    """Broadcast the small side once; merge per batch. No shuffle."""
    if isinstance(on, str):
        on = [on]
    ref = ray.put(small)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        dim = _get_cached(ref)
        return batch.merge(dim, on=on, how=how)

    return ds.map_batches(merge, batch_format="pandas")


def broadcast_semi_filter(ds, keys, on: str, keep: bool = True):
    """Semi (keep=True) / anti (keep=False) join by broadcasting the key set.

    The Arrow value_set is built ONCE on the driver and broadcast — not
    rebuilt from a Python set per batch (O(|keys|) per batch otherwise).
    """
    key_list = sorted(set(keys))
    if not key_list:
        # empty key set short-circuits: semi keeps nothing, anti keeps all
        # (a typed empty value_set can't be built without knowing the
        # column type, and is_in would raise on a type mismatch)
        if keep:
            return ds.map_batches(lambda b: b.slice(0, 0),
                                  batch_format="pyarrow",
                                  zero_copy_batch=True)
        return ds
    ref = ray.put(pa.array(key_list))

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0:
            return batch
        vs = _get_cached(ref)
        mask = pc.is_in(batch[on], value_set=vs)
        if not keep:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def asof_join(left, right, key: str, ts_col: str, right_ts_col: str,
              num_partitions: int = 8, suffix: str = "_r"):
    """As-of (temporal) join: for each left row, the latest right row of
    the same key with ``right_ts < left_ts`` (strict — the change-stream
    'most recent prior version' lookup).

    Composition (ray_guide.md 'As-of / range join'): co-partition both
    sides by hash(key) in ONE shuffle (tag + union), then a vectorized
    ``pd.merge_asof`` per partition. Documented partitioning assumption:
    all rows of a key fit one partition's memory.
    """
    import pandas as pd

    from gush_ray.stages.shuffle import partition_map

    lsch, rsch = left.schema(), right.schema()
    lnames, rnames = lsch.names, rsch.names
    assert set(lnames) & set(rnames) == {key}, (
        "asof_join requires disjoint columns except the key"
    )
    all_cols = lnames + [c for c in rnames if c not in lnames]
    col_type = dict(zip(lnames, lsch.types)) | dict(zip(rnames, rsch.types))

    def tag(side):
        # Arrow-native schema alignment: the other side's columns are
        # typed nulls (no pandas conversion in this hot tagging stage)
        def f(b: pa.Table) -> pa.Table:
            n = b.num_rows
            cols = {
                c: (b[c] if c in b.column_names
                    else pa.nulls(n, type=col_type[c]))
                for c in all_cols
            }
            cols["__side"] = pa.array(np.full(n, side, dtype=object),
                                      type=pa.string())
            return pa.table(cols)
        return f

    l2 = left.map_batches(tag("l"), batch_format="pyarrow",
                          zero_copy_batch=True)
    r2 = right.map_batches(tag("r"), batch_format="pyarrow",
                           zero_copy_batch=True)
    both = l2.union(r2)

    out_cols = lnames + [c for c in rnames if c != key]

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        # split by the KNOWN column lists (schema is identical for every
        # partition regardless of which sides are present)
        ldf = df.loc[df["__side"] == "l", lnames].sort_values(ts_col)
        rdf = df.loc[df["__side"] == "r", rnames].sort_values(right_ts_col)
        if not len(ldf) or not len(rdf):
            return ldf.reindex(columns=out_cols)
        out = pd.merge_asof(
            ldf, rdf, left_on=ts_col, right_on=right_ts_col, by=key,
            direction="backward", allow_exact_matches=False,
            suffixes=("", suffix),
        )
        return out.reindex(columns=out_cols)

    return partition_map(both, key, per_part, num_partitions)


def interval_pair_indices(ldf: pd.DataFrame, rdf: pd.DataFrame, key: str,
                          lts_col: str, rts_col: str,
                          low_us: int, high_us: int
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Positional index pairs (li, ri) into ``ldf``/``rdf`` for every
    same-key pair with ``r.ts - l.ts`` in ``[low_us, high_us]``.

    The shared kernel of the batch :func:`interval_join` and the
    streaming stream-stream join state: per key the right side is sorted
    once and ``np.searchsorted`` yields each left row's window bounds;
    pairs explode via ``np.repeat`` — cost is output-size-bound, not n².
    """
    if not len(ldf) or not len(rdf):
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    l_idx_parts: list[np.ndarray] = []
    r_idx_parts: list[np.ndarray] = []
    rpos = {k: g for k, g in
            pd.Series(np.arange(len(rdf)), index=rdf[key].to_numpy())
            .groupby(level=0, sort=False)}
    rts_all = rdf[rts_col].to_numpy().astype(np.int64)
    lkeys = ldf[key].to_numpy()
    lts_all = ldf[lts_col].to_numpy().astype(np.int64)
    lpos = pd.Series(np.arange(len(ldf)), index=lkeys)
    for k, lg in lpos.groupby(level=0, sort=False):
        rg = rpos.get(k)
        if rg is None:
            continue
        ri_cand = rg.to_numpy()
        rts = rts_all[ri_cand]
        order = np.argsort(rts, kind="mergesort")
        ri_cand = ri_cand[order]
        rts = rts[order]
        li_cand = lg.to_numpy()
        lts = lts_all[li_cand]
        lo = np.searchsorted(rts, lts + low_us, side="left")
        hi = np.searchsorted(rts, lts + high_us, side="right")
        cnt = hi - lo
        keep = cnt > 0
        if not keep.any():
            continue
        l_idx_parts.append(np.repeat(li_cand[keep], cnt[keep]))
        r_idx_parts.append(ri_cand[np.concatenate(
            [np.arange(a, b) for a, b in zip(lo[keep], hi[keep])]
        )])
    if not l_idx_parts:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    return np.concatenate(l_idx_parts), np.concatenate(r_idx_parts)


def interval_join(left, right, key: str, ts_col: str, right_ts_col: str,
                  low_us: int, high_us: int, num_partitions: int = 8):
    """Range (interval) join: every (left, right) pair of the same key
    with ``right_ts - left_ts`` in ``[low_us, high_us]`` — the windowed
    event-correlation join (brief: "as-of join, range join" custom
    operators; gush itself has no join, SURVEY.md §2.5).

    Composition: co-partition both sides by hash(key) in ONE shuffle
    (same tag+union trick as :func:`asof_join`), then per partition a
    vectorized sorted-sweep: for each left row ``np.searchsorted`` finds
    its right-window bounds and the pairs explode via ``np.repeat``.
    Partitioning assumption (documented, same as asof): one key's rows
    fit one partition's memory; cost is output-size-bound, not n².
    """
    from gush_ray.stages.shuffle import partition_map

    lsch, rsch = left.schema(), right.schema()
    lnames, rnames = lsch.names, rsch.names
    assert set(lnames) & set(rnames) == {key}, (
        "interval_join requires disjoint columns except the key"
    )
    all_cols = lnames + [c for c in rnames if c not in lnames]
    col_type = dict(zip(lnames, lsch.types)) | dict(zip(rnames, rsch.types))

    def tag(side):
        def f(b: pa.Table) -> pa.Table:
            n = b.num_rows
            cols = {
                c: (b[c] if c in b.column_names
                    else pa.nulls(n, type=col_type[c]))
                for c in all_cols
            }
            cols["__side"] = pa.array(np.full(n, side, dtype=object),
                                      type=pa.string())
            return pa.table(cols)
        return f

    both = left.map_batches(tag("l"), batch_format="pyarrow",
                            zero_copy_batch=True).union(
        right.map_batches(tag("r"), batch_format="pyarrow",
                          zero_copy_batch=True)
    )
    out_cols = lnames + [c for c in rnames if c != key]

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        ldf = df.loc[df["__side"] == "l", lnames].reset_index(drop=True)
        rdf = df.loc[df["__side"] == "r", rnames].reset_index(drop=True)
        li, ri = interval_pair_indices(ldf, rdf, key, ts_col, right_ts_col,
                                       low_us, high_us)
        if not len(li):
            return pd.DataFrame(columns=out_cols)
        lpart = ldf.iloc[li].reset_index(drop=True)
        rpart = rdf.iloc[ri].reset_index(drop=True).drop(columns=[key])
        out = pd.concat([lpart, rpart], axis=1)[out_cols]
        # the tagged union pads each side's columns with nulls, so pandas
        # widens integer columns to float64 in the partition frame; the
        # matched output has no nulls — restore the declared Arrow dtype
        for c in out_cols:
            if pa.types.is_integer(col_type[c]) and out[c].dtype.kind == "f":
                out[c] = out[c].astype("int64")
        return out

    return partition_map(both, key, per_part, num_partitions)


def _strip_meta(ds):
    # parquet files carry pandas metadata dicts in their schema; the hash
    # join's schema-dedup can't hash them and logs a warning per block
    return ds.map_batches(
        lambda b: b.replace_schema_metadata(None),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def _default_join_partitions() -> int:
    """Size the join's aggregator-actor pool to the session.

    ``Dataset.join`` spawns one aggregator actor per partition and
    BLOCKS until all are placed — a fixed 32 deadlocks a 4-CPU test
    session outright (observed: ray::Hash workers parked forever). Cap
    at the cluster's CPU count locally; at real cluster scale this
    returns a wide fan-out again.
    """
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, min(32, cpus))


def hash_join(left, right, on: str | tuple, num_partitions: int | None = None,
              join_type: str = "inner", **kw):
    """Hash-shuffle join on the shared partitioning key."""
    if isinstance(on, str):
        on = (on,)
    if num_partitions is None:
        num_partitions = _default_join_partitions()
    return _strip_meta(left).join(_strip_meta(right), join_type=join_type,
                                  num_partitions=num_partitions, on=on, **kw)


def find_hot_keys(ds, key: str, threshold: int, sample_frac: float | None = None):
    """Count-based heavy-hitter detection (partial-agg, tiny shuffle).

    The ``n >= threshold`` cut runs DISTRIBUTED, after the merge stage —
    only the hot keys (tiny by definition of "hot") ever reach the
    driver; at 10^9+ distinct keys materializing one count row per key
    driver-side would OOM. At 100 TB also run this on a sample
    (``sample_frac``) with a scaled threshold — the partials shuffle is
    already small, but the scan can be.
    """
    src = ds if sample_frac is None else ds.random_sample(sample_frac, seed=13)
    counts = partial_aggregate(src, [key], {"n": (None, "count")})
    hot = counts.filter(expr=f"n >= {threshold}")
    return hot.to_pandas()[key].tolist()


def salted_join(left, right, on: str, hot_keys: list, num_salts: int = 8,
                num_partitions: int | None = None, join_type: str = "inner"):
    """J2: skew-split hash join.

    ``left`` is the big/probe side (rows of a hot key scattered over
    ``num_salts`` sub-buckets); ``right`` is the build side (its hot-key
    rows replicated once per salt). Non-hot keys use salt 0 on both sides.
    Salting is Arrow-native: ``pc.is_in`` against a broadcast value set +
    ``Table.take`` replication — no pandas conversion in the hot path.
    """
    import pyarrow.compute as pc

    if num_partitions is None:
        num_partitions = _default_join_partitions()
    if not hot_keys:
        # no skew detected: degrade to a plain hash join (constant salt
        # everywhere would only add a useless column through the shuffle)
        return hash_join(left, right, on=on, num_partitions=num_partitions,
                         join_type=join_type)
    hot_ref = ray.put(pa.array(sorted(set(hot_keys))))

    def _hot_mask(batch: pa.Table) -> np.ndarray:
        vs = _get_cached(hot_ref)
        return pc.fill_null(
            pc.is_in(batch[on], value_set=vs), False
        ).to_numpy(zero_copy_only=False)

    def salt_left(batch: pa.Table) -> pa.Table:
        is_hot = _hot_mask(batch)
        salt = np.zeros(batch.num_rows, dtype=np.int64)
        salt[is_hot] = np.arange(int(is_hot.sum()), dtype=np.int64) % num_salts
        return batch.append_column(SALT_COL, pa.array(salt))

    def salt_right(batch: pa.Table) -> pa.Table:
        is_hot = _hot_mask(batch)
        cold_idx = np.nonzero(~is_hot)[0]
        hot_idx = np.nonzero(is_hot)[0]
        idx = np.concatenate([cold_idx, np.repeat(hot_idx, num_salts)])
        salt = np.concatenate([
            np.zeros(len(cold_idx), dtype=np.int64),
            np.tile(np.arange(num_salts, dtype=np.int64), len(hot_idx)),
        ])
        return batch.take(pa.array(idx)).append_column(
            SALT_COL, pa.array(salt)
        )

    l2 = left.map_batches(salt_left, batch_format="pyarrow",
                          zero_copy_batch=True)
    r2 = right.map_batches(salt_right, batch_format="pyarrow",
                           zero_copy_batch=True)
    joined = _strip_meta(l2).join(_strip_meta(r2), join_type=join_type,
                                  num_partitions=num_partitions,
                                  on=(on, SALT_COL))
    return joined.drop_columns([SALT_COL])
