"""Durable hash-bucketed parquet layout + shuffle-free bucketed join.

The engine's partitioning discipline (SURVEY.md §7: pick ONE key, hash
it, reuse the partitioning everywhere) made durable: ``write_bucketed``
lays a Dataset out as ``bucket=K/part-*.parquet`` under a manifest that
records the key, bucket count and hash function. Any later operator
that co-locates on the same key — join, dedup, grouped aggregation —
can then consume bucket-by-bucket with ZERO shuffle: ``bucketed_join``
joins two same-layout tables as independent per-bucket tasks (each
task reads exactly its two bucket directories), which at 100 TB turns
the single most expensive all-to-all exchange of a repeated pipeline
into a one-time layout cost amortized across every downstream run.

The hash is the engine's stable partitioner (stages/shuffle.stable_hash
— deterministic across processes and runs), so a table written today
joins a table written next month without re-bucketing. Layout writes
are idempotent (temp + atomic rename, same discipline as the
exactly-once sink) and the manifest is written last, so a crashed
layout job is invisible to readers and safely re-run.

Storage scope: local / shared-POSIX (NFS) paths today — the layout is
plain directories + parquet, so extending it through the gush_ray.fs
URI seam (as the exactly-once sink already is) is mechanical; the
record-last crash protocol carries over unchanged.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray

MANIFEST = "_BUCKETS.json"
HASH_KIND = "pandas-hash-array-v1"  # stages/shuffle.stable_hash


def write_bucketed(ds, out_dir: str, key: str, num_buckets: int = 32):
    """Materialize ``ds`` as a hash-bucketed parquet table. Returns the
    manifest dict. One shuffle (the layout cost); every same-key
    consumer afterwards runs shuffle-free."""
    from gush_ray.stages.shuffle import PART_COL, add_partition_column

    os.makedirs(out_dir, exist_ok=True)

    def write_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"bucket": pd.Series(dtype="int64"),
                                 "rows": pd.Series(dtype="int64")})
        k = int(df[PART_COL].iloc[0])
        d = os.path.join(out_dir, f"bucket={k:05d}")
        os.makedirs(d, exist_ok=True)
        out = df.drop(columns=[PART_COL])
        final = os.path.join(d, "part-00000.parquet")
        tmp = final + f".inprogress-{os.getpid()}"
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
                       tmp, compression="zstd", compression_level=1)
        os.replace(tmp, final)
        return pd.DataFrame({"bucket": [k], "rows": [len(out)]})

    with_part = add_partition_column(ds, key, num_buckets)
    report = with_part.groupby(PART_COL).map_groups(
        write_bucket, batch_format="pandas"
    ).to_pandas()
    manifest = {
        "key": key,
        "num_buckets": num_buckets,
        "hash": HASH_KIND,
        "rows": int(report["rows"].sum()),
        "buckets_written": sorted(int(b) for b in report["bucket"]),
    }
    tmp = os.path.join(out_dir, MANIFEST + ".inprogress")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, MANIFEST))
    return manifest


def read_manifest(out_dir: str) -> dict:
    path = os.path.join(out_dir, MANIFEST)
    if not os.path.exists(path):
        raise ValueError(f"{out_dir!r} is not a bucketed table "
                         f"(missing {MANIFEST})")
    with open(path) as f:
        return json.load(f)


def _bucket_files(out_dir: str, k: int) -> list[str]:
    d = os.path.join(out_dir, f"bucket={k:05d}")
    if not os.path.isdir(d):
        return []
    return [os.path.join(d, n) for n in sorted(os.listdir(d))
            if n.endswith(".parquet")]


def read_bucket(out_dir: str, k: int) -> pa.Table:
    files = _bucket_files(out_dir, k)
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f) for f in files])


@ray.remote
def _join_bucket(files_a: list[str], files_b: list[str], on: str,
                 how: str) -> pa.Table:
    ta = pa.concat_tables([pq.read_table(f) for f in files_a])
    tb = pa.concat_tables([pq.read_table(f) for f in files_b])
    df = ta.to_pandas().merge(tb.to_pandas(), on=on, how=how)
    return pa.Table.from_pandas(df, preserve_index=False)


def bucketed_join(dir_a: str, dir_b: str, on: str):
    """INNER-join two SAME-LAYOUT bucketed tables with zero shuffle:
    one Ray task per bucket, each reading exactly its two bucket
    directories (a bucket empty on either side contributes no rows).
    Refuses mismatched layouts loudly — key, bucket count and hash must
    all agree, and the join key must BE the bucketing key; anything
    else would silently drop every cross-bucket pair.
    """
    import ray.data as rd

    ma, mb = read_manifest(dir_a), read_manifest(dir_b)
    for field in ("key", "num_buckets", "hash"):
        if ma[field] != mb[field]:
            raise ValueError(
                f"bucketed layouts disagree on {field}: "
                f"{ma[field]!r} vs {mb[field]!r} — re-bucket one side"
            )
    if ma["key"] != on:
        raise ValueError(
            f"join key {on!r} is not the bucketing key {ma['key']!r}; "
            f"a bucketed join on any other key would silently drop "
            f"cross-bucket matches"
        )
    refs = []
    for k in range(ma["num_buckets"]):
        fa, fb = _bucket_files(dir_a, k), _bucket_files(dir_b, k)
        if fa and fb:
            refs.append(_join_bucket.remote(fa, fb, on, "inner"))
    if not refs:
        import pandas as _pd

        return rd.from_pandas(_pd.DataFrame())
    return rd.from_arrow_refs(refs)


def export_stream_bucketed(job, stream: str, out_dir: str,
                           key: str = "url") -> dict:
    """Expose a streaming job's committed output as a bucketed table —
    WITHOUT rewriting any data: the exactly-once sink already hash-
    partitions every stream by ``stable_hash(key) % P`` (the engine's
    one partitioning discipline), which is bit-identical to
    ``write_bucketed``'s layout hash, so each committed
    ``part-{pid}.parquet`` is already a bucket fragment. Files are
    hard-linked (copy fallback) into ``bucket=pid`` dirs and the
    manifest written last. Downstream bucketed joins/aggregations over
    the change stream then run with zero shuffle.

    Readers of the export see a SNAPSHOT of the epochs committed at
    export time (exactly-once isolation carries over: uncommitted
    epochs are never linked).
    """
    import re
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    part_re = re.compile(r"part-(\d+)\.parquet$")
    n_rows = 0
    buckets = set()
    for i, src in enumerate(job.sink.committed_files(stream)):
        m = part_re.search(src)
        if not m:
            raise ValueError(f"unexpected sink file name: {src}")
        pid = int(m.group(1))
        d = os.path.join(out_dir, f"bucket={pid:05d}")
        os.makedirs(d, exist_ok=True)
        dst = os.path.join(d, f"part-{i:05d}.parquet")
        try:
            if os.path.exists(dst):
                os.remove(dst)
            os.link(src, dst)
        except OSError:
            shutil.copy2(src, dst)
        n_rows += pq.read_metadata(dst).num_rows
        buckets.add(pid)
    manifest = {
        "key": key,
        "num_buckets": job.P,
        "hash": HASH_KIND,
        "rows": n_rows,
        "buckets_written": sorted(buckets),
        "source": {"out_dir": job.out_dir, "stream": stream},
    }
    tmp = os.path.join(out_dir, MANIFEST + ".inprogress")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, MANIFEST))
    return manifest


def bucketed_group_aggregate(out_dir: str, specs: dict):
    """Grouped aggregation BY THE BUCKETING KEY with zero shuffle: the
    layout already co-locates every row of a key, so each bucket
    aggregates independently (one task per bucket) and results concat.
    ``specs``: {out_col: (src_col | None, "sum" | "count" | "max" | "min")}.
    """
    import ray.data as rd

    m = read_manifest(out_dir)
    key = m["key"]

    @ray.remote
    def agg_bucket(files: list[str]) -> pa.Table:
        t = pa.concat_tables([pq.read_table(f) for f in files])
        df = t.to_pandas()
        g = df.groupby(key, as_index=False)
        out = g.size()[[key]]
        for out_col, (src, op) in specs.items():
            if op == "count":
                out[out_col] = g.size()["size"].to_numpy()
            else:
                out[out_col] = getattr(g[src], op)()[src].to_numpy()
        return pa.Table.from_pandas(out, preserve_index=False)

    refs = [agg_bucket.remote(_bucket_files(out_dir, k))
            for k in range(m["num_buckets"])
            if _bucket_files(out_dir, k)]
    return rd.from_arrow_refs(refs)
