"""Source formats beyond parquet: JSONL and CSV readers/writers.

gush reads exactly one source (the MySQL binlog tail,
reference: binlog/BinlogServerReader.scala:10-19); the epoch-parquet
stream is its graft. A data engine users switch to also needs the
common interchange formats — these wrap ``ray.data.read_json`` /
``read_csv`` with the same size-aware block policy as the parquet
``_read`` helper (Ray's default heuristic oversplits small files at
high CPU counts; measured 4-10x on this suite) and column projection
applied immediately after the read (JSON/CSV are row-major on disk —
unlike parquet the read itself can't prune, so the projection runs in
the first map stage before anything shuffles).
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd


def _size_blocks(path: str) -> dict:
    total = 0
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            total += sum(os.path.getsize(os.path.join(root, f))
                         for f in files)
    else:
        total = os.path.getsize(path)
    if total < 256 * 1024 * 1024:
        return {"override_num_blocks": max(4, min(64, total // (4 << 20) + 1))}
    return {}


def _project(ds, columns: list[str] | None):
    if columns is None:
        return ds
    return ds.map_batches(
        lambda b: b.select(columns),
        batch_format="pyarrow", zero_copy_batch=True,
    )


_COMPRESSION_SUFFIXES = {".gz": "gzip", ".zst": "zstd", ".zstd": "zstd"}


def _sniff_compression(path: str) -> str | None:
    """Compression codec from the file suffix (for a directory: from the
    first file inside — mixed-codec dirs are not a thing this supports)."""
    p = path
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            if files:
                p = os.path.join(root, sorted(files)[0])
                break
    for suf, codec in _COMPRESSION_SUFFIXES.items():
        if p.endswith(suf):
            return codec
    return None


def read_jsonl(path: str, columns: list[str] | None = None, **kw):
    """Newline-delimited JSON source (arrow JSON reader under the hood:
    vectorized parse, no per-row Python). ``.gz`` / ``.zst`` files
    decompress transparently (the common webtext interchange shapes —
    decompression is streamed per file by Arrow, so block sizes stay
    bounded by the DECOMPRESSED read, not the file size)."""
    codec = _sniff_compression(path)
    if codec and "arrow_open_stream_args" not in kw:
        kw["arrow_open_stream_args"] = {"compression": codec}
    ds = rd.read_json(path, **_size_blocks(path), **kw)
    return _project(ds, columns)


def read_csv(path: str, columns: list[str] | None = None, **kw):
    """CSV source (arrow CSV reader: vectorized parse + type inference)."""
    ds = rd.read_csv(path, **_size_blocks(path), **kw)
    return _project(ds, columns)


def write_jsonl(ds, path: str) -> str:
    """Partitioned JSONL sink (one file per block — resumable layout,
    same discipline as the parquet sinks; never one giant file)."""
    ds.write_json(path)
    return path


def write_csv(ds, path: str) -> str:
    ds.write_csv(path)
    return path


def roundtrip_table_jsonl(table: pa.Table, path: str) -> str:
    """Deterministically materialize an Arrow table as a single JSONL
    file (test/fixture helper — row order preserved). A ``.gz`` /
    ``.zst`` suffix compresses with that codec (arrow streams)."""
    import json

    os.makedirs(os.path.dirname(path), exist_ok=True)
    cols = table.column_names
    payload = "".join(
        json.dumps({c: row[c] for c in cols}, sort_keys=False) + "\n"
        for row in table.to_pylist()
    ).encode()
    codec = _sniff_compression(path)
    if codec:
        with pa.CompressedOutputStream(path, codec) as f:
            f.write(payload)
    else:
        with open(path, "wb") as f:
            f.write(payload)
    return path


def roundtrip_table_csv(table: pa.Table, path: str) -> str:
    """Deterministically materialize an Arrow table as a single CSV file
    (arrow CSV writer, header row, row order preserved)."""
    from pyarrow import csv as pacsv

    os.makedirs(os.path.dirname(path), exist_ok=True)
    pacsv.write_csv(table, path)
    return path
