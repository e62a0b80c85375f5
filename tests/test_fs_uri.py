"""URI / filesystem seam: file:// end-to-end through the streaming job,
and the exactly-once sink protocol over a non-POSIX fsspec backend."""

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gush_ray.fs import FsspecFS, LocalFS, get_fs, normalize_uri


def test_normalize_uri():
    assert normalize_uri("/a/b") == "/a/b"
    assert normalize_uri("file:///a/b") == "/a/b"
    assert normalize_uri("file://") == "/"
    assert normalize_uri("memory://x/y") == "memory://x/y"
    assert normalize_uri("s3://bucket/key") == "s3://bucket/key"


def test_get_fs_dispatch():
    fs, p = get_fs("file:///tmp/x")
    assert isinstance(fs, LocalFS) and p == "/tmp/x"
    fs, p = get_fs("memory://mem/x")
    assert isinstance(fs, FsspecFS) and p == "memory://mem/x"
    assert fs.join("memory://mem/x", "a", "b") == "memory://mem/x/a/b"


def test_streaming_job_accepts_file_uris(tmp_path):
    """file:// for pages_dir AND out_dir: identical output to plain
    paths (the URI collapses to the local fast path)."""
    from gush_ray.datagen import write_pages_dir
    from gush_ray.pipelines.epoch_loop import StreamingJob

    pages = str(tmp_path / "pages")
    write_pages_dir(pages, n_urls=200, seed=31, n_epochs=3)

    ja = StreamingJob(pages, str(tmp_path / "out_plain"), run_id="uriA",
                      num_partitions=2)
    ja.run()
    jb = StreamingJob(f"file://{pages}", f"file://{tmp_path}/out_uri",
                      run_id="uriB", num_partitions=2)
    jb.run()
    for stream in ("changes", "windows", "late"):
        a = ja.read_output(stream)
        b = jb.read_output(stream)
        cols = list(a.columns)
        pd.testing.assert_frame_equal(
            a[cols].sort_values(cols).reset_index(drop=True),
            b[cols].sort_values(cols).reset_index(drop=True),
        )


def test_exactly_once_sink_over_memory_backend():
    """The full sink protocol — atomic part writes, manifest commits,
    resume point, committed-file listing, reader — over fsspec's
    in-memory filesystem (the s3:// stand-in this sandbox can run)."""
    import pyarrow.parquet as pq

    from gush_ray.sinks.exactly_once import ExactlyOnceSink

    base = "memory://sinktest/out"
    fs, _ = get_fs(base)
    fs.rmtree(base)

    sink = ExactlyOnceSink(base)
    t0 = pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    t1 = pa.table({"k": [4, 5], "v": ["d", "e"]})
    r0 = ExactlyOnceSink.write_part(base, "changes", 0, 0, t0)
    r1 = ExactlyOnceSink.write_part(base, "changes", 1, 0, t1)
    assert r0["rows"] == 3 and r1["rows"] == 2
    # idempotent replay: same slot overwritten, not duplicated
    ExactlyOnceSink.write_part(base, "changes", 0, 0, t0)

    sink.commit_epoch(0, watermark_us=123, partitions=[{"pid": 0}])
    assert sink.committed_epochs() == [0]
    assert sink.last_contiguous_epoch() == 0
    # epoch 1 data exists but is NOT committed: readers must ignore it
    files = sink.committed_files("changes")
    assert len(files) == 1 and files[0].startswith("memory://")
    with fs.open(files[0], "rb") as f:
        back = pq.read_table(f)
    assert back.num_rows == 3

    sink.commit_epoch(1, watermark_us=456, partitions=[{"pid": 0}])
    assert sink.last_contiguous_epoch() == 1
    assert len(sink.committed_files("changes")) == 2
    assert sink.read_manifest(1)["watermark_us"] == 456

    sink.commit_final({"flushed": True})
    assert sink.final_committed() and sink.read_final()["flushed"]
    fs.rmtree(base)


def test_memory_backend_replace_overwrites():
    fs, _ = get_fs("memory://repl/x")
    fs.makedirs("memory://repl")
    with fs.open("memory://repl/a", "wb") as f:
        f.write(b"old")
    with fs.open("memory://repl/b", "wb") as f:
        f.write(b"new")
    fs.replace("memory://repl/b", "memory://repl/a")
    with fs.open("memory://repl/a", "rb") as f:
        assert f.read() == b"new"
    assert not fs.exists("memory://repl/b")
    fs.rmtree("memory://repl")


def test_compact_and_fsck_over_memory_backend():
    """compact + fsck run against a remote (fsspec) sink: committed
    epochs merge into a compact slot (written in place — the record is
    the cutover; no directory rename exists on object stores), readers
    keep seeing identical rows, and the lineage audit stays green."""
    import pyarrow.parquet as pq

    from gush_ray.compact import compact_stream, compaction_records
    from gush_ray.fsck import audit
    from gush_ray.sinks.exactly_once import ExactlyOnceSink

    base = "memory://cmpfsck/out"
    fs, _ = get_fs(base)
    fs.rmtree(base)
    sink = ExactlyOnceSink(base)
    total = 0
    for e in range(3):
        t = pa.table({"k": list(range(e * 5, e * 5 + 5)),
                      "v": [f"r{e}"] * 5})
        ExactlyOnceSink.write_part(base, "changes", e, 0, t)
        total += 5
        sink.commit_epoch(e, watermark_us=e, partitions=[
            {"pid": 0, "inserts": 5, "updates": 0}])

    def read_rows():
        out = 0
        for f in sink.committed_files("changes"):
            with fs.open(f, "rb") as rf:
                out += pq.read_table(rf).num_rows
        return out

    assert read_rows() == total
    rep = audit(base)
    assert rep["ok"], rep["problems"]

    r = compact_stream(base, "changes")
    assert r["compacted"] and (r["from"], r["to"]) == (0, 2)
    assert compaction_records(base)["changes"] == [(0, 2)]
    assert read_rows() == total          # reader cutover, same rows
    files = sink.committed_files("changes")
    assert len(files) == 1 and "compact=00000-00002" in files[0]
    rep = audit(base)
    assert rep["ok"], rep["problems"]
    assert rep["compactions"]["changes"] == [[0, 2]]
    fs.rmtree(base)
