"""Durable hash-bucketed layout + shuffle-free consumers."""

import json
import os

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from gush_ray.stages.bucketed import (
    bucketed_group_aggregate,
    bucketed_join,
    read_bucket,
    read_manifest,
    write_bucketed,
)


@pytest.fixture()
def tables(tmp_path):
    rng = np.random.RandomState(3)
    left = pd.DataFrame({
        "k": rng.randint(0, 200, size=2_000),
        "v": rng.randint(0, 100, size=2_000),
    })
    right = pd.DataFrame({
        "k": np.arange(200),
        "tag": [f"t{i % 7}" for i in range(200)],
    })
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    write_bucketed(rd.from_pandas(left), da, "k", num_buckets=8)
    write_bucketed(rd.from_pandas(right), db, "k", num_buckets=8)
    return left, right, da, db


def test_layout_and_manifest(tables):
    left, _right, da, _db = tables
    m = read_manifest(da)
    assert m["key"] == "k" and m["num_buckets"] == 8
    assert m["rows"] == len(left)
    # every row of a key lands in exactly one bucket, together
    total = 0
    seen_keys = {}
    for k in range(8):
        t = read_bucket(da, k)
        if t is None:
            continue
        total += t.num_rows
        for key in set(t["k"].to_pylist()):
            assert seen_keys.setdefault(key, k) == k, "key split across buckets"
    assert total == len(left)


def test_bucketed_join_matches_pandas(tables):
    left, right, da, db = tables
    got = (bucketed_join(da, db, on="k").to_pandas()
           .sort_values(["k", "v"]).reset_index(drop=True))
    want = (left.merge(right, on="k")
            .sort_values(["k", "v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["k", "v", "tag"]],
                                  want[["k", "v", "tag"]])


def test_bucketed_join_rejects_mismatched_layouts(tables, tmp_path):
    left, _right, da, _db = tables
    other = str(tmp_path / "other")
    write_bucketed(rd.from_pandas(left), other, "k", num_buckets=4)
    with pytest.raises(ValueError, match="num_buckets"):
        bucketed_join(da, other, on="k")
    with pytest.raises(ValueError, match="bucketing key"):
        bucketed_join(da, da, on="v")


def test_bucketed_group_aggregate_matches_pandas(tables):
    left, _right, da, _db = tables
    got = (bucketed_group_aggregate(
        da, {"n": (None, "count"), "sv": ("v", "sum")})
        .to_pandas().sort_values("k").reset_index(drop=True))
    want = left.groupby("k", as_index=False).agg(
        n=("v", "size"), sv=("v", "sum")).sort_values("k").reset_index(
        drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n": "int64", "sv": "int64"}),
        want.astype({"n": "int64", "sv": "int64"}))


def test_rewrite_is_idempotent(tables):
    left, _right, da, _db = tables
    before = (bucketed_group_aggregate(da, {"n": (None, "count")})
              .to_pandas().sort_values("k").reset_index(drop=True))
    write_bucketed(rd.from_pandas(left), da, "k", num_buckets=8)  # again
    after = (bucketed_group_aggregate(da, {"n": (None, "count")})
             .to_pandas().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(before, after)


def test_crashed_layout_invisible(tmp_path):
    d = str(tmp_path / "crashed")
    os.makedirs(os.path.join(d, "bucket=00000"))
    with pytest.raises(ValueError, match="not a bucketed table"):
        read_manifest(d)


def test_export_stream_bucketed_joins_without_shuffle(tmp_path):
    """The exactly-once sink's per-partition files ARE bucket fragments
    (same stable hash): exporting the changes stream as a bucketed table
    (hard links, no rewrite) lets it join a bucketed dimension with zero
    shuffle, matching the plain pandas join."""
    from gush_ray.datagen import write_pages_dir
    from gush_ray.pipelines.epoch_loop import StreamingJob
    from gush_ray.stages.bucketed import export_stream_bucketed

    pages = str(tmp_path / "pages")
    write_pages_dir(pages, n_urls=300, seed=23, n_epochs=3)
    job = StreamingJob(pages, str(tmp_path / "out"), run_id="bkt",
                       num_partitions=8)
    job.run()
    changes = job.read_output("changes")

    exp = str(tmp_path / "changes_bucketed")
    m = export_stream_bucketed(job, "changes", exp, key="url")
    assert m["num_buckets"] == 8 and m["rows"] == len(changes)

    # dimension keyed by url, bucketed with the SAME layout params
    dim = pd.DataFrame({"url": changes["url"].unique()})
    dim["site_len"] = dim["url"].str.len()
    dim_dir = str(tmp_path / "dim_bucketed")
    write_bucketed(rd.from_pandas(dim), dim_dir, "url", num_buckets=8)

    got = (bucketed_join(exp, dim_dir, on="url").to_pandas()
           .sort_values(["url", "version"]).reset_index(drop=True))
    want = (changes.merge(dim, on="url")
            .sort_values(["url", "version"]).reset_index(drop=True))
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["url", "version", "site_len"]],
        want[["url", "version", "site_len"]], check_dtype=False)


def test_export_after_compaction(tmp_path):
    """Compaction rewrites epochs into compact=A-B/part-{pid}.parquet —
    the per-partition file-name contract survives, so a bucketed export
    of a compacted stream still buckets correctly."""
    from gush_ray.compact import compact_stream
    from gush_ray.datagen import write_pages_dir
    from gush_ray.pipelines.epoch_loop import StreamingJob
    from gush_ray.stages.bucketed import export_stream_bucketed

    pages = str(tmp_path / "pages")
    write_pages_dir(pages, n_urls=200, seed=29, n_epochs=3)
    job = StreamingJob(pages, str(tmp_path / "out"), run_id="bc",
                       num_partitions=4)
    job.run()
    changes = job.read_output("changes")
    compact_stream(str(tmp_path / "out"), "changes")

    exp = str(tmp_path / "exp")
    m = export_stream_bucketed(job, "changes", exp, key="url")
    assert m["rows"] == len(changes)
    # keys still co-located per bucket under the stable hash
    import numpy as np

    from gush_ray.stages.bucketed import read_bucket
    from gush_ray.stages.shuffle import stable_hash

    for k in m["buckets_written"]:
        t = read_bucket(exp, k)
        urls = np.asarray(t["url"].to_pylist(), dtype=object)
        assert (stable_hash(urls) % np.uint64(4) == k).all()
