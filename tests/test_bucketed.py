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
