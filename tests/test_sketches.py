"""Sketch operators: heavy hitters (bounded memory, count bounds) and
HyperLogLog approximate distinct."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from gush_ray.stages.sketches import HyperLogLog, approx_distinct, heavy_hitters


def test_heavy_hitters_exact_when_capacity_suffices():
    rng = np.random.RandomState(1)
    vals = rng.choice([f"u{i}" for i in range(20)], size=5000,
                      p=np.linspace(1, 40, 20) / np.linspace(1, 40, 20).sum())
    ds = rd.from_pandas(pd.DataFrame({"k": vals}))
    got = heavy_hitters(ds, "k", k=5, capacity=64)
    exact = (pd.Series(vals).value_counts().reset_index())
    exact.columns = ["k", "n"]
    exact = exact.sort_values(["n", "k"], ascending=[False, True]).head(5)
    assert got["k"].tolist() == exact["k"].tolist()
    assert got["n"].tolist() == exact["n"].tolist()
    assert (got["n_upper"] == got["n"]).all()  # nothing dropped → exact


def test_heavy_hitters_bounds_under_truncation():
    """With capacity below per-batch distinct, the true count must lie
    within [n, n_upper] and the dominant key must survive."""
    rng = np.random.RandomState(2)
    tail = [f"t{i}" for i in range(500)]
    vals = np.concatenate([
        np.repeat("HOT", 3000),
        rng.choice(tail, size=2000),
    ])
    rng.shuffle(vals)
    ds = rd.from_pandas(pd.DataFrame({"k": vals})).repartition(8)
    got = heavy_hitters(ds, "k", k=3, capacity=16)
    hot = got[got["k"] == "HOT"]
    assert len(hot) == 1
    n, hi = int(hot["n"].iloc[0]), int(hot["n_upper"].iloc[0])
    assert n <= 3000 <= hi


def test_heavy_hitters_counts_null_group():
    """NULL is a countable group (SQL GROUP BY semantics): a dominant
    null value must appear in the top-k, distinct from the dropped-mass
    carrier rows."""
    vals = ["a"] * 10 + [None] * 30 + ["b"] * 5
    ds = rd.from_pandas(pd.DataFrame({"k": pd.Series(vals, dtype="object")}))
    got = heavy_hitters(ds, "k", k=3, capacity=64)
    assert got["n"].tolist() == [30, 10, 5]
    assert pd.isna(got["k"].iloc[0])
    assert got["k"].tolist()[1:] == ["a", "b"]
    assert (got["n_upper"] == got["n"]).all()


def test_hll_accuracy_and_merge():
    for true_n in (100, 5_000, 200_000):
        h = HyperLogLog(p=12)
        h.add(np.arange(true_n))
        est = h.estimate()
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)
    # merge == union
    a, b = HyperLogLog(12), HyperLogLog(12)
    a.add(np.arange(0, 60_000))
    b.add(np.arange(40_000, 100_000))
    est = a.merge(b).estimate()
    assert abs(est - 100_000) / 100_000 < 0.05
    # state round-trip
    c = HyperLogLog.from_state(12, a.state())
    assert c.estimate() == a.estimate()


def test_approx_distinct_vs_exact(sf_dir):
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    est = approx_distinct(ev, "user_id", p=12)
    exact = ev.unique("user_id")
    exact_n = len(exact)
    assert abs(est - exact_n) / max(exact_n, 1) < 0.05
