"""Unit tests for the analytic (window-function) stage family —
semantics edges the oracle suite doesn't isolate: NTILE remainder
handling, rollup level conservation, pivot value closure, running ops,
and Gopher-rule parity with a brute-force reference."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from gush_ray.stages.analytic import (
    lag_columns,
    ntile_per_key,
    pivot_counts,
    rank_per_key,
    rollup_aggregate,
    running_aggregate,
)
from gush_ray.stages.text import (
    GOPHER_STOPWORDS,
    gopher_rules_batch,
)


def _events(n=40, keys=3, seed=5):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": rng.randint(0, keys, n).astype(np.int64),
        "v": rng.randint(0, 100, n).astype(np.int64),
    })


def test_running_aggregate_ops(ray_session):
    df = _events()
    out = running_aggregate(
        rd.from_pandas(df), "k", ["id"],
        {"rs": ("v", "sum"), "rmin": ("v", "min"),
         "rmax": ("v", "max"), "rc": ("v", "count")},
    ).to_pandas().sort_values("id").reset_index(drop=True)
    ref = df.sort_values("id").reset_index(drop=True)
    g = ref.groupby("k", sort=False)["v"]
    assert (out["rs"].to_numpy() == g.cumsum().to_numpy()).all()
    assert (out["rmin"].to_numpy() == g.cummin().to_numpy()).all()
    assert (out["rmax"].to_numpy() == g.cummax().to_numpy()).all()
    assert (out["rc"].to_numpy() == (g.cumcount() + 1).to_numpy()).all()
    assert (out["rn"].to_numpy() == (g.cumcount() + 1).to_numpy()).all()


def test_lag_columns_first_row_null(ray_session):
    df = _events()
    out = lag_columns(
        rd.from_pandas(df), "k", ["id"],
        lag_specs={"prev_v": "v"}, delta_specs={"dv": "v"},
    ).to_pandas().sort_values("id").reset_index(drop=True)
    ref = df.sort_values("id").reset_index(drop=True)
    prev = ref.groupby("k", sort=False)["v"].shift(1)
    assert out["prev_v"].isna().equals(prev.isna())
    mask = prev.notna()
    assert (out.loc[mask, "prev_v"].to_numpy() == prev[mask].to_numpy()).all()
    assert np.allclose(out.loc[mask, "dv"],
                       (ref["v"] - prev)[mask])


def test_ntile_matches_sql_semantics(ray_session):
    # 10 rows into 4 tiles -> sizes 3,3,2,2 (first r=2 buckets get +1)
    df = pd.DataFrame({"id": np.arange(10, dtype=np.int64),
                       "k": np.zeros(10, dtype=np.int64)})
    out = ntile_per_key(rd.from_pandas(df), "k", ["id"], 4).to_pandas()
    out = out.sort_values("id")
    assert out["tile"].tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]


def test_ntile_fewer_rows_than_buckets(ray_session):
    df = pd.DataFrame({"id": np.arange(2, dtype=np.int64),
                       "k": np.zeros(2, dtype=np.int64)})
    out = ntile_per_key(rd.from_pandas(df), "k", ["id"], 5).to_pandas()
    assert sorted(out["tile"].tolist()) == [1, 2]


def test_rank_ties_share_rank(ray_session):
    df = pd.DataFrame({
        "id": np.arange(5, dtype=np.int64),
        "k": np.zeros(5, dtype=np.int64),
        "v": np.array([10, 20, 20, 30, 30], dtype=np.int64),
    })
    out = rank_per_key(rd.from_pandas(df), "k", "v",
                       ascending=False).to_pandas().sort_values("id")
    assert out["rnk"].tolist() == [5, 3, 3, 1, 1]
    assert out["drnk"].tolist() == [3, 2, 2, 1, 1]


def test_rollup_levels_conserve(ray_session):
    df = pd.DataFrame({
        "a": ["x", "x", "y", "y", "y"],
        "b": ["p", "q", "p", "p", None],
        "v": np.array([1, 2, 3, 4, 5], dtype=np.int64),
    })
    out = rollup_aggregate(
        rd.from_pandas(df), ["a", "b"],
        {"n": (None, "count"), "s": ("v", "sum")},
    ).to_pandas()
    grand = out[out["a"].isna() & out["b"].isna()]
    assert len(grand) == 1
    assert int(grand["n"].iloc[0]) == 5 and int(grand["s"].iloc[0]) == 15
    # rows with b null = the a-level rollups PLUS the true-null finest
    # group (y, NULL) — indistinguishable without GROUPING(), exactly as
    # in SQL ROLLUP output
    b_null = out[out["a"].notna() & out["b"].isna()]
    assert sorted(b_null["a"]) == ["x", "y", "y"]
    assert int(b_null["n"].sum()) == 6  # a-level 5 + true-null group 1
    assert int(out["n"].sum()) == 3 * 5  # three levels, each conserves
    assert int(out["s"].sum()) == 3 * 15


def test_pivot_counts_closed_values(ray_session):
    df = pd.DataFrame({
        "u": np.array([1, 1, 1, 2, 2], dtype=np.int64),
        "t": ["a", "a", "b", "b", "zz"],  # zz not in the closed list
    })
    out = pivot_counts(rd.from_pandas(df), "u", "t", ["a", "b"]
                       ).to_pandas().sort_values("u").reset_index(drop=True)
    assert out["n_a"].tolist() == [2, 0]
    assert out["n_b"].tolist() == [1, 1]
    # n_total counts only the closed value list (explicit FILTER analogy)
    assert out["n_total"].tolist() == [3, 1]


def test_gopher_rules_brute_force_parity():
    texts = [
        "the cat sat on a mat " * 20,          # long enough, stopwords
        "word " * 10,                           # too short
        None,                                   # null text
        "x" * 400,                              # one huge word: mwl out
        ("the of and " + "lexicon " * 60),      # mixed
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = gopher_rules_batch(df)
    for i, t in enumerate(texts):
        t = t or ""
        words = t.split()
        n_words = len(words)
        n_stop = sum(1 for w in t.lower().split() if w in GOPHER_STOPWORDS)
        mwl = (sum(len(w) for w in words) / n_words) if n_words else 0.0
        assert out["n_words"].iloc[i] == n_words
        assert out["n_stop"].iloc[i] == n_stop
        assert abs(out["mean_word_len"].iloc[i] - mwl) < 1e-12
        expect = (50 <= n_words <= 100_000 and 3 <= mwl <= 10
                  and n_stop >= 2)
        assert bool(out["gopher_pass"].iloc[i]) == expect
