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


# ---------------------------------------------- round-2 additions


def test_moving_aggregate_brute_force_parity(ray_session):
    from gush_ray.stages.analytic import moving_aggregate

    rng = np.random.RandomState(11)
    n = 200
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": rng.randint(0, 4, n).astype(np.int64),
        # coarse ts with deliberate DUPLICATES (peer rows)
        "ts": rng.randint(0, 50, n).astype(np.int64) * 10,
        "v": rng.randint(0, 100, n).astype(np.int64),
    })
    span = 100
    out = moving_aggregate(
        rd.from_pandas(df), "k", "ts", span, {"ws": "v"}, count_col="nw",
        num_partitions=4,
    ).to_pandas().sort_values(["k", "ts", "id"]).reset_index(drop=True)

    # brute force: for each row, every SAME-KEY row with ts in
    # [t-span, t] (peers included — ANSI RANGE CURRENT ROW)
    ref = df.sort_values(["k", "ts", "id"]).reset_index(drop=True)
    for i in range(len(ref)):
        m = (ref["k"] == ref.loc[i, "k"]) & \
            (ref["ts"] >= ref.loc[i, "ts"] - span) & \
            (ref["ts"] <= ref.loc[i, "ts"])
        assert out.loc[i, "nw"] == int(m.sum())
        assert out.loc[i, "ws"] == int(ref.loc[m, "v"].sum())


def test_moving_aggregate_frames_do_not_cross_keys(ray_session):
    from gush_ray.stages.analytic import moving_aggregate

    # two keys whose raw ts ranges interleave: with a huge span, each
    # row's frame must still only see its own key
    df = pd.DataFrame({
        "id": np.arange(6, dtype=np.int64),
        "k": np.array([0, 1, 0, 1, 0, 1], dtype=np.int64),
        "ts": np.array([0, 1, 2, 3, 4, 5], dtype=np.int64),
        "v": np.ones(6, dtype=np.int64),
    })
    out = moving_aggregate(
        rd.from_pandas(df), "k", "ts", 1_000_000, {"ws": "v"},
        count_col="nw", num_partitions=2,
    ).to_pandas().sort_values("id").reset_index(drop=True)
    assert out["nw"].tolist() == [1, 1, 2, 2, 3, 3]


def test_rollup_and_cube_of_empty_input_are_empty(ray_session):
    """SQL: GROUP BY ROLLUP/CUBE over zero rows yields zero rows — the
    operators must not crash on an empty (e.g. fully-filtered) input."""
    from gush_ray.stages.analytic import cube_aggregate, rollup_aggregate

    empty = rd.from_pandas(pd.DataFrame({
        "a": pd.Series(dtype="object"), "b": pd.Series(dtype="object"),
        "v": pd.Series(dtype="int64"),
    }))
    assert rollup_aggregate(empty, ["a", "b"],
                            {"n": (None, "count")}).count() == 0
    assert cube_aggregate(empty, ["a", "b"],
                          {"n": (None, "count")}).count() == 0


def test_moving_aggregate_overflow_fallback_parity(ray_session):
    """A span near 2^61 forces the per-segment fallback (the segment
    offset trick would overflow int64); results must match the strided
    path's semantics — with an effectively-infinite span every row sees
    all earlier-or-peer rows of its key."""
    from gush_ray.stages.analytic import moving_aggregate

    rng = np.random.RandomState(5)
    n = 60
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": rng.randint(0, 5, n).astype(np.int64),
        "ts": rng.randint(0, 40, n).astype(np.int64),
        "v": np.ones(n, dtype=np.int64),
    })
    out = moving_aggregate(
        rd.from_pandas(df), "k", "ts", 2**61, {"ws": "v"}, count_col="nw",
        num_partitions=2,
    ).to_pandas().sort_values(["k", "ts", "id"]).reset_index(drop=True)
    ref = df.sort_values(["k", "ts", "id"]).reset_index(drop=True)
    for i in range(len(ref)):
        m = (ref["k"] == ref.loc[i, "k"]) & (ref["ts"] <= ref.loc[i, "ts"])
        assert out.loc[i, "nw"] == int(m.sum())


def test_group_share_exact_and_sums_to_scale(ray_session):
    from gush_ray.stages.analytic import group_share

    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "id": np.arange(50, dtype=np.int64),
        "g": rng.randint(0, 3, 50).astype(np.int64),
        "v": rng.randint(1, 500, 50).astype(np.int64),
    })
    out = group_share(
        rd.from_pandas(df), ["g"], "v", num_partitions=4,
    ).to_pandas().sort_values("id").reset_index(drop=True)
    ref = df.sort_values("id").reset_index(drop=True)
    totals = ref.groupby("g")["v"].transform("sum")
    assert (out["share_bp"].to_numpy()
            == (ref["v"].to_numpy() * 10_000) // totals.to_numpy()).all()
    # floor-division share never exceeds the scale in total
    assert (out.groupby("g")["share_bp"].sum() <= 10_000).all()


def test_group_zscore_zero_variance_group(ray_session):
    from gush_ray.stages.analytic import group_zscore

    df = pd.DataFrame({
        "id": np.arange(6, dtype=np.int64),
        "g": np.array([0, 0, 0, 1, 1, 1], dtype=np.int64),
        "v": np.array([5, 5, 5, 1, 2, 3], dtype=np.int64),
    })
    out = group_zscore(
        rd.from_pandas(df), "g", "v", num_partitions=2,
    ).to_pandas().sort_values("id").reset_index(drop=True)
    assert (out.loc[out["g"] == 0, "z"] == 0).all()
    zs = out.loc[out["g"] == 1, "z"].to_numpy()
    assert zs[0] < 0 and abs(zs[1]) < 1e-9 and zs[2] > 0


def test_levenshtein_batch_vs_reference_dp():
    from gush_ray.stages.strings import levenshtein_batch

    def ref_lev(a, b):
        la, lb = len(a), len(b)
        prev = list(range(lb + 1))
        for j in range(1, la + 1):
            cur = [j] + [0] * lb
            for k in range(1, lb + 1):
                cur[k] = min(prev[k] + 1, cur[k - 1] + 1,
                             prev[k - 1] + (a[j - 1] != b[k - 1]))
            prev = cur
        return prev[lb]

    rng = np.random.RandomState(7)
    alphabet = list("abcdef ")
    cases = [("", ""), ("", "abc"), ("abc", ""), ("abc", "abc"),
             ("kitten", "sitting"), ("flaw", "lawn"), ("résumé", "resume")]
    for _ in range(60):
        la, lb = rng.randint(0, 12, 2)
        a = "".join(rng.choice(alphabet, la))
        b = "".join(rng.choice(alphabet, lb))
        cases.append((a, b))
    got = levenshtein_batch([c[0] for c in cases], [c[1] for c in cases])
    want = np.array([ref_lev(a, b) for a, b in cases], dtype=np.int64)
    assert (got == want).all(), list(zip(cases, got, want))


def test_prefix_blocked_editdist_pairs(ray_session):
    from gush_ray.stages.strings import prefix_blocked_editdist_pairs

    docs = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": [
            "the quick brown fox jumps",
            "the quick brown fox jumped",   # 16-char block matches 0
            "the quick brown dog sits",     # block matches, dist > 4 from 0? no: within
            "completely different text",
            "the quick brawn fox jumps",    # block differs at char 11
        ],
    })
    out = prefix_blocked_editdist_pairs(
        rd.from_pandas(docs), "doc_id", "text",
        block_len=16, cmp_len=40, max_dist=4, num_partitions=2,
    ).to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (0, 1) in pairs
    assert all(a < b for a, b in pairs)
    # doc 4's 16-char prefix differs -> never a candidate
    assert not any(4 in p for p in pairs)
    # every reported dist honors the bound
    assert (out["dist"] <= 4).all()
