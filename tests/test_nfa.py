"""NFA matcher unit tests (semantics pinned before oracle comparison)."""

import numpy as np
import pandas as pd
import pytest

from gush_ray.stages.nfa import NFARunner, Pattern, Step


def mkpat(within=100):
    return Pattern(
        steps=(Step("a", "etype", "A"), Step("b", "etype", "B")),
        within_us=within,
        key="k",
        ts_col="ts",
        id_col="eid",
    )


def run(df, pat):
    df = df.sort_values(["k", "ts"], kind="mergesort")
    return NFARunner(pat).process_sorted(df)


def test_simple_sequence():
    df = pd.DataFrame(
        {"k": ["u", "u"], "ts": [10, 50], "etype": ["A", "B"], "eid": [1, 2]}
    )
    out = run(df, mkpat())
    assert len(out) == 1
    assert out.iloc[0].to_dict() == {
        "k": "u", "a_id": 1, "b_id": 2, "start_us": 10, "end_us": 50
    }


def test_all_pairs_semantics():
    # 2 A's then 2 B's within window -> 4 pairs (SQL self-join parity)
    df = pd.DataFrame(
        {
            "k": ["u"] * 4,
            "ts": [10, 20, 30, 40],
            "etype": ["A", "A", "B", "B"],
            "eid": [1, 2, 3, 4],
        }
    )
    out = run(df, mkpat())
    assert len(out) == 4
    assert set(zip(out.a_id, out.b_id)) == {(1, 3), (1, 4), (2, 3), (2, 4)}


def test_within_bound():
    df = pd.DataFrame(
        {"k": ["u", "u"], "ts": [10, 200], "etype": ["A", "B"], "eid": [1, 2]}
    )
    assert len(run(df, mkpat(within=100))) == 0
    assert len(run(df, mkpat(within=190))) == 1


def test_skip_till_any_match():
    # non-matching event between A and B is skipped
    df = pd.DataFrame(
        {
            "k": ["u"] * 3,
            "ts": [10, 20, 30],
            "etype": ["A", "X", "B"],
            "eid": [1, 2, 3],
        }
    )
    assert len(run(df, mkpat())) == 1


def test_keys_isolated():
    df = pd.DataFrame(
        {
            "k": ["u", "v"],
            "ts": [10, 20],
            "etype": ["A", "B"],
            "eid": [1, 2],
        }
    )
    assert len(run(df, mkpat())) == 0


def test_equal_ts_no_pair():
    df = pd.DataFrame(
        {"k": ["u", "u"], "ts": [10, 10], "etype": ["A", "B"], "eid": [1, 2]}
    )
    assert len(run(df, mkpat())) == 0


def test_three_step():
    pat = Pattern(
        steps=(
            Step("a", "etype", "A"),
            Step("b", "etype", "B"),
            Step("c", "etype", "C"),
        ),
        within_us=100, key="k", ts_col="ts", id_col="eid",
    )
    df = pd.DataFrame(
        {
            "k": ["u"] * 4,
            "ts": [10, 20, 30, 40],
            "etype": ["A", "B", "C", "C"],
            "eid": [1, 2, 3, 4],
        }
    )
    out = run(df, pat)
    assert set(zip(out.a_id, out.b_id, out.c_id)) == {(1, 2, 3), (1, 2, 4)}


def test_cross_batch_state():
    pat = mkpat()
    r = NFARunner(pat)
    b1 = pd.DataFrame({"k": ["u"], "ts": [10], "etype": ["A"], "eid": [1]})
    b2 = pd.DataFrame({"k": ["u"], "ts": [50], "etype": ["B"], "eid": [2]})
    assert len(r.process_sorted(b1)) == 0
    out = r.process_sorted(b2)
    assert len(out) == 1 and out.iloc[0].b_id == 2


def test_prune_drops_expired():
    pat = mkpat(within=100)
    r = NFARunner(pat)
    r.process_sorted(
        pd.DataFrame({"k": ["u"], "ts": [10], "etype": ["A"], "eid": [1]})
    )
    r.prune(watermark_us=200)
    assert r.partials == {}


def test_strict_contiguity():
    pat = Pattern(
        steps=(Step("a", "etype", "A"), Step("b", "etype", "B")),
        within_us=1000, key="k", ts_col="ts", id_col="eid",
        contiguity="strict",
    )
    # A X B: the X kills the run under strict contiguity
    df = pd.DataFrame(
        {"k": ["u"] * 3, "ts": [10, 20, 30],
         "etype": ["A", "X", "B"], "eid": [1, 2, 3]}
    )
    assert len(run(df, pat)) == 0
    # A B: consecutive -> match
    df2 = pd.DataFrame(
        {"k": ["u"] * 2, "ts": [10, 20], "etype": ["A", "B"], "eid": [1, 2]}
    )
    out = run(df2, pat)
    assert len(out) == 1 and out.iloc[0]["b_id"] == 2
    # A A B: only the second A pairs (first killed by second)
    df3 = pd.DataFrame(
        {"k": ["u"] * 3, "ts": [10, 20, 30],
         "etype": ["A", "A", "B"], "eid": [1, 2, 3]}
    )
    out3 = run(df3, pat)
    assert set(zip(out3.a_id, out3.b_id)) == {(2, 3)}


def test_kleene_plus_all_runs():
    pat = Pattern(
        steps=(Step("a", "etype", "A", quantifier="+"),
               Step("b", "etype", "B")),
        within_us=1000, key="k", ts_col="ts", id_col="eid",
    )
    df = pd.DataFrame(
        {"k": ["u"] * 3, "ts": [10, 20, 30],
         "etype": ["A", "A", "B"], "eid": [1, 2, 3]}
    )
    out = run(df, pat)
    # all runs: [A1]->B, [A1,A2]->B, [A2]->B
    assert sorted(zip(out.a_id, out.a_n, out.b_id)) == [
        (1, 1, 3), (1, 2, 3), (2, 1, 3)
    ]


def test_kleene_plus_final_step_extends():
    pat = Pattern(
        steps=(Step("a", "etype", "A"),
               Step("b", "etype", "B", quantifier="+")),
        within_us=1000, key="k", ts_col="ts", id_col="eid",
    )
    df = pd.DataFrame(
        {"k": ["u"] * 3, "ts": [10, 20, 30],
         "etype": ["A", "B", "B"], "eid": [1, 2, 3]}
    )
    out = run(df, pat)
    # emits on completion AND on each extension; all-runs also starts a
    # fresh B-run from the second B (skip-till-any-match)
    assert sorted(zip(out.a_id, out.b_id, out.b_n)) == [
        (1, 2, 1), (1, 2, 2), (1, 3, 1)
    ]


def test_equal_ts_consecutive_steps_never_chain():
    # oracle parity: SQL requires strictly increasing ts between steps
    pat = Pattern(
        steps=(Step("a", "etype", "A"), Step("b", "etype", "B"),
               Step("c", "etype", "C")),
        within_us=1000, key="k", ts_col="ts", id_col="eid",
    )
    df = pd.DataFrame(
        {"k": ["u"] * 3, "ts": [1, 5, 5],
         "etype": ["A", "B", "C"], "eid": [1, 2, 3]}
    )
    assert len(run(df, pat)) == 0
    df2 = pd.DataFrame(
        {"k": ["u"] * 3, "ts": [1, 5, 6],
         "etype": ["A", "B", "C"], "eid": [1, 2, 3]}
    )
    assert len(run(df2, pat)) == 1


def test_kleene_hot_key_bounded():
    """Kleene '+' all-runs branching is exponential; the per-key partial
    cap must keep a hot key (60+ repeats) fast and bounded."""
    import time

    pat = Pattern(
        steps=(Step("a", "etype", "A"), Step("b", "etype", "B",
                                             quantifier="+")),
        within_us=10_000, key="k", ts_col="ts", id_col="eid",
    )
    n = 60
    df = pd.DataFrame(
        {"k": ["u"] * (n + 1), "ts": range(n + 1),
         "etype": ["A"] + ["B"] * n, "eid": range(n + 1)}
    )
    t0 = time.perf_counter()
    out = run(df, pat)
    assert time.perf_counter() - t0 < 5.0
    r = NFARunner(pat)
    r.process_sorted(df.sort_values(["k", "ts"]))
    assert all(len(v) <= pat.max_partials for v in r.partials.values())
    assert len(out) > 0


def _random_stream(seed, n=4000, n_keys=300, within=5_000):
    rng = np.random.RandomState(seed)
    df = pd.DataFrame({
        "url": [f"k{v}" for v in rng.randint(0, n_keys, n)],
        "ts_us": np.sort(rng.randint(0, 200_000, n)).astype("int64"),
        "change_kind": rng.choice(["insert", "update", "other"], n,
                                  p=[0.4, 0.4, 0.2]),
        "event_id": np.arange(n, dtype="int64"),
    })
    return df.sort_values(["url", "ts_us"], kind="mergesort")


def _two_step_pattern(within=5_000, cap=64):
    return Pattern(
        steps=(Step("a", "change_kind", "insert"),
               Step("b", "change_kind", "update")),
        within_us=within, key="url", ts_col="ts_us", id_col="event_id",
        max_partials=cap,
    )


def _norm_matches(df):
    cols = list(df.columns)
    return df.sort_values(cols, kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_two_step_fast_path_matches_loop(seed):
    """The vectorized 2-step fast path must emit the identical match set
    AND leave identical partial state as the event loop — across
    multiple batches (cross-epoch partials included)."""
    pat = _two_step_pattern()
    fast, slow = NFARunner(pat), NFARunner(pat)
    slow._two_step_fast = lambda *a, **kw: None  # force the loop
    for epoch in range(3):
        df = _random_stream(seed * 10 + epoch)
        out_f = fast.process_sorted(df)
        out_s = slow.process_sorted(df)
        pd.testing.assert_frame_equal(_norm_matches(out_f),
                                      _norm_matches(out_s))
        assert len(out_f) > 0 or epoch == 99  # non-trivial
        # identical live-partial state (the loop leaves empty lists for
        # keys it visited; empty == absent)
        fnon = {k for k, v in fast.partials.items() if v}
        snon = {k for k, v in slow.partials.items() if v}
        assert fnon == snon
        for k in fnon:
            pf = sorted((p.step_idx, p.start_us, p.captured)
                        for p in fast.partials[k])
            ps = sorted((p.step_idx, p.start_us, p.captured)
                        for p in slow.partials[k])
            assert pf == ps, k


def test_two_step_fast_path_hot_key_falls_back_to_loop():
    """A key that would exceed max_partials must take the loop (the cap's
    drop semantics) — outputs equal the loop's on the whole batch."""
    pat = _two_step_pattern(within=1_000_000, cap=8)
    rng = np.random.RandomState(5)
    n = 500
    df = pd.DataFrame({
        "url": ["hot"] * n,
        "ts_us": np.arange(n, dtype="int64") * 10,
        "change_kind": rng.choice(["insert", "update"], n),
        "event_id": np.arange(n, dtype="int64"),
    })
    fast, slow = NFARunner(pat), NFARunner(pat)
    slow._two_step_fast = lambda *a, **kw: None
    out_f = fast.process_sorted(df)
    out_s = slow.process_sorted(df)
    pd.testing.assert_frame_equal(_norm_matches(out_f),
                                  _norm_matches(out_s))
    assert fast.truncated == slow.truncated > 0


# ------------------------------------------------- negation (notFollowedBy)

def negpat(within=100):
    return Pattern(
        steps=(Step("a", "etype", "A"),
               Step("c", "etype", "C", negated=True),
               Step("b", "etype", "B")),
        within_us=within, key="k", ts_col="ts", id_col="eid",
    )


def test_negation_kills_run():
    df = pd.DataFrame(
        {"k": ["u"] * 3, "ts": [10, 20, 30],
         "etype": ["A", "C", "B"], "eid": [1, 2, 3]}
    )
    assert len(run(df, negpat())) == 0


def test_negation_without_blocker_matches():
    df = pd.DataFrame(
        {"k": ["u"] * 2, "ts": [10, 30], "etype": ["A", "B"],
         "eid": [1, 2]}
    )
    out = run(df, negpat())
    assert set(zip(out.a_id, out.b_id)) == {(1, 2)}


def test_negation_strictly_between():
    # C at the same ts as B does not kill (oracle: c.ts < b.ts strict);
    # C at the same ts as A does not kill (c.ts > a.ts strict)
    df = pd.DataFrame(
        {"k": ["u"] * 4, "ts": [10, 10, 30, 30],
         "etype": ["A", "C", "C", "B"], "eid": [1, 2, 3, 4]}
    )
    out = run(df, negpat())
    assert set(zip(out.a_id, out.b_id)) == {(1, 4)}


def test_negation_kills_only_earlier_runs():
    # A1 C A2 B: (A1,B) killed, (A2,B) survives
    df = pd.DataFrame(
        {"k": ["u"] * 4, "ts": [10, 20, 25, 30],
         "etype": ["A", "C", "A", "B"], "eid": [1, 2, 3, 4]}
    )
    out = run(df, negpat())
    assert set(zip(out.a_id, out.b_id)) == {(3, 4)}


def test_negation_cross_batch_state():
    pat = negpat()
    r = NFARunner(pat)
    r.process_sorted(pd.DataFrame(
        {"k": ["u"], "ts": [10], "etype": ["A"], "eid": [1]}))
    r.process_sorted(pd.DataFrame(
        {"k": ["u"], "ts": [20], "etype": ["C"], "eid": [2]}))
    out = r.process_sorted(pd.DataFrame(
        {"k": ["u"], "ts": [30], "etype": ["B"], "eid": [3]}))
    assert len(out) == 0


def test_negation_matches_brute_force():
    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame({
        "k": rng.integers(0, 5, n),
        "ts": rng.integers(0, 1000, n),
        "etype": rng.choice(["A", "B", "C", "X"], n),
        "eid": np.arange(n),
    }).drop_duplicates(["k", "ts"])  # unique (key, ts) precondition
    out = run(df, negpat(within=200))
    got = set(zip(out.a_id, out.b_id))
    want = set()
    for _, g in df.groupby("k"):
        a = g[g.etype == "A"]
        b = g[g.etype == "B"]
        c = g[g.etype == "C"]
        for _, ra in a.iterrows():
            for _, rb in b.iterrows():
                if not (0 < rb.ts - ra.ts <= 200):
                    continue
                if ((c.ts > ra.ts) & (c.ts < rb.ts)).any():
                    continue
                want.add((ra.eid, rb.eid))
    assert got == want


def test_negated_step_validation():
    with pytest.raises(ValueError):
        NFARunner(Pattern(
            steps=(Step("c", "etype", "C", negated=True),
                   Step("b", "etype", "B")),
            within_us=10, key="k", ts_col="ts"))
    with pytest.raises(ValueError):
        NFARunner(Pattern(
            steps=(Step("a", "etype", "A"),
                   Step("c", "etype", "C", negated=True)),
            within_us=10, key="k", ts_col="ts"))
    with pytest.raises(ValueError):
        NFARunner(Pattern(
            steps=(Step("a", "etype", "A"),
                   Step("c", "etype", "C", negated=True),
                   Step("b", "etype", "B")),
            within_us=10, key="k", ts_col="ts", contiguity="strict"))


# ------------------------------------------------- per-step max gap

def test_max_gap_bounds_consecutive_hop():
    pat = Pattern(
        steps=(Step("a", "etype", "A"),
               Step("b", "etype", "B", max_gap_us=15)),
        within_us=1000, key="k", ts_col="ts", id_col="eid",
    )
    df = pd.DataFrame(
        {"k": ["u"] * 3, "ts": [10, 20, 100],
         "etype": ["A", "B", "B"], "eid": [1, 2, 3]}
    )
    out = run(df, pat)
    # B@20 is 10 after A (<=15, match); B@100 is 90 after A (> gap)
    assert set(zip(out.a_id, out.b_id)) == {(1, 2)}


def test_max_gap_two_step_fast_path_parity():
    rng = np.random.default_rng(11)
    n = 600
    df = pd.DataFrame({
        "k": rng.integers(0, 8, n),
        "ts": rng.integers(0, 5000, n),
        "etype": rng.choice(["A", "B", "X"], n),
        "eid": np.arange(n),
    }).drop_duplicates(["k", "ts"])
    pat = Pattern(
        steps=(Step("a", "etype", "A"),
               Step("b", "etype", "B", max_gap_us=40)),
        within_us=100, key="k", ts_col="ts", id_col="eid",
    )
    out = run(df, pat)
    got = set(zip(out.a_id, out.b_id))
    want = set()
    for _, g in df.groupby("k"):
        a = g[g.etype == "A"]
        b = g[g.etype == "B"]
        for _, ra in a.iterrows():
            for _, rb in b.iterrows():
                if 0 < rb.ts - ra.ts <= 40:
                    want.add((ra.eid, rb.eid))
    assert got == want


def test_max_gap_on_kleene_extension():
    pat = Pattern(
        steps=(Step("a", "etype", "A"),
               Step("b", "etype", "B", quantifier="+", max_gap_us=15)),
        within_us=1000, key="k", ts_col="ts", id_col="eid",
    )
    # B@50 is 30 after B@20: extension blocked by gap, but B@50 still
    # pairs directly with A (gap 40 > 15? no — blocked there too)
    df = pd.DataFrame(
        {"k": ["u"] * 3, "ts": [10, 20, 50],
         "etype": ["A", "B", "B"], "eid": [1, 2, 3]}
    )
    out = run(df, pat)
    assert set(zip(out.a_id, out.b_id, out.b_n)) == {(1, 2, 1)}


# ------------------------------------------------- capture_all ids

def test_capture_all_subsequences():
    pat = Pattern(
        steps=(Step("a", "etype", "A"),
               Step("b", "etype", "B", quantifier="+")),
        within_us=1000, key="k", ts_col="ts", id_col="eid",
        capture_all=True,
    )
    df = pd.DataFrame(
        {"k": ["u"] * 4, "ts": [10, 20, 30, 40],
         "etype": ["A", "B", "B", "B"], "eid": [1, 2, 3, 4]}
    )
    out = run(df, pat)
    got = set(out.b_ids)
    # all-runs branches = every non-empty subsequence of (2,3,4)
    want = {"2", "3", "4", "2,3", "2,4", "3,4", "2,3,4"}
    assert got == want
    # count column consistent with the id list
    for _, r in out.iterrows():
        assert r.b_n == len(r.b_ids.split(","))
        assert r.b_id == int(r.b_ids.split(",")[0])


def test_capture_all_state_survives_batches():
    pat = Pattern(
        steps=(Step("a", "etype", "A"),
               Step("b", "etype", "B", quantifier="+")),
        within_us=1000, key="k", ts_col="ts", id_col="eid",
        capture_all=True,
    )
    r = NFARunner(pat)
    out1 = r.process_sorted(pd.DataFrame(
        {"k": ["u", "u"], "ts": [10, 20], "etype": ["A", "B"],
         "eid": [1, 2]}))
    out2 = r.process_sorted(pd.DataFrame(
        {"k": ["u"], "ts": [30], "etype": ["B"], "eid": [3]}))
    assert set(out1.b_ids) == {"2"}
    assert set(out2.b_ids) == {"3", "2,3"}
