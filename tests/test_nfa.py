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
