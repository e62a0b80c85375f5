"""PartitionState unit tests: V1 dedup versioning, idempotent replay,
watermark window/session closing, snapshot/restore."""

import pandas as pd
import pyarrow as pa

from gush_ray.stages.nfa import Pattern, Step
from gush_ray.state.store import NEG_INF, POS_INF, PartitionState, StateParams


def mk(pattern=None, **kw):
    defaults = dict(
        key_col="url", ts_col="ts_us", window_group_cols=("lang",),
        window_size_us=100, session_gap_us=50, pattern=pattern,
    )
    defaults.update(kw)
    return PartitionState(0, StateParams(**defaults))


def tbl(rows):
    return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)


def test_dedup_versioning():
    ps = mk()
    out = ps.process(0, tbl([
        {"url": "a", "ts_us": 10, "lang": "en"},
        {"url": "a", "ts_us": 20, "lang": "en"},
        {"url": "b", "ts_us": 15, "lang": "de"},
        {"url": "a", "ts_us": 20, "lang": "en"},  # exact replay
    ]))
    ch = out["changes"].to_pandas().sort_values(["url", "ts_us"])
    assert list(ch["change_kind"]) == ["insert", "update", "insert"]
    assert list(ch["version"]) == [0, 1, 0]
    assert out["metrics"]["replays_dropped"] == 1

    # next epoch: stale row (ts <= last) dropped, new version continues
    out2 = ps.process(1, tbl([
        {"url": "a", "ts_us": 5, "lang": "en"},    # stale
        {"url": "a", "ts_us": 30, "lang": "en"},
    ]))
    ch2 = out2["changes"].to_pandas()
    assert list(ch2["version"]) == [2]
    assert out2["metrics"]["stale_dropped"] == 1


def test_idempotent_replay():
    ps = mk()
    t = tbl([{"url": "a", "ts_us": 10, "lang": "en"}])
    out1 = ps.process(0, t)
    out2 = ps.process(0, t)  # replay of same epoch: cached, state unchanged
    assert out1["changes"].equals(out2["changes"])
    out3 = ps.process(1, t)  # genuinely new epoch: now it's a stale dup
    assert out3["changes"].num_rows == 0
    assert out3["metrics"]["stale_dropped"] == 1


def test_windows_close_at_watermark():
    ps = mk()
    ps.process(0, tbl([
        {"url": "a", "ts_us": 10, "lang": "en"},
        {"url": "b", "ts_us": 110, "lang": "en"},
    ]))
    c = ps.advance_watermark(100)  # closes window 0 only
    w = c["windows"].to_pandas()
    assert len(w) == 1 and w.iloc[0]["window_id"] == 0 and w.iloc[0]["n"] == 1
    c2 = ps.advance_watermark(POS_INF)
    assert len(c2["windows"].to_pandas()) == 1  # window 1 now closes


def test_watermark_monotone_and_late():
    ps = mk()
    ps.process(0, tbl([{"url": "a", "ts_us": 100, "lang": "en"}]))
    ps.advance_watermark(100)
    ps.advance_watermark(50)  # must not regress
    assert ps.watermark_us == 100
    out = ps.process(1, tbl([{"url": "z", "ts_us": 40, "lang": "en"}]))
    assert out["metrics"]["late_rows"] == 1
    assert out["changes"].num_rows == 0


def test_sessions_gap_merge_and_close():
    ps = mk()
    ps.process(0, tbl([
        {"url": "a", "ts_us": 10, "lang": "en"},
        {"url": "a", "ts_us": 40, "lang": "en"},   # same session (gap 50)
        {"url": "a", "ts_us": 200, "lang": "en"},  # new session -> closes first
    ]))
    # first session closed by the in-batch gap
    # (emitted in process output, not at watermark)
    c = ps.advance_watermark(POS_INF)
    s = c["sessions"].to_pandas()
    assert len(s) == 1
    assert s.iloc[0]["session_start_us"] == 200


def test_session_closed_in_process_output():
    ps = mk()
    out = ps.process(0, tbl([
        {"url": "a", "ts_us": 10, "lang": "en"},
        {"url": "a", "ts_us": 200, "lang": "en"},
    ]))
    s = out["sessions_closed"].to_pandas()
    assert len(s) == 1
    assert s.iloc[0].to_dict() == {
        "url": "a", "session_start_us": 10, "session_end_us": 10, "n_events": 1
    }


def test_nfa_in_state():
    pat = Pattern(
        steps=(Step("first", "change_kind", "insert"),
               Step("recrawl", "change_kind", "update")),
        within_us=1000, key="url", ts_col="ts_us", id_col="version",
    )
    ps = mk(pattern=pat)
    out0 = ps.process(0, tbl([{"url": "a", "ts_us": 10, "lang": "en"}]))
    assert out0["matches"].num_rows == 0
    out1 = ps.process(1, tbl([{"url": "a", "ts_us": 20, "lang": "en"}]))
    m = out1["matches"].to_pandas()
    assert len(m) == 1 and m.iloc[0]["recrawl_id"] == 1


def test_snapshot_restore_roundtrip():
    ps = mk()
    ps.process(0, tbl([
        {"url": "a", "ts_us": 10, "lang": "en"},
        {"url": "a", "ts_us": 20, "lang": "en"},
    ]))
    blob = ps.snapshot_bytes()
    ps2 = mk()
    ps2.restore_bytes(blob)
    out = ps2.process(1, tbl([{"url": "a", "ts_us": 30, "lang": "en"}]))
    assert list(out["changes"].to_pandas()["version"]) == [2]
    c = ps2.advance_watermark(POS_INF)
    w = c["windows"].to_pandas()
    assert w["n"].sum() == 3  # accumulators survived the roundtrip


def test_streaming_sliding_windows():
    # size 100, slide 50: event at ts=120 lands in windows 2 ([100,200))
    # and 1 ([50,150))
    ps = mk(window_size_us=100, window_slide_us=50)
    ps.process(0, tbl([{"url": "a", "ts_us": 120, "lang": "en"}]))
    c = ps.advance_watermark(150)  # closes window 1 (end=150) only
    w = c["windows"].to_pandas()
    assert list(w["window_id"]) == [1]
    c2 = ps.advance_watermark(POS_INF)
    assert list(c2["windows"].to_pandas()["window_id"]) == [2]


def test_allowed_lateness_shifts_watermark():
    ps = mk(allowed_lateness_us=50)
    ps.process(0, tbl([{"url": "a", "ts_us": 100, "lang": "en"}]))
    ps.advance_watermark(100)
    assert ps.watermark_us == 50  # lateness subtracted
    out = ps.process(1, tbl([{"url": "z", "ts_us": 60, "lang": "en"}]))
    assert out["metrics"]["late_rows"] == 0  # within lateness -> accepted
    out2 = ps.process(2, tbl([{"url": "y", "ts_us": 40, "lang": "en"}]))
    assert out2["metrics"]["late_rows"] == 1


def test_strict_nfa_in_state():
    from gush_ray.stages.nfa import Pattern, Step

    pat = Pattern(
        steps=(Step("first", "change_kind", "insert"),
               Step("recrawl", "change_kind", "update")),
        within_us=1000, key="url", ts_col="ts_us", id_col="version",
        contiguity="strict",
    )
    ps = mk(pattern=pat)
    out = ps.process(0, tbl([
        {"url": "a", "ts_us": 10, "lang": "en"},   # insert
        {"url": "a", "ts_us": 20, "lang": "en"},   # update -> strict match
        {"url": "a", "ts_us": 30, "lang": "en"},   # update (no new insert)
    ]))
    m = out["matches"].to_pandas()
    assert len(m) == 1 and m.iloc[0]["recrawl_id"] == 1


def test_null_group_rows_counted_in_windows():
    """Rows whose window-group column is null (e.g. an unmatched dim key
    from the broadcast dimension join) must still be counted — pandas'
    default dropna=True silently broke changes/windows conservation."""
    ps = mk(window_size_us=100)
    out = ps.process(0, tbl([
        {"url": "a", "ts_us": 10, "lang": "en"},
        {"url": "b", "ts_us": 20, "lang": None},   # unmatched dim key
        {"url": "c", "ts_us": 30, "lang": None},
    ]))
    assert out["changes"].num_rows == 3
    # NaN group labels merge ACROSS batches (keys normalized to None —
    # distinct float('nan') objects hash by identity since py3.10)
    ps.process(1, tbl([{"url": "d", "ts_us": 40, "lang": None}]))
    closes = ps.advance_watermark(1_000)
    w = closes["windows"].to_pandas()
    assert w["n"].sum() == 4  # conservation incl. the null-group rows
    null_rows = w[w["lang"].isna()]
    assert len(null_rows) == 1 and null_rows.iloc[0]["n"] == 3


def test_nfa_truncation_surfaced_in_metrics():
    """The max_partials cap must be observable: a hot key that overflows
    the live-run bound reports how many runs were dropped."""
    pat = Pattern(
        steps=(Step("a", "change_kind", "insert"),
               Step("b", "change_kind", "update", quantifier="+")),
        within_us=10_000, key="url", ts_col="ts_us", id_col="version",
        max_partials=4,
    )
    ps = mk(pattern=pat, window_size_us=100_000)
    rows = [{"url": "hot", "ts_us": 10 + i, "lang": "en"}
            for i in range(40)]
    out = ps.process(0, tbl(rows))
    assert out["metrics"]["nfa_truncated"] > 0
    # counter survives snapshot/restore
    ps2 = mk(pattern=pat, window_size_us=100_000)
    ps2.restore_bytes(ps.snapshot_bytes())
    assert ps2.nfa.truncated == ps.nfa.truncated


def test_replay_does_not_leak_ingested_fragments(tmp_path):
    """Regression (round-3 review): replaying a cached epoch re-ingests
    fragments (seen-sets were popped on first processing) and the
    cached early-return never discarded them — a long-lived actor
    retained an epoch of Arrow tables per retry forever."""
    ps = mk()
    t = tbl([{"url": "a", "ts_us": 10, "lang": "en"}])
    ps.ingest(0, 1, t)
    m1 = ps.process_epoch_to(0, str(tmp_path))
    assert not ps._frag_buf
    ps.ingest(0, 1, t)  # retried caller replays the same fragment
    m2 = ps.process_epoch_to(0, str(tmp_path))
    assert m2 == m1
    assert not ps._frag_buf, "replayed fragments must not accumulate"
    assert not ps._frag_seen


def test_sessions_with_float_nan_keys():
    """Regression (round-3 review): float-NaN keys split every row into
    its own session via NaN != NaN and accrued unmergeable float-nan
    dict keys; they now normalize to None like object-dtype nulls."""
    ps = mk(key_col="uid")
    out = ps.process(0, tbl([
        {"uid": float("nan"), "ts_us": 10, "lang": "en"},
        {"uid": float("nan"), "ts_us": 20, "lang": "en"},
        {"uid": 1.0, "ts_us": 30, "lang": "en"},
    ]))
    assert out is not None
    # ONE open session for the null key (rows 10,20 within gap 50),
    # one for key 1.0 — and no float-nan keys in the dict
    keys = list(ps.sessions)
    assert None in keys
    import math

    assert not any(isinstance(k, float) and math.isnan(k) for k in keys)
    assert ps.sessions[None][2] == 2  # n_events for the null-key session
    # versioning must count null-key rows too: cumcount's default
    # dropna=True yielded NaN occ → invalid int64 cast → garbage versions
    ch = out["changes"].to_pandas().sort_values("ts_us")
    assert list(ch["version"]) == [0, 1, 0]
    assert list(ch["change_kind"]) == ["insert", "update", "insert"]


def test_restore_rollback_resets_unsnapshotted_join_and_nfa():
    """Regression (round-3 review): restoring a frame that carries no
    nfa/join section (written before the pattern/join_spec existed)
    must RESET the live buffers — a rollback that keeps post-snapshot
    NFA partials / join buffers replays epochs against already-advanced
    state."""
    from gush_ray.state.join_state import JoinSpec, StreamJoinState

    pat = Pattern(
        steps=(Step("a", "lang", "en"), Step("b", "lang", "de")),
        within_us=1000, key="url", ts_col="ts_us", id_col="ts_us",
    )
    ps = mk(pattern=pat, join_spec=JoinSpec(-100, 100))
    blob_before = ps.snapshot_bytes()
    st = ps._decode(blob_before)
    st["nfa"] = None
    st.pop("join", None)
    import pickle

    bare = pickle.dumps(st)
    # advance live state past the snapshot
    ps.process(0, tbl([{"url": "a", "ts_us": 10, "lang": "en"}]))
    ps.joiner.bufL = pd.DataFrame(
        {"url": ["a"], "ts_us": [10], "version": [1]})
    assert ps.nfa.partials or ps.joiner is not None
    ps.restore_bytes(bare)
    assert ps.nfa.partials == {}, "NFA partials must not survive rollback"
    assert len(ps.joiner.bufL) == 0 and len(ps.joiner.bufR) == 0


def test_windowed_distinct_counts():
    """window_distinct: n_distinct = unique urls per (group, window);
    version-updates of the same url inside one window count once; a
    SLIDING row contributes its url to every window it lands in; the
    sets ride snapshot/restore."""
    ps = mk(window_distinct=True)
    ps.process(0, tbl([
        {"url": "a", "ts_us": 10, "lang": "en"},
        {"url": "a", "ts_us": 20, "lang": "en"},   # same url, same window
        {"url": "b", "ts_us": 30, "lang": "en"},
        {"url": "c", "ts_us": 40, "lang": "de"},
    ]))
    # snapshot → fresh state → restore: the key sets must survive
    blob = ps.snapshot_bytes()
    ps2 = mk(window_distinct=True)
    ps2.restore_bytes(blob)
    w = ps2.advance_watermark(1000)["windows"].to_pandas()
    got = {(r.lang, r.window_id): (r.n, r.n_distinct)
           for r in w.itertuples()}
    assert got == {("en", 0): (3, 2), ("de", 0): (1, 1)}

    # sliding: url "a" at ts=120 lands in windows 1 and 2, once each
    ps3 = mk(window_distinct=True, window_size_us=100, window_slide_us=50)
    ps3.process(0, tbl([
        {"url": "a", "ts_us": 120, "lang": "en"},
        {"url": "a", "ts_us": 130, "lang": "en"},
        {"url": "b", "ts_us": 125, "lang": "en"},
    ]))
    w3 = ps3.advance_watermark(POS_INF)["windows"].to_pandas()
    got3 = {int(r.window_id): (r.n, r.n_distinct) for r in w3.itertuples()}
    assert got3 == {1: (3, 2), 2: (3, 2)}


def test_windowed_distinct_restore_from_pre_flag_frame():
    """A frame written WITHOUT window_distinct restores into a
    flag-enabled state with empty key sets (rollback rule), instead of
    crashing on 2-element slots at the next advance."""
    ps = mk()
    ps.process(0, tbl([{"url": "a", "ts_us": 10, "lang": "en"}]))
    blob = ps.snapshot_bytes()
    ps2 = mk(window_distinct=True)
    ps2.restore_bytes(blob)
    w = ps2.advance_watermark(POS_INF)["windows"].to_pandas()
    assert list(w["n"]) == [1] and list(w["n_distinct"]) == [0]


def test_windowed_distinct_restore_from_pre_flag_delta_chain():
    """The 2→3-element slot fixup must also run on DELTA upserts: a
    pre-flag chain (full base + delta) restored into a flag-enabled
    state, then processed, crashed with IndexError before the fix."""
    ps = mk()
    ps.process(0, tbl([{"url": "a", "ts_us": 10, "lang": "en"}]))
    base = ps.snapshot_bytes()
    ps.process(1, tbl([{"url": "b", "ts_us": 20, "lang": "en"}]))
    delta = ps.delta_bytes(0)

    ps2 = mk(window_distinct=True)
    ps2.restore_chain([base, delta])
    # a row landing in the restored (group, window) must not crash
    out = ps2.process(2, tbl([{"url": "c", "ts_us": 30, "lang": "en"}]))
    assert out["metrics"]["rows_in"] == 1
    w = ps2.advance_watermark(POS_INF)["windows"].to_pandas()
    # the pre-flag window's keys were never tracked → only the
    # post-restore key counts toward n_distinct (documented rollback)
    assert list(w["n"]) == [3] and list(w["n_distinct"]) == [1]


def test_window_quantile_histograms_and_snapshot_roundtrip():
    """winq mode: per-window value histograms accumulate, survive a
    full+delta snapshot chain, and leave with the closing window on the
    window_hist table."""
    ps = mk(value_col="v", window_quantiles=(0.5,))
    ps.process(0, tbl([
        {"url": "a", "ts_us": 10, "lang": "en", "v": 3.0},
        {"url": "b", "ts_us": 20, "lang": "en", "v": 3.0},
        {"url": "c", "ts_us": 30, "lang": "en", "v": 7.0},
    ]))
    base = ps.snapshot_bytes()
    ps.process(1, tbl([{"url": "d", "ts_us": 40, "lang": "en", "v": 7.0}]))
    delta = ps.delta_bytes(0)

    ps2 = mk(value_col="v", window_quantiles=(0.5,))
    ps2.restore_chain([base, delta])
    closes = ps2.advance_watermark(POS_INF)
    h = closes["window_hist"].to_pandas().sort_values("value")
    assert list(h["value"]) == [3.0, 7.0]
    assert list(h["n"]) == [2, 2]
    # the histogram left with the window
    assert not ps2.winq


def test_window_quantile_nan_values_excluded():
    """NULL/NaN values stay out of the order statistics (the
    quantile_disc oracle contract) but still count in the window's n."""
    ps = mk(value_col="v", window_quantiles=(0.5,))
    ps.process(0, tbl([
        {"url": "a", "ts_us": 10, "lang": "en", "v": 5.0},
        {"url": "b", "ts_us": 20, "lang": "en", "v": float("nan")},
    ]))
    closes = ps.advance_watermark(POS_INF)
    h = closes["window_hist"].to_pandas()
    assert list(h["value"]) == [5.0] and list(h["n"]) == [1]
    w = closes["windows"].to_pandas()
    assert list(w["n"]) == [2]


def test_sketch_rep_monotone_bounded_and_exact_on_powers():
    """_sketch_rep (quantile_sketch_k mode): rank-preserving monotone
    transform, rep <= |v| < rep*(1+1/k) toward zero (relative error
    bound), exact on powers of two, sign-symmetric, NaN-propagating,
    and the bucket count per octave is at most k."""
    import numpy as np

    from gush_ray.state.store import _sketch_rep

    k = 64
    rng = np.random.RandomState(11)
    v = np.concatenate([
        rng.uniform(1e-6, 1e6, 20_000),
        -rng.uniform(1e-6, 1e6, 20_000),
        [0.0, 1.0, 2.0, 0.5, -4.0, 1e-300, 1e300],
    ])
    r = _sketch_rep(v, k)
    # monotone: sorting by v sorts r
    order = np.argsort(v, kind="mergesort")
    assert (np.diff(r[order]) >= 0).all()
    # toward-zero relative error bound
    pos = v > 0
    assert (r[pos] <= v[pos]).all()
    assert (v[pos] < r[pos] * (1 + 1 / k) + 1e-300).all()
    # sign symmetry and zero
    assert (_sketch_rep(-v, k) == -r).all()
    assert _sketch_rep(np.array([0.0]), k)[0] == 0.0
    # powers of two are bucket lower bounds (exact)
    assert list(_sketch_rep(np.array([1.0, 2.0, 0.5, -4.0]), k)) == \
        [1.0, 2.0, 0.5, -4.0]
    # NaN propagates (excluded downstream)
    assert np.isnan(_sketch_rep(np.array([float("nan")]), k)).all()
    # bounded state: one octave's values land in at most k buckets
    oct_vals = rng.uniform(1.0, 2.0, 50_000)
    assert len(np.unique(_sketch_rep(oct_vals, k))) <= k


def test_window_quantile_sketch_bounds_state():
    """quantile_sketch_k bounds the open-window histogram size at
    O(octaves x k) no matter how many distinct values arrive."""
    import numpy as np

    rng = np.random.RandomState(5)
    vals = rng.uniform(1.0, 1024.0, 5_000)  # 10 octaves
    rows = [{"url": f"u{i}", "ts_us": 10 + i, "lang": "en",
             "v": float(x)} for i, x in enumerate(vals)]
    k = 32
    ps = mk(value_col="v", window_quantiles=(0.5,), quantile_sketch_k=k,
            window_size_us=1 << 40)
    ps.process(0, tbl(rows))
    (hist,) = ps.winq.values()
    assert len(hist) <= 10 * k
    assert sum(hist.values()) == len(rows)


def test_session_values_merge_and_close():
    """session_values: per-session sum/min/max of value_col accumulate
    through in-batch splits, cross-epoch merges, and watermark closes;
    NaN values are excluded from all three (still counted in n_events);
    an all-NaN session closes with sum 0.0 and NULL min/max."""
    import numpy as np

    ps = mk(value_col="v", session_values=True)
    out0 = ps.process(0, tbl([
        {"url": "a", "ts_us": 10, "lang": "en", "v": 2.0},
        {"url": "a", "ts_us": 40, "lang": "en", "v": 5.0},
        {"url": "a", "ts_us": 200, "lang": "en", "v": 1.0},  # gap break
        {"url": "b", "ts_us": 10, "lang": "en", "v": float("nan")},
    ]))
    s0 = out0["sessions_closed"].to_pandas()
    # the in-batch closed session carries its aggregates
    assert list(s0["n_events"]) == [2]
    assert list(s0["sum_value"]) == [7.0]
    assert list(s0["min_value"]) == [2.0]
    assert list(s0["max_value"]) == [5.0]

    # cross-epoch merge extends a's open session (200 -> 230)
    ps.process(1, tbl([{"url": "a", "ts_us": 230, "lang": "en",
                        "v": 7.0}]))
    c = ps.advance_watermark(POS_INF)["sessions"].to_pandas()
    c = c.sort_values("url").reset_index(drop=True)
    assert list(c["n_events"]) == [2, 1]
    assert list(c["sum_value"]) == [8.0, 0.0]
    assert list(c["min_value"])[:1] == [1.0] and np.isnan(c["min_value"][1])
    assert list(c["max_value"])[:1] == [7.0] and np.isnan(c["max_value"][1])


def test_session_values_snapshot_roundtrip_and_pre_flag_rollback():
    """6-element session slots survive the full+delta snapshot chain; a
    pre-flag frame (3-element slots) restored into a flag-enabled state
    closes with neutral value state instead of crashing."""
    ps = mk(value_col="v", session_values=True)
    ps.process(0, tbl([{"url": "a", "ts_us": 10, "lang": "en",
                        "v": 3.0}]))
    base = ps.snapshot_bytes()
    ps.process(1, tbl([{"url": "a", "ts_us": 20, "lang": "en",
                        "v": 9.0}]))
    delta = ps.delta_bytes(0)
    ps2 = mk(value_col="v", session_values=True)
    ps2.restore_chain([base, delta])
    c = ps2.advance_watermark(POS_INF)["sessions"].to_pandas()
    assert list(c["sum_value"]) == [12.0]
    assert list(c["min_value"]) == [3.0]
    assert list(c["max_value"]) == [9.0]

    # pre-flag frame: written WITHOUT session_values
    ps3 = mk()
    ps3.process(0, tbl([{"url": "a", "ts_us": 10, "lang": "en"}]))
    blob = ps3.snapshot_bytes()
    ps4 = mk(value_col="v", session_values=True)
    ps4.restore_bytes(blob)
    # a merging row must extend the 3-element slot without crashing
    ps4.process(1, tbl([{"url": "a", "ts_us": 30, "lang": "en",
                         "v": 4.0}]))
    c4 = ps4.advance_watermark(POS_INF)["sessions"].to_pandas()
    assert list(c4["n_events"]) == [2]
    # pre-flag rows were never value-tracked: only the post-restore row
    assert list(c4["sum_value"]) == [4.0]
    assert list(c4["min_value"]) == [4.0]
    assert list(c4["max_value"]) == [4.0]


def test_window_hll_registers_accumulate_and_snapshot():
    """window_hll_p: per-window registers accumulate across epochs,
    survive the full+delta chain, and leave with the closing window as
    register partials whose estimate tracks the exact distinct count."""
    import numpy as np

    from gush_ray.stages.sketches import hll_estimate

    ps = mk(window_hll_p=10)
    ps.process(0, tbl([{"url": f"u{i}", "ts_us": 10 + i, "lang": "en"}
                       for i in range(50)]))
    base = ps.snapshot_bytes()
    ps.process(1, tbl([{"url": f"u{i}", "ts_us": 60 + i, "lang": "en"}
                       for i in range(25, 75)]))  # 25 overlap, 25 new
    delta = ps.delta_bytes(0)

    ps2 = mk(window_hll_p=10)
    ps2.restore_chain([base, delta])
    closes = ps2.advance_watermark(POS_INF)
    h = closes["window_hll_parts"].to_pandas()
    assert len(h) == 2  # two 100us windows got rows
    merged = np.zeros(1 << 10, dtype=np.uint8)
    for blob in h["registers"]:
        np.maximum(merged, np.frombuffer(blob, dtype=np.uint8),
                   out=merged)
    est = hll_estimate(merged)
    assert abs(est - 75) <= 6  # linear-counting regime: near exact
    assert not ps2.winh  # registers left with their windows


def test_window_hll_partition_merge_equals_single_partition():
    """Register max across per-partition partials == the single-state
    registers over the union (the P-exactness claim of the stage-2
    merge)."""
    import numpy as np

    rows = [{"url": f"u{i}", "ts_us": 10, "lang": "en"}
            for i in range(200)]
    whole = mk(window_hll_p=10)
    whole.process(0, tbl(rows))
    (reg_all,) = whole.winh.values()

    a, b = mk(window_hll_p=10), mk(window_hll_p=10)
    a.process(0, tbl(rows[:120]))
    b.process(0, tbl(rows[100:]))   # overlapping split
    (ra,), (rb,) = a.winh.values(), b.winh.values()
    assert (np.maximum(ra, rb) == reg_all).all()
# To append to tests/test_state_store.py once scaling finishes.


def test_sliding_windows_with_quantiles_and_hll():
    """The new window analytics compose with SLIDING windows: each row
    replicates into its k windows before histogram/register
    accumulation, so per-window quantiles and distinct estimates see
    every covering window (the same replication path the count/sum
    slots use)."""
    import numpy as np

    ps = mk(value_col="v", window_quantiles=(0.5, 1.0),
            window_hll_p=10, window_size_us=100, window_slide_us=50)
    ps.process(0, tbl([
        {"url": "a", "ts_us": 120, "lang": "en", "v": 10.0},
        {"url": "b", "ts_us": 130, "lang": "en", "v": 30.0},
    ]))
    closes = ps.advance_watermark(POS_INF)
    h = closes["window_hist"].to_pandas()
    # each row covers windows 1 (50-150) and 2 (100-200): window_id is
    # ts//slide - offset, so ids {1, 2} each hold both values
    assert sorted(set(h["window_id"])) == [1, 2]
    per = h.groupby("window_id")["n"].sum()
    assert list(per) == [2, 2]
    hl = closes["window_hll_parts"].to_pandas()
    assert sorted(set(hl["window_id"])) == [1, 2]
    from gush_ray.stages.sketches import hll_estimate
    for blob in hl["registers"]:
        est = hll_estimate(np.frombuffer(blob, dtype=np.uint8))
        assert abs(est - 2) < 0.5


def test_window_early_fire_changelog_folds_to_totals():
    """window_early_fire: folding sum(change*col) per (group, window)
    over the changelog equals the current accumulator totals after
    every epoch, and equals the windows stream after close; retraction
    pairs carry matching fire_seq; snapshot chain preserves the
    emitted-state so a resumed run retracts what was actually emitted."""
    ps = mk(value_col="v", window_early_fire=True)
    logs = []
    out0 = ps.process(0, tbl([
        {"url": "a", "ts_us": 10, "lang": "en", "v": 2.0},
        {"url": "b", "ts_us": 20, "lang": "en", "v": 3.0},
    ]))
    c0 = ps.advance_watermark(15)  # window [0,100) stays open
    logs.append(c0["window_early"].to_pandas())
    assert list(logs[-1]["change"]) == [1]
    assert list(logs[-1]["n"]) == [2]

    base = ps.snapshot_bytes()
    ps.process(1, tbl([{"url": "c", "ts_us": 30, "lang": "en",
                        "v": 5.0}]))
    c1 = ps.advance_watermark(40)
    logs.append(c1["window_early"].to_pandas())
    # retraction pair: -1 of (2, 5.0), +1 of (3, 10.0)
    assert list(logs[-1]["change"]) == [-1, 1]
    assert list(logs[-1]["n"]) == [2, 3]
    assert list(logs[-1]["fire_seq"]) == [0, 1]

    delta = ps.delta_bytes(0)
    ps2 = mk(value_col="v", window_early_fire=True)
    ps2.restore_chain([base, delta])
    c2 = ps2.advance_watermark(POS_INF)  # closes the window
    logs.append(c2["window_early"].to_pandas())
    # closing pair retracts the RESUMED state's last emission (3, 10.0)
    assert list(logs[-1]["change"]) == [-1, 1]
    assert list(logs[-1]["n"]) == [3, 3]

    import pandas as pd
    log = pd.concat(logs, ignore_index=True)
    fold = log.assign(
        n_=log["change"] * log["n"], s_=log["change"] * log["sum_value"]
    ).groupby(["lang", "window_id"], as_index=False)[["n_", "s_"]].sum()
    w = c2["windows"].to_pandas()
    assert list(fold["n_"]) == list(w["n"]) == [3]
    assert list(fold["s_"]) == list(w["sum_value"]) == [10.0]


def test_sketch_rep_sql_twin_bit_parity_fuzz():
    """The quantile_sketch_k oracle claim — numpy _sketch_rep and the
    DuckDB expression produce BIT-IDENTICAL doubles — fuzzed over
    adversarial SIGNED values: uniform magnitudes across 12 decades,
    exact powers of two, bucket-boundary neighbours (rep*(1+j/k) +- 1
    ulp), near-integer (x-1)*k products, and (round-4 ADVICE fix) a
    NEGATED copy of everything — the engine is sign-preserving via
    abs+copysign and the SQL twin must mirror it (floor(log2(value))
    on a raw negative is NaN and sorts greatest under DuckDB quantile
    semantics)."""
    import duckdb
    import numpy as np

    from gush_ray.state.store import _sketch_rep

    k = 128
    rng = np.random.RandomState(99)
    vals = [rng.uniform(1e-6, 1e6, 3000),
            10.0 ** rng.uniform(-6, 6, 3000),
            2.0 ** rng.randint(-40, 40, 500).astype(np.float64)]
    # bucket-boundary neighbours: lower bounds and their ulp-neighbours
    base = _sketch_rep(rng.uniform(0.5, 4.0, 1000), k)
    vals += [base, np.nextafter(base, np.inf),
             np.nextafter(base, -np.inf)]
    v = np.abs(np.concatenate(vals))
    v = v[v > 0]
    v = np.concatenate([v, -v])          # signed domain, both branches
    got = _sketch_rep(v, k)
    assert (np.sign(got) == np.sign(v)).all()   # monotone for v < 0 too

    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"value": v}))
    # the EXACT production expression (abs/sign mirrored from the
    # engine), kept in lockstep with SQL_WINDOW_QUANTILES_SKETCH
    want = con.execute(f"""
        WITH e0 AS (SELECT value, floor(log2(abs(value))) AS E0 FROM t),
        ee AS (SELECT value, CASE
            WHEN pow(2.0, E0 + 1) <= abs(value) THEN E0 + 1
            WHEN pow(2.0, E0) > abs(value) THEN E0 - 1 ELSE E0 END AS E
          FROM e0)
        SELECT sign(value) * pow(2.0, E)
               * (1.0 + LEAST(floor((abs(value) / pow(2.0, E)
               - 1.0) * {k}), {k} - 1) / {k}) AS rep
        FROM ee
    """).fetchnumpy()["rep"]
    # bit-identical, not merely close
    assert (got.view(np.uint64) == want.view(np.uint64)).all(), \
        (got[got != want][:5], want[got != want][:5])


def test_sketch_rep_negative_zero_normalizes():
    """-0.0 input maps to +0.0 (the SQL twin's value=0 branch yields
    +0.0; a resurrected negative zero would diverge bit-wise)."""
    import numpy as np

    from gush_ray.state.store import _sketch_rep

    r = _sketch_rep(np.array([0.0, -0.0]), 128)
    assert (r.view(np.uint64) == 0).all()
