"""Stream-stream windowed (interval) join: unit semantics of the
buffered incremental join, and e2e equivalence of the streaming job's
``joined`` output with a batch interval join over the same inputs
(which is itself oracle-paired via `interval_join` in test_oracle.py —
so streaming == batch == SQL transitively)."""

import numpy as np
import pandas as pd
import pytest

from gush_ray.state.join_state import JoinSpec, StreamJoinState


def brute_pairs(ldf, rdf, key, lts, rts, low, high):
    """Independent O(n²) oracle: pandas merge on key + bound filter."""
    m = ldf.merge(rdf, on=key, suffixes=("_l", "_r"))
    lcol = f"{lts}_l" if f"{lts}_l" in m.columns else lts
    rcol = f"{rts}_r" if f"{rts}_r" in m.columns else rts
    d = m[rcol].to_numpy().astype(np.int64) - \
        m[lcol].to_numpy().astype(np.int64)
    return m[(d >= low) & (d <= high)]


def _mk(rng, n, n_keys, ts_hi):
    return pd.DataFrame({
        "k": rng.randint(0, n_keys, n).astype(str),
        "ts_us": np.sort(rng.randint(0, ts_hi, n)).astype(np.int64),
        "pay": rng.randint(0, 1000, n).astype(np.int64),
    })


def test_incremental_join_equals_batch_with_pruning():
    rng = np.random.RandomState(3)
    LOW, HIGH = -50, 80
    ldf = _mk(rng, 300, 12, 1000)
    rdf = _mk(rng, 300, 12, 1000)
    # one flat output namespace: duplicate payload names now rejected
    # (round-3 review finding), so carry only the left payload here
    spec = JoinSpec(LOW, HIGH, left_cols=("pay",), right_cols=())

    # epochs split by event time; wm before epoch e = min ts of epoch e
    bounds = [0, 300, 650, 10**9]
    st = StreamJoinState("k", "ts_us", spec)
    got = []
    for e in range(3):
        lo, hi = bounds[e], bounds[e + 1]
        new_l = ldf[(ldf.ts_us >= lo) & (ldf.ts_us < hi)]
        new_r = rdf[(rdf.ts_us >= lo) & (rdf.ts_us < hi)]
        got.append(st.process_epoch(new_l, new_r))
        st.prune(lo)  # every future arrival has ts >= this epoch's start
    got = pd.concat(got, ignore_index=True)

    want = brute_pairs(ldf, rdf, "k", "ts_us", "ts_us", LOW, HIGH)
    assert len(got) == len(want)
    gs = sorted(zip(got["k"], got["l_ts_us"], got["r_ts_us"]))
    ws = sorted(zip(want["k"],
                    want["ts_us_l"].astype(np.int64),
                    want["ts_us_r"].astype(np.int64)))
    assert gs == ws  # exactly-once: multiset equality, no dup/no loss


def test_join_state_snapshot_restore_continues_identically():
    rng = np.random.RandomState(9)
    spec = JoinSpec(-30, 30, left_cols=(), right_cols=())
    ldf, rdf = _mk(rng, 200, 8, 600), _mk(rng, 200, 8, 600)
    half = 300

    cont = StreamJoinState("k", "ts_us", spec)
    p1 = cont.process_epoch(ldf[ldf.ts_us < half], rdf[rdf.ts_us < half])
    snap = cont.state()
    p2_cont = cont.process_epoch(ldf[ldf.ts_us >= half],
                                 rdf[rdf.ts_us >= half])

    res = StreamJoinState("k", "ts_us", spec)
    res.restore(snap)
    p2_res = res.process_epoch(ldf[ldf.ts_us >= half],
                               rdf[rdf.ts_us >= half])
    pd.testing.assert_frame_equal(p2_cont, p2_res)
    assert len(p1) + len(p2_cont) == len(
        brute_pairs(ldf, rdf, "k", "ts_us", "ts_us", -30, 30)
    )


def test_prune_drops_only_unmatchable_rows():
    spec = JoinSpec(-10, 20, left_cols=(), right_cols=())
    st = StreamJoinState("k", "ts_us", spec)
    st.process_epoch(
        pd.DataFrame({"k": ["a", "a"], "ts_us": [100, 500]}),
        pd.DataFrame({"k": ["a"], "ts_us": [100]}),
    )
    st.prune(400)
    # left@100: 100+20 < 400 -> gone; left@500 stays
    assert st.bufL["ts_us"].tolist() == [500]
    # right@100: 100-(-10)=110 < 400 -> gone
    assert len(st.bufR) == 0
    # a right row at 490 still pairs with the surviving left@500
    out = st.process_epoch(
        pd.DataFrame(columns=["k", "ts_us"]),
        pd.DataFrame({"k": ["a"], "ts_us": [490]}),
    )
    assert len(out) == 1 and out["l_ts_us"].iloc[0] == 500


def test_below_watermark_right_row_still_joins_buffered_left(tmp_path):
    """With a negative low bound, a right row whose ts is below the
    watermark can still pair with an already-buffered left row; it may
    only be dropped past the same retention bound the prune applies
    (r.ts - low < wm), not at plain r.ts < wm."""
    import pyarrow as pa
    import glob as g
    import pyarrow.parquet as pq

    from gush_ray.state.store import PartitionState, StateParams

    params = StateParams(key_col="url", ts_col="ts_us",
                         window_group_cols=("lang",), pattern=None,
                         join_spec=JoinSpec(-100, 100, left_cols=(),
                                            right_cols=()))
    ps = PartitionState(0, params)
    out = str(tmp_path)

    def ltab(ts):
        return pa.table({"url": ["a"] * len(ts),
                         "ts_us": pa.array(ts, type=pa.int64()),
                         "lang": ["en"] * len(ts)})

    ps.ingest(0, 0, ltab([1000]))
    ps.process_epoch_to(0, out)
    ps.advance_watermark(1000)

    ps.ingest(1, 0, ltab([1020]))
    ps.ingest_right(1, 0, pa.table({
        "url": ["a"], "ts_us": pa.array([950], type=pa.int64())}))
    m = ps.process_epoch_to(1, out)
    assert m["right_late"] == 0
    assert m["joined_rows"] == 2  # (1000,950) and (1020,950)
    pairs = pa.concat_tables([
        pq.read_table(f) for f in g.glob(f"{out}/joined/epoch=*/part-*")
    ]).to_pandas()
    got = sorted(zip(pairs["l_ts_us"], pairs["r_ts_us"]))
    assert got == [(1000, 950), (1020, 950)]

    # but a right row past the retention bound IS dropped as late
    ps.advance_watermark(1200)
    ps.ingest_right(2, 0, pa.table({
        "url": ["a"], "ts_us": pa.array([1050], type=pa.int64())}))
    m = ps.process_epoch_to(2, out)
    assert m["right_late"] == 1 and m["joined_rows"] == 0


@pytest.fixture(scope="module")
def join_job_dirs(tmp_path_factory):
    from gush_ray.datagen import write_clicks_dir, write_pages_dir

    root = tmp_path_factory.mktemp("sjoin")
    pages = str(root / "pages")
    clicks = str(root / "clicks")
    write_pages_dir(pages, n_urls=300, seed=21, n_epochs=4,
                    rows_per_file=400)
    write_clicks_dir(clicks, n_urls=300, seed=21, clicks_per_epoch=400,
                     n_epochs=4, rows_per_file=400)
    return pages, clicks


HALF_H = 30 * 60 * 1_000_000


def _run_join_job(pages, clicks, out_dir, **kw):
    from gush_ray.pipelines.epoch_loop import StreamingJob

    job = StreamingJob(
        pages, out_dir, num_partitions=4,
        right_dir=clicks,
        join_spec=JoinSpec(-HALF_H, HALF_H, left_cols=("version",),
                           right_cols=("click_id",)),
        **kw,
    )
    return job


def test_streaming_join_matches_batch_interval_join(
        ray_session, join_job_dirs, tmp_path):
    pages, clicks = join_job_dirs
    job = _run_join_job(pages, clicks, str(tmp_path / "out"))
    res = job.run()
    assert res["completed"] == 3

    joined = job.read_output("joined")
    changes = job.read_output("changes")
    assert len(joined) > 0

    import pyarrow.parquet as pq
    import glob as g
    clk = pd.concat(
        [pq.read_table(f).to_pandas()
         for f in sorted(g.glob(f"{clicks}/epoch=*/part-*.parquet"))],
        ignore_index=True,
    )
    clk["ts_us"] = clk["ts"].astype("int64")

    want = brute_pairs(
        changes[["url", "ts_us", "version"]], clk[["url", "ts_us",
                                                   "click_id"]],
        "url", "ts_us", "ts_us", -HALF_H, HALF_H,
    )
    assert len(joined) == len(want)
    gs = sorted(zip(joined["url"], joined["l_ts_us"], joined["r_ts_us"],
                    joined["version"], joined["click_id"]))
    ws = sorted(zip(want["url"],
                    want["ts_us_l"].astype(np.int64),
                    want["ts_us_r"].astype(np.int64),
                    want["version"], want["click_id"]))
    assert gs == ws


def test_streaming_join_continuous_waits_for_right_slices(
        ray_session, join_job_dirs, tmp_path):
    """Continuous mode with a join: left epochs that arrive BEFORE their
    right slices must wait (streams advance together); once both sides
    land, output equals the batch join run."""
    import os
    import shutil
    import threading
    import time as _time

    pages, clicks = join_job_dirs
    want = _run_join_job(pages, clicks, str(tmp_path / "batch"),
                         run_id="cj_b")
    want.run()

    live_l = str(tmp_path / "live_l")
    live_r = str(tmp_path / "live_r")
    os.makedirs(live_l), os.makedirs(live_r)

    def writer():
        for e in range(4):
            name = f"epoch={e:04d}"
            # left lands first, right follows after a beat
            shutil.copytree(os.path.join(pages, name),
                            os.path.join(live_l, name))
            open(os.path.join(live_l, name, "_READY"), "w").close()
            _time.sleep(0.3)
            shutil.copytree(os.path.join(clicks, name),
                            os.path.join(live_r, name))
            open(os.path.join(live_r, name, "_READY"), "w").close()
        open(os.path.join(live_l, "_END"), "w").close()

    t = threading.Thread(target=writer)
    t.start()
    job = _run_join_job(live_l, live_r, str(tmp_path / "live"),
                        run_id="cj_l")
    res = job.run_continuous(poll_interval_s=0.1)
    t.join()
    assert res["finalized"] and res["completed"] == 3

    key = ["url", "l_ts_us", "r_ts_us", "version", "click_id"]
    a = want.read_output("joined")[key].sort_values(key) \
        .reset_index(drop=True)
    b = job.read_output("joined")[key].sort_values(key) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_streaming_join_kill_resume_parity(
        ray_session, join_job_dirs, tmp_path):
    pages, clicks = join_job_dirs

    full = _run_join_job(pages, clicks, str(tmp_path / "full"),
                         run_id="sj_full")
    full.run()
    want = full.read_output("joined")

    part = _run_join_job(pages, clicks, str(tmp_path / "part"),
                         run_id="sj_part")
    part.run(stop_after=2)  # "crash" mid-stream
    resumed = _run_join_job(pages, clicks, str(tmp_path / "part"),
                            run_id="sj_part2")
    res = resumed.run()
    assert res["completed"] == 3
    got = resumed.read_output("joined")

    key = ["url", "l_ts_us", "r_ts_us", "version", "click_id"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key).reset_index(drop=True),
        want[key].sort_values(key).reset_index(drop=True),
    )


def test_streaming_join_actors_mode_parity(
        ray_session, join_job_dirs, tmp_path):
    """Actor-mode (in-memory state) stream-stream join produces the same
    joined pairs as the tasks-mode run — both ride the shared
    PartitionState.ingest_right path."""
    pages, clicks = join_job_dirs

    tasks = _run_join_job(pages, clicks, str(tmp_path / "tasks"),
                          run_id="sj_t")
    tasks.run()
    want = tasks.read_output("joined")

    actors = _run_join_job(pages, clicks, str(tmp_path / "actors"),
                           run_id="sj_a", mode="actors")
    res = actors.run()
    assert res["completed"] == 3
    got = actors.read_output("joined")
    actors.kill_actors()

    key = ["url", "l_ts_us", "r_ts_us", "version", "click_id"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key).reset_index(drop=True),
        want[key].sort_values(key).reset_index(drop=True),
    )


def test_right_stream_extraction_and_dead_letter(
        ray_session, tmp_path):
    """A pages-typed RIGHT stream goes through the same html extraction
    in its map, and its unparseable rows land in `errors_right` (the
    dead-letter contract holds per side, not just for the left)."""
    from gush_ray.datagen import write_pages_dir
    from gush_ray.pipelines.epoch_loop import StreamingJob

    left = str(tmp_path / "left")
    right = str(tmp_path / "right")
    write_pages_dir(left, n_urls=200, seed=21, n_epochs=3)
    write_pages_dir(right, n_urls=200, seed=22, n_epochs=3)

    job = StreamingJob(
        left, str(tmp_path / "out"), num_partitions=4,
        right_dir=right, right_raw_ts_col="warc_ts",
        join_spec=JoinSpec(-HALF_H, HALF_H, left_cols=("version",),
                           right_cols=()),
    )
    res = job.run()
    assert res["completed"] == 2
    errs_r = job.read_output("errors_right")
    assert len(errs_r) > 0           # malformed right rows preserved
    errs_l = job.read_output("errors")
    assert len(errs_l) > 0
    joined = job.read_output("joined")
    assert {"url", "l_ts_us", "r_ts_us"} <= set(joined.columns)


def test_joinspec_rejects_colliding_output_names():
    """The join output is one flat namespace — a payload name on both
    sides used to silently overwrite the left values with the right's
    (and drift the empty-epoch schema); now loud at construction."""
    with pytest.raises(ValueError, match="share output names"):
        JoinSpec(-10, 10, left_cols=("pay",), right_cols=("pay",))
    with pytest.raises(ValueError, match="timestamp output"):
        JoinSpec(-10, 10, left_cols=("l_ts_us",))


def test_positive_low_bound_right_rows_join_buffered_lefts():
    """Regression (round-3 review): with low_us > 0 the admission cut
    r.ts - low >= wm dropped NON-late right rows whose only partners
    were already-buffered lefts; the threshold is wm + min(low, 0).
    Incremental join over epochs must equal the batch brute force for
    a strictly positive window too."""
    rng = np.random.RandomState(11)
    LOW, HIGH = 10, 100
    ldf = _mk(rng, 300, 12, 1000)
    rdf = _mk(rng, 300, 12, 1000)
    spec = JoinSpec(LOW, HIGH, left_cols=(), right_cols=())
    bounds = [0, 300, 650, 10**9]
    st = StreamJoinState("k", "ts_us", spec)
    got = []
    for e in range(3):
        lo, hi = bounds[e], bounds[e + 1]
        new_l = ldf[(ldf.ts_us >= lo) & (ldf.ts_us < hi)]
        new_r_df = rdf[(rdf.ts_us >= lo) & (rdf.ts_us < hi)]
        wm = lo
        # mirror store._process_join's admission with the fixed cut
        ts = new_r_df["ts_us"].to_numpy()
        new_r_df = new_r_df[(ts - min(LOW, 0)) >= wm]
        got.append(st.process_epoch(new_l, new_r_df))
        st.prune(wm)
    got = pd.concat(got, ignore_index=True)
    want = brute_pairs(ldf, rdf, "k", "ts_us", "ts_us", LOW, HIGH)
    assert len(got) == len(want)
    assert sorted(zip(got["k"], got["l_ts_us"], got["r_ts_us"])) == sorted(
        zip(want["k"], want["ts_us_l"].astype(np.int64),
            want["ts_us_r"].astype(np.int64)))


# ------------------------------------------------------------ asof mode


def brute_asof(ldf, rdf, key, ts):
    """Independent O(n^2) oracle: latest same-key left with
    l.ts <= r.ts, per right row (inner)."""
    rows = []
    for _, r in rdf.iterrows():
        cand = ldf[(ldf[key] == r[key]) & (ldf[ts] <= r[ts])]
        if len(cand):
            top = cand.sort_values(ts, kind="mergesort").iloc[-1]
            rows.append((r[key], int(top[ts]), int(r[ts]),
                         int(top["pay"]), int(r["rpay"])))
    return sorted(rows)


def test_asof_drain_equals_brute_force():
    """Epoch-wise absorb + watermark-gated drain over random streams
    equals the brute-force temporal join; each right row emits at most
    once; the left buffer stays pruned to latest-per-key + future."""
    rng = np.random.RandomState(7)
    ldf = _mk(rng, 200, 8, 1000)
    # distinct (k, ts) per side keeps the oracle's argmax unambiguous
    ldf = ldf.drop_duplicates(["k", "ts_us"]).reset_index(drop=True)
    rdf = _mk(rng, 200, 8, 1000).rename(columns={"pay": "rpay"})
    spec = JoinSpec(0, 0, left_cols=("pay",), right_cols=("rpay",),
                    mode="asof")
    st = StreamJoinState("k", "ts_us", spec)
    bounds = [0, 300, 650, 10**9]
    got = []
    for e in range(3):
        lo, hi = bounds[e], bounds[e + 1]
        out = st.process_epoch(
            ldf[(ldf.ts_us >= lo) & (ldf.ts_us < hi)],
            rdf[(rdf.ts_us >= lo) & (rdf.ts_us < hi)])
        assert len(out) == 0  # absorb-only; emission is wm-gated
        got.append(st.drain_asof(lo))
    got.append(st.drain_asof(10**18))
    out = pd.concat(got, ignore_index=True)
    want = brute_asof(ldf, rdf, "k", "ts_us")
    assert sorted(map(tuple, out[["k", "l_ts_us", "r_ts_us", "pay",
                                  "rpay"]].itertuples(index=False))) \
        == want
    # left buffer fully pruned to latest-per-key after the final drain
    assert len(st.bufL) <= ldf["k"].nunique()
    assert len(st.bufR) == 0


def test_asof_state_snapshot_restore_continues_identically():
    rng = np.random.RandomState(9)
    ldf = _mk(rng, 120, 5, 800).drop_duplicates(["k", "ts_us"])
    rdf = _mk(rng, 120, 5, 800).rename(columns={"pay": "rpay"})
    spec = JoinSpec(0, 0, left_cols=("pay",), right_cols=("rpay",),
                    mode="asof")

    a = StreamJoinState("k", "ts_us", spec)
    a.process_epoch(ldf[ldf.ts_us < 400], rdf[rdf.ts_us < 400])
    a.drain_asof(300)
    st = a.state()

    b = StreamJoinState("k", "ts_us", spec)
    b.restore(st)
    for j in (a, b):
        j.process_epoch(ldf[ldf.ts_us >= 400], rdf[rdf.ts_us >= 400])
    pd.testing.assert_frame_equal(a.drain_asof(10**18),
                                  b.drain_asof(10**18))


def test_asof_spec_validation():
    with pytest.raises(ValueError):
        JoinSpec(0, 0, mode="nope")
    with pytest.raises(ValueError):
        JoinSpec(-5, 5, mode="asof")  # bounds must be 0 in asof mode


def _run_asof_job(pages, clicks, out_dir, **kw):
    from gush_ray.pipelines.epoch_loop import StreamingJob

    return StreamingJob(
        pages, out_dir, num_partitions=4,
        right_dir=clicks,
        join_spec=JoinSpec(0, 0, mode="asof", left_cols=("version",),
                           right_cols=("click_id",)),
        **kw,
    )


def test_streaming_asof_join_matches_batch_oracle(
        ray_session, join_job_dirs, tmp_path):
    """Streaming temporal join at P=4 equals the batch asof oracle over
    (changes output x clicks): every click pairs with the latest
    non-late change version of its url at-or-before the click."""
    pages, clicks = join_job_dirs
    job = _run_asof_job(pages, clicks, str(tmp_path / "out"),
                        run_id="asof_e2e")
    res = job.run()
    assert res["completed"] == 3

    joined = job.read_output("joined")
    changes = job.read_output("changes")
    assert len(joined) > 0
    # emit-once: each click appears at most once
    assert not joined.duplicated(["url", "r_ts_us", "click_id"]).any()

    import glob as g

    import pyarrow.parquet as pq
    clk = pd.concat(
        [pq.read_table(f).to_pandas()
         for f in sorted(g.glob(f"{clicks}/epoch=*/part-*.parquet"))],
        ignore_index=True,
    )
    clk["ts_us"] = clk["ts"].astype("int64")

    ch = changes[["url", "ts_us", "version"]].sort_values(
        "ts_us", kind="mergesort")
    want = pd.merge_asof(
        clk[["url", "ts_us", "click_id"]].sort_values(
            "ts_us", kind="mergesort"),
        ch.rename(columns={"ts_us": "l_ts_us"}),
        left_on="ts_us", right_on="l_ts_us", by="url",
        direction="backward", allow_exact_matches=True,
    )
    want = want[want["l_ts_us"].notna()]
    gs = sorted(zip(joined["url"], joined["l_ts_us"], joined["r_ts_us"],
                    joined["version"], joined["click_id"]))
    ws = sorted(zip(want["url"],
                    want["l_ts_us"].astype(np.int64),
                    want["ts_us"].astype(np.int64),
                    want["version"].astype(np.int64),
                    want["click_id"]))
    assert gs == ws


def test_streaming_asof_join_kill_resume_parity(
        ray_session, join_job_dirs, tmp_path):
    pages, clicks = join_job_dirs

    full = _run_asof_job(pages, clicks, str(tmp_path / "full"),
                         run_id="aj_full")
    full.run()
    want = full.read_output("joined")
    assert len(want) > 0

    part = _run_asof_job(pages, clicks, str(tmp_path / "part"),
                         run_id="aj_part")
    part.run(stop_after=2)
    resumed = _run_asof_job(pages, clicks, str(tmp_path / "part"),
                            run_id="aj_part2")
    res = resumed.run()
    assert res["completed"] == 3
    got = resumed.read_output("joined")

    key = ["url", "l_ts_us", "r_ts_us", "version", "click_id"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key).reset_index(drop=True),
        want[key].sort_values(key).reset_index(drop=True),
    )


def test_asof_outer_emits_unmatched_rights():
    """LEFT OUTER asof: rights with no earlier same-key left emit with
    null l_ts_us / left payload; matched rows equal the inner run; the
    integer left payload stays Arrow int64 (nullable), not float."""
    import pyarrow as pa

    ldf = pd.DataFrame({"k": ["a", "a"], "ts_us": [100, 300],
                        "pay": [1, 2]})
    rdf = pd.DataFrame({"k": ["a", "a", "b"], "ts_us": [50, 200, 60],
                        "rpay": [10, 11, 12]})
    spec = JoinSpec(0, 0, left_cols=("pay",), right_cols=("rpay",),
                    mode="asof", outer=True)
    st = StreamJoinState("k", "ts_us", spec)
    st.process_epoch(ldf, rdf)
    out = st.drain_asof(10**18)
    out = out.sort_values(["k", "r_ts_us"]).reset_index(drop=True)
    assert len(out) == 3
    # a@50 precedes every left; b has no lefts at all
    assert out.loc[0, "k"] == "a" and pd.isna(out.loc[0, "l_ts_us"])
    assert pd.isna(out.loc[0, "pay"])
    assert out.loc[1, "l_ts_us"] == 100 and out.loc[1, "pay"] == 1
    assert out.loc[2, "k"] == "b" and pd.isna(out.loc[2, "pay"])
    # nullable Int64 -> Arrow int64 with nulls (schema == inner parts)
    t = pa.Table.from_pandas(out, preserve_index=False)
    assert t.schema.field("l_ts_us").type == pa.int64()
    assert t.schema.field("pay").type == pa.int64()

    # inner mode on the same input = the matched subset
    st2 = StreamJoinState("k", "ts_us", JoinSpec(
        0, 0, left_cols=("pay",), right_cols=("rpay",), mode="asof"))
    st2.process_epoch(ldf, rdf)
    inner = st2.drain_asof(10**18)
    assert len(inner) == 1 and inner.loc[0, "pay"] == 1


def test_asof_outer_spec_validation():
    with pytest.raises(ValueError, match="only implemented for"):
        JoinSpec(-5, 5, outer=True)
