"""Streaming == batch equivalence: the streaming engine run over the
events table micro-batched into epochs must reproduce the batch/DuckDB
window and session results exactly (the north rule's 'output rows must
match reference semantics for the same input stream + watermark')."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gush_ray.pipelines.epoch_loop import StreamingJob

SF_DIR = "/root/testdata/sf0.001"
SIX_H_US = 6 * 3600 * 1_000_000
GAP_US = 1_800_000_000


@pytest.fixture(scope="module")
def events_epochs(tmp_path_factory):
    """events sorted by ts, cut into 3 epoch shard dirs (a micro-batched
    stream of the exact same rows the batch oracles see)."""
    d = tmp_path_factory.mktemp("events_stream")
    t = pq.read_table(f"{SF_DIR}/events.parquet")
    t = t.sort_by([("ts", "ascending")])
    n = t.num_rows
    cuts = [0, n // 3, 2 * n // 3, n]
    for e in range(3):
        sub = t.slice(cuts[e], cuts[e + 1] - cuts[e])
        ed = os.path.join(str(d), f"epoch={e:04d}")
        os.makedirs(ed)
        per = max(1, sub.num_rows // 4)
        for k in range(4):
            shard = sub.slice(k * per, per if k < 3 else sub.num_rows - 3 * per)
            pq.write_table(shard, os.path.join(ed, f"part-{k:04d}.parquet"))
    return str(d)


def test_streaming_windows_and_sessions_match_batch_oracle(
    events_epochs, tmp_path
):
    job = StreamingJob(
        events_epochs,
        str(tmp_path / "out"),
        run_id="sbeq",
        num_partitions=4,
        pattern=None,
        window_size_us=SIX_H_US,
        session_gap_us=GAP_US,
        window_group_cols=("event_type",),
        key_col="user_id",
        raw_ts_col="ts",
    )
    job.run()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )

    # ---- tumbling windows (W1) -------------------------------------
    w = job.read_output("windows")
    got_w = (
        w.groupby(["event_type", "window_id"], as_index=False)["n"].sum()
        .sort_values(["event_type", "window_id"]).reset_index(drop=True)
    )
    want_w = con.execute("""
        SELECT event_type, epoch_us(ts) // 21600000000 AS window_id,
               count(*) AS n
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """).fetchdf()
    pd.testing.assert_frame_equal(
        got_w, want_w.astype(got_w.dtypes.to_dict())
    )

    # ---- session windows (W4) --------------------------------------
    s = pd.concat([job.read_output("sessions"),
                   job.read_output("sessions_wm")], ignore_index=True)
    cols = ["user_id", "session_start_us", "session_end_us", "n_events"]
    got_s = s[cols].sort_values(cols).reset_index(drop=True)
    want_s = con.execute("""
        WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
        x AS (
          SELECT user_id, tus,
                 CASE WHEN lag(tus) OVER w IS NULL
                           OR tus - lag(tus) OVER w > 1800000000
                      THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)
        ),
        y AS (
          SELECT user_id, tus,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY tus
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM x
        )
        SELECT user_id, min(tus) AS session_start_us,
               max(tus) AS session_end_us, count(*) AS n_events
        FROM y GROUP BY user_id, sid
    """).fetchdf()[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_s, want_s.astype(got_s.dtypes.to_dict())
    )

    # exactly-once accounting: every input row became exactly one change
    ch = job.read_output("changes")
    assert len(ch) == 1000
    assert not ch.duplicated(["user_id", "ts_us"]).any()


def test_streaming_sliding_windows_match_batch_oracle(events_epochs, tmp_path):
    """Streaming sliding windows (6h size / 2h slide) across epochs equal
    the CROSS JOIN range() batch oracle."""
    job = StreamingJob(
        events_epochs, str(tmp_path / "slide_out"), run_id="sbeq-slide",
        num_partitions=4, pattern=None,
        window_size_us=SIX_H_US, session_gap_us=GAP_US,
        window_group_cols=("event_type",),
        key_col="user_id", raw_ts_col="ts",
    )
    job.params.window_slide_us = 2 * 3600 * 1_000_000
    job.run()
    w = job.read_output("windows")
    got = (
        w.groupby(["event_type", "window_id"], as_index=False)["n"].sum()
        .sort_values(["event_type", "window_id"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    want = con.execute("""
        SELECT event_type, (epoch_us(ts) // 7200000000) - r.range AS window_id,
               count(*) AS n
        FROM events CROSS JOIN range(3) r
        GROUP BY 1, 2 ORDER BY 1, 2
    """).fetchdf()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_streaming_window_quantiles_match_batch_oracle(
    events_epochs, tmp_path
):
    """Streaming windowed EXACT quantiles (two-stage dataflow:
    per-partition value histograms -> global merge task) equal DuckDB's
    quantile_disc per (event_type, window) bit-exactly, are
    P-independent, and survive kill->resume identically."""
    QS = (0.0, 0.5, 0.95, 1.0)

    def run(out, run_id, P, **kw):
        job = StreamingJob(
            events_epochs, out, run_id=run_id, num_partitions=P,
            pattern=None, window_size_us=SIX_H_US, session_gap_us=GAP_US,
            window_group_cols=("event_type",), key_col="user_id",
            raw_ts_col="ts", value_col="value", window_quantiles=QS,
        )
        res = job.run(**kw)
        return job, res

    cols = ["event_type", "window_id", "q", "value", "n"]

    def norm(df):
        return df[cols].sort_values(cols).reset_index(drop=True)

    job4, _ = run(str(tmp_path / "p4"), "wq-p4", 4)
    got = norm(job4.read_output("quantiles"))
    job4.kill_actors()
    assert len(got) > 0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    want = con.execute(
        "WITH b AS (SELECT event_type, epoch_us(ts) // 21600000000 AS "
        "window_id, value FROM events) SELECT * FROM ("
        + " UNION ALL ".join(
            f"SELECT event_type, window_id, {q} AS q, "
            f"quantile_disc(value, {q}) AS value, count(value) AS n "
            "FROM b GROUP BY 1, 2"
            for q in QS)
        + ") ORDER BY 1, 2, 3"
    ).fetchdf()
    pd.testing.assert_frame_equal(got, norm(want.astype(
        got.dtypes.to_dict())))

    # P-independence: the merged stream is a pure function of the
    # global histograms, so P=1 produces IDENTICAL rows
    job1, _ = run(str(tmp_path / "p1"), "wq-p1", 1)
    pd.testing.assert_frame_equal(got, norm(job1.read_output("quantiles")))
    job1.kill_actors()

    # kill after epoch 0 commits, resume: identical stream (the winq
    # histograms ride the snapshot chain)
    jb1, r1 = run(str(tmp_path / "res"), "wq-r1", 4, stop_after=2)
    assert r1["completed"] == 1
    jb1.kill_actors()
    jb2, r2 = run(str(tmp_path / "res"), "wq-r2", 4, resume=True)
    assert r2["completed"] == 2
    pd.testing.assert_frame_equal(got, norm(jb2.read_output("quantiles")))
    jb2.kill_actors()


def test_streaming_nfa_matches_sql_oracle(events_epochs, tmp_path):
    """The STREAMING NFA (cross-epoch partial-match state) over the
    micro-batched events stream equals the batch SQL self-join oracle."""
    from gush_ray.stages.nfa import Pattern, Step

    pat = Pattern(
        steps=(Step("click", "event_type", "click"),
               Step("purchase", "event_type", "purchase")),
        within_us=3600 * 1_000_000, key="user_id", ts_col="ts_us",
        id_col="event_id",
    )
    job = StreamingJob(
        events_epochs, str(tmp_path / "nfa_out"), run_id="sbeq-nfa",
        num_partitions=4, pattern=pat, window_size_us=SIX_H_US,
        session_gap_us=GAP_US, window_group_cols=("event_type",),
        key_col="user_id", raw_ts_col="ts",
    )
    job.run()
    m = job.read_output("matches")
    got = (m[["user_id", "click_id", "purchase_id"]]
           .sort_values(["user_id", "click_id", "purchase_id"])
           .reset_index(drop=True))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    want = con.execute("""
        SELECT a.user_id AS user_id, a.event_id AS click_id,
               b.event_id AS purchase_id
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND a.event_type = 'click' AND b.event_type = 'purchase'
         AND b.ts > a.ts
         AND epoch_us(b.ts) - epoch_us(a.ts) <= 3600000000
        ORDER BY 1, 2, 3
    """).fetchdf().reset_index(drop=True)
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_continuous_ingestion_matches_batch_run(tmp_path):
    """Live-tail mode: epochs written concurrently with a running job
    (ready markers, then a stop marker) must produce output identical to
    a batch run over the same epochs."""
    import shutil
    import threading
    import time as _time

    from gush_ray.datagen import write_pages_dir

    src = str(tmp_path / "src_pages")
    write_pages_dir(src, n_urls=300, seed=33, n_epochs=4)

    # batch reference over the full input
    batch_out = str(tmp_path / "batch_out")
    jb = StreamingJob(src, batch_out, run_id="contB", num_partitions=4)
    jb.run()

    # live dir: a writer thread moves epochs in one by one with markers
    live = str(tmp_path / "live_pages")
    os.makedirs(live)

    def writer():
        for e in range(4):
            _time.sleep(0.4)
            name = f"epoch={e:04d}"
            shutil.copytree(os.path.join(src, name),
                            os.path.join(live, name + ".tmp"))
            os.rename(os.path.join(live, name + ".tmp"),
                      os.path.join(live, name))
            open(os.path.join(live, name, "_READY"), "w").close()
        open(os.path.join(live, "_END"), "w").close()

    t = threading.Thread(target=writer)
    t.start()
    live_out = str(tmp_path / "live_out")
    jl = StreamingJob(live, live_out, run_id="contL", num_partitions=4)
    res = jl.run_continuous(poll_interval_s=0.1)
    t.join()
    assert res["finalized"] and res["completed"] == 3

    for stream, cols in [
        ("changes", ["url", "ts_us", "version", "change_kind"]),
        ("windows", ["lang", "change_kind", "window_id", "n"]),
        ("matches", ["url", "first_id", "recrawl_id", "start_us"]),
    ]:
        a = jb.read_output(stream)
        b = jl.read_output(stream)
        a = a[cols].sort_values(cols).reset_index(drop=True)
        b = b[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b), stream


def test_continuous_ingestion_idle_timeout_keeps_stream_open(tmp_path):
    """No stop marker + idle timeout → return WITHOUT finalizing; a later
    continuous run resumes and finalizes with identical totals."""
    import shutil

    from gush_ray.datagen import write_pages_dir

    src = str(tmp_path / "src2")
    write_pages_dir(src, n_urls=200, seed=44, n_epochs=3)
    live = str(tmp_path / "live2")
    os.makedirs(live)
    for e in range(2):  # only the first two epochs present initially
        name = f"epoch={e:04d}"
        shutil.copytree(os.path.join(src, name), os.path.join(live, name))
        open(os.path.join(live, name, "_READY"), "w").close()

    out = str(tmp_path / "out2")
    j1 = StreamingJob(live, out, run_id="idle1", num_partitions=4)
    r1 = j1.run_continuous(poll_interval_s=0.05, idle_timeout_s=1.0)
    assert not r1["finalized"] and r1["completed"] == 1
    assert not j1.sink.final_committed()

    # the missing epoch arrives, plus the stop marker → resume + finalize
    name = "epoch=0002"
    shutil.copytree(os.path.join(src, name), os.path.join(live, name))
    open(os.path.join(live, name, "_READY"), "w").close()
    open(os.path.join(live, "_END"), "w").close()
    j2 = StreamingJob(live, out, run_id="idle2", num_partitions=4)
    r2 = j2.run_continuous(poll_interval_s=0.05)
    assert r2["finalized"] and r2["completed"] == 2

    # totals equal a batch run over the same three epochs
    ref_out = str(tmp_path / "ref2")
    jr = StreamingJob(src, ref_out, run_id="idleR", num_partitions=4)
    jr.run()
    a = jr.read_output("changes")
    b = j2.read_output("changes")
    cols = ["url", "ts_us", "version", "change_kind"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True),
    )


def test_continuous_mode_quantiles_and_hll_match_batch(tmp_path):
    """The seventh-wave window analytics (exact quantiles + HLL
    distinct, both second-stage merge tasks) produce identical streams
    in live-tail mode and in a batch run over the same epochs."""
    import shutil
    import threading
    import time as _time

    from gush_ray.datagen import write_pages_dir

    src = str(tmp_path / "src_pages")
    write_pages_dir(src, n_urls=300, seed=44, n_epochs=3)

    def mk(pages, out, run_id):
        return StreamingJob(
            pages, out, run_id=run_id, num_partitions=4,
            value_col="version", window_quantiles=(0.5, 0.95),
            window_hll_p=12,
        )

    jb = mk(src, str(tmp_path / "batch_out"), "cq_b")
    jb.run()

    live = str(tmp_path / "live_pages")
    os.makedirs(live)

    def writer():
        for e in range(3):
            _time.sleep(0.3)
            name = f"epoch={e:04d}"
            shutil.copytree(os.path.join(src, name),
                            os.path.join(live, name + ".tmp"))
            os.rename(os.path.join(live, name + ".tmp"),
                      os.path.join(live, name))
            open(os.path.join(live, name, "_READY"), "w").close()
        open(os.path.join(live, "_END"), "w").close()

    t = threading.Thread(target=writer)
    t.start()
    jl = mk(live, str(tmp_path / "live_out"), "cq_l")
    res = jl.run_continuous(poll_interval_s=0.1)
    t.join()
    assert res["finalized"]

    for stream, cols in [
        ("quantiles", ["lang", "change_kind", "window_id", "q",
                       "value", "n"]),
        ("window_hll", ["lang", "change_kind", "window_id", "n_est"]),
    ]:
        a = jb.read_output(stream)
        b = jl.read_output(stream)
        assert len(a) > 0
        a = a[cols].sort_values(cols).reset_index(drop=True)
        b = b[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
    jb.kill_actors()
    jl.kill_actors()
