"""End-to-end streaming job: correctness vs batch oracle + exactly-once
kill/resume parity (SURVEY.md §5 graft test plan)."""

import os
import shutil

import pandas as pd
import pytest

from gush_ray.datagen import write_pages_dir
from gush_ray.pipelines.epoch_loop import StreamingJob


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    write_pages_dir(str(d), n_urls=400, seed=21, n_epochs=3)
    return str(d)


def run_job(pages_dir, out_dir, run_id, mode="tasks", **kw):
    job = StreamingJob(pages_dir, out_dir, run_id=run_id, num_partitions=4,
                       mode=mode)
    res = job.run(**kw)
    return job, res


def norm(df: pd.DataFrame, cols) -> pd.DataFrame:
    if df.empty:
        return pd.DataFrame(columns=cols)
    return (
        df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    )


@pytest.mark.parametrize("mode", ["tasks", "actors"])
def test_streaming_end_to_end(pages_dir, tmp_path, mode):
    out = str(tmp_path / f"out-{mode}")
    job, res = run_job(pages_dir, out, run_id=f"e2e-{mode}", mode=mode)
    assert res["completed"] == 2

    changes = job.read_output("changes")
    assert len(changes) > 0
    # versions are dense per url starting at 0, insert==version 0
    g = changes.groupby("url")["version"]
    assert (g.min() == 0).all()
    assert (g.max() + 1 == g.size()).all()
    k = changes[changes["version"] == 0]
    assert (k["change_kind"] == "insert").all()
    # no duplicate (url, version) — exactly-once
    assert not changes.duplicated(["url", "version"]).any()

    # windows: per (lang, change_kind, window) counts must equal recounting
    # the emitted change rows (conservation)
    windows = job.read_output("windows")
    assert windows["n"].sum() == len(changes)

    # matches exist (hot urls produce insert->update inside 30 min often)
    matches = job.read_output("matches")
    assert {"url", "first_id", "recrawl_id"} <= set(matches.columns)

    # manifests carry lineage + metrics
    man = job.sink.read_manifest(0)
    assert {"epoch", "watermark_us", "partitions"} <= set(man)
    assert any("rows_in" in p for p in man["partitions"])
    job.kill_actors()


@pytest.mark.parametrize("mode", ["tasks", "actors"])
def test_kill_resume_parity(pages_dir, tmp_path, mode):
    out_a = str(tmp_path / f"uninterrupted-{mode}")
    out_b = str(tmp_path / f"resumed-{mode}")

    job_a, _ = run_job(pages_dir, out_a, run_id=f"rA-{mode}", mode=mode)
    job_a.kill_actors()

    # crash after epoch 1 commits: stop, kill state (actors / in-memory),
    # then resume from the committed manifests + snapshots
    job_b1, r1 = run_job(pages_dir, out_b, run_id=f"rB1-{mode}",
                         mode=mode, stop_after=2)
    assert r1["completed"] == 1
    job_b1.kill_actors()

    job_b2, r2 = run_job(pages_dir, out_b, run_id=f"rB2-{mode}",
                         mode=mode, resume=True)
    assert r2["completed"] == 2

    for stream, cols in [
        ("changes", ["url", "ts_us", "version", "change_kind"]),
        ("windows", ["lang", "change_kind", "window_id", "n"]),
        ("matches", ["url", "first_id", "recrawl_id", "start_us"]),
        ("late", ["url", "ts_us"]),
    ]:
        a = norm(job_a.read_output(stream), cols)
        b = norm(job_b2.read_output(stream), cols)
        pd.testing.assert_frame_equal(a, b), stream

    # sessions: union of in-process closes and watermark closes
    cols = ["url", "session_start_us", "session_end_us", "n_events"]
    a = pd.concat([job_a.read_output("sessions"),
                   job_a.read_output("sessions_wm")])
    b = pd.concat([job_b2.read_output("sessions"),
                   job_b2.read_output("sessions_wm")])
    pd.testing.assert_frame_equal(norm(a, cols), norm(b, cols))
    job_b2.kill_actors()


def test_mode_parity(pages_dir, tmp_path):
    """tasks-mode and actors-mode must produce identical outputs."""
    out_t = str(tmp_path / "mode-tasks")
    out_a = str(tmp_path / "mode-actors")
    jt, _ = run_job(pages_dir, out_t, run_id="mpT", mode="tasks")
    ja, _ = run_job(pages_dir, out_a, run_id="mpA", mode="actors")
    for stream, cols in [
        ("changes", ["url", "ts_us", "version", "change_kind"]),
        ("windows", ["lang", "change_kind", "window_id", "n"]),
        ("matches", ["url", "first_id", "recrawl_id", "start_us"]),
        ("late", ["url", "ts_us"]),
    ]:
        a = norm(jt.read_output(stream), cols)
        b = norm(ja.read_output(stream), cols)
        pd.testing.assert_frame_equal(a, b), stream
    ja.kill_actors()


def test_rerun_completed_is_noop(pages_dir, tmp_path):
    out = str(tmp_path / "noop")
    job, _ = run_job(pages_dir, out, run_id="noop1")
    job.kill_actors()
    before = job.read_output("windows")
    job2, res = run_job(pages_dir, out, run_id="noop2", resume=True)
    assert res.get("already_done")
    after = job2.read_output("windows")
    pd.testing.assert_frame_equal(
        norm(before, list(before.columns)), norm(after, list(after.columns))
    )


def test_reduce_task_retry_idempotent(pages_dir, tmp_path):
    """A retried reduce (same epoch, same snapshot-in) must write
    byte-identical outputs and an identical snapshot."""
    import os
    import ray
    from gush_ray.pipelines.epoch_loop import (
        StreamingJob, _map_shard, _reduce_partition, _shard_files,
    )

    out = str(tmp_path / "retry")
    job = StreamingJob(pages_dir, out, run_id="retry", num_partitions=2)
    path = job.epoch_files()[0]
    shards = _shard_files(path)
    refsets = [
        _map_shard.options(num_returns=1 + job.P).remote(s, job.cfg, job.P)
        for s in shards
    ]
    metas = ray.get([rs[0] for rs in refsets])

    def run_reduce(snap_out):
        return ray.get(
            _reduce_partition.remote(
                0, 0, None, snap_out, out, job.params,
                list(range(len(metas))), [], [], [], [], -(1 << 62),
                *[rs[1] for rs in refsets],
            )
        )

    m1 = run_reduce(str(tmp_path / "s1.pkl"))
    f1 = open(f"{out}/changes/epoch=00000/part-00000.parquet", "rb").read()
    m2 = run_reduce(str(tmp_path / "s2.pkl"))  # the "retry"
    f2 = open(f"{out}/changes/epoch=00000/part-00000.parquet", "rb").read()
    # phase timings (t_*/p_*) are diagnostics and differ per run; only the
    # semantic metrics must be replay-identical
    def sem(m):
        return {k: v for k, v in m.items()
                if not k.startswith(("t_", "p_"))}

    assert sem(m1) == sem(m2)
    assert f1 == f2
    assert (open(str(tmp_path / "s1.pkl"), "rb").read()
            == open(str(tmp_path / "s2.pkl"), "rb").read())


def test_run_job_cli(pages_dir, tmp_path):
    from gush_ray.run_job import main

    out = str(tmp_path / "cli")
    rc = main(["--pages-dir", pages_dir, "--out-dir", out,
               "--num-partitions", "2", "--run-id", "cli"])
    assert rc == 0
    import os
    assert os.path.isdir(os.path.join(out, "_manifest"))


def test_streaming_dim_join(pages_dir, tmp_path):
    """Broadcast dimension join inside the streaming loop: change rows
    carry category/weight; windows key on the joined dimension."""
    from gush_ray.datagen import gen_dim_sites

    out = str(tmp_path / "dimjoin")
    dim = gen_dim_sites(100).to_pandas()
    job = StreamingJob(pages_dir, out, run_id="dimj", num_partitions=4,
                       dim_df=dim,
                       window_group_cols=("category", "change_kind"))
    job.run()
    ch = job.read_output("changes")
    assert {"category", "weight"} <= set(ch.columns)
    assert ch["category"].notna().all()
    w = job.read_output("windows")
    assert set(w["category"].unique()) <= {"news", "shop", "blog", "forum"}
    assert w["n"].sum() == len(ch)
    # timings recorded in the manifest (reduce time = submit + the
    # committer-side gather, barrier-free scheduling)
    man = job.sink.read_manifest(0)
    assert {"map_sec", "reduce_submit_sec", "reduce_gather_sec",
            "n_shards"} <= set(man["timings"])


def test_error_side_output(pages_dir, tmp_path):
    """Malformed html rows land in the dead-letter 'errors' stream
    (gush's Resume path kept, not silently dropped)."""
    out = str(tmp_path / "errstream")
    job, _ = run_job(pages_dir, out, run_id="errs")
    errors = job.read_output("errors")
    assert len(errors) > 0  # datagen injects malformed html
    assert {"url", "warc_ts", "lang"} <= set(errors.columns)
    # error rows never reach the change stream
    ch = job.read_output("changes")
    assert not set(errors["url"]) & set(
        ch.merge(errors, on=["url", "warc_ts"], how="inner")["url"]
    )


def test_finalized_stream_rejects_appended_epochs(pages_dir, tmp_path):
    import shutil as sh
    import os

    src = pages_dir
    work = str(tmp_path / "pages_copy")
    sh.copytree(src, work)
    out = str(tmp_path / "finalized")
    job, _ = run_job(work, out, run_id="fin1")
    # append the next contiguous epoch directory after finalize
    epochs = sorted(os.listdir(work))
    sh.copytree(os.path.join(work, epochs[0]),
                os.path.join(work, f"epoch={len(epochs):04d}"))
    job2 = StreamingJob(work, out, run_id="fin2", num_partitions=4)
    with pytest.raises(ValueError, match="finalized"):
        job2.run(resume=True)


def test_many_empty_partitions_still_close_windows(pages_dir, tmp_path):
    """P far above the key spread: idle partitions must not pin the
    watermark, windows still close, totals conserve."""
    out = str(tmp_path / "sparseP")
    job = StreamingJob(pages_dir, out, run_id="sparse", num_partitions=64)
    res = job.run()
    assert res["completed"] == 2
    ch = job.read_output("changes")
    w = job.read_output("windows")
    assert w["n"].sum() == len(ch) > 0
    # non-final epochs must have a real (finite) watermark
    man = job.sink.read_manifest(1)
    assert man["watermark_us"] > -(1 << 61)


def test_commit_failure_fails_run(pages_dir, tmp_path):
    """A failing manifest commit in the background committer must fail
    run() loudly — never finalize a stream with missing epoch manifests
    (resume would report already_done and readers would omit data)."""
    out = str(tmp_path / "commitfail")
    job = StreamingJob(pages_dir, out, run_id="cfail", num_partitions=2)

    def boom(*a, **kw):
        raise OSError("ENOSPC (simulated)")

    job.sink.commit_epoch = boom
    with pytest.raises(RuntimeError, match="commit failed"):
        job.run()
    assert not job.sink.final_committed()
    assert job.sink.committed_epochs() == []


def test_epoch_dirs_sorted_numerically(tmp_path):
    """Unpadded epoch=9 vs epoch=10 must order numerically, not
    lexicographically (lexicographic re-binds manifests to wrong data)."""
    import os

    d = str(tmp_path / "unpadded")
    os.makedirs(d)
    for e in range(11):
        os.makedirs(os.path.join(d, f"epoch={e}"))
    job = StreamingJob(d, str(tmp_path / "o1"), run_id="np1")
    files = job.epoch_files()
    assert [os.path.basename(f) for f in files] == \
        [f"epoch={e}" for e in range(11)]

    # a gap in the epoch numbering is a missing stream slice: loud error
    os.rename(os.path.join(d, "epoch=5"), os.path.join(d, "epoch=50"))
    with pytest.raises(ValueError, match="contiguous"):
        job.epoch_files()


def test_resume_rejects_rebound_input(pages_dir, tmp_path):
    """Resume must fail loudly when a committed epoch's manifest no longer
    matches the discovered input directory for that slot."""
    import os
    import shutil as sh

    work = str(tmp_path / "pages_rebind")
    sh.copytree(pages_dir, work)
    out = str(tmp_path / "rebind_out")
    job = StreamingJob(work, out, run_id="rb1", num_partitions=2)
    job.run(stop_after=1)  # commit epoch 0 only
    # same epoch number, different directory name → different input binding
    os.rename(os.path.join(work, "epoch=0000"), os.path.join(work, "epoch=0"))
    job2 = StreamingJob(work, out, run_id="rb2", num_partitions=2)
    with pytest.raises(ValueError, match="discovered input"):
        job2.run(resume=True)


def test_resume_rejects_shrunk_input(pages_dir, tmp_path):
    """More epochs committed than discovered → the input shrank under a
    committed stream; refuse instead of silently reprocessing from 0."""
    import os
    import shutil as sh

    work = str(tmp_path / "pages_shrink")
    sh.copytree(pages_dir, work)
    out = str(tmp_path / "shrink_out")
    job = StreamingJob(work, out, run_id="sh1", num_partitions=2)
    job.run(stop_after=2)  # commit epochs 0 and 1
    for name in sorted(os.listdir(work))[1:]:
        sh.rmtree(os.path.join(work, name))
    job2 = StreamingJob(work, out, run_id="sh2", num_partitions=2)
    with pytest.raises(ValueError, match="shrank"):
        job2.run(resume=True)


def test_streaming_dim_join_unmatched_keys(pages_dir, tmp_path):
    """Sites missing from the dimension snapshot produce null-category
    change rows — window counts must still conserve (dropna=False in the
    streaming accumulators; an earlier version silently dropped them)."""
    from gush_ray.datagen import gen_dim_sites

    out = str(tmp_path / "dimjoin_miss")
    dim = gen_dim_sites(100).to_pandas().iloc[:3]  # most sites unmatched
    job = StreamingJob(pages_dir, out, run_id="dimm", num_partitions=4,
                       dim_df=dim,
                       window_group_cols=("category", "change_kind"))
    job.run()
    ch = job.read_output("changes")
    assert ch["category"].isna().any()  # unmatched keys exist
    w = job.read_output("windows")
    assert w["n"].sum() == len(ch)      # conservation incl. null groups


# ------------------------------------------------- source idleness (W5)

def _mini_pages(base, epochs_rows):
    """Hand-built pages stream: epochs_rows = [[(url, ts_us), ...], ...]"""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    from gush_ray.extract import render_html

    for e, rows in enumerate(epochs_rows):
        d = os.path.join(base, f"epoch={e:04d}")
        os.makedirs(d)
        t = pa.table({
            "url": [u for u, _ in rows],
            "warc_ts": pa.array([ts for _, ts in rows],
                                type=pa.timestamp("us")),
            "html": pa.array(
                [render_html(u, f"hello world {ts}") for u, ts in rows],
                type=pa.binary()),
            "text": [f"hello world {ts}" for _, ts in rows],
            "lang": ["en"] * len(rows),
        })
        pq.write_table(t, os.path.join(d, "part-00.parquet"))
    return base


# with P=2: site0's url hashes to partition 1, site1's to partition 0
_URL_P1 = "https://site0.example.org/p"
_URL_P0 = "https://site1.example.org/p"
_T0 = 1_700_000_000_000_000
_HOUR = 3600 * 1_000_000


def test_idle_partition_unpins_watermark(tmp_path):
    """A partition that produced data once then went idle must not pin
    the watermark forever (Flink withIdleness semantics): with
    idle_partition_epochs set, windows close DURING the stream; without
    it they only close at the final flush. Totals agree either way, and
    a straggler row from the idle partition is late-routed — the
    documented trade-off."""
    import os

    epochs = [
        [(_URL_P1, _T0), (_URL_P0, _T0 + 1)],       # both partitions
        [(_URL_P0, _T0 + 2 * _HOUR)],               # partition 1 idle
        [(_URL_P0, _T0 + 4 * _HOUR)],               # still idle
        [(_URL_P1, _T0 + 300_000_000),              # straggler, old ts
         (_URL_P0, _T0 + 5 * _HOUR)],
    ]
    pages = _mini_pages(str(tmp_path / "pages"), epochs)

    def run(out, run_id, idle):
        j = StreamingJob(pages, str(tmp_path / out), run_id=run_id,
                         num_partitions=2, window_size_us=_HOUR,
                         idle_partition_epochs=idle)
        j.run()
        return j

    j_off = run("off", "idleOff", None)
    j_on = run("on", "idleOn", 1)

    def committed_window_slots(j):
        d = os.path.join(j.out_dir, "windows")
        return [n for n in os.listdir(d) if n != "epoch=final"] \
            if os.path.isdir(d) else []

    # without idleness the stale partition pins wm at T0 → nothing
    # closes until the final flush; with it, in-stream closes happen
    assert not committed_window_slots(j_off)
    assert committed_window_slots(j_on)

    # trade-off: the idle partition's straggler is late under idleness
    late_on = j_on.read_output("late")
    assert _URL_P1 in set(late_on["url"])
    late_off = j_off.read_output("late")
    assert late_off.empty or _URL_P1 not in set(late_off["url"])

    # conservation: windows' total count equals the non-late change rows
    for j in (j_on, j_off):
        ch = j.read_output("changes")
        w = j.read_output("windows")
        assert w["n"].sum() == len(ch)


def test_live_partition_with_stale_timestamps_is_not_idle(tmp_path):
    """A partition that keeps RECEIVING rows whose event-time max does
    not advance (duplicate / bounded out-of-order timestamps) is live,
    not idle: the watermark must not jump past its max and silently
    late-route everything it sends next. Flink's withIdleness — which
    the idleness doc claims to match — marks a partition idle only when
    NO records arrive for a duration, so idleness is keyed on row
    arrival, not on event-time advancement."""
    epochs = [
        [(_URL_P1, _T0 + 2), (_URL_P0, _T0 + 1)],
        [(_URL_P1, _T0 + 2), (_URL_P0, _T0 + 2 * _HOUR)],
        [(_URL_P1, _T0 + 2), (_URL_P0, _T0 + 4 * _HOUR)],
        [(_URL_P1, _T0 + 2), (_URL_P0, _T0 + 6 * _HOUR)],
    ]
    pages = _mini_pages(str(tmp_path / "pages"), epochs)
    j = StreamingJob(pages, str(tmp_path / "out"), run_id="liveDup",
                     num_partitions=2, window_size_us=_HOUR,
                     idle_partition_epochs=1)
    j.run()
    # the live-but-stale partition bounds the watermark throughout, so
    # none of its (repeated-timestamp) rows may be late-routed
    late = j.read_output("late")
    assert late.empty, f"live partition's rows were late-routed: {late}"


def test_idle_partition_resume_parity(tmp_path):
    """Idle counters persist in manifests: killed+resumed == uninterrupted
    with idleness enabled."""
    epochs = [
        [(_URL_P1, _T0), (_URL_P0, _T0 + 1)],
        [(_URL_P0, _T0 + 2 * _HOUR)],
        [(_URL_P0, _T0 + 4 * _HOUR)],
        [(_URL_P0, _T0 + 6 * _HOUR)],
    ]
    pages = _mini_pages(str(tmp_path / "pages"), epochs)

    def job(out, run_id):
        return StreamingJob(pages, str(tmp_path / out), run_id=run_id,
                            num_partitions=2, window_size_us=_HOUR,
                            idle_partition_epochs=2)

    ja = job("a", "ipA")
    ja.run()
    jb = job("b", "ipB1")
    jb.run(stop_after=2)
    jb2 = job("b", "ipB2")
    jb2.run(resume=True)

    for stream in ("changes", "windows", "late"):
        a = ja.read_output(stream)
        cols = list(a.columns)
        b = jb2.read_output(stream)
        pd.testing.assert_frame_equal(
            a[cols].sort_values(cols).reset_index(drop=True),
            b[cols].sort_values(cols).reset_index(drop=True)), stream


def test_resume_parity_from_every_kill_point(pages_dir, tmp_path):
    """Exactly-once must hold no matter WHERE the crash lands: for every
    epoch boundary k, a run stopped after k epochs and resumed matches
    the uninterrupted run row-for-row."""
    ref, _ = run_job(pages_dir, str(tmp_path / "ref"), run_id="kmRef")
    cols = ["url", "ts_us", "version", "change_kind"]
    want = norm(ref.read_output("changes"), cols)
    wind = norm(ref.read_output("windows"),
                ["lang", "change_kind", "window_id", "n"])

    n_epochs = 3  # the module fixture writes 3 epochs
    for k in range(1, n_epochs):
        out = str(tmp_path / f"kill{k}")
        j1, r1 = run_job(pages_dir, out, run_id=f"km{k}a", stop_after=k)
        assert r1["completed"] == k - 1
        j2, r2 = run_job(pages_dir, out, run_id=f"km{k}b", resume=True)
        assert r2["completed"] == n_epochs - 1
        pd.testing.assert_frame_equal(
            want, norm(j2.read_output("changes"), cols)), k
        pd.testing.assert_frame_equal(
            wind, norm(j2.read_output("windows"),
                       ["lang", "change_kind", "window_id", "n"])), k
        # a further resume is a no-op (already finalized)
        j3, r3 = run_job(pages_dir, out, run_id=f"km{k}c", resume=True)
        assert r3.get("already_done") or r3["completed"] == n_epochs - 1
        pd.testing.assert_frame_equal(
            want, norm(j3.read_output("changes"), cols)), k


def test_timestamp_precision_drift_does_not_corrupt_event_time(
        tmp_path, ray_session):
    """Regression (round-3 drift probe): a producer switching warc_ts
    from timestamp[us] to timestamp[ns] mid-stream used to inflate
    event time 1000x through the bare int64 cast — the watermark
    jumped past every later microsecond row (silently late-routing the
    whole stream) and the mixed-type passthrough column broke
    read_output's concat. ts_to_us now normalizes precision; outputs
    must equal a run over the same data stored uniformly in [us]."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gush_ray.datagen import write_pages_dir

    src_us = str(tmp_path / "pages_us")
    write_pages_dir(src_us, n_urls=80, seed=9, n_epochs=2)
    src_ns = str(tmp_path / "pages_ns")
    shutil.copytree(src_us, src_ns)
    e1 = os.path.join(src_ns, "epoch=0001")
    for f in os.listdir(e1):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(e1, f))
            i = t.column_names.index("warc_ts")
            t = t.set_column(i, "warc_ts",
                             t["warc_ts"].cast(pa.timestamp("ns")))
            pq.write_table(t, os.path.join(e1, f))

    ja = StreamingJob(src_us, str(tmp_path / "out_us"), run_id="us",
                      num_partitions=2)
    ra = ja.run()
    jb = StreamingJob(src_ns, str(tmp_path / "out_ns"), run_id="ns",
                      num_partitions=2)
    rb = jb.run()
    assert ra["watermark_us"] == rb["watermark_us"]  # not 1000x off
    for stream in ("changes", "windows", "sessions", "matches"):
        a = ja.read_output(stream)
        b = jb.read_output(stream)
        cols = sorted(set(a.columns) - {"warc_ts"})
        pd.testing.assert_frame_equal(
            a[cols].sort_values(cols).reset_index(drop=True),
            b[cols].sort_values(cols).reset_index(drop=True)), stream


def test_windowed_distinct_partition_exact_and_resume(pages_dir, tmp_path):
    """window_distinct: (a) P=4 per-partition n_distinct partials SUM to
    the P=1 global distinct counts per (group, window) — url is the
    exchange key, so a url lives in exactly one partition and no sketch
    is needed; (b) the per-window key sets survive kill→resume through
    the full+delta snapshot chain bit-exactly."""
    def run(out, run_id, P, **kw):
        job = StreamingJob(pages_dir, out, run_id=run_id,
                           num_partitions=P, window_distinct=True)
        res = job.run(**kw)
        return job, res

    gcols = ["lang", "change_kind", "window_id"]

    job1, _ = run(str(tmp_path / "p1"), "wd-p1", 1)
    w1 = job1.read_output("windows")
    job1.kill_actors()
    assert "n_distinct" in w1.columns
    # distinct <= count, and >=1 wherever a window exists
    assert (w1["n_distinct"] <= w1["n"]).all()
    assert (w1["n_distinct"] >= 1).all()
    # some window must actually have a repeat (hot urls recrawl within
    # 15 min) or the operator is indistinguishable from count
    assert (w1["n_distinct"] < w1["n"]).any()

    job4, _ = run(str(tmp_path / "p4"), "wd-p4", 4)
    w4 = job4.read_output("windows")
    job4.kill_actors()
    s1 = w1.groupby(gcols, as_index=False)[["n", "n_distinct"]].sum()
    s4 = w4.groupby(gcols, as_index=False)[["n", "n_distinct"]].sum()
    pd.testing.assert_frame_equal(
        s1.sort_values(gcols).reset_index(drop=True),
        s4.sort_values(gcols).reset_index(drop=True))

    # kill after epoch 1 commit, resume — parity with uninterrupted P=4
    jb1, r1 = run(str(tmp_path / "res"), "wd-r1", 4, stop_after=2)
    assert r1["completed"] == 1
    jb1.kill_actors()
    jb2, r2 = run(str(tmp_path / "res"), "wd-r2", 4, resume=True)
    assert r2["completed"] == 2
    cols = gcols + ["n", "n_distinct"]
    pd.testing.assert_frame_equal(norm(w4, cols),
                                  norm(jb2.read_output("windows"), cols))
    jb2.kill_actors()


def test_streaming_topk_p_independent_and_resume(pages_dir, tmp_path):
    """Windowed top-k (two-stage dataflow): (a) the topk stream is a
    pure function of the merged global counts, so P=1 and P=4 produce
    IDENTICAL rows (not just equal sums); (b) it always agrees with a
    recomputation from the windows stream it merged; (c) kill→resume
    rewrites the same stream."""
    def run(out, run_id, P, **kw):
        job = StreamingJob(pages_dir, out, run_id=run_id,
                           num_partitions=P, derive_host=True,
                           window_group_cols=("host",), window_topk=3)
        res = job.run(**kw)
        return job, res

    key = ["window_id", "rank", "host", "n"]

    def norm_topk(df):
        return df[key].sort_values(key).reset_index(drop=True)

    job1, _ = run(str(tmp_path / "p1"), "tk-p1", 1)
    t1, w1 = job1.read_output("topk"), job1.read_output("windows")
    job1.kill_actors()
    assert len(t1) > 0
    # ranks are 1..k per window, counts non-increasing with rank
    per_w = t1.sort_values(["window_id", "rank"]).groupby("window_id")
    for _, g in per_w:
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (g["n"].diff().dropna() <= 0).all()

    job4, _ = run(str(tmp_path / "p4"), "tk-p4", 4)
    t4 = job4.read_output("topk")
    w4 = job4.read_output("windows")
    job4.kill_actors()
    pd.testing.assert_frame_equal(norm_topk(t1), norm_topk(t4))

    # conservation: recompute global top-3 from the windows partials
    m = w4.groupby(["host", "window_id"], as_index=False)["n"].sum()
    m = m.sort_values(["window_id", "n", "host"],
                      ascending=[True, False, True], kind="mergesort")
    m["rank"] = m.groupby("window_id", sort=False).cumcount() + 1
    rec = m[m["rank"] <= 3]
    pd.testing.assert_frame_equal(norm_topk(rec), norm_topk(t4))

    # kill after epoch 1 commit, resume — identical topk stream
    jb1, r1 = run(str(tmp_path / "res"), "tk-r1", 4, stop_after=2)
    assert r1["completed"] == 1
    jb1.kill_actors()
    jb2, r2 = run(str(tmp_path / "res"), "tk-r2", 4, resume=True)
    assert r2["completed"] == 2
    pd.testing.assert_frame_equal(norm_topk(t4),
                                  norm_topk(jb2.read_output("topk")))
    jb2.kill_actors()


def test_derive_host_malformed_url_is_empty_string(tmp_path):
    """derive_host must give a non-matching url host '' (DuckDB
    regexp_extract semantics), NOT null — the topk oracle groups '' as
    its own host that sorts FIRST on an n-tie, while a null would group
    under NaN and sort last."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from gush_ray.config import EngineConfig
    from gush_ray.pipelines.epoch_loop import _map_shard

    shard = str(tmp_path / "s.parquet")
    pq.write_table(pa.table({
        "url": ["https://ok.example.org/p/1", "HTTPS://UPPER/x",
                "/relative/path"],
        "warc_ts": pa.array([1, 2, 3], type=pa.timestamp("us")),
        "lang": ["en", "en", "en"],
    }), shard)
    out = ray.get(_map_shard.options(num_returns=2).remote(
        shard, EngineConfig(), 1, None, "site", None, "url", "warc_ts",
        None, None, True))
    frag = out[1]
    hosts = dict(zip(frag["url"].to_pylist(), frag["host"].to_pylist()))
    assert hosts == {"https://ok.example.org/p/1": "ok.example.org",
                     "HTTPS://UPPER/x": "", "/relative/path": ""}


def test_streaming_window_hll_p_independent_and_resume(pages_dir, tmp_path):
    """Windowed HLL distinct (two-stage dataflow): (a) the window_hll
    stream is a pure function of each window's global key SET (register
    max is the exact HLL union), so P=1 and P=4 produce IDENTICAL rows;
    (b) estimates track the exact per-window distinct counts from a
    window_distinct run on the same input; (c) kill->resume rewrites
    the same stream."""
    def run(out, run_id, P, **kw):
        job = StreamingJob(pages_dir, out, run_id=run_id,
                           num_partitions=P, window_distinct=True,
                           window_hll_p=12)
        res = job.run(**kw)
        return job, res

    key = ["lang", "change_kind", "window_id"]

    def norm(df):
        cols = key + ["n_est"]
        return df[cols].sort_values(cols).reset_index(drop=True)

    job1, _ = run(str(tmp_path / "p1"), "hll-p1", 1)
    h1 = job1.read_output("window_hll")
    w1 = job1.read_output("windows")
    job1.kill_actors()
    assert len(h1) > 0

    job4, _ = run(str(tmp_path / "p4"), "hll-p4", 4)
    h4 = job4.read_output("window_hll")
    job4.kill_actors()
    pd.testing.assert_frame_equal(norm(h1), norm(h4))

    # accuracy: estimate within 3 + 5% of the exact distinct count
    exact = w1.groupby(key, as_index=False)["n_distinct"].sum()
    m = exact.merge(h1, on=key, validate="one_to_one")
    assert len(m) == len(exact)
    assert ((m["n_est"] - m["n_distinct"]).abs()
            <= 3 + 0.05 * m["n_distinct"]).all()

    # kill after epoch 1 commit, resume - identical stream
    jb1, r1 = run(str(tmp_path / "res"), "hll-r1", 4, stop_after=2)
    assert r1["completed"] == 1
    jb1.kill_actors()
    jb2, r2 = run(str(tmp_path / "res"), "hll-r2", 4, resume=True)
    pd.testing.assert_frame_equal(
        norm(h4), norm(jb2.read_output("window_hll")))
    jb2.kill_actors()


def test_mid_stream_schema_evolution_new_column(tmp_path):
    """A column appearing in a LATER epoch (real crawl corpora evolve
    schemas over time) must flow through the engine: earlier epochs'
    change rows read it as null, the evolved epoch's rows carry it, and
    no stage errors on the cross-epoch schema drift."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "pages")
    write_pages_dir(src, n_urls=200, seed=5, n_epochs=3)
    last = sorted(d for d in os.listdir(src) if d.startswith("epoch="))[-1]
    for f in os.listdir(os.path.join(src, last)):
        p = os.path.join(src, last, f)
        t = pq.read_table(p)
        t = t.append_column("crawl_tier",
                            pa.array(["cc-main"] * t.num_rows))
        pq.write_table(t, p)

    job = StreamingJob(src, str(tmp_path / "out"), run_id="evo",
                       num_partitions=4)
    job.run()
    ch = job.read_output("changes")
    assert "crawl_tier" in ch.columns
    evolved = ch[ch["crawl_tier"].notna()]
    assert len(evolved) > 0
    assert (evolved["crawl_tier"] == "cc-main").all()
    # pre-evolution epochs read as null, and row accounting is intact
    assert ch["crawl_tier"].isna().sum() + len(evolved) == len(ch)
    from gush_ray.fsck import audit
    assert not audit(str(tmp_path / "out"))["problems"]


def test_window_early_fire_changelog_exactly_once(pages_dir, tmp_path):
    """The window_early retraction changelog is exactly-once: a
    kill->resume run rewrites the IDENTICAL changelog rows (not merely
    a fold-equal one), and the fold equals the windows stream."""
    def run(out, run_id, **kw):
        job = StreamingJob(pages_dir, out, run_id=run_id,
                           num_partitions=4, window_early_fire=True)
        res = job.run(**kw)
        return job, res

    cols = ["lang", "change_kind", "window_id", "change", "n",
            "sum_value", "fire_seq"]

    def norm(df):
        return df[cols].sort_values(cols).reset_index(drop=True)

    full, _ = run(str(tmp_path / "full"), "ef_full")
    want = full.read_output("window_early")
    w = full.read_output("windows")
    full.kill_actors()
    assert (want["change"] == -1).any()  # retractions actually occur

    # fold == final windows totals (per group-window, across partitions)
    key = ["lang", "change_kind", "window_id"]
    fold = want.assign(n_=want["change"] * want["n"]).groupby(
        key, as_index=False)["n_"].sum()
    fold = fold[fold["n_"] != 0]
    totals = w.groupby(key, as_index=False)["n"].sum()
    m = totals.merge(fold, on=key, validate="one_to_one")
    assert len(m) == len(totals)
    assert (m["n"] == m["n_"]).all()

    part, r1 = run(str(tmp_path / "part"), "ef_p1", stop_after=2)
    assert r1["completed"] == 1
    part.kill_actors()
    resumed, _ = run(str(tmp_path / "part"), "ef_p2", resume=True)
    pd.testing.assert_frame_equal(
        norm(want), norm(resumed.read_output("window_early")))
    resumed.kill_actors()


def test_read_output_time_travel(pages_dir, tmp_path):
    """read_output(as_of_epoch=E) returns the stream exactly as it
    stood after epoch E's commit: a prefix of the full read, excluding
    later epochs and the final-flush slot; spanning compactions refuse
    (the non-destructive dual of rewind)."""
    job, _ = run_job(pages_dir, str(tmp_path / "out"), "tt")
    epochs = job.sink.committed_epochs()
    assert len(epochs) >= 2

    full = job.read_output("changes")
    prefix = job.read_output("changes", as_of_epoch=epochs[0])
    later = job.read_output("changes", as_of_epoch=epochs[-1])
    assert 0 < len(prefix) < len(full)
    # as_of the LAST epoch == every per-epoch part (final slot holds no
    # changes rows, so it equals the full read here)
    assert len(later) == len(full)
    # the prefix is a true subset of the full stream
    key = ["url", "ts_us"]
    merged = prefix[key].merge(full[key].drop_duplicates(), on=key)
    assert len(merged) == len(prefix)

    # windows DO have a final-flush slot: time travel excludes it
    w_full = job.read_output("windows")
    w_last = job.read_output("windows", as_of_epoch=epochs[-1])
    assert len(w_last) < len(w_full)

    # spanning compaction refuses, at/past the range end works
    from gush_ray.compact import compact_stream
    compact_stream(str(tmp_path / "out"), "changes")
    with pytest.raises(ValueError, match="span as_of_epoch"):
        job.read_output("changes", as_of_epoch=epochs[0])
    again = job.read_output("changes", as_of_epoch=epochs[-1])
    assert len(again) == len(full)


def test_window_early_fire_with_distinct_folds_nd(pages_dir, tmp_path):
    """Early firing composes with window_distinct: the changelog rows
    carry n_distinct, and folding sum(change*n_distinct) per (group,
    window) equals the windows stream's summed n_distinct (partition-
    exact — url is the exchange key, same argument as the windows
    stream itself)."""
    job = StreamingJob(pages_dir, str(tmp_path / "out"), run_id="efd",
                       num_partitions=4, window_distinct=True,
                       window_early_fire=True)
    job.run()
    log = job.read_output("window_early")
    w = job.read_output("windows")
    job.kill_actors()
    assert "n_distinct" in log.columns
    key = ["lang", "change_kind", "window_id"]
    fold = log.assign(nd=log["change"] * log["n_distinct"]).groupby(
        key, as_index=False)["nd"].sum()
    fold = fold[fold["nd"] != 0]
    want = w.groupby(key, as_index=False)["n_distinct"].sum()
    m = want.merge(fold, on=key, validate="one_to_one")
    assert len(m) == len(want)
    assert (m["n_distinct"] == m["nd"]).all()


def test_all_window_analytics_compose_in_one_job(pages_dir, tmp_path):
    """Integration: every stateful window feature at once — distinct
    sets, HLL registers, exact quantile histograms, early-fire
    changelog, session value aggregates, top-k — in ONE job; every
    stream lands, the cross-stream invariants hold, fsck is clean."""
    job = StreamingJob(
        pages_dir, str(tmp_path / "out"), run_id="allw",
        num_partitions=4, window_distinct=True, window_hll_p=12,
        value_col="version", window_quantiles=(0.5, 1.0),
        window_early_fire=True, session_values=True, window_topk=3,
        derive_host=True, window_group_cols=("host",),
    )
    job.run()
    streams = {s: job.read_output(s) for s in (
        "windows", "window_hll", "quantiles", "window_early", "topk",
        "sessions_wm", "changes")}
    job.kill_actors()
    for name, df in streams.items():
        assert len(df) > 0, name
    key = ["host", "window_id"]
    w = streams["windows"].groupby(key, as_index=False).agg(
        n=("n", "sum"), nd=("n_distinct", "sum"))
    # quantile n == windows n; HLL within tolerance of exact distinct;
    # early-fire fold == windows n
    qn = streams["quantiles"]
    qn = qn[qn["q"] == 1.0][key + ["n", "value"]]
    m = w.merge(qn, on=key, validate="one_to_one",
                suffixes=("_w", "_q"))
    assert len(m) == len(w) and (m["n_w"] == m["n_q"]).all()
    h = streams["window_hll"]
    mh = w.merge(h, on=key, validate="one_to_one")
    assert ((mh["n_est"] - mh["nd"]).abs() <= 3 + 0.05 * mh["nd"]).all()
    log = streams["window_early"]
    fold = log.assign(n_=log["change"] * log["n"]).groupby(
        key, as_index=False)["n_"].sum()
    fold = fold[fold["n_"] != 0]
    mf = w.merge(fold, on=key, validate="one_to_one")
    assert len(mf) == len(w) and (mf["n"] == mf["n_"]).all()
    assert {"sum_value", "min_value", "max_value"} <= set(
        streams["sessions_wm"].columns)
    from gush_ray.fsck import audit
    assert not audit(str(tmp_path / "out"))["problems"]


def test_hot_key_skew_telemetry_and_bounded_imbalance(
        ray_session, tmp_path):
    """Hot-key chaos (round-4 verdict item 7): keyed state pins a hot
    url to ONE partition by construction (same as Flink), so a url
    carrying 10% of the stream must (a) not break the job, (b) surface
    as per-epoch `skew` telemetry in the manifests (max/mean rows_in +
    the pinned argmax partition), and (c) stay within the imbalance
    bound the 10% share implies (hot partition ≈ 10% + 90%/P vs mean
    100%/P → ~1.3 at P=4; assert < 2)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from gush_ray.datagen import write_pages_dir
    from gush_ray.fsck import audit
    from gush_ray.metrics import summarize

    d = tmp_path / "hot_pages"
    write_pages_dir(str(d), n_urls=400, seed=5, n_epochs=3)
    hot = "https://hot.example.com/"
    for ep in sorted(os.listdir(d)):
        pdir = d / ep
        if not ep.startswith("epoch=") or not pdir.is_dir():
            continue
        for f in sorted(os.listdir(pdir)):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(pdir / f)
            urls = t["url"].to_pylist()
            for i in range(0, len(urls), 10):
                urls[i] = hot
            t = t.set_column(t.schema.get_field_index("url"), "url",
                             pa.array(urls, type=t["url"].type))
            pq.write_table(t, pdir / f)

    out = str(tmp_path / "hot_out")
    job = StreamingJob(str(d), out, run_id="hotskew", num_partitions=4)
    res = job.run()
    assert res["completed"] == 2
    argmaxes = set()
    for e in job.sink.committed_epochs():
        man = job.sink.read_manifest(e)
        skew = man["skew"]
        assert 1.0 <= skew["imbalance"] < 2.0, skew
        assert skew["max_rows_in"] >= skew["mean_rows_in"]
        argmaxes.add(skew["argmax_partition"])
    # the hot url pins to one partition: the argmax is stable
    assert len(argmaxes) == 1
    rep = summarize(out)
    assert rep["max_imbalance"] is not None
    assert rep["max_imbalance"] < 2.0
    # the hot partition's rows landed (conservation; fsck green)
    r = audit(out)
    assert not r["problems"], r["problems"]
    job.kill_actors()


def test_stage2_tree_fanin_equal_output(pages_dir, tmp_path,
                                        monkeypatch):
    """Round-5 verdict item 5: the per-epoch stage-2 merges (topk /
    quantiles / HLL) fan in as a TREE when P crosses the threshold —
    leaf tasks partial-merge slices of the per-partition parts, the
    root folds the leaf partials. The merges are associative
    (count/sum addition, histogram addition, register max), so the
    tree output must equal the direct single-task fold EXACTLY."""
    def run(out, run_id):
        job = StreamingJob(
            pages_dir, out, run_id=run_id, num_partitions=4,
            derive_host=True, window_group_cols=("host",),
            window_topk=3, value_col="version",
            window_quantiles=(0.5, 0.95), window_hll_p=10)
        job.run()
        return job

    jd = run(str(tmp_path / "direct"), "s2-direct")  # P=4 < 12: direct
    monkeypatch.setenv("GUSH_STAGE2_TREE_P", "2")    # force the tree
    monkeypatch.setenv("GUSH_STAGE2_BRANCH", "2")    # 2 leaves of 2
    jt = run(str(tmp_path / "tree"), "s2-tree")

    for stream in ("topk", "quantiles", "window_hll"):
        dd = jd.read_output(stream)
        dt = jt.read_output(stream)
        cols = sorted(dd.columns)
        assert list(cols) == sorted(dt.columns)
        pd.testing.assert_frame_equal(
            dd[cols].sort_values(cols).reset_index(drop=True),
            dt[cols].sort_values(cols).reset_index(drop=True))
        assert len(dd) > 0, f"{stream} produced no rows"
