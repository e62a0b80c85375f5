"""Output compaction: readers see identical rows before/after, lineage
audits stay green, and every crash window is recoverable."""

import os
import shutil

import pandas as pd
import pytest

from gush_ray.compact import compact, compact_stream, compaction_records
from gush_ray.datagen import write_pages_dir
from gush_ray.fsck import audit
from gush_ray.pipelines.epoch_loop import StreamingJob

STREAMS = ("changes", "windows", "sessions", "sessions_wm", "matches",
           "late")


@pytest.fixture()
def job(tmp_path):
    pages = str(tmp_path / "pages")
    write_pages_dir(pages, n_urls=250, seed=52, n_epochs=4)
    out = str(tmp_path / "out")
    j = StreamingJob(pages, out, run_id="cmp", num_partitions=4)
    j.run()
    return j


def read_all(j):
    return {
        s: j.read_output(s).sort_values(
            list(j.read_output(s).columns)).reset_index(drop=True)
        for s in STREAMS
    }


def count_parquet(out_dir):
    return sum(
        1 for r, _d, fs in os.walk(out_dir)
        if "_state" not in r and "_manifest" not in r
        for f in fs if f.endswith(".parquet")
    )


def test_compact_preserves_rows_and_shrinks_files(job):
    before = read_all(job)
    files_before = count_parquet(job.out_dir)
    reports = compact(job.out_dir)
    assert any(r.get("compacted") for r in reports)
    after = read_all(job)
    for s in STREAMS:
        pd.testing.assert_frame_equal(before[s], after[s]), s
    assert count_parquet(job.out_dir) < files_before
    rep = audit(job.out_dir)
    assert rep["ok"], rep["problems"]
    assert rep["compactions"].get("changes") == [[0, 3]]


def test_compact_upto_then_rest(job):
    before = read_all(job)
    r1 = compact_stream(job.out_dir, "changes", upto=1)
    assert r1["compacted"] and (r1["from"], r1["to"]) == (0, 1)
    r2 = compact_stream(job.out_dir, "changes")
    assert r2["compacted"] and (r2["from"], r2["to"]) == (2, 3)
    assert compaction_records(job.out_dir)["changes"] == [(0, 1), (2, 3)]
    after = read_all(job)
    pd.testing.assert_frame_equal(before["changes"], after["changes"])
    assert audit(job.out_dir)["ok"]


def test_crash_before_record_is_invisible(job):
    """A compacted slot WITHOUT its record must not change what readers
    see, and the next compact run rebuilds it."""
    before = read_all(job)
    slot = os.path.join(job.out_dir, "changes", "compact=00000-00003")
    os.makedirs(slot)
    with open(os.path.join(slot, "part-00000.parquet"), "wb") as f:
        f.write(b"half-written junk")
    pd.testing.assert_frame_equal(before["changes"],
                                  read_all(job)["changes"])
    r = compact_stream(job.out_dir, "changes")
    assert r["compacted"]
    pd.testing.assert_frame_equal(before["changes"],
                                  read_all(job)["changes"])
    assert audit(job.out_dir)["ok"]


def test_crash_before_cleanup_reads_compacted_and_heals(job):
    """Record committed but old epoch dirs still present: readers use
    the compacted slot (no double counting); the next run cleans up."""
    before = read_all(job)
    stash = os.path.join(job.out_dir, "_stash")
    shutil.copytree(os.path.join(job.out_dir, "changes"), stash)
    compact_stream(job.out_dir, "changes")
    # resurrect the pre-compaction epoch dirs (as if cleanup was lost)
    for name in os.listdir(stash):
        if name.startswith("epoch=") and name != "epoch=final":
            shutil.copytree(os.path.join(stash, name),
                            os.path.join(job.out_dir, "changes", name))
    shutil.rmtree(stash)
    pd.testing.assert_frame_equal(before["changes"],
                                  read_all(job)["changes"])
    rep = audit(job.out_dir)
    assert rep["ok"]
    assert any("leftover pre-compaction" in w for w in rep["warnings"])
    r = compact_stream(job.out_dir, "changes")  # heals, nothing new
    assert not r["compacted"]
    assert not any(
        n.startswith("epoch=") and n != "epoch=final"
        for n in os.listdir(os.path.join(job.out_dir, "changes"))
    )


def test_orphan_compact_slot_is_flagged_and_reclaimed(job):
    """A compact slot whose record never landed, with a DIFFERENT range
    than any future compaction would use (the crash-then-more-epochs
    case): fsck warns about it, and the next compact_stream call deletes
    it on entry instead of leaking it forever."""
    orphan = os.path.join(job.out_dir, "changes", "compact=00000-00001")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-00000.parquet"), "wb") as f:
        f.write(b"junk from a crashed compaction")
    before = read_all(job)["changes"]
    rep = audit(job.out_dir)
    assert rep["ok"], rep["problems"]
    assert any("unreferenced compact slot" in w for w in rep["warnings"])
    r = compact_stream(job.out_dir, "changes")  # full range 0-3
    assert r["compacted"] and (r["from"], r["to"]) == (0, 3)
    assert not os.path.isdir(orphan), "orphan slot leaked"
    pd.testing.assert_frame_equal(before, read_all(job)["changes"])
    rep = audit(job.out_dir)
    assert rep["ok"] and not any(
        "unreferenced compact slot" in w for w in rep["warnings"])


def test_read_output_retries_stale_listing(job):
    """A reader whose file listing predates a concurrent compaction's
    cutover+cleanup must not crash with FileNotFoundError: read_output
    re-lists (now seeing the compacted slot) and succeeds."""
    stale = job.sink.committed_files("changes")
    before = read_all(job)["changes"]
    compact_stream(job.out_dir, "changes")  # deletes the listed files
    assert any(not os.path.exists(f) for f in stale)

    real = job.sink.committed_files
    calls = {"n": 0}

    def racy(stream, **kw):
        calls["n"] += 1
        return stale if calls["n"] == 1 else real(stream, **kw)

    job.sink.committed_files = racy
    try:
        got = job.read_output("changes")
    finally:
        job.sink.committed_files = real
    assert calls["n"] >= 2, "retry never happened"
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(before, got)


def test_fsck_catches_corrupt_compacted_rows(job):
    compact(job.out_dir)
    d = os.path.join(job.out_dir, "changes", "compact=00000-00003")
    victim = sorted(os.listdir(d))[0]
    os.remove(os.path.join(d, victim))
    rep = audit(job.out_dir)
    assert not rep["ok"]
    assert any("compacted changes 0-3" in p for p in rep["problems"])


def test_continuous_ingestion_with_inflight_compaction(tmp_path):
    """compact_every merges committed epochs WHILE the stream runs;
    output rows stay identical to a batch run and fsck stays green."""
    import threading
    import time as _time

    src = str(tmp_path / "src_pages")
    write_pages_dir(src, n_urls=250, seed=61, n_epochs=5)
    batch_out = str(tmp_path / "batch_out")
    jb = StreamingJob(src, batch_out, run_id="acB", num_partitions=4)
    jb.run()

    live = str(tmp_path / "live_pages")
    os.makedirs(live)

    def writer():
        for e in range(5):
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
    live_out = str(tmp_path / "live_out")
    jl = StreamingJob(live, live_out, run_id="acL", num_partitions=4)
    res = jl.run_continuous(poll_interval_s=0.1, compact_every=2)
    t.join()
    assert res["finalized"] and res["completed"] == 4

    recs = compaction_records(live_out)
    assert recs.get("changes"), "in-flight compaction never ran"
    from gush_ray.fsck import audit as _audit
    rep = _audit(live_out)
    assert rep["ok"], rep["problems"]

    for stream in ("changes", "windows", "matches"):
        a = jb.read_output(stream)
        cols = list(a.columns)
        b = jl.read_output(stream)
        a = a[cols].sort_values(cols).reset_index(drop=True)
        b = b[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b), stream


def test_inflight_compaction_failure_surfaces(tmp_path, monkeypatch):
    """A failed side-thread compaction must fail the run loudly (the
    daemon thread's exception is captured and re-raised on the driver),
    never silently leave the output uncompacted."""
    src = str(tmp_path / "pages")
    write_pages_dir(src, n_urls=100, seed=3, n_epochs=3)
    for e in range(3):
        open(os.path.join(src, f"epoch={e:04d}", "_READY"), "w").close()
    open(os.path.join(src, "_END"), "w").close()

    import gush_ray.compact as gc

    def boom(*a, **k):
        raise ValueError("simulated compaction failure")

    monkeypatch.setattr(gc, "compact", boom)
    j = StreamingJob(src, str(tmp_path / "out"), run_id="cfail",
                     num_partitions=2)
    with pytest.raises(RuntimeError, match="compaction failed"):
        j.run_continuous(poll_interval_s=0.05, compact_every=1)


def test_compaction_survives_schema_drift(tmp_path, ray_session):
    """A column appearing mid-stream (producer schema evolution) flows
    through the engine into later epochs' output files; compaction must
    unify the footers and promote older files (absent column -> nulls)
    instead of dying on ParquetWriter's schema check — a live stream
    whose producer adds a column must stay compactable forever."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    write_pages_dir(src, n_urls=100, seed=3, n_epochs=2)
    e1 = os.path.join(src, "epoch=0001")
    for f in os.listdir(e1):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(e1, f))
            t = t.append_column("new_col", pa.array(["x"] * t.num_rows))
            pq.write_table(t, os.path.join(e1, f))

    j = StreamingJob(src, out, run_id="drift", num_partitions=2)
    j.run()
    before = j.read_output("changes")
    from gush_ray.compact import compact

    reports = compact(out, min_epochs=2)
    assert any(r.get("compacted") for r in reports)
    after = j.read_output("changes")
    assert len(after) == len(before)
    assert "new_col" in after.columns
    # epoch-1 rows keep their values, epoch-0 rows are null-promoted
    assert after["new_col"].notna().sum() == before["new_col"].notna().sum() > 0
    cols = sorted(set(before.columns))
    a = before[cols].sort_values(cols).reset_index(drop=True)
    b = after[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
