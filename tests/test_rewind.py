"""Rewind-and-replay (gush_ray/rewind.py): truncating a committed
stream back to epoch E and resuming must reproduce the uninterrupted
run exactly — including across a finalized stream — and a rewind into
a compacted range must refuse."""

import pandas as pd
import pytest

from gush_ray.datagen import write_pages_dir
from gush_ray.pipelines.epoch_loop import StreamingJob
from gush_ray.rewind import rewind_stream


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("rw_pages")
    write_pages_dir(str(d), n_urls=300, seed=33, n_epochs=3)
    return str(d)


def _run(pages_dir, out, run_id, **kw):
    job = StreamingJob(pages_dir, out, run_id=run_id, num_partitions=4)
    res = job.run(**kw)
    return job, res


STREAMS = [
    ("changes", ["url", "ts_us", "version"]),
    ("windows", ["lang", "change_kind", "window_id", "n"]),
    ("sessions_wm", ["url", "session_start_us", "n_events"]),
    ("matches", None),
]


def _assert_same_output(job_a, job_b):
    for stream, cols in STREAMS:
        a, b = job_a.read_output(stream), job_b.read_output(stream)
        cols = cols or sorted(a.columns)
        pd.testing.assert_frame_equal(
            a[cols].sort_values(cols).reset_index(drop=True),
            b[cols].sort_values(cols).reset_index(drop=True),
        )


def test_rewind_then_resume_equals_uninterrupted(
        ray_session, pages_dir, tmp_path):
    ref, _ = _run(pages_dir, str(tmp_path / "ref"), "rw_ref")
    out = str(tmp_path / "rw")
    job, res = _run(pages_dir, out, "rw_a")
    committed = job.sink.committed_epochs()
    assert len(committed) >= 2
    job.kill_actors()

    rep = rewind_stream(out, 0)
    assert rep["dropped_epochs"] == committed[1:]
    assert rep["was_finalized"] is True  # run() finalizes
    assert job.sink.committed_epochs() == [0]

    # fsck: the truncated stream is a clean, consistent prefix
    from gush_ray.fsck import audit
    r = audit(out)
    assert not r["problems"], r["problems"]

    job2, res2 = _run(pages_dir, out, "rw_b", resume=True)
    assert res2["completed"] == len(committed) - 1  # replayed the rest
    _assert_same_output(job2, ref)
    job2.kill_actors()
    ref.kill_actors()


def test_rewind_is_idempotent_and_validates(ray_session, pages_dir,
                                            tmp_path):
    out = str(tmp_path / "rw2")
    job, _ = _run(pages_dir, out, "rw2")
    job.kill_actors()

    rewind_stream(out, 1)
    rep = rewind_stream(out, 1)  # re-run: nothing left to drop
    assert rep["dropped_epochs"] == []

    with pytest.raises(ValueError, match="not a committed epoch"):
        rewind_stream(out, 2)  # already dropped
    with pytest.raises(ValueError, match="not a committed epoch"):
        rewind_stream(out, 99)


def test_rewind_refuses_spanning_compaction(ray_session, pages_dir,
                                            tmp_path):
    from gush_ray.compact import compact_stream

    out = str(tmp_path / "rw3")
    job, _ = _run(pages_dir, out, "rw3")
    job.kill_actors()
    compact_stream(out, "changes")  # one slot covering epochs 0-2

    with pytest.raises(ValueError, match="span the rewind point"):
        rewind_stream(out, 1)

    # rewind at/above the range end is fine (the range covers every
    # committed epoch, so its end IS the last committed epoch)
    rep = rewind_stream(out, max(job.sink.committed_epochs()))
    assert rep["dropped_epochs"] == []
    assert rep["was_finalized"] is True


def test_interrupted_rewind_rerun_then_resume_parity(
        ray_session, pages_dir, tmp_path, monkeypatch):
    """Crash-safety: kill the rewind after every possible number of
    deletions, re-run it, resume — output must equal the uninterrupted
    run every time (the manifests-first ordering means the committed
    set is always a contiguous prefix and replay overwrites the rest)."""
    import itertools

    from gush_ray import fs as fsmod
    from gush_ray import rewind as rwmod

    ref, _ = _run(pages_dir, str(tmp_path / "ref"), "ch_ref")

    class Boom(Exception):
        pass

    n_ops = 1
    trial = 0
    while True:
        out = str(tmp_path / f"ch{trial}")
        job, _ = _run(pages_dir, out, f"ch{trial}")
        job.kill_actors()

        budget = itertools.count()
        real_remove = fsmod.LocalFS.remove
        real_rmtree = fsmod.LocalFS.rmtree

        def failing(limit):
            def _remove(self, path):
                if next(budget) >= limit:
                    raise Boom()
                return real_remove(self, path)

            def _rmtree(self, path):
                if next(budget) >= limit:
                    raise Boom()
                return real_rmtree(self, path)
            return _remove, _rmtree

        rm, rt = failing(n_ops)
        monkeypatch.setattr(fsmod.LocalFS, "remove", rm)
        monkeypatch.setattr(fsmod.LocalFS, "rmtree", rt)
        try:
            rwmod.rewind_stream(out, 0)
            interrupted = False
        except Boom:
            interrupted = True
        finally:
            monkeypatch.setattr(fsmod.LocalFS, "remove", real_remove)
            monkeypatch.setattr(fsmod.LocalFS, "rmtree", real_rmtree)

        # re-run to completion, then resume and compare ALL streams
        rwmod.rewind_stream(out, 0)
        job2, _ = _run(pages_dir, out, f"ch{trial}b", resume=True)
        _assert_same_output(job2, ref)
        job2.kill_actors()

        if not interrupted:
            break  # the budget exceeded the total op count: done
        n_ops += 1
        trial += 1
        assert trial < 60, "rewind does more deletions than expected"
    ref.kill_actors()


def _stream_rows(out, stream):
    """Rows currently visible to a reader via committed_files."""
    import pyarrow.parquet as pq

    from gush_ray.sinks.exactly_once import ExactlyOnceSink

    sink = ExactlyOnceSink(out)
    return sum(pq.read_metadata(f).num_rows
               for f in sink.committed_files(stream))


def test_rewind_compacted_range_reader_never_sees_missing_rows(
        ray_session, pages_dir, tmp_path, monkeypatch):
    """Round-4 ADVICE fix: with a whole-dropped COMPACTED range, at
    EVERY possible interruption point of the rewind a concurrent
    reader must see every committed epoch's rows in full — the old
    record-before-manifests ordering had a window where epochs were
    still committed but their only data pointer (the compaction
    record) was gone, reading as zero rows. Then: re-running the
    rewind + resuming reproduces the uninterrupted run."""
    import itertools

    import pyarrow.parquet as pq

    from gush_ray import fs as fsmod
    from gush_ray import rewind as rwmod
    from gush_ray.compact import compact_stream

    ref, _ = _run(pages_dir, str(tmp_path / "cref"), "cw_ref")

    class Boom(Exception):
        pass

    # per-epoch visible rows for the reader invariant, taken from a
    # pristine (uncompacted) run
    probe = str(tmp_path / "cprobe")
    jp, _ = _run(pages_dir, probe, "cw_probe")
    jp.kill_actors()
    fs0, _ = fsmod.get_fs(probe)
    per_epoch = {}
    for e in jp.sink.committed_epochs():
        d = fs0.join(probe, "changes", f"epoch={e:05d}")
        per_epoch[e] = (sum(
            pq.read_metadata(fs0.join(d, n)).num_rows
            for n in fs0.listdir(d) if n.endswith(".parquet"))
            if fs0.isdir(d) else 0)

    n_ops = 1
    trial = 0
    while True:
        out = str(tmp_path / f"cw{trial}")
        job, _ = _run(pages_dir, out, f"cw{trial}")
        job.kill_actors()
        # two records: [0,0] and [1,2]; rewinding to 0 whole-drops [1,2]
        compact_stream(out, "changes", upto=0, min_epochs=1)
        compact_stream(out, "changes", min_epochs=1)

        budget = itertools.count()
        real_remove = fsmod.LocalFS.remove
        real_rmtree = fsmod.LocalFS.rmtree

        def _remove(self, path, _b=budget, _lim=n_ops):
            if next(_b) >= _lim:
                raise Boom()
            return real_remove(self, path)

        def _rmtree(self, path, _b=budget, _lim=n_ops):
            if next(_b) >= _lim:
                raise Boom()
            return real_rmtree(self, path)

        monkeypatch.setattr(fsmod.LocalFS, "remove", _remove)
        monkeypatch.setattr(fsmod.LocalFS, "rmtree", _rmtree)
        try:
            rwmod.rewind_stream(out, 0)
            interrupted = False
        except Boom:
            interrupted = True
        finally:
            monkeypatch.setattr(fsmod.LocalFS, "remove", real_remove)
            monkeypatch.setattr(fsmod.LocalFS, "rmtree", real_rmtree)

        # THE reader invariant at this interruption point: every
        # committed epoch's rows are fully visible (zero-rows-for-a-
        # committed-epoch is the bug being pinned). A half-dropped
        # compacted range may ADD its already-de-committed rows (the
        # merged file can't be split per epoch — documented bounded
        # staleness), so visible is bounded above by the full stream.
        committed = job.sink.committed_epochs()
        expected = sum(per_epoch[e] for e in committed)
        visible = _stream_rows(out, "changes")
        assert expected <= visible <= sum(per_epoch.values()), (
            trial, committed, expected, visible)

        rwmod.rewind_stream(out, 0)  # idempotent completion
        assert _stream_rows(out, "changes") == per_epoch[0]
        job2, _ = _run(pages_dir, out, f"cw{trial}b", resume=True)
        _assert_same_output(job2, ref)
        job2.kill_actors()

        if not interrupted:
            break
        n_ops += 1
        trial += 1
        assert trial < 80, "rewind does more deletions than expected"
    ref.kill_actors()


def test_resume_sweeps_stale_compaction_record(ray_session, pages_dir,
                                               tmp_path):
    """The other half of the crash protocol: a rewind interrupted
    between de-committing a compacted range and removing its record
    leaves a stale record + merged slot. A plain RESUME (no rewind
    re-run) must sweep both BEFORE replaying, so the stale merged file
    never shadows the replayed per-epoch parts once the range
    re-commits."""
    from gush_ray import fs as fsmod
    from gush_ray.compact import compact_stream, compaction_records
    from gush_ray.fsck import audit

    ref, _ = _run(pages_dir, str(tmp_path / "sref"), "sw_ref")
    out = str(tmp_path / "sw")
    job, _ = _run(pages_dir, out, "sw_a")
    job.kill_actors()
    compact_stream(out, "changes", upto=0, min_epochs=1)
    compact_stream(out, "changes", min_epochs=1)  # record [1,2]

    # manufacture the exact crash state: final marker + manifests 1,2
    # removed (rewind got that far), record + slot for [1,2] survive
    fs, _ = fsmod.get_fs(out)
    fs.remove(fs.join(out, "_manifest", "final.json"))
    for e in (2, 1):
        fs.remove(fs.join(out, "_manifest", f"epoch={e:05d}.json"))
    assert compaction_records(out).get("changes") == [(0, 0), (1, 2)]
    # reader guard: the half-valid record is already invisible
    assert job.sink.committed_files("changes")  # epoch-0 slot only
    assert all("compact=00001" not in f
               for f in job.sink.committed_files("changes"))

    job2, _ = _run(pages_dir, out, "sw_b", resume=True)
    # the sweep ran before replay: record + slot gone
    assert compaction_records(out).get("changes") == [(0, 0)]
    assert not fs.isdir(fs.join(out, "changes", "compact=00001-00002"))
    _assert_same_output(job2, ref)
    r = audit(out)
    assert not r["problems"], r["problems"]
    job2.kill_actors()
    ref.kill_actors()


def test_resume_refuses_mid_range_rewind_crash(ray_session, pages_dir,
                                               tmp_path):
    """A rewind that crashed MID-range (some of a compacted range's
    epochs de-committed, some not) cannot be healed by the sweep — the
    committed prefix's rows live only inside the merged file. Resume
    must refuse loudly; re-running the rewind completes the truncation
    and resume then reproduces the reference."""
    from gush_ray import fs as fsmod
    from gush_ray import rewind as rwmod
    from gush_ray.compact import compact_stream

    ref, _ = _run(pages_dir, str(tmp_path / "pref"), "pr_ref")
    out = str(tmp_path / "pr")
    job, _ = _run(pages_dir, out, "pr_a")
    job.kill_actors()
    compact_stream(out, "changes", upto=0, min_epochs=1)
    compact_stream(out, "changes", min_epochs=1)  # record [1,2]

    # crash state: final marker + manifest 2 removed, manifest 1 and
    # the record survive — range [1,2] is half committed
    fs, _ = fsmod.get_fs(out)
    fs.remove(fs.join(out, "_manifest", "final.json"))
    fs.remove(fs.join(out, "_manifest", "epoch=00002.json"))
    # reader invariant holds here too: epoch 1 stays fully visible
    assert any("compact=00001" in f
               for f in job.sink.committed_files("changes"))

    with pytest.raises(RuntimeError, match="partially committed"):
        _run(pages_dir, out, "pr_b", resume=True)

    rwmod.rewind_stream(out, 0)
    job2, _ = _run(pages_dir, out, "pr_c", resume=True)
    _assert_same_output(job2, ref)
    job2.kill_actors()
    ref.kill_actors()
