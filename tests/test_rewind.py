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
