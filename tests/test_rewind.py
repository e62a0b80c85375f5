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
