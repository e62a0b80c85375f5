"""Executed off-POSIX evidence for the exactly-once protocol (round-3
verdict item 1): the FULL streaming job — map tasks, reduce tasks,
snapshot chain, committer thread, fsck, rewind, kill→resume — runs
against a remote-scheme ``out_dir`` with object-store semantics
(``objstore://``, gush_ray/fakestore.py: non-atomic copy+delete mv, no
fsync, shared across Ray worker processes), and its output is
IDENTICAL to the local-POSIX run on the same input.

Plus the consistency-failure injection the commit-point design claims
to tolerate: the manifest ``mv`` crashing in either half (manifest
absent + temp left, or manifest present + temp left) must leave a
stream that resumes to the exact reference output.
"""

import json

import pandas as pd
import pytest

from gush_ray.datagen import write_pages_dir
from gush_ray.fakestore import ObjectStoreFileSystem
from gush_ray.pipelines.epoch_loop import StreamingJob

STREAMS = [
    ("changes", ["url", "ts_us", "version"]),
    ("windows", ["lang", "change_kind", "window_id", "n"]),
    ("sessions_wm", ["url", "session_start_us", "n_events"]),
    ("matches", None),
    ("late", None),
]


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("os_pages")
    write_pages_dir(str(d), n_urls=400, seed=41, n_epochs=4)
    return str(d)


@pytest.fixture(scope="module")
def ref_job(ray_session, pages_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("os_ref") / "out")
    job = StreamingJob(pages_dir, out, run_id="os_ref", num_partitions=4)
    job.run()
    yield job
    job.kill_actors()


def _run(pages_dir, out, run_id, **kw):
    job = StreamingJob(pages_dir, out, run_id=run_id, num_partitions=4)
    res = job.run(**kw)
    return job, res


def _assert_same_output(job_a, job_b):
    for stream, cols in STREAMS:
        a, b = job_a.read_output(stream), job_b.read_output(stream)
        if a.empty and b.empty:
            continue
        cols = cols or sorted(a.columns)
        pd.testing.assert_frame_equal(
            a[cols].sort_values(cols).reset_index(drop=True),
            b[cols].sort_values(cols).reset_index(drop=True),
        )


def _fsck_ok(out):
    from gush_ray.fsck import audit

    r = audit(out)
    assert not r["problems"], r["problems"]
    return r


def test_objstore_job_matches_local_and_fsck_green(
        ray_session, pages_dir, ref_job, tmp_path):
    out = f"objstore://{tmp_path}/out"
    job, res = _run(pages_dir, out, "os_a")
    assert res["completed"] == 3
    _assert_same_output(job, ref_job)
    r = _fsck_ok(out)
    assert r["epochs_committed"] == 4 and r["final"]
    # the remote layout is the real one: manifests + slots + state all
    # under the objstore prefix, none leaked next to the local cwd
    import os

    assert os.path.isdir(f"{tmp_path}/out/_manifest")
    assert os.path.isdir(f"{tmp_path}/out/_state")
    job.kill_actors()


def test_objstore_kill_resume_parity(ray_session, pages_dir, ref_job,
                                     tmp_path):
    """Kill after 2 epochs, resume: the snapshot-chain restore and the
    replay both run through the object-store adapter; output must be
    byte-identical to the uninterrupted local reference."""
    out = f"objstore://{tmp_path}/out"
    job, res = _run(pages_dir, out, "os_k", stop_after=2)
    assert res["completed"] == 1  # stop_after=N completes N-1 (NOTES)
    job.kill_actors()
    job2, res2 = _run(pages_dir, out, "os_k2", resume=True)
    assert res2["completed"] == 3
    _assert_same_output(job2, ref_job)
    _fsck_ok(out)
    job2.kill_actors()


def test_objstore_rewind_then_resume(ray_session, pages_dir, ref_job,
                                     tmp_path):
    from gush_ray.rewind import rewind_stream

    out = f"objstore://{tmp_path}/out"
    job, _ = _run(pages_dir, out, "os_r")
    job.kill_actors()
    rep = rewind_stream(out, 1)
    assert rep["dropped_epochs"] == [2, 3]
    _fsck_ok(out)
    job2, _ = _run(pages_dir, out, "os_r2", resume=True)
    _assert_same_output(job2, ref_job)
    _fsck_ok(out)
    job2.kill_actors()


@pytest.mark.parametrize("half", ["before_put", "after_put"])
def test_objstore_manifest_commit_crash_injection(
        ray_session, pages_dir, ref_job, tmp_path, monkeypatch, half):
    """The manifest is the commit point; the move publishing it is NOT
    atomic off-POSIX. Crash it in each half for epoch 2:

    * before_put — the destination manifest never appears (temp file
      left): epoch 2 is uncommitted, resume replays it;
    * after_put — the manifest IS visible but the temp survives (the
      delete never ran): epoch 2 is committed, resume must NOT replay
      it and the leftover temp must not corrupt anything.

    Either way the resumed stream equals the uninterrupted reference
    and fsck is green."""
    out = f"objstore://{tmp_path}/out"

    real_mv = ObjectStoreFileSystem.mv
    target = "_manifest/epoch=00002.json"

    class Boom(Exception):
        pass

    def crashing_mv(self, p1, p2, **kw):
        if str(p2).endswith(target):
            if half == "after_put":
                import shutil

                shutil.copyfile(self._strip_protocol(p1),
                                self._strip_protocol(p2))
            raise Boom(f"injected {half} crash publishing {p2}")
        return real_mv(self, p1, p2, **kw)

    monkeypatch.setattr(ObjectStoreFileSystem, "mv", crashing_mv)
    job = StreamingJob(pages_dir, out, run_id=f"os_c_{half}",
                       num_partitions=4)
    with pytest.raises(Exception):
        job.run()
    job.kill_actors()
    monkeypatch.setattr(ObjectStoreFileSystem, "mv", real_mv)

    committed = job.sink.committed_epochs()
    if half == "before_put":
        assert 2 not in committed
    else:
        assert committed == [0, 1, 2]
        # the crash window left the temp next to the manifest
        import glob

        assert glob.glob(f"{tmp_path}/out/_manifest/"
                         f"epoch=00002.json.inprogress*")

    job2, res2 = _run(pages_dir, out, f"os_c2_{half}", resume=True)
    assert res2["completed"] == 3
    _assert_same_output(job2, ref_job)
    _fsck_ok(out)
    job2.kill_actors()


def test_objstore_summary_counts_match_read_output(
        ray_session, pages_dir, tmp_path):
    """run_job's metadata-only stream counts read through the adapter
    (pyarrow cannot resolve the custom scheme itself)."""
    import pyarrow.parquet as pq

    out = f"objstore://{tmp_path}/out"
    job, _ = _run(pages_dir, out, "os_s")
    n_meta = sum(
        pq.ParquetFile(job.sink.fs.open(f, "rb")).metadata.num_rows
        for f in job.sink.committed_files("changes"))
    assert n_meta == len(job.read_output("changes"))
    job.kill_actors()


def test_objstore_compact_and_read_cutover(ray_session, pages_dir,
                                           tmp_path):
    """Compaction's record-then-cleanup protocol over the object store:
    rows identical before/after, fsck green, per-epoch dirs reclaimed."""
    from gush_ray.compact import compact

    out = f"objstore://{tmp_path}/out"
    job, _ = _run(pages_dir, out, "os_cp")
    before = job.read_output("changes")
    reports = compact(out)
    assert any(r.get("compacted") for r in reports)
    after = job.read_output("changes")
    cols = ["url", "ts_us", "version"]
    pd.testing.assert_frame_equal(
        before[cols].sort_values(cols).reset_index(drop=True),
        after[cols].sort_values(cols).reset_index(drop=True))
    _fsck_ok(out)
    job.kill_actors()


def test_fs_plugins_env_hook(monkeypatch, tmp_path):
    """GUSH_FS_PLUGINS imports user modules before scheme resolution —
    the documented bring-your-own-filesystem hook (workers included)."""
    import sys
    import textwrap

    from gush_ray.fs import FsspecFS

    mod_dir = tmp_path / "plug"
    mod_dir.mkdir()
    (mod_dir / "myfsplug.py").write_text(textwrap.dedent("""
        import fsspec
        from fsspec.implementations.memory import MemoryFileSystem

        class PluggedFS(MemoryFileSystem):
            protocol = "plugged"

        fsspec.register_implementation("plugged", PluggedFS,
                                       clobber=True)
    """))
    monkeypatch.syspath_prepend(str(mod_dir))
    monkeypatch.setenv("GUSH_FS_PLUGINS", "myfsplug")
    fs = FsspecFS("plugged")
    assert fs.fs.protocol == "plugged"
    sys.modules.pop("myfsplug", None)


def test_objstore_latency_injected_run_exact(ray_session, pages_dir,
                                             ref_job, tmp_path):
    """Round-5 verdict item 6: the exactly-once pipeline absorbs
    S3-like PER-OPERATION latency. With 15 ms (+5 jitter) injected on
    every store op — open/exists/ls/rm and BOTH halves of the
    non-atomic mv — the full job completes with output identical to
    the zero-latency local reference, and the commit protocol's extra
    round-trips change nothing. (The wall-time overlap measurement at
    50 ms/op lives in tools/objstore_latency.py / BENCH; this pins
    correctness under latency in the suite.)"""
    from gush_ray.fakestore import set_latency

    out = f"objstore://{tmp_path}/out"
    set_latency(15, jitter_ms=5)
    try:
        job = StreamingJob(pages_dir, out, run_id="os_lat",
                           num_partitions=4)
        job.run()
    finally:
        set_latency(None)
    for stream, cols in STREAMS:
        ref = ref_job.read_output(stream)
        got = job.read_output(stream)
        assert len(ref) == len(got)
        if cols and len(ref):
            pd.testing.assert_frame_equal(
                ref[cols].sort_values(cols).reset_index(drop=True),
                got[cols].sort_values(cols).reset_index(drop=True))
    from gush_ray.fsck import audit
    rep = audit(out)
    assert rep["ok"] and not rep["problems"]
