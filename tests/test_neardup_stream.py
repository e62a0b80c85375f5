"""Streaming MinHash/LSH near-dup detection (state/neardup.py): shared
hash definition with the batch operator, partition-count independence,
kill→resume parity across delta chains, TTL state bounding with
re-ownership, keyed delta frames, checkpoint rescaling, mode guard.
The SQL-oracle pairing itself is covered by tests/test_oracle.py
(registry-driven) at sf0.001."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gush_ray.datagen import write_pages_dir
from gush_ray.pipelines.epoch_loop import StreamingJob
from gush_ray.state.neardup import (
    NearDupSpec,
    NearDupState,
    band_rows_batch,
    bucket_part,
)
from gush_ray.state.store import NEG_INF, PartitionState, StateParams


def _pages(tmp_path, **kw):
    p = str(tmp_path / "pages")
    # late_frac=0: watermark evolution is then identical under any
    # partition layout (same rationale as test_rescale._pages), so runs
    # at different P / after rescale must match EXACTLY
    write_pages_dir(p, n_urls=120, seed=31, n_epochs=4, late_frac=0.0,
                    near_dup_groups=3, **kw)
    return p


def _nd_sorted(job):
    df = job.read_output("near_dups")
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


# ------------------------------------------------------------ kernels


def test_band_rows_match_batch_minhash():
    """The streaming band hash IS the batch operator's band hash
    (minhash_batch + explode_bands) — one definition, one SQL scheme."""
    from gush_ray.stages.dedup import explode_bands, minhash_batch

    texts = ["the quick brown fox jumps over the lazy dog",
             "the quick brown fox jumps over the lazy cat",
             "completely different words entirely here now",
             "xy", ""]
    t = pa.table({
        "url": [f"u{i}" for i in range(len(texts))],
        "ts_us": pa.array(range(len(texts)), type=pa.int64()),
        "text": texts,
    })
    spec = NearDupSpec()
    got = band_rows_batch(t, spec)

    df = pd.DataFrame({"doc_id": [f"u{i}" for i in range(len(texts))],
                       "text": texts})
    bands = explode_bands(
        minhash_batch(df, num_perm=spec.num_perm, shingle=spec.shingle,
                      seed=spec.seed, hash_fn=spec.hash_fn),
        num_bands=spec.num_bands)
    want = bands.rename(columns={"doc_id": "url"})[
        ["url", "band_id", "band_hash"]]
    got2 = got[["url", "band_id", "band_hash"]]
    key = ["url", "band_id"]
    pd.testing.assert_frame_equal(
        got2.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True),
    )


def test_bucket_part_is_uint64_exact():
    """Routing must happen in uint64 (numpy uint64 % python-int promotes
    to float64 and corrupts placement at hash magnitudes)."""
    bh = np.array([2**64 - 1, 2**63 + 12345, 7], dtype=np.uint64)
    p = bucket_part(np.array([3, 3, 3]), bh, 16)
    assert p.dtype == np.int64
    expect = [(int(h) ^ ((3 * 0x9E3779B97F4A7C15) % 2**64)) % 16
              for h in bh]
    assert p.tolist() == expect


# ------------------------------------------------------- end to end


def test_partition_independence(tmp_path, ray_session):
    """Bucket routing co-locates every arrival of a bucket, so the
    near_dups stream is identical at any partition count."""
    pages = _pages(tmp_path)
    res = {}
    for P in (1, 4):
        job = StreamingJob(pages, str(tmp_path / f"o{P}"),
                           run_id=f"ndP{P}", num_partitions=P,
                           neardup_spec=NearDupSpec())
        job.run(resume=False)
        res[P] = _nd_sorted(job)
    assert len(res[1]) > 100  # the fixture really produces near-dups
    pd.testing.assert_frame_equal(res[1], res[4])


def test_kill_resume_parity_across_delta_chain(tmp_path, ray_session):
    """Interrupt mid delta chain (full frame cadence 2) and resume: the
    near_dups stream matches the uninterrupted run exactly-once."""
    pages = _pages(tmp_path)
    ja = StreamingJob(pages, str(tmp_path / "a"), run_id="ndA",
                      num_partitions=3, neardup_spec=NearDupSpec(),
                      snapshot_full_every=2)
    ja.run(resume=False)

    jb = StreamingJob(pages, str(tmp_path / "b"), run_id="ndB",
                      num_partitions=3, neardup_spec=NearDupSpec(),
                      snapshot_full_every=2)
    jb.run(resume=False, stop_after=3)
    jb2 = StreamingJob(pages, str(tmp_path / "b"), run_id="ndB2",
                       num_partitions=3, neardup_spec=NearDupSpec(),
                       snapshot_full_every=2)
    jb2.run(resume=True)
    pd.testing.assert_frame_equal(_nd_sorted(ja), _nd_sorted(jb2))

    from gush_ray.fsck import audit

    rep = audit(str(tmp_path / "b"))
    assert rep["ok"], rep["problems"]


def test_actors_mode_rejected(tmp_path):
    with pytest.raises(ValueError, match="tasks"):
        StreamingJob(str(tmp_path), str(tmp_path / "o"), mode="actors",
                     neardup_spec=NearDupSpec())


# ------------------------------------------------- state-level checks


def _params(**kw):
    return StateParams(key_col="url", ts_col="ts_us",
                       window_group_cols=("lang",), pattern=None,
                       neardup_spec=kw.pop("spec", NearDupSpec()), **kw)


def _band_tbl(rows):
    """rows: (url, ts, band_id, band_hash)"""
    return pa.table({
        "url": [r[0] for r in rows],
        "ts_us": pa.array([r[1] for r in rows], type=pa.int64()),
        "band_id": pa.array([r[2] for r in rows], type=pa.int64()),
        "band_hash": pa.array([r[3] for r in rows], type=pa.uint64()),
    })


def _page_tbl(rows):
    """rows: (url, ts)"""
    return pa.table({
        "url": [r[0] for r in rows],
        "ts_us": pa.array([r[1] for r in rows], type=pa.int64()),
        "lang": ["en"] * len(rows),
    })


def _run_epoch(ps, epoch, out, pages, bands):
    ps.ingest(epoch, 0, _page_tbl(pages))
    ps.ingest_neardup(epoch, 0, _band_tbl(bands))
    return ps.process_epoch_to(epoch, out)


def test_first_owner_and_emit_rule(tmp_path):
    out = str(tmp_path / "s")
    ps = PartitionState(0, _params())
    # epoch 0: A owns bucket 5; B hits it; A's second row is silent
    m = _run_epoch(ps, 0, out, [("A", 10), ("B", 20), ("A", 30)],
                   [("A", 10, 0, 5), ("B", 20, 0, 5), ("A", 30, 0, 5)])
    assert m["near_dup_rows"] == 1
    assert ps.neardup.buckets[(0, 5)] == ("A", 10)
    ps.advance_watermark(25)
    # epoch 1: C hits the SAME bucket → dup_of the ORIGINAL owner A
    # (ownership never transfers); a replay of B's row is silent only
    # for B itself
    m = _run_epoch(ps, 1, out, [("C", 40)], [("C", 40, 0, 5)])
    assert m["near_dup_rows"] == 1
    import pyarrow.parquet as pq

    nd = pq.read_table(f"{out}/near_dups/epoch=00001/part-00000.parquet")
    assert nd.to_pylist() == [{"url": "C", "ts_us": 40, "band_id": 0,
                               "dup_of": "A", "dup_of_ts": 10}]


def test_late_band_rows_dropped(tmp_path):
    out = str(tmp_path / "s")
    ps = PartitionState(0, _params())
    _run_epoch(ps, 0, out, [("A", 100)], [("A", 100, 0, 5)])
    ps.advance_watermark(100)
    # ts 50 < watermark 100 → late: must neither probe nor own
    m = _run_epoch(ps, 1, out, [("B", 150)], [("B", 50, 0, 5),
                                              ("B", 150, 1, 9)])
    assert m["near_dup_rows"] == 0
    assert (1, 9) in ps.neardup.buckets and len(ps.neardup.buckets) == 2


def test_ttl_evicts_and_reowns(tmp_path):
    out = str(tmp_path / "s")
    ps = PartitionState(0, _params(spec=NearDupSpec(ttl_us=100)))
    _run_epoch(ps, 0, out, [("A", 10)], [("A", 10, 0, 5)])
    ps.advance_watermark(50)
    assert (0, 5) in ps.neardup.buckets
    ps.advance_watermark(500)  # owner ts 10 < 500-100 → evicted
    assert ps.neardup.buckets == {}
    assert ps.neardup.evicted_total == 1
    # next arrival RE-OWNS the bucket (fresh horizon), no emit
    m = _run_epoch(ps, 1, out, [("B", 600)], [("B", 600, 0, 5)])
    assert m["near_dup_rows"] == 0
    assert ps.neardup.buckets[(0, 5)] == ("B", 600)


def test_delta_frames_carry_touched_buckets_and_tombstones(tmp_path):
    out = str(tmp_path / "s")
    ps = PartitionState(0, _params(spec=NearDupSpec(ttl_us=1000)))
    _run_epoch(ps, 0, out,
               [(f"u{i}", 10 + i) for i in range(200)],
               [(f"u{i}", 10 + i, 0, 1000 + i) for i in range(200)])
    ps.advance_watermark(5)
    full = ps.snapshot_bytes()

    _run_epoch(ps, 1, out, [("x", 400)], [("x", 400, 0, 7777)])
    ps.advance_watermark(6)
    delta = ps.delta_bytes(0)
    st = ps._decode(delta)
    assert set(st["neardup_delta"]["upserts"]) == {(0, 7777)}
    assert st["neardup_delta"]["tombstones"] == []
    assert len(delta) < len(full) / 5

    # TTL sweep mid-chain → tombstones in the next delta
    ps.advance_watermark(5000)  # evicts every owner with ts < 4000
    delta2 = ps.delta_bytes(0)
    st2 = ps._decode(delta2)
    assert len(st2["neardup_delta"]["tombstones"]) == 201
    assert ps.neardup.buckets == {}

    fresh = PartitionState(0, _params(spec=NearDupSpec(ttl_us=1000)))
    fresh.restore_chain([full, delta, delta2])
    assert fresh.neardup.buckets == ps.neardup.buckets
    assert fresh.neardup.evicted_total == ps.neardup.evicted_total
    assert fresh.watermark_us == ps.watermark_us


def test_frames_without_section_reset_on_restore(tmp_path):
    """Rollback semantics: restoring a chain written WITHOUT a spec into
    a state configured WITH one must reset the live bucket map."""
    plain = PartitionState(0, StateParams(
        key_col="url", ts_col="ts_us", window_group_cols=("lang",),
        pattern=None))
    plain.process(0, _page_tbl([("A", 10)]))
    blob = plain.snapshot_bytes()

    ps = PartitionState(0, _params())
    ps.neardup.buckets[(0, 5)] = ("stale", 1)
    ps.restore_bytes(blob)
    assert ps.neardup.buckets == {}


def test_rescale_with_neardup(tmp_path, ray_session):
    """Bucket state migrates by the SAME routing function the map phase
    uses, so a rescaled-then-resumed run reproduces the uninterrupted
    near_dups stream exactly."""
    from gush_ray.rescale import rescale_state

    pages = _pages(tmp_path)
    spec = NearDupSpec()
    ja = StreamingJob(pages, str(tmp_path / "a"), run_id="ndrA",
                      num_partitions=4, pattern=None, neardup_spec=spec)
    ja.run(resume=False)

    jb = StreamingJob(pages, str(tmp_path / "b"), run_id="ndrB",
                      num_partitions=4, pattern=None, neardup_spec=spec)
    jb.run(resume=False, stop_after=2)
    rep = rescale_state(str(tmp_path / "b"), 2, params=jb.params)
    assert rep["rescaled"]
    jb2 = StreamingJob(pages, str(tmp_path / "b"), run_id="ndrB2",
                       num_partitions=2, pattern=None, neardup_spec=spec)
    jb2.run(resume=True)
    pd.testing.assert_frame_equal(_nd_sorted(ja), _nd_sorted(jb2))


def test_rescale_guard_on_dropped_spec(tmp_path, ray_session):
    from gush_ray.rescale import rescale_state

    pages = _pages(tmp_path)
    jb = StreamingJob(pages, str(tmp_path / "b"), run_id="ndgB",
                      num_partitions=2, pattern=None,
                      neardup_spec=NearDupSpec())
    jb.run(resume=False, stop_after=2)
    bare = StateParams(key_col="url", ts_col="ts_us", pattern=None)
    with pytest.raises(ValueError, match="near-dup"):
        rescale_state(str(tmp_path / "b"), 4, params=bare)


def test_continuous_mode_matches_batch_run(tmp_path, ray_session):
    """Live-tailed ingestion (run_continuous with _READY markers)
    produces the identical near_dups stream as the batch run over the
    same epochs — the operator rides the shared reduce path."""
    import os
    import shutil as sh
    import threading
    import time as _time

    src = _pages(tmp_path)
    jb = StreamingJob(src, str(tmp_path / "bo"), run_id="ndcB",
                      num_partitions=3, neardup_spec=NearDupSpec())
    jb.run(resume=False)

    live = str(tmp_path / "live")
    os.makedirs(live)

    def writer():
        for e in range(4):
            _time.sleep(0.3)
            name = f"epoch={e:04d}"
            sh.copytree(os.path.join(src, name),
                        os.path.join(live, name + ".tmp"))
            os.rename(os.path.join(live, name + ".tmp"),
                      os.path.join(live, name))
            open(os.path.join(live, name, "_READY"), "w").close()
        open(os.path.join(live, "_END"), "w").close()

    t = threading.Thread(target=writer)
    t.start()
    jl = StreamingJob(live, str(tmp_path / "lo"), run_id="ndcL",
                      num_partitions=3, neardup_spec=NearDupSpec())
    res = jl.run_continuous(poll_interval_s=0.1)
    t.join()
    assert res["finalized"]
    pd.testing.assert_frame_equal(_nd_sorted(jb), _nd_sorted(jl))


def test_cli_ttl_zero_enables_and_bounds():
    """--neardup-ttl-sec 0 means evict-at-watermark, not 'unset'
    (review fix: a falsy check disabled the operator entirely)."""
    import argparse

    from gush_ray.run_job import _neardup_spec

    ns = argparse.Namespace(neardup=False, neardup_ttl_sec=0)
    spec = _neardup_spec(ns)
    assert spec is not None and spec.ttl_us == 0
    assert _neardup_spec(
        argparse.Namespace(neardup=False, neardup_ttl_sec=None)) is None
