"""Incremental (delta) state snapshots: chain restore parity at the
PartitionState level and end-to-end resume through a delta chain.

A FULL frame is written every ``StateParams.snapshot_full_every`` epochs
with upsert-only DELTA frames between; restore applies base + deltas in
order. The dedup dicts (one entry per key EVER seen — the unbounded
snapshot payload) shrink to O(keys touched per epoch) on every delta
write.
"""

import pandas as pd
import pyarrow as pa
import pytest

from gush_ray.datagen import write_pages_dir
from gush_ray.pipelines.epoch_loop import StreamingJob
from gush_ray.stages.nfa import Pattern, Step
from gush_ray.state.store import (
    PartitionState,
    StateParams,
    snapshot_base_epoch,
)


def params(**kw):
    defaults = dict(
        key_col="url", ts_col="ts_us", window_group_cols=("lang",),
        window_size_us=100, session_gap_us=50,
        pattern=Pattern(
            steps=(Step("a", "change_kind", "insert"),
                   Step("b", "change_kind", "update")),
            within_us=500, key="url", ts_col="ts_us", id_col="version",
        ),
    )
    defaults.update(kw)
    return StateParams(**defaults)


def tbl(rows):
    return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)


def epoch_rows(e: int):
    # epoch e touches url u{e} and the shared hot url "h"
    return tbl([
        {"url": f"u{e}", "ts_us": 10 + 100 * e, "lang": "en"},
        {"url": "h", "ts_us": 20 + 100 * e, "lang": "de"},
    ])


def test_chain_restore_equals_full_restore():
    """full@0 + deltas@1,2 restores the exact state a full@2 holds."""
    a = PartitionState(0, params())
    frames = []
    for e in range(3):
        a.process(e, epoch_rows(e))
        a.advance_watermark(5 + 100 * e)
        frames.append(a.snapshot_bytes() if e == 0 else a.delta_bytes(0))
    full_at_2 = a.snapshot_bytes()

    via_chain = PartitionState(0, params())
    via_chain.restore_chain(frames)
    via_full = PartitionState(0, params())
    via_full.restore_bytes(full_at_2)

    assert via_chain.last_ts == via_full.last_ts
    assert via_chain.version == via_full.version
    assert via_chain.win == via_full.win
    assert via_chain.sessions == via_full.sessions
    assert via_chain.watermark_us == via_full.watermark_us
    # behavioral parity: the next epoch produces identical changes
    nxt = epoch_rows(3)
    out_c = via_chain.process(3, nxt)["changes"].to_pandas()
    out_f = via_full.process(3, nxt)["changes"].to_pandas()
    pd.testing.assert_frame_equal(out_c, out_f)


def test_delta_frames_carry_only_touched_keys():
    ps = PartitionState(0, params())
    # epoch 0: 200 urls in the full base; watermark passes them so the
    # small sections (windows/sessions/NFA partials) are pruned — the
    # steady-state shape where the dedup dicts dominate the snapshot
    ps.process(0, tbl([
        {"url": f"u{i}", "ts_us": 10 + i, "lang": "en"} for i in range(200)
    ]))
    ps.advance_watermark(10_000)
    full = ps.snapshot_bytes()
    # epoch 1: only 2 urls touched → tiny delta
    ps.process(1, tbl([
        {"url": "u0", "ts_us": 50_000, "lang": "en"},
        {"url": "new", "ts_us": 50_001, "lang": "en"},
    ]))
    ps.advance_watermark(60_000)
    delta = ps.delta_bytes(0)
    assert len(delta) < len(full) / 3
    assert snapshot_base_epoch(delta[:12]) == 0
    assert snapshot_base_epoch(full[:12]) is None
    st = ps._decode(delta)
    assert set(st["dedup_last_ts"]) == {"u0", "new"}


def test_restore_rejects_bare_delta():
    ps = PartitionState(0, params())
    ps.process(0, epoch_rows(0))
    ps.snapshot_bytes()
    ps.process(1, epoch_rows(1))
    d = ps.delta_bytes(0)
    fresh = PartitionState(0, params())
    with pytest.raises(ValueError, match="delta frame alone"):
        fresh.restore_bytes(d)


@pytest.fixture(scope="module")
def pages5(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages5")
    write_pages_dir(str(d), n_urls=300, seed=7, n_epochs=5)
    return str(d)


def norm(df, cols):
    if df.empty:
        return pd.DataFrame(columns=cols)
    return df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)


def test_e2e_resume_through_delta_chain(pages5, tmp_path):
    """Kill after a DELTA epoch commits; the resumed run restores via the
    chain and matches an uninterrupted all-full-frames run exactly."""
    out_a = str(tmp_path / "allfull")
    job_a = StreamingJob(pages5, out_a, run_id="dsA", num_partitions=4,
                         snapshot_full_every=1)  # pre-delta behavior
    job_a.run()

    out_b = str(tmp_path / "chained")
    job_b = StreamingJob(pages5, out_b, run_id="dsB", num_partitions=4,
                         snapshot_full_every=3)
    r1 = job_b.run(stop_after=2)  # epoch 1 = delta frame, then "crash"
    assert r1["completed"] == 1
    man = job_b.sink.read_manifest(1)
    kinds = {p["snapshot_kind"] for p in man["partitions"]}
    assert kinds == {"delta"}
    job_b2 = StreamingJob(pages5, out_b, run_id="dsB2", num_partitions=4,
                          snapshot_full_every=3)
    r2 = job_b2.run(resume=True)
    assert r2["completed"] == 4
    # frame schedule: full@0, delta@1-2, full@3, delta@4
    for e, want in [(0, "full"), (2, "delta"), (3, "full"), (4, "delta")]:
        m = job_b2.sink.read_manifest(e)
        assert {p["snapshot_kind"] for p in m["partitions"]} == {want}, e

    for stream, cols in [
        ("changes", ["url", "ts_us", "version", "change_kind"]),
        ("windows", ["lang", "change_kind", "window_id", "n"]),
        ("matches", ["url", "first_id", "recrawl_id", "start_us"]),
        ("late", ["url", "ts_us"]),
    ]:
        a = norm(job_a.read_output(stream), cols)
        b = norm(job_b2.read_output(stream), cols)
        pd.testing.assert_frame_equal(a, b)
    cols = ["url", "session_start_us", "session_end_us", "n_events"]
    a = pd.concat([job_a.read_output("sessions"),
                   job_a.read_output("sessions_wm")])
    b = pd.concat([job_b2.read_output("sessions"),
                   job_b2.read_output("sessions_wm")])
    pd.testing.assert_frame_equal(norm(a, cols), norm(b, cols))


def test_out_dir_containing_epoch_component(pages5, tmp_path):
    """Chain resolution must not re-parse epoch numbers out of the whole
    path: an out_dir nested under a directory literally named
    'epoch=7' used to corrupt base resolution (review finding)."""
    out = str(tmp_path / "epoch=7" / "out")
    job = StreamingJob(pages5, out, run_id="ep7", num_partitions=4,
                       snapshot_full_every=3)
    res = job.run()
    assert res["completed"] == 4
    assert len(job.read_output("changes")) > 0


def test_tasks_to_actors_resume_through_delta_chain(pages5, tmp_path):
    """A tasks-mode stream that crashed after a DELTA epoch can resume
    in actor mode: restore_from resolves the chain when given the
    epoch (review finding — it used to reject delta frames)."""
    out = str(tmp_path / "xmode")
    job1 = StreamingJob(pages5, out, run_id="xm1", num_partitions=4,
                        snapshot_full_every=3)
    r1 = job1.run(stop_after=2)  # epoch 1 wrote delta frames
    assert r1["completed"] == 1

    job2 = StreamingJob(pages5, out, run_id="xm2", num_partitions=4,
                        mode="actors", snapshot_full_every=3)
    r2 = job2.run(resume=True)
    assert r2["completed"] == 4
    got = job2.read_output("changes")
    job2.kill_actors()

    ref_out = str(tmp_path / "ref")
    ref = StreamingJob(pages5, ref_out, run_id="xmref", num_partitions=4)
    ref.run()
    want = ref.read_output("changes")
    cols = ["url", "ts_us", "version", "change_kind"]
    pd.testing.assert_frame_equal(norm(got, cols), norm(want, cols))


# ------------------------------------------------- dedup state TTL

def test_dedup_ttl_evicts_idle_keys_and_restarts_version():
    """Keys idle past the TTL are evicted at watermark advance; a
    re-seen key restarts at version 0/'insert' (Flink cleared-state
    semantics); active keys keep their counters."""
    ps = PartitionState(0, params(pattern=None, dedup_ttl_us=1_000))
    ps.process(0, tbl([
        {"url": "idle", "ts_us": 100, "lang": "en"},
        {"url": "hot", "ts_us": 120, "lang": "en"},
    ]))
    ps.advance_watermark(500)  # nothing old enough yet
    assert set(ps.last_ts) == {"idle", "hot"}
    # hot stays active; idle goes quiet
    ps.process(1, tbl([{"url": "hot", "ts_us": 9_000, "lang": "en"}]))
    ps.advance_watermark(10_000)  # cutoff 9_000: idle(100) out, hot kept
    assert set(ps.last_ts) == {"hot"}
    assert ps.evicted_total == 1
    out = ps.process(2, tbl([
        {"url": "idle", "ts_us": 20_000, "lang": "en"},
        {"url": "hot", "ts_us": 20_001, "lang": "en"},
    ]))["changes"].to_pandas().set_index("url")
    assert out.loc["idle", "version"] == 0
    assert out.loc["idle", "change_kind"] == "insert"
    assert out.loc["hot", "version"] == 2  # counter survived


def test_dedup_ttl_bounds_state_growth():
    """With a TTL spanning ~2 epochs of event time, state holds only the
    keys active inside the horizon — not every key ever seen."""
    ps = PartitionState(0, params(pattern=None, dedup_ttl_us=2_000))
    for e in range(10):
        ps.process(e, tbl([
            {"url": f"e{e}k{i}", "ts_us": 1_000 * e + i, "lang": "en"}
            for i in range(100)
        ]))
        ps.advance_watermark(1_000 * e + 999)
    assert len(ps.last_ts) <= 300, len(ps.last_ts)  # not 1000
    assert ps.evicted_total >= 700


def test_dedup_ttl_delta_tombstones_restore_parity():
    """A chain restore must reproduce evictions: deltas carry tombstones
    for evicted keys, and an evict-then-reinsert is a plain upsert."""
    p = params(pattern=None, dedup_ttl_us=1_000)
    a = PartitionState(0, p)
    a.process(0, tbl([
        {"url": "gone", "ts_us": 100, "lang": "en"},
        {"url": "back", "ts_us": 110, "lang": "en"},
        {"url": "kept", "ts_us": 120, "lang": "en"},
    ]))
    a.advance_watermark(500)
    frames = [a.snapshot_bytes()]
    # epoch 1: kept stays active; 'back' is re-seen AFTER eviction
    a.process(1, tbl([{"url": "kept", "ts_us": 19_000, "lang": "en"}]))
    a.advance_watermark(20_000)  # evicts gone+back (last_ts 100/110)
    a.process(2, tbl([{"url": "back", "ts_us": 30_000, "lang": "en"}]))
    frames.append(a.delta_bytes(0))

    b = PartitionState(0, p)
    b.restore_chain(frames)
    assert b.last_ts == a.last_ts
    assert b.version == a.version
    assert "gone" not in b.last_ts
    assert b.version["back"] == 0  # reinserted after eviction
    assert b.evicted_total == a.evicted_total == 2
    # behavioral parity on the next epoch
    nxt = tbl([{"url": "gone", "ts_us": 40_000, "lang": "en"},
               {"url": "kept", "ts_us": 40_001, "lang": "en"}])
    out_a = a.process(3, nxt)["changes"].to_pandas()
    out_b = b.process(3, nxt)["changes"].to_pandas()
    pd.testing.assert_frame_equal(out_a, out_b)


def test_dedup_ttl_end_to_end_resume_parity(tmp_path):
    """TTL through the full job: evictions happen mid-stream, the
    ttl_evicted metric lands in manifests, and a killed+resumed run is
    row-identical to an uninterrupted one (tombstoned deltas restore)."""
    pages = str(tmp_path / "pages")
    # 3 epochs, small url pool → urls recur; a short TTL forces evictions
    write_pages_dir(pages, n_urls=300, seed=33, n_epochs=3)
    ttl = 10 * 60 * 1_000_000  # 10 min event time

    job_a = StreamingJob(pages, str(tmp_path / "a"), run_id="ttlA",
                         num_partitions=4, dedup_ttl_us=ttl,
                         snapshot_full_every=2)
    job_a.run()
    evicted = sum(
        p.get("ttl_evicted", 0)
        for e in job_a.sink.committed_epochs()
        for p in job_a.sink.read_manifest(e)["partitions"]
    )
    assert evicted > 0, "fixture must actually exercise eviction"

    job_b1 = StreamingJob(pages, str(tmp_path / "b"), run_id="ttlB1",
                          num_partitions=4, dedup_ttl_us=ttl,
                          snapshot_full_every=2)
    job_b1.run(stop_after=2)
    job_b2 = StreamingJob(pages, str(tmp_path / "b"), run_id="ttlB2",
                          num_partitions=4, dedup_ttl_us=ttl,
                          snapshot_full_every=2)
    job_b2.run(resume=True)

    cols = ["url", "ts_us", "version", "change_kind"]
    a = job_a.read_output("changes")[cols].sort_values(cols).reset_index(
        drop=True)
    b = job_b2.read_output("changes")[cols].sort_values(cols).reset_index(
        drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_dedup_ttl_mode_parity(tmp_path):
    """TTL evictions happen in PartitionState, so tasks mode and actors
    mode must produce identical outputs under eviction."""
    pages = str(tmp_path / "pages")
    write_pages_dir(pages, n_urls=250, seed=34, n_epochs=3)
    ttl = 10 * 60 * 1_000_000

    def run(out, run_id, mode):
        j = StreamingJob(pages, str(tmp_path / out), run_id=run_id,
                         num_partitions=4, dedup_ttl_us=ttl, mode=mode)
        j.run()
        return j

    jt = run("t", "ttlT", "tasks")
    ja = run("a", "ttlA2", "actors")
    ja.kill_actors()
    cols = ["url", "ts_us", "version", "change_kind"]
    a = jt.read_output("changes")[cols].sort_values(cols).reset_index(
        drop=True)
    b = ja.read_output("changes")[cols].sort_values(cols).reset_index(
        drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_delta_sections_carry_only_touched_keys():
    """Keyed SMALL sections (open windows/sessions/NFA partials) delta
    too: with a large ACTIVE horizon (watermark held back, so nothing
    closes), an epoch touching 2 keys writes a frame that carries 2
    keys per section — not the whole horizon re-pickled."""
    ps = PartitionState(0, params(session_gap_us=10**12,
                                  window_size_us=10**12))
    ps.process(0, tbl([
        {"url": f"u{i}", "ts_us": 10 + i, "lang": "en"}
        for i in range(500)
    ]))
    ps.advance_watermark(5)  # holds every window/session/run open
    full = ps.snapshot_bytes()

    ps.process(1, tbl([
        {"url": "u0", "ts_us": 50_000, "lang": "en"},
        {"url": "new", "ts_us": 50_001, "lang": "en"},
    ]))
    ps.advance_watermark(6)
    delta = ps.delta_bytes(0)
    st = ps._decode(delta)
    assert set(st["sess_upserts"]) == {"u0", "new"}
    assert st["sess_tombstones"] == []
    # u0's second event opens window (en, wid) — same wid key as epoch 0
    assert all(k[0] == "en" for k in st["win_upserts"])
    assert len(st["win_upserts"]) <= 2
    # "new"'s A event appends a run; u0's B event only EMITS (skip-mode
    # keeps the old partial untouched) so the fast path may omit it
    assert {"new"} <= set(st["nfa_delta"]["upserts"]) <= {"u0", "new"}
    assert len(delta) < len(full) / 10

    # chain restore still exact
    fresh = PartitionState(0, params(session_gap_us=10**12,
                                     window_size_us=10**12))
    fresh.restore_chain([full, delta])
    assert fresh.sessions == ps.sessions
    assert fresh.win == ps.win
    assert fresh.nfa.partials == ps.nfa.partials


def test_delta_section_tombstones_on_close():
    """Windows/sessions closed by the watermark and NFA run lists that
    expire must tombstone in the next delta — without them a chain
    restore resurrects closed state."""
    ps = PartitionState(0, params())
    ps.process(0, tbl([
        {"url": "a", "ts_us": 10, "lang": "en"},
        {"url": "b", "ts_us": 20, "lang": "de"},
    ]))
    ps.advance_watermark(5)
    full = ps.snapshot_bytes()

    # watermark sweeps past everything: windows+sessions close, NFA
    # partials expire (within_us=500)
    ps.advance_watermark(10_000)
    delta = ps.delta_bytes(0)
    st = ps._decode(delta)
    assert st["win_upserts"] == {} and st["sess_upserts"] == {}
    assert set(st["sess_tombstones"]) == {"a", "b"}
    assert len(st["win_tombstones"]) == 2
    assert set(st["nfa_delta"]["tombstones"]) == {"a", "b"}

    fresh = PartitionState(0, params())
    fresh.restore_chain([full, delta])
    assert fresh.win == {} and fresh.sessions == {}
    assert fresh.nfa.partials == {}


def test_legacy_full_section_delta_frames_still_apply():
    """Frames written by the pre-keyed-delta format (small sections in
    full under 'win'/'sessions'/'nfa') must still restore — a resume can
    cross the upgrade boundary mid-chain."""
    import pickle
    import struct

    ps = PartitionState(0, params())
    ps.process(0, tbl([{"url": "a", "ts_us": 10, "lang": "en"}]))
    ps.advance_watermark(5)
    full = ps.snapshot_bytes()

    ps.process(1, tbl([{"url": "a", "ts_us": 200, "lang": "en"},
                       {"url": "z", "ts_us": 210, "lang": "de"}]))
    ps.advance_watermark(6)
    # hand-build an OLD-format delta: dedup upserts + full sections
    raw = pickle.dumps({
        "dedup_last_ts": dict(ps.last_ts),
        "dedup_version": dict(ps.version),
        "dedup_tombstones": [],
        "win": dict(ps.win),
        "sessions": dict(ps.sessions),
        "nfa": ps.nfa.state(),
        "join": None,
        "watermark_us": ps.watermark_us,
        "max_ts_us": ps.max_ts_us,
        "ttl_sweep_wm": ps._ttl_sweep_wm,
        "evicted_total": ps.evicted_total,
    })
    legacy = PartitionState._compress(raw, PartitionState._DELTA_MAGIC,
                                      head=struct.pack("<Q", 0))

    fresh = PartitionState(0, params())
    fresh.restore_chain([full, legacy])
    assert fresh.last_ts == ps.last_ts
    assert fresh.version == ps.version
    assert fresh.win == ps.win
    assert fresh.sessions == ps.sessions
    assert fresh.nfa.partials == ps.nfa.partials
