"""AT-SCALE profile (round-3 verdict item 2): one switch flips every
unbounded-state exact mode to its bounded-state sketch sibling —
window_distinct → window_hll_p, exact window_quantiles →
quantile_sketch_k, dedup state TTL'd — and the exact modes warn loudly
(`exact_state_oversized` manifest metric + one log line) when an open
slot outgrows the bound. The profile is tolerance-green on the SAME
fixture the exact modes pass bit-exactly: hll estimates track exact
distinct counts, and each sketch quantile equals _sketch_rep(exact
quantile) EXACTLY (the rank-preservation contract)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gush_ray.datagen import write_pages_dir
from gush_ray.pipelines.epoch_loop import StreamingJob
from gush_ray.state.store import (AT_SCALE_DEDUP_TTL_US, AT_SCALE_HLL_P,
                                  AT_SCALE_SKETCH_K, PartitionState,
                                  StateParams, _sketch_rep)


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("as_pages")
    write_pages_dir(str(d), n_urls=500, seed=29, n_epochs=3)
    return str(d)


def test_profile_flips_params(pages_dir, tmp_path):
    job = StreamingJob(
        str(pages_dir), str(tmp_path / "o1"), run_id="as_p",
        num_partitions=2, window_distinct=True, value_col="version",
        window_quantiles=(0.5, 0.9), at_scale=True)
    p = job.params
    assert p.window_distinct is False
    assert p.window_hll_p == AT_SCALE_HLL_P
    assert p.quantile_sketch_k == AT_SCALE_SKETCH_K
    assert p.dedup_ttl_us == AT_SCALE_DEDUP_TTL_US

    # explicit user choices survive the profile
    job2 = StreamingJob(
        str(pages_dir), str(tmp_path / "o2"), run_id="as_p2",
        num_partitions=2, window_distinct=True, window_hll_p=8,
        dedup_ttl_us=123, at_scale=True)
    assert job2.params.window_hll_p == 8
    assert job2.params.dedup_ttl_us == 123


def test_profile_tolerance_green_vs_exact_modes(
        ray_session, pages_dir, tmp_path):
    """Exact run vs at-scale run on the SAME input:

    * every sketch quantile == _sketch_rep(exact quantile) — exact
      equality, the rank-preservation property, not a tolerance;
    * every HLL window estimate within 5% (+2 abs) of the exact
      n_distinct;
    * window/session/change streams identical (the profile touches
      only the distinct/quantile state representation).
    """
    qs = (0.5, 0.9)
    kw = dict(num_partitions=4, value_col="version",
              window_quantiles=qs)
    exact = StreamingJob(str(pages_dir), str(tmp_path / "ex"),
                         run_id="as_ex", window_distinct=True, **kw)
    exact.run()
    prof = StreamingJob(str(pages_dir), str(tmp_path / "sc"),
                        run_id="as_sc", window_distinct=True,
                        at_scale=True, **kw)
    prof.run()

    gcols = ["lang", "change_kind", "window_id"]

    # changes stream untouched by the profile (TTL horizon ≫ fixture)
    ce = exact.read_output("changes")
    cp = prof.read_output("changes")
    cols = ["url", "ts_us", "version"]
    pd.testing.assert_frame_equal(
        ce[cols].sort_values(cols).reset_index(drop=True),
        cp[cols].sort_values(cols).reset_index(drop=True))

    # quantiles: sketch value == rep(exact value), counts identical
    qe = exact.read_output("quantiles").set_index(gcols + ["q"])
    qp = prof.read_output("quantiles").set_index(gcols + ["q"])
    assert set(qe.index) == set(qp.index) and len(qe)
    for idx in qe.index:
        ev, en = qe.loc[idx, "value"], qe.loc[idx, "n"]
        pv, pn = qp.loc[idx, "value"], qp.loc[idx, "n"]
        assert pn == en, idx
        want = float(_sketch_rep(np.array([float(ev)]),
                                 AT_SCALE_SKETCH_K)[0])
        assert pv == want, (idx, pv, want, ev)

    # distinct: exact n_distinct (windows stream rows are PARTITION
    # partials — url is the exchange key, so the global count is their
    # sum) vs the stage-2-merged HLL estimates
    we = (exact.read_output("windows")
          .groupby(gcols, dropna=False)["n_distinct"].sum())
    he = (prof.read_output("window_hll")
          .groupby(gcols, dropna=False)["n_est"].sum())
    assert set(we.index) == set(he.index) and len(we)
    for idx in we.index:
        exact_n, est = int(we.loc[idx]), int(he.loc[idx])
        assert abs(est - exact_n) <= max(2, 0.05 * exact_n), (
            idx, exact_n, est)

    exact.kill_actors()
    prof.kill_actors()


def _mk_table(urls, ts, langs):
    return pa.table({
        "url": pa.array(urls), "ts_us": pa.array(ts, type=pa.int64()),
        "lang": pa.array(langs)})


def test_exact_state_oversized_metric_and_single_warning(caplog):
    """The loud at-scale warning on the exact modes: a distinct-key set
    outgrowing exact_state_warn_keys surfaces in the metrics dict every
    epoch and logs exactly once per partition."""
    import logging

    ps = PartitionState(3, StateParams(
        key_col="url", ts_col="ts_us", window_group_cols=("lang",),
        window_size_us=10_000, pattern=None, window_distinct=True,
        exact_state_warn_keys=3))
    with caplog.at_level(logging.WARNING, logger="gush_ray"):
        out = ps._process_impl(_mk_table(
            [f"u{i}" for i in range(10)], [100 + i for i in range(10)],
            ["en"] * 10))
        assert out["metrics"]["exact_state_oversized"] == 1
        out2 = ps._process_impl(_mk_table(["u99"], [200], ["en"]))
        assert out2["metrics"]["exact_state_oversized"] == 1
    warns = [r for r in caplog.records if "at-scale" in r.message]
    assert len(warns) == 1 and "partition 3" in warns[0].message

    # bounded modes never trigger it
    ps2 = PartitionState(0, StateParams(
        key_col="url", ts_col="ts_us", window_group_cols=("lang",),
        window_size_us=10_000, pattern=None, window_hll_p=6,
        exact_state_warn_keys=3))
    out = ps2._process_impl(_mk_table(
        [f"u{i}" for i in range(10)], [100 + i for i in range(10)],
        ["en"] * 10))
    assert out["metrics"]["exact_state_oversized"] == 0


def test_state_keys_cap_engages_and_bounds(ray_session, tmp_path):
    """Round-5 capacity-wall escalation: with NO TTL configured and a
    tiny state_keys_budget, the keys-ever dedup maps cross the
    per-partition cap mid-stream and the engine ACTS — oldest
    sub-watermark keys evict with cleared-state semantics, the switch
    is recorded in the manifest (`state_cap_engaged`), and the final
    state is bounded near the cap instead of tracking keys-ever. The
    flag survives snapshot/restore."""
    from gush_ray.sinks.exactly_once import ExactlyOnceSink
    from gush_ray.state.store import restore_state_from_chain

    pages = str(tmp_path / "pages")
    # many distinct urls, no recrawls -> keys-ever grows ~linearly
    write_pages_dir(pages, n_urls=3000, seed=41, n_epochs=4,
                    late_frac=0.0)
    out = str(tmp_path / "out")
    P = 2
    job = StreamingJob(pages, out, run_id="cap1", num_partitions=P,
                       pattern=None, state_keys_budget=400)  # cap=200
    job.run()

    sink = ExactlyOnceSink(out)
    engaged_epochs = [
        e for e in sink.committed_epochs()
        if any(p.get("state_cap_engaged") for p in
               sink.read_manifest(e)["partitions"])
    ]
    assert engaged_epochs, "cap never engaged on a 3000-key stream"
    last = sink.last_contiguous_epoch()
    man = sink.read_manifest(last)
    assert any(p.get("state_cap_engaged") for p in man["partitions"])
    assert sum(p.get("ttl_evicted", 0) for p in man["partitions"]) > 0

    total_keys = 0
    for pid in range(P):
        ps = PartitionState(pid, job.params)
        restore_state_from_chain(
            ps, str(tmp_path / "out" / "_state" / f"epoch={last:05d}" /
                    f"part-{pid:05d}.pkl"), last)
        assert ps.state_cap_engaged  # persisted through the frames
        # bounded near the cap (hysteresis floor 90%; keys at/above the
        # watermark are never evicted, so allow the active horizon)
        assert len(ps.last_ts) <= 200 + 600
        total_keys += len(ps.last_ts)
    assert total_keys < 3000  # NOT keys-ever

    # the default budget leaves a small job untouched
    out2 = str(tmp_path / "out2")
    job2 = StreamingJob(pages, out2, run_id="cap2", num_partitions=P,
                        pattern=None)
    job2.run()
    man2 = ExactlyOnceSink(out2).read_manifest(
        ExactlyOnceSink(out2).last_contiguous_epoch())
    assert not any(p.get("state_cap_engaged")
                   for p in man2["partitions"])
    # and the two runs' CHANGES streams differ only in the re-inserts
    # the evictions caused (cleared-state semantics): every (url, ts)
    # pair is still emitted exactly once
    ca = job.read_output("changes")[["url", "ts_us"]]
    cb = job2.read_output("changes")[["url", "ts_us"]]
    pd.testing.assert_frame_equal(
        ca.sort_values(["url", "ts_us"]).reset_index(drop=True),
        cb.sort_values(["url", "ts_us"]).reset_index(drop=True))


def test_state_cap_deterministic_under_resume(ray_session, tmp_path):
    """Eviction is a pure function of state, so kill -> resume replays
    the same engagement point and the same final state as the
    uninterrupted run."""
    from gush_ray.sinks.exactly_once import ExactlyOnceSink

    pages = str(tmp_path / "pages")
    write_pages_dir(pages, n_urls=2000, seed=43, n_epochs=4,
                    late_frac=0.0)

    ja = StreamingJob(pages, str(tmp_path / "a"), run_id="capA",
                      num_partitions=2, pattern=None,
                      state_keys_budget=300)
    ja.run()

    jb = StreamingJob(pages, str(tmp_path / "b"), run_id="capB",
                      num_partitions=2, pattern=None,
                      state_keys_budget=300)
    jb.run(stop_after=2)
    jb2 = StreamingJob(pages, str(tmp_path / "b"), run_id="capB2",
                       num_partitions=2, pattern=None,
                       state_keys_budget=300)
    jb2.run()

    for s in ("changes", "late"):
        da = ja.read_output(s)
        db = jb2.read_output(s)
        cols = sorted(da.columns)
        pd.testing.assert_frame_equal(
            da[cols].sort_values(cols).reset_index(drop=True),
            db[cols].sort_values(cols).reset_index(drop=True))
    ma = ExactlyOnceSink(str(tmp_path / "a"))
    mb = ExactlyOnceSink(str(tmp_path / "b"))
    for e in ma.committed_epochs():
        pa_rows = ma.read_manifest(e)["partitions"]
        pb_rows = mb.read_manifest(e)["partitions"]
        for ra, rb in zip(pa_rows, pb_rows):
            assert ra.get("state_cap_engaged") == \
                rb.get("state_cap_engaged")
            assert ra.get("ttl_evicted", 0) == rb.get("ttl_evicted", 0)
