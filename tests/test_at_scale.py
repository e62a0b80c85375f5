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
