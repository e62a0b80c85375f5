"""Checkpoint rescaling: resume at a different partition count with
output parity (up- and down-scale), state-loss guards, fsck green."""

import os

import pandas as pd
import pytest

from gush_ray.datagen import write_clicks_dir, write_pages_dir
from gush_ray.pipelines.epoch_loop import StreamingJob
from gush_ray.rescale import rescale_state


def _pages(tmp_path, **kw):
    p = str(tmp_path / "pages")
    # late_frac=0: the watermark's evolution is then identical under any
    # partition layout (every epoch-e row sits above every earlier max),
    # so a rescaled run must reproduce the uninterrupted output EXACTLY.
    write_pages_dir(p, n_urls=250, seed=71, n_epochs=4, late_frac=0.0, **kw)
    return p


def _outputs(j):
    out = {}
    for s in ("changes", "matches", "late"):
        df = j.read_output(s)
        cols = sorted(df.columns)
        out[s] = df[cols].sort_values(cols).reset_index(drop=True) \
            if len(df) else df
    # a session closed by a later-arriving row of its key goes to the
    # "sessions" stream; one closed by the watermark to "sessions_wm".
    # WHICH of the two closes it depends on watermark pacing (partition-
    # layout-dependent); the UNION is the event-time-determined output.
    su = pd.concat([j.read_output("sessions"),
                    j.read_output("sessions_wm")], ignore_index=True)
    cols = sorted(su.columns)
    out["sessions_union"] = su[cols].sort_values(cols).reset_index(
        drop=True)
    w = j.read_output("windows")
    # windows are per-partition ADDITIVE partials: compare aggregated
    gcols = [c for c in w.columns if c not in ("n", "sum_value")]
    out["windows"] = (w.groupby(gcols, dropna=False, as_index=False)
                      .agg(n=("n", "sum"), sum_value=("sum_value", "sum"))
                      .sort_values(gcols).reset_index(drop=True))
    return out


@pytest.mark.parametrize("new_p", [8, 2])
def test_rescale_resume_parity(tmp_path, new_p):
    """Direct rescale mid-stream: every event-time-determined output
    matches the uninterrupted run exactly. pattern=None because the
    NFA's max_partials overflow truncation is the one watermark-PACING-
    sensitive output and pacing is inherently finer at higher P (see
    rescale module docstring) — the NFA's exactness under rescale is
    pinned by the round-trip test below instead."""
    pages = _pages(tmp_path)

    ja = StreamingJob(pages, str(tmp_path / "a"), run_id="rsA",
                      num_partitions=4, pattern=None)
    ja.run()

    jb = StreamingJob(pages, str(tmp_path / "b"), run_id="rsB1",
                      num_partitions=4, pattern=None)
    jb.run(stop_after=2)
    rep = rescale_state(str(tmp_path / "b"), new_p, params=jb.params)
    assert rep["rescaled"] and rep["old_P"] == 4 and rep["new_P"] == new_p
    jb2 = StreamingJob(pages, str(tmp_path / "b"), run_id="rsB2",
                       num_partitions=new_p, pattern=None)
    jb2.run()

    a, b = _outputs(ja), _outputs(jb2)
    for s in a:
        pd.testing.assert_frame_equal(a[s], b[s], check_dtype=False), s

    from gush_ray.fsck import audit

    rep = audit(str(tmp_path / "b"))
    assert rep["ok"], rep["problems"]


def test_rescale_round_trip_full_parity(tmp_path):
    """4→8→4 round trip mid-stream with the NFA ACTIVE: the per-key
    state and the reconstructed per-partition maxima return bit-exact,
    so the continued P=4 run reproduces the uninterrupted P=4 run
    INCLUDING the watermark-pacing-sensitive NFA output."""
    pages = _pages(tmp_path)

    ja = StreamingJob(pages, str(tmp_path / "a"), run_id="rtA",
                      num_partitions=4)
    ja.run()

    jb = StreamingJob(pages, str(tmp_path / "b"), run_id="rtB1",
                      num_partitions=4)
    jb.run(stop_after=2)
    assert rescale_state(str(tmp_path / "b"), 8, params=jb.params)["rescaled"]
    assert rescale_state(str(tmp_path / "b"), 4, params=jb.params)["rescaled"]
    jb2 = StreamingJob(pages, str(tmp_path / "b"), run_id="rtB2",
                       num_partitions=4)
    jb2.run()
    a, b = _outputs(ja), _outputs(jb2)
    for s in a:
        pd.testing.assert_frame_equal(a[s], b[s], check_dtype=False), s


def test_rescale_with_stream_join(tmp_path):
    """Join buffers migrate with their keys: rescaled mid-stream join
    emits the identical pair set."""
    from gush_ray.state.join_state import JoinSpec

    pages = _pages(tmp_path)
    clicks = str(tmp_path / "clicks")
    write_clicks_dir(clicks, n_urls=250, seed=71, clicks_per_epoch=400,
                     n_epochs=4)
    HALF_H = 30 * 60 * 1_000_000
    spec = dict(right_dir=clicks,
                join_spec=JoinSpec(-HALF_H, HALF_H,
                                   left_cols=("version",),
                                   right_cols=("click_id",)))

    ja = StreamingJob(pages, str(tmp_path / "a"), run_id="rsjA",
                      num_partitions=4, **spec)
    ja.run()
    jb = StreamingJob(pages, str(tmp_path / "b"), run_id="rsjB1",
                      num_partitions=4, **spec)
    jb.run(stop_after=2)
    rescale_state(str(tmp_path / "b"), 8, params=jb.params)
    jb2 = StreamingJob(pages, str(tmp_path / "b"), run_id="rsjB2",
                       num_partitions=8, **spec)
    jb2.run()
    cols = None
    a = ja.read_output("joined")
    b = jb2.read_output("joined")
    cols = sorted(a.columns)
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False)


def test_rescale_guards(tmp_path):
    from gush_ray.state.store import StateParams

    pages = _pages(tmp_path)
    jb = StreamingJob(pages, str(tmp_path / "b"), run_id="rsgB",
                      num_partitions=4)
    jb.run(stop_after=2)
    # the default pattern leaves NFA partials in state: rescaling with
    # bare params must refuse rather than silently drop them
    with pytest.raises(ValueError, match="NFA partial"):
        rescale_state(str(tmp_path / "b"), 8, params=StateParams())
    # same P is a no-op for the layout, but STILL sweeps uncommitted
    # slots (idempotence across the commit→sweep crash window: a re-run
    # after a crash mid-rescale must clear the orphans — round-4 ADVICE)
    orphan = tmp_path / "b" / "changes" / "epoch=00099"
    orphan.mkdir(parents=True)
    (orphan / "part-00000.parquet").write_bytes(b"junk")
    assert rescale_state(str(tmp_path / "b"), 4,
                         params=jb.params) == {
        "rescaled": False, "old_P": 4, "new_P": 4,
        "swept_uncommitted_files": 1}
    assert not orphan.exists()

    jb2 = StreamingJob(pages, str(tmp_path / "b"), run_id="rsgB2",
                       num_partitions=4)
    jb2.run()
    with pytest.raises(ValueError, match="finalized"):
        rescale_state(str(tmp_path / "b"), 8, params=jb2.params)


def test_rescale_with_window_analytics_state(tmp_path):
    """The seventh-wave state sections migrate on rescale: quantile
    histograms (additive), HLL registers (max-merge), early-fire
    emitted slots (additive; the changelog's future retractions retract
    the sum) — a 4→8 rescale mid-stream reproduces the uninterrupted
    quantiles / window_hll streams exactly and keeps the early-fire
    fold invariant."""
    pages = _pages(tmp_path)
    kw = dict(value_col="version", window_quantiles=(0.5, 1.0),
              window_hll_p=12, window_distinct=True,
              window_early_fire=True)

    ja = StreamingJob(pages, str(tmp_path / "a"), run_id="rwaA",
                      num_partitions=4, **kw)
    ja.run()

    jb = StreamingJob(pages, str(tmp_path / "b"), run_id="rwaB1",
                      num_partitions=4, **kw)
    jb.run(stop_after=2)
    assert rescale_state(str(tmp_path / "b"), 8,
                         params=jb.params)["rescaled"]
    jb2 = StreamingJob(pages, str(tmp_path / "b"), run_id="rwaB2",
                       num_partitions=8, **kw)
    jb2.run()

    # quantiles / window_hll are global merges — IDENTICAL rows
    for s, cols in (("quantiles", ["lang", "change_kind", "window_id",
                                   "q", "value", "n"]),
                    ("window_hll", ["lang", "change_kind", "window_id",
                                    "n_est"])):
        a = ja.read_output(s)[cols]
        b = jb2.read_output(s)[cols]
        pd.testing.assert_frame_equal(
            a.sort_values(cols).reset_index(drop=True),
            b.sort_values(cols).reset_index(drop=True)), s

    # early-fire changelog rows are per-partition (layout-dependent),
    # but the FOLD is event-time-determined: equal across layouts
    key = ["lang", "change_kind", "window_id"]

    def fold(j):
        log = j.read_output("window_early")
        f = log.assign(n_=log["change"] * log["n"]).groupby(
            key, as_index=False)["n_"].sum()
        return f[f["n_"] != 0].sort_values(key).reset_index(drop=True)

    pd.testing.assert_frame_equal(fold(ja), fold(jb2))


def test_rescale_sweeps_uncommitted_slots(tmp_path):
    """A job killed mid-epoch leaves part files for the in-flight epoch
    at the OLD partition count. Same-P resume overwrites them by name;
    after a rescale DOWN the replay writes fewer slots, so the old
    count's higher-slot leftovers would double-count once the epoch
    commits (fsck disk!=manifest — found by the headroom ops drill).
    rescale_state must sweep every slot above the committed prefix."""
    import pyarrow as pa

    from gush_ray.fsck import audit
    from gush_ray.sinks.exactly_once import ExactlyOnceSink

    pages = _pages(tmp_path)
    out = str(tmp_path / "b")
    ja = StreamingJob(pages, str(tmp_path / "a"), run_id="swA",
                      num_partitions=4, pattern=None)
    ja.run()

    jb = StreamingJob(pages, out, run_id="swB1",
                      num_partitions=4, pattern=None)
    jb.run(stop_after=2)
    # simulate the kill: the in-flight epoch 2 already wrote parts at
    # P=4 (slots 0..3 — slots >= new_p are the ones a resume at new_p
    # can never overwrite), plus an orphan state snapshot
    t = pa.table({"url": ["x"], "v": [1]})
    for pid in (0, 3):
        ExactlyOnceSink.write_part(out, "changes", 2, pid, t)
    snap = os.path.join(out, "_state", "epoch=00002")
    os.makedirs(snap, exist_ok=True)
    with open(os.path.join(snap, "part-00003.pkl"), "wb") as f:
        f.write(b"garbage")

    rep = rescale_state(out, 2, params=jb.params)
    assert rep["rescaled"] and rep["swept_uncommitted_files"] == 3

    jb2 = StreamingJob(pages, out, run_id="swB2",
                       num_partitions=2, pattern=None)
    jb2.run()
    fs = audit(out)
    assert fs["ok"], fs["problems"]
    a, b = _outputs(ja), _outputs(jb2)
    for s in a:
        pd.testing.assert_frame_equal(a[s], b[s], check_dtype=False), s


def test_rescale_parallel_matches_serial(tmp_path):
    """The Ray-task chain restore (parallel=True) must yield state
    IDENTICAL to the in-process restore: rescale two copies of the same
    checkpoint both ways and compare every restored state section of
    every new partition, plus the rewritten manifests."""
    import shutil

    from gush_ray.sinks.exactly_once import ExactlyOnceSink
    from gush_ray.state.store import PartitionState, StateParams
    from gush_ray.state.store import restore_state_from_chain

    pages = _pages(tmp_path)
    out_a = str(tmp_path / "a")
    ja = StreamingJob(pages, out_a, run_id="rpA", num_partitions=4)
    ja.run(stop_after=2)
    out_b = str(tmp_path / "b")
    shutil.copytree(out_a, out_b)

    rep_a = rescale_state(out_a, 8, params=ja.params, parallel=False)
    rep_b = rescale_state(out_b, 8, params=ja.params, parallel=True)
    assert rep_a == rep_b

    man_a = ExactlyOnceSink(out_a).read_manifest(1)
    man_b = ExactlyOnceSink(out_b).read_manifest(1)
    for pa_row, pb_row in zip(man_a["partitions"], man_b["partitions"]):
        sa = {k: v for k, v in pa_row.items() if k != "snapshot"}
        sb = {k: v for k, v in pb_row.items() if k != "snapshot"}
        assert sa == sb

    for pid in range(8):
        a = PartitionState(pid, ja.params)
        restore_state_from_chain(
            a, os.path.join(out_a, "_state", "epoch=00001",
                            f"part-{pid:05d}.pkl"), 1)
        b = PartitionState(pid, ja.params)
        restore_state_from_chain(
            b, os.path.join(out_b, "_state", "epoch=00001",
                            f"part-{pid:05d}.pkl"), 1)
        assert a.last_ts == b.last_ts
        assert a.version == b.version
        assert a.sessions == b.sessions
        assert a.win == b.win
        assert a.winq == b.winq
        assert a.watermark_us == b.watermark_us
        assert a.max_ts_us == b.max_ts_us
        assert a.nfa.partials == b.nfa.partials
