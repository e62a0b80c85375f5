"""Map-side window combiners (round-5 verdict item 4): the hot-key
mitigation for the commutative window state. A hot url pins O(rows) to
one partition in the default keyed exchange; with ``window_combine``
the map pre-aggregates per-(group, window) cells and the owner costs
O(map tasks × open windows). The chaos pin: a 30%-of-stream hot key,
default topology vs combined topology — windows + HLL output IDENTICAL,
owner-partition rows_in drops >= 5x."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gush_ray.pipelines.epoch_loop import StreamingJob
from gush_ray.sinks.exactly_once import ExactlyOnceSink

N_EPOCHS = 4
ROWS_PER_EPOCH = 6000
HOT_FRAC = 0.30


def _write_hotkey_pages(root, seed=97):
    """In-order stream (every epoch's rows above all earlier ones) with
    a 30% hot url — the adversarial shape for the keyed exchange."""
    import os

    rng = np.random.default_rng(seed)
    langs = np.array(["en", "de", "fr", "pt"])
    for e in range(N_EPOCHS):
        n = ROWS_PER_EPOCH
        hot = rng.random(n) < HOT_FRAC
        urls = np.array([f"https://x.org/u{e}_{i}" for i in range(n)],
                        dtype=object)
        urls[hot] = "https://hot.example.com/"
        ts = (np.int64(1_700_000_000_000_000)
              + np.int64(e) * 1_800_000_000
              + np.sort(rng.integers(0, 1_799_000_000, n)))
        tab = pa.table({
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "lang": pa.array(rng.choice(langs, n)),
            "size": pa.array(rng.integers(100, 5000, n).astype("float64")),
        })
        d = os.path.join(root, f"epoch={e:04d}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(tab, os.path.join(d, "part-0.parquet"))
    return root


@pytest.fixture(scope="module")
def hot_pages(tmp_path_factory):
    return _write_hotkey_pages(str(tmp_path_factory.mktemp("hot")))


def _run(pages, out, run_id, combine):
    job = StreamingJob(
        pages, out, run_id=run_id, num_partitions=4, pattern=None,
        window_group_cols=("lang",), value_col="size",
        window_hll_p=10, window_combine=combine)
    job.run()
    return job


def _norm_windows(df):
    m = df.groupby(["lang", "window_id"], as_index=False).agg(
        n=("n", "sum"), sum_value=("sum_value", "sum"))
    return m.sort_values(["lang", "window_id"]).reset_index(drop=True)


def _owner_rows(out):
    """Max per-partition total rows_in across the run — the hot-key
    owner's load."""
    sink = ExactlyOnceSink(out)
    tot = {}
    for e in sink.committed_epochs():
        for p in sink.read_manifest(e)["partitions"]:
            tot[p["partition_id"]] = (tot.get(p["partition_id"], 0)
                                      + p.get("rows_in", 0))
    return max(tot.values())


def test_hotkey_combine_identical_output_and_load_drop(
        ray_session, hot_pages, tmp_path):
    jd = _run(hot_pages, str(tmp_path / "default"), "hk-d", False)
    jc = _run(hot_pages, str(tmp_path / "combine"), "hk-c", True)

    # windows: same global (group, window) totals, exactly
    wd = _norm_windows(jd.read_output("windows"))
    wc = _norm_windows(jc.read_output("windows"))
    pd.testing.assert_frame_equal(wd, wc)
    assert wd["n"].sum() == N_EPOCHS * ROWS_PER_EPOCH

    # HLL distinct estimates: a pure function of each window's key SET
    # (fixed hash), so the streams are IDENTICAL row-for-row
    hd = jd.read_output("window_hll")
    hc = jc.read_output("window_hll")
    cols = ["lang", "window_id", "n_est"]
    pd.testing.assert_frame_equal(
        hd[cols].sort_values(cols).reset_index(drop=True),
        hc[cols].sort_values(cols).reset_index(drop=True))
    assert len(hd) > 0

    # in-order stream: nothing late in either topology
    assert len(jd.read_output("late")) == 0
    assert len(jc.read_output("late")) == 0

    # the mitigation itself: the hot key's owner partition carried the
    # whole key in the default exchange; cells spread it
    owner_d = _owner_rows(str(tmp_path / "default"))
    owner_c = _owner_rows(str(tmp_path / "combine"))
    assert owner_d >= HOT_FRAC * N_EPOCHS * ROWS_PER_EPOCH  # sanity
    assert owner_d / owner_c >= 5, (owner_d, owner_c)

    # conservation metric: every on-time row is represented in cells
    sink = ExactlyOnceSink(str(tmp_path / "combine"))
    rep = sum(p.get("rows_represented", 0)
              for e in sink.committed_epochs()
              for p in sink.read_manifest(e)["partitions"])
    assert rep == N_EPOCHS * ROWS_PER_EPOCH

    from gush_ray.fsck import audit
    for d in ("default", "combine"):
        r = audit(str(tmp_path / d))
        assert r["ok"] and not r["problems"], (d, r["problems"])


def test_combine_kill_resume_parity(ray_session, hot_pages, tmp_path):
    """The lateness floor is read from the epoch-(e-2) manifest, so a
    resumed combined run reproduces the uninterrupted one exactly."""
    ja = _run(hot_pages, str(tmp_path / "a"), "hkr-a", True)
    jb = StreamingJob(hot_pages, str(tmp_path / "b"), run_id="hkr-b",
                      num_partitions=4, pattern=None,
                      window_group_cols=("lang",), value_col="size",
                      window_hll_p=10, window_combine=True)
    jb.run(stop_after=2)
    jb2 = StreamingJob(hot_pages, str(tmp_path / "b"), run_id="hkr-b2",
                       num_partitions=4, pattern=None,
                       window_group_cols=("lang",), value_col="size",
                       window_hll_p=10, window_combine=True)
    jb2.run()
    pd.testing.assert_frame_equal(
        _norm_windows(ja.read_output("windows")),
        _norm_windows(jb2.read_output("windows")))
    cols = ["lang", "window_id", "n_est"]
    pd.testing.assert_frame_equal(
        ja.read_output("window_hll")[cols].sort_values(cols)
        .reset_index(drop=True),
        jb2.read_output("window_hll")[cols].sort_values(cols)
        .reset_index(drop=True))


def test_combine_refuses_order_dependent_modes(hot_pages, tmp_path):
    with pytest.raises(ValueError, match="windowed-analytics"):
        StreamingJob(hot_pages, str(tmp_path / "x"), run_id="hk-x",
                     num_partitions=2, window_combine=True)  # default NFA
    with pytest.raises(ValueError, match="windowed-analytics"):
        StreamingJob(hot_pages, str(tmp_path / "y"), run_id="hk-y",
                     num_partitions=2, pattern=None, window_combine=True,
                     window_distinct=True)


def test_combine_sliding_windows_match_default(ray_session, hot_pages,
                                               tmp_path):
    """Sliding windows ride the cell path by row replication in the
    MAP (one cell contribution per overlapping window) — totals must
    equal the default topology's per-row replication exactly."""
    def run(out, run_id, combine):
        job = StreamingJob(
            hot_pages, out, run_id=run_id, num_partitions=4,
            pattern=None, window_group_cols=("lang",),
            window_size_us=30 * 60 * 1_000_000,
            window_slide_us=10 * 60 * 1_000_000,
            value_col="size", window_combine=combine)
        job.run()
        return job

    jd = run(str(tmp_path / "d"), "sl-d", False)
    jc = run(str(tmp_path / "c"), "sl-c", True)
    pd.testing.assert_frame_equal(
        _norm_windows(jd.read_output("windows")),
        _norm_windows(jc.read_output("windows")))


def test_combine_expired_cells_dropped_exactly_once(ray_session,
                                                    tmp_path):
    """A watermark jump makes the deterministic lateness floor
    (epoch-(e-2) watermark) lag the state's watermark: cells can then
    target ALREADY-CLOSED windows. They must be DROPPED and counted
    (window_expired_dropped) — folding them would re-open and re-fire
    a closed window, breaking exactly-once on the windows stream."""
    import os

    import pyarrow.parquet as pq

    root = str(tmp_path / "pages")
    H = 3600 * 1_000_000
    base = 1_700_000_000_000_000

    def write_epoch(e, ts_list):
        d = os.path.join(root, f"epoch={e:04d}")
        os.makedirs(d, exist_ok=True)
        tab = pa.table({
            "url": pa.array([f"u{e}_{i}" for i in range(len(ts_list))]),
            "warc_ts": pa.array(np.array(ts_list, dtype=np.int64),
                                type=pa.timestamp("us")),
            "lang": pa.array(["en"] * len(ts_list)),
            "size": pa.array(np.ones(len(ts_list))),
        })
        pq.write_table(tab, os.path.join(d, "part-0.parquet"))

    # epoch 0: ts up to 1h; epoch 1: watermark JUMPS to 10h;
    # epoch 2: rows at ~2h — above wm_floor(2)=wm(0)=1h, so they are
    # combined as on-time, but their windows closed when wm hit 10h
    write_epoch(0, [base + i * 60_000_000 for i in range(60)])
    write_epoch(1, [base + 10 * H])
    write_epoch(2, [base + 2 * H + i * 60_000_000 for i in range(10)])

    # P=1: the watermark is min over partition maxima, so the jump
    # must land on EVERY partition to advance it — one partition makes
    # the scenario deterministic
    job = StreamingJob(root, str(tmp_path / "out"), run_id="exp-c",
                       num_partitions=1, pattern=None,
                       window_group_cols=("lang",), value_col="size",
                       window_combine=True)
    job.run()

    sink = ExactlyOnceSink(str(tmp_path / "out"))
    dropped = sum(p.get("window_expired_dropped", 0)
                  for e in sink.committed_epochs()
                  for p in sink.read_manifest(e)["partitions"])
    assert dropped == 10  # every epoch-2 row targeted a closed window

    # exactly-once: no window fired twice (one row per (group, window)
    # per OWNING partition; here all epoch-0 windows closed once)
    w = job.read_output("windows")
    assert not w.duplicated(["lang", "window_id"]).any()
    # the dropped rows are in NO stream (documented: the default
    # topology late-routes them; the combined profile drops-and-counts)
    assert w["n"].sum() == 61  # 60 epoch-0 rows + the jump row

    from gush_ray.fsck import audit
    rep = audit(str(tmp_path / "out"))
    assert rep["ok"] and not rep["problems"]


def test_combine_sketch_quantiles_match_default(ray_session, hot_pages,
                                                tmp_path):
    """Windowed quantiles ride the combiner in SKETCH mode only (a
    DDSketch-bucketed cell histogram is O(octaves x k) whatever the
    value cardinality). The bucket transform is deterministic and
    histograms merge additively, so the combined quantiles stream must
    equal the default topology's exactly."""
    def run(out, run_id, combine):
        job = StreamingJob(
            hot_pages, out, run_id=run_id, num_partitions=4,
            pattern=None, window_group_cols=("lang",),
            value_col="size", window_quantiles=(0.5, 0.95),
            quantile_sketch_k=128, window_combine=combine)
        job.run()
        return job

    jd = run(str(tmp_path / "d"), "qs-d", False)
    jc = run(str(tmp_path / "c"), "qs-c", True)
    cols = ["lang", "window_id", "q", "value", "n"]
    pd.testing.assert_frame_equal(
        jd.read_output("quantiles")[cols].sort_values(cols)
        .reset_index(drop=True),
        jc.read_output("quantiles")[cols].sort_values(cols)
        .reset_index(drop=True))
    assert len(jd.read_output("quantiles")) > 0

    # exact-mode quantiles + combine stays refused
    with pytest.raises(ValueError, match="sketch"):
        StreamingJob(hot_pages, str(tmp_path / "x"), run_id="qs-x",
                     num_partitions=2, pattern=None,
                     window_group_cols=("lang",), value_col="size",
                     window_quantiles=(0.5,), window_combine=True)


def test_combine_rescale_resume_parity(ray_session, hot_pages,
                                       tmp_path):
    """A combined-topology checkpoint rescales like any other: the
    win/winh window slots are group-keyed additive partials, so a
    4->2 rescale mid-stream reproduces the uninterrupted output."""
    from gush_ray.rescale import rescale_state

    ja = _run(hot_pages, str(tmp_path / "a"), "rc-a", True)

    jb = StreamingJob(hot_pages, str(tmp_path / "b"), run_id="rc-b",
                      num_partitions=4, pattern=None,
                      window_group_cols=("lang",), value_col="size",
                      window_hll_p=10, window_combine=True)
    jb.run(stop_after=2)
    rep = rescale_state(str(tmp_path / "b"), 2, params=jb.params)
    assert rep["rescaled"]
    jb2 = StreamingJob(hot_pages, str(tmp_path / "b"), run_id="rc-b2",
                       num_partitions=2, pattern=None,
                       window_group_cols=("lang",), value_col="size",
                       window_hll_p=10, window_combine=True)
    jb2.run()
    pd.testing.assert_frame_equal(
        _norm_windows(ja.read_output("windows")),
        _norm_windows(jb2.read_output("windows")))
    cols = ["lang", "window_id", "n_est"]
    pd.testing.assert_frame_equal(
        ja.read_output("window_hll")[cols].sort_values(cols)
        .reset_index(drop=True),
        jb2.read_output("window_hll")[cols].sort_values(cols)
        .reset_index(drop=True))
    from gush_ray.fsck import audit
    r = audit(str(tmp_path / "b"))
    assert r["ok"] and not r["problems"]


def test_combine_continuous_matches_batch(ray_session, hot_pages,
                                          tmp_path):
    """Continuous ingestion (directory tail) with the combined
    topology produces the batch run's output — the live form uses the
    same submit/reduce path, including the manifest-read lateness
    floor."""
    import os
    import shutil as sh

    live_pages = str(tmp_path / "live")
    os.makedirs(live_pages)
    for e in range(N_EPOCHS):
        src = os.path.join(hot_pages, f"epoch={e:04d}")
        dst = os.path.join(live_pages, f"epoch={e:04d}")
        sh.copytree(src, dst)
        open(os.path.join(dst, "_READY"), "w").write("ok")
    open(os.path.join(live_pages, "_END"), "w").write("ok")

    jb = StreamingJob(live_pages, str(tmp_path / "live_out"),
                      run_id="cc-l", num_partitions=4, pattern=None,
                      window_group_cols=("lang",), value_col="size",
                      window_hll_p=10, window_combine=True)
    res = jb.run_continuous(poll_interval_s=0.05)
    assert res["finalized"]

    ja = _run(hot_pages, str(tmp_path / "batch_out"), "cc-b", True)
    pd.testing.assert_frame_equal(
        _norm_windows(ja.read_output("windows")),
        _norm_windows(jb.read_output("windows")))
