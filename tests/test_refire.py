"""Flink-style allowed-lateness window RE-FIRING (update mode): the
`window_updates` retraction changelog — exact emission sequences,
fold-invariance vs brute force (state level and end-to-end at P=4 via
the committed manifest watermarks), kill→resume parity, rescale
migration of fired accumulators, and the raw-group-cols guard.

Semantics under test (StateParams.window_refire):
* windows fire ON TIME (watermark not held back) into `windows`;
* fired accumulators are retained for allowed_lateness past the end;
* a late row is dropped only when EVERY window it belongs to is
  expired (Flink's drop rule); accepted late rows re-fire their
  window as a (-1 old, +1 new) pair, one pair per window per epoch;
* folding sum(change*n) per window over the changelog = final totals.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gush_ray.state.store import NEG_INF, PartitionState, StateParams

W = 1_000   # window size (us) for state-level tests
L = 1_500   # allowed lateness


def make_ps(**kw):
    base = dict(key_col="url", ts_col="ts_us", window_group_cols=("lang",),
                window_size_us=W, allowed_lateness_us=L, pattern=None,
                window_refire=True)
    base.update(kw)
    return PartitionState(0, StateParams(**base))


def step(ps, rows, wm):
    """One engine epoch: process the batch at the restored watermark,
    then advance. Returns (metrics, updates_df, windows_df, late_df)."""
    t = pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)
    out = ps._process_impl(t)
    closes = ps.advance_watermark(wm)
    return (out["metrics"], closes["window_updates"].to_pandas(),
            closes["windows"].to_pandas(), out["late"].to_pandas())


def r(url, ts, lang="en"):
    return dict(url=url, ts_us=ts, lang=lang)


def test_refire_emission_sequence():
    """Hand-traced scenario: initial fire, two refire pairs on later
    epochs, expiry, and a window fully below the lateness horizon."""
    ps = make_ps(allowed_lateness_us=150, window_size_us=100)
    # epoch 0: window 0 gets 2 rows, fires at wm=120
    _, upd, win, late = step(ps, [r("a", 10), r("b", 50), r("c", 120)], 120)
    assert win.to_dict("records") == [
        {"lang": "en", "window_id": 0, "n": 2, "sum_value": 2.0}]
    assert upd.to_dict("records") == [
        {"lang": "en", "window_id": 0, "change": 1, "n": 2,
         "sum_value": 2.0, "fire_seq": 0}]
    # epoch 1: late row (ts=60 < wm=120, end 100 + 150 > 120) → pair
    m, upd, _, late = step(ps, [r("d", 60), r("e", 130)], 140)
    assert m["late_rows"] == 0 and m["window_late_accepted"] == 1
    assert upd.to_dict("records") == [
        {"lang": "en", "window_id": 0, "change": -1, "n": 2,
         "sum_value": 2.0, "fire_seq": 1},
        {"lang": "en", "window_id": 0, "change": 1, "n": 3,
         "sum_value": 3.0, "fire_seq": 1},
    ]
    # epoch 2: second late row → second pair (retracts 3, emits 4);
    # window 1 fires on time at wm=200
    _, upd, win, _ = step(ps, [r("f", 70)], 200)
    assert upd.to_dict("records") == [
        {"lang": "en", "window_id": 1, "change": 1, "n": 2,
         "sum_value": 2.0, "fire_seq": 0},
        {"lang": "en", "window_id": 0, "change": -1, "n": 3,
         "sum_value": 3.0, "fire_seq": 2},
        {"lang": "en", "window_id": 0, "change": 1, "n": 4,
         "sum_value": 4.0, "fire_seq": 2},
    ]
    # epoch 3: wm jumps to 300 — window 0 expired (100+150 <= 300).
    # The late row processed at the RESTORED wm (200) is still accepted
    # (100+150 > 200) and emits its pair before the expiry sweep.
    m, upd, _, _ = step(ps, [r("g", 80), r("h", 260)], 300)
    assert m["window_late_accepted"] == 1
    assert {"change": -1, "n": 4} == {
        k: v for k, v in upd.to_dict("records")[1].items()
        if k in ("change", "n")}
    assert not ps.fired.get(("en", 0))
    # epoch 4: now a window-0 row is genuinely late (expired horizon)
    m, upd, _, late = step(ps, [r("i", 90)], 300)
    assert m["late_rows"] == 1 and m["window_late_accepted"] == 0
    assert len(late) == 1 and upd.empty


def test_refire_window_created_by_late_row_emits_plus_only():
    """A window whose FIRST row arrives after its end passed the
    watermark fires late with a single +1 (nothing to retract)."""
    ps = make_ps(allowed_lateness_us=500, window_size_us=100)
    _, upd, win, _ = step(ps, [r("a", 350)], 350)   # wm past window 0
    assert win.empty and upd.empty
    m, upd, _, _ = step(ps, [r("b", 20)], 360)      # first window-0 row
    assert m["window_late_accepted"] == 1
    assert upd.to_dict("records") == [
        {"lang": "en", "window_id": 0, "change": 1, "n": 1,
         "sum_value": 1.0, "fire_seq": 0}]
    # a second late row retracts that late-created emission
    _, upd, _, _ = step(ps, [r("c", 30)], 370)
    assert [(x["change"], x["n"], x["fire_seq"])
            for x in upd.to_dict("records")] == [(-1, 1, 1), (1, 2, 1)]


def test_refire_lateness_zero_single_emission_changelog():
    """With lateness 0 nothing is retained for re-firing: the changelog
    is exactly the +1 image of the windows stream, one emission per
    window. (Refire mode still accepts MORE rows than hold-back mode at
    the same lateness — a sub-watermark row whose window is still OPEN
    counts, per Flink's drop rule — so cross-mode totals are documented
    to diverge; the invariant is within-run.)"""
    rng = np.random.default_rng(5)
    a = make_ps(allowed_lateness_us=0)
    upds, wins = [], []
    wm = NEG_INF
    for e in range(6):
        ts = rng.integers(e * 700, e * 700 + 1200, size=40)
        rows = [r(f"u{i}", int(t), "en" if i % 3 else "fr")
                for i, t in enumerate(ts)]
        wm = max(wm, max(x["ts_us"] for x in rows))
        _, u, w, _ = step(a, rows, wm)
        upds.append(u)
        wins.append(w)
    ca = a.advance_watermark(1 << 61)
    wins.append(ca["windows"].to_pandas())
    upds.append(ca["window_updates"].to_pandas())
    ua = pd.concat([u for u in upds if len(u)], ignore_index=True)
    assert (ua["change"] == 1).all() and (ua["fire_seq"] == 0).all()
    wa = pd.concat(wins, ignore_index=True)
    key = ["lang", "window_id"]
    pd.testing.assert_frame_equal(
        ua[["lang", "window_id", "n", "sum_value"]]
        .sort_values(key).reset_index(drop=True),
        wa.sort_values(key).reset_index(drop=True))
    assert not ua.duplicated(key).any()


@pytest.mark.parametrize("slide,distinct", [(None, False), (250, False),
                                            (None, True)])
def test_refire_fold_matches_bruteforce(slide, distinct):
    """Property: over a random out-of-order stream, folding
    sum(change*n) per (lang, window) over the changelog equals the
    brute-force count of accepted (row, window) replicas; the late
    stream holds exactly the rows whose every window was expired; the
    on-time windows stream equals the cumulative count at fire time."""
    rng = np.random.default_rng(11)
    ps = make_ps(window_slide_us=slide, window_distinct=distinct)
    k = (W // slide) if slide else 1
    wm_sim = NEG_INF
    last = {}                      # brute V1 state
    totals = {}                    # (lang, wid) -> accepted replicas
    opencum = {}                   # (lang, wid) -> replicas that were
    #                                OPEN at arrival (= windows-stream n)
    dkeys = {}                     # (lang, wid) -> set of urls
    late_expected = 0
    n_late_engine = 0
    all_upd, all_win = [], []
    for e in range(10):
        n = int(rng.integers(20, 60))
        ts = rng.integers(max(0, e * 800 - 2600), e * 800 + 1600, size=n)
        rows = [r(f"u{int(rng.integers(0, 25))}", int(t),
                  "en" if rng.random() < 0.6 else "fr") for t in ts]
        # ---- brute force at the restored watermark wm_sim
        seen = set()
        batch = []
        for x in sorted(rows, key=lambda x: (x["url"], x["ts_us"])):
            if (x["url"], x["ts_us"]) in seen:
                continue
            seen.add((x["url"], x["ts_us"]))
            batch.append(x)
        slide_c = slide or W
        for x in batch:
            t0, lang, url = x["ts_us"], x["lang"], x["url"]
            wids = [t0 // slide_c - j for j in range(k)]
            if t0 >= wm_sim:
                # engine keeps every row above the PRE-batch last[url];
                # processing in ascending (url, ts) order with a
                # sequential update is equivalent
                if t0 > last.get(url, NEG_INF):
                    last[url] = t0     # survivor feeds every window
                    for wid in wids:   # all its windows are open
                        totals[(lang, wid)] = totals.get((lang, wid), 0) + 1
                        opencum[(lang, wid)] = (
                            opencum.get((lang, wid), 0) + 1)
                        dkeys.setdefault((lang, wid), set()).add(url)
            else:
                alive = [wid for wid in wids
                         if wid * slide_c + W + L > wm_sim]
                if not alive:
                    late_expected += 1
                    continue
                for wid in alive:
                    totals[(lang, wid)] = totals.get((lang, wid), 0) + 1
                    if wid * slide_c + W > wm_sim:   # window still open
                        opencum[(lang, wid)] = (
                            opencum.get((lang, wid), 0) + 1)
                    dkeys.setdefault((lang, wid), set()).add(url)
        wm_e = max(wm_sim, max(x["ts_us"] for x in rows))
        # ---- engine
        _, upd, win, late_df = step(ps, rows, wm_e)
        all_upd.append(upd)
        all_win.append(win)
        n_late_engine += len(late_df)
        assert len(late_df) == 0 or (late_df["ts_us"] < wm_sim).all()
        wm_sim = wm_e
    closes = ps.advance_watermark(1 << 61)
    all_upd.append(closes["window_updates"].to_pandas())
    all_win.append(closes["windows"].to_pandas())

    upd = pd.concat([u for u in all_upd if len(u)], ignore_index=True)
    win = pd.concat([w for w in all_win if len(w)], ignore_index=True)
    # (1) fold == brute totals
    fold = (upd.assign(cn=upd["change"] * upd["n"])
            .groupby(["lang", "window_id"])["cn"].sum())
    assert dict(fold) == totals
    # (2) late stream holds exactly the all-windows-expired rows
    assert n_late_engine == late_expected
    # (3) windows (on-time) stream == the open accumulator at fire time
    # (open contributions all precede the fire; a window created by a
    # late row never reaches the on-time stream)
    wmap = dict(zip(zip(win["lang"], win["window_id"]), win["n"]))
    assert wmap == {key: v for key, v in opencum.items() if v > 0}
    if distinct:
        final = (upd[upd["change"] == 1]
                 .sort_values("fire_seq").groupby(["lang", "window_id"])
                 .tail(1))
        got = dict(zip(zip(final["lang"], final["window_id"]),
                       final["n_distinct"]))
        assert got == {key: len(s) for key, s in dkeys.items()}


def test_refire_requires_raw_group_cols():
    """Group cols derived post-dedup (change_kind) are unavailable for
    late rows — must fail loudly, not emit garbage."""
    ps = make_ps(window_group_cols=("lang", "change_kind"))
    step(ps, [r("a", 10), r("b", 2000)], 2000)
    with pytest.raises(ValueError, match="window_refire"):
        step(ps, [r("c", 500)], 2100)


def test_refire_snapshot_roundtrip_mid_horizon():
    """Kill between a fire and its re-fire: the fired accumulators (and
    their emitted values) must survive snapshot/restore so the
    retraction still matches what was emitted."""
    ps = make_ps(allowed_lateness_us=150, window_size_us=100)
    step(ps, [r("a", 10), r("b", 50), r("c", 120)], 120)
    blob = ps.snapshot_bytes()
    ps2 = make_ps(allowed_lateness_us=150, window_size_us=100)
    ps2.restore_bytes(blob)
    _, upd, _, _ = step(ps2, [r("d", 60)], 140)
    assert [(x["change"], x["n"]) for x in upd.to_dict("records")] == [
        (-1, 2), (1, 3)]
    # delta-frame path: fire, delta, late row, delta, restore chain
    ps3 = make_ps(allowed_lateness_us=150, window_size_us=100)
    base = ps3.snapshot_bytes()
    step(ps3, [r("a", 10), r("c", 120)], 120)
    d1 = ps3.delta_bytes(0)
    step(ps3, [r("d", 60)], 140)
    d2 = ps3.delta_bytes(0)
    live_fired = {k: list(v) for k, v in ps3.fired.items()}
    ps4 = make_ps(allowed_lateness_us=150, window_size_us=100)
    ps4.restore_chain([base, d1, d2])
    assert {k: list(v) for k, v in ps4.fired.items()} == live_fired


# ---------------------------------------------------------------- e2e

LJOB = 1_800_000_000           # 30 min lateness; job window = 15 min
WJOB = 15 * 60 * 1_000_000


@pytest.fixture(scope="module")
def refire_pages(tmp_path_factory):
    from gush_ray.datagen import write_pages_dir

    d = tmp_path_factory.mktemp("refire_pages")
    # late_frac high enough that several windows re-fire and some rows
    # fall past the lateness horizon (late stream non-empty)
    write_pages_dir(str(d), n_urls=400, seed=21, n_epochs=3,
                    late_frac=0.08)
    return str(d)


def _refire_job(pages, out, run_id, P=4, **kw):
    from gush_ray.config import EngineConfig
    from gush_ray.pipelines.epoch_loop import StreamingJob

    return StreamingJob(
        pages, out, run_id=run_id, num_partitions=P, pattern=None,
        window_group_cols=("lang",), window_refire=True,
        cfg=EngineConfig(allowed_lateness_us=LJOB), **kw)


def _brute_totals(pages_dir, wm_after):
    """Replay the acceptance rule driver-side from the committed
    watermarks: totals per (lang, window) + expected late-stream count.
    Partition-independent: classification uses the GLOBAL committed
    watermark and V1 survivorship is per url."""
    import glob

    import pyarrow.parquet as pq

    from gush_ray.stages.windows import ts_to_us

    totals, last, n_late = {}, {}, 0
    for e, _ in enumerate(wm_after):
        files = sorted(glob.glob(f"{pages_dir}/epoch={e:04d}/*.parquet"))
        t = pa.concat_tables([pq.read_table(f) for f in files])
        df = t.to_pandas()
        ts_all = np.asarray(ts_to_us(t.column("warc_ts")))
        df = df[df["text"].notna()].copy()
        df["ts_us"] = ts_all[df.index.to_numpy()]
        df = df.sort_values(["url", "ts_us"], kind="mergesort")
        df = df.drop_duplicates(["url", "ts_us"], keep="first")
        wm_prev = wm_after[e - 1] if e else NEG_INF
        for url, ts, lang in zip(df["url"], df["ts_us"], df["lang"]):
            wid = ts // WJOB
            if ts >= wm_prev:
                if ts > last.get(url, NEG_INF):
                    last[url] = ts
                    totals[(lang, wid)] = totals.get((lang, wid), 0) + 1
            elif wid * WJOB + WJOB + LJOB > wm_prev:
                totals[(lang, wid)] = totals.get((lang, wid), 0) + 1
            else:
                n_late += 1
    return totals, n_late


@pytest.mark.parametrize("mode", ["tasks", "actors"])
def test_refire_job_fold_matches_manifest_bruteforce(
        refire_pages, tmp_path, mode):
    out = str(tmp_path / f"out-{mode}")
    job = _refire_job(refire_pages, out, run_id=f"rf-{mode}", mode=mode)
    res = job.run()
    job.kill_actors()
    wm_after = [job.sink.read_manifest(e)["watermark_us"]
                for e in range(res["completed"] + 1)]
    upd = job.read_output("window_updates")
    assert (upd["change"] == -1).any(), "fixture produced no re-firings"
    fold = (upd.assign(cn=upd["change"] * upd["n"])
            .groupby(["lang", "window_id"])["cn"].sum())
    totals, n_late = _brute_totals(refire_pages, wm_after)
    assert dict(fold) == totals
    assert len(job.read_output("late")) == n_late

    from gush_ray.fsck import audit

    rep = audit(out)
    assert rep["ok"], rep["problems"]


def test_refire_kill_resume_parity(refire_pages, tmp_path):
    outs = {}
    for name, kw in [("a", {}), ("b", {"stop_after": 2})]:
        job = _refire_job(refire_pages, str(tmp_path / name),
                          run_id=f"rfr-{name}")
        job.run(**kw)
        job.kill_actors()
        outs[name] = job
    resumed = _refire_job(refire_pages, str(tmp_path / "b"),
                          run_id="rfr-b2")
    resumed.run(resume=True)
    resumed.kill_actors()
    for stream in ("window_updates", "windows", "late", "changes"):
        a = outs["a"].read_output(stream)
        b = resumed.read_output(stream)
        cols = sorted(a.columns)
        pd.testing.assert_frame_equal(
            a[cols].sort_values(cols, kind="mergesort")
            .reset_index(drop=True),
            b[cols].sort_values(cols, kind="mergesort")
            .reset_index(drop=True)), stream


def test_refire_rescale_fold_still_exact(refire_pages, tmp_path):
    """Rescale mid-horizon: the fired accumulators (and their emitted
    values) migrate additively, so post-rescale retractions retract
    exactly what the old layout emitted and the fold stays exact."""
    from gush_ray.rescale import rescale_state

    out = str(tmp_path / "rs")
    j1 = _refire_job(refire_pages, out, run_id="rfs1")
    j1.run(stop_after=2)
    j1.kill_actors()
    rep = rescale_state(out, 2, params=j1.params)
    assert rep["rescaled"] and rep["new_P"] == 2
    j2 = _refire_job(refire_pages, out, run_id="rfs2", P=2)
    res = j2.run()
    j2.kill_actors()
    wm_after = [j2.sink.read_manifest(e)["watermark_us"]
                for e in range(res["completed"] + 1)]
    upd = j2.read_output("window_updates")
    assert (upd["change"] == -1).any()
    fold = (upd.assign(cn=upd["change"] * upd["n"])
            .groupby(["lang", "window_id"])["cn"].sum())
    totals, n_late = _brute_totals(refire_pages, wm_after)
    assert dict(fold) == totals
    assert len(j2.read_output("late")) == n_late


def test_refire_rescale_guard(refire_pages, tmp_path):
    """A checkpoint holding fired-window state must refuse a rescale
    whose params would silently drop it."""
    from gush_ray.rescale import rescale_state

    out = str(tmp_path / "rg")
    j1 = _refire_job(refire_pages, out, run_id="rfg1")
    j1.run(stop_after=2)
    j1.kill_actors()
    plain = StateParams(key_col="url", ts_col="ts_us",
                        window_group_cols=("lang",),
                        window_size_us=WJOB, pattern=None)
    with pytest.raises(ValueError, match="fired-window"):
        rescale_state(out, 2, params=plain)


def test_refire_hll_open_window_late_keys_join_registers():
    """window_hll_p + window_refire (round-4 ADVICE fix): a late row
    accepted into a STILL-OPEN window must reach the window's HLL
    registers, so the emitted estimate is a pure function of the
    window's on-time + open-accepted key set. (Keys late-accepted into
    an already-FIRED window are excluded from the estimate by design —
    the registers were emitted at close; count/sum corrections ride
    window_updates.)"""
    from gush_ray.stages.sketches import hll_estimate

    ps = make_ps(window_hll_p=10, window_size_us=1000,
                 allowed_lateness_us=1500)
    # epoch 0: keys a, b in window 0; wm=500 keeps window 0 OPEN
    step(ps, [r("a", 10), r("b", 50)], 500)
    # epoch 1: key c at ts=100 is sub-watermark (late) but window 0's
    # end (1000) is still ahead of wm=500 -> accepted into the OPEN
    # accumulator AND the registers
    m, _, win, _ = step(ps, [r("c", 100)], 600)
    assert m["window_late_accepted"] == 1
    reg = ps.winh[("en", 0)]
    est_open = hll_estimate(reg)
    assert abs(est_open - 3.0) < 0.25, est_open
    # epoch 2: window 0 closes — count/sum/register state all carry 3
    closes = ps.advance_watermark(1100)
    win = closes["windows"].to_pandas()
    assert win.to_dict("records") == [
        {"lang": "en", "window_id": 0, "n": 3, "sum_value": 3.0}]
    # registers were emitted at close; a further late key (window 0
    # still within lateness: 1000+1500 > 1100) refires count/sum but
    # cannot touch the emitted estimate — and must not crash
    m, upd, _, _ = step(ps, [r("d", 200)], 1200)
    assert m["window_late_accepted"] == 1
    assert [x["change"] for x in upd.to_dict("records")] == [-1, 1]
    assert ("en", 0) not in ps.winh


def test_topk_refire_mutually_exclusive(tmp_path):
    """window_topk ranks each window once from its on-time close;
    refire keeps correcting closed windows with no re-ranking — the
    combination must be rejected (round-4 ADVICE fix)."""
    from gush_ray.pipelines.epoch_loop import StreamingJob

    with pytest.raises(ValueError, match="window_topk.*window_refire"):
        StreamingJob(
            str(tmp_path / "in"), str(tmp_path / "out"), run_id="x",
            num_partitions=1, pattern=None, window_size_us=1000,
            window_group_cols=("lang",), key_col="url",
            raw_ts_col="ts_us", window_topk=3, window_refire=True)
