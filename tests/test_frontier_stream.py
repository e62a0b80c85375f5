"""Streaming url-frontier discovery (state/frontier.py): shared anchor
extraction with the batch operator, partition-count independence,
kill→resume parity across delta chains, TTL state bounding with
re-emission, keyed delta frames, checkpoint rescaling, mode guard.
The SQL-oracle pairing itself is covered by tests/test_oracle.py
(registry-driven) at the fixed frontier fixture."""

import pandas as pd
import pyarrow as pa
import pytest

from gush_ray.datagen import write_pages_dir
from gush_ray.pipelines.epoch_loop import StreamingJob
from gush_ray.state.frontier import FrontierSpec, FrontierState, link_rows_batch
from gush_ray.state.store import PartitionState, StateParams


def _pages(tmp_path, **kw):
    p = str(tmp_path / "pages")
    # late_frac=0: watermark evolution is then identical under any
    # partition layout (same rationale as test_rescale._pages)
    write_pages_dir(p, n_urls=150, seed=37, n_epochs=4, late_frac=0.0,
                    link_frontier=True, **kw)
    return p


def _fr_sorted(job):
    df = job.read_output("frontier")
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


# ------------------------------------------------------------ kernels


def test_link_rows_match_batch_extraction():
    """The streaming link extraction IS the batch operator's extraction
    (stages/web.extract_links_table) — one definition, one SQL scheme —
    plus the self-link drop."""
    import re

    htmls = [
        b'<a href="u2">x</a><a href="u1">self</a>',
        b"<p>no links</p>",
        None,
        b'<link href="/css"><a href="ext">y</a><a href="ext">y2</a>',
    ]
    t = pa.table({
        "url": [f"u{i}" for i in range(len(htmls))],
        "ts_us": pa.array(range(len(htmls)), type=pa.int64()),
        "html": pa.array(htmls, type=pa.binary()),
    })
    got = link_rows_batch(t, FrontierSpec()).to_pydict()
    want = []
    for i, h in enumerate(htmls):
        if h is None:
            continue
        for dst in re.findall(r'<a href="([^"]*)"', h.decode()):
            if dst != f"u{i}":
                want.append((dst, i, f"u{i}"))
    assert list(zip(got["dst_url"], got["ts_us"], got["src_url"])) == want


def test_link_rows_no_html_column():
    t = pa.table({"url": ["a"], "ts_us": pa.array([1], type=pa.int64())})
    assert len(link_rows_batch(t, FrontierSpec())) == 0


# ------------------------------------------------------- end to end


def test_partition_independence(tmp_path, ray_session):
    """dst-url routing co-locates every discovery of a url, so the
    frontier stream is identical at any partition count."""
    pages = _pages(tmp_path)
    res = {}
    for P in (1, 4):
        job = StreamingJob(pages, str(tmp_path / f"o{P}"),
                           run_id=f"frP{P}", num_partitions=P,
                           frontier_spec=FrontierSpec())
        job.run(resume=False)
        res[P] = _fr_sorted(job)
    assert len(res[1]) > 50  # the fixture really produces discoveries
    # exactly-once per url
    assert res[1]["url"].is_unique
    pd.testing.assert_frame_equal(res[1], res[4])


def test_kill_resume_parity_across_delta_chain(tmp_path, ray_session):
    """Interrupt mid delta chain (full frame cadence 2) and resume: the
    frontier stream matches the uninterrupted run exactly-once."""
    pages = _pages(tmp_path)
    ja = StreamingJob(pages, str(tmp_path / "a"), run_id="frA",
                      num_partitions=3, frontier_spec=FrontierSpec(),
                      snapshot_full_every=2)
    ja.run(resume=False)

    jb = StreamingJob(pages, str(tmp_path / "b"), run_id="frB",
                      num_partitions=3, frontier_spec=FrontierSpec(),
                      snapshot_full_every=2)
    jb.run(resume=False, stop_after=3)
    jb2 = StreamingJob(pages, str(tmp_path / "b"), run_id="frB2",
                       num_partitions=3, frontier_spec=FrontierSpec(),
                       snapshot_full_every=2)
    jb2.run(resume=True)
    pd.testing.assert_frame_equal(_fr_sorted(ja), _fr_sorted(jb2))

    from gush_ray.fsck import audit

    rep = audit(str(tmp_path / "b"))
    assert rep["ok"], rep["problems"]


def test_rescale_migrates_frontier_state(tmp_path, ray_session):
    """Rescale mid-stream: seen entries re-route by the url-hash rule,
    so the continued run's frontier equals the uninterrupted run's."""
    from gush_ray.rescale import rescale_state

    pages = _pages(tmp_path)
    ja = StreamingJob(pages, str(tmp_path / "a"), run_id="frsA",
                      num_partitions=4, pattern=None,
                      frontier_spec=FrontierSpec())
    ja.run()

    jb = StreamingJob(pages, str(tmp_path / "b"), run_id="frsB",
                      num_partitions=4, pattern=None,
                      frontier_spec=FrontierSpec())
    jb.run(stop_after=2)
    rep = rescale_state(str(tmp_path / "b"), 8, params=jb.params)
    assert rep["rescaled"]
    jb2 = StreamingJob(pages, str(tmp_path / "b"), run_id="frsB2",
                       num_partitions=8, pattern=None,
                       frontier_spec=FrontierSpec())
    jb2.run()
    pd.testing.assert_frame_equal(_fr_sorted(ja), _fr_sorted(jb2))


def test_actors_mode_rejected(tmp_path):
    with pytest.raises(ValueError, match="tasks"):
        StreamingJob(str(tmp_path), str(tmp_path / "o"), mode="actors",
                     frontier_spec=FrontierSpec())


# ------------------------------------------------- state-level checks


def _params(**kw):
    return StateParams(key_col="url", ts_col="ts_us",
                       window_group_cols=("lang",), pattern=None,
                       frontier_spec=kw.pop("spec", FrontierSpec()), **kw)


def _link_tbl(rows):
    """rows: (dst, ts, src)"""
    return pa.table({
        "dst_url": [r[0] for r in rows],
        "ts_us": pa.array([r[1] for r in rows], type=pa.int64()),
        "src_url": [r[2] for r in rows],
    })


def _page_tbl(rows):
    """rows: (url, ts)"""
    return pa.table({
        "url": [r[0] for r in rows],
        "ts_us": pa.array([r[1] for r in rows], type=pa.int64()),
        "lang": ["en"] * len(rows),
    })


def _run_epoch(ps, epoch, out, pages, links):
    ps.ingest(epoch, 0, _page_tbl(pages))
    ps.ingest_frontier(epoch, 0, _link_tbl(links))
    return ps.process_epoch_to(epoch, out)


def test_first_discovery_rule(tmp_path):
    out = str(tmp_path / "s")
    ps = PartitionState(0, _params())
    # epoch 0: X discovered by A (ts 10 beats ts 20); Y discovered once
    m = _run_epoch(ps, 0, out, [("A", 10), ("B", 20)],
                   [("X", 20, "B"), ("X", 10, "A"), ("Y", 10, "A")])
    assert m["frontier_rows"] == 2
    assert ps.frontier.seen["X"] == (10, "A")
    ps.advance_watermark(15)
    # epoch 1: X rediscovered → silent; Z is new
    m = _run_epoch(ps, 1, out, [("C", 40)],
                   [("X", 40, "C"), ("Z", 40, "C")])
    assert m["frontier_rows"] == 1
    import pyarrow.parquet as pq

    fr = pq.read_table(f"{out}/frontier/epoch=00001/part-00000.parquet")
    assert fr.to_pylist() == [{"url": "Z", "ts_us": 40,
                               "discovered_from": "C"}]


def test_late_link_rows_dropped(tmp_path):
    out = str(tmp_path / "s")
    ps = PartitionState(0, _params())
    _run_epoch(ps, 0, out, [("A", 100)], [("X", 100, "A")])
    ps.advance_watermark(100)
    # ts 50 < watermark 100 → late: must neither emit nor enter state
    m = _run_epoch(ps, 1, out, [("B", 150)], [("Q", 50, "B"),
                                              ("R", 150, "B")])
    assert m["frontier_rows"] == 1
    assert "Q" not in ps.frontier.seen and "R" in ps.frontier.seen


def test_ttl_evicts_and_reemits(tmp_path):
    out = str(tmp_path / "s")
    ps = PartitionState(0, _params(spec=FrontierSpec(ttl_us=100)))
    _run_epoch(ps, 0, out, [("A", 10)], [("X", 10, "A")])
    ps.advance_watermark(50)
    assert "X" in ps.frontier.seen
    ps.advance_watermark(500)  # first-seen ts 10 < 500-100 → evicted
    assert ps.frontier.seen == {}
    assert ps.frontier.evicted_total == 1
    # rediscovery after eviction RE-EMITS (Flink cleared-state rule)
    m = _run_epoch(ps, 1, out, [("B", 600)], [("X", 600, "B")])
    assert m["frontier_rows"] == 1
    assert ps.frontier.seen["X"] == (600, "B")


def test_delta_frames_carry_touched_urls_and_tombstones(tmp_path):
    out = str(tmp_path / "s")
    ps = PartitionState(0, _params(spec=FrontierSpec(ttl_us=1000)))
    _run_epoch(ps, 0, out,
               [(f"u{i}", 10 + i) for i in range(200)],
               [(f"d{i}", 10 + i, f"u{i}") for i in range(200)])
    ps.advance_watermark(5)
    full = ps.snapshot_bytes()

    _run_epoch(ps, 1, out, [("x", 400)], [("newdst", 400, "x")])
    ps.advance_watermark(6)
    delta = ps.delta_bytes(0)
    st = ps._decode(delta)
    assert set(st["frontier_delta"]["upserts"]) == {"newdst"}
    assert st["frontier_delta"]["tombstones"] == []
    assert len(delta) < len(full) / 5

    # TTL sweep mid-chain → tombstones in the next delta
    ps.advance_watermark(5000)  # evicts every entry with ts < 4000
    delta2 = ps.delta_bytes(0)
    st2 = ps._decode(delta2)
    assert len(st2["frontier_delta"]["tombstones"]) == 201
    assert ps.frontier.seen == {}

    fresh = PartitionState(0, _params(spec=FrontierSpec(ttl_us=1000)))
    fresh.restore_chain([full, delta, delta2])
    assert fresh.frontier.seen == ps.frontier.seen
    assert fresh.frontier.evicted_total == ps.frontier.evicted_total
    assert fresh.watermark_us == ps.watermark_us


def test_frames_without_section_reset_on_restore(tmp_path):
    """Rollback semantics: restoring a chain written WITHOUT a spec into
    a state configured WITH one must reset the live seen-map."""
    plain = PartitionState(0, StateParams(
        key_col="url", ts_col="ts_us", window_group_cols=("lang",),
        pattern=None))
    plain.process(0, _page_tbl([("A", 10)]))
    blob = plain.snapshot_bytes()

    ps = PartitionState(0, _params())
    ps.frontier.seen["stale"] = (1, "old")
    ps.restore_bytes(blob)
    assert ps.frontier.seen == {}


def test_frontier_state_unit():
    st = FrontierState(FrontierSpec())
    df = pd.DataFrame({"dst_url": ["a", "b", "a"],
                       "ts_us": [3, 1, 2],
                       "src_url": ["s1", "s2", "s3"]})
    out = st.process(df, -(1 << 62), "ts_us")
    # first per dst by (ts, src): a@2 from s3, b@1 from s2
    got = set(zip(out["url"], out["ts_us"], out["discovered_from"]))
    assert got == {("a", 2, "s3"), ("b", 1, "s2")}
    # replay of everything → silent
    out2 = st.process(df, -(1 << 62), "ts_us")
    assert len(out2) == 0


def test_continuous_mode_matches_batch_run(tmp_path, ray_session):
    """Live-tailed ingestion (run_continuous with _READY markers)
    produces the identical frontier stream as the batch run over the
    same epochs — the operator rides the shared reduce path."""
    import os
    import shutil as sh
    import threading
    import time as _time

    src = _pages(tmp_path)
    jb = StreamingJob(src, str(tmp_path / "bo"), run_id="frcB",
                      num_partitions=3, frontier_spec=FrontierSpec())
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
    jl = StreamingJob(live, str(tmp_path / "lo"), run_id="frcL",
                      num_partitions=3, frontier_spec=FrontierSpec())
    res = jl.run_continuous(poll_interval_s=0.1)
    t.join()
    assert res["finalized"]
    pd.testing.assert_frame_equal(_fr_sorted(jb), _fr_sorted(jl))


def test_cli_frontier_ttl_zero_enables():
    """--frontier-ttl-sec 0 means evict-at-watermark, not 'unset'."""
    import argparse

    from gush_ray.run_job import _frontier_spec

    ns = argparse.Namespace(frontier=False, frontier_ttl_sec=0)
    spec = _frontier_spec(ns)
    assert spec is not None and spec.ttl_us == 0
    ns2 = argparse.Namespace(frontier=False, frontier_ttl_sec=None)
    assert _frontier_spec(ns2) is None


def test_canonicalize_collapses_variants():
    """FrontierSpec(canonicalize=True): surface variants of one url
    produce ONE link row identity (messy targets collapse before dedup;
    self-drop runs on the canonical form)."""
    t = pa.table({
        "url": ["https://a.org/p/1"] * 4,
        "ts_us": pa.array([1, 2, 3, 4], type=pa.int64()),
        "html": [b'<a href="https://B.org:443/x/">v1</a>',
                 b'<a href="https://b.org/x">v2</a>',
                 b'<a href="https://A.org/p/1">self-variant</a>',
                 b'<a href="https://a.org/p/1/">self-trailing</a>'],
    })
    plain = link_rows_batch(t, FrontierSpec()).to_pydict()
    canon = link_rows_batch(t, FrontierSpec(canonicalize=True)).to_pydict()
    # plain: all four distinct (self variants don't string-match)
    assert sorted(set(plain["dst_url"])) == [
        "https://A.org/p/1", "https://B.org:443/x/",
        "https://a.org/p/1/", "https://b.org/x"]
    # canonical: the two b.org variants collapse; both self variants drop
    assert canon["dst_url"] == ["https://b.org/x", "https://b.org/x"]


def test_canonicalize_self_drop_on_noncanonical_page_url():
    """A page whose OWN url is non-canonical must still never discover
    itself: the self-drop compares canonical forms on both sides
    (review fix — a raw-src comparison let an exact self-link through)."""
    t = pa.table({
        "url": ["https://A.org/x"],  # non-canonical page url
        "ts_us": pa.array([1], type=pa.int64()),
        "html": [b'<a href="https://A.org/x">exact self</a>'
                 b'<a href="https://a.org/x/">variant self</a>'],
    })
    canon = link_rows_batch(t, FrontierSpec(canonicalize=True))
    assert canon.num_rows == 0
    # plain mode still drops only the exact string match
    plain = link_rows_batch(t, FrontierSpec())
    assert plain["dst_url"].to_pylist() == ["https://a.org/x/"]


def test_canonical_frontier_equals_plain_on_canonical_stream(
        tmp_path, ray_session):
    """On a stream whose targets are ALREADY canonical, the
    canonicalizing frontier is a strict no-op (same output bytes)."""
    pages = _pages(tmp_path)
    outs = {}
    for name, spec in (("p", FrontierSpec()),
                       ("c", FrontierSpec(canonicalize=True))):
        job = StreamingJob(pages, str(tmp_path / name),
                           run_id=f"frcan{name}", num_partitions=2,
                           frontier_spec=spec)
        job.run(resume=False)
        outs[name] = _fr_sorted(job)
    pd.testing.assert_frame_equal(outs["p"], outs["c"])
