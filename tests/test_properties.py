"""Property-based tests (hypothesis): engine semantics vs independent
brute-force reference implementations on random inputs."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from gush_ray.stages.nfa import NFARunner, Pattern, Step
from gush_ray.state.store import PartitionState, StateParams, POS_INF

events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["u", "v", "w"]),          # key
        st.integers(min_value=0, max_value=400),   # ts
        st.sampled_from(["A", "B", "X"]),          # type
    ),
    min_size=0, max_size=40,
)


def _dedup_events(evs):
    # unique (key, ts) so ordering is total and ids are unambiguous
    seen, out = set(), []
    for k, t, e in evs:
        if (k, t) not in seen:
            seen.add((k, t))
            out.append((k, t, e))
    return out


@settings(max_examples=60, deadline=None)
@given(events_strategy, st.integers(min_value=1, max_value=200))
def test_nfa_skip_equals_all_pairs(evs, within):
    """skip-till-any-match 2-step == brute-force all A→B pairs."""
    evs = _dedup_events(evs)
    df = pd.DataFrame(evs, columns=["k", "ts", "etype"])
    df["eid"] = np.arange(len(df))
    pat = Pattern(
        steps=(Step("a", "etype", "A"), Step("b", "etype", "B")),
        within_us=within, key="k", ts_col="ts", id_col="eid",
    )
    out = NFARunner(pat).process_sorted(
        df.sort_values(["k", "ts"], kind="mergesort")
    )
    got = set(zip(out["a_id"], out["b_id"])) if len(out) else set()

    want = set()
    for _, a in df[df.etype == "A"].iterrows():
        for _, b in df[df.etype == "B"].iterrows():
            if (a.k == b.k and b.ts > a.ts and b.ts - a.ts <= within):
                want.add((a.eid, b.eid))
    assert got == want


@settings(max_examples=60, deadline=None)
@given(events_strategy, st.integers(min_value=1, max_value=100))
def test_sessions_match_reference(evs, gap):
    """Vectorized per-partition session merge == naive per-key scan,
    regardless of how the stream is cut into batches."""
    evs = sorted(_dedup_events(evs), key=lambda e: (e[1], e[0]))
    # engine: feed in two arbitrary chronological batches
    ps = PartitionState(
        0, StateParams(key_col="k", ts_col="ts", window_group_cols=("g",),
                       window_size_us=1_000_000, session_gap_us=gap),
    )
    cut = len(evs) // 2
    emitted = []
    for chunk in (evs[:cut], evs[cut:]):
        if not chunk:
            continue
        df = pd.DataFrame(chunk, columns=["k", "ts", "etype"])
        df["g"] = "x"
        out = ps.process(len(emitted), _to_table(df))
        emitted.append(out["sessions_closed"].to_pandas())
    emitted.append(ps.advance_watermark(POS_INF)["sessions"].to_pandas())
    got = pd.concat(emitted, ignore_index=True)
    got = got.sort_values(["k", "session_start_us"]).reset_index(drop=True)

    # reference: per-key linear scan
    want_rows = []
    by_key: dict = {}
    for k, t, _ in evs:
        by_key.setdefault(k, []).append(t)
    for k, times in by_key.items():
        times = sorted(times)
        start = last = times[0]
        n = 1
        for t in times[1:]:
            if t - last > gap:
                want_rows.append((k, start, last, n))
                start, n = t, 0
            last = t
            n += 1
        want_rows.append((k, start, last, n))
    want = pd.DataFrame(
        want_rows,
        columns=["k", "session_start_us", "session_end_us", "n_events"],
    ).sort_values(["k", "session_start_us"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[want.columns].astype(want.dtypes.to_dict()), want
    )


@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]),
              st.integers(min_value=0, max_value=100)),
    min_size=0, max_size=40,
))
def test_dedup_versioning_matches_rank(rows):
    """V1 dedup across arbitrary batch cuts == pandas dense rank over the
    distinct (key, ts) stream."""
    df = pd.DataFrame(rows, columns=["url", "ts_us"]).drop_duplicates()
    df = df.sort_values(["ts_us", "url"]).reset_index(drop=True)
    df["lang"] = "en"
    ps = PartitionState(
        0, StateParams(key_col="url", ts_col="ts_us",
                       window_group_cols=("lang",), window_size_us=10),
    )
    cut = len(df) // 3
    outs = []
    for i, chunk in enumerate((df[:cut], df[cut:])):
        if len(chunk):
            outs.append(
                ps.process(i, _to_table(chunk))["changes"].to_pandas()
            )
    got = pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(
        columns=["url", "ts_us", "version", "change_kind"]
    )
    got = got.sort_values(["url", "ts_us"]).reset_index(drop=True)

    want = df.sort_values(["url", "ts_us"]).reset_index(drop=True)
    want["version"] = want.groupby("url").cumcount()
    assert list(got["version"]) == list(want["version"])
    if len(got):
        assert (got.loc[got.version == 0, "change_kind"] == "insert").all()


def _to_table(df):
    import pyarrow as pa

    return pa.Table.from_pandas(df, preserve_index=False)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10_000),
                min_size=1, max_size=50),
       st.integers(min_value=1, max_value=50),
       st.integers(min_value=1, max_value=5))
def test_sliding_assignment_covers_exactly_k_windows(ts_list, slide, k):
    """Every event lands in exactly size/slide sliding windows, and each
    assigned window really contains the event."""
    import pyarrow as pa

    from gush_ray.stages.windows import assign_sliding

    size = slide * k
    t = pa.table({"ts": pa.array(ts_list, type=pa.int64()).cast(
        pa.timestamp("us"))})
    out = assign_sliding(t, "ts", size, slide)
    assert out.num_rows == len(ts_list) * k
    us = out["ts"].cast(pa.int64()).to_pylist()
    wid = out["window_id"].to_pylist()
    for u, w in zip(us, wid):
        start = w * slide
        assert start <= u < start + size


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10_000),
                min_size=1, max_size=50),
       st.integers(min_value=1, max_value=100))
def test_tumbling_assignment_partition_of_time(ts_list, size):
    import pyarrow as pa

    from gush_ray.stages.windows import assign_tumbling

    t = pa.table({"ts": pa.array(ts_list, type=pa.int64()).cast(
        pa.timestamp("us"))})
    out = assign_tumbling(t, "ts", size)
    us = out["ts"].cast(pa.int64()).to_pylist()
    for u, w in zip(us, out["window_id"].to_pylist()):
        assert w * size <= u < (w + 1) * size


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c", "d", "e"]),   # key
                st.integers(min_value=0, max_value=1000),      # ts
            ),
            min_size=0, max_size=8,
        ),
        min_size=1, max_size=6,                                # epochs
    ),
    st.integers(min_value=1, max_value=4),                     # full cadence
    st.integers(min_value=0, max_value=300),                   # wm step
)
def test_delta_chain_restore_matches_live_state(epochs, cadence, wm_step):
    """For ANY epoch sequence and full/delta cadence, restoring from the
    snapshot chain reproduces the live state's observable behavior on
    the next epoch (dedup versions + windows + sessions)."""
    import pyarrow as pa

    def mkps():
        return PartitionState(0, StateParams(
            key_col="url", ts_col="ts_us", window_group_cols=("lang",),
            window_size_us=100, session_gap_us=50,
        ))

    live = mkps()
    frames, base = [], None
    for e, rows in enumerate(epochs):
        # unique (key, ts) within the whole stream for total order
        tbl_rows = [
            {"url": k, "ts_us": t * len(epochs) + e, "lang": "en"}
            for k, t in rows
        ]
        if tbl_rows:
            live.process(e, pa.Table.from_pandas(
                pd.DataFrame(tbl_rows), preserve_index=False))
        live.advance_watermark(e * wm_step)
        if base is None or e - base >= cadence:
            frames = [live.snapshot_bytes()]
            base = e
        else:
            frames.append(live.delta_bytes(base))

    restored = mkps()
    restored.restore_chain(frames)
    assert restored.last_ts == live.last_ts
    assert restored.version == live.version
    assert restored.win == live.win
    assert restored.sessions == live.sessions
    assert restored.watermark_us == live.watermark_us

    probe = pa.Table.from_pandas(pd.DataFrame(
        [{"url": k, "ts_us": 10_000 + i, "lang": "en"}
         for i, k in enumerate(["a", "b", "c"])]), preserve_index=False)
    got = restored.process(len(epochs), probe)["changes"].to_pandas()
    want = live.process(len(epochs), probe)["changes"].to_pandas()
    pd.testing.assert_frame_equal(got, want)
    g2 = restored.advance_watermark(POS_INF)
    w2 = live.advance_watermark(POS_INF)
    # emission order follows dict insertion order, which a chain restore
    # may permute (upserts re-append); output order is arbitrary by
    # contract — the sink streams are order-insensitive sets
    for sec in ("windows", "sessions"):
        keys = g2[sec].column_names
        assert g2[sec].sort_by([(c, "ascending") for c in keys]).equals(
            w2[sec].sort_by([(c, "ascending") for c in keys]))


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c", "d", "e"]),   # key
                st.integers(min_value=0, max_value=1000),      # ts
            ),
            min_size=0, max_size=8,
        ),
        min_size=1, max_size=6,                                # epochs
    ),
    st.integers(min_value=1, max_value=4),                     # full cadence
    st.integers(min_value=0, max_value=300),                   # wm step
    st.integers(min_value=10, max_value=2_000),                # dedup TTL
)
def test_delta_chain_restore_with_ttl_tombstones(epochs, cadence, wm_step,
                                                 ttl):
    """Chain restore == live state for ANY eviction pattern: TTL sweeps
    delete dedup keys mid-chain, so deltas must tombstone them (and an
    evict-then-reinsert must surface as a plain upsert)."""
    import pyarrow as pa

    def mkps():
        return PartitionState(0, StateParams(
            key_col="url", ts_col="ts_us", window_group_cols=("lang",),
            window_size_us=100, session_gap_us=50, dedup_ttl_us=ttl,
        ))

    live = mkps()
    frames, base = [], None
    for e, rows in enumerate(epochs):
        tbl_rows = [
            {"url": k, "ts_us": t * len(epochs) + e, "lang": "en"}
            for k, t in rows
        ]
        if tbl_rows:
            live.process(e, pa.Table.from_pandas(
                pd.DataFrame(tbl_rows), preserve_index=False))
        live.advance_watermark(e * wm_step)
        if base is None or e - base >= cadence:
            frames = [live.snapshot_bytes()]
            base = e
        else:
            frames.append(live.delta_bytes(base))

    restored = mkps()
    restored.restore_chain(frames)
    assert restored.last_ts == live.last_ts
    assert restored.version == live.version
    assert restored.evicted_total == live.evicted_total
    assert restored._ttl_sweep_wm == live._ttl_sweep_wm

    probe = pa.Table.from_pandas(pd.DataFrame(
        [{"url": k, "ts_us": 10_000 + i, "lang": "en"}
         for i, k in enumerate(["a", "b", "c"])]), preserve_index=False)
    got = restored.process(len(epochs), probe)["changes"].to_pandas()
    want = live.process(len(epochs), probe)["changes"].to_pandas()
    pd.testing.assert_frame_equal(got, want)


# ------------------------------------------- codec property round-trips

from hypothesis import given, settings, strategies as st


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 24), h=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1), quality=st.integers(30, 100),
    gray=st.booleans(),
)
def test_jpeg_roundtrip_bounded_error(w, h, seed, quality, gray):
    """Any image, any quality: decode(encode(px)) has the right shape
    and error bounded by the quantization step (DC coefficient quant is
    the dominant term on random noise)."""
    from gush_ray.stages.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(seed)
    shape = (h, w) if gray else (h, w, 3)
    px = rng.randint(0, 256, size=shape, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=quality))
    assert out.shape == px.shape
    err = np.abs(out.astype(int) - px.astype(int)).mean()
    assert err <= 96.0  # sanity ceiling: decode is correlated with input
    if quality >= 95:
        # near-lossless regime: mean error small even on pure noise
        assert err <= 12.0


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 24), h=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1), npal=st.integers(1, 256),
)
def test_gif_roundtrip_exact(w, h, seed, npal):
    """GIF is palette-exact: every palette image round-trips bit-for-bit
    regardless of size or palette cardinality."""
    from gush_ray.stages.gif import decode_gif, encode_gif

    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, size=(npal, 3), dtype=np.uint8)
    img = pal[rng.randint(0, npal, size=(h, w))]
    dec, nf = decode_gif(encode_gif(img))
    assert nf == 1 and (dec == img).all()


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(8, 32), h=st.integers(8, 32),
    seed=st.integers(0, 2**31 - 1), quality=st.integers(40, 95),
    dc_al=st.integers(0, 2), ac_al=st.integers(0, 2),
)
def test_jpeg_progressive_equals_baseline_property(w, h, seed, quality,
                                                   dc_al, ac_al):
    from gush_ray.stages.jpeg import (decode_jpeg, encode_jpeg,
                                      encode_jpeg_progressive)

    px = np.random.RandomState(seed).randint(0, 256, size=(h, w, 3),
                                             dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(px, quality=quality))
    prog = decode_jpeg(encode_jpeg_progressive(
        px, quality=quality, dc_al=dc_al, ac_al=ac_al))
    assert (base == prog).all()


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c", "d", "e"]),   # key
                st.integers(min_value=0, max_value=1000),      # ts
            ),
            min_size=0, max_size=8,
        ),
        min_size=1, max_size=6,                                # epochs
    ),
    st.integers(min_value=1, max_value=4),                     # full cadence
    st.integers(min_value=0, max_value=300),                   # wm step
)
def test_delta_chain_restore_with_nfa_section_deltas(epochs, cadence,
                                                     wm_step):
    """Chain restore == live state when delta frames carry the NFA
    partials as keyed upserts+tombstones (watermark prunes delete run
    lists mid-chain; every batch key dirties its list)."""
    import pyarrow as pa

    from gush_ray.stages.nfa import Pattern, Step

    def mkps():
        return PartitionState(0, StateParams(
            key_col="url", ts_col="ts_us", window_group_cols=("lang",),
            window_size_us=100, session_gap_us=50,
            pattern=Pattern(
                steps=(Step("a", "change_kind", "insert"),
                       Step("b", "change_kind", "update")),
                within_us=200, key="url", ts_col="ts_us",
                id_col="version",
            ),
        ))

    live = mkps()
    frames, base = [], None
    for e, rows in enumerate(epochs):
        tbl_rows = [
            {"url": k, "ts_us": t * len(epochs) + e, "lang": "en"}
            for k, t in rows
        ]
        if tbl_rows:
            live.process(e, pa.Table.from_pandas(
                pd.DataFrame(tbl_rows), preserve_index=False))
        live.advance_watermark(e * wm_step)
        if base is None or e - base >= cadence:
            frames = [live.snapshot_bytes()]
            base = e
        else:
            frames.append(live.delta_bytes(base))

    restored = mkps()
    restored.restore_chain(frames)
    assert restored.nfa.partials == live.nfa.partials
    assert restored.nfa.truncated == live.nfa.truncated
    assert restored.win == live.win
    assert restored.sessions == live.sessions

    probe = pa.Table.from_pandas(pd.DataFrame(
        [{"url": k, "ts_us": 10_000 + i, "lang": "en"}
         for i, k in enumerate(["a", "a", "b"])]), preserve_index=False)
    def matches_df(out):
        m = out["matches"]
        return (m.to_pandas() if hasattr(m, "to_pandas") else m
                ).reset_index(drop=True)

    got = matches_df(restored.process(len(epochs), probe))
    want = matches_df(live.process(len(epochs), probe))
    pd.testing.assert_frame_equal(got, want)


# ---------------------------------------------------------------------------
# redirect resolution: pointer doubling vs a single-hop dict walk on
# random functional graphs (chains, trees INTO chains, cycles, self-loops
# arise naturally from a random successor function)
# ---------------------------------------------------------------------------

@settings(max_examples=12, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=40),
    frac_src=st.floats(min_value=0.3, max_value=1.0),
    seed=st.integers(min_value=0, max_value=10**6),
)
def test_resolve_redirects_matches_dict_walk(n, frac_src, seed):
    import ray.data as rd

    from gush_ray.stages.web import resolve_redirects

    rng = np.random.RandomState(seed)
    nodes = [f"u{i}" for i in range(n)]
    srcs = [u for u in nodes if rng.rand() < frac_src] or [nodes[0]]
    f = {u: nodes[int(rng.randint(0, n))] for u in srcs}
    max_rounds = 4  # resolves chains up to 16 hops

    # reference: plain single-hop walk with the same 2^rounds bound
    def walk(u):
        cur, hops = f[u], 1
        while cur in f and hops < 2 ** max_rounds:
            cur, hops = f[cur], hops + 1
        if cur in f:  # still a source after the bound → unresolved
            return ("", -1, False)
        return (cur, hops, True)

    want = {u: walk(u) for u in srcs}

    ds = rd.from_pandas(pd.DataFrame(
        {"src": list(f), "dst": [f[u] for u in f]}))
    got = resolve_redirects(ds, max_rounds=max_rounds,
                            num_partitions=3).to_pandas()
    got_map = {r.src_url: (r.final_url, int(r.n_hops), bool(r.resolved))
               for r in got.itertuples()}
    assert got_map == want
