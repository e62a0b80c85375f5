"""Per-partition keyed state store: row-version dedup maps, window/session
accumulators, NFA partials — with epoch snapshots and idempotent replay.

Graft of everything the reference keeps in volatile operator state
(SURVEY.md §3.4): ``groupedWithin`` window buffers (cep/Cep.scala:31,42)
and the nonexistent dedup/cursor state. Here every partition of the
hash(url) shuffle owns one :class:`PartitionState`, wrapped in a named
Ray actor (:func:`get_state_actor`) that lives across epochs:

* **Row-version dedup (V1)**: ``{url -> (last_ts_us, version)}``. First
  sighting emits ``insert``; newer warc_ts emits ``update`` with the next
  version; exact replays and stale out-of-order rows are dropped
  deterministically — this is what makes downstream output exactly-once
  under replays.
* **Window accumulators (W1/W2)**: ``(group, window_id) -> [count, sum]``
  partials merged across epochs, emitted only when the watermark passes
  the window end (W5).
* **Session windows (W4)**: per-key open sessions, gap-merged, closed by
  newer events or the watermark.
* **NFA partials (C3)**: a :class:`~gush_ray.stages.nfa.NFARunner` whose
  partial matches survive epochs and are pruned at the watermark.
* **Idempotent replay**: outputs are memoized per epoch until the epoch
  commits, so a retried routing task gets byte-identical results without
  double-advancing state.

Scale note: state is an in-memory dict per partition; at 10^12 docs the
per-partition key count is bounded by num_partitions (4096 on a 256-node
cluster), and the snapshot/restore interface is the seam where a spilling
store (e.g. LSM on local disk) would slot in without touching the engine.
"""

from __future__ import annotations

import os
import pickle
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from gush_ray.stages.nfa import NFARunner, Pattern

NEG_INF = -(1 << 62)
POS_INF = 1 << 62

# AT-SCALE profile defaults (StreamingJob(at_scale=True) / run_job
# --at-scale): flip every unbounded-state exact mode to its
# oracle-paired bounded-state sketch sibling in one switch —
# window_distinct -> window_hll_p (2^p registers per open window,
# ~1.04/sqrt(2^12) = 1.6% rel err), exact window_quantiles ->
# quantile_sketch_k (O(octaves*k) histogram keys, rel err < 1/128
# toward zero, STILL bit-exact SQL-paired), and dedup state bounded to
# a week of event time (keys idle longer restart at version 0 —
# Flink's cleared-state semantics). The exact modes stay available and
# warn via `exact_state_oversized` when a slot outgrows
# StateParams.exact_state_warn_keys.
AT_SCALE_HLL_P = 12
AT_SCALE_SKETCH_K = 128
AT_SCALE_DEDUP_TTL_US = 7 * 24 * 3600 * 1_000_000


@dataclass
class StateParams:
    key_col: str = "url"
    ts_col: str = "ts_us"
    window_group_cols: tuple[str, ...] = ("lang",)
    window_size_us: int = 600_000_000
    # None → tumbling; set → sliding: each row lands in size/slide
    # overlapping windows, window w covers [w*slide, w*slide + size)
    window_slide_us: int | None = None
    session_gap_us: int = 1_800_000_000
    value_col: str | None = None        # optional numeric col summed per window
    # per-window DISTINCT key_col count (streaming "unique visitors"):
    # each open window additionally holds the SET of keys seen — exact,
    # watermark-bounded in time like the count/sum accumulators, and
    # PARTITION-EXACT: key_col is the exchange key, so a key lives in
    # exactly one partition and the global distinct count per (group,
    # window) is the SUM of the per-partition n_distinct outputs (no
    # sketch needed). The sets ride the same full/delta snapshot
    # protocol as the (count, sum) slots (the slot value IS the unit of
    # upsert). State cost: O(active keys per open window) — the price
    # of exactness; use the HLL sketch operator when an approximation
    # is acceptable at 100 TB.
    window_distinct: bool = False
    # per-window EXACT order statistics (streaming "p50/p95 page size"):
    # each open (group, window) additionally holds an exact VALUE
    # HISTOGRAM of value_col ({value -> count}); at window close the
    # partition emits its histogram rows on the `window_hist` stream and
    # a second-stage merge task (epoch_loop._quantile_windows) computes
    # the GLOBAL exact quantiles per closed window — the same two-stage
    # topology as the windowed top-k. Exact because histograms merge
    # additively across partitions; state cost is O(distinct values per
    # open window per partition), so quantize/bucket value_col upstream
    # when its domain is unbounded. Requires value_col. The tuple holds
    # the q's the merge stage reports (DuckDB quantile_disc semantics:
    # the value at 0-based rank max(1, n - floor(n - q*n)) - 1 in IEEE
    # double — DuckDB's exact formula, ≈ ceil(q*n)-1; see
    # stages.sketches.quantile_disc_rank0).
    window_quantiles: "tuple[float, ...] | None" = None
    # Bounded-state SKETCH mode for window_quantiles (the 100-TB path
    # for unbounded value domains): values are bucketized at
    # accumulation time by a MONOTONE log-bucket transform
    # (_sketch_rep: base-2 octaves split into k linear sub-buckets —
    # DDSketch-style relative-error buckets, VLDB'19, built from exact
    # frexp bit manipulation) and the histogram holds bucket
    # REPRESENTATIVES (lower bounds), so state per open window is
    # O(octaves × k) regardless of value cardinality. Because the
    # transform is rank-preserving, the merged quantile equals
    # rep(exact quantile) — guaranteed relative error < 1/k toward
    # zero, and still a DETERMINISTIC pure function of the input that
    # a SQL oracle replays bit-exactly (identical IEEE double ops).
    # Everything downstream (snapshots, rescale, window_hist stream,
    # the merge task) is shared with the exact path unchanged.
    quantile_sketch_k: "int | None" = None
    # per-session VALUE aggregates: each open session additionally
    # carries (sum, min, max) of value_col; closed session rows gain
    # sum_value/min_value/max_value columns. NaN/NULL values are
    # excluded from all three (DuckDB sum/min/max NULL semantics — the
    # oracle-parity contract) but still count in n_events. Slot shape
    # [start, last, n] grows to [start, last, n, vsum, vmin, vmax];
    # frames written before the flag carry 3-element slots — restored
    # sessions get neutral value state (0.0/None/None, the same
    # written-before-the-spec rollback rule as window_distinct).
    session_values: bool = False
    # Bounded-state windowed DISTINCT (the sketch counterpart of
    # window_distinct, same duality as window_quantiles/sketch_k): each
    # open (group, window) holds a 2^p-register HyperLogLog over
    # key_col instead of the exact key SET, so state per open window is
    # FIXED (2^p bytes) whatever the key cardinality. Registers merge
    # by elementwise max — order-free and additive across partitions —
    # so closed windows emit their register partials on the
    # `window_hll_parts` stream and a second-stage task
    # (epoch_loop._hll_windows) maxes them and writes the global
    # estimate per window to `window_hll`, exactly-once. The estimate
    # is a deterministic pure function of the input key SET (fixed
    # splitmix hash), so the output is P-independent and replayable;
    # accuracy is the standard HLL bound (~1.04/sqrt(2^p) relative,
    # linear-counting exact-ish at small cardinalities). Mutually
    # exclusive with nothing; combine with window_distinct to compare.
    window_hll_p: "int | None" = None
    # Flink-style EARLY FIRING (speculative triggers): every epoch, each
    # OPEN window touched by that epoch emits its CURRENT per-partition
    # partial on the ``window_early`` changelog as a retraction pair
    # (change=-1 previous emission, change=+1 current), and the CLOSE
    # emits a final pair — so folding sum(change*col) per (group,
    # window) over the changelog ALWAYS equals the current accumulator
    # totals (across partitions too: partials add), and after close it
    # equals the `windows` stream exactly. Completes the trigger triad:
    # early (this), on-time (`windows`), late (`window_updates` via
    # window_refire). Mutually exclusive with window_refire so each
    # changelog keeps a crisp fold invariant.
    window_early_fire: bool = False
    pattern: Pattern | None = None      # NFA over emitted change rows
    allowed_lateness_us: int = 0
    # Flink-style late firings (window "update mode"). False (default):
    # the watermark is HELD BACK by allowed_lateness_us, each window
    # fires exactly once, and every sub-watermark row goes to the late
    # stream. True: the watermark advances on time, windows fire at
    # end <= wm into the `windows` stream, their accumulators are
    # RETAINED for allowed_lateness_us past the end, and a late row is
    # dropped only when EVERY window it belongs to is expired
    # (end + lateness <= wm) — Flink's drop rule. Accepted late rows
    # re-fire their window with a retraction pair on the
    # `window_updates` changelog stream: (change=-1, previously emitted
    # values) then (change=+1, updated values), one pair per touched
    # window per epoch (the micro-batch analog of Flink's per-element
    # late firing). Initial firings also emit (change=+1, fire_seq=0),
    # so folding sum(change*n) per window over the changelog yields the
    # final window totals. Late-accepted rows contribute ONLY to
    # windows: they stay excluded from the changes/V1 path (a
    # sub-watermark row cannot be versioned deterministically under
    # replays), so window_group_cols must exist on the raw input —
    # V1-derived columns (change_kind/version) are unavailable for them.
    window_refire: bool = False
    # stream-stream interval join against a second keyed event stream
    # (state/join_state.JoinSpec); left side = the emitted change rows
    join_spec: "object | None" = None
    # streaming MinHash/LSH near-dup detection over arriving rows
    # (state/neardup.NearDupSpec); band rows arrive via a SECOND keyed
    # exchange (bucket-partitioned, not url-partitioned — the operator's
    # documented partitioning assumption, see state/neardup.py)
    neardup_spec: "object | None" = None
    # streaming URL-frontier discovery over arriving pages' anchors
    # (state/frontier.FrontierSpec); link rows arrive via their own
    # keyed exchange routed by hash(dst_url) — the discovered url, not
    # the discovering page (see state/frontier.py)
    frontier_spec: "object | None" = None
    # incremental snapshots (tasks mode): write a FULL state frame every
    # K epochs and small DELTA frames in between. The url-keyed dedup
    # dicts hold one entry per key EVER seen (the dominant, ever-growing
    # snapshot payload at steady state) but each epoch only touches the
    # keys it saw — deltas carry just those, cutting the per-epoch
    # snapshot write from O(all keys) to O(touched keys). 1 = every
    # frame full (the pre-delta behavior). Tasks mode only: actor-mode
    # snapshots (snapshot_to) are always full frames.
    snapshot_full_every: int = 8
    # event-time TTL for the url-keyed dedup maps (Flink-style state
    # TTL): a key idle past the TTL relative to the watermark is evicted
    # at watermark advance, bounding state to the keys active inside the
    # TTL horizon instead of every key EVER seen. Trade-off (documented,
    # deliberate): a row for an evicted key restarts its version counter
    # at 0 / change_kind 'insert' — identical to Flink's cleared-state
    # semantics. Dedup itself stays correct: any non-late row has
    # ts >= watermark > the evicted key's last_ts, so no stale row is
    # wrongly kept. None = keep state forever (the pre-TTL behavior).
    dedup_ttl_us: int | None = None
    # Loud telemetry for the UNBOUNDED-state exact modes: when an open
    # window's exact key SET (window_distinct) or exact value HISTOGRAM
    # (window_quantiles without quantile_sketch_k) exceeds this many
    # entries, the partition logs one warning and every subsequent
    # epoch's manifest metrics carry `exact_state_oversized` (the count
    # of oversized open slots). The exact modes are correct at any size
    # — but on an unbounded key/value domain at 100 TB the bounded-state
    # sketch siblings (window_hll_p / quantile_sketch_k, both
    # oracle-paired) are the right defaults: flip them in one switch
    # with the AT-SCALE profile (epoch_loop.StreamingJob(at_scale=True)
    # / run_job --at-scale).
    exact_state_warn_keys: int = 1_000_000
    # CAPACITY-WALL auto-escalation (round-5; the measured 24M-key wall
    # in BENCH/BASELINE.md): the keys-EVER maps — V1 dedup last_ts/
    # version, near-dup bucket owners, frontier seen — are the only
    # sections whose growth is unbounded in KEYS rather than
    # watermark-bounded in time, and with no TTL configured they
    # OOM-killed the 24M-distinct-key headroom run. When any of those
    # maps crosses this per-partition cap, the partition ENGAGES
    # bounded-state mode: watermark-safe oldest-first eviction (only
    # entries with last-activity ts < watermark are candidates — the
    # same safety argument as the TTL sweep: any non-late row has
    # ts >= watermark > the evicted entry's ts, so no stale row is
    # wrongly kept) down to 90% of the cap, with the SAME cleared-state
    # semantics as `dedup_ttl_us` (an evicted key restarts at version
    # 0 / re-discovery). This is the event-time TTL made adaptive: a
    # fixed TTL cannot bound a short-horizon stream (the wall corpus
    # spans 4 h — a 7-day TTL evicts nothing), a key-count cap bounds
    # memory whatever the horizon, and the age of the oldest retained
    # key IS the effective TTL. Engagement is deterministic (a pure
    # function of state), persisted in snapshots, logged once, and
    # recorded per-epoch in the manifest (`state_cap_engaged`).
    # None disables (the round-4 warn-only behavior). StreamingJob
    # derives the default from a whole-job budget divided by the
    # partition count (state_keys_budget), so the per-partition cap
    # scales with how many states must co-reside on a node.
    state_keys_cap: "int | None" = None
    # MAP-SIDE WINDOW COMBINERS (round-5 verdict item 4 — hot-key
    # mitigation for the commutative window state). The keyed exchange
    # pins every row of a hot key to one partition by construction —
    # correct and fundamental for ORDER-DEPENDENT state (V1 dedup, NFA,
    # sessions), but the window count/sum/HLL accumulators are
    # commutative partials that merge wherever they live. With
    # window_combine the job becomes a pure windowed-analytics
    # topology (Flink's pre-aggregated window pipeline): the MAP task
    # aggregates each shard's on-time rows into per-(group, window)
    # CELLS — count, sum, HLL registers, per-cell max event ts — and
    # ships cells routed by group-hash; the reduce folds cells into
    # the window slots. A hot key then costs O(map tasks × open
    # windows) cells on its owner partition instead of O(rows).
    # SEMANTICS (documented, deliberate): windows aggregate ON-TIME
    # ARRIVALS — the V1 change/session/NFA sections are off (their
    # per-key state is exactly what the combiner cannot see), so the
    # profile refuses pattern/join/neardup/frontier/distinct/quantile/
    # refire/early-fire/session-value modes. Lateness is classified
    # map-side against the committed watermark of TWO epochs back
    # (wm_floor — deterministic across kill→resume because it reads
    # the epoch-(e-2) manifest, not driver memory); late rows ship raw
    # on the standard lane and reach the late stream unchanged. A cell
    # whose window already closed at the restored watermark is dropped
    # with the `window_expired_dropped` metric (the same rows are
    # late-routed in the default topology). On an in-order stream the
    # two topologies produce IDENTICAL windows/hll output
    # (chaos-test-pinned, tests/test_window_combine.py).
    window_combine: bool = False

    def __post_init__(self):
        if self.window_slide_us and self.window_size_us % self.window_slide_us:
            raise ValueError(
                "window_size_us must be a multiple of window_slide_us "
                f"(got {self.window_size_us} / {self.window_slide_us})"
            )
        if self.window_quantiles is not None:
            if self.value_col is None:
                raise ValueError(
                    "window_quantiles needs value_col (the column the "
                    "order statistics are over)")
            if not self.window_quantiles:
                raise ValueError("window_quantiles must be non-empty")
            for q in self.window_quantiles:
                if not (0.0 <= q <= 1.0):
                    raise ValueError(f"quantile {q} outside [0, 1]")
            if self.window_refire:
                raise ValueError(
                    "window_quantiles + window_refire are mutually "
                    "exclusive (a re-fired histogram would need its own "
                    "changelog protocol)")
        if self.quantile_sketch_k is not None:
            if self.window_quantiles is None:
                raise ValueError(
                    "quantile_sketch_k modifies window_quantiles — set "
                    "both (the sketch is a value-bucketing mode of the "
                    "windowed-quantile dataflow)")
            if self.quantile_sketch_k < 1:
                raise ValueError("quantile_sketch_k must be >= 1")
        if self.session_values and self.value_col is None:
            raise ValueError(
                "session_values needs value_col (the column the "
                "per-session aggregates are over)")
        if self.window_hll_p is not None and not (4 <= self.window_hll_p
                                                  <= 18):
            raise ValueError("window_hll_p must be in [4, 18]")
        if self.window_early_fire and self.window_refire:
            raise ValueError(
                "window_early_fire + window_refire are mutually "
                "exclusive (each changelog keeps its own fold "
                "invariant; combining them would interleave pre-close "
                "and post-close retractions in two streams)")
        if self.window_combine:
            # window_quantiles rides the combiner ONLY in sketch mode:
            # the DDSketch-bucketed histogram is O(octaves × k) per
            # cell whatever the value cardinality, so a map-side cell
            # stays bounded; an exact histogram cell over an unbounded
            # value domain would ship the shard's whole value set
            exact_q = (self.window_quantiles
                       if self.quantile_sketch_k is None else None)
            bad = [n for n, v in (
                ("pattern", self.pattern),
                ("join_spec", self.join_spec),
                ("neardup_spec", self.neardup_spec),
                ("frontier_spec", self.frontier_spec),
                ("window_distinct", self.window_distinct or None),
                ("window_quantiles (exact mode; set quantile_sketch_k)",
                 exact_q),
                ("window_refire", self.window_refire or None),
                ("window_early_fire", self.window_early_fire or None),
                ("session_values", self.session_values or None),
            ) if v is not None]
            if bad:
                raise ValueError(
                    "window_combine is the pure windowed-analytics "
                    "profile (map-side pre-aggregation): the per-key "
                    f"order-dependent modes {bad} cannot ride it — "
                    "run them as a separate (default-topology) job")


class PartitionState:
    """Plain-Python state core (unit-testable without Ray)."""

    def __init__(self, partition_id: int, params: StateParams):
        self.pid = partition_id
        self.p = params
        self._oversized_warned = False
        # capacity-wall auto-escalation (StateParams.state_keys_cap):
        # once engaged, stays engaged for the partition's lifetime
        # (persisted in snapshot scalars, surfaced in the manifest)
        self.state_cap_engaged = False
        self.last_ts: dict = {}
        self.version: dict = {}
        self.win: dict = {}        # (group..., window_id) -> [n, sum]
        # window_refire mode: accumulators of ALREADY-FIRED windows kept
        # until end + allowed_lateness passes the watermark —
        # (group..., window_id) -> [n, sum, keyset|None,
        #                           emitted_n, emitted_sum,
        #                           emitted_n_distinct, n_emissions]
        self.fired: dict = {}
        # window_quantiles mode: (group..., window_id) -> {value: count}
        self.winq: dict = {}
        # window_hll_p mode: (group..., window_id) -> uint8[2^p] registers
        self.winh: dict = {}
        # window_early_fire mode: (group..., window_id) ->
        # [emitted_n, emitted_sum, emitted_nd, fire_seq] (the last
        # early emission, retracted before each re-emission)
        self.wearly: dict = {}
        self.sessions: dict = {}   # key -> [start, last, n]
        self.nfa = NFARunner(params.pattern) if params.pattern else None
        if params.join_spec is not None:
            from gush_ray.state.join_state import StreamJoinState

            self.joiner = StreamJoinState(
                params.key_col, params.ts_col, params.join_spec
            )
        else:
            self.joiner = None
        if params.neardup_spec is not None:
            from gush_ray.state.neardup import NearDupState

            self.neardup = NearDupState(params.neardup_spec)
        else:
            self.neardup = None
        if params.frontier_spec is not None:
            from gush_ray.state.frontier import FrontierState

            self.frontier = FrontierState(params.frontier_spec)
        else:
            self.frontier = None
        self.watermark_us: int = NEG_INF
        self.max_ts_us: int = NEG_INF
        # dedup-dict keys touched since the last snapshot frame — the
        # upsert set a DELTA frame carries. With a TTL, eviction also
        # DELETES keys, so frames additionally carry tombstones for keys
        # evicted since the last frame (without them, a chain restore
        # would resurrect evicted entries and a resumed run's version
        # counters would diverge from an uninterrupted run's)
        self._dirty: set = set()
        self._evicted: set = set()
        # same dirty/closed tracking for the keyed SMALL sections: open
        # windows and sessions are watermark-bounded in TIME, but their
        # key population is the ACTIVE-horizon set (every key with an
        # open window/session), which at web scale is ~horizon/epoch
        # times larger than the per-epoch touched set — a delta frame
        # carries only touched keys + tombstones for closed ones
        self._win_dirty: set = set()
        self._win_closed: set = set()
        self._sess_dirty: set = set()
        self._sess_closed: set = set()
        # fired-window accumulators delta the same way as open windows
        self._fired_dirty: set = set()
        self._fired_closed: set = set()
        # per-window value histograms delta the same way
        self._winq_dirty: set = set()
        self._winq_closed: set = set()
        # per-window HLL registers delta the same way
        self._winh_dirty: set = set()
        self._winh_closed: set = set()
        # last-early-emission slots delta the same way
        self._wearly_dirty: set = set()
        self._wearly_closed: set = set()
        # fired windows touched by late-accepted rows this epoch; drained
        # (emitting retraction pairs) at the next advance_watermark, so
        # the set is always empty at snapshot time
        self._refire_pending: set = set()
        # last watermark at which a TTL sweep ran (amortization: the
        # sweep scans the whole dict, so it runs at most once per TTL/8
        # of watermark progress; snapshotted so a resumed run keeps the
        # same deterministic sweep schedule)
        self._ttl_sweep_wm: int = NEG_INF
        self.evicted_total: int = 0
        self._epoch_cache: dict[int, dict] = {}
        # direct-exchange ingest buffers: epoch -> fragments; frag keys make
        # re-sent fragments (task retries) idempotent
        self._frag_buf: dict[int, list] = {}
        self._frag_seen: dict[int, set] = {}
        # right-stream fragments of the stream-stream join (separate key
        # space from the left stream's shard indices)
        self._rfrag_buf: dict[int, list] = {}
        self._rfrag_seen: dict[int, set] = {}
        # band-row fragments of the streaming near-dup exchange (third
        # key space; bucket-partitioned)
        self._nfrag_buf: dict[int, list] = {}
        self._nfrag_seen: dict[int, set] = {}
        # link-row fragments of the streaming frontier exchange (fourth
        # key space; dst-url-partitioned)
        self._ffrag_buf: dict[int, list] = {}
        self._ffrag_seen: dict[int, set] = {}
        self._cfrag_buf: dict[int, list] = {}
        self._cfrag_seen: dict[int, set] = {}

    # -------------------------------------------- direct-exchange ingest

    def ingest(self, epoch: int, frag_key: int, table: pa.Table) -> None:
        """Buffer one shuffle fragment (idempotent under task retry: a
        re-sent fragment with a seen key is dropped)."""
        seen = self._frag_seen.setdefault(epoch, set())
        if frag_key in seen:
            return
        seen.add(frag_key)
        self._frag_buf.setdefault(epoch, []).append(table)

    def ingest_right(self, epoch: int, frag_key: int,
                     table: pa.Table) -> None:
        """Buffer one fragment of the join's RIGHT stream (idempotent,
        same retry contract as :meth:`ingest`)."""
        seen = self._rfrag_seen.setdefault(epoch, set())
        if frag_key in seen:
            return
        seen.add(frag_key)
        self._rfrag_buf.setdefault(epoch, []).append(table)

    def ingest_neardup(self, epoch: int, frag_key: int,
                       table: pa.Table) -> None:
        """Buffer one band-row fragment of the streaming near-dup
        exchange (idempotent, same retry contract as :meth:`ingest`)."""
        seen = self._nfrag_seen.setdefault(epoch, set())
        if frag_key in seen:
            return
        seen.add(frag_key)
        self._nfrag_buf.setdefault(epoch, []).append(table)

    def ingest_frontier(self, epoch: int, frag_key: int,
                        table: pa.Table) -> None:
        """Buffer one link-row fragment of the streaming frontier
        exchange (idempotent, same retry contract as :meth:`ingest`)."""
        seen = self._ffrag_seen.setdefault(epoch, set())
        if frag_key in seen:
            return
        seen.add(frag_key)
        self._ffrag_buf.setdefault(epoch, []).append(table)

    def ingest_cells(self, epoch: int, frag_key: int,
                     table: pa.Table) -> None:
        """Buffer one window-CELL fragment of the map-side-combined
        exchange (window_combine mode; idempotent, same retry contract
        as :meth:`ingest`)."""
        seen = self._cfrag_seen.setdefault(epoch, set())
        if frag_key in seen:
            return
        seen.add(frag_key)
        self._cfrag_buf.setdefault(epoch, []).append(table)

    def process_epoch_to(self, epoch: int, base_dir: str) -> dict:
        """Sort + process everything ingested for ``epoch`` and write this
        partition's output files idempotently; returns metrics.

        Replay-idempotent: a second call for a processed epoch returns the
        cached metrics without re-advancing state (files were written
        atomically to deterministic names, so they are already correct).
        """
        if epoch in self._epoch_cache:
            # replay: a retried caller re-ingested this epoch's fragments
            # (the seen-sets were popped on first processing) — discard
            # them, or every replay would pin an epoch of Arrow tables in
            # the actor forever (round-3 review finding)
            self._frag_buf.pop(epoch, None)
            self._frag_seen.pop(epoch, None)
            self._rfrag_buf.pop(epoch, None)
            self._rfrag_seen.pop(epoch, None)
            self._nfrag_buf.pop(epoch, None)
            self._nfrag_seen.pop(epoch, None)
            self._ffrag_buf.pop(epoch, None)
            self._ffrag_seen.pop(epoch, None)
            self._cfrag_buf.pop(epoch, None)
            self._cfrag_seen.pop(epoch, None)
            return self._epoch_cache[epoch]["metrics"]
        from gush_ray.sinks.exactly_once import ExactlyOnceSink

        frags = self._frag_buf.pop(epoch, [])
        self._frag_seen.pop(epoch, None)
        changes_t = None
        if frags:
            table = pa.concat_tables(frags, promote_options="default")
            out = self._process_impl(table)
            changes_t = out["changes"]
            # independent files — write CONCURRENTLY, the same
            # concurrent-PUT pattern as the epoch loop's close-parts
            # writer (neutral on local disk, collapses the store
            # critical path under per-op latency)
            from concurrent.futures import ThreadPoolExecutor

            jobs = [("changes", changes_t), ("late", out["late"]),
                    ("sessions", out["sessions_closed"])]
            if out["matches"].num_columns:
                jobs.append(("matches", out["matches"]))
            with ThreadPoolExecutor(max_workers=len(jobs)) as ex:
                futs = [ex.submit(ExactlyOnceSink.write_part, base_dir,
                                  stream, epoch, self.pid, tab)
                        for stream, tab in jobs]
                for f in futs:
                    f.result()
            metrics = out["metrics"]
        else:
            metrics = {"rows_in": 0, "max_ts_us": self.max_ts_us}
        if self.joiner is not None:
            metrics = dict(metrics)
            metrics.update(self._process_join(epoch, base_dir, changes_t))
        if self.neardup is not None:
            metrics = dict(metrics)
            metrics.update(self._process_neardup(epoch, base_dir))
        if self.frontier is not None:
            metrics = dict(metrics)
            metrics.update(self._process_frontier(epoch, base_dir))
        if self.p.window_combine:
            metrics = dict(metrics)
            cm = self._process_cells(epoch)
            # rows_in = physical arrivals at this partition: raw late
            # rows (standard lane) + cell rows — the manifest metric
            # the hot-key chaos pin reads the owner's load from
            cm["rows_in"] = metrics.get("rows_in", 0) + cm["combine_cells"]
            metrics.update(cm)
        self._epoch_cache[epoch] = {"metrics": metrics}
        return metrics

    def _process_frontier(self, epoch: int, base_dir: str) -> dict:
        """Streaming frontier step: this epoch's link rows (routed here
        by dst-url hash) probe/extend the seen-map; first discoveries
        land on the ``frontier`` stream. Runs at the RESTORED watermark,
        like the V1 late filter and the near-dup section."""
        from gush_ray.sinks.exactly_once import ExactlyOnceSink

        p = self.p
        ffrags = self._ffrag_buf.pop(epoch, [])
        self._ffrag_seen.pop(epoch, None)
        if ffrags:
            fdf = pa.concat_tables(
                ffrags, promote_options="default").to_pandas()
        else:
            fdf = pd.DataFrame({"dst_url": pd.Series(dtype=object),
                                p.ts_col: pd.Series(dtype="int64"),
                                "src_url": pd.Series(dtype=object)})
        out = self.frontier.process(fdf, self.watermark_us, p.ts_col)
        if len(out):
            out_t = pa.Table.from_pandas(out, preserve_index=False)
        else:
            # typed empty part (schema drift guard, as for near_dups)
            out_t = pa.table({
                "url": pa.array([], type=pa.string()),
                p.ts_col: pa.array([], type=pa.int64()),
                "discovered_from": pa.array([], type=pa.string()),
            })
        ExactlyOnceSink.write_part(base_dir, "frontier", epoch,
                                   self.pid, out_t)
        return {"frontier_rows": int(len(out)),
                "frontier_seen": int(len(self.frontier.seen))}

    def _process_cells(self, epoch: int) -> dict:
        """window_combine mode: fold this epoch's map-side-combined
        window CELLS (count/sum/HLL-register partials per (group,
        window), routed here by group-hash) into the window slots.
        Pure commutative merges — addition for count/sum, elementwise
        max for registers — so the result equals per-row accumulation
        of the same on-time rows (chaos-test-pinned). Cells whose
        window already closed at the restored watermark are dropped
        and counted (`window_expired_dropped`): the same rows are
        late-routed in the default topology, and folding them would
        re-open and re-fire a closed window."""
        p = self.p
        cfrags = self._cfrag_buf.pop(epoch, [])
        self._cfrag_seen.pop(epoch, None)
        if not cfrags:
            return {"combine_cells": 0, "rows_represented": 0,
                    "window_expired_dropped": 0}
        df = pa.concat_tables(
            cfrags, promote_options="permissive").to_pandas()
        gcols = list(p.window_group_cols)
        # state max tracks every represented row (incl. expired-window
        # cells — their rows DID arrive and already bounded the
        # driver's watermark inputs via the map metas)
        if len(df):
            self.max_ts_us = max(self.max_ts_us,
                                 int(df["max_ts"].max()))
        slide = p.window_slide_us or p.window_size_us
        w_end = df["window_id"].to_numpy() * slide + p.window_size_us
        expired = w_end <= self.watermark_us
        n_expired = int(df.loc[expired, "n"].sum())
        df = df[~expired]
        n_cells = int(len(df))
        n_rows = int(df["n"].sum()) if n_cells else 0
        if n_cells:
            aggs = {"n": ("n", "sum"), "sum_value": ("sum_value", "sum")}
            m = df.groupby(gcols + ["window_id"], dropna=False,
                           as_index=False, sort=False).agg(**aggs)
            for key, cnt, s in zip(
                m[gcols + ["window_id"]].itertuples(index=False,
                                                    name=None),
                m["n"].to_numpy(), m["sum_value"].to_numpy(),
            ):
                key = tuple(
                    None if (isinstance(v, float) and v != v) else v
                    for v in key
                )
                slot = self.win.setdefault(key, [0, 0.0])
                slot[0] += int(cnt)
                slot[1] += float(s)
                self._win_dirty.add(key)
            if (p.quantile_sketch_k is not None
                    and "hist" in df.columns):
                # sketched value-histogram cells fold additively into
                # the winq slots (same upsert granularity as the
                # per-row path; the window-close emission and stage-2
                # quantile merge downstream are unchanged)
                import pickle as _pkl

                for key, grp in df.groupby(gcols + ["window_id"],
                                           sort=False, dropna=False):
                    if not isinstance(key, tuple):
                        key = (key,)
                    key = tuple(
                        None if (isinstance(v, float) and v != v) else v
                        for v in key
                    )
                    hist = self.winq.setdefault(key, {})
                    for blob in grp["hist"]:
                        for v, c in _pkl.loads(blob).items():
                            hist[v] = hist.get(v, 0) + c
                    self._winq_dirty.add(key)
            if p.window_hll_p is not None and "registers" in df.columns:
                for key, grp in df.groupby(gcols + ["window_id"],
                                           sort=False, dropna=False):
                    if not isinstance(key, tuple):
                        key = (key,)
                    key = tuple(
                        None if (isinstance(v, float) and v != v) else v
                        for v in key
                    )
                    reg = self.winh.get(key)
                    if reg is None:
                        reg = self.winh[key] = np.zeros(
                            1 << p.window_hll_p, dtype=np.uint8)
                    for blob in grp["registers"]:
                        np.maximum(reg,
                                   np.frombuffer(blob, dtype=np.uint8),
                                   out=reg)
                    self._winh_dirty.add(key)
        return {"combine_cells": n_cells, "rows_represented": n_rows,
                "window_expired_dropped": n_expired}

    def _process_neardup(self, epoch: int, base_dir: str) -> dict:
        """Streaming near-dup step: this epoch's band rows (routed here
        by bucket hash) probe/extend the bucket-owner map; hits land on
        the ``near_dups`` stream. Runs at the RESTORED watermark, like
        the V1 late filter."""
        from gush_ray.sinks.exactly_once import ExactlyOnceSink

        p = self.p
        nfrags = self._nfrag_buf.pop(epoch, [])
        self._nfrag_seen.pop(epoch, None)
        if nfrags:
            ntab = pa.concat_tables(nfrags, promote_options="default")
            ndf = ntab.to_pandas()
            if isinstance(ndf[p.key_col].dtype, pd.CategoricalDtype):
                # the exchange ships the key dictionary-encoded (repeated
                # once per band row otherwise); decode BEFORE sorting —
                # pandas sorts categoricals by code order, which is
                # per-fragment insertion order, not the lexicographic
                # (ts, key) tie-break the SQL oracle reproduces
                ndf[p.key_col] = ndf[p.key_col].astype(object)
        else:
            ndf = pd.DataFrame(
                {p.key_col: [], p.ts_col: [], "band_id": [],
                 "band_hash": []})
        out = self.neardup.process(ndf, self.watermark_us,
                                   p.key_col, p.ts_col)
        if len(out):
            out_t = pa.Table.from_pandas(out, preserve_index=False)
        else:
            # typed empty part: an untyped empty pandas frame would give
            # this epoch's file null columns and drift the stream schema
            out_t = pa.table({
                p.key_col: pa.array([], type=pa.string()),
                p.ts_col: pa.array([], type=pa.int64()),
                "band_id": pa.array([], type=pa.int64()),
                "dup_of": pa.array([], type=pa.string()),
                "dup_of_ts": pa.array([], type=pa.int64()),
            })
        ExactlyOnceSink.write_part(base_dir, "near_dups", epoch,
                                   self.pid, out_t)
        return {"near_dup_rows": int(len(out)),
                "neardup_buckets": int(len(self.neardup.buckets))}

    def _process_join(self, epoch: int, base_dir: str,
                      changes_t: "pa.Table | None") -> dict:
        """Stream-stream interval join step: this epoch's change rows x
        the right stream, through the buffered incremental join. A right
        row is dropped (and counted) only when it is UNJOINABLE — past
        the same retention bound the buffer prune uses; left-side late
        rows were already routed to the late stream by the V1 path."""
        from gush_ray.sinks.exactly_once import ExactlyOnceSink

        p = self.p
        rfrags = self._rfrag_buf.pop(epoch, [])
        self._rfrag_seen.pop(epoch, None)
        l_cols = [p.key_col, p.ts_col, *self.joiner.spec.left_cols]
        if changes_t is not None and changes_t.num_rows:
            new_l = changes_t.select(l_cols).to_pandas()
        else:
            new_l = pd.DataFrame(columns=l_cols)
        r_cols = [p.key_col, p.ts_col, *self.joiner.spec.right_cols]
        n_r_late = 0
        if rfrags:
            rtab = pa.concat_tables(rfrags, promote_options="default")
            new_r = rtab.select(r_cols).to_pandas()
            # a right row is only unjoinable once NO buffered-or-future
            # left row can pair with it. Future lefts (ts >= wm) need
            # r.ts - low >= wm; buffered lefts can still pair a
            # below-that row, so the admission threshold is
            # wm + min(low, 0): with low <= 0 that salvages
            # below-watermark rows for buffered lefts (pinned by
            # test_stream_join), and with low > 0 it admits every
            # non-late row — the old uniform r.ts - low >= wm cut
            # silently dropped on-time rows whose only partners were
            # already buffered (round-3 review finding). Admitted rows
            # join against bufL in process_epoch; ones past the
            # retention bound leave the buffer at the next prune.
            on_time = (new_r[p.ts_col].to_numpy().astype(np.int64)
                       - min(self.joiner.spec.low_us, 0)
                       ) >= self.watermark_us
            n_r_late = int((~on_time).sum())
            if n_r_late:
                new_r = new_r[on_time].reset_index(drop=True)
        else:
            new_r = pd.DataFrame(columns=r_cols)
        joined = self.joiner.process_epoch(new_l, new_r)
        if p.join_spec.mode != "asof":
            # asof mode: process_epoch only absorbed — emission is
            # watermark-gated (advance_watermark drains and the reduce
            # writes the epoch's "joined" part, same shape as windows)
            ExactlyOnceSink.write_part(
                base_dir, "joined", epoch, self.pid,
                pa.Table.from_pandas(joined, preserve_index=False),
            )
        return {
            "joined_rows": int(len(joined)),
            "right_rows_in": int(len(new_r) + n_r_late),
            "right_late": n_r_late,
            "join_buf_l": int(len(self.joiner.bufL)),
            "join_buf_r": int(len(self.joiner.bufR)),
        }

    # ------------------------------------------------------------ ingest

    def process(self, epoch: int, table: pa.Table) -> dict:
        if epoch in self._epoch_cache:  # idempotent replay
            return self._epoch_cache[epoch]
        out = self._process_impl(table)
        self._epoch_cache[epoch] = out
        return out

    def _process_impl(self, table: pa.Table) -> dict:
        """Arrow/numpy-native hot path (round-3 verdict item 3): the old
        per-batch ``to_pandas()`` of the state columns decoded every key
        string per ROW; here key objects materialize once per RUN
        (unique key per batch) and fan out by index, the multi-key sort
        runs in Arrow C++, and the V1 dedup-map lookups drop from one
        dict.get per row to one per unique key. pandas remains only
        where it is the right kernel: the window-accumulator groupbys,
        sessions, NFA, and the cold refire path."""
        import pyarrow.compute as pc

        p = self.p
        tt = {}
        t0 = time.perf_counter()
        n_in = table.num_rows
        key_chunked = table[p.key_col]
        key_a = (key_chunked.combine_chunks()
                 if isinstance(key_chunked, pa.ChunkedArray)
                 else key_chunked)
        if pa.types.is_floating(key_a.type):
            # float-NaN keys corrupt EVERY keyed stage (nan != nan:
            # dict lookups miss, runs split per row — round-3 review
            # finding). Normalize ONCE at the boundary to null, which
            # every stage already handles as a None key.
            key_a = pc.if_else(pc.is_nan(key_a),
                               pa.scalar(None, key_a.type), key_a)
        ts_all = table[p.ts_col].to_numpy().astype(np.int64, copy=False)
        tt["p_pandas"] = time.perf_counter() - t0
        t0 = time.perf_counter()

        # total order (key, ts, original row): the explicit row tiebreak
        # makes the sort deterministic whatever the C++ sorter's tie
        # handling, so replay-dedup keeps the FIRST original occurrence
        # — the old stable-mergesort + keep="first" contract
        if n_in:
            order = pc.sort_indices(
                pa.table({"k": key_a, "t": pa.array(ts_all),
                          "i": pa.array(np.arange(n_in, dtype=np.int64))}),
                sort_keys=[("k", "ascending"), ("t", "ascending"),
                           ("i", "ascending")],
            ).to_numpy().astype(np.int64, copy=False)
        else:
            order = np.empty(0, dtype=np.int64)
        ks = key_a.take(pa.array(order))
        ts_s = ts_all[order]
        one = np.ones(min(n_in, 1), dtype=bool)
        if n_in > 1:
            # null-aware neighbor equality: pc.equal(null, x) is null,
            # and two consecutive null keys ARE the same run
            nulls = pc.is_null(ks).to_numpy(zero_copy_only=False)
            eqv = pc.fill_null(
                pc.equal(ks.slice(1), ks.slice(0, n_in - 1)), False
            ).to_numpy(zero_copy_only=False)
            same_key = eqv | (nulls[1:] & nulls[:-1])
        else:
            same_key = np.empty(0, dtype=bool)
        new_run = np.concatenate([one, ~same_key])
        run_id = np.cumsum(new_run) - 1
        # the ONLY per-key Python materialization: one object per run
        uniq_keys = ks.take(
            pa.array(np.nonzero(new_run)[0])).to_pylist()
        n_runs = len(uniq_keys)

        # replay dedup (key, ts) keep-first
        if n_in > 1:
            dup = same_key & (ts_s[1:] == ts_s[:-1])
            keep1 = np.concatenate([one, ~dup])
        else:
            keep1 = one
        n_replay = int(n_in - keep1.sum())
        pos = order[keep1]
        ts_s = ts_s[keep1]
        run_id = run_id[keep1]
        if len(ts_s):
            self.max_ts_us = max(self.max_ts_us, int(ts_s.max()))
        tt["p_sort"] = time.perf_counter() - t0
        t0 = time.perf_counter()

        # late rows: event time already below the watermark → side output.
        # In window_refire mode a sub-watermark row is LATE only when
        # every window it belongs to is expired (Flink's drop rule);
        # otherwise it is accepted for window re-firing (but still
        # excluded from the changes/V1 path — see StateParams docs).
        lateok_pos = None
        if p.window_refire:
            slide_c = p.window_slide_us or p.window_size_us
            # the row's newest window ends at (ts//slide)*slide + size
            max_end = (ts_s // slide_c) * slide_c + p.window_size_us
            sub_wm = ts_s < self.watermark_us
            late_mask = sub_wm & (
                max_end + p.allowed_lateness_us <= self.watermark_us)
            lateok_pos = pos[sub_wm & ~late_mask]
            late_pos = pos[late_mask]
            on = ~sub_wm
        else:
            late_mask = ts_s < self.watermark_us
            late_pos = pos[late_mask]
            on = ~late_mask
        pos = pos[on]
        ts_s = ts_s[on]
        run_id = run_id[on]

        # V1 row-version dedup: ONE dict.get per unique key (not per
        # row — the old per-row loop was O(batch) Python calls), then
        # broadcast to rows by run id; within a run ts is ascending, so
        # stale rows are exactly those at or below the key's last ts
        lt_get = self.last_ts.get
        ver_get = self.version.get
        prev_last_u = np.fromiter(
            (lt_get(k, NEG_INF) for k in uniq_keys),
            dtype=np.int64, count=n_runs)
        prev_ver_u = np.fromiter(
            (ver_get(k, -1) for k in uniq_keys),
            dtype=np.int64, count=n_runs)
        keep = ts_s > prev_last_u[run_id]
        n_stale = int((~keep).sum())
        pos = pos[keep]
        ts_s = ts_s[keep]
        run_id = run_id[keep]
        nk = len(pos)
        if nk:
            new_row_run = np.concatenate(
                [[True], run_id[1:] != run_id[:-1]])
            starts = np.nonzero(new_row_run)[0]
            lens = np.diff(np.concatenate([starts, [nk]]))
            occ = np.arange(nk) - np.repeat(starts, lens)
            version = prev_ver_u[run_id] + 1 + occ
            # update the dedup map with each key's final row of this
            # batch; .tolist() keeps plain Python ints in the dicts
            # (np.int64 values pickle several times slower in snapshots)
            last_row = np.concatenate([new_row_run[1:], [True]])
            tail_keys = [uniq_keys[r] for r in run_id[last_row].tolist()]
            self.last_ts.update(
                zip(tail_keys, ts_s[last_row].tolist()))
            self.version.update(
                zip(tail_keys, version[last_row].tolist()))
            self._dirty.update(tail_keys)
        else:
            version = np.empty(0, dtype=np.int64)
        ck_rows = np.where(version == 0, "insert", "update")
        # per-row key OBJECTS by index fan-out of the unique list —
        # shared references, no further string decoding
        ku = np.empty(n_runs, dtype=object)
        ku[:] = uniq_keys
        key_rows = ku[run_id] if nk else np.empty(0, dtype=object)
        # lazily-taken payload columns (group/value/pattern), decoded
        # only for SURVIVING rows
        _taken: dict = {}

        def col_rows(c: str) -> np.ndarray:
            # change_kind/version are V1-derived, never table reads
            if c == "change_kind":
                return ck_rows
            if c == "version":
                return version
            got = _taken.get(c)
            if got is None:
                got = _taken[c] = table[c].take(
                    pa.array(pos)).to_numpy(zero_copy_only=False)
            return got

        tt["p_dedup"] = time.perf_counter() - t0
        t0 = time.perf_counter()

        # W1/W2/W3 window accumulators on the deduped change rows
        val_base = (col_rows(p.value_col) if p.value_col and nk
                    else None)
        if nk:
            us = ts_s
            gcols = [col_rows(c) for c in p.window_group_cols]
            val = val_base if val_base is not None else np.ones(nk)
            if p.window_slide_us:
                # sliding (W3): replicate each row into its k windows
                k = p.window_size_us // p.window_slide_us
                base = us // p.window_slide_us
                rep = np.repeat(np.arange(nk), k)
                offs = np.tile(np.arange(k, dtype=np.int64), nk)
                wid = base[rep] - offs
                gcols = [g[rep] for g in gcols]
                val = val[rep]
            else:
                wid = us // p.window_size_us
            keys_arr = None
            if p.window_distinct or p.window_hll_p is not None:
                keys_arr = key_rows
                if p.window_slide_us:
                    keys_arr = keys_arr[rep]
            acc_df = pd.DataFrame(
                {f"g{i}": g for i, g in enumerate(gcols)} | {
                    "w": wid, "v": val}
            )
            # dropna=False: rows whose group column is null (e.g. an
            # unmatched dimension key from the broadcast dim join) must
            # still be counted — pandas' default silently drops them,
            # breaking changes/windows conservation (agg.py sets the same)
            grouped = acc_df.groupby(
                [f"g{i}" for i in range(len(gcols))] + ["w"], sort=False,
                dropna=False,
            )["v"].agg(["size", "sum"])
            # plain zip over index tuples — iterrows materializes a Series
            # per group and was measurably hot in the reduce phase
            for key, cnt, s in zip(
                grouped.index, grouped["size"].to_numpy(),
                grouped["sum"].to_numpy()
            ):
                # NaN group labels are normalized to None: since py3.10
                # distinct float('nan') objects hash by identity, so raw
                # NaN keys would never merge across batches/epochs
                if not isinstance(key, tuple):
                    key = (key,)
                key = tuple(
                    None if (isinstance(v, float) and v != v) else v
                    for v in key
                )
                slot = self.win.setdefault(
                    key, [0, 0.0, set()] if p.window_distinct else [0, 0.0])
                slot[0] += int(cnt)
                slot[1] += float(s)
                self._win_dirty.add(key)

            if p.window_distinct:
                # per-(group, window) key sets: dedupe the batch's
                # (group, window, key) rows first so set updates are
                # proportional to the batch's UNIQUE keys per window
                uniq = acc_df.assign(u=keys_arr).drop_duplicates(
                    [f"g{i}" for i in range(len(gcols))] + ["w", "u"])
                g2 = uniq.groupby(
                    [f"g{i}" for i in range(len(gcols))] + ["w"],
                    sort=False, dropna=False)["u"]
                for key, us_keys in g2:
                    if not isinstance(key, tuple):
                        key = (key,)
                    key = tuple(
                        None if (isinstance(v, float) and v != v) else v
                        for v in key
                    )
                    # the count/sum loop above has already created every
                    # slot this loop touches (same groupby keys)
                    self.win[key][2].update(
                        None if (isinstance(u, float) and u != u) else u
                        for u in us_keys.tolist())

            if p.window_hll_p is not None:
                # bounded-state distinct: hash the batch's keys ONCE,
                # then scatter-max into each touched window's registers
                # (one Python call per unique (group, window) per batch
                # — the same granularity as every loop above)
                from gush_ray.stages.sketches import hll_idx_rank

                idx_a, rank_a = hll_idx_rank(keys_arr, p.window_hll_p)
                m_regs = 1 << p.window_hll_p
                for key, rows in acc_df.groupby(
                    [f"g{i}" for i in range(len(gcols))] + ["w"],
                    sort=False, dropna=False,
                ).indices.items():
                    if not isinstance(key, tuple):
                        key = (key,)
                    key = tuple(
                        None if (isinstance(v, float) and v != v) else v
                        for v in key
                    )
                    reg = self.winh.get(key)
                    if reg is None:
                        reg = self.winh[key] = np.zeros(m_regs,
                                                        dtype=np.uint8)
                    np.maximum.at(reg, idx_a[rows], rank_a[rows])
                    self._winh_dirty.add(key)

            if p.window_quantiles is not None:
                if p.quantile_sketch_k is not None:
                    # sketch mode: bucketize BEFORE the groupby — the
                    # histogram then holds at most O(octaves × k) keys
                    # per open window whatever the value cardinality
                    acc_df = acc_df.assign(v=_sketch_rep(
                        acc_df["v"].to_numpy(dtype=np.float64),
                        p.quantile_sketch_k))
                # per-(group, window) exact value HISTOGRAMS: one
                # groupby on (groups, window, value) makes the dict
                # work proportional to the batch's UNIQUE values per
                # window, not its row count
                hq = acc_df.groupby(
                    [f"g{i}" for i in range(len(gcols))] + ["w", "v"],
                    sort=False, dropna=False).size()
                for key, cnt in zip(hq.index.tolist(),
                                    hq.to_numpy().tolist()):
                    *gk, w_, v = key
                    # NaN/None values are EXCLUDED from the order
                    # statistics (DuckDB quantile_disc ignores NULLs —
                    # the oracle-parity contract); the count/sum slots
                    # above still see the row
                    if v is None or (isinstance(v, float) and v != v):
                        continue
                    gk = tuple(
                        None if (isinstance(x, float) and x != x) else x
                        for x in gk
                    ) + (w_,)
                    hist = self.winq.setdefault(gk, {})
                    hist[float(v)] = hist.get(float(v), 0) + int(cnt)
                    self._winq_dirty.add(gk)

        n_refire_dropped = 0
        n_lateok = 0
        if lateok_pos is not None and len(lateok_pos):
            # COLD path by contract (late data is the exception): build
            # the small pandas frame _accumulate_refire expects from the
            # accepted-late positions only
            n_lateok = len(lateok_pos)
            want = list(dict.fromkeys(
                [p.key_col, p.ts_col, *p.window_group_cols]
                + ([p.value_col] if p.value_col else [])))
            have = [c for c in want if c in table.column_names]
            ldf = table.select(have).take(pa.array(lateok_pos)).to_pandas()
            lkc = ldf[p.key_col]
            if lkc.dtype.kind == "f" and lkc.isna().any():
                ldf[p.key_col] = lkc.astype(object).where(
                    lkc.notna(), None)
            n_refire_dropped = self._accumulate_refire(ldf)
        tt["p_win"] = time.perf_counter() - t0
        t0 = time.perf_counter()

        # W4 sessions: within-batch gap split, then merge with open
        # state. The frame is assembled from the already-computed arrays
        # (key objects by run fan-out, int64 ts) in (key, ts) order — no
        # Arrow conversion
        sess_cols = {p.key_col: key_rows, p.ts_col: ts_s}
        if p.session_values:
            sess_cols[p.value_col] = (val_base if val_base is not None
                                      else np.empty(0))
        closed_sessions = self._update_sessions(pd.DataFrame(sess_cols))
        tt["p_sess"] = time.perf_counter() - t0
        t0 = time.perf_counter()

        # C3 NFA over the change rows
        if self.nfa is not None:
            if any(s.predicate is not None for s in p.pattern.steps):
                # custom predicates may touch any column (rare,
                # documented fallback): convert everything
                ndf = table.take(pa.array(pos)).to_pandas()
                ndf[p.key_col] = key_rows
            else:
                need = {s.column for s in p.pattern.steps
                        if s.column is not None}
                idc = p.pattern.id_col
                if idc is not None:
                    need.add(idc)
                need -= {p.key_col, p.ts_col, "version", "change_kind"}
                ndf = pd.DataFrame({p.key_col: key_rows,
                                    p.ts_col: ts_s})
                for c in sorted(need):
                    ndf[c] = col_rows(c)
            ndf["version"] = version
            if "change_kind" not in ndf.columns:
                ndf["change_kind"] = ck_rows
            matches = self.nfa.process_sorted(ndf)  # stable schema even empty
        else:
            matches = pd.DataFrame()
        tt["p_nfa"] = time.perf_counter() - t0
        t0 = time.perf_counter()

        # output tables: FILTER the original Arrow table by survival mask
        # (sequential scan — a scattered take() of the sort permutation
        # over a ~250-chunk string-heavy table measured 2-10x slower),
        # then scatter the computed change columns back to original row
        # order. Output order is per-partition arbitrary by contract; the
        # sink streams are order-insensitive sets.
        ver_scatter = np.empty(n_in, dtype=np.int64)
        ver_scatter[pos] = version
        keep_mask = np.zeros(n_in, dtype=bool)
        keep_mask[pos] = True
        changes_t = table.filter(pa.array(keep_mask))
        ver_out = ver_scatter[keep_mask]
        changes_t = changes_t.append_column(
            "version", pa.array(ver_out, type=pa.int64())
        )
        changes_t = changes_t.append_column(
            "change_kind",
            pa.array(np.where(ver_out == 0, "insert", "update"),
                     type=pa.string()),
        )
        late_mask_full = np.zeros(n_in, dtype=bool)
        late_mask_full[late_pos] = True
        late_t = table.filter(pa.array(late_mask_full))
        n_inserts = int((version == 0).sum())
        out = {
            "changes": changes_t,
            "late": late_t,
            "matches": pa.Table.from_pandas(matches, preserve_index=False),
            "sessions_closed": closed_sessions,
            "metrics": {
                "rows_in": n_in,
                "replays_dropped": n_replay,
                "stale_dropped": n_stale,
                "late_rows": int(len(late_pos)),
                "inserts": n_inserts,
                "updates": int(nk - n_inserts),
                "matches": int(len(matches)),
                # cumulative runs dropped by the max_partials cap (0 means
                # the all-runs/SQL-self-join semantics are exact so far)
                "nfa_truncated": int(self.nfa.truncated) if self.nfa else 0,
                # cumulative dedup keys dropped by the state TTL (0 when
                # dedup_ttl_us is unset — version counters never reset)
                "ttl_evicted": int(self.evicted_total),
                # open slots whose EXACT state (distinct key set / value
                # histogram) exceeds exact_state_warn_keys — nonzero
                # means this workload wants the at-scale sketch profile
                "exact_state_oversized": self._count_oversized_exact(),
                # window_refire mode: sub-watermark rows accepted into a
                # still-alive window (they are in NO other stream), and
                # (row, window) replicas dropped because that one window
                # was expired even though a sibling window was alive
                "window_late_accepted": int(n_lateok),
                "refire_expired_replicas": n_refire_dropped,
                "max_ts_us": self.max_ts_us,
            },
        }
        tt["p_arrow"] = time.perf_counter() - t0
        out["metrics"].update({k: round(v, 3) for k, v in tt.items()})
        return out

    @staticmethod
    def cap_cutoff_ts(ts_values, n: int, cap: int, wm: int) -> "int | None":
        """Eviction cutoff for a keys-ever map over its cap: the ts
        below which entries are evicted so ~90% of the cap remains
        (hysteresis — the O(n) scan then runs once per cap/10 new keys,
        not every epoch at the boundary), clamped to the watermark so
        only sub-watermark entries — the ones the dedup safety argument
        covers — are ever candidates. Deterministic: a pure function of
        the entry timestamps. None = nothing to do."""
        if cap is None or n <= cap or wm <= NEG_INF:
            return None
        vals = np.fromiter(ts_values, dtype=np.int64, count=n)
        excess = n - int(cap * 0.9)
        # the excess-th smallest ts: evicting everything strictly below
        # (kth+1) removes at least `excess` entries (ties evict a few
        # more — fine, deterministic)
        kth = int(np.partition(vals, excess - 1)[excess - 1])
        return min(kth + 1, wm)

    def _enforce_state_cap(self, wm: int) -> None:
        """Capacity-wall auto-escalation (StateParams.state_keys_cap):
        bound every keys-EVER map — dedup last_ts/version, near-dup
        bucket owners, frontier seen — by oldest-first eviction once it
        crosses the cap. Cleared-state semantics identical to the TTL
        sweep above (evicted key restarts at version 0 / re-discovery);
        eviction bookkeeping rides the same delta-frame tombstone
        protocol. Engagement is recorded (manifest `state_cap_engaged`)
        and logged once per partition lifetime."""
        cap = self.p.state_keys_cap
        if cap is None:
            return
        # the cap is the NO-CONFIG safety net: a section the user
        # already bounded with an explicit event-time TTL is their
        # deliberate sizing decision — capping it too would silently
        # shrink a deliberately-sized horizon (found by the round-5
        # ops drill: the default cap halved the TTL-bounded near-dup
        # hit counts of the headroom corpus)
        if self.p.dedup_ttl_us is None:
            cut = self.cap_cutoff_ts(self.last_ts.values(),
                                     len(self.last_ts), cap, wm)
            if cut is not None:
                expired = [k for k, t in self.last_ts.items() if t < cut]
                for k in expired:
                    del self.last_ts[k]
                    self.version.pop(k, None)
                    self._dirty.discard(k)
                self._evicted.update(expired)
                self.evicted_total += len(expired)
                self._note_cap_engaged("dedup", len(expired))
        if self.neardup is not None and self.neardup.spec.ttl_us is None:
            n = self.neardup.cap(cap, wm)
            if n:
                self._note_cap_engaged("neardup", n)
        if self.frontier is not None and self.frontier.spec.ttl_us is None:
            n = self.frontier.cap(cap, wm)
            if n:
                self._note_cap_engaged("frontier", n)

    def _note_cap_engaged(self, section: str, evicted: int) -> None:
        if self.state_cap_engaged:
            return
        self.state_cap_engaged = True
        import logging

        logging.getLogger("gush_ray").warning(
            "partition %d: %s keys-ever state crossed "
            "state_keys_cap=%d — bounded-state mode ENGAGED (oldest "
            "sub-watermark entries evict with cleared-state semantics, "
            "%d evicted now; the switch is recorded in every "
            "subsequent epoch manifest as state_cap_engaged). To keep "
            "exact keys-ever semantics raise state_keys_budget / "
            "state_keys_cap or set an explicit dedup_ttl_us sized to "
            "the stream's horizon.",
            self.pid, section, self.p.state_keys_cap, evicted)

    def _count_oversized_exact(self) -> int:
        """Open slots whose exact state outgrew
        ``exact_state_warn_keys`` (window_distinct key sets + exact-mode
        window_quantiles histograms). O(open slots) per epoch — the
        scan only runs when an unbounded-state exact mode is active,
        and an epoch with many open slots is precisely the situation
        the telemetry exists to surface. Logs ONE warning per partition
        lifetime pointing at the at-scale profile."""
        p = self.p
        bound = p.exact_state_warn_keys
        n = 0
        if p.window_distinct:
            n += sum(1 for s in self.win.values() if len(s[2]) > bound)
        if p.window_quantiles is not None and p.quantile_sketch_k is None:
            n += sum(1 for h in self.winq.values() if len(h) > bound)
        if n and not self._oversized_warned:
            self._oversized_warned = True
            import logging

            logging.getLogger("gush_ray").warning(
                "partition %d: %d open window slot(s) exceed %d exact "
                "state entries — on an unbounded key/value domain use "
                "the at-scale profile (StreamingJob(at_scale=True) / "
                "run_job --at-scale), which flips to the bounded-state "
                "sketch modes (window_hll_p / quantile_sketch_k)",
                self.pid, n, bound)
        return n

    def _accumulate_refire(self, df: pd.DataFrame) -> int:
        """window_refire mode: fold late-but-accepted rows into their
        windows. Each (row, window) replica lands in the window's OPEN
        accumulator (end still ahead of the watermark — the row is
        merely sub-watermark, the window never fired), or in its FIRED
        accumulator (end passed, end + lateness hasn't), marking that
        window for a retraction pair at this epoch's
        :meth:`advance_watermark`. Replicas whose own window is expired
        are dropped (returned for metrics) — possible only with sliding
        windows, where a row can straddle expired and alive windows.

        Cold path by design: late data is the exception, so a per-group
        Python loop here is fine (the on-time accumulation loop above is
        the hot one)."""
        p = self.p
        missing = [c for c in p.window_group_cols if c not in df.columns]
        if missing:
            raise ValueError(
                "window_refire needs window_group_cols present on the "
                f"input stream; {missing} are derived post-dedup "
                "(change_kind/version) and unavailable for late rows"
            )
        us = df[p.ts_col].to_numpy().astype("int64")
        gcols = [df[c].to_numpy() for c in p.window_group_cols]
        val = (df[p.value_col].to_numpy()
               if p.value_col else np.ones(len(df)))
        keys_arr = (df[p.key_col].to_numpy()
                    if p.window_distinct or p.window_hll_p is not None
                    else None)
        slide = p.window_slide_us or p.window_size_us
        if p.window_slide_us:
            k = p.window_size_us // p.window_slide_us
            base = us // p.window_slide_us
            rep = np.repeat(np.arange(len(df)), k)
            offs = np.tile(np.arange(k, dtype=np.int64), len(df))
            wid = base[rep] - offs
            gcols = [g[rep] for g in gcols]
            val = val[rep]
            if keys_arr is not None:
                keys_arr = keys_arr[rep]
        else:
            wid = us // p.window_size_us
        w_end = wid * slide + p.window_size_us
        alive = w_end + p.allowed_lateness_us > self.watermark_us
        n_dropped = int((~alive).sum())
        if not alive.any():
            return n_dropped
        is_open = alive & (w_end > self.watermark_us)
        acc_df = pd.DataFrame(
            {f"g{i}": g[alive] for i, g in enumerate(gcols)} | {
                "w": wid[alive], "v": val[alive],
                "o": is_open[alive]}
        )
        if keys_arr is not None:
            acc_df["u"] = keys_arr[alive]
        grouped = acc_df.groupby(
            [f"g{i}" for i in range(len(gcols))] + ["w", "o"], sort=False,
            dropna=False,
        )
        for gk, sub in grouped:
            *key, open_flag = gk
            key = tuple(
                None if (isinstance(v, float) and v != v) else v
                for v in key
            )
            cnt = int(len(sub))
            s = float(sub["v"].sum())
            if open_flag:
                slot = self.win.setdefault(
                    key,
                    [0, 0.0, set()] if p.window_distinct else [0, 0.0])
                self._win_dirty.add(key)
                if p.window_hll_p is not None:
                    # late-but-accepted keys of a STILL-OPEN window join
                    # its HLL registers (they haven't been emitted yet);
                    # fired windows below cannot — their registers were
                    # emitted at close and are gone, so the window_hll
                    # estimate is a pure function of the window's ON-TIME
                    # + open-accepted key set only. Refired count/sum
                    # corrections ride window_updates; the HLL row does
                    # not re-fire (documented exclusion).
                    from gush_ray.stages.sketches import hll_idx_rank

                    reg = self.winh.get(key)
                    if reg is None:
                        reg = self.winh[key] = np.zeros(
                            1 << p.window_hll_p, dtype=np.uint8)
                    li, lr = hll_idx_rank(
                        sub["u"].to_numpy(), p.window_hll_p)
                    np.maximum.at(reg, li, lr)
                    self._winh_dirty.add(key)
            else:
                slot = self.fired.setdefault(
                    key,
                    [0, 0.0, set() if p.window_distinct else None,
                     0, 0.0, 0, 0])
                self._refire_pending.add(key)
                self._fired_dirty.add(key)
            slot[0] += cnt
            slot[1] += s
            if p.window_distinct:
                slot[2].update(
                    None if (isinstance(u, float) and u != u) else u
                    for u in sub["u"].tolist())
        return n_dropped

    def _update_sessions(self, df: pd.DataFrame) -> pa.Table:
        """Vectorized session merge: within-batch gap split, then merge
        each key's FIRST batch session with its stored open session and
        keep its LAST batch session open (a per-key iterrows loop here was
        the reduce-phase bottleneck at scale)."""
        p = self.p
        if not len(df):
            return _sessions_table([], p.key_col,
                                   values=p.session_values)
        kc = df[p.key_col]
        if kc.dtype.kind == "f" and kc.isna().any():
            # float-NaN keys break segmentation: NaN != NaN makes
            # ne(shift) split EVERY NaN row into its own session (each
            # merging against the same stored session, double-counting)
            # and the sessions dict accrues unmergeable float-nan keys
            # (round-3 review finding). Object-dtype None compares
            # equal-to-itself under ne(), so normalize up front; the
            # object path below then handles it like any null key.
            df = df.copy()
            df[p.key_col] = kc.astype(object).where(kc.notna(), None)
        us = df[p.ts_col].astype("int64")
        new_key = df[p.key_col].ne(df[p.key_col].shift())
        gap_break = us.diff() > p.session_gap_us
        sid = (new_key | gap_break).cumsum()
        sv = p.session_values
        gb = df.assign(__us=us, __sid=sid).groupby(
            [p.key_col, "__sid"], sort=False, dropna=False)
        per = gb["__us"].agg(["min", "max", "size"]).reset_index()
        if sv:
            # per-session value aggregates in the same grouped pass;
            # pandas skips NaN (the oracle's NULL rule) — an all-NaN
            # session sums to 0.0 with NaN min/max
            vagg = gb[p.value_col].agg(["sum", "min", "max"])
            per[["__vs", "__vmin", "__vmax"]] = vagg.to_numpy()
        pk = per[p.key_col]
        if pk.dtype.kind == "f" and pk.isna().any():
            # groupby COERCES an object key of numeric values back to
            # float64 (None -> nan), so the normalization above must
            # re-apply to the grouped keys too or the first/last masks
            # split nan groups and the dict accrues nan keys
            per = per.copy()
            per[p.key_col] = pk.astype(object).where(pk.notna(), None)
        keys = per[p.key_col].to_numpy()
        if keys.dtype == object:
            # normalize NaN keys to None (see window-accumulator note) —
            # vectorized detection first: the common all-present case must
            # not pay a per-key Python pass (this runs once per session
            # row per reduce batch, measurably hot on the flagship path)
            na = pd.isna(keys)
            if na.any():
                keys = keys.copy()
                keys[na] = None
        mins = per["min"].to_numpy().astype(np.int64)
        maxs = per["max"].to_numpy().astype(np.int64)
        sizes = per["size"].to_numpy().astype(np.int64)
        if sv:
            vsums = per["__vs"].to_numpy(dtype=np.float64)
            vmins = per["__vmin"].to_numpy(dtype=np.float64)
            vmaxs = per["__vmax"].to_numpy(dtype=np.float64)
        first_mask = per[p.key_col].ne(per[p.key_col].shift()).to_numpy()
        last_mask = per[p.key_col].ne(per[p.key_col].shift(-1)).to_numpy()
        # ne() treats a NULL key as equal to shift()'s NaN fill, so a
        # null-key group at either END of the batch got neither mask —
        # its open session silently vanished (found extending the
        # round-3 float-NaN review finding). The fill rows are
        # boundaries by definition.
        first_mask[0] = True
        last_mask[-1] = True

        stored = [self.sessions.get(k) for k in keys[first_mask]]
        has_prev = np.array([s is not None for s in stored], dtype=bool)
        prev_start = np.array(
            [s[0] if s is not None else 0 for s in stored], dtype=np.int64
        )
        prev_last = np.array(
            [s[1] if s is not None else 0 for s in stored], dtype=np.int64
        )
        prev_n = np.array(
            [s[2] if s is not None else 0 for s in stored], dtype=np.int64
        )
        if sv:
            # pre-flag stored slots (restored 3-element sessions) have
            # neutral value state: sum 0, min/max None -> NaN (fmin/fmax
            # then ignore them, the documented rollback rule)
            def _vp(s, i, dflt):
                if s is None or len(s) < 6 or s[i] is None:
                    return dflt
                return s[i]
            prev_vsum = np.array([_vp(s, 3, 0.0) for s in stored],
                                 dtype=np.float64)
            prev_vmin = np.array([_vp(s, 4, np.nan) for s in stored],
                                 dtype=np.float64)
            prev_vmax = np.array([_vp(s, 5, np.nan) for s in stored],
                                 dtype=np.float64)
        merge_ok = has_prev & (
            mins[first_mask] - prev_last <= p.session_gap_us
        )

        # sessions extended by a merge take over the stored start/count
        adj_start = mins.copy()
        adj_n = sizes.copy()
        fm_idx = np.nonzero(first_mask)[0]
        merged_idx = fm_idx[merge_ok]
        adj_start[merged_idx] = prev_start[merge_ok]
        adj_n[merged_idx] += prev_n[merge_ok]
        if sv:
            adj_vs = vsums.copy()
            adj_vmin = vmins.copy()
            adj_vmax = vmaxs.copy()
            adj_vs[merged_idx] += prev_vsum[merge_ok]
            # fmin/fmax: NaN means "no values yet" on either side
            adj_vmin[merged_idx] = np.fmin(adj_vmin[merged_idx],
                                           prev_vmin[merge_ok])
            adj_vmax[merged_idx] = np.fmax(adj_vmax[merged_idx],
                                           prev_vmax[merge_ok])

        def _rows(ks, ss, es, ns, vs=None, vlo=None, vhi=None):
            if not sv:
                return [(k, int(s), int(e), int(n))
                        for k, s, e, n in zip(ks, ss, es, ns)]
            return [
                (k, int(s), int(e), int(n), float(a),
                 None if b != b else float(b),
                 None if c != c else float(c))
                for k, s, e, n, a, b, c
                in zip(ks, ss, es, ns, vs, vlo, vhi)
            ]

        closed: list[tuple] = []
        # (a) stored sessions whose gap to the new first session broke
        broke = has_prev & ~merge_ok
        closed.extend(_rows(
            keys[first_mask][broke], prev_start[broke],
            prev_last[broke], prev_n[broke],
            *((prev_vsum[broke], prev_vmin[broke], prev_vmax[broke])
              if sv else ())
        ))
        # (b) batch sessions closed by a later in-batch session of same key
        nb = ~last_mask
        closed.extend(_rows(
            keys[nb], adj_start[nb], maxs[nb], adj_n[nb],
            *((adj_vs[nb], adj_vmin[nb], adj_vmax[nb]) if sv else ())
        ))
        # keep the last session of each key open
        if sv:
            vals = zip(adj_start[last_mask].tolist(),
                       maxs[last_mask].tolist(),
                       adj_n[last_mask].tolist(),
                       adj_vs[last_mask].tolist(),
                       adj_vmin[last_mask].tolist(),
                       adj_vmax[last_mask].tolist())
        else:
            vals = zip(adj_start[last_mask].tolist(),
                       maxs[last_mask].tolist(),
                       adj_n[last_mask].tolist())
        open_upd = dict(zip(keys[last_mask], vals))
        self.sessions.update(open_upd)
        self._sess_dirty.update(open_upd)
        return _sessions_table(closed, p.key_col, values=sv)

    # ------------------------------------------------------- watermark

    def advance_watermark(self, watermark_us: int) -> dict:
        """Monotone advance; emits windows whose end <= wm and sessions
        whose (last + gap) < wm; prunes expired NFA partials (W5).

        window_refire mode: the watermark is NOT held back by the
        allowed lateness — windows fire on time, their accumulators move
        to ``self.fired`` until end + lateness passes, and the
        ``window_updates`` changelog receives the initial firing (+1)
        plus a retraction pair (-1 old, +1 new) for every fired window
        touched by late-accepted rows this epoch."""
        if self.p.window_refire:
            wm = max(self.watermark_us, watermark_us)
        else:
            wm = max(self.watermark_us,
                     watermark_us - self.p.allowed_lateness_us)
        self.watermark_us = wm

        ttl = self.p.dedup_ttl_us
        if (ttl is not None and wm > NEG_INF
                and wm - self._ttl_sweep_wm >= max(ttl // 8, 1)):
            cutoff = wm - ttl
            expired = [k for k, t in self.last_ts.items() if t < cutoff]
            for k in expired:
                del self.last_ts[k]
                self.version.pop(k, None)
                self._dirty.discard(k)
            self._evicted.update(expired)
            self.evicted_total += len(expired)
            self._ttl_sweep_wm = wm

        self._enforce_state_cap(wm)

        slide = self.p.window_slide_us or self.p.window_size_us
        refire = self.p.window_refire
        win_rows = []
        upd_rows = []
        hist_rows = []
        hll_rows = []
        early_rows = []
        for key, val in list(self.win.items()):
            *groups, wid = key if isinstance(key, tuple) else (key,)
            w_end = wid * slide + self.p.window_size_us
            if w_end <= wm:
                nd = (len(val[2]) if len(val) > 2 else 0)
                row = (*groups, wid, val[0], val[1])
                if self.p.window_distinct:
                    row += (nd,)
                win_rows.append(row)
                del self.win[key]
                self._win_closed.add(key)
                self._win_dirty.discard(key)
                if self.p.window_quantiles is not None:
                    # the window's exact value histogram leaves with it
                    # (one row per DISTINCT value — the stage-2 merge
                    # task sums these per-partition partials, which is
                    # exact: histograms are additive across partitions)
                    hist = self.winq.pop(key, None)
                    if hist:
                        hist_rows.extend(
                            (*groups, wid, v, c) for v, c in hist.items())
                    self._winq_closed.add(key)
                    self._winq_dirty.discard(key)
                if self.p.window_hll_p is not None:
                    # register PARTIAL leaves with the window; the
                    # stage-2 task maxes partials across partitions
                    # (elementwise max is the exact HLL merge)
                    reg = self.winh.pop(key, None)
                    if reg is not None:
                        hll_rows.append((*groups, wid, reg.tobytes()))
                    self._winh_closed.add(key)
                    self._winh_dirty.discard(key)
                if self.p.window_early_fire:
                    # closing emission: retract the last early partial
                    # and emit the final one, so the changelog fold
                    # equals the `windows` stream after close
                    prevE = self.wearly.pop(key, None)
                    seqE = 0
                    if prevE is not None:
                        early_rows.append((*groups, wid, -1, prevE[0],
                                           prevE[1], prevE[2], prevE[3]))
                        seqE = prevE[3] + 1
                    early_rows.append((*groups, wid, 1, val[0], val[1],
                                       nd, seqE))
                    self._wearly_closed.add(key)
                    self._wearly_dirty.discard(key)
                if refire:
                    # initial firing rides the changelog too, so folding
                    # it yields final totals with no join back to the
                    # windows stream
                    upd_rows.append((*groups, wid, 1, val[0], val[1],
                                     nd, 0))
                    if w_end + self.p.allowed_lateness_us > wm:
                        self.fired[key] = [
                            val[0], val[1],
                            (val[2] if len(val) > 2 else None),
                            val[0], val[1], nd, 1,
                        ]
                        self._fired_dirty.add(key)
                    # else: already expired at fire time — no late row
                    # can ever pass the acceptance check for it, so
                    # retaining the accumulator would only leak state

        if refire and self._refire_pending:
            for key in list(self._refire_pending):
                slot = self.fired.get(key)
                if slot is None:
                    continue
                *groups, wid = key if isinstance(key, tuple) else (key,)
                n_, s_, kset, em_n, em_sum, em_nd, seq = slot
                nd = (len(kset)
                      if self.p.window_distinct and kset is not None
                      else 0)
                if seq > 0:
                    # retract the previous emission before the update;
                    # a window whose slot was created by a late row
                    # (never fired with data) has nothing to retract
                    upd_rows.append((*groups, wid, -1, em_n, em_sum,
                                     em_nd, seq))
                upd_rows.append((*groups, wid, 1, n_, s_, nd, seq))
                slot[3], slot[4], slot[5], slot[6] = n_, s_, nd, seq + 1
                self._fired_dirty.add(key)
            self._refire_pending = set()

        if refire and self.fired:
            for key in list(self.fired):
                *groups, wid = key if isinstance(key, tuple) else (key,)
                if wid * slide + self.p.window_size_us \
                        + self.p.allowed_lateness_us <= wm:
                    del self.fired[key]
                    self._fired_closed.add(key)
                    self._fired_dirty.discard(key)

        if self.p.window_early_fire:
            # speculative per-epoch trigger: every OPEN window touched
            # since the last snapshot (= this epoch; snapshots are
            # per-epoch) re-emits its current partial as a retraction
            # pair. Replay-deterministic: a replayed epoch restores the
            # pre-epoch snapshot (empty dirty set), re-ingests the same
            # rows, and reproduces the identical dirty set.
            for key in list(self._win_dirty):
                slot = self.win.get(key)
                if slot is None:
                    continue
                *groups, wid = key if isinstance(key, tuple) else (key,)
                nd = (len(slot[2]) if len(slot) > 2 else 0)
                prevE = self.wearly.get(key)
                seqE = 0
                if prevE is not None:
                    if (prevE[0], prevE[1], prevE[2]) == (slot[0],
                                                          slot[1], nd):
                        continue  # dirty but value-unchanged: no churn
                    early_rows.append((*groups, wid, -1, prevE[0],
                                       prevE[1], prevE[2], prevE[3]))
                    seqE = prevE[3] + 1
                early_rows.append((*groups, wid, 1, slot[0],
                                   float(slot[1]), nd, seqE))
                self.wearly[key] = [slot[0], float(slot[1]), nd, seqE]
                self._wearly_dirty.add(key)

        sess_rows = []
        for key, slot in list(self.sessions.items()):
            s, e, n = slot[0], slot[1], slot[2]
            if e + self.p.session_gap_us < wm:
                if self.p.session_values:
                    # pre-flag 3-element slots close with neutral value
                    # state (rollback rule); NaN min/max -> None (NULL)
                    vs, lo, hi = (tuple(slot[3:6]) if len(slot) >= 6
                                  else (0.0, None, None))
                    sess_rows.append((
                        key, s, e, n, float(vs),
                        None if (lo is None or lo != lo) else float(lo),
                        None if (hi is None or hi != hi) else float(hi)))
                else:
                    sess_rows.append((key, s, e, n))
                del self.sessions[key]
                self._sess_closed.add(key)
                self._sess_dirty.discard(key)

        if self.nfa is not None and wm > NEG_INF:
            self.nfa.prune(wm)
        if self.neardup is not None:
            self.neardup.prune(wm)
        if self.frontier is not None:
            self.frontier.prune(wm)
        drained_pairs = None
        if self.joiner is not None:
            if self.p.join_spec.mode == "asof":
                # temporal join: rights below the watermark have FINAL
                # left histories — emit their pairs now (and prune the
                # left history to latest-per-key<=wm + future rows).
                # Called even at wm=NEG_INF so every epoch's reduce has
                # a (possibly empty) part to write — schema stability.
                drained_pairs = self.joiner.drain_asof(wm)
            elif wm > NEG_INF:
                self.joiner.prune(wm)

        out = {
            "windows": _windows_table(
                win_rows, self.p.window_group_cols, self.p.value_col,
                distinct=self.p.window_distinct,
            ),
            "window_updates": _window_updates_table(
                upd_rows, self.p.window_group_cols,
                distinct=self.p.window_distinct,
            ),
            "sessions": _sessions_table(sess_rows, self.p.key_col,
                                        values=self.p.session_values),
            "watermark_us": wm,
            "state_cap_engaged": int(self.state_cap_engaged),
        }
        if self.p.window_quantiles is not None:
            out["window_hist"] = _window_hist_table(
                hist_rows, self.p.window_group_cols)
        if self.p.window_hll_p is not None:
            out["window_hll_parts"] = _window_hll_table(
                hll_rows, self.p.window_group_cols)
        if self.p.window_early_fire:
            out["window_early"] = _window_updates_table(
                early_rows, self.p.window_group_cols,
                distinct=self.p.window_distinct)
        if drained_pairs is not None:
            out["joined"] = pa.Table.from_pandas(
                drained_pairs, preserve_index=False)
        return out

    # -------------------------------------------------------- lifecycle

    def commit_epoch(self, epoch: int) -> None:
        self._epoch_cache = {
            e: v for e, v in self._epoch_cache.items() if e > epoch
        }

    _SNAP_MAGIC = b"GZS1"   # zstd-compressed FULL snapshot frame
    _DELTA_MAGIC = b"GZD1"  # zstd-compressed DELTA frame (header carries
    #                         the chain's base epoch, readable without
    #                         decompressing the payload)

    def _small_state(self) -> dict:
        """The watermark-bounded state sections, in FULL — what a GZS1
        base frame carries. Building a full frame resets the keyed
        delta tracking (the frame IS the new chain baseline)."""
        st = {
            "win": self.win,
            "winq": self.winq,
            "winh": self.winh,
            "wearly": self.wearly,
            "fired": self.fired,
            "sessions": self.sessions,
            "nfa": self.nfa.state() if self.nfa else None,
            "neardup": self.neardup.state() if self.neardup else None,
            "frontier": self.frontier.state() if self.frontier else None,
            "join": self.joiner.state() if self.joiner else None,
            "watermark_us": self.watermark_us,
            "max_ts_us": self.max_ts_us,
            "ttl_sweep_wm": self._ttl_sweep_wm,
            "evicted_total": self.evicted_total,
            "cap_engaged": self.state_cap_engaged,
        }
        self._win_dirty = set()
        self._win_closed = set()
        self._winq_dirty = set()
        self._winq_closed = set()
        self._winh_dirty = set()
        self._winh_closed = set()
        self._wearly_dirty = set()
        self._wearly_closed = set()
        self._fired_dirty = set()
        self._fired_closed = set()
        self._sess_dirty = set()
        self._sess_closed = set()
        return st

    def _small_delta_state(self) -> dict:
        """The keyed small sections as upserts+tombstones since the last
        frame. Open windows/sessions are watermark-bounded in TIME, but
        their key population is the ACTIVE-horizon set — with a 30-min
        gap and 10-s epochs that is ~180x the per-epoch touched set, so
        carrying them full in every delta re-pickled the whole horizon.
        NFA partials delta the same way (stages/nfa.py state_delta).
        Join buffers stay FULL per frame: they are DataFrames bounded by
        the join window's TIME span (rows outside it are pruned), not by
        the key population, so their steady-state size is already
        epoch-scale; a key would need row-level tracking to delta."""
        st = {
            "win_upserts": {k: self.win[k] for k in self._win_dirty
                            if k in self.win},
            "win_tombstones": [k for k in self._win_closed
                               if k not in self.win],
            # full histogram per dirty window (not per-value deltas) —
            # same upsert granularity as the win slots above
            "winq_upserts": {k: self.winq[k] for k in self._winq_dirty
                             if k in self.winq},
            "winq_tombstones": [k for k in self._winq_closed
                                if k not in self.winq],
            "winh_upserts": {k: self.winh[k] for k in self._winh_dirty
                             if k in self.winh},
            "winh_tombstones": [k for k in self._winh_closed
                                if k not in self.winh],
            "wearly_upserts": {k: self.wearly[k]
                               for k in self._wearly_dirty
                               if k in self.wearly},
            "wearly_tombstones": [k for k in self._wearly_closed
                                  if k not in self.wearly],
            "fired_upserts": {k: self.fired[k] for k in self._fired_dirty
                              if k in self.fired},
            "fired_tombstones": [k for k in self._fired_closed
                                 if k not in self.fired],
            "sess_upserts": {k: self.sessions[k] for k in self._sess_dirty
                             if k in self.sessions},
            "sess_tombstones": [k for k in self._sess_closed
                                if k not in self.sessions],
            "nfa_delta": self.nfa.state_delta() if self.nfa else None,
            "neardup_delta": (self.neardup.state_delta()
                              if self.neardup else None),
            "frontier_delta": (self.frontier.state_delta()
                               if self.frontier else None),
            "join": self.joiner.state() if self.joiner else None,
            "watermark_us": self.watermark_us,
            "max_ts_us": self.max_ts_us,
            "ttl_sweep_wm": self._ttl_sweep_wm,
            "evicted_total": self.evicted_total,
            "cap_engaged": self.state_cap_engaged,
        }
        self._win_dirty = set()
        self._win_closed = set()
        self._winq_dirty = set()
        self._winq_closed = set()
        self._winh_dirty = set()
        self._winh_closed = set()
        self._wearly_dirty = set()
        self._wearly_closed = set()
        self._fired_dirty = set()
        self._fired_closed = set()
        self._sess_dirty = set()
        self._sess_closed = set()
        return st

    @staticmethod
    def _compress(raw: bytes, magic: bytes, head: bytes = b"") -> bytes:
        # zstd-1 the pickle: snapshots are the second-largest write of
        # every epoch (url-keyed dicts compress ~3x) and all partitions
        # flush them concurrently
        import struct

        comp = pa.Codec("zstd", compression_level=1).compress(raw)
        return (magic + head + struct.pack("<Q", len(raw))
                + comp.to_pybytes())

    def snapshot_bytes(self) -> bytes:
        raw = pickle.dumps(
            {"last_ts": self.last_ts, "version": self.version}
            | self._small_state()
        )
        self._dirty = set()
        self._evicted = set()  # a full frame carries the whole state
        return self._compress(raw, self._SNAP_MAGIC)

    def delta_bytes(self, base_epoch: int) -> bytes:
        """An incremental frame: upserts+tombstones for keys touched
        since the last frame, in every keyed section (dedup dicts, open
        windows, open sessions, NFA partials) + the time-bounded join
        buffers in full. Restoring epoch e means applying the FULL frame
        at ``base_epoch`` then every delta up to e in order (see
        :func:`snapshot_base_epoch` for chain walking)."""
        import struct

        dirty = self._dirty
        raw = pickle.dumps(
            {
                "dedup_last_ts": {k: self.last_ts[k] for k in dirty},
                "dedup_version": {k: self.version[k] for k in dirty},
                # evicted-and-not-reinserted keys: a reinsertion lands in
                # _dirty (upsert wins), so a key still absent from the
                # live dict is a true delete
                "dedup_tombstones": [k for k in self._evicted
                                     if k not in self.last_ts],
            }
            | self._small_delta_state()
        )
        self._dirty = set()
        self._evicted = set()
        return self._compress(raw, self._DELTA_MAGIC,
                              head=struct.pack("<Q", base_epoch))

    def _decode(self, blob: bytes) -> dict:
        import struct

        if blob[:4] == self._SNAP_MAGIC:
            (rawlen,) = struct.unpack("<Q", blob[4:12])
            blob = pa.Codec("zstd").decompress(
                blob[12:], decompressed_size=rawlen
            )
        elif blob[:4] == self._DELTA_MAGIC:
            (rawlen,) = struct.unpack("<Q", blob[12:20])
            blob = pa.Codec("zstd").decompress(
                blob[20:], decompressed_size=rawlen
            )
        return pickle.loads(blob)

    def _apply_join_and_scalars(self, st: dict) -> None:
        if self.joiner is not None:
            # a restore is a ROLLBACK: when the frame carries no section
            # for a configured component (written before the join_spec
            # existed), the live buffers must still reset — keeping them
            # would let post-snapshot join buffers survive the rollback
            # and replay epochs against already-advanced state
            # (round-3 review finding)
            if st.get("join") is not None:
                self.joiner.restore(st["join"])
            else:
                self.joiner.restore(
                    {"bufL": {}, "bufR": {}, "n_l": 0, "n_r": 0,
                     "pairs_emitted": 0})
        self.watermark_us = st["watermark_us"]
        self.max_ts_us = st["max_ts_us"]
        # .get: pre-TTL frames lack these keys
        self._ttl_sweep_wm = st.get("ttl_sweep_wm", NEG_INF)
        self.evicted_total = st.get("evicted_total", 0)
        # .get: pre-cap frames lack the key; engagement is monotone so
        # each applied frame's value is the truth as of that epoch
        self.state_cap_engaged = bool(st.get("cap_engaged", False))

    def _fixup_win_slots(self) -> None:
        """Frames written before window_distinct was enabled carry
        2-element slots — give them empty key sets on restore (same
        written-before-the-spec rollback rule as the NFA/neardup/
        frontier sections). Must run after BOTH full-frame restores and
        delta upsert application (round-3 review finding: the delta
        path reintroduced 2-element slots past the full-frame fixup)."""
        for k, v in self.win.items():
            if len(v) == 2:
                self.win[k] = [v[0], v[1], set()]

    def _apply_small(self, st: dict) -> None:
        self.win = st["win"]
        if self.p.window_distinct:
            self._fixup_win_slots()
        # .get: frames written before window_quantiles existed carry no
        # winq section — rollback to empty, same rule as fired/joiner
        self.winq = st.get("winq", {})
        self.winh = st.get("winh", {})
        self.wearly = st.get("wearly", {})
        # .get: frames written before window_refire existed carry no
        # fired section — rollback to empty, same rule as the joiner
        self.fired = st.get("fired", {})
        self._refire_pending = set()
        self.sessions = st["sessions"]
        # rollback semantics as for the joiner above
        if self.nfa is not None:
            if st["nfa"] is not None:
                self.nfa.restore(st["nfa"])
            else:
                self.nfa.restore({"partials": {}, "truncated": 0})
        if self.neardup is not None:
            if st.get("neardup") is not None:
                self.neardup.restore(st["neardup"])
            else:
                # frame written before the spec existed: rollback resets
                # the live bucket map (same rule as the NFA/joiner)
                self.neardup.restore({"buckets": {}})
        if self.frontier is not None:
            if st.get("frontier") is not None:
                self.frontier.restore(st["frontier"])
            else:
                self.frontier.restore({"seen": {}})
        self._apply_join_and_scalars(st)

    def _reset_delta_tracking(self) -> None:
        self._dirty = set()
        self._evicted = set()
        self._win_dirty = set()
        self._win_closed = set()
        self._winq_dirty = set()
        self._winq_closed = set()
        self._winh_dirty = set()
        self._winh_closed = set()
        self._wearly_dirty = set()
        self._wearly_closed = set()
        self._fired_dirty = set()
        self._fired_closed = set()
        self._refire_pending = set()
        self._sess_dirty = set()
        self._sess_closed = set()

    def restore_bytes(self, blob: bytes) -> None:
        if blob[:4] == self._DELTA_MAGIC:
            raise ValueError(
                "cannot restore from a delta frame alone — use "
                "restore_chain with the full base frame first"
            )
        st = self._decode(blob)
        self.last_ts = st["last_ts"]
        self.version = st["version"]
        self._apply_small(st)
        self._reset_delta_tracking()
        # a restore is a rollback: caches for epochs processed AFTER the
        # snapshot must not survive it, or a resumed run would skip
        # re-applying the uncommitted epoch (cached metrics, no state);
        # ingest buffers likewise belong to the rolled-back timeline
        self._epoch_cache = {}
        self._frag_buf = {}
        self._frag_seen = {}
        self._rfrag_buf = {}
        self._rfrag_seen = {}
        self._nfrag_buf = {}
        self._nfrag_seen = {}
        self._ffrag_buf = {}
        self._ffrag_seen = {}
        self._cfrag_buf = {}
        self._cfrag_seen = {}

    def apply_delta_bytes(self, blob: bytes) -> None:
        if blob[:4] != self._DELTA_MAGIC:
            raise ValueError("apply_delta_bytes needs a GZD1 delta frame")
        st = self._decode(blob)
        self.last_ts.update(st["dedup_last_ts"])
        self.version.update(st["dedup_version"])
        for k in st.get("dedup_tombstones", ()):
            self.last_ts.pop(k, None)
            self.version.pop(k, None)
        if "win" in st:
            # legacy delta frame: small sections carried in full
            self._apply_small(st)
        else:
            self.win.update(st["win_upserts"])
            if self.p.window_distinct:
                self._fixup_win_slots()
            for k in st["win_tombstones"]:
                self.win.pop(k, None)
            self.winq.update(st.get("winq_upserts", {}))
            for k in st.get("winq_tombstones", ()):
                self.winq.pop(k, None)
            self.winh.update(st.get("winh_upserts", {}))
            for k in st.get("winh_tombstones", ()):
                self.winh.pop(k, None)
            self.wearly.update(st.get("wearly_upserts", {}))
            for k in st.get("wearly_tombstones", ()):
                self.wearly.pop(k, None)
            self.fired.update(st.get("fired_upserts", {}))
            for k in st.get("fired_tombstones", ()):
                self.fired.pop(k, None)
            self.sessions.update(st["sess_upserts"])
            for k in st["sess_tombstones"]:
                self.sessions.pop(k, None)
            if self.nfa is not None and st["nfa_delta"] is not None:
                # nfa_delta None means the chain was written without a
                # pattern — the base full frame already reset the live
                # buffers (rollback semantics), nothing to apply here
                self.nfa.apply_state_delta(st["nfa_delta"])
            if (self.neardup is not None
                    and st.get("neardup_delta") is not None):
                self.neardup.apply_state_delta(st["neardup_delta"])
            if (self.frontier is not None
                    and st.get("frontier_delta") is not None):
                self.frontier.apply_state_delta(st["frontier_delta"])
            self._apply_join_and_scalars(st)
        self._reset_delta_tracking()
        self._epoch_cache = {}

    def restore_chain(self, blobs: list) -> None:
        """Restore from ``[full_base, delta, delta, ...]`` in epoch
        order (the reduce side resolves the chain from frame headers)."""
        self.restore_bytes(blobs[0])
        for b in blobs[1:]:
            self.apply_delta_bytes(b)


def snapshot_base_epoch(head: bytes) -> "int | None":
    """``None`` if the frame at ``head`` is full (or legacy raw pickle),
    else the delta chain's base epoch — readable from the first 12 bytes
    without decompressing."""
    import struct

    if head[:4] == PartitionState._DELTA_MAGIC:
        return struct.unpack("<Q", head[4:12])[0]
    return None


def restore_state_from_chain(ps: PartitionState, snapshot_in: str,
                             this_epoch: int) -> int:
    """Restore ``ps`` from the frame at ``snapshot_in`` (the snapshot of
    ``this_epoch``), resolving a DELTA chain back to its full base frame
    (incremental snapshots: a full frame every
    ``StateParams.snapshot_full_every`` epochs, upsert-only deltas in
    between). Chain files are sibling ``epoch=NNNNN`` directories of the
    snapshot's parent — the epoch is passed in by the caller, never
    re-parsed from the (user-controlled) path. Returns the chain's base
    epoch so the caller can decide whether the NEXT frame is full or
    delta. Paths go through the fs seam, so the chain restores from a
    remote-scheme ``out_dir`` (fsspec) the same as from local disk."""
    from gush_ray.fs import get_fs

    fs, snapshot_in = get_fs(snapshot_in)
    with fs.open(snapshot_in, "rb") as f:
        blob = f.read()
    base = snapshot_base_epoch(blob[:12])
    if base is None:
        ps.restore_bytes(blob)
        return this_epoch
    # dirname/basename are plain "/" string ops, valid for URIs too
    parent, fname = snapshot_in.rsplit("/", 1)
    state_dir = parent.rsplit("/", 1)[0]

    def read_frame(e: int) -> bytes:
        p = fs.join(state_dir, f"epoch={e:05d}", fname)
        try:
            with fs.open(p, "rb") as f:
                return f.read()
        except FileNotFoundError:
            raise FileNotFoundError(
                f"snapshot chain broken: epoch {this_epoch} is a delta "
                f"with base {base} but {p} is missing"
            ) from None

    # the chain files are independent objects: read them CONCURRENTLY
    # (order restored by the map), apply in epoch order — on a
    # latency-injected/real object store this turns O(chain length)
    # sequential GET round-trips into ~one
    from concurrent.futures import ThreadPoolExecutor

    chain = list(range(base, this_epoch))
    with ThreadPoolExecutor(max_workers=min(8, len(chain))) as ex:
        blobs = list(ex.map(read_frame, chain))
    blobs.append(blob)
    ps.restore_chain(blobs)
    return base


def _string_if_null(arr: pa.Array) -> pa.Array:
    """All-None columns infer pa.null(); cast to string (the type the
    empty-table arms declare) so epoch part schemas never drift."""
    return arr.cast(pa.string()) if pa.types.is_null(arr.type) else arr


def _windows_table(rows, group_cols, value_col, distinct=False) -> pa.Table:
    names = [*group_cols, "window_id", "n", "sum_value"]
    if not rows:
        arrays = [pa.array([], type=pa.string()) for _ in group_cols]
        arrays += [pa.array([], type=pa.int64())] * 2
        arrays += [pa.array([], type=pa.float64())]
        tbl = pa.table(dict(zip(names, arrays)))
        if distinct:
            tbl = tbl.append_column(
                "n_distinct", pa.array([], type=pa.int64()))
        return tbl
    cols = list(zip(*rows))
    # an epoch whose group values are ALL None (every dim key
    # unmatched) would infer pa.null() and drift the schema across
    # epoch part files (round-3 review finding) — fall back to string,
    # the type of every other epoch's group column; non-null values
    # keep their inferred type (keys may be int)
    data = {c: _string_if_null(pa.array(list(cols[i])))
            for i, c in enumerate(group_cols)}
    k = len(group_cols)
    data["window_id"] = pa.array(list(cols[k]), type=pa.int64())
    data["n"] = pa.array(list(cols[k + 1]), type=pa.int64())
    data["sum_value"] = pa.array(
        [float(v) for v in cols[k + 2]], type=pa.float64()
    )
    if distinct:
        data["n_distinct"] = pa.array(list(cols[k + 3]), type=pa.int64())
    return pa.table(data)


def _sketch_rep(vals: np.ndarray, k: int) -> np.ndarray:
    """Monotone log-bucket transform (quantile_sketch_k mode): map each
    value to its bucket's LOWER BOUND — sign * 2^E * (1 + j/k) where
    2^E <= |v| < 2^(E+1) and j = floor((|v|/2^E - 1) * k) in [0, k).

    Properties the operator relies on:
    * monotone non-decreasing => rank-preserving => the quantile of the
      transformed multiset is exactly rep(exact quantile); relative
      error toward zero < 1/k.
    * exact octave split via frexp BIT manipulation + power-of-two
      scaling (ldexp) — no log() rounding hazard; the two float ops
      that do round ((x-1)*k and j/k) are structurally identical to the
      SQL oracle's expressions, so IEEE-754 determinism makes the pair
      bit-exact (queries_extra.SQL_WINDOW_QUANTILES_SKETCH).
    * NaN propagates (frexp(NaN) = NaN) and is excluded downstream,
      matching the exact path's NULL rule; zero maps to zero.
    """
    a = np.abs(vals)
    m, e = np.frexp(a)                 # a = m * 2^e, m in [0.5, 1)
    x = np.ldexp(m, 1)                 # mantissa in [1, 2), exact
    j = np.floor((x - 1.0) * k)        # sub-bucket, one rounding
    j = np.minimum(j, k - 1)           # (x-1)*k == k only via rounding
    rep = np.ldexp(1.0 + j / k, e - 1)  # exact power-of-two scale
    # copysign BEFORE the zero fixup: a -0.0 input must map to +0.0
    # (the SQL twin's value=0 branch yields +0.0; copysign after the
    # where() would resurrect the negative zero and diverge bit-wise)
    return np.where(a == 0.0, 0.0, np.copysign(rep, vals))


def _window_hist_table(rows, group_cols) -> pa.Table:
    """Per-partition closed-window value histograms (the
    ``window_quantiles`` stage-1 partial): one row per DISTINCT value of
    ``value_col`` per closed (group, window) — (groups..., window_id,
    value, n). The stage-2 merge (epoch_loop._quantile_windows) sums n
    per value across partitions, which reconstructs the global
    distribution exactly."""
    names = [*group_cols, "window_id", "value", "n"]
    if not rows:
        arrays = [pa.array([], type=pa.string()) for _ in group_cols]
        arrays += [pa.array([], type=pa.int64()),
                   pa.array([], type=pa.float64()),
                   pa.array([], type=pa.int64())]
        return pa.table(dict(zip(names, arrays)))
    cols = list(zip(*rows))
    k = len(group_cols)
    data = {c: _string_if_null(pa.array(list(cols[i])))
            for i, c in enumerate(group_cols)}
    data["window_id"] = pa.array(list(cols[k]), type=pa.int64())
    data["value"] = pa.array(list(cols[k + 1]), type=pa.float64())
    data["n"] = pa.array(list(cols[k + 2]), type=pa.int64())
    return pa.table(data)


def _window_hll_table(rows, group_cols) -> pa.Table:
    """Per-partition closed-window HLL register partials (the
    ``window_hll_p`` stage-1 output): one row per closed (group, window)
    — (groups..., window_id, registers: 2^p bytes). The stage-2 merge
    (epoch_loop._hll_windows) elementwise-maxes the partials, which IS
    the exact HLL union across partitions."""
    names = [*group_cols, "window_id", "registers"]
    if not rows:
        arrays = [pa.array([], type=pa.string()) for _ in group_cols]
        arrays += [pa.array([], type=pa.int64()),
                   pa.array([], type=pa.binary())]
        return pa.table(dict(zip(names, arrays)))
    cols = list(zip(*rows))
    k = len(group_cols)
    data = {c: _string_if_null(pa.array(list(cols[i])))
            for i, c in enumerate(group_cols)}
    data["window_id"] = pa.array(list(cols[k]), type=pa.int64())
    data["registers"] = pa.array(list(cols[k + 1]), type=pa.binary())
    return pa.table(data)


def _window_updates_table(rows, group_cols, distinct=False) -> pa.Table:
    """The window_refire changelog: change=+1 emissions and change=-1
    retractions (carrying the retracted emission's values). fire_seq is
    the per-window emission index — a retraction shares the seq of the
    +1 row replacing it, so (window, seq) pairs sort deterministically
    with -1 before +1."""
    names = [*group_cols, "window_id", "change", "n", "sum_value"]
    if distinct:
        names.append("n_distinct")
    names.append("fire_seq")
    if not rows:
        arrays = [pa.array([], type=pa.string()) for _ in group_cols]
        arrays += [pa.array([], type=pa.int64())] * 3   # wid, change, n
        arrays += [pa.array([], type=pa.float64())]     # sum_value
        if distinct:
            arrays.append(pa.array([], type=pa.int64()))
        arrays.append(pa.array([], type=pa.int64()))    # fire_seq
        return pa.table(dict(zip(names, arrays)))
    cols = list(zip(*rows))
    k = len(group_cols)
    data = {c: _string_if_null(pa.array(list(cols[i])))
            for i, c in enumerate(group_cols)}
    data["window_id"] = pa.array(list(cols[k]), type=pa.int64())
    data["change"] = pa.array(list(cols[k + 1]), type=pa.int64())
    data["n"] = pa.array(list(cols[k + 2]), type=pa.int64())
    data["sum_value"] = pa.array(
        [float(v) for v in cols[k + 3]], type=pa.float64())
    if distinct:
        data["n_distinct"] = pa.array(list(cols[k + 4]), type=pa.int64())
    data["fire_seq"] = pa.array(list(cols[k + 5]), type=pa.int64())
    return pa.table(data)


def _sessions_table(rows, key_col, values=False) -> pa.Table:
    if not rows:
        tbl = pa.table(
            {
                key_col: pa.array([], type=pa.string()),
                "session_start_us": pa.array([], type=pa.int64()),
                "session_end_us": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
            }
        )
        if values:
            for c in ("sum_value", "min_value", "max_value"):
                tbl = tbl.append_column(
                    c, pa.array([], type=pa.float64()))
        return tbl
    cols = list(zip(*rows))
    data = {
        # same all-None inference hazard as _windows_table's groups
        key_col: _string_if_null(pa.array(list(cols[0]))),
        "session_start_us": pa.array(list(cols[1]), type=pa.int64()),
        "session_end_us": pa.array(list(cols[2]), type=pa.int64()),
        "n_events": pa.array(list(cols[3]), type=pa.int64()),
    }
    if values:
        data["sum_value"] = pa.array(list(cols[4]), type=pa.float64())
        data["min_value"] = pa.array(list(cols[5]), type=pa.float64())
        data["max_value"] = pa.array(list(cols[6]), type=pa.float64())
    return pa.table(data)


@ray.remote(num_cpus=0)
class StateStoreActor:
    """Named per-partition actor owning one PartitionState.

    Called from routing tasks (``map_groups`` over ``hash(url) % P``) and
    from the epoch-loop driver; survives across epochs (SURVEY.md §7 hard
    part (d) — named actors, not map_batches-managed pools, so state is
    never recycled between stages/epochs).
    """

    def __init__(self, partition_id: int, params: StateParams):
        self.ps = PartitionState(partition_id, params)

    def process(self, epoch: int, table: pa.Table) -> dict:
        return self.ps.process(epoch, table)

    def ingest(self, epoch: int, frag_key: int, table: pa.Table) -> None:
        self.ps.ingest(epoch, frag_key, table)

    def process_epoch_to(self, epoch: int, base_dir: str) -> dict:
        return self.ps.process_epoch_to(epoch, base_dir)

    def process_epoch_tables_lr(self, epoch: int, base_dir: str,
                                n_left: int, *tables) -> dict:
        """Exchange ingestion with refs passed as DIRECT variadic args:
        Ray resolves them to Arrow tables before the call (zero-copy, no
        borrower bookkeeping — nested refs in a list make every actor a
        borrower and the resulting ref-counting RPC storm measurably
        degrades later map rounds; see BENCH/BASELINE.md). The first
        ``n_left`` tables are LEFT-stream fragments, the rest are the
        stream-stream join's RIGHT stream."""
        for i, t in enumerate(tables[:n_left]):
            if t is not None and t.num_rows:
                self.ps.ingest(epoch, i, t)
        for i, t in enumerate(tables[n_left:]):
            if t is not None and t.num_rows:
                self.ps.ingest_right(epoch, i, t)
        return self.ps.process_epoch_to(epoch, base_dir)

    def process_epoch_refs(self, epoch: int, frags: list,
                           base_dir: str) -> dict:
        """Pull-model exchange: fetch this partition's fragments from the
        object store (zero-copy plasma reads), then process + sink."""
        for frag_key, ref in frags:
            self.ps.ingest(epoch, frag_key, ray.get(ref))
        return self.ps.process_epoch_to(epoch, base_dir)

    def advance_watermark(self, wm_us: int) -> dict:
        return self.ps.advance_watermark(wm_us)

    def max_ts(self) -> int:
        return self.ps.max_ts_us

    def commit_epoch(self, epoch: int) -> None:
        self.ps.commit_epoch(epoch)

    def snapshot_to(self, path: str) -> str:
        from gush_ray.fs import get_fs

        blob = self.ps.snapshot_bytes()
        fs, path = get_fs(path)
        fs.makedirs(path.rsplit("/", 1)[0])
        tmp = f"{path}.inprogress-{os.getpid()}"
        with fs.open(tmp, "wb") as f:
            f.write(blob)
        fs.replace(tmp, path)
        return path

    def restore_from(self, path: str, epoch: "int | None" = None) -> None:
        """Restore actor state from a snapshot file. ``epoch`` (the
        epoch the snapshot belongs to) is required to resolve a DELTA
        chain written by a tasks-mode run — without it only full frames
        restore (actors themselves always write full frames)."""
        if epoch is not None:
            restore_state_from_chain(self.ps, path, epoch)
        else:
            from gush_ray.fs import get_fs

            fs, path = get_fs(path)
            with fs.open(path, "rb") as f:
                self.ps.restore_bytes(f.read())


def get_state_actor(run_id: str, partition_id: int, params: StateParams):
    """Create-or-fetch the named state actor for a partition."""
    return StateStoreActor.options(
        name=f"gush-state-{run_id}-{partition_id}",
        get_if_exists=True,
    ).remote(partition_id, params)
