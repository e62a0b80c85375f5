"""Checkpoint rescaling: resume a streaming job at a DIFFERENT
partition count (the Flink savepoint-rescale analog).

The north rule runs the job on clusters of N and 4N nodes; a checkpoint
written at one size must be continuable at the other. ``rescale_state``
rewrites the resume point — the per-partition state snapshots and the
last committed manifest — from ``old_P`` to ``new_P`` partitions:

* key-addressed state (row-version dedup maps, open sessions, NFA
  partial runs, stream-join buffers) re-splits by the engine's stable
  partitioner ``hash(key) % new_P`` — exactly where future rows of each
  key will arrive;
* window accumulators are keyed by GROUP (not by the stream key) and
  are additive partials, so they may live in any partition: they place
  deterministically by a hash of the group key and merge by addition;
* the manifest's per-partition event-time maxima are RECONSTRUCTED as
  each new partition's max over its keys' ``last_ts`` — for a stream
  with no TTL evictions this equals the true ingested max exactly
  (every stale/duplicate row's ts is ≤ its key's last_ts and every
  late row is below the watermark), so a 4→8→4 round trip restores the
  watermark inputs bit-exactly; with TTL evictions or an empty
  partition the reconstruction falls back conservatively (never ahead
  of the truth, so the watermark can only be delayed, never wrongly
  advanced); per-key state watermarks carry over exactly;
* the manifest's per-epoch conservation totals (inserts/updates/late/
  matches — what fsck audits against disk rows) are preserved by
  placing the summed totals on partition 0's row.

EXECUTION SHAPE (round-5 rewrite — the exchange the epoch loop already
uses, now for the savepoint): one SPLIT task per OLD partition restores
its delta chain and routes every state section into ``new_P``
per-new-partition section dicts (returned as separate Ray objects,
``num_returns = 1 + new_P``); one MERGE task per NEW partition folds
its ``old_P`` sections together — the same additive/union/extend merge
rules as a serial rescale — and writes the new full snapshot frame
atomically. The driver holds only the per-old-partition SUMMARIES
(scalars + section-presence flags, a few hundred bytes each) and the
rewritten manifest: no key, buffer or frame ever materializes
driver-side, so the tool's wall and memory scale with the cluster, not
the checkpoint (the round-4 driver-side walk measured 19–26 min on a
6.2M-key checkpoint; see BENCH/BASELINE.md round-5 drill re-run).
``parallel=False`` (or no Ray) runs the identical route/merge kernels
in-process, restoring and dropping one old partition at a time.

Semantics note: ACROSS different partition counts the watermark (min
over per-partition maxima) is inherently finer-grained at higher P, so
the one output that depends on watermark PACING rather than event-time
values — the NFA's ``max_partials`` overflow truncation on hot keys —
may differ between a rescaled run and a same-history run at the old
count, exactly as two from-scratch runs at different P may. All
event-time-determined outputs (changes, late routing with epoch-aligned
inputs, sessions, joins, window totals) are unaffected, and a rescale
down-and-back restores byte-identical behavior including the NFA
(round-trip parity test).

After rescaling, ``StreamingJob(..., num_partitions=new_P)`` resumes
and produces the uninterrupted run's output (parity-tested for up- and
down-scaling and for the 4→8→4 round trip). Run:
``python -m gush_ray.rescale OUT_DIR NEW_P`` (engine params must match
the job's; the CLI covers the defaults).
"""

from __future__ import annotations

import json
import logging
import os
import zlib

import numpy as np

from gush_ray.sinks.exactly_once import ExactlyOnceSink
from gush_ray.state.store import (
    NEG_INF,
    PartitionState,
    StateParams,
    restore_state_from_chain,
)

_CONSERVED_TOTALS = (
    "rows_in", "replays_dropped", "stale_dropped", "late_rows",
    "inserts", "updates", "matches", "joined_rows", "right_rows_in",
    "right_late", "near_dup_rows", "frontier_rows",
)

_log = logging.getLogger("gush_ray")


def _probe_pattern():
    from gush_ray.stages.nfa import Pattern, Step

    return Pattern(steps=(Step("a", "change_kind", "insert"),),
                   within_us=1, key="url", ts_col="ts_us")


def _probe_join_spec():
    from gush_ray.state.join_state import JoinSpec

    return JoinSpec(0, 0)


def _probe_neardup_spec():
    from gush_ray.state.neardup import NearDupSpec

    return NearDupSpec()


def _probe_frontier_spec():
    from gush_ray.state.frontier import FrontierSpec

    return FrontierSpec()


def _key_part(key, new_P: int) -> int:
    """Partition of a stream key under the engine's stable hash
    (stages/shuffle.stable_hash over a 1-element array)."""
    import pandas as pd

    h = pd.util.hash_array(np.asarray([key], dtype=object),
                           categorize=False)[0]
    # the % MUST happen in uint64: numpy promotes uint64 % python-int to
    # float64, which at hash magnitudes rounds to a multiple of 2048 and
    # returns 0 for every key (same cast the engine uses in _map_shard)
    return int(h % np.uint64(new_P))


def _key_parts_vec(keys: list, new_P: int) -> list:
    """Vectorized ``_key_part`` over a key list (one hash_array call for
    the whole section instead of one per key — the re-split's hot loop;
    element-wise identical to ``_key_part`` by construction)."""
    import pandas as pd

    if not keys:
        return []
    arr = np.empty(len(keys), dtype=object)
    arr[:] = keys
    h = pd.util.hash_array(arr, categorize=False)
    return (h % np.uint64(new_P)).astype(np.int64).tolist()


def _group_part(key, new_P: int) -> int:
    """Deterministic placement for group-keyed additive state (window
    accumulators): any consistent function works because partials merge
    by addition wherever they live."""
    return zlib.crc32(repr(key).encode()) % new_P


# --------------------------------------------------------------------
# route / merge kernels — shared verbatim by the serial path and the
# SPLIT/MERGE Ray tasks, so the two paths are identical by construction
# (pinned by test_rescale_parallel_matches_serial).

_KEY_ROUTED = ("last_ts", "version", "sessions", "nfa_partials",
               "frontier_seen")
_GROUP_ROUTED = ("win", "winq", "wearly", "winh", "fired")


def _empty_sections() -> dict:
    sec: dict = {n: {} for n in _KEY_ROUTED + _GROUP_ROUTED}
    sec["joinL"] = None
    sec["joinR"] = None
    sec["neardup_buckets"] = {}
    return sec


def _summarize(ps: PartitionState) -> dict:
    """Driver-visible facts about one old partition: scalars that merge
    into the new layout, plus section-presence flags for the
    state-would-be-dropped guards. A few hundred bytes — the ONLY thing
    the driver ever holds per partition."""
    return {
        "watermark_us": ps.watermark_us,
        "max_ts_us": ps.max_ts_us,
        "ttl_sweep_wm": ps._ttl_sweep_wm,
        "evicted_total": ps.evicted_total,
        "state_cap_engaged": getattr(ps, "state_cap_engaged", False),
        "nfa_truncated": ps.nfa.truncated if ps.nfa else 0,
        "pairs_emitted": ps.joiner.pairs_emitted if ps.joiner else 0,
        "neardup_evicted": (ps.neardup.evicted_total
                            if ps.neardup else 0),
        "frontier_evicted": (ps.frontier.evicted_total
                             if ps.frontier else 0),
        "n_keys": len(ps.last_ts),
        "has_nfa_partials": bool(ps.nfa and ps.nfa.partials),
        "has_join_buf": bool(ps.joiner
                             and (len(ps.joiner.bufL)
                                  or len(ps.joiner.bufR))),
        "has_neardup": bool(ps.neardup and ps.neardup.buckets),
        "has_frontier": bool(ps.frontier and ps.frontier.seen),
        "has_fired": bool(ps.fired),
    }


def _route_sections(ps: PartitionState, new_P: int) -> list:
    """Split every state section of one restored OLD partition into
    ``new_P`` per-new-partition section dicts (the SPLIT half of the
    exchange). Pure routing — no merging happens here, so sections from
    different old partitions stay independent Ray objects."""
    out = [_empty_sections() for _ in range(new_P)]

    # key-addressed sections: the engine's stable url-hash rule
    for name, src in (
        ("last_ts", ps.last_ts),
        ("version", ps.version),
        ("sessions", ps.sessions),
        ("nfa_partials", ps.nfa.partials if ps.nfa else {}),
        ("frontier_seen", ps.frontier.seen if ps.frontier else {}),
    ):
        if not src:
            continue
        keys = list(src.keys())
        for k, pid in zip(keys, _key_parts_vec(keys, new_P)):
            out[pid][name][k] = src[k]

    # group-keyed additive sections: any consistent placement works
    for name in _GROUP_ROUTED:
        for gk, v in getattr(ps, name).items():
            out[_group_part(gk, new_P)][name][gk] = v

    # stream-join buffers: split the DataFrames by the key column with
    # the same vectorized hash rule
    if ps.joiner is not None:
        import pandas as pd

        for attr, name in (("bufL", "joinL"), ("bufR", "joinR")):
            buf = getattr(ps.joiner, attr)
            if not len(buf):
                continue
            part = pd.Series(
                _key_parts_vec(buf[ps.p.key_col].tolist(), new_P),
                index=buf.index)
            for pid, sub in buf.groupby(part):
                out[pid][name] = sub

    # near-dup buckets re-route by the SAME pure function the map
    # phase's band exchange uses (vectorized over all bucket keys)
    if ps.neardup is not None and ps.neardup.buckets:
        from gush_ray.state.neardup import bucket_part

        bks = list(ps.neardup.buckets.keys())
        # same asarray(dtype=uint64) conversion the per-bucket scalar
        # call used, just over the whole key list at once
        parts = bucket_part([b[0] for b in bks], [b[1] for b in bks],
                            new_P)
        for bk, pid in zip(bks, parts.tolist()):
            out[pid]["neardup_buckets"][bk] = ps.neardup.buckets[bk]

    return out


def _merge_routed(nps: PartitionState, sec: dict,
                  window_distinct: bool) -> None:
    """Fold ONE old partition's routed section dict into a new
    partition's state (the MERGE half). Key-addressed entries land
    disjointly (each key lived in exactly one old partition);
    group-keyed window slots merge additively; HLL registers by
    elementwise max; fired/early slots by the documented
    sum/union/max-per-field rules (each old partition held a PARTIAL of
    the window, and each emitted its own partial — so the merged
    changelog's future retraction must retract the SUM)."""
    nps.last_ts.update(sec["last_ts"])
    nps.version.update(sec["version"])
    for k, sess in sec["sessions"].items():
        nps.sessions[k] = list(sess)
    for gkey, src in sec["win"].items():
        # slots are [n, sum] or [n, sum, key_set] (window_distinct);
        # counts/sums add, distinct KEY SETS union — both exact
        # partial merges (a fixed-width unpack here crashed on
        # 3-element distinct slots; round-3 review finding)
        slot = nps.win.setdefault(
            gkey, [0, 0.0, set()] if len(src) > 2 else [0, 0.0])
        slot[0] += int(src[0])
        slot[1] += float(src[1])
        if len(src) > 2:
            if len(slot) == 2:
                slot.append(set())
            slot[2] |= src[2]
    for gkey, hist in sec["winq"].items():
        # per-window value histograms merge additively per value
        tgt = nps.winq.setdefault(gkey, {})
        for v, c in hist.items():
            tgt[v] = tgt.get(v, 0) + c
    for gkey, eslot in sec["wearly"].items():
        # last-early-emission slots merge additively (each partition
        # emitted its own partial; the changelog's next retraction
        # must retract the SUM — same argument as fired slots)
        tgt = nps.wearly.setdefault(gkey, [0, 0.0, 0, 0])
        tgt[0] += int(eslot[0])
        tgt[1] += float(eslot[1])
        tgt[2] += int(eslot[2])
        tgt[3] = max(tgt[3], int(eslot[3]))
    for gkey, regs in sec["winh"].items():
        # HLL registers merge by elementwise max (exact union)
        cur = nps.winh.get(gkey)
        if cur is None:
            nps.winh[gkey] = regs.copy()
        else:
            np.maximum(cur, regs, out=cur)
    for gkey, fslot in sec["fired"].items():
        # fired accumulators merge additively like open windows;
        # n_emissions = max keeps the "nothing emitted yet" (0) case
        # exact; any positive value only gates whether a -1 precedes
        # the next +1.
        tgt = nps.fired.setdefault(
            gkey, [0, 0.0,
                   set() if window_distinct else None,
                   0, 0.0, 0, 0])
        tgt[0] += int(fslot[0])
        tgt[1] += float(fslot[1])
        if fslot[2] is not None and tgt[2] is not None:
            tgt[2] |= fslot[2]
        tgt[3] += int(fslot[3])
        tgt[4] += float(fslot[4])
        tgt[5] += int(fslot[5])
        tgt[6] = max(tgt[6], int(fslot[6]))
    for k, plist in sec["nfa_partials"].items():
        nps.nfa.partials.setdefault(k, []).extend(plist)
    if sec["joinL"] is not None or sec["joinR"] is not None:
        import pandas as pd

        for name, attr in (("joinL", "bufL"), ("joinR", "bufR")):
            sub = sec[name]
            if sub is None or not len(sub):
                continue
            tgt = getattr(nps.joiner, attr)
            setattr(nps.joiner, attr,
                    pd.concat([tgt, sub], ignore_index=True))
    nps.neardup.buckets.update(sec["neardup_buckets"])
    nps.frontier.seen.update(sec["frontier_seen"])


def _finish_new_state(nps: PartitionState, scalars: dict,
                      totals0: "dict | None", ts_col: str) -> dict:
    """Apply the global scalars, restore the join buffers' ts-sort
    invariant, and report the facts the manifest rewrite needs."""
    import pandas as pd  # noqa: F401  (sort_values below)

    nps.watermark_us = scalars["watermark_us"]
    nps.max_ts_us = scalars["max_ts_us"]
    nps._ttl_sweep_wm = scalars["ttl_sweep_wm"]
    if scalars.get("state_cap_engaged"):
        nps.state_cap_engaged = True
    if totals0 is not None:
        nps.evicted_total = totals0["evicted_total"]
        if nps.nfa is not None:
            nps.nfa.truncated = totals0["nfa_truncated"]
        if nps.joiner is not None:
            nps.joiner.pairs_emitted = totals0["pairs_emitted"]
        if nps.neardup is not None:
            nps.neardup.evicted_total = totals0["neardup_evicted"]
        if nps.frontier is not None:
            nps.frontier.evicted_total = totals0["frontier_evicted"]
    # the join buffers must stay ts-sorted per partition (the
    # searchsorted kernel's precondition); the probe params always
    # construct a joiner, so sort unconditionally
    for side in ("bufL", "bufR"):
        buf = getattr(nps.joiner, side)
        if len(buf):
            setattr(nps.joiner, side,
                    buf.sort_values(ts_col, kind="mergesort")
                    .reset_index(drop=True))
    return {
        "n_keys": len(nps.last_ts),
        "max_last_ts": (max(nps.last_ts.values())
                        if nps.last_ts else NEG_INF),
    }


def _write_frame(nps: PartitionState, path: str) -> None:
    """Full snapshot frame, written atomically through the fs seam (so
    a remote-scheme out_dir works the same as local disk)."""
    from gush_ray.fs import get_fs

    fs, path = get_fs(path)
    nps._dirty = set()  # full frame; no delta bookkeeping carries over
    fs.makedirs(path.rsplit("/", 1)[0])
    tmp = f"{path}.rescale-{os.getpid()}"
    with fs.open(tmp, "wb") as f:
        f.write(nps.snapshot_bytes())
    fs.replace(tmp, path)


def _check_params_cover(params: StateParams, summaries: list) -> None:
    """A checkpoint section the caller's params didn't enable would be
    silently dropped on resume — refuse instead (same guards as before
    the round-5 rewrite, now driven by the split summaries so the
    driver never needs the states themselves)."""
    if params.pattern is None and any(s["has_nfa_partials"]
                                      for s in summaries):
        raise ValueError(
            "checkpoint holds NFA partial runs but no pattern was "
            "passed — rescaling would silently drop them; call "
            "rescale_state with the job's StateParams"
        )
    if params.join_spec is None and any(s["has_join_buf"]
                                        for s in summaries):
        raise ValueError(
            "checkpoint holds stream-join buffers but no join_spec was "
            "passed — rescaling would silently drop them; call "
            "rescale_state with the job's StateParams"
        )
    if params.neardup_spec is None and any(s["has_neardup"]
                                           for s in summaries):
        raise ValueError(
            "checkpoint holds near-dup bucket state but no neardup_spec "
            "was passed — rescaling would silently drop it; call "
            "rescale_state with the job's StateParams"
        )
    if params.frontier_spec is None and any(s["has_frontier"]
                                            for s in summaries):
        raise ValueError(
            "checkpoint holds frontier seen-state but no frontier_spec "
            "was passed — rescaling would silently drop it; call "
            "rescale_state with the job's StateParams"
        )
    if not params.window_refire and any(s["has_fired"]
                                        for s in summaries):
        raise ValueError(
            "checkpoint holds fired-window accumulators but "
            "window_refire is off — rescaling would silently drop "
            "pending late re-firings; call rescale_state with the "
            "job's StateParams"
        )


def _global_scalars(summaries: list) -> dict:
    return {
        "watermark_us": min(s["watermark_us"] for s in summaries),
        "max_ts_us": max(s["max_ts_us"] for s in summaries),
        "ttl_sweep_wm": min(s["ttl_sweep_wm"] for s in summaries),
        "state_cap_engaged": any(s.get("state_cap_engaged")
                                 for s in summaries),
    }


def _totals0(summaries: list) -> dict:
    return {
        k: sum(s[k] for s in summaries)
        for k in ("evicted_total", "nfa_truncated", "pairs_emitted",
                  "neardup_evicted", "frontier_evicted")
    }


def rescale_state(out_dir: str, new_P: int,
                  params: StateParams | None = None,
                  parallel: "bool | None" = None) -> dict:
    """Rewrite the resume point of ``out_dir`` for ``new_P`` partitions.
    Returns a report dict. ``params`` must match the job's StateParams
    (window sizes, pattern, join spec) — state sections are re-split
    structurally, so only key/ts column names and the NFA/join presence
    matter, but passing the real params keeps restored objects exact.

    ``parallel``: run the exchange-shaped SPLIT/MERGE as Ray tasks (one
    SPLIT per old partition, one MERGE+write per new partition — module
    docstring); the driver holds only summaries and the manifest.
    Default (None) = parallel iff Ray is already initialized. On a
    multi-node cluster the snapshot dir must be shared (or a remote
    scheme); when a task cannot see a local-scheme ``out_dir`` the tool
    falls back to the in-process path with a warning (round-4 ADVICE)."""
    params = params or StateParams()
    # PROBE params for restore: a frame's NFA partials / join buffers
    # restore structurally under ANY pattern/spec (partials store step
    # indices; buffers store their own columns), but PartitionState
    # silently SKIPS sections its params didn't enable — which here
    # would silently drop state. Restore with both sections enabled,
    # then verify the caller's params actually cover what exists.
    probe = StateParams(
        key_col=params.key_col, ts_col=params.ts_col,
        window_group_cols=params.window_group_cols,
        window_size_us=params.window_size_us,
        window_slide_us=params.window_slide_us,
        session_gap_us=params.session_gap_us,
        value_col=params.value_col,
        pattern=params.pattern or _probe_pattern(),
        allowed_lateness_us=params.allowed_lateness_us,
        join_spec=params.join_spec or _probe_join_spec(),
        neardup_spec=params.neardup_spec or _probe_neardup_spec(),
        frontier_spec=params.frontier_spec or _probe_frontier_spec(),
        snapshot_full_every=params.snapshot_full_every,
        dedup_ttl_us=params.dedup_ttl_us,
    )
    sink = ExactlyOnceSink(out_dir)
    if sink.final_committed():
        raise ValueError("stream is finalized; rescaling is pointless "
                         "(nothing left to resume)")
    last = sink.last_contiguous_epoch()
    if last < 0:
        raise ValueError("no committed epoch to rescale")
    man = sink.read_manifest(last)
    old_parts = man["partitions"]
    old_P = len(old_parts)
    if new_P == old_P:
        # idempotence across the commit→sweep crash window (round-4
        # ADVICE): uncommitted slots are garbage by definition (their
        # epochs replay in full), so sweeping is always safe — a re-run
        # after a crash mid-rescale (or a kill followed by a same-P
        # "rescale") must still clear the orphan old-layout files that
        # would otherwise fail fsck once the replayed epoch commits.
        swept = _sweep_uncommitted_slots(out_dir, last)
        return {"rescaled": False, "old_P": old_P, "new_P": new_P,
                "swept_uncommitted_files": swept}

    state_dir = os.path.join(out_dir, "_state")

    def snap_path(epoch: int, pid: int) -> str:
        return os.path.join(state_dir, f"epoch={epoch:05d}",
                            f"part-{pid:05d}.pkl")

    if parallel is None:
        try:
            import ray
            parallel = ray.is_initialized()
        except ImportError:  # pragma: no cover - ray is a hard dep
            parallel = False

    if parallel:
        try:
            summaries, merge_reports = _rescale_distributed(
                old_parts, snap_path, last, probe, params, new_P)
        except FileNotFoundError:
            # a task scheduled off the driver node cannot see a
            # node-local out_dir — the serial path still can
            _log.warning(
                "rescale: a Ray task could not open the snapshot dir "
                "(node-local out_dir on a multi-node cluster?) — "
                "falling back to the in-process path")
            summaries, merge_reports = _rescale_serial(
                old_parts, snap_path, last, probe, params, new_P)
    else:
        summaries, merge_reports = _rescale_serial(
            old_parts, snap_path, last, probe, params, new_P)

    # stale old-layout snapshot files beyond new_P would never be read
    # again but would confuse a later rescale back; remove them
    for pid in range(new_P, old_P):
        stale = snap_path(last, pid)
        if os.path.exists(stale):
            os.remove(stale)

    # rewrite the manifest: watermark preserved; per-partition maxima
    # reconstructed from the keys each new partition now owns (see
    # module docstring); conservation totals summed onto partition 0
    has_right = any("max_ts_us_r" in p for p in old_parts)
    old_min = min(p.get("max_ts_us", NEG_INF) for p in old_parts)
    old_min_r = (min(p.get("max_ts_us_r", NEG_INF) for p in old_parts)
                 if has_right else None)
    new_max = [max(r["max_last_ts"], old_min) for r in merge_reports]
    # right-stream maxima are not key-addressed state; the join buffers
    # hold only the unpruned window, so reconstruct conservatively
    new_max_r = [old_min_r] * new_P if has_right else None
    totals = {
        k: int(sum(p.get(k, 0) for p in old_parts))
        for k in _CONSERVED_TOTALS
        if any(k in p for p in old_parts)
    }
    rows = []
    for pid in range(new_P):
        row = {"partition_id": pid, "max_ts_us": int(new_max[pid]),
               "idle_epochs": 0, "snapshot": snap_path(last, pid)}
        if has_right:
            row["max_ts_us_r"] = new_max_r[pid]
            row["idle_epochs_r"] = 0
        if pid == 0:
            row.update(totals)
        else:
            row.update({k: 0 for k in totals})
        rows.append(row)
    extra = {k: v for k, v in man.items()
             if k not in ("epoch", "watermark_us", "partitions")}
    extra["rescaled_from"] = old_P
    sink.commit_epoch(last, man["watermark_us"], rows, extra=extra)
    swept = _sweep_uncommitted_slots(out_dir, last)
    return {"rescaled": True, "old_P": old_P, "new_P": new_P,
            "epoch": last,
            "keys_moved": int(sum(s["n_keys"] for s in summaries)),
            "swept_uncommitted_files": swept}


def _rescale_serial(old_parts, snap_path, last: int,
                    probe: StateParams, params: StateParams,
                    new_P: int):
    """In-process path: restore one old partition at a time, route it,
    merge into the new states, DROP it — peak memory is one old
    partition plus the new layout (the old all-olds-resident list held
    both full populations at once)."""
    new_states = [PartitionState(pid, probe) for pid in range(new_P)]
    summaries = []
    for p in old_parts:
        ps = PartitionState(p["partition_id"], probe)
        restore_state_from_chain(
            ps, snap_path(last, p["partition_id"]), last)
        summaries.append(_summarize(ps))
        routed = _route_sections(ps, new_P)
        del ps
        for pid in range(new_P):
            _merge_routed(new_states[pid], routed[pid],
                          params.window_distinct)
    _check_params_cover(params, summaries)
    scalars = _global_scalars(summaries)
    totals0 = _totals0(summaries)
    reports = []
    for pid, nps in enumerate(new_states):
        rep = _finish_new_state(nps, scalars,
                                totals0 if pid == 0 else None,
                                params.ts_col)
        _write_frame(nps, snap_path(last, pid))
        reports.append(rep)
    return summaries, reports


def _rescale_distributed(old_parts, snap_path, last: int,
                         probe: StateParams, params: StateParams,
                         new_P: int):
    """The exchange: old_P SPLIT tasks × new_P MERGE tasks. Section
    dicts travel SPLIT→MERGE through the object store as direct task
    arguments; the driver gets summaries and write reports only."""
    import ray

    @ray.remote
    def _split_task(pid: int, path: str, last_e: int, probe_params,
                    nP: int) -> list:
        ps = PartitionState(pid, probe_params)
        restore_state_from_chain(ps, path, last_e)
        return [_summarize(ps)] + _route_sections(ps, nP)

    @ray.remote
    def _merge_task(pid: int, probe_params, scalars: dict,
                    totals0: "dict | None", window_distinct: bool,
                    ts_col: str, out_path: str, *secs) -> dict:
        nps = PartitionState(pid, probe_params)
        for sec in secs:  # old-pid order — same as the serial loop
            _merge_routed(nps, sec, window_distinct)
        rep = _finish_new_state(nps, scalars, totals0, ts_col)
        _write_frame(nps, out_path)
        return rep

    splits = [
        _split_task.options(num_returns=1 + new_P).remote(
            p["partition_id"],
            snap_path(last, p["partition_id"]), last, probe, new_P)
        for p in old_parts
    ]
    try:
        summaries = ray.get([s[0] for s in splits])
    except ray.exceptions.RayTaskError as e:
        if isinstance(e.cause, FileNotFoundError):
            raise e.cause
        raise
    _check_params_cover(params, summaries)
    scalars = _global_scalars(summaries)
    totals0 = _totals0(summaries)
    merges = [
        _merge_task.remote(
            pid, probe, scalars, totals0 if pid == 0 else None,
            params.window_distinct, params.ts_col,
            snap_path(last, pid),
            *[s[1 + pid] for s in splits])
        for pid in range(new_P)
    ]
    try:
        reports = ray.get(merges)
    except ray.exceptions.RayTaskError as e:
        if isinstance(e.cause, FileNotFoundError):
            raise e.cause
        raise
    return summaries, reports


def _sweep_uncommitted_slots(out_dir: str, last: int) -> int:
    """Delete data/snapshot files of epochs ABOVE the last committed one.

    A job killed mid-epoch leaves partially-written part files for the
    in-flight epoch. Resume at the SAME partition count replays that
    epoch onto the same deterministic file names, so the orphans vanish
    by overwrite — but after a rescale the replay writes fewer (or
    other) partition slots, and the old count's leftover files for the
    higher slots would sit next to the replayed ones: committed-epoch
    readers never see them (reader isolation is manifest-driven), but
    once the epoch commits, fsck's disk↔manifest row conservation
    counts the whole slot directory and fails. The uncommitted slots
    are garbage by definition (their epochs replay in full), so sweep
    them at rescale time — including when new_P == old_P, so a re-run
    that crashed between commit and sweep stays idempotent (round-4
    ADVICE). Found by the headroom-scale ops drill (tools/drill.py):
    fsck flagged epoch-2 streams with 1.5× the manifest's rows after a
    32→16 kill+rescale."""
    import shutil

    swept = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if name == "_manifest" or not os.path.isdir(d):
            continue
        for slot in os.listdir(d):
            if not slot.startswith("epoch="):
                continue
            try:
                e = int(slot.split("=", 1)[1])
            except ValueError:
                continue  # the "final" flush slot (finalized streams
                # refuse rescale above, so it cannot appear here)
            if e > last:
                sd = os.path.join(d, slot)
                swept += len(os.listdir(sd))
                shutil.rmtree(sd)
    return swept


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        description="rescale a streaming checkpoint to a new partition "
                    "count (default StateParams; jobs with custom "
                    "windows/pattern/join must call rescale_state "
                    "directly with their params)")
    ap.add_argument("out_dir")
    ap.add_argument("new_p", type=int)
    ap.add_argument("--parallel", action="store_true",
                    help="run the SPLIT/MERGE exchange as Ray tasks "
                         "(one split per old partition, one merge+write "
                         "per new partition) instead of in-process")
    args = ap.parse_args(argv)
    if args.parallel:
        import ray

        # CLI entry points own their Ray session (library code never
        # calls ray.init — driver contract)
        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False,
                     logging_level="ERROR")
    print(json.dumps(rescale_state(args.out_dir, args.new_p,
                                   parallel=args.parallel or None)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
