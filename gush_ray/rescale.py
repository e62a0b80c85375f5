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


def _group_part(key, new_P: int) -> int:
    """Deterministic placement for group-keyed additive state (window
    accumulators): any consistent function works because partials merge
    by addition wherever they live."""
    return zlib.crc32(repr(key).encode()) % new_P


def rescale_state(out_dir: str, new_P: int,
                  params: StateParams | None = None,
                  parallel: "bool | None" = None) -> dict:
    """Rewrite the resume point of ``out_dir`` for ``new_P`` partitions.
    Returns a report dict. ``params`` must match the job's StateParams
    (window sizes, pattern, join spec) — state sections are re-split
    structurally, so only key/ts column names and the NFA/join presence
    matter, but passing the real params keeps restored objects exact.

    ``parallel``: fan the chain restore out as Ray tasks — one task per
    old partition resolves its delta chain and returns ONE full frame;
    the driver rebuilds identical state from the canonical
    serialization (``snapshot_bytes`` → ``restore_bytes``). The
    re-split/merge loop and the frame writes stay on the driver,
    byte-identical to the serial path (shipping merged states to write
    tasks would cost the same driver-side serialization it saves).
    Default (None) = parallel iff Ray is already initialized. Measured
    at the 49M-row ops drill: 1576 s serial → 1118 s parallel — the
    chain decompressions overlap, but the driver still serially
    unpickles the returned frames, walks the re-split/merge loop and
    writes the new frames (the remaining cost; the full fix is an
    exchange-shaped split/merge fan-out, BENCH/BASELINE.md)."""
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
        return {"rescaled": False, "old_P": old_P, "new_P": new_P}

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

    old_states: list[PartitionState] = []
    if parallel:
        import ray

        @ray.remote
        def _restore_full(pid: int, path: str, last_e: int,
                          probe_params) -> bytes:
            st = PartitionState(pid, probe_params)
            restore_state_from_chain(st, path, last_e)
            # snapshot_bytes() is always a FULL frame — the canonical
            # serialization — so the driver-side restore_bytes() below
            # rebuilds state identical to an in-process chain restore
            return st.snapshot_bytes()

        blobs = ray.get([
            _restore_full.remote(
                p["partition_id"],
                snap_path(last, p["partition_id"]), last, probe)
            for p in old_parts
        ])
        for p, blob in zip(old_parts, blobs):
            ps = PartitionState(p["partition_id"], probe)
            ps.restore_bytes(blob)
            old_states.append(ps)
    else:
        for p in old_parts:
            ps = PartitionState(p["partition_id"], probe)
            restore_state_from_chain(
                ps, snap_path(last, p["partition_id"]), last)
            old_states.append(ps)
    if params.pattern is None and any(
            ps.nfa.partials for ps in old_states):
        raise ValueError(
            "checkpoint holds NFA partial runs but no pattern was "
            "passed — rescaling would silently drop them; call "
            "rescale_state with the job's StateParams"
        )
    if params.join_spec is None and any(
            len(ps.joiner.bufL) or len(ps.joiner.bufR)
            for ps in old_states):
        raise ValueError(
            "checkpoint holds stream-join buffers but no join_spec was "
            "passed — rescaling would silently drop them; call "
            "rescale_state with the job's StateParams"
        )
    if params.neardup_spec is None and any(
            ps.neardup.buckets for ps in old_states):
        raise ValueError(
            "checkpoint holds near-dup bucket state but no neardup_spec "
            "was passed — rescaling would silently drop it; call "
            "rescale_state with the job's StateParams"
        )
    if params.frontier_spec is None and any(
            ps.frontier.seen for ps in old_states):
        raise ValueError(
            "checkpoint holds frontier seen-state but no frontier_spec "
            "was passed — rescaling would silently drop it; call "
            "rescale_state with the job's StateParams"
        )
    if not params.window_refire and any(ps.fired for ps in old_states):
        raise ValueError(
            "checkpoint holds fired-window accumulators but "
            "window_refire is off — rescaling would silently drop "
            "pending late re-firings; call rescale_state with the "
            "job's StateParams"
        )

    new_states = [PartitionState(pid, probe) for pid in range(new_P)]
    global_wm = min(ps.watermark_us for ps in old_states)
    global_max = max(ps.max_ts_us for ps in old_states)
    for nps in new_states:
        nps.watermark_us = global_wm
        nps.max_ts_us = global_max
        nps._ttl_sweep_wm = min(ps._ttl_sweep_wm for ps in old_states)
    new_states[0].evicted_total = sum(ps.evicted_total
                                      for ps in old_states)

    for ps in old_states:
        for k, ts in ps.last_ts.items():
            new_states[_key_part(k, new_P)].last_ts[k] = ts
        for k, v in ps.version.items():
            new_states[_key_part(k, new_P)].version[k] = v
        for k, sess in ps.sessions.items():
            new_states[_key_part(k, new_P)].sessions[k] = list(sess)
        for gkey, src in ps.win.items():
            # slots are [n, sum] or [n, sum, key_set] (window_distinct);
            # counts/sums add, distinct KEY SETS union — both exact
            # partial merges (a fixed-width unpack here crashed on
            # 3-element distinct slots; round-3 review finding)
            slot = new_states[_group_part(gkey, new_P)].win.setdefault(
                gkey, [0, 0.0, set()] if len(src) > 2 else [0, 0.0])
            slot[0] += int(src[0])
            slot[1] += float(src[1])
            if len(src) > 2:
                if len(slot) == 2:
                    slot.append(set())
                slot[2] |= src[2]
        for gkey, hist in ps.winq.items():
            # per-window value histograms merge additively per value
            tgt = new_states[_group_part(gkey, new_P)].winq.setdefault(
                gkey, {})
            for v, c in hist.items():
                tgt[v] = tgt.get(v, 0) + c
        for gkey, eslot in ps.wearly.items():
            # last-early-emission slots merge additively (each partition
            # emitted its own partial; the changelog's next retraction
            # must retract the SUM — same argument as fired slots)
            tgt = new_states[_group_part(gkey, new_P)].wearly.setdefault(
                gkey, [0, 0.0, 0, 0])
            tgt[0] += int(eslot[0])
            tgt[1] += float(eslot[1])
            tgt[2] += int(eslot[2])
            tgt[3] = max(tgt[3], int(eslot[3]))
        for gkey, regs in ps.winh.items():
            # HLL registers merge by elementwise max (exact union)
            tgt_st = new_states[_group_part(gkey, new_P)]
            cur = tgt_st.winh.get(gkey)
            if cur is None:
                tgt_st.winh[gkey] = regs.copy()
            else:
                np.maximum(cur, regs, out=cur)
        for gkey, fslot in ps.fired.items():
            # fired accumulators merge additively like open windows
            # (each partition held a PARTIAL of the window); emitted
            # values also add — every partition emitted its own partial,
            # so the merged changelog's future retraction must retract
            # the SUM of what was emitted. n_emissions = max keeps the
            # "nothing emitted yet" (0) case exact; any positive value
            # only gates whether a -1 precedes the next +1.
            tgt = new_states[_group_part(gkey, new_P)].fired.setdefault(
                gkey, [0, 0.0,
                       set() if params.window_distinct else None,
                       0, 0.0, 0, 0])
            tgt[0] += int(fslot[0])
            tgt[1] += float(fslot[1])
            if fslot[2] is not None and tgt[2] is not None:
                tgt[2] |= fslot[2]
            tgt[3] += int(fslot[3])
            tgt[4] += float(fslot[4])
            tgt[5] += int(fslot[5])
            tgt[6] = max(tgt[6], int(fslot[6]))
        if ps.nfa is not None:
            for k, plist in ps.nfa.partials.items():
                tgt = new_states[_key_part(k, new_P)].nfa
                tgt.partials.setdefault(k, []).extend(plist)
            new_states[0].nfa.truncated += ps.nfa.truncated
        if ps.joiner is not None:
            import pandas as pd

            for side in ("bufL", "bufR"):
                buf = getattr(ps.joiner, side)
                if not len(buf):
                    continue
                part = buf[params.key_col].map(
                    lambda k: _key_part(k, new_P))
                for pid, sub in buf.groupby(part):
                    tgt = getattr(new_states[pid].joiner, side)
                    merged = pd.concat([tgt, sub], ignore_index=True)
                    setattr(new_states[pid].joiner, side, merged)
            new_states[0].joiner.pairs_emitted += ps.joiner.pairs_emitted
        if ps.neardup is not None:
            from gush_ray.state.neardup import bucket_part

            # buckets re-route by the SAME pure function the map phase
            # uses (band exchange), so a resumed run's fragments land on
            # the partition that now owns the bucket
            for bk, owner in ps.neardup.buckets.items():
                pid = int(bucket_part(bk[0], bk[1], new_P)[()])
                new_states[pid].neardup.buckets[bk] = owner
            new_states[0].neardup.evicted_total += (
                ps.neardup.evicted_total)
        if ps.frontier is not None:
            # seen entries re-route by the url-hash rule the map phase's
            # link exchange uses (stable_hash(dst_url) % P == _key_part)
            for u, first in ps.frontier.seen.items():
                new_states[_key_part(u, new_P)].frontier.seen[u] = first
            new_states[0].frontier.evicted_total += (
                ps.frontier.evicted_total)

    # the join buffers must stay ts-sorted per partition (the
    # searchsorted kernel's precondition); the probe params always
    # construct a joiner, so sort unconditionally
    for nps in new_states:
        for side in ("bufL", "bufR"):
            buf = getattr(nps.joiner, side)
            if len(buf):
                setattr(nps.joiner, side,
                        buf.sort_values(params.ts_col, kind="mergesort")
                        .reset_index(drop=True))

    # write FULL snapshot frames for the new layout (atomic per file)
    os.makedirs(os.path.join(state_dir, f"epoch={last:05d}"),
                exist_ok=True)
    new_snap_paths = []
    for pid, nps in enumerate(new_states):
        nps._dirty = set()  # full frame; no delta bookkeeping carries over
        path = snap_path(last, pid)
        tmp = path + f".rescale-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(nps.snapshot_bytes())
        os.replace(tmp, path)
        new_snap_paths.append(path)
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
    new_max = [
        max((max(nps.last_ts.values()) if nps.last_ts else NEG_INF),
            old_min)
        for nps in new_states
    ]
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
               "idle_epochs": 0, "snapshot": new_snap_paths[pid]}
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
            "keys_moved": int(sum(len(ps.last_ts) for ps in old_states)),
            "swept_uncommitted_files": swept}


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
    them at rescale time. Found by the headroom-scale ops drill
    (tools/drill.py): fsck flagged epoch-2 streams with 1.5× the
    manifest's rows after a 32→16 kill+rescale."""
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
                    help="restore the old partitions' delta chains as "
                         "Ray tasks (one per partition) instead of "
                         "serially on this process")
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
