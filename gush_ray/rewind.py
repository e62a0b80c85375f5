"""Rewind a committed stream to an earlier epoch — the ops tool for
"reprocess after a bug fix": truncate the exactly-once output (and the
state chain) back to epoch ``to_epoch``, then ``StreamingJob.run(
resume=True)`` replays every later epoch from the immutable inputs and
— because replay is deterministic given (snapshot, inputs) — rewrites
byte-identical parts for unchanged code, or the corrected parts for
fixed code.

What a rewind removes, in crash-safe order (MANIFESTS FIRST, highest
epoch first: at every instant the committed set stays a contiguous
prefix, and everything already de-committed is plain uncommitted
garbage that a deterministic replay overwrites through the sink's
normal idempotent slots — an interrupted rewind therefore needs no
repair, just resume; the reverse order would leave committed epochs
with missing parts, which resume would silently skip):

1. the ``final`` marker (a finalized stream becomes appendable again —
   that is the point of a rewind);
2. manifests for epochs > ``to_epoch``, highest first;
3. per-stream slot dirs (incl. ``epoch=final``) and state snapshots
   for epochs > ``to_epoch`` (delta chains are unaffected: a chain
   only references EARLIER epochs).

A compaction record for a whole-dropped range is removed immediately
AFTER its range's lowest manifest (its slot in step 3): the record is
the range's only data pointer, so it must outlive the range's
committed epochs — never the reverse (a committed epoch whose pointer
is gone would read as zero rows, the round-4 ADVICE finding). While
the rewind walks DOWN through a range, readers keep seeing the whole
merged slot (``committed_files`` honors a record while ANY of its
epochs is committed — the merged file cannot be split per epoch), so
a reader racing the rewind may briefly see the range's already-
de-committed rows (monotonically shrinking staleness) but NEVER
misses a committed row. The leftover crash window (record present,
range fully de-committed) is reader-invisible and reclaimed by
re-running rewind or by ``sweep_stale_compactions`` at the next job
start, before any epoch is replayed; a crash MID-range makes resume
refuse until the rewind is re-run. The call is IDEMPOTENT: an
interrupted rewind leaves ``to_epoch`` committed, so simply
re-running it completes the truncation; fsck flags any intermediate
state.

Compaction interplay: a compacted range is one merged file — its rows
cannot be split back per epoch. A record whose range lies entirely
above ``to_epoch`` is dropped with its slot; a range that SPANS
``to_epoch`` makes the rewind impossible (the surviving epochs' rows
live only inside the mixed slot) and the call refuses with the ranges
listed — rerun with a ``to_epoch`` at or past the range end.

Reference anchor: gush has no replay tooling (its source is a live
binlog; SURVEY.md §4); this is the graft-side ops requirement of the
exactly-once sink (brief: resumable output), composing the same
manifest/slot/snapshot invariants fsck audits.
"""

from __future__ import annotations

import json

from gush_ray.fs import get_fs


def rewind_stream(out_dir: str, to_epoch: int) -> dict:
    """Truncate ``out_dir`` so ``to_epoch`` is the last committed epoch.
    Returns a report dict; raises ValueError on an impossible rewind."""
    from gush_ray.compact import compact_slot, compaction_records
    from gush_ray.sinks.exactly_once import ExactlyOnceSink

    fs, out_dir = get_fs(out_dir)
    sink = ExactlyOnceSink(out_dir)
    epochs = sink.committed_epochs()
    if not epochs:
        raise ValueError("no committed epochs to rewind")
    if to_epoch not in epochs:
        raise ValueError(
            f"to_epoch {to_epoch} is not a committed epoch {epochs}")
    drop = [e for e in epochs if e > to_epoch]

    compactions = compaction_records(out_dir)
    spanning = [(s, a, b) for s, rs in compactions.items()
                for a, b in rs if a <= to_epoch < b]
    if spanning:
        raise ValueError(
            "compacted range(s) span the rewind point — their rows "
            "cannot be split back per epoch: "
            + ", ".join(f"{s}:{a}-{b}" for s, a, b in spanning)
            + f"; rewind to an epoch >= the range end instead")

    streams = [n for n in fs.listdir(out_dir)
               if fs.isdir(fs.join(out_dir, n))
               and n not in ("_manifest", "_state")]
    removed_files = 0

    def _rm_slot(stream: str, slot: str) -> int:
        d = fs.join(out_dir, stream, slot)
        if not fs.isdir(d):
            return 0
        n = len(fs.listdir(d))
        fs.rmtree(d)
        return n

    # 1. finalized marker: after this the stream is plain "in
    # progress at the last manifest"
    was_final = sink.final_committed()
    if was_final:
        fs.remove(fs.join(out_dir, "_manifest", "final.json"))

    # 2. manifests, highest epoch first — the committed set stays a
    # contiguous prefix at every instant. A whole-dropped compaction
    # RECORD is removed immediately after its range's LOWEST manifest:
    # while any epoch of the range is still committed, the record (its
    # only data pointer — the per-epoch slots were deleted at
    # compaction time) stays visible, so a concurrent reader never sees
    # a committed epoch with zero rows. The converse crash window —
    # record present while its range is already de-committed — is
    # harmless: committed_files ignores records whose range is not
    # fully committed, and both re-running rewind AND a plain resume
    # (ExactlyOnceSink.sweep_stale_compactions at job start) reclaim
    # the leftover record + slot before any epoch is replayed.
    dropped_compactions = []
    committed = set(epochs)
    record_at = {}  # epoch a -> (stream, a, b) records to drop after a
    for s in streams:
        for a, b in compactions.get(s, []):
            if a > to_epoch:
                if a in committed:
                    record_at.setdefault(a, []).append((s, a, b))
                else:
                    # re-run after a crash that already de-committed the
                    # range but not its record: reclaim it now
                    fs.remove(fs.join(out_dir, "_manifest",
                                      f"compact-{s}-{a:05d}-{b:05d}.json"))
                    dropped_compactions.append((s, a, b))
    for e in sorted(drop, reverse=True):
        fs.remove(fs.join(out_dir, "_manifest", f"epoch={e:05d}.json"))
        for s, a, b in record_at.get(e, ()):
            fs.remove(fs.join(out_dir, "_manifest",
                              f"compact-{s}-{a:05d}-{b:05d}.json"))
            dropped_compactions.append((s, a, b))

    # 3. now-uncommitted stream slots + dropped compact slots + final
    # slots
    for s in streams:
        removed_files += _rm_slot(s, "epoch=final")
        for s2, a, b in dropped_compactions:
            if s2 == s:
                removed_files += _rm_slot(s, compact_slot(a, b))
    for s in streams:
        for e in drop:
            removed_files += _rm_slot(s, f"epoch={e:05d}")

    # state snapshots above the rewind point (delta chains reference
    # only EARLIER epochs, so surviving chains stay resolvable)
    state_dir = fs.join(out_dir, "_state")
    if fs.isdir(state_dir):
        for name in fs.listdir(state_dir):
            if not name.startswith("epoch="):
                continue
            try:
                e = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if e > to_epoch:
                d = fs.join(state_dir, name)
                removed_files += len(fs.listdir(d))
                fs.rmtree(d)

    return {
        "rewound_to": to_epoch,
        "dropped_epochs": drop,
        "was_finalized": was_final,
        "dropped_compactions": dropped_compactions,
        "removed_files": removed_files,
    }


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        description="Truncate an exactly-once stream back to an epoch; "
                    "a subsequent resume replays the rest.")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--to-epoch", type=int, required=True)
    args = ap.parse_args(argv)
    print(json.dumps(rewind_stream(args.out_dir, args.to_epoch)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
