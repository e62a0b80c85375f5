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

Compaction records for whole-dropped ranges are removed just before
the manifests (their slots after). The call is IDEMPOTENT: an
interrupted rewind leaves ``to_epoch`` committed, so simply re-running
it completes the truncation; fsck flags any intermediate state.

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

    # 2a. compaction RECORDS for whole-dropped ranges (before the
    # manifests: a surviving record must never reference epochs that
    # are about to be de-committed and replayed)
    dropped_compactions = []
    for s in streams:
        for a, b in compactions.get(s, []):
            if a > to_epoch:
                fs.remove(fs.join(out_dir, "_manifest",
                                  f"compact-{s}-{a:05d}-{b:05d}.json"))
                dropped_compactions.append((s, a, b))

    # 2b. manifests, highest epoch first — the committed set stays a
    # contiguous prefix at every instant (crash-safety argument in the
    # module docstring)
    for e in sorted(drop, reverse=True):
        fs.remove(fs.join(out_dir, "_manifest", f"epoch={e:05d}.json"))

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
