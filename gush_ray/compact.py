"""Small-file compaction for exactly-once output directories.

A long stream writes ``P`` part files per stream per epoch — at 10^12
docs that is millions of small parquet files, and small files are the
classic death of both the filesystem and the readers. Compaction rewrites
a contiguous range of COMMITTED epochs into one file per (stream,
partition):

    {stream}/compact=00000-00012/part-{pid}.parquet

with the same crash-safety contract as the sink itself:

1. compacted files are written temp-then-rename, then synced;
2. a compaction record ``_manifest/compact-{stream}-{a}-{b}.json`` is
   committed atomically — this is the cutover point: readers
   (:meth:`ExactlyOnceSink.committed_files`) prefer the compacted slot
   and ignore the covered per-epoch slots from then on;
3. only AFTER the record is durable are the covered per-epoch data dirs
   deleted. A crash between 2 and 3 leaves both copies; readers already
   use the compacted one, and the next :func:`compact_stream` call
   finishes the cleanup.

Reader contract on a LIVE stream: the cutover is atomic for listings
taken after the record, but a reader that listed files just BEFORE the
record can race the delete in 3 and hit ``FileNotFoundError`` on a
listed per-epoch file — with ``run_continuous(compact_every=)`` this
race is routine, not exotic. Readers must therefore retry the whole
listing+read on ``FileNotFoundError`` (the re-listing sees the
compacted slot and never the deleted dirs);
:meth:`StreamingJob.read_output` does this.

A crash after the ``os.replace`` in 1 but before the record in 2 can
leave an unreferenced ``compact=A-B`` slot whose range will never be
recomputed under the same name (later epochs extend the range). Every
:func:`compact_stream` call therefore deletes, on entry, any
``compact=*`` slot of this stream that has no matching record (plus
stale ``.inprogress-*`` temp dirs); ``gush_ray.fsck`` warns about such
orphans.

Epoch manifests are never touched — lineage, resume and fsck keep
working (epochs stay committed; fsck checks row conservation against the
compacted files for covered ranges). Safe on a live stream: committed
epochs are never replayed, so compacting them cannot race a writer; the
``epoch=final`` flush slot is never compacted.

Merging is footer-cheap streaming (one ParquetWriter per partition,
reading one small epoch file at a time) — memory stays O(one part file).
Run: ``python -m gush_ray.compact OUT_DIR [--stream s ...] [--upto E]``.
"""

from __future__ import annotations

import json
import os
import re
import shutil

import pyarrow.parquet as pq

_REC_RE = re.compile(r"^compact-(?P<stream>.+)-(?P<a>\d{5})-(?P<b>\d{5})\.json$")


def compaction_records(out_dir: str) -> dict[str, list[tuple[int, int]]]:
    """stream -> sorted list of compacted (from, to) inclusive ranges."""
    mdir = os.path.join(out_dir, "_manifest")
    out: dict[str, list[tuple[int, int]]] = {}
    if not os.path.isdir(mdir):
        return out
    for name in os.listdir(mdir):
        m = _REC_RE.match(name)
        if m:
            out.setdefault(m["stream"], []).append(
                (int(m["a"]), int(m["b"])))
    for v in out.values():
        v.sort()
    return out


def compact_slot(a: int, b: int) -> str:
    return f"compact={a:05d}-{b:05d}"


def _cleanup_covered(out_dir: str, stream: str, a: int, b: int) -> None:
    for e in range(a, b + 1):
        d = os.path.join(out_dir, stream, f"epoch={e:05d}")
        if os.path.isdir(d):
            shutil.rmtree(d)


def compact_stream(out_dir: str, stream: str, upto: int | None = None,
                   min_epochs: int = 2) -> dict:
    """Compact the longest uncompacted prefix-adjacent epoch range of one
    stream. Returns a report dict; ``{"compacted": False}`` when there is
    nothing (fewer than ``min_epochs`` eligible epochs)."""
    from gush_ray.sinks.exactly_once import ExactlyOnceSink

    sink = ExactlyOnceSink(out_dir)
    committed = sink.committed_epochs()
    done = compaction_records(out_dir).get(stream, [])
    # finish any interrupted cleanup first (crash between record+delete)
    for a, b in done:
        _cleanup_covered(out_dir, stream, a, b)
    # delete unreferenced compact slots: a crash after os.replace but
    # before the record leaves a slot of unknown completeness whose
    # range never recurs (later epochs extend it), so nothing else
    # would ever reclaim it. Also sweep stale .inprogress temp dirs.
    recorded = {compact_slot(a, b) for a, b in done}
    sdir = os.path.join(out_dir, stream)
    if os.path.isdir(sdir):
        for name in os.listdir(sdir):
            p = os.path.join(sdir, name)
            orphan = (name.startswith("compact=") and name not in recorded)
            stale_tmp = ".inprogress-" in name
            if (orphan or stale_tmp) and os.path.isdir(p):
                shutil.rmtree(p)
    start = done[-1][1] + 1 if done else 0
    end = max(committed) if committed else -1
    if upto is not None:
        end = min(end, upto)
    if end - start + 1 < min_epochs:
        return {"stream": stream, "compacted": False,
                "eligible": max(0, end - start + 1)}

    slot_dir = os.path.join(out_dir, stream, compact_slot(start, end))
    tmp_dir = slot_dir + f".inprogress-{os.getpid()}"
    os.makedirs(tmp_dir, exist_ok=True)
    # group source files by partition id (filename is part-{pid}.parquet)
    by_pid: dict[str, list[str]] = {}
    n_rows = 0
    for e in range(start, end + 1):
        d = os.path.join(out_dir, stream, f"epoch={e:05d}")
        if not os.path.isdir(d):
            continue  # epoch produced no rows for this stream
        for name in sorted(os.listdir(d)):
            if name.endswith(".parquet"):
                by_pid.setdefault(name, []).append(os.path.join(d, name))
    for name, files in sorted(by_pid.items()):
        writer = None
        for f in files:
            t = pq.read_table(f)
            if writer is None:
                writer = pq.ParquetWriter(
                    os.path.join(tmp_dir, name), t.schema,
                    compression="zstd", compression_level=1,
                )
            writer.write_table(t)
            n_rows += t.num_rows
        if writer is not None:
            writer.close()
    if os.path.isdir(slot_dir):
        # same-named slot from a crashed run (already swept above unless
        # it reappeared between the sweep and here): rebuild it
        shutil.rmtree(slot_dir)
    os.replace(tmp_dir, slot_dir)
    os.sync()  # compacted data durable before the record becomes visible

    rec = {"stream": stream, "from": start, "to": end,
           "files": len(by_pid), "rows": n_rows}
    rec_path = os.path.join(
        out_dir, "_manifest", f"compact-{stream}-{start:05d}-{end:05d}.json")
    tmp = rec_path + ".inprogress"
    with open(tmp, "w") as f:
        json.dump(rec, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, rec_path)  # cutover: readers now use the slot
    _cleanup_covered(out_dir, stream, start, end)
    rec["compacted"] = True
    return rec


def compact(out_dir: str, streams: list[str] | None = None,
            upto: int | None = None, min_epochs: int = 2) -> list[dict]:
    """Compact every (or the given) stream; returns per-stream reports."""
    if streams is None:
        streams = [
            n for n in sorted(os.listdir(out_dir))
            if os.path.isdir(os.path.join(out_dir, n))
            and n not in ("_manifest", "_state")
        ]
    return [compact_stream(out_dir, s, upto=upto, min_epochs=min_epochs)
            for s in streams]


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        description="compact committed epochs' small part files")
    ap.add_argument("out_dir")
    ap.add_argument("--stream", action="append", default=None)
    ap.add_argument("--upto", type=int, default=None)
    ap.add_argument("--min-epochs", type=int, default=2)
    args = ap.parse_args(argv)
    reports = compact(args.out_dir, streams=args.stream, upto=args.upto,
                      min_epochs=args.min_epochs)
    print(json.dumps(reports))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
