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

import pyarrow.parquet as pq

from gush_ray.fs import LocalFS, get_fs

_REC_RE = re.compile(r"^compact-(?P<stream>.+)-(?P<a>\d{5})-(?P<b>\d{5})\.json$")


def compaction_records(out_dir: str) -> dict[str, list[tuple[int, int]]]:
    """stream -> sorted list of compacted (from, to) inclusive ranges."""
    fs, out_dir = get_fs(out_dir)
    mdir = fs.join(out_dir, "_manifest")
    out: dict[str, list[tuple[int, int]]] = {}
    if not fs.isdir(mdir):
        return out
    for name in fs.listdir(mdir):
        m = _REC_RE.match(name)
        if m:
            out.setdefault(m["stream"], []).append(
                (int(m["a"]), int(m["b"])))
    for v in out.values():
        v.sort()
    return out


def compact_slot(a: int, b: int) -> str:
    return f"compact={a:05d}-{b:05d}"


def _cleanup_covered(fs, out_dir: str, stream: str, a: int, b: int) -> None:
    for e in range(a, b + 1):
        d = fs.join(out_dir, stream, f"epoch={e:05d}")
        if fs.isdir(d):
            fs.rmtree(d)


def _merge_partition_local(out_dir: str, build_dir: str, name: str,
                           files: list[str]) -> int:
    """Stream-merge one partition's epoch files into the build dir;
    returns rows written. Footer-cheap: one file in memory at a time.

    Schema drift across epochs (a column appearing mid-stream flows
    through the engine into later epochs' output) must not break
    compaction: the target schema is the permissive unification of all
    footers — a footer-only pre-pass, no data read — and each file is
    promoted to it (absent columns → nulls, widened types cast) before
    writing. A live stream whose producer adds a column therefore
    stays compactable forever."""
    import pyarrow as pa

    fs, _ = get_fs(out_dir)
    schemas = []
    for f in files:
        with fs.open(f, "rb") as rf:
            schemas.append(pq.read_schema(rf))
    schema = pa.unify_schemas(schemas, promote_options="permissive")
    writer = None
    sink_f = None
    rows = 0
    for f in files:
        with fs.open(f, "rb") as rf:
            t = pq.read_table(rf)
        if t.schema != schema:
            cols = [
                t[fld.name].cast(fld.type)
                if fld.name in t.column_names
                else pa.nulls(t.num_rows, fld.type)
                for fld in schema
            ]
            t = pa.table(dict(zip(schema.names, cols)), schema=schema)
        if writer is None:
            sink_f = fs.open(fs.join(build_dir, name), "wb")
            writer = pq.ParquetWriter(sink_f, schema,
                                      compression="zstd",
                                      compression_level=1)
        writer.write_table(t)
        rows += t.num_rows
    if writer is not None:
        writer.close()
        sink_f.close()
    return rows


try:  # Ray-task form of the merge (used when a session exists)
    import ray as _ray_mod

    _merge_partition = _ray_mod.remote(_merge_partition_local)
except ImportError:  # pragma: no cover - ray is always present here
    _merge_partition = None


def compact_stream(out_dir: str, stream: str, upto: int | None = None,
                   min_epochs: int = 2) -> dict:
    """Compact the longest uncompacted prefix-adjacent epoch range of one
    stream. Returns a report dict; ``{"compacted": False}`` when there is
    nothing (fewer than ``min_epochs`` eligible epochs)."""
    from gush_ray.sinks.exactly_once import ExactlyOnceSink

    fs, out_dir = get_fs(out_dir)
    local = isinstance(fs, LocalFS)
    sink = ExactlyOnceSink(out_dir)
    committed = sink.committed_epochs()
    done = compaction_records(out_dir).get(stream, [])
    # finish any interrupted cleanup first (crash between record+delete)
    for a, b in done:
        _cleanup_covered(fs, out_dir, stream, a, b)
    # delete unreferenced compact slots: a crash after the slot rename
    # but before the record leaves a slot of unknown completeness whose
    # range never recurs (later epochs extend it), so nothing else
    # would ever reclaim it. Also sweep stale .inprogress temp dirs.
    recorded = {compact_slot(a, b) for a, b in done}
    sdir = fs.join(out_dir, stream)
    if fs.isdir(sdir):
        for name in fs.listdir(sdir):
            p = fs.join(sdir, name)
            orphan = (name.startswith("compact=") and name not in recorded)
            stale_tmp = ".inprogress-" in name
            if (orphan or stale_tmp) and fs.isdir(p):
                fs.rmtree(p)
    start = done[-1][1] + 1 if done else 0
    end = max(committed) if committed else -1
    if upto is not None:
        end = min(end, upto)
    if end - start + 1 < min_epochs:
        return {"stream": stream, "compacted": False,
                "eligible": max(0, end - start + 1)}

    slot_dir = fs.join(out_dir, stream, compact_slot(start, end))
    # Local: build in a tmp dir, one directory rename publishes the
    # files. Object stores have no atomic directory rename — write into
    # the slot dir directly; that is SAFE under the same protocol,
    # because slot contents are invisible to readers until the RECORD
    # lands, and a crash-partial unrecorded slot is swept on the next
    # call (above).
    build_dir = (slot_dir + f".inprogress-{os.getpid()}") if local         else slot_dir
    if not local and fs.isdir(slot_dir):
        fs.rmtree(slot_dir)
    fs.makedirs(build_dir)
    # group source files by partition id (filename is part-{pid}.parquet)
    by_pid: dict[str, list[str]] = {}
    n_rows = 0
    for e in range(start, end + 1):
        d = fs.join(out_dir, stream, f"epoch={e:05d}")
        if not fs.isdir(d):
            continue  # epoch produced no rows for this stream
        for name in fs.listdir(d):
            if name.endswith(".parquet"):
                by_pid.setdefault(name, []).append(fs.join(d, name))
    # one merge job per partition file name. When a Ray session exists
    # (in-flight compaction inside run_continuous, or a caller that
    # initialized Ray) the merges fan out as tasks — at wide P × many
    # streams the per-partition merges are embarrassingly parallel;
    # standalone CLI runs without Ray stay serial.
    jobs = sorted(by_pid.items())
    try:
        import ray as _ray

        use_ray = _ray.is_initialized() and len(jobs) > 1
    except ImportError:
        use_ray = False
    if use_ray:
        refs = [_merge_partition.remote(out_dir, build_dir, name, files)
                for name, files in jobs]
        n_rows += sum(_ray.get(refs))
    else:
        for name, files in jobs:
            n_rows += _merge_partition_local(out_dir, build_dir, name,
                                             files)
    if local:
        if fs.isdir(slot_dir):
            # same-named slot from a crashed run (already swept above
            # unless it reappeared between the sweep and here): rebuild
            fs.rmtree(slot_dir)
        fs.replace(build_dir, slot_dir)
    fs.sync()  # compacted data durable before the record becomes visible

    rec = {"stream": stream, "from": start, "to": end,
           "files": len(by_pid), "rows": n_rows}
    rec_path = fs.join(
        out_dir, "_manifest", f"compact-{stream}-{start:05d}-{end:05d}.json")
    tmp = rec_path + ".inprogress"
    with fs.open(tmp, "w") as f:
        json.dump(rec, f)
        fs.fsync(f)
    fs.replace(tmp, rec_path)  # cutover: readers now use the slot
    _cleanup_covered(fs, out_dir, stream, start, end)
    rec["compacted"] = True
    return rec


def compact(out_dir: str, streams: list[str] | None = None,
            upto: int | None = None, min_epochs: int = 2) -> list[dict]:
    """Compact every (or the given) stream; returns per-stream reports."""
    fs, out_dir = get_fs(out_dir)
    if streams is None:
        streams = [
            n for n in fs.listdir(out_dir)
            if fs.isdir(fs.join(out_dir, n))
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
