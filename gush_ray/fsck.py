"""Lineage audit (fsck) for an exactly-once output directory.

Operational counterpart of the sink's commit protocol (SURVEY.md §2.1 S8:
connection lifecycle → cursor manifests; the reference only LOGS its
binlog cursor, binlog/BinlogServerReader.scala:23 — here the cursor is
checkable state, so it should be CHECKED). Verifies, without loading any
data into memory (parquet footers only):

* manifest contiguity — committed epochs form 0..N with no gaps, and a
  final-flush marker only after every data epoch;
* file integrity — every committed slot's parquet files have readable
  footers; stray ``.inprogress`` temporaries in committed slots are
  flagged (an interrupted replay left them; they are never read, but
  they indicate a task died mid-overwrite);
* row conservation — per epoch, actual parquet rows must equal the
  manifest's per-partition metrics (changes == inserts+updates,
  late == late_rows, matches == matches);
* resume integrity — for the resume point (last contiguous epoch), every
  partition's state snapshot exists and, if it is a DELTA frame, its
  chain of frames back to the full base exists (frame kind read from the
  12-byte header without decompressing).

Run: ``python -m gush_ray.fsck OUT_DIR`` — prints a one-line JSON report,
exit code 1 if any problem was found.
"""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq

from gush_ray.fs import get_fs

# streams whose per-epoch row counts the manifests account for exactly
_CONSERVED = {
    "changes": lambda p: p.get("inserts", 0) + p.get("updates", 0),
    "late": lambda p: p.get("late_rows", 0),
    "matches": lambda p: p.get("matches", 0),
    "near_dups": lambda p: p.get("near_dup_rows", 0),
    "frontier": lambda p: p.get("frontier_rows", 0),
}


def _slot_files(fs, base_dir: str, stream: str, slot: str):
    d = fs.join(base_dir, stream, slot)
    if not fs.isdir(d):
        return [], []
    names = fs.listdir(d)
    parquet = [fs.join(d, n) for n in names if n.endswith(".parquet")]
    stray = [fs.join(d, n) for n in names if ".inprogress" in n]
    return parquet, stray


def audit(out_dir: str) -> dict:
    """Full lineage audit; returns a report dict (see module docstring)."""
    from gush_ray.compact import compact_slot, compaction_records
    from gush_ray.sinks.exactly_once import ExactlyOnceSink
    from gush_ray.state.store import snapshot_base_epoch

    fs, out_dir = get_fs(out_dir)
    sink = ExactlyOnceSink(out_dir)
    problems: list[str] = []
    warnings: list[str] = []
    epochs = sink.committed_epochs()
    n_files = 0
    n_bytes = 0
    compactions = compaction_records(out_dir)

    # 1. contiguity + final marker
    if epochs != list(range(len(epochs))):
        problems.append(f"non-contiguous committed epochs: {epochs}")
    if sink.final_committed() and epochs:
        fin = sink.read_final()
        if fin.get("n_epochs") not in (None, len(epochs)):
            problems.append(
                f"final marker says {fin.get('n_epochs')} epochs, "
                f"manifests commit {len(epochs)}"
            )

    streams = [
        n for n in fs.listdir(out_dir)
        if fs.isdir(fs.join(out_dir, n))
        and n not in ("_manifest", "_state")
    ]

    # 2 + 3. per-epoch file integrity and row conservation (epochs
    # rewritten by compaction are checked per compacted RANGE below)
    covered_by = {
        s: {e for a, b in rs for e in range(a, b + 1)}
        for s, rs in compactions.items()
    }
    for e in epochs:
        man = sink.read_manifest(e)
        parts = man.get("partitions", [])
        slot = f"epoch={e:05d}"
        for stream in streams:
            covered = e in covered_by.get(stream, ())
            files, stray = _slot_files(fs, out_dir, stream, slot)
            for s in stray:
                problems.append(f"stray temp file in committed slot: {s}")
            if covered:
                if files:
                    warnings.append(
                        f"leftover pre-compaction slot (ignored by "
                        f"readers; rerun compact to clean): "
                        f"{stream}/{slot}"
                    )
                continue
            rows = 0
            for f in files:
                try:
                    with fs.open(f, "rb") as rf:
                        rows += pq.read_metadata(rf).num_rows
                    n_files += 1
                    n_bytes += fs.getsize(f)
                except Exception as exc:
                    problems.append(f"unreadable parquet {f}: {exc}")
            expect = _CONSERVED.get(stream)
            if expect is not None and parts:
                want = sum(expect(p) for p in parts)
                if rows != want:
                    problems.append(
                        f"epoch {e} stream {stream}: {rows} rows on disk "
                        f"!= {want} in manifest metrics"
                    )

    # 3a. unreferenced compact slots: a crash after the slot rename but
    # before its record leaves a compact=A-B dir of unknown completeness
    # that no reader uses and — because later epochs extend the range —
    # no future compact run would rebuild under the same name: a silent
    # disk leak unless flagged (compact_stream now sweeps these on entry)
    for stream in streams:
        sdir = fs.join(out_dir, stream)
        recorded = {compact_slot(a, b)
                    for a, b in compactions.get(stream, [])}
        for name in fs.listdir(sdir):
            if name.startswith("compact=") and name not in recorded:
                warnings.append(
                    f"unreferenced compact slot (no record; ignored by "
                    f"readers; rerun compact to reclaim): {stream}/{name}"
                )

    # 3b. compacted ranges: integrity + conservation against the summed
    # manifest metrics of every covered epoch
    committed = set(epochs)
    for stream, ranges in compactions.items():
        seen: set[int] = set()
        for a, b in ranges:
            span = set(range(a, b + 1))
            if span & seen:
                problems.append(
                    f"overlapping compaction ranges for {stream} at "
                    f"{a}-{b}")
            seen |= span
            if not span <= committed:
                problems.append(
                    f"compaction {stream} {a}-{b} covers uncommitted "
                    f"epochs {sorted(span - committed)}")
            files, stray = _slot_files(fs, out_dir, stream,
                                       compact_slot(a, b))
            for s in stray:
                problems.append(f"stray temp file in compacted slot: {s}")
            rows = 0
            for f in files:
                try:
                    with fs.open(f, "rb") as rf:
                        rows += pq.read_metadata(rf).num_rows
                    n_files += 1
                    n_bytes += fs.getsize(f)
                except Exception as exc:
                    problems.append(f"unreadable parquet {f}: {exc}")
            expect = _CONSERVED.get(stream)
            if expect is not None:
                want = 0
                for e in sorted(span & committed):
                    want += sum(expect(p) for p in
                                sink.read_manifest(e).get("partitions", []))
                if rows != want:
                    problems.append(
                        f"compacted {stream} {a}-{b}: {rows} rows on disk "
                        f"!= {want} in manifest metrics"
                    )

    # 4. resume integrity: snapshots + delta chains at the resume point
    resume = sink.last_contiguous_epoch()
    if resume >= 0:
        man = sink.read_manifest(resume)
        state_dir = fs.join(out_dir, "_state")
        for p in man.get("partitions", []):
            snap = p.get("snapshot")
            if not snap:
                continue
            if not fs.exists(snap):
                problems.append(
                    f"resume snapshot missing (epoch {resume}, partition "
                    f"{p.get('partition_id')}): {snap}"
                )
                continue
            with fs.open(snap, "rb") as f:
                base = snapshot_base_epoch(f.read(12))
            if base is None:
                continue  # full frame, self-contained
            fname = snap.rstrip("/").rsplit(fs.sep, 1)[-1]
            for ce in range(base, resume):
                link = fs.join(state_dir, f"epoch={ce:05d}", fname)
                if not fs.exists(link):
                    problems.append(
                        f"snapshot chain broken for partition "
                        f"{p.get('partition_id')}: epoch {resume} is a "
                        f"delta with base {base} but {link} is missing"
                    )

    return {
        "out_dir": out_dir,
        "ok": not problems,
        "epochs_committed": len(epochs),
        "resume_epoch": resume,
        "final": sink.final_committed(),
        "streams": streams,
        "files": n_files,
        "bytes": n_bytes,
        "compactions": {s: [list(r) for r in rs]
                        for s, rs in compactions.items()},
        "problems": problems,
        "warnings": warnings,
    }


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        description="audit an exactly-once output directory's lineage")
    ap.add_argument("out_dir")
    args = ap.parse_args(argv)
    report = audit(args.out_dir)
    print(json.dumps(report))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
