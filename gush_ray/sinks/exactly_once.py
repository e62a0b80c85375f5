"""Idempotent exactly-once Parquet sink with per-partition lineage manifests.

Graft-only operator S8 (SURVEY.md §2.1): the reference loses its cursor on
restart (binlog file+position only logged at connect,
binlog/BinlogServerReader.scala:23; reconnect re-reads from server default,
BinlogRemoteReaderActor.scala:49-52 — data loss or duplication). Here:

* every output file is keyed ``{stream}/epoch={e}/part-{pid}.parquet`` and
  written temp-then-atomic-rename, so a replayed (partition, epoch) task
  deterministically overwrites its own output — idempotent under retry;
* an epoch is COMMITTED only when ``_manifest/epoch={e}.json`` exists; the
  manifest carries the watermark and per-partition lineage + metrics
  (rows in/out, inserts/updates/dups/late, matches, state snapshot path);
* resume = max contiguous committed epoch; uncommitted partials are
  ignored by readers and overwritten on replay.

On a real cluster ``base_dir`` is shared storage (NFS/S3); the layout
and commit protocol are identical, and the sink goes through the
``gush_ray.fs`` URI seam: plain paths and ``file://`` URIs use the
zero-overhead local adapter, any other scheme (``memory://``,
``s3://``) an fsspec adapter with the same operation set (object-store
semantics documented in gush_ray/fs.py).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from gush_ray.fs import get_fs


class ExactlyOnceSink:
    def __init__(self, base_dir: str):
        self.fs, self.base_dir = get_fs(base_dir)
        self.manifest_dir = self.fs.join(self.base_dir, "_manifest")
        self.fs.makedirs(self.manifest_dir)

    # ---- data files (called from workers; must be self-contained) ----

    @staticmethod
    def write_part(base_dir: str, stream: str, epoch: "int | str",
                   partition_id: int, table: pa.Table) -> dict:
        """Atomic idempotent write of one (stream, epoch, partition) file.

        ``epoch`` may be the string label ``"final"`` for the
        end-of-stream flush (its own slot — it must never occupy an
        integer epoch a future appended data epoch would use).

        Static so map tasks can call it with only strings/ints captured.
        """
        if table.num_rows == 0:
            # skip empty outputs entirely: an empty table's schema may be
            # a typeless placeholder (e.g. empty window groups) and would
            # poison concat on read; readers already tolerate missing files
            return {"path": None, "rows": 0}
        fs, base_dir = get_fs(base_dir)
        slot = f"epoch={epoch:05d}" if isinstance(epoch, int) else f"epoch={epoch}"
        d = fs.join(base_dir, stream, slot)
        fs.makedirs(d)
        final = fs.join(d, f"part-{partition_id:05d}.parquet")
        tmp = final + f".inprogress-{os.getpid()}"
        # zstd-1 over default snappy: ~2-3x smaller on web text for a few
        # ms/MB of parallel CPU — disk bandwidth is the shared resource
        # all partitions contend for at high CPU counts (the 4→16 cpu
        # scaling leg concentrates the same bytes into 1/3 the wall time)
        with fs.open(tmp, "wb") as f:
            pq.write_table(table, f, compression="zstd",
                           compression_level=1)
        fs.replace(tmp, final)  # atomic on POSIX: replay overwrites
        # durability note: data files are made durable by the single
        # os.sync() in commit_epoch — the manifest is the commit point,
        # so per-file fsyncs (hundreds per epoch) are unnecessary latency
        return {"path": final, "rows": table.num_rows}

    # ---- manifest / commit protocol (driver-side) ----

    def _manifest_path(self, epoch: int) -> str:
        return self.fs.join(self.manifest_dir, f"epoch={epoch:05d}.json")

    def commit_epoch(self, epoch: int, watermark_us: int,
                     partitions: list[dict], extra: dict | None = None) -> None:
        # flush all of this epoch's data files in ONE pass before the
        # manifest becomes visible: a committed manifest must never
        # reference data the filesystem could still lose
        self.fs.sync()
        payload = {
            "epoch": epoch,
            "watermark_us": watermark_us,
            "partitions": partitions,
        }
        # hot-key imbalance telemetry: keyed state pins a hot key to one
        # partition by construction (same as Flink), so per-epoch input
        # skew is the first operational symptom of a hot url. Recorded
        # per manifest: max/mean rows_in across partitions (1.0 =
        # perfectly balanced) plus the argmax partition — an operator
        # watching manifests (or gush_ray.metrics) sees the skew without
        # touching data files.
        rows = [int(p.get("rows_in", 0)) for p in partitions]
        if rows and sum(rows):
            mean = sum(rows) / len(rows)
            payload["skew"] = {
                "max_rows_in": max(rows),
                "mean_rows_in": round(mean, 1),
                "imbalance": round(max(rows) / mean, 3),
                "argmax_partition": int(rows.index(max(rows))),
            }
        if extra:
            payload.update(extra)
        tmp = self._manifest_path(epoch) + ".inprogress"
        with self.fs.open(tmp, "w") as f:
            json.dump(payload, f)
            self.fs.fsync(f)
        self.fs.replace(tmp, self._manifest_path(epoch))

    def committed_epochs(self) -> list[int]:
        out = []
        for name in self.fs.listdir(self.manifest_dir):
            if name.startswith("epoch=") and name.endswith(".json"):
                out.append(int(name[len("epoch="):-len(".json")]))
        return sorted(out)

    # ---- final-flush slot -------------------------------------------

    def _final_path(self) -> str:
        return self.fs.join(self.manifest_dir, "final.json")

    def commit_final(self, payload: dict) -> None:
        tmp = self._final_path() + ".inprogress"
        with self.fs.open(tmp, "w") as f:
            json.dump(payload, f)
            self.fs.fsync(f)
        self.fs.replace(tmp, self._final_path())

    def final_committed(self) -> bool:
        return self.fs.exists(self._final_path())

    def read_final(self) -> dict:
        with self.fs.open(self._final_path(), "r") as f:
            return json.load(f)

    def last_contiguous_epoch(self) -> int:
        """Resume point: highest e such that 0..e are all committed."""
        done = set(self.committed_epochs())
        e = -1
        while e + 1 in done:
            e += 1
        return e

    def read_manifest(self, epoch: int) -> dict:
        with self.fs.open(self._manifest_path(epoch), "r") as f:
            return json.load(f)

    def sweep_stale_compactions(self) -> list[tuple[str, int, int]]:
        """Reclaim compaction records with ZERO committed epochs —
        uniquely the signature of a rewind interrupted between
        de-committing a whole-dropped range and removing its record
        (normal compaction covers only committed epochs and never
        touches manifests). Removing the record + its slot BEFORE any
        epoch is replayed prevents the stale merged file from shadowing
        the replayed per-epoch parts once the range re-commits.

        A record with a PARTIALLY committed range (the rewind crashed
        mid-range, highest-first) raises instead: the committed prefix's
        rows live only inside the merged file, so sweeping it would
        destroy committed data — the only safe completion is re-running
        the rewind, which de-commits the rest of the range and then
        drops the record. Called at job start on resume; idempotent.
        Returns the swept ranges."""
        from gush_ray.compact import compact_slot, compaction_records

        committed = set(self.committed_epochs())
        swept = []
        for stream, ranges in compaction_records(self.base_dir).items():
            for a, b in ranges:
                n_com = sum(e in committed for e in range(a, b + 1))
                if n_com == b - a + 1:
                    continue
                if n_com:
                    raise RuntimeError(
                        f"compaction record {stream}:{a}-{b} is only "
                        f"partially committed — an interrupted rewind "
                        f"stopped mid-range; re-run gush_ray.rewind "
                        f"(same --to-epoch) to complete the truncation "
                        f"before resuming")
                self.fs.remove(self.fs.join(
                    self.manifest_dir,
                    f"compact-{stream}-{a:05d}-{b:05d}.json"))
                slot_dir = self.fs.join(self.base_dir, stream,
                                        compact_slot(a, b))
                if self.fs.isdir(slot_dir):
                    self.fs.rmtree(slot_dir)
                swept.append((stream, a, b))
        return swept

    def committed_files(self, stream: str,
                        as_of_epoch: "int | None" = None) -> list[str]:
        """Data files belonging to committed epochs only (reader
        isolation). Epoch ranges rewritten by ``gush_ray.compact`` are
        read from their ``compact=A-B`` slot instead of the (deleted)
        per-epoch slots — the compaction record is the cutover, so a
        crash mid-compaction never hides rows.

        ``as_of_epoch``: TIME TRAVEL — return only the files of epochs
        <= that epoch (the stream exactly as a reader saw it after that
        commit; pairs with gush_ray.rewind, which makes the same cut
        destructive). The final-flush slot is excluded (it belongs to
        the finalized end of the stream, not any epoch prefix). Raises
        when a compacted range SPANS the cut — the merged file can't be
        split back per epoch (same rule as rewind_stream)."""
        from gush_ray.compact import compact_slot, compaction_records

        ranges = compaction_records(self.base_dir).get(stream, [])
        epochs = self.committed_epochs()
        # A record with ZERO committed epochs is a rewind-crash leftover
        # (normal compaction only ever covers committed epochs and never
        # touches manifests): ignore it — the range is uncommitted and
        # correctly invisible; the sweep at the next job start reclaims
        # the record + slot. A record with a committed PREFIX (a rewind
        # in progress de-commits the range highest-first) stays honored:
        # the merged file cannot be split per epoch, so hiding it would
        # read committed epochs as zero rows (the round-4 ADVICE bug) —
        # instead readers racing the rewind may briefly see the range's
        # already-de-committed rows (monotonically shrinking staleness,
        # gone once the record is dropped with the range's last epoch).
        committed_set = set(epochs)
        ranges = [(a, b) for a, b in ranges
                  if any(e in committed_set for e in range(a, b + 1))]
        if as_of_epoch is not None:
            spanning = [(a, b) for a, b in ranges
                        if a <= as_of_epoch < b]
            if spanning:
                raise ValueError(
                    f"compacted range(s) {spanning} span "
                    f"as_of_epoch={as_of_epoch} for stream "
                    f"{stream!r} — merged rows cannot be split back "
                    f"per epoch; read as of the range end or later")
            ranges = [(a, b) for a, b in ranges if b <= as_of_epoch]
            epochs = [e for e in epochs if e <= as_of_epoch]
        covered = {e for a, b in ranges for e in range(a, b + 1)}
        slots = [compact_slot(a, b) for a, b in ranges]
        slots += [f"epoch={e:05d}" for e in epochs if e not in covered]
        if self.final_committed() and as_of_epoch is None:
            slots.append("epoch=final")
        files = []
        for slot in slots:
            d = self.fs.join(self.base_dir, stream, slot)
            if self.fs.isdir(d):
                files.extend(
                    self.fs.uri_of(self.fs.join(d, n))
                    for n in self.fs.listdir(d)
                    if n.endswith(".parquet")
                )
        return files
