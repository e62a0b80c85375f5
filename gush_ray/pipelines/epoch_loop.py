"""The streaming epoch loop: gush's production path as a resumable,
exactly-once, watermark-driven Ray Data job.

Graft of GushApp (reference: gush_example/gush.scala:33-36 + §3.1 of
SURVEY.md). Per epoch (one ordered slice of the change stream — the
binlog-cursor analog):

1. ``read_parquet(epoch files)`` → extract (html→text, errors split) →
   deny filters — stateless, zero-copy Arrow ``map_batches`` tasks;
2. one hash shuffle by ``hash(url) % P`` (the run's single partitioning,
   reused by dedup, windows, sessions and NFA state);
3. each partition routed to its named :class:`StateStoreActor` which
   applies V1 dedup → window/session accumulation → NFA, returning the
   deduped change rows + matches + late rows; the routing task writes
   them straight to the exactly-once sink (worker-side, never
   driver-collected) and returns only a one-row summary;
4. the driver computes the new watermark (min over partitions of max
   event time, minus allowed lateness), closes windows/sessions, snapshots
   actor state, and commits the epoch manifest (lineage + metrics).

Resume: ``last_contiguous_epoch`` from the manifests; actors restore from
that epoch's snapshots; replayed epochs are idempotent (actor epoch-cache
+ deterministic sink file names).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from gush_ray.config import EngineConfig
from gush_ray.extract import extract_text_batch, split_errors
from gush_ray.sinks.exactly_once import ExactlyOnceSink
from gush_ray.stages.filters import apply_deny_filters
from gush_ray.stages.nfa import Pattern, Step
from gush_ray.stages.shuffle import PART_COL, add_partition_column
from gush_ray.state.store import (
    NEG_INF,
    POS_INF,
    StateParams,
    get_state_actor,
)

DEFAULT_PATTERN = Pattern(
    steps=(
        Step("first", "change_kind", "insert"),
        Step("recrawl", "change_kind", "update"),
    ),
    within_us=30 * 60 * 1_000_000,
    key="url",
    ts_col="ts_us",
    id_col="version",
)


class StreamingJob:
    def __init__(
        self,
        pages_dir: str,
        out_dir: str,
        cfg: EngineConfig | None = None,
        run_id: str = "default",
        num_partitions: int = 8,
        pattern: Pattern | None = DEFAULT_PATTERN,
        window_size_us: int = 15 * 60 * 1_000_000,
        session_gap_us: int = 30 * 60 * 1_000_000,
    ):
        self.pages_dir = pages_dir
        self.out_dir = out_dir
        self.cfg = cfg or EngineConfig()
        self.run_id = run_id
        self.P = num_partitions
        self.sink = ExactlyOnceSink(out_dir)
        self.params = StateParams(
            key_col="url",
            ts_col="ts_us",
            window_group_cols=("lang", "change_kind"),
            window_size_us=window_size_us,
            session_gap_us=session_gap_us,
            pattern=pattern,
            allowed_lateness_us=self.cfg.allowed_lateness_us,
        )
        self.ckpt_dir = os.path.join(out_dir, "_state")
        self._actors = None

    # ------------------------------------------------------------ setup

    def epoch_files(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.pages_dir, "epoch=*.parquet")))

    def actors(self):
        if self._actors is None:
            self._actors = [
                get_state_actor(self.run_id, pid, self.params)
                for pid in range(self.P)
            ]
        return self._actors

    def kill_actors(self):
        """Simulate a crash: drop all live state."""
        for a in self.actors():
            ray.kill(a)
        self._actors = None

    def _snapshot_path(self, epoch: int, pid: int) -> str:
        return os.path.join(
            self.ckpt_dir, f"epoch={epoch:05d}", f"part-{pid:05d}.pkl"
        )

    # ------------------------------------------------------------- run

    def run(self, resume: bool = True, stop_after: int | None = None) -> dict:
        files = self.epoch_files()
        n_epochs = len(files)
        start_epoch = 0
        actors = self.actors()

        last = self.sink.last_contiguous_epoch() if resume else -1
        if last >= n_epochs:  # data epochs + final flush all committed
            return {"completed": n_epochs - 1, "already_done": True}
        if 0 <= last < n_epochs:
            start_epoch = last + 1
            ray.get(
                [
                    a.restore_from.remote(self._snapshot_path(last, pid))
                    for pid, a in enumerate(actors)
                ]
            )

        watermark = NEG_INF
        for e in range(start_epoch, n_epochs):
            if stop_after is not None and e >= stop_after:
                return {"stopped_at": e, "completed": e - 1}
            watermark = self._run_epoch(e, files[e])

        # end-of-stream flush: close every remaining window/session
        self._flush_final(n_epochs)
        return {"completed": n_epochs - 1, "watermark_us": watermark}

    def _route_fn(self):
        """Build the per-partition routing callable for map_groups.

        Captures only small immutables + the actor handles; writes
        changes/matches/late worker-side via the idempotent sink.
        """
        run_id, params, P = self.run_id, self.params, self.P
        base_dir = self.out_dir
        write_part = ExactlyOnceSink.write_part

        def route(group: pd.DataFrame) -> pd.DataFrame:
            epoch = int(group["__epoch"].iloc[0])
            pid = int(group[PART_COL].iloc[0])
            payload = pa.Table.from_pandas(
                group.drop(columns=[PART_COL, "__epoch"]),
                preserve_index=False,
            )
            actor = get_state_actor(run_id, pid, params)
            out = ray.get(actor.process.remote(epoch, payload))
            write_part(base_dir, "changes", epoch, pid, out["changes"])
            if out["matches"].num_columns:
                write_part(base_dir, "matches", epoch, pid, out["matches"])
            write_part(base_dir, "late", epoch, pid, out["late"])
            write_part(
                base_dir, "sessions", epoch, pid, out["sessions_closed"]
            )
            m = out["metrics"]
            return pd.DataFrame([{"partition_id": pid, **m}])

        return route

    def _run_epoch(self, epoch: int, path: str) -> int:
        ds = rd.read_parquet(path)
        ds = ds.map_batches(
            lambda b: extract_text_batch(b, out_col="text_extracted"),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        ds = ds.map_batches(
            lambda b: split_errors(b)[0], batch_format="pyarrow",
            zero_copy_batch=True,
        )
        ds = apply_deny_filters(ds, self.cfg)

        def prep(b: pa.Table) -> pa.Table:
            b = b.append_column(
                "ts_us", b["warc_ts"].combine_chunks().cast(pa.int64())
            )
            b = b.append_column(
                "__epoch", pa.array(np.full(b.num_rows, epoch, dtype=np.int64))
            )
            # keep the routed payload narrow: state + sink don't need the
            # extracted body duplicated
            return b.drop_columns(["text_extracted", "extract_ok"])

        ds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        ds = add_partition_column(ds, "url", self.P)

        summaries = ds.groupby(PART_COL).map_groups(
            self._route_fn(), batch_format="pandas"
        ).to_pandas()

        actors = self.actors()
        # partitions with no rows this epoch still hold back the watermark
        # only until they've seen data once; min over known maxima (W5)
        max_ts = ray.get([a.max_ts.remote() for a in actors])
        seen = [t for t in max_ts if t > NEG_INF]
        watermark = min(seen) if len(seen) == len(max_ts) else NEG_INF

        closes = ray.get(
            [a.advance_watermark.remote(watermark) for a in actors]
        )
        for pid, c in enumerate(closes):
            ExactlyOnceSink.write_part(
                self.out_dir, "windows", epoch, pid, c["windows"]
            )
            ExactlyOnceSink.write_part(
                self.out_dir, "sessions_wm", epoch, pid, c["sessions"]
            )

        snap_paths = ray.get(
            [
                a.snapshot_to.remote(self._snapshot_path(epoch, pid))
                for pid, a in enumerate(actors)
            ]
        )

        parts = []
        present = set(summaries["partition_id"]) if len(summaries) else set()
        for pid in range(self.P):
            row = (
                summaries[summaries["partition_id"] == pid].iloc[0].to_dict()
                if pid in present
                else {"partition_id": pid, "rows_in": 0}
            )
            row = {k: int(v) if isinstance(v, np.integer) else v
                   for k, v in row.items()}
            row["snapshot"] = snap_paths[pid]
            parts.append(row)
        self.sink.commit_epoch(epoch, int(watermark), parts)
        ray.get([a.commit_epoch.remote(epoch) for a in actors])
        return watermark

    def _flush_final(self, n_epochs: int) -> None:
        """Close all remaining state at end-of-stream (wm → +inf)."""
        actors = self.actors()
        closes = ray.get([a.advance_watermark.remote(POS_INF) for a in actors])
        epoch = n_epochs  # final flush writes into a dedicated epoch slot
        for pid, c in enumerate(closes):
            ExactlyOnceSink.write_part(
                self.out_dir, "windows", epoch, pid, c["windows"]
            )
            ExactlyOnceSink.write_part(
                self.out_dir, "sessions_wm", epoch, pid, c["sessions"]
            )
        self.sink.commit_epoch(
            epoch, POS_INF, [{"partition_id": p, "final_flush": True}
                             for p in range(self.P)]
        )

    # ---------------------------------------------------------- readers

    def read_output(self, stream: str) -> pd.DataFrame:
        files = self.sink.committed_files(stream)
        if not files:
            return pd.DataFrame()
        import pyarrow.parquet as pq

        tabs = [pq.read_table(f) for f in files]
        tabs = [t for t in tabs if t.num_rows]
        if not tabs:
            return pd.DataFrame()
        return pa.concat_tables(tabs, promote_options="default").to_pandas()
