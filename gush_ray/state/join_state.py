"""Stream-stream windowed (interval) join state — the second half of the
north-star "stateful join" family: where the broadcast dimension join
(epoch_loop._map_shard) joins the change stream against a SNAPSHOT, this
joins it against a second live event stream, with per-key buffers held in
partition state and pruned by the shared watermark.

Semantics (Flink/structured-streaming interval join): emit (l, r) for
every same-key pair with ``r.ts - l.ts`` in ``[low_us, high_us]``, each
pair exactly once — at the epoch where the LATER of the two rows
arrives. Per epoch the incremental join is::

    pairs = newL x (bufR + newR)  +  bufL x newR

(buffers are updated AFTER the join, so in-epoch pairs are counted once
by the first term). A buffered left row is dropped once no future right
row can match it (``l.ts + high < wm`` — future rows have ts >= wm);
symmetrically right rows drop at ``r.ts - low < wm``. Buffer size is
therefore bounded by the stream rate x window span per partition, never
by stream length — the 100-TB shape.

Exactly-once: the state is snapshotted with the partition snapshot and
the join output is written through the same idempotent sink slots as the
other streams, so crash/replay re-emits byte-identical pairs.

Reference anchor: gush has no join at all (SURVEY.md §2.5); this is the
graft-required "custom operator" composition (brief: as-of/range joins)
in its streaming form, sharing the searchsorted pair kernel with the
batch operator (stages/joins.interval_pair_indices).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from gush_ray.stages.joins import interval_pair_indices


@dataclass
class JoinSpec:
    """Configuration of the streaming interval join.

    ``low_us``/``high_us``: inclusive bounds on ``r.ts - l.ts``.
    ``left_cols``/``right_cols``: payload columns carried into the output
    next to the key and both timestamps (left payload from the CHANGE
    rows — i.e. post V1 dedup/versioning; right payload from the second
    stream as mapped).
    """

    low_us: int
    high_us: int
    left_cols: tuple[str, ...] = ("version",)
    right_cols: tuple[str, ...] = ()
    # "interval": emit every pair with r.ts - l.ts in [low, high], at the
    # epoch the later row arrives (above). "asof": event-time TEMPORAL
    # join (Flink FOR SYSTEM_TIME AS OF / DuckDB ASOF JOIN) — each right
    # row pairs with the LATEST same-key left row with l.ts <= r.ts,
    # exactly once, emitted when the watermark passes r.ts (only then is
    # the left history at r.ts final: any later-arriving left with
    # l.ts <= r.ts < wm would be late-routed by definition). low/high
    # are ignored in asof mode and must be 0 (the right-admission cut in
    # store._process_join_epoch then reduces to ts >= wm, the late rule).
    mode: str = "interval"
    # asof mode only: LEFT OUTER semantics — a right row with NO
    # same-key left at-or-before its ts still emits, with null l_ts_us
    # and null left payload (DuckDB ASOF LEFT JOIN). Integer left
    # payload columns come back as Arrow int64 WITH NULLS (pandas
    # nullable Int64), so the part schema is identical to inner-mode
    # epochs; float left payloads carry NaN (document when pairing).
    outer: bool = False

    def __post_init__(self):
        if self.mode not in ("interval", "asof"):
            raise ValueError(f"unknown join mode {self.mode!r}")
        if self.outer and self.mode != "asof":
            raise ValueError(
                "outer=True is only implemented for mode='asof' (an "
                "outer interval join needs expiry-time emission of "
                "unmatched lefts — a different state machine)")
        if self.mode == "asof" and (self.low_us, self.high_us) != (0, 0):
            raise ValueError(
                "asof mode ignores the interval bounds — pass "
                "low_us=0, high_us=0")
        if self.low_us > self.high_us:
            raise ValueError(
                f"low_us {self.low_us} > high_us {self.high_us}"
            )
        # output columns live in ONE namespace (_assemble builds a dict):
        # a name shared by both sides would silently overwrite the left
        # payload with right values — and de-sync the empty-epoch schema,
        # which declares the duplicate twice (round-3 review finding).
        # Fail loudly at construction instead.
        dup = set(self.left_cols) & set(self.right_cols)
        if dup:
            raise ValueError(
                f"left_cols and right_cols share output names {sorted(dup)};"
                f" rename one side (the join output has one flat namespace)"
            )
        reserved = {"l_ts_us", "r_ts_us"}
        bad = reserved & (set(self.left_cols) | set(self.right_cols))
        if bad:
            raise ValueError(
                f"payload columns {sorted(bad)} collide with the join's "
                f"timestamp output columns")


class StreamJoinState:
    """Per-partition buffers + incremental pair emission (plain Python,
    unit-testable without Ray — same discipline as PartitionState)."""

    def __init__(self, key_col: str, ts_col: str, spec: JoinSpec):
        self.key_col = key_col
        self.ts_col = ts_col
        self.spec = spec
        self._l_cols = [key_col, ts_col, *spec.left_cols]
        self._r_cols = [key_col, ts_col, *spec.right_cols]
        self.bufL = pd.DataFrame(columns=self._l_cols)
        self.bufR = pd.DataFrame(columns=self._r_cols)
        self.pairs_emitted = 0

    # ---------------------------------------------------------- process

    def out_columns(self) -> list[str]:
        return [self.key_col, "l_ts_us", "r_ts_us",
                *self.spec.left_cols, *self.spec.right_cols]

    def process_epoch(self, new_l: pd.DataFrame,
                      new_r: pd.DataFrame) -> pd.DataFrame:
        """Join this epoch's arrivals against the buffers, then absorb
        them. Deterministic given (state, inputs); the caller is
        responsible for replay idempotence (epoch cache / snapshot)."""
        s = self.spec
        new_l = new_l.reset_index(drop=True)
        new_r = new_r.reset_index(drop=True)
        if s.mode == "asof":
            # temporal join: absorb only — emission is watermark-gated
            # (drain_asof), because the asof match for a right row is
            # final only once no earlier-ts left can still arrive
            self.bufL = pd.concat([self.bufL, new_l[self._l_cols]],
                                  ignore_index=True) \
                if len(new_l) else self.bufL
            self.bufR = pd.concat([self.bufR, new_r[self._r_cols]],
                                  ignore_index=True) \
                if len(new_r) else self.bufR
            return pd.DataFrame(columns=self.out_columns())
        all_r = pd.concat([self.bufR, new_r], ignore_index=True) \
            if len(self.bufR) else new_r
        out_frames = []
        li, ri = interval_pair_indices(
            new_l, all_r, self.key_col, self.ts_col, self.ts_col,
            s.low_us, s.high_us,
        )
        if len(li):
            out_frames.append(self._assemble(new_l, all_r, li, ri))
        li, ri = interval_pair_indices(
            self.bufL, new_r, self.key_col, self.ts_col, self.ts_col,
            s.low_us, s.high_us,
        )
        if len(li):
            out_frames.append(self._assemble(self.bufL, new_r, li, ri))

        self.bufL = pd.concat([self.bufL, new_l[self._l_cols]],
                              ignore_index=True) if len(new_l) else self.bufL
        self.bufR = all_r
        if out_frames:
            out = pd.concat(out_frames, ignore_index=True)
        else:
            out = pd.DataFrame(columns=self.out_columns())
        # deterministic output order regardless of buffer layout history
        out = out.sort_values(
            [self.key_col, "l_ts_us", "r_ts_us"], kind="mergesort"
        ).reset_index(drop=True)
        self.pairs_emitted += len(out)
        return out

    def _assemble(self, ldf: pd.DataFrame, rdf: pd.DataFrame,
                  li: np.ndarray, ri: np.ndarray) -> pd.DataFrame:
        cols = {
            self.key_col: ldf[self.key_col].to_numpy()[li],
            "l_ts_us": ldf[self.ts_col].to_numpy()[li].astype(np.int64),
            "r_ts_us": rdf[self.ts_col].to_numpy()[ri].astype(np.int64),
        }
        for c in self.spec.left_cols:
            cols[c] = ldf[c].to_numpy()[li]
        for c in self.spec.right_cols:
            cols[c] = rdf[c].to_numpy()[ri]
        return pd.DataFrame(cols)

    # ------------------------------------------------------- asof drain

    def drain_asof(self, watermark_us: int) -> pd.DataFrame:
        """asof mode: emit the pairs for every buffered right row with
        ``r.ts < wm`` (their left history is final — any later left with
        a smaller ts would be late-routed), remove them from the buffer,
        and prune the left history to {latest left <= wm per key} ∪
        {lefts with ts > wm} — exactly the rows a future right
        (ts >= wm) can still match. Deterministic given (state, wm), so
        a replayed epoch rewrites the identical part. Left state is
        bounded by key cardinality + in-flight rows — the same bound as
        the V1 dedup map, NOT the stream length."""
        wm = watermark_us
        out_cols = self.out_columns()
        ready_mask = (self.bufR[self.ts_col].to_numpy().astype(np.int64)
                      < wm) if len(self.bufR) else np.zeros(0, dtype=bool)
        if not ready_mask.any():
            out = pd.DataFrame(columns=out_cols)
        else:
            ready = self.bufR[ready_mask].reset_index(drop=True)
            self.bufR = self.bufR[~ready_mask].reset_index(drop=True)
            if not len(self.bufL) and self.spec.outer:
                # no left history at all: outer mode still emits every
                # ready right, all-left-null
                m = ready.assign(
                    **{self.ts_col: ready[self.ts_col].astype(np.int64)},
                    l_ts_us=pd.Series([pd.NA] * len(ready),
                                      dtype="Int64"),
                    **{c: pd.NA for c in self.spec.left_cols})
                out = self._asof_out(m)
            elif len(self.bufL):
                # merge_asof is the vectorized "latest l.ts <= r.ts per
                # key" kernel (direction=backward, exact matches allowed
                # — DuckDB ASOF JOIN's >= semantics). The on-columns are
                # coerced to int64: a buffer seeded from its empty
                # object-dtype frame keeps object dtype through concat,
                # which merge_asof rejects.
                ldf = self.bufL.assign(
                    l_ts_us=self.bufL[self.ts_col].astype(np.int64)
                ).sort_values("l_ts_us",
                              kind="mergesort").reset_index(drop=True)
                rdf = ready.assign(
                    **{self.ts_col: ready[self.ts_col].astype(np.int64)}
                ).sort_values(self.ts_col,
                              kind="mergesort").reset_index(drop=True)
                m = pd.merge_asof(
                    rdf, ldf.drop(columns=[self.ts_col]),
                    left_on=self.ts_col, right_on="l_ts_us",
                    by=self.key_col, direction="backward",
                    allow_exact_matches=True,
                )
                if not self.spec.outer:
                    # inner: unmatched rights drop
                    m = m[m["l_ts_us"].notna()]
                out = self._asof_out(m)
            else:
                out = pd.DataFrame(columns=out_cols)
        if len(self.bufL):
            lt = self.bufL[self.ts_col].to_numpy().astype(np.int64)
            future = lt > wm
            if (~future).any():
                past = self.bufL[~future]
                # latest left at-or-below the watermark, per key (the
                # only past row a future right can asof-match)
                keep_last = (past.sort_values(self.ts_col,
                                              kind="mergesort")
                             .groupby(self.key_col, sort=False,
                                      dropna=False).tail(1))
                self.bufL = pd.concat(
                    [keep_last, self.bufL[future]], ignore_index=True
                ).sort_values([self.key_col, self.ts_col],
                              kind="mergesort").reset_index(drop=True)
        out = out.sort_values(
            [self.key_col, "l_ts_us", "r_ts_us"], kind="mergesort"
        ).reset_index(drop=True)
        self.pairs_emitted += len(out)
        return out

    def _asof_out(self, m: pd.DataFrame) -> pd.DataFrame:
        """Assemble the asof output frame. In outer mode nullable
        columns use pandas Int64 for integer dtypes so the Arrow schema
        (int64 + nulls) is identical to all-matched epochs' parts."""
        cols = {
            self.key_col: m[self.key_col].to_numpy(),
            "r_ts_us": m[self.ts_col].to_numpy().astype(np.int64),
        }
        if self.spec.outer:
            cols["l_ts_us"] = m["l_ts_us"].astype("Int64")
            for c in self.spec.left_cols:
                v = m[c]
                # dtype rule comes from the BUFFER (the column's true
                # type), never from this epoch's values — merge_asof
                # upcasts int lefts to float64 to hold NaN, and a
                # value-driven cast would flip the part schema between
                # epochs. Integer buffers emit nullable Int64 (Arrow
                # int64 + nulls, same type as all-matched parts).
                src_kind = (self.bufL[c].dtype.kind
                            if c in self.bufL.columns else "O")
                if src_kind in "iu":
                    v = v.astype("Int64")
                cols[c] = v
        else:
            cols["l_ts_us"] = m["l_ts_us"].to_numpy().astype(np.int64)
            for c in self.spec.left_cols:
                cols[c] = m[c].to_numpy()
        for c in self.spec.right_cols:
            cols[c] = m[c].to_numpy()
        return pd.DataFrame(cols)[self.out_columns()]

    # ------------------------------------------------------------ prune

    def prune(self, watermark_us: int) -> None:
        """Drop buffer rows no future arrival (ts >= wm) can pair with."""
        if self.spec.mode == "asof":
            # asof retention is handled inside drain_asof (the prune
            # rule is "latest-per-key <= wm", not an interval bound)
            return
        s = self.spec
        if len(self.bufL):
            keep = self.bufL[self.ts_col].to_numpy().astype(np.int64) \
                + s.high_us >= watermark_us
            if not keep.all():
                self.bufL = self.bufL[keep].reset_index(drop=True)
        if len(self.bufR):
            keep = self.bufR[self.ts_col].to_numpy().astype(np.int64) \
                - s.low_us >= watermark_us
            if not keep.all():
                self.bufR = self.bufR[keep].reset_index(drop=True)

    # --------------------------------------------------------- snapshot

    def state(self) -> dict:
        return {
            "bufL": {c: self.bufL[c].to_numpy() for c in self._l_cols},
            "bufR": {c: self.bufR[c].to_numpy() for c in self._r_cols},
            "n_l": len(self.bufL),
            "n_r": len(self.bufR),
            "pairs_emitted": self.pairs_emitted,
        }

    def restore(self, st: dict) -> None:
        self.bufL = pd.DataFrame(st["bufL"]) if st["n_l"] else \
            pd.DataFrame(columns=self._l_cols)
        self.bufR = pd.DataFrame(st["bufR"]) if st["n_r"] else \
            pd.DataFrame(columns=self._r_cols)
        self.pairs_emitted = st.get("pairs_emitted", 0)
