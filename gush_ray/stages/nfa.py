"""NFA-based CEP pattern matcher (SURVEY.md C3).

Generalizes gush's event-match primitives — type/table filters
(reference: cep/Cep.scala:11-27, InsertEventFlow/UpdateEventFlow) — to
*sequences* of predicate-guarded steps with a ``within`` time bound, e.g.
"insert → k updates within W per url".

Semantics: **skip-till-any-match** with all-runs emission — every
combination of events satisfying the step sequence inside the time bound
is emitted (for a 2-step pattern this is exactly the SQL self-join
oracle's all-pairs semantics, making the matcher DuckDB-checkable).
Events must be fed per key in event-time order; the engine guarantees
that by hash-partitioning on the key and sorting each partition batch
(SURVEY.md §4.2 'Ordering').

The hot path precomputes one boolean numpy vector per step (vectorized
predicate evaluation); the per-event loop then only touches events that
match at least one step.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np
import pandas as pd


@dataclass(frozen=True)
class Step:
    """One NFA state transition: fires when ``column == value`` (or a
    custom vectorized ``predicate`` over the DataFrame).

    ``quantifier``: "1" (exactly one event, default) or "+" (one or
    more: once entered, further events matching this step extend the run;
    all-runs semantics branches on every extension).

    ``negated``: a NOT-step (Flink CEP ``notFollowedBy``): the run is
    KILLED if an event matching this step occurs strictly between the
    surrounding positive steps' matched events (SQL oracle: NOT EXISTS c
    WITH c.ts > prev.ts AND c.ts < next.ts). Only valid between two
    positive steps, and only with contiguity="skip" (strict contiguity
    already kills on any non-advancing event).

    ``max_gap_us``: per-step bound on the gap to the PREVIOUS matched
    event of the run (tighter than the pattern-wide ``within_us``, which
    bounds against the run's start); on a "+" step it also bounds the gap
    between consecutive repetitions."""

    name: str
    column: str | None = None
    value: object | None = None
    predicate: Callable[[pd.DataFrame], np.ndarray] | None = None
    quantifier: str = "1"
    negated: bool = False
    max_gap_us: int | None = None

    def mask(self, df: pd.DataFrame) -> np.ndarray:
        if self.predicate is not None:
            return np.asarray(self.predicate(df), dtype=bool)
        return (df[self.column] == self.value).to_numpy()


@dataclass(frozen=True)
class Pattern:
    steps: tuple[Step, ...]
    within_us: int
    key: str
    ts_col: str = "ts"
    id_col: str | None = None  # column captured per matched step
    # "skip"   = skip-till-any-match: non-matching events are ignored and
    #            every run survives (all-pairs semantics for 2 steps);
    # "strict" = strict contiguity: any event of the key that does not
    #            advance a partial run kills it (consecutive-events match)
    contiguity: str = "skip"
    # hard bound on live partial runs per key: all-runs semantics with a
    # Kleene '+' step branches on every extension (2^n runs for n
    # repeats), so a hot key would hang the engine. When the bound is
    # hit the OLDEST-started runs are dropped deterministically; matches
    # already emitted are unaffected.
    max_partials: int = 64
    # capture EVERY matched event id of a "+" step (emitted as a
    # comma-joined ``{name}_ids`` string column next to the first-id +
    # count), not just (first, count). Each all-runs branch reports the
    # exact id subsequence it matched.
    capture_all: bool = False


@dataclass
class _Partial:
    step_idx: int
    start_us: int
    captured: tuple
    last_us: int = 0  # event time of the most recent matched event
    # set when a negated step matched at this event time: the run may
    # still advance AT that timestamp (the oracle's c.ts < b.ts is
    # strict) but is dead for any strictly later event
    dead_us: int | None = None


def _pos_steps(pattern: Pattern) -> tuple[Step, ...]:
    return tuple(s for s in pattern.steps if not s.negated)


def _empty_matches(pattern: Pattern) -> pd.DataFrame:
    cols: dict = {pattern.key: pd.Series(dtype="object")}
    for s in _pos_steps(pattern):
        cols[f"{s.name}_id"] = pd.Series(dtype="int64")
        if s.quantifier == "+":
            cols[f"{s.name}_n"] = pd.Series(dtype="int64")
            if pattern.capture_all:
                cols[f"{s.name}_ids"] = pd.Series(dtype="object")
    cols["start_us"] = pd.Series(dtype="int64")
    cols["end_us"] = pd.Series(dtype="int64")
    return pd.DataFrame(cols)


def _emit_row(pat: Pattern, pos: tuple[Step, ...], k, captured,
              start_us: int, end_us: int) -> tuple:
    vals: list = [k]
    for s, e in zip(pos, captured):
        vals.append(e[0])
        if s.quantifier == "+":
            if pat.capture_all:
                vals.append(len(e))
                vals.append(",".join(str(x) for x in e))
            else:
                vals.append(e[1])
    vals.append(start_us)
    vals.append(end_us)
    return tuple(vals)


class NFARunner:
    """Carries per-key partial-match state; usable batch-at-a-time.

    The streaming state store holds one runner per partition and calls
    :meth:`process_sorted` once per epoch batch; partials survive across
    calls, and :meth:`prune` drops partials that can no longer complete
    once the watermark passed ``start + within``.
    """

    def __init__(self, pattern: Pattern):
        self.pattern = pattern
        steps = pattern.steps
        if steps and (steps[0].negated or steps[-1].negated):
            raise ValueError(
                "negated steps must sit BETWEEN two positive steps (a "
                "trailing not-step needs window-close semantics; anchor "
                "the pattern with a positive step instead)"
            )
        if any(s.negated for s in steps):
            if pattern.contiguity == "strict":
                raise ValueError(
                    "negated steps require contiguity='skip' (strict "
                    "already kills runs on any non-advancing event)"
                )
            if any(s.negated and s.quantifier != "1" for s in steps):
                raise ValueError("a negated step cannot carry a quantifier")
        self.pos = _pos_steps(pattern)
        # pos-step index i -> negated Steps between pos i and pos i+1:
        # an event matching one of them KILLS runs waiting at step i
        self.neg_after: dict[int, list[Step]] = {}
        pi = -1
        for s in steps:
            if s.negated:
                self.neg_after.setdefault(pi, []).append(s)
            else:
                pi += 1
        self.partials: dict[object, list[_Partial]] = {}
        # cumulative count of partial runs dropped by the max_partials cap
        # — surfaced in process metrics so oracle divergence on hot keys is
        # diagnosable (the truncation itself is deterministic but would
        # otherwise be unobservable)
        self.truncated: int = 0
        # keys whose partials changed / were dropped since the last
        # snapshot frame — lets delta frames carry O(touched keys)
        # instead of re-pickling every live run (state/store.py
        # _small_delta_state). Marking is conservative: a key visited by
        # the event loop counts as dirty even if no run advanced (an
        # unchanged upsert is harmless; missing a change is not).
        self._dirty: set = set()
        self._closed: set = set()

    def process_sorted(self, df: pd.DataFrame) -> pd.DataFrame:
        """Feed events (already sorted by (key, ts) within the partition);
        returns completed matches as a DataFrame."""
        pat = self.pattern
        pos = self.pos
        if len(df) == 0:
            return _empty_matches(pat)
        strict = pat.contiguity == "strict"
        cap_all = pat.capture_all
        masks = [s.mask(df) for s in pos]
        # per waiting-position combined kill mask (negated steps)
        kill = {
            i: np.logical_or.reduce([s.mask(df) for s in ss])
            for i, ss in self.neg_after.items()
        }
        any_mask = np.logical_or.reduce(masks + list(kill.values()))
        if not strict and not any_mask.any():
            return _empty_matches(pat)

        keys = df[pat.key].to_numpy()
        ts = df[pat.ts_col].astype("int64").to_numpy()
        ids = (
            df[pat.id_col].to_numpy()
            if pat.id_col is not None
            else np.arange(len(df))
        )
        if (
            not strict
            and not kill
            and not cap_all
            and len(pos) == 2
            and pos[0].quantifier != "+"
            and pos[1].quantifier != "+"
        ):
            # the dominant pattern shape (A then B within W, all-runs) is
            # a per-key interval join — vectorizable; the event loop was
            # ~half the streaming reduce phase (BENCH/BASELINE.md)
            fast = self._two_step_fast(keys, ts, ids, masks)
            if fast is not None:
                return fast
        # strict contiguity must see EVERY event of a key (a non-matching
        # event kills partial runs); skip mode only touches matching rows
        idxs = np.arange(len(df)) if strict else np.nonzero(any_mask)[0]

        n_steps = len(pos)
        last = n_steps - 1
        gaps = [s.max_gap_us for s in pos]
        out_rows: list[tuple] = []
        for i in idxs:
            k = keys[i]
            t = int(ts[i])
            self._dirty.add(k)
            plist = self.partials.get(k)
            if plist is None:
                plist = self.partials[k] = []
            new_partials: list[_Partial] = []
            # advance / extend existing runs (skip mode: the old partial
            # survives too and keeps skipping; strict: only advanced live)
            for p in plist:
                # strictly increasing event time step-to-step (matches the
                # SQL oracles' b.ts > a.ts; equal-ts events never chain)
                in_time = (t - p.start_us <= pat.within_us
                           and t > p.last_us
                           and (p.dead_us is None or t <= p.dead_us))
                nxt = p.step_idx + 1
                if (nxt < n_steps and masks[nxt][i] and in_time
                        and (gaps[nxt] is None
                             or t - p.last_us <= gaps[nxt])):
                    entry = (ids[i],) if cap_all else (ids[i], 1)
                    cand = _Partial(
                        nxt, p.start_us, p.captured + (entry,), t
                    )
                    if nxt == last:
                        out_rows.append(
                            _emit_row(pat, pos, k, cand.captured,
                                      p.start_us, t)
                        )
                    if nxt < last or pos[nxt].quantifier == "+":
                        new_partials.append(cand)
                # Kleene +: extend the current step with another match
                si = p.step_idx
                if (
                    pos[si].quantifier == "+"
                    and masks[si][i]
                    and in_time
                    and (gaps[si] is None or t - p.last_us <= gaps[si])
                ):
                    e = p.captured[-1]
                    new_e = e + (ids[i],) if cap_all else (e[0], e[1] + 1)
                    cand = _Partial(
                        si, p.start_us, p.captured[:-1] + (new_e,), t
                    )
                    if si == last:
                        out_rows.append(
                            _emit_row(pat, pos, k, cand.captured,
                                      p.start_us, t)
                        )
                    new_partials.append(cand)
            # negation kills: an event matching a not-step between pos j
            # and j+1 marks runs waiting at j dead-after-t. Strict
            # inequalities mirror the oracle's c.ts > prev.ts AND
            # c.ts < next.ts: a kill event at the SAME ts as the
            # advancing event does not block it (hence dead_us marking
            # instead of removal — expiry reaps dead runs), and a kill
            # at the previous matched event's ts is a no-op.
            if kill:
                for p in plist:
                    km = kill.get(p.step_idx)
                    if (km is not None and km[i] and t > p.last_us
                            and p.dead_us is None):
                        p.dead_us = t
            # start a new run
            if masks[0][i]:
                entry = (ids[i],) if cap_all else (ids[i], 1)
                cand = _Partial(0, t, (entry,), t)
                if n_steps == 1:
                    out_rows.append(
                        _emit_row(pat, pos, k, cand.captured, t, t))
                if n_steps > 1 or pos[0].quantifier == "+":
                    new_partials.append(cand)
            if strict:
                self.partials[k] = new_partials
                continue
            plist.extend(new_partials)
            # bound the run set: expire by time, then hard-cap by
            # keeping the NEWEST-started runs (deterministic truncation)
            if len(plist) > pat.max_partials:
                alive = [
                    p for p in plist if t - p.start_us <= pat.within_us
                ]
                if len(alive) > pat.max_partials:
                    alive.sort(key=lambda p: p.start_us)
                    self.truncated += len(alive) - pat.max_partials
                    alive = alive[-pat.max_partials:]
                self.partials[k] = alive

        if not out_rows:
            return _empty_matches(pat)
        cols = list(zip(*out_rows))
        data = {pat.key: np.asarray(cols[0])}
        j = 1
        for s in pos:
            data[f"{s.name}_id"] = np.asarray(cols[j], dtype="int64")
            j += 1
            if s.quantifier == "+":
                data[f"{s.name}_n"] = np.asarray(cols[j], dtype="int64")
                j += 1
                if cap_all:
                    data[f"{s.name}_ids"] = np.asarray(cols[j],
                                                       dtype="object")
                    j += 1
        data["start_us"] = np.asarray(cols[j], dtype="int64")
        data["end_us"] = np.asarray(cols[j + 1], dtype="int64")
        return pd.DataFrame(data)

    def _two_step_fast(self, keys, ts, ids, masks):
        """Vectorized all-runs matching for 2-step skip patterns.

        Semantics: a step-0 partial (an A event) emits one match per
        later B event of the same key with ``B.ts > A.ts`` and
        ``B.ts - A.ts <= within`` — exactly a per-key interval join,
        computed with ONE ``np.searchsorted`` over composite
        (key_code, rel_ts) int64 probes instead of the per-event loop.

        Returns ``None`` (caller falls back to the exact loop) when the
        vectorization preconditions fail: a key whose live-partial count
        could hit ``max_partials`` (the cap's mid-batch drop semantics
        are only defined by the loop), a time span too wide for the
        42-bit rel-ts packing, or >2^21 distinct keys per batch.
        """
        pat = self.pattern
        pos = self.pos
        # a per-step max_gap on the second step folds into the window:
        # for a 2-step run last_us == start_us, so both bounds are
        # relative to the A event
        within = pat.within_us
        if pos[1].max_gap_us is not None:
            within = min(within, pos[1].max_gap_us)
        m0, m1 = masks
        n = len(keys)
        seg_start = np.nonzero(
            np.concatenate(([True], keys[1:] != keys[:-1]))
        )[0]
        n_seg = len(seg_start)
        if n_seg >= (1 << 21):
            return None
        code = np.searchsorted(seg_start, np.arange(n), side="right") - 1
        ins_per_seg = np.add.reduceat(m0.astype(np.int64), seg_start)

        # gather old partials per distinct key + hot-key guard
        old_code: list[int] = []
        old_start: list[int] = []
        old_id: list = []
        seg_keys = keys[seg_start]
        for k_idx in range(n_seg):
            plist = self.partials.get(seg_keys[k_idx])
            n_old = len(plist) if plist else 0
            if n_old + int(ins_per_seg[k_idx]) > pat.max_partials:
                return None  # cap semantics belong to the loop
            if not plist:
                continue
            for p in plist:
                if p.step_idx != 0:
                    return None  # foreign state shape: loop handles it
                old_code.append(k_idx)
                old_start.append(p.start_us)
                old_id.append(p.captured[0][0])

        ins_rows = np.nonzero(m0)[0]
        upd_rows = np.nonzero(m1)[0]
        ins_code = np.concatenate([
            np.asarray(old_code, dtype=np.int64),
            code[ins_rows],
        ])
        ins_start = np.concatenate([
            np.asarray(old_start, dtype=np.int64),
            ts[ins_rows],
        ])
        try:
            ins_id = np.concatenate([
                np.asarray(old_id, dtype=np.int64),
                np.asarray(ids[ins_rows], dtype=np.int64),
            ])
            upd_id = np.asarray(ids[upd_rows], dtype=np.int64)
        except (ValueError, TypeError):
            return None  # non-integer id column: loop emits it as-is

        out = None
        if len(upd_rows) and len(ins_code):
            base = int(min(ins_start.min(), ts.min()))
            # the packed offset must cover restored partials' starts too
            # (a lateness-delayed batch can carry old starts ABOVE the
            # batch ts range — bounding by ts.max() alone would let an
            # offset bleed into the key-code bits and corrupt pairing)
            span = int(max(ins_start.max(initial=base),
                           int(ts.max()))) - base
            if span >= (1 << 41):
                return None
            order = np.lexsort((ins_start, ins_code))
            ins_code = ins_code[order]
            ins_start = ins_start[order]
            ins_id = ins_id[order]
            comp = (ins_code << np.int64(42)) | (ins_start - base)
            u_code = code[upd_rows].astype(np.int64)
            u_rel = ts[upd_rows] - base
            lo = np.searchsorted(
                comp,
                (u_code << np.int64(42))
                | np.maximum(u_rel - within, 0),
                side="left",
            )
            hi = np.searchsorted(
                comp, (u_code << np.int64(42)) | u_rel, side="left"
            )
            cnt = hi - lo
            total = int(cnt.sum())
            if total:
                offs = np.repeat(np.cumsum(cnt) - cnt, cnt)
                pair = np.arange(total) - offs + np.repeat(lo, cnt)
                rep_u = np.repeat(upd_rows, cnt)
                out = pd.DataFrame({
                    pat.key: keys[rep_u],
                    f"{pos[0].name}_id": ins_id[pair],
                    f"{pos[1].name}_id": np.repeat(upd_id, cnt),
                    "start_us": ins_start[pair],
                    "end_us": ts[rep_u],
                })

        # state update: every A event of this batch becomes a live
        # step-0 partial (identical to what the loop would keep)
        if len(ins_rows):
            ins_ts_batch = ts[ins_rows]
            ins_ids_batch = ids[ins_rows]
            ins_keys_batch = keys[ins_rows]
            for i in range(len(ins_rows)):
                k = ins_keys_batch[i]
                t = int(ins_ts_batch[i])
                self._dirty.add(k)
                plist = self.partials.get(k)
                if plist is None:
                    plist = self.partials[k] = []
                plist.append(
                    _Partial(0, t, ((ins_ids_batch[i], 1),), t)
                )
        return out if out is not None else _empty_matches(pat)

    def prune(self, watermark_us: int) -> None:
        """Drop partials whose within-window closed before the watermark."""
        dead = []
        for k, plist in self.partials.items():
            alive = [
                p for p in plist
                if watermark_us - p.start_us <= self.pattern.within_us
            ]
            if alive:
                if len(alive) != len(plist):
                    self.partials[k] = alive
                    self._dirty.add(k)
            else:
                dead.append(k)
        for k in dead:
            del self.partials[k]
            self._closed.add(k)
            self._dirty.discard(k)

    def state(self) -> dict:
        # partials serialize as plain tuples: pickling dataclass
        # instances goes through per-object reduce + __dict__ and was a
        # measurable share of snapshot/restore time at millions of live
        # runs (one open run per url under the flagship insert→update
        # pattern)
        self._dirty = set()
        self._closed = set()  # a full frame is the new chain baseline
        return {
            "partials": {
                k: [(p.step_idx, p.start_us, p.captured, p.last_us,
                     p.dead_us) for p in plist]
                for k, plist in self.partials.items()
            },
            "truncated": self.truncated,
        }

    def state_delta(self) -> dict:
        """Keys touched since the last frame, as upserts (the key's FULL
        current run list — runs are small per key) + tombstones for keys
        whose runs all expired. Consumed by store.py apply_delta_bytes →
        apply_state_delta."""
        ups = {
            k: [(p.step_idx, p.start_us, p.captured, p.last_us,
                 p.dead_us) for p in self.partials[k]]
            for k in self._dirty if k in self.partials
        }
        tomb = [k for k in self._closed if k not in self.partials]
        self._dirty = set()
        self._closed = set()
        return {"upserts": ups, "tombstones": tomb,
                "truncated": self.truncated}

    def apply_state_delta(self, st: dict) -> None:
        for k, pl in st["upserts"].items():
            self.partials[k] = [_Partial(*t) for t in pl]
        for k in st["tombstones"]:
            self.partials.pop(k, None)
        self.truncated = st["truncated"]
        self._dirty = set()
        self._closed = set()

    def restore(self, st: dict) -> None:
        parts = st["partials"]
        probe = next((pl[0] for pl in parts.values() if pl), None)
        if isinstance(probe, _Partial):
            self.partials = parts  # pre-tuple-format snapshot
        else:
            self.partials = {
                k: [_Partial(*t) for t in pl]
                for k, pl in parts.items()
            }
        self.truncated = st.get("truncated", 0)
        self._dirty = set()
        self._closed = set()


def match_pattern_batch(ds, pattern: Pattern, num_partitions: int = 32):
    """Batch form: one shuffle by hash(key), per-partition sorted NFA run.

    A fresh :class:`NFARunner` per partition (no cross-epoch state) — the
    streaming form lives in the state store.
    """
    from gush_ray.stages.shuffle import partition_map

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([pattern.key, pattern.ts_col], kind="mergesort")
        return NFARunner(pattern).process_sorted(df)

    return partition_map(ds, pattern.key, per_part, num_partitions)
