"""Streaming MinHash/LSH near-duplicate detection for the CEP loop.

The batch near-dup family (stages/dedup.py) answers "which documents in
this CORPUS are near-duplicates"; a crawl pipeline needs the STREAMING
question: *as each page arrives, is it a near-duplicate of any page seen
before it?* This module adds that as a first-class stateful section of
the epoch loop, alongside the row-version dedup / window / session / NFA
state (state/store.py):

* **Map phase** (stateless): each arriving row's text is MinHash-signed
  and banded (the exact kernels of stages/dedup.minhash_batch — fast
  hash for production, md5 mode for the DuckDB oracle), producing
  ``num_bands`` band rows ``(key, ts_us, band_id, band_hash)`` per row.
* **Exchange**: band rows are routed by :func:`bucket_part` — a pure
  function of ``(band_id, band_hash)`` — so every row of one LSH bucket
  lands on the same partition. This is the documented PARTITIONING
  ASSUMPTION of the operator: near-dup state is keyed by bucket, NOT by
  url, so it rides a second keyed fragment space through the same map
  tasks (epoch_loop._map_shard returns ``1 + P + P`` objects), not the
  url-hash exchange.
* **Reduce** (stateful, this module): each partition owns a bucket map
  ``(band_id, band_hash) -> (first_url, first_ts)``. The FIRST arrival
  (by ``(epoch, ts_us, url)`` — epochs in stream order, sorted
  ``(ts_us, url)`` within an epoch) owns a bucket forever (until TTL
  eviction); every later arrival whose url differs from the owner's
  emits one ``near_dups`` row per hit band. A url never duplicates
  itself (recrawls of the same page are version churn, not plagiarism),
  which also makes cross-epoch replays of the same ``(url, ts)`` silent.

Semantics note (deliberate, SQL-pinned): detection runs over non-late
ARRIVALS — per-epoch ``(url, ts)``-deduped rows at or above the restored
watermark — not over the V1 change-survivor stream. The two live in
different key spaces (bucket vs url), so the V1 stale-drop cannot be
known here without a third exchange; an out-of-order older recrawl still
probing the index is the semantics a crawl dedup wants anyway.

State is bounded the same way the dedup maps are: ``ttl_us`` evicts
buckets whose owner timestamp fell behind the watermark by more than the
TTL (amortized sweep), and snapshots carry the bucket map with the same
full-frame / keyed-delta (upserts + tombstones) protocol as every other
keyed section.

Reference note: the reference (simao/gush) has no near-dup concept —
this is a graft-brief operator (LLM-training-data dedup) expressed in
the engine's native state/watermark machinery.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

NEG_INF = -(1 << 62)

# golden-ratio odd constant (splitmix64's increment): decorrelates
# band_id from band_hash so bucket routing never collides bands
_BAND_SALT = np.uint64(0x9E3779B97F4A7C15)


@dataclass(frozen=True)
class NearDupSpec:
    """Configuration of the streaming near-dup section.

    ``hash_fn='md5'`` switches the shingle hash to the
    DuckDB-reproducible one (stages/dedup.md5_hash_strings) so the whole
    streaming operator is SQL-oracle-verifiable; 'fast' is the
    production/bench mode (pd.util.hash_array).
    """

    text_col: str = "text"
    num_perm: int = 64
    num_bands: int = 16
    shingle: int = 3
    seed: int = 1234
    hash_fn: str = "fast"
    # event-time TTL for bucket owners (None = remember forever): a
    # bucket whose owner ts fell behind the watermark by more than the
    # TTL is evicted, so state is bounded by the active horizon — at
    # crawl scale "forever" is the whole corpus's bucket set
    ttl_us: int | None = None

    def __post_init__(self):
        if self.num_perm % self.num_bands:
            raise ValueError(
                f"num_perm ({self.num_perm}) must be a multiple of "
                f"num_bands ({self.num_bands})"
            )


def band_rows_batch(table: pa.Table, spec: NearDupSpec,
                    key_col: str = "url",
                    ts_col: str = "ts_us") -> pd.DataFrame:
    """Arriving rows → long-form band rows
    ``(key, ts_us, band_id, band_hash)`` (``num_bands`` per input row),
    fully vectorized: one hash pass over every doc's shingles, minimum
    per (doc, perm) via reduceat, FNV fold per band — the exact kernels
    of stages/dedup.minhash_batch/explode_bands, so the streaming and
    batch operators share one hash definition (and one SQL oracle
    scheme)."""
    from gush_ray.stages.dedup import minhash_batch

    df = pd.DataFrame({
        key_col: table[key_col].to_pandas(),
        ts_col: table[ts_col].to_numpy(zero_copy_only=False)
        .astype(np.int64),
        spec.text_col: table[spec.text_col].to_pandas(),
    })
    signed = minhash_batch(df, text_col=spec.text_col,
                           num_perm=spec.num_perm, shingle=spec.shingle,
                           seed=spec.seed, hash_fn=spec.hash_fn)
    n = len(signed)
    if not n:
        return pd.DataFrame({key_col: [], ts_col: [], "band_id": [],
                             "band_hash": []})
    sigs = np.stack(signed["sig"].to_numpy())  # (n, num_perm)
    rpb = spec.num_perm // spec.num_bands
    # fold each band's rows in k order (uint64 wraparound FNV — the SQL
    # twin is list_reduce(... % 2^64), see SQL_STREAMING_NEAR_DUP)
    bh = np.zeros((n, spec.num_bands), dtype=np.uint64)
    for band in range(spec.num_bands):
        chunk = sigs[:, band * rpb:(band + 1) * rpb]
        acc = np.zeros(n, dtype=np.uint64)
        for j in range(rpb):
            acc = acc * np.uint64(1099511628211) + chunk[:, j]
        bh[:, band] = acc
    nb = spec.num_bands
    return pd.DataFrame({
        key_col: np.repeat(signed[key_col].to_numpy(), nb),
        ts_col: np.repeat(signed[ts_col].to_numpy().astype(np.int64), nb),
        "band_id": np.tile(np.arange(nb, dtype=np.int64), n),
        "band_hash": bh.reshape(-1),
    })


def bucket_part(band_id, band_hash, P: int) -> np.ndarray:
    """Partition assignment of a bucket — the routing rule the map phase
    AND checkpoint rescaling must agree on. Pure uint64 arithmetic;
    np.uint64(P) matters (a python-int modulus promotes uint64 % int to
    float64 and corrupts placement — the rescale.py bug class)."""
    bid = np.asarray(band_id, dtype=np.uint64)
    bh = np.asarray(band_hash, dtype=np.uint64)
    return ((bh ^ (bid * _BAND_SALT)) % np.uint64(P)).astype(np.int64)


class NearDupState:
    """One partition's bucket-owner map + the emit logic. Mirrors the
    NFARunner interface (state/state_delta/apply_state_delta/restore +
    dirty/closed tracking) so store.py snapshots it like every other
    keyed section."""

    def __init__(self, spec: NearDupSpec):
        self.spec = spec
        # (band_id, band_hash) -> (owner_url, owner_ts)
        self.buckets: dict = {}
        self.evicted_total: int = 0
        self._ttl_sweep_wm: int = NEG_INF
        self._dirty: set = set()
        self._evicted: set = set()

    # ------------------------------------------------------------ epoch

    def process(self, df: pd.DataFrame, watermark_us: int,
                key_col: str, ts_col: str) -> pd.DataFrame:
        """One epoch's band rows → emitted near-dup rows.

        Vectorized: per-epoch ``(key, ts, band)`` dedup + ``(ts, key)``
        sort, ONE dict-get pass for state owners (O(batch), the
        last_ts.get pattern of store.py), groupby-transform for
        within-epoch first arrivals — no per-bucket Python groups."""
        if len(df):
            # late rows: below the restored watermark — same rule as the
            # changes stream (they were routed to the late side-output
            # by the url-keyed reduce; the bucket index must not see
            # them either, or a resumed run would diverge)
            ts = df[ts_col].to_numpy().astype(np.int64)
            df = df[ts >= watermark_us]
        if len(df):
            # band_hash in the dedup subset: only EXACT replay rows may
            # collapse (all four columns equal → any survivor is the
            # same row, so fragment-concat order cannot matter). Two
            # rows sharing (url, ts) with DIFFERENT texts both probe —
            # note the SQL oracle assumes text is functionally dependent
            # on (url, ts), which the fixtures guarantee.
            df = df.drop_duplicates(
                [key_col, ts_col, "band_id", "band_hash"])
            df = df.sort_values([ts_col, key_col], kind="mergesort")
        if not len(df):
            return pd.DataFrame({key_col: [], ts_col: [], "band_id": [],
                                 "dup_of": [], "dup_of_ts": []})

        keys = df[key_col].to_numpy()
        tss = df[ts_col].to_numpy().astype(np.int64)
        bids = df["band_id"].to_numpy().astype(np.int64)
        bhs = df["band_hash"].to_numpy().astype(np.uint64)
        bucket_keys = list(zip(bids.tolist(), bhs.tolist()))

        get = self.buckets.get
        state_owner = [get(bk) for bk in bucket_keys]
        has_state = np.fromiter((o is not None for o in state_owner),
                                dtype=bool, count=len(df))

        # within-epoch first arrival per bucket (df already in
        # (ts, key) order, so 'first' == the deterministic owner)
        g = df.groupby(["band_id", "band_hash"], sort=False)
        first_key = g[key_col].transform("first").to_numpy()
        first_ts = g[ts_col].transform("first").to_numpy().astype(np.int64)

        owner_key = np.where(
            has_state,
            np.array([o[0] if o is not None else None
                      for o in state_owner], dtype=object),
            first_key,
        )
        owner_ts = np.where(
            has_state,
            np.fromiter((o[1] if o is not None else 0
                         for o in state_owner),
                        dtype=np.int64, count=len(df)),
            first_ts,
        )
        emit = owner_key != keys

        # adopt new buckets: first row of each previously-unowned bucket
        new_mask = ~has_state
        if new_mask.any():
            nd = df[new_mask].drop_duplicates(["band_id", "band_hash"],
                                              keep="first")
            new_keys = list(zip(nd["band_id"].tolist(),
                                nd["band_hash"].tolist()))
            self.buckets.update(
                zip(new_keys,
                    zip(nd[key_col].tolist(),
                        nd[ts_col].astype("int64").tolist()))
            )
            self._dirty.update(new_keys)

        out = pd.DataFrame({
            key_col: keys[emit],
            ts_col: tss[emit],
            "band_id": bids[emit],
            "dup_of": owner_key[emit],
            "dup_of_ts": owner_ts[emit],
        })
        return out

    # -------------------------------------------------------------- TTL

    def prune(self, watermark_us: int) -> int:
        """Evict buckets whose owner fell behind the watermark by more
        than the TTL. Amortized exactly like store.py's dedup sweep: the
        full-dict scan runs at most once per TTL/8 of watermark
        progress."""
        ttl = self.spec.ttl_us
        if ttl is None or watermark_us <= NEG_INF:
            return 0
        if (self._ttl_sweep_wm > NEG_INF
                and watermark_us - self._ttl_sweep_wm < ttl // 8):
            return 0
        self._ttl_sweep_wm = watermark_us
        cut = watermark_us - ttl
        dead = [bk for bk, (_, ts) in self.buckets.items() if ts < cut]
        for bk in dead:
            del self.buckets[bk]
            self._evicted.add(bk)
            self._dirty.discard(bk)
        self.evicted_total += len(dead)
        return len(dead)

    def cap(self, cap_keys: int, watermark_us: int) -> int:
        """Capacity-wall bound (StateParams.state_keys_cap): evict the
        OLDEST sub-watermark bucket owners down to ~90% of the cap when
        the map crosses it — the TTL eviction made adaptive (same
        cleared-state semantics and delta-frame bookkeeping; cutoff
        from store.PartitionState.cap_cutoff_ts)."""
        from gush_ray.state.store import PartitionState

        cut = PartitionState.cap_cutoff_ts(
            (ts for (_, ts) in self.buckets.values()),
            len(self.buckets), cap_keys, watermark_us)
        if cut is None:
            return 0
        dead = [bk for bk, (_, ts) in self.buckets.items() if ts < cut]
        for bk in dead:
            del self.buckets[bk]
            self._evicted.add(bk)
            self._dirty.discard(bk)
        self.evicted_total += len(dead)
        return len(dead)

    # -------------------------------------------------- snapshot frames

    def state(self) -> dict:
        """Full-frame section; building it resets the delta tracking
        (the full frame is the new chain baseline)."""
        self._dirty = set()
        self._evicted = set()
        return {
            "buckets": dict(self.buckets),
            "evicted_total": self.evicted_total,
            "ttl_sweep_wm": self._ttl_sweep_wm,
        }

    def state_delta(self) -> dict:
        ups = {bk: self.buckets[bk] for bk in self._dirty
               if bk in self.buckets}
        tomb = [bk for bk in self._evicted if bk not in self.buckets]
        self._dirty = set()
        self._evicted = set()
        return {"upserts": ups, "tombstones": tomb,
                "evicted_total": self.evicted_total,
                "ttl_sweep_wm": self._ttl_sweep_wm}

    def apply_state_delta(self, st: dict) -> None:
        self.buckets.update(st["upserts"])
        for bk in st["tombstones"]:
            self.buckets.pop(bk, None)
        self.evicted_total = st["evicted_total"]
        self._ttl_sweep_wm = st["ttl_sweep_wm"]
        self._dirty = set()
        self._evicted = set()

    def restore(self, st: dict) -> None:
        self.buckets = dict(st["buckets"])
        self.evicted_total = st.get("evicted_total", 0)
        self._ttl_sweep_wm = st.get("ttl_sweep_wm", NEG_INF)
        self._dirty = set()
        self._evicted = set()
