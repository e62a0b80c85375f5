"""Streaming URL-frontier discovery for the CEP loop.

A crawler's frontier is the set of urls it has DISCOVERED via links but
not necessarily fetched; the streaming question is: *as each page
arrives, which of its anchor targets are being seen for the first
time?* This module adds that as a stateful section of the epoch loop,
alongside the row-version dedup / window / session / NFA / near-dup
state (state/store.py):

* **Map phase** (stateless): each arriving page's raw html goes through
  the vectorized anchor extraction (stages/web.extract_links_table —
  the exact kernel of the batch ``link_extract`` operator, so streaming
  and batch share one extraction definition and one SQL oracle scheme),
  producing link rows ``(dst_url, ts_us, src_url)``.
* **Exchange**: link rows route by ``stable_hash(dst_url) % P`` — the
  SAME routing rule as the url-keyed main exchange, so a partition's
  frontier state co-locates with the page state of the urls it owns.
  This is the operator's documented PARTITIONING ASSUMPTION: frontier
  state is keyed by the DISCOVERED url (dst), not the discovering page
  (src), so link rows ride a separate keyed fragment space through the
  same map tasks.
* **Reduce** (stateful, this module): each partition owns a seen-map
  ``dst_url -> (first_ts, first_src)``. The FIRST discovery (by
  ``(epoch, ts_us, src_url)`` — epochs in stream order, sorted
  ``(ts_us, src_url)`` within an epoch) emits exactly one ``frontier``
  row; every later link to the same url is silent. Self-links
  (``src == dst``) never discover (a page does not enqueue itself).

Semantics note (deliberate, SQL-pinned): discovery runs over non-late
ARRIVALS — link rows whose page timestamp is at or above the restored
watermark — mirroring the near-dup section's rule, and link rows are
extracted from rows that SURVIVED extraction + deny filtering (a
malformed page contributes no links). Exact cross-epoch replays of a
page re-probe the seen-map and stay silent, so the ``frontier`` stream
is exactly-once per discovered url.

State is bounded like the other keyed sections: ``ttl_us`` evicts
entries whose first-seen timestamp fell behind the watermark by more
than the TTL (amortized sweep; an evicted url re-emits if rediscovered
— Flink cleared-state semantics), and snapshots carry the seen-map with
the same full-frame / keyed-delta (upserts + tombstones) protocol.

Reference note: the reference (simao/gush) has no crawl concept — this
is a graft-brief operator (web-scale ingestion) expressed in the
engine's native state/watermark machinery.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

NEG_INF = -(1 << 62)


@dataclass(frozen=True)
class FrontierSpec:
    """Configuration of the streaming frontier section."""

    html_col: str = "html"
    # canonicalize discovered urls before dedup (stages/web 5-rule set)
    # — a real crawler's frontier always canonicalizes, or every surface
    # variant of one page gets crawled; self-links are dropped on the
    # CANONICAL form (the discovering page's url is canonical already)
    canonicalize: bool = False
    # event-time TTL for seen entries (None = remember forever): at
    # crawl scale "forever" is the whole discovered url set; a TTL
    # bounds state to the active horizon at the cost of re-emitting a
    # url rediscovered after eviction
    ttl_us: int | None = None


def link_rows_batch(table: pa.Table, spec: FrontierSpec,
                    key_col: str = "url",
                    ts_col: str = "ts_us") -> pa.Table:
    """Arriving page rows → long-form link rows
    ``(dst_url, ts_us, src_url)``, one per anchor, Arrow end to end
    (no pandas round trip on the map hot path) via
    stages/web.extract_links_table. Self-links are dropped here, once,
    so neither the exchange nor the state ever carries them."""
    import pyarrow.compute as pc

    from gush_ray.stages.web import extract_links_table

    if spec.html_col not in table.column_names or table.num_rows == 0:
        return pa.table({"dst_url": pa.array([], type=pa.string()),
                         ts_col: pa.array([], type=pa.int64()),
                         "src_url": pa.array([], type=pa.string())})
    # one extraction pass keyed by row index; src/ts rejoin by take
    idx_tbl = pa.table({
        "url": pa.array(np.arange(table.num_rows, dtype=np.int64)),
        "html": table[spec.html_col],
    })
    links = extract_links_table(idx_tbl)
    parents = pa.array(
        links["src_url"].to_numpy(zero_copy_only=False))
    dst = links["dst_url"]
    src = table[key_col].combine_chunks().take(parents)
    src_cmp = src
    if spec.canonicalize:
        from gush_ray.stages.web import canonicalize_urls

        # self-drop compares CANONICAL forms on BOTH sides: a page whose
        # own url is non-canonical must still never discover itself via
        # an exact (or variant) self-link. The emitted src stays raw —
        # it is the stream key of the discovering page.
        dst = canonicalize_urls(dst)
        src_cmp = canonicalize_urls(src)
    out = pa.table({
        "dst_url": dst,
        ts_col: table[ts_col].combine_chunks()
        .cast(pa.int64()).take(parents),
        "src_url": src,
    })
    return out.filter(pc.not_equal(dst, src_cmp))


class FrontierState:
    """One partition's seen-map + the emit logic. Mirrors the
    NearDupState interface (state/state_delta/apply_state_delta/restore
    + dirty/evicted tracking) so store.py snapshots it like every other
    keyed section."""

    def __init__(self, spec: FrontierSpec):
        self.spec = spec
        # dst_url -> (first_ts, first_src)
        self.seen: dict = {}
        self.evicted_total: int = 0
        self._ttl_sweep_wm: int = NEG_INF
        self._dirty: set = set()
        self._evicted: set = set()

    # ------------------------------------------------------------ epoch

    def process(self, df: pd.DataFrame, watermark_us: int,
                ts_col: str) -> pd.DataFrame:
        """One epoch's link rows → newly-discovered frontier rows.

        Vectorized: late drop + exact-replay dedup + ``(ts, src, dst)``
        sort, ONE dict-get pass over the state (O(batch)), keep-first
        per dst within the epoch — no per-url Python groups."""
        if len(df):
            ts = df[ts_col].to_numpy().astype(np.int64)
            df = df[ts >= watermark_us]
        if len(df):
            # exact replays (same page arriving twice) produce identical
            # link rows; collapsing them is order-independent
            df = df.drop_duplicates(["dst_url", ts_col, "src_url"])
            df = df.sort_values([ts_col, "src_url", "dst_url"],
                                kind="mergesort")
            # within-epoch first discovery per dst (df already sorted)
            df = df.drop_duplicates(["dst_url"], keep="first")
        if not len(df):
            return pd.DataFrame({"url": pd.Series(dtype=object),
                                 ts_col: pd.Series(dtype=np.int64),
                                 "discovered_from": pd.Series(dtype=object)})

        dsts = df["dst_url"].to_numpy()
        contains = self.seen.__contains__
        new_mask = np.fromiter((not contains(d) for d in dsts),
                               dtype=bool, count=len(df))
        nd = df[new_mask]
        new_urls = nd["dst_url"].tolist()
        self.seen.update(
            zip(new_urls,
                zip(nd[ts_col].astype("int64").tolist(),
                    nd["src_url"].tolist()))
        )
        self._dirty.update(new_urls)
        return pd.DataFrame({
            "url": nd["dst_url"].to_numpy(),
            ts_col: nd[ts_col].to_numpy().astype(np.int64),
            "discovered_from": nd["src_url"].to_numpy(),
        })

    # -------------------------------------------------------------- TTL

    def prune(self, watermark_us: int) -> int:
        """Evict entries whose first-seen ts fell behind the watermark
        by more than the TTL (amortized: full scan at most once per
        TTL/8 of watermark progress, same schedule as store.py)."""
        ttl = self.spec.ttl_us
        if ttl is None or watermark_us <= NEG_INF:
            return 0
        if (self._ttl_sweep_wm > NEG_INF
                and watermark_us - self._ttl_sweep_wm < ttl // 8):
            return 0
        self._ttl_sweep_wm = watermark_us
        cut = watermark_us - ttl
        dead = [u for u, (ts, _) in self.seen.items() if ts < cut]
        for u in dead:
            del self.seen[u]
            self._evicted.add(u)
            self._dirty.discard(u)
        self.evicted_total += len(dead)
        return len(dead)

    def cap(self, cap_keys: int, watermark_us: int) -> int:
        """Capacity-wall bound (StateParams.state_keys_cap): evict the
        OLDEST sub-watermark seen-entries down to ~90% of the cap when
        the map crosses it (re-discovery semantics, same trade as the
        TTL; cutoff from store.PartitionState.cap_cutoff_ts)."""
        from gush_ray.state.store import PartitionState

        cut = PartitionState.cap_cutoff_ts(
            (ts for (ts, _) in self.seen.values()),
            len(self.seen), cap_keys, watermark_us)
        if cut is None:
            return 0
        dead = [u for u, (ts, _) in self.seen.items() if ts < cut]
        for u in dead:
            del self.seen[u]
            self._evicted.add(u)
            self._dirty.discard(u)
        self.evicted_total += len(dead)
        return len(dead)

    # -------------------------------------------------- snapshot frames

    def state(self) -> dict:
        self._dirty = set()
        self._evicted = set()
        return {
            "seen": dict(self.seen),
            "evicted_total": self.evicted_total,
            "ttl_sweep_wm": self._ttl_sweep_wm,
        }

    def state_delta(self) -> dict:
        ups = {u: self.seen[u] for u in self._dirty if u in self.seen}
        tomb = [u for u in self._evicted if u not in self.seen]
        self._dirty = set()
        self._evicted = set()
        return {"upserts": ups, "tombstones": tomb,
                "evicted_total": self.evicted_total,
                "ttl_sweep_wm": self._ttl_sweep_wm}

    def apply_state_delta(self, st: dict) -> None:
        self.seen.update(st["upserts"])
        for u in st["tombstones"]:
            self.seen.pop(u, None)
        self.evicted_total = st["evicted_total"]
        self._ttl_sweep_wm = st["ttl_sweep_wm"]
        self._dirty = set()
        self._evicted = set()

    def restore(self, st: dict) -> None:
        self.seen = dict(st["seen"])
        self.evicted_total = st.get("evicted_total", 0)
        self._ttl_sweep_wm = st.get("ttl_sweep_wm", NEG_INF)
        self._dirty = set()
        self._evicted = set()
