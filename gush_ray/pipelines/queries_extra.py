"""Streaming/CEP pipelines over the synthetic pages stream and the
near-dup / similarity / multimodal operators.

Two verification classes live here:

* **oracle-paired** — the streaming pipeline end-to-end (flagship
  windows, late routing, stream-stream join, extraction byte-parity),
  index ANN at full probe (== exact scan), tolerance-checked sketches,
  the checked Bloom semi join, real media decode vs generator ground
  truth, and (round 3) the whole near-dup family in md5 verification
  hash mode: MinHash-LSH pairs/clusters, SimHash, exact n-gram
  Jaccard, hyperplane-LSH embedding near-dup, content-defined
  chunking, winnowing fingerprints, lang-ID and greedy sequence
  packing. Streaming oracles read the SAME fixture parquet (fixed
  /tmp paths — :func:`ensure_oracle_fixtures`).
* **rows-only** — the four operators whose exact output no SQL can
  reproduce: k-means / semdedup (iterative Lloyd partials are
  batch-boundary-dependent in float ulps even engine-side) and
  multimodal_features / resize (decoder-implementation outputs; a
  fixture oracle would be circular — multimodal_decode's
  generator-ground-truth fixture covers the decode machinery). Each
  has a SQL-paired sibling on a deterministic surface or unit tests
  pinning the semantics (tests/test_clustering.py). Even bloom_semi
  is paired (round 3): the filter is deterministic for a fixed input,
  so the SQL rebuilds its exact bit set. NOT boundaries after round 3: BPE
  train+apply (merge count unrolls as generated CTEs + recursive
  encode), pruned-probe LSH ANN (deterministic seeded planes), and
  the bigram-LM float surfaces lm_perplexity / ccnet_buckets (per-doc
  NLL rounds to a 1e-4 grid before aggregation, collapsing numpy-vs-
  libm log differences).

Each callable is deterministic in ``sf_dir`` (seeded generators, no
wall-clock): repeated invocations return identical rows.
"""

from __future__ import annotations

import os
import shutil
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from gush_ray.datagen import ensure_pages
from gush_ray.sources.warc import WARC_FIXTURE
from gush_ray.stages.dedup import (
    embedding_near_dup_pairs,
    minhash_lsh_pairs,
    simhash_near_dup_pairs,
)
from gush_ray.stages.multimodal import decode_features, sniff_blob_batch
from gush_ray.stages.text import LangIdModel, fingerprint_batch


from gush_ray.pipelines.queries import _read  # size-aware block policy


# Fixed fixture locations shared by the streaming queries AND their
# DuckDB oracles (the oracle SQL must be a static string, so the
# fixtures live at deterministic paths independent of sf_dir; both
# sides read the SAME parquet bytes). ensure_oracle_fixtures()
# materializes them idempotently — __ray_entry__.oracle_sql() calls it
# so the SQL is runnable no matter which side the driver runs first.
PAGES_FIXTURE = "/tmp/gush_ray_pages/u2000_s7_e4_v3"
CLICKS_FIXTURE = "/tmp/gush_ray_clicks/u2000_s7_e4_v1"
_HALF_H_US = 30 * 60 * 1_000_000
_WIN_US = 15 * 60 * 1_000_000
NEG_INF_SQL = -(1 << 62)


def _ensure_clicks() -> str:
    from gush_ray.datagen import write_clicks_dir

    if not os.path.exists(os.path.join(CLICKS_FIXTURE, "_COMPLETE")):
        write_clicks_dir(CLICKS_FIXTURE, n_urls=2_000, seed=7,
                         clicks_per_epoch=1_500, n_epochs=4)
        with open(os.path.join(CLICKS_FIXTURE, "_COMPLETE"), "w") as f:
            f.write("ok")
    return CLICKS_FIXTURE


def ensure_oracle_fixtures() -> None:
    """Materialize every fixed-path fixture the oracle SQL reads
    (idempotent, seconds when cold, no Ray needed)."""
    from gush_ray.datagen import ensure_media_fixture, ensure_video_fixture
    from gush_ray.sources.warc import ensure_warc_fixture

    ensure_pages(n_urls=2_000, seed=7)
    _ensure_clicks()
    ensure_media_fixture()
    ensure_video_fixture()
    ensure_warc_fixture()
    from gush_ray.datagen import ensure_resize_fixture

    ensure_resize_fixture()
    from gush_ray.datagen import ensure_neardup_pages

    ensure_neardup_pages()
    from gush_ray.datagen import ensure_frontier_pages

    ensure_frontier_pages()
    from gush_ray.pipelines.queries_web import ensure_web_fixtures

    ensure_web_fixtures()


# The streaming pipeline's exact batch semantics, as SQL over the same
# fixture parquet (hive epoch= dirs = arrival epochs; P=1 so the
# watermark is the global running max instead of a min over partition
# maxima, which SQL cannot reproduce without the engine's hash):
#   pages     — drop extraction failures (malformed html <=> text NULL)
#   uniq      — per-epoch exact (url, ts) replay dedup
#   wm        — watermark AFTER each epoch = running max event time
#   flagged   — wm_prev = watermark the epoch's reduce restores
#   nonlate   — late routing: ts below the restored watermark
#   survivors — V1 stale drop: a non-late row of the same url with
#               ts >= this row's ts in an EARLIER epoch supersedes it
#               (closed form of the last_ts-map recursion: a stale
#               dominator always implies a surviving one)
#   changes   — version = rank among survivors; 0 = insert
_SQL_PAGES_BASE = f"""
WITH pages AS (
  SELECT url, epoch_us(warc_ts) AS ts_us, lang, CAST(epoch AS BIGINT) AS epoch
  FROM read_parquet('{PAGES_FIXTURE}/epoch=*/part-*.parquet',
                    hive_partitioning=1)
  WHERE text IS NOT NULL
),
uniq AS (SELECT url, ts_us, lang, epoch FROM pages GROUP BY ALL),
wm AS (
  SELECT epoch, max(mx) OVER (ORDER BY epoch) AS wm_after
  FROM (SELECT epoch, max(ts_us) AS mx FROM pages GROUP BY epoch)
),
flagged AS (
  SELECT u.*, coalesce(w.wm_after, {NEG_INF_SQL}) AS wm_prev
  FROM uniq u LEFT JOIN wm w ON w.epoch = u.epoch - 1
),
nonlate AS (SELECT * FROM flagged WHERE ts_us >= wm_prev),
survivors AS (
  SELECT a.url, a.ts_us, a.lang FROM nonlate a
  WHERE NOT EXISTS (
    SELECT 1 FROM nonlate b
    WHERE b.url = a.url AND b.epoch < a.epoch AND b.ts_us >= a.ts_us
  )
),
changes AS (
  SELECT url, ts_us, lang,
         row_number() OVER (PARTITION BY url ORDER BY ts_us) - 1 AS version
  FROM survivors
)
"""

SQL_PAGES_FLAGSHIP = _SQL_PAGES_BASE + f"""
SELECT lang,
       CASE WHEN version = 0 THEN 'insert' ELSE 'update' END AS change_kind,
       ts_us // {_WIN_US} AS window_id,
       count(*) AS n, CAST(count(*) AS DOUBLE) AS sum_value
FROM changes GROUP BY lang, change_kind, window_id
ORDER BY lang, change_kind, window_id
"""

SQL_WINDOWED_UNIQUE = _SQL_PAGES_BASE + f"""
SELECT lang,
       CASE WHEN version = 0 THEN 'insert' ELSE 'update' END AS change_kind,
       ts_us // {_WIN_US} AS window_id,
       count(*) AS n, count(DISTINCT url) AS n_distinct
FROM changes GROUP BY lang, change_kind, window_id
ORDER BY lang, change_kind, window_id
"""

SQL_WINDOWED_HLL = _SQL_PAGES_BASE + f"""
SELECT lang,
       CASE WHEN version = 0 THEN 'insert' ELSE 'update' END AS change_kind,
       ts_us // {_WIN_US} AS window_id,
       count(DISTINCT url) AS n_distinct, TRUE AS hll_ok
FROM changes GROUP BY lang, change_kind, window_id
ORDER BY lang, change_kind, window_id
"""

SQL_STREAMING_TOPK = _SQL_PAGES_BASE + f"""
, wcounts AS (
  SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
         ts_us // {_WIN_US} AS window_id,
         count(*) AS n
  FROM changes GROUP BY host, window_id),
ranked AS (
  SELECT host, window_id, n,
         row_number() OVER (PARTITION BY window_id
                            ORDER BY n DESC, host) AS rnk
  FROM wcounts)
SELECT window_id, host, n, CAST(rnk AS BIGINT) AS rank
FROM ranked WHERE rnk <= 3
ORDER BY window_id, rnk
"""

SQL_PAGES_LATE = f"""
WITH pages AS (
  SELECT url, epoch_us(warc_ts) AS ts_us, lang, CAST(epoch AS BIGINT) AS epoch
  FROM read_parquet('{PAGES_FIXTURE}/epoch=*/part-*.parquet',
                    hive_partitioning=1)
  WHERE text IS NOT NULL
),
uniq AS (SELECT url, ts_us, lang, epoch FROM pages GROUP BY ALL),
wm AS (
  SELECT epoch, max(mx) OVER (ORDER BY epoch) AS wm_after
  FROM (SELECT epoch, max(ts_us) AS mx FROM pages GROUP BY epoch)
),
flagged AS (
  SELECT u.*, coalesce(w.wm_after, {NEG_INF_SQL}) AS wm_prev
  FROM uniq u LEFT JOIN wm w ON w.epoch = u.epoch - 1
)
SELECT lang, count(*) AS n_late FROM flagged WHERE ts_us < wm_prev
GROUP BY lang ORDER BY lang
"""

# Flink-style late-firing changelog (window_refire mode), replayed
# statically: a window's firing epoch F is the first epoch whose
# post-advance watermark passes its end (max_epoch+1 = the final flush);
# every contribution epoch maps to emission epoch max(e, F); at each
# emission epoch the engine emits +1 with the cumulative count and -1
# retracting the previous emission (none before the first). On-time
# contributions are the V1 survivors; late contributions are accepted
# iff their window end + lateness is still ahead of the watermark at
# arrival (Flink's drop rule) and bypass V1 (StateParams.window_refire).
_REFIRE_LATE_US = 1_800_000_000

SQL_PAGES_REFIRE = f"""
WITH pages AS (
  SELECT url, epoch_us(warc_ts) AS ts_us, lang, CAST(epoch AS BIGINT) AS epoch
  FROM read_parquet('{PAGES_FIXTURE}/epoch=*/part-*.parquet',
                    hive_partitioning=1)
  WHERE text IS NOT NULL
),
uniq AS (SELECT url, ts_us, lang, epoch FROM pages GROUP BY ALL),
wm AS (
  SELECT epoch, max(mx) OVER (ORDER BY epoch) AS wm_after
  FROM (SELECT epoch, max(ts_us) AS mx FROM pages GROUP BY epoch)
),
flagged AS (
  SELECT u.*, coalesce(w.wm_after, {NEG_INF_SQL}) AS wm_prev
  FROM uniq u LEFT JOIN wm w ON w.epoch = u.epoch - 1
),
nonlate AS (SELECT * FROM flagged WHERE ts_us >= wm_prev),
survivors AS (
  SELECT a.url, a.ts_us, a.lang, a.epoch FROM nonlate a
  WHERE NOT EXISTS (
    SELECT 1 FROM nonlate b
    WHERE b.url = a.url AND b.epoch < a.epoch AND b.ts_us >= a.ts_us
  )
),
contrib AS (
  SELECT lang, ts_us // {_WIN_US} AS wid, epoch FROM survivors
  UNION ALL
  SELECT lang, ts_us // {_WIN_US} AS wid, epoch FROM flagged
  WHERE ts_us < wm_prev
    AND (ts_us // {_WIN_US}) * {_WIN_US} + {_WIN_US}
        + {_REFIRE_LATE_US} > wm_prev
),
bounds AS (SELECT max(epoch) AS max_e FROM pages),
fire AS (
  SELECT w.wid,
         coalesce(min(CASE WHEN m.wm_after >= (w.wid + 1) * {_WIN_US}
                           THEN m.epoch END), b.max_e + 1) AS f
  FROM (SELECT DISTINCT wid FROM contrib) w
  CROSS JOIN bounds b LEFT JOIN wm m ON true
  GROUP BY w.wid, b.max_e
),
eff AS (
  SELECT c.lang, c.wid, GREATEST(c.epoch, f.f) AS g, count(*) AS dn
  FROM contrib c JOIN fire f ON f.wid = c.wid
  GROUP BY c.lang, c.wid, GREATEST(c.epoch, f.f)
),
cums AS (
  SELECT lang, wid, g,
         sum(dn) OVER (PARTITION BY lang, wid ORDER BY g) AS cum,
         row_number() OVER (PARTITION BY lang, wid ORDER BY g) - 1 AS s
  FROM eff
),
seqd AS (
  SELECT lang, wid, g, cum, s,
         lag(cum) OVER (PARTITION BY lang, wid ORDER BY g) AS prev_cum
  FROM cums
)
SELECT lang, wid AS window_id, CAST(1 AS BIGINT) AS change,
       CAST(cum AS BIGINT) AS n, CAST(cum AS DOUBLE) AS sum_value,
       CAST(s AS BIGINT) AS fire_seq
FROM seqd
UNION ALL
SELECT lang, wid AS window_id, CAST(-1 AS BIGINT) AS change,
       CAST(prev_cum AS BIGINT) AS n, CAST(prev_cum AS DOUBLE) AS sum_value,
       CAST(s AS BIGINT) AS fire_seq
FROM seqd WHERE s >= 1
ORDER BY lang, window_id, fire_seq, change
"""

# same survivor pipeline, but the watermark is the TWO-stream bound
# (min of both streams' running maxima — a stream running ahead must
# not mark the other's rows late), then the inclusive interval join
SQL_STREAM_JOIN = f"""
WITH pages AS (
  SELECT url, epoch_us(warc_ts) AS ts_us, CAST(epoch AS BIGINT) AS epoch
  FROM read_parquet('{PAGES_FIXTURE}/epoch=*/part-*.parquet',
                    hive_partitioning=1)
  WHERE text IS NOT NULL
),
clicks AS (
  SELECT url, epoch_us(ts) AS c_ts, CAST(epoch AS BIGINT) AS epoch
  FROM read_parquet('{CLICKS_FIXTURE}/epoch=*/part-*.parquet',
                    hive_partitioning=1)
),
uniq AS (SELECT url, ts_us, epoch FROM pages GROUP BY ALL),
wm AS (
  SELECT p.epoch,
         least(max(p.mx) OVER (ORDER BY p.epoch),
               max(c.mx) OVER (ORDER BY c.epoch)) AS wm_after
  FROM (SELECT epoch, max(ts_us) AS mx FROM pages GROUP BY epoch) p
  JOIN (SELECT epoch, max(c_ts) AS mx FROM clicks GROUP BY epoch) c
    ON c.epoch = p.epoch
),
flagged AS (
  SELECT u.*, coalesce(w.wm_after, {NEG_INF_SQL}) AS wm_prev
  FROM uniq u LEFT JOIN wm w ON w.epoch = u.epoch - 1
),
nonlate AS (SELECT * FROM flagged WHERE ts_us >= wm_prev),
survivors AS (
  SELECT a.url, a.ts_us FROM nonlate a
  WHERE NOT EXISTS (
    SELECT 1 FROM nonlate b
    WHERE b.url = a.url AND b.epoch < a.epoch AND b.ts_us >= a.ts_us
  )
),
changes AS (
  SELECT url, ts_us,
         row_number() OVER (PARTITION BY url ORDER BY ts_us) - 1 AS version
  FROM survivors
)
SELECT s.version AS version, count(*) AS n_pairs
FROM changes s JOIN clicks c
  ON c.url = s.url AND c.c_ts - s.ts_us BETWEEN -{_HALF_H_US} AND {_HALF_H_US}
GROUP BY s.version ORDER BY s.version
"""

# byte-identity of html->text extraction: if the extractor drifts by one
# byte anywhere, n_identical drops below count(text) and the pair breaks
SQL_EXTRACT_PARITY = f"""
SELECT lang, count(*) AS rows,
       count(text) AS n_identical, count(text) AS n_ok
FROM read_parquet('{PAGES_FIXTURE}/epoch=*/part-*.parquet')
GROUP BY lang ORDER BY lang
"""


def _sql_streaming_near_dup() -> str:
    """DuckDB twin of the STREAMING near-dup operator
    (state/neardup.py) over the fixed near-dup pages fixture: the
    arrival semantics (per-epoch (url, ts) dedup + watermark late drop,
    P=1 so the watermark is the running event-time max, exactly like
    SQL_PAGES_FLAGSHIP), the md5-mode MinHash banding (the same
    perm/gram/fold expressions as _SQL_MINHASH_CAND), and the
    first-arrival bucket-ownership rule: the owner of an LSH bucket is
    its first row by (epoch, ts_us, url); every later row whose url
    differs emits one near_dups row per hit band."""
    from gush_ray.datagen import NEARDUP_PAGES_FIXTURE

    return f"""
WITH pages AS (
  SELECT url, epoch_us(warc_ts) AS ts_us, coalesce(text, '') AS text,
         CAST(epoch AS BIGINT) AS epoch
  FROM read_parquet('{NEARDUP_PAGES_FIXTURE}/epoch=*/part-*.parquet',
                    hive_partitioning=1)
  WHERE text IS NOT NULL
),
uniq AS (SELECT url, ts_us, text, epoch FROM pages GROUP BY ALL),
wm AS (
  SELECT epoch, max(mx) OVER (ORDER BY epoch) AS wm_after
  FROM (SELECT epoch, max(ts_us) AS mx FROM pages GROUP BY epoch)
),
flagged AS (
  SELECT u.*, coalesce(w.wm_after, {NEG_INF_SQL}) AS wm_prev
  FROM uniq u LEFT JOIN wm w ON w.epoch = u.epoch - 1
),
docs AS (
  SELECT url, ts_us, epoch,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     x -> x <> '') AS w
  FROM flagged WHERE ts_us >= wm_prev
),
grams AS (
  SELECT url, ts_us, epoch, array_to_string(w[g:g+2], ' ') AS gram
  FROM docs, UNNEST(range(1, len(w)-1)) AS t(g)
  WHERE len(w) >= 3
  UNION ALL
  SELECT url, ts_us, epoch, coalesce(array_to_string(w, ' '), '')
  FROM docs WHERE len(w) < 3
),
perms(k, a, b) AS (VALUES {_minhash_perm_values()}),
hashes AS (
  SELECT url, ts_us, epoch, md5_number_lower(gram) AS h FROM grams),
sigs AS (
  SELECT url, ts_us, epoch, k,
         min((h::HUGEINT * a % {_M64} + b) % {_M64}
             % 2305843009213693951)::UBIGINT AS mh
  FROM hashes, perms GROUP BY url, ts_us, epoch, k
),
band_sigs AS MATERIALIZED (
  SELECT url, ts_us, epoch, (k // 4) AS band_id,
         list_reduce(list(mh::HUGEINT ORDER BY k),
                     (x, y) -> (x * 1099511628211 + y) % {_M64}
                     ) AS band_hash
  FROM sigs GROUP BY url, ts_us, epoch, (k // 4)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY band_id, band_hash
                               ORDER BY epoch, ts_us, url) AS rn
  FROM band_sigs
),
owner AS (
  SELECT band_id, band_hash, url AS o_url, ts_us AS o_ts
  FROM ranked WHERE rn = 1
)
SELECT r.url, r.ts_us, r.band_id,
       o.o_url AS dup_of, o.o_ts AS dup_of_ts
FROM ranked r
JOIN owner o ON o.band_id = r.band_id AND o.band_hash = r.band_hash
WHERE r.url <> o.o_url
ORDER BY r.url, r.ts_us, r.band_id
"""


def q_streaming_near_dup(sf_dir: str):
    """Streaming MinHash/LSH near-dup detection inside the CEP loop:
    band rows ride a SECOND keyed exchange (bucket-partitioned —
    state/neardup.py documents the assumption), bucket-owner state lives
    in the partition snapshots, hits land exactly-once on the
    ``near_dups`` stream. md5 verification hash mode; num_partitions=1
    so the watermark is SQL-expressible (same rationale as
    q_pages_flagship; bucket routing itself is P-independent and
    multi-P/kill-resume behavior is pinned by
    tests/test_neardup_stream.py)."""
    from gush_ray.datagen import ensure_neardup_pages
    from gush_ray.pipelines.epoch_loop import StreamingJob
    from gush_ray.state.neardup import NearDupSpec

    pages_dir = ensure_neardup_pages()
    out_dir = f"/tmp/gush_ray_q/{uuid.uuid4().hex}"
    job = StreamingJob(pages_dir, out_dir, run_id=uuid.uuid4().hex,
                       num_partitions=1,
                       neardup_spec=NearDupSpec(hash_fn="md5"))
    job.run()
    nd = job.read_output("near_dups")
    job.kill_actors()
    shutil.rmtree(out_dir, ignore_errors=True)
    return nd.sort_values(["url", "ts_us", "band_id"]).reset_index(
        drop=True)


def _sql_streaming_frontier(fixture: str | None = None,
                            canon_cte: str | None = None,
                            canon_src_cte: str | None = None) -> str:
    """DuckDB twin of the STREAMING url-frontier operator
    (state/frontier.py) over the fixed linked-pages fixture: arrival
    semantics (extraction survivors, P=1 restored-watermark late drop —
    same wm/flagged shape as SQL_PAGES_FLAGSHIP), anchor extraction via
    ``regexp_extract_all`` (the batch ``link_extract`` oracle's
    expression), per-epoch exact-replay collapse as a DISTINCT over
    link rows, and the first-discovery rule: the frontier row for a
    url is its first link arrival by (epoch, ts_us, src_url);
    self-links never discover.

    ``canon_cte`` (the canonicalizing variant): a CTE chain defining
    ``cn_map(raw, canon)`` over the raw link targets — discovered urls
    map through it BEFORE replay-collapse, self-drop and first-
    discovery ranking, mirroring FrontierSpec(canonicalize=True).
    ``canon_src_cte`` defines ``cs_map(raw, canon)`` over the src urls:
    the self-drop compares CANONICAL forms on both sides (the emitted
    src stays raw, like the engine)."""
    from gush_ray.datagen import FRONTIER_PAGES_FIXTURE

    fixture = fixture or FRONTIER_PAGES_FIXTURE
    if canon_cte:
        canon = canon_cte + "," + canon_src_cte + ","
        link_src = """
clinks AS (
  SELECT l.epoch, l.ts_us, l.src_url, c.canon AS dst_url,
         cs.canon AS src_canon
  FROM rawlinks l
  JOIN cn_map c ON c.raw = l.dst_url
  JOIN cs_map cs ON cs.raw = l.src_url
),"""
        raw_name, link_name = "rawlinks", "clinks"
        self_drop = "dst_url <> src_canon"
    else:
        canon = ""
        link_src = ""
        raw_name, link_name = "links", "links"
        self_drop = "dst_url <> src_url"
    return f"""
WITH pages AS (
  SELECT url, epoch_us(warc_ts) AS ts_us, decode(html) AS h,
         CAST(epoch AS BIGINT) AS epoch
  FROM read_parquet('{fixture}/epoch=*/part-*.parquet',
                    hive_partitioning=1)
  WHERE text IS NOT NULL
),
wm AS (
  SELECT epoch, max(mx) OVER (ORDER BY epoch) AS wm_after
  FROM (SELECT epoch, max(ts_us) AS mx FROM pages GROUP BY epoch)
),
flagged AS (
  SELECT p.*, coalesce(w.wm_after, {NEG_INF_SQL}) AS wm_prev
  FROM pages p LEFT JOIN wm w ON w.epoch = p.epoch - 1
),
{raw_name} AS (
  SELECT epoch, ts_us, url AS src_url,
         unnest(regexp_extract_all(h, '<a href="([^"<]*)"', 1)) AS dst_url
  FROM flagged WHERE ts_us >= wm_prev
),
{canon}{link_src}
uniq AS (
  SELECT DISTINCT epoch, ts_us, src_url, dst_url FROM {link_name}
  WHERE {self_drop}
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY dst_url
                               ORDER BY epoch, ts_us, src_url) AS rn
  FROM uniq
)
SELECT dst_url AS url, ts_us, src_url AS discovered_from
FROM ranked WHERE rn = 1
ORDER BY url
"""


def q_streaming_frontier(sf_dir: str):
    """Streaming url-frontier discovery inside the CEP loop: link rows
    extracted from arriving pages' html ride their own keyed exchange
    (dst-url-partitioned — state/frontier.py documents the assumption),
    the seen-map lives in the partition snapshots, first discoveries
    land exactly-once on the ``frontier`` stream. num_partitions=1 so
    the watermark is SQL-expressible (same rationale as
    q_pages_flagship; dst routing itself is P-independent and
    multi-P/kill-resume behavior is pinned by
    tests/test_frontier_stream.py)."""
    from gush_ray.datagen import ensure_frontier_pages
    from gush_ray.pipelines.epoch_loop import StreamingJob
    from gush_ray.state.frontier import FrontierSpec

    pages_dir = ensure_frontier_pages()
    out_dir = f"/tmp/gush_ray_q/{uuid.uuid4().hex}"
    job = StreamingJob(pages_dir, out_dir, run_id=uuid.uuid4().hex,
                       num_partitions=1, frontier_spec=FrontierSpec())
    job.run()
    fr = job.read_output("frontier")
    job.kill_actors()
    shutil.rmtree(out_dir, ignore_errors=True)
    return fr.sort_values(["url"]).reset_index(drop=True)


def _fixture_cache_key(sf_dir: str, table: str = "embeddings") -> str:
    """Cache key for a /tmp index built from one fixture file: path PLUS
    content identity (size + mtime_ns). Keying on the path alone reuses
    a stale index when the fixture at that path is regenerated between
    runs — build_*_index's idempotence guard checks params, not data."""
    import hashlib

    st = os.stat(os.path.join(sf_dir, f"{table}.parquet"))
    raw = f"{sf_dir}|{st.st_size}|{st.st_mtime_ns}"
    return hashlib.md5(raw.encode()).hexdigest()[:16]


def _dup_corpus(sf_dir: str):
    """documents ∪ mutated copies (doc_id+1_000_000) — a deterministic
    near-dup corpus with known ground truth for the dedup operators."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def mutate(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out["doc_id"] = out["doc_id"] + 1_000_000
        out["text"] = out["text"].map(
            lambda t: " ".join(
                (t.split()[:-2] + ["mutated", "tail"]) if t else ["mutated"]
            )
        )
        return out

    mutated = docs.map_batches(mutate, batch_format="pandas")
    return docs.union(mutated)


# --------------------------------------------------------------------------
# DuckDB oracles for the MinHash/SimHash/Jaccard near-dup family.
#
# The engine's verification mode (hash_fn="md5", stages/dedup.py
# md5_hash_strings) hashes every token/shingle with md5-lower64 —
# exactly DuckDB's md5_number_lower() — so the ENTIRE pipeline
# (shingle → 64-perm minhash → 16-band LSH → bucket-capped candidate
# pairs → signature-estimated Jaccard; simhash bit-majority → 4x16-bit
# banding → hamming; exact n-gram Jaccard verify; connected-component
# clusters) is reproduced in plain SQL and hash-compared by the driver.
# The bench path keeps hash_fn="fast" (pd.util.hash_array) — same
# algorithm, cheaper hash. Permutation constants are baked into the SQL
# from the same seeded RNG the engine uses.
# --------------------------------------------------------------------------

_M64 = "18446744073709551616"  # 2^64 (uint64 wraparound in HUGEINT math)


def _splitmix_mulmod(m: int) -> str:
    """``x * m mod 2^64`` over a UBIGINT column ``x`` via 32-bit-split
    multiplication — a direct HUGEINT product of two near-2^64 values
    overflows INT128. THE one implementation of this arithmetic: every
    oracle that mirrors pandas' int64 hash (== the splitmix64
    finalizer) or the Bloom double-hash goes through here, so an edge
    fix cannot desynchronize one oracle from the engine (review
    finding: three hand copies)."""
    return (f"((x >> 32)::HUGEINT * {m % 2**32} % 4294967296 "
            f"* 4294967296 + (x & 4294967295)::HUGEINT * {m}) % {_M64}")


def _splitmix_steps(src: str, cols: str, tag: str) -> str:
    """CTE chain applying the splitmix64 finalizer to column ``x`` of
    ``src`` (UBIGINT in, UBIGINT out in ``{tag}5``), carrying ``cols``
    through unchanged."""
    return f"""
{tag}1 AS (SELECT {cols}, xor(x, x >> 30) AS x FROM {src}),
{tag}2 AS (SELECT {cols},
           ({_splitmix_mulmod(0xBF58476D1CE4E5B9)})::UBIGINT AS x
           FROM {tag}1),
{tag}3 AS (SELECT {cols}, xor(x, x >> 27) AS x FROM {tag}2),
{tag}4 AS (SELECT {cols},
           ({_splitmix_mulmod(0x94D049BB133111EB)})::UBIGINT AS x
           FROM {tag}3),
{tag}5 AS (SELECT {cols}, xor(x, x >> 31) AS x FROM {tag}4)"""


def _minhash_perm_values(num_perm: int = 64, seed: int = 1234) -> str:
    from gush_ray.stages.dedup import _perm_params

    a, b = _perm_params(num_perm, seed)
    return ", ".join(
        f"({k}, {int(a[k])}::UBIGINT, {int(b[k])}::UBIGINT)"
        for k in range(num_perm)
    )


# documents ∪ mutated copies — the SQL twin of _dup_corpus (same word
# lists: " ".join(words).split() round-trips, words contain no spaces)
_SQL_DUP_CORPUS = """
splitdocs AS (
  SELECT doc_id, coalesce(text,'') AS text,
         list_filter(regexp_split_to_array(coalesce(text,''), '\\s+'),
                     x -> x <> '') AS w
  FROM documents
),
corpus AS (
  SELECT doc_id, w FROM splitdocs
  UNION ALL
  SELECT doc_id + 1000000,
         CASE WHEN text = '' THEN ['mutated']
              ELSE list_concat(w[1:greatest(len(w)-2,0)],
                               ['mutated','tail']) END
  FROM splitdocs
)"""

# word 3-gram shingles; a doc with <3 words contributes ONE gram (the
# whole text; '' for an empty doc) — mirrors stages/dedup._batch_grams
_SQL_GRAMS = """
grams AS (
  SELECT doc_id, array_to_string(w[g:g+2], ' ') AS gram
  FROM corpus, UNNEST(range(1, len(w)-1)) AS t(g)
  WHERE len(w) >= 3
  UNION ALL
  SELECT doc_id, coalesce(array_to_string(w, ' '), '') FROM corpus
  WHERE len(w) < 3
)"""

# shingle-hash → (h*a+b) in uint64 wraparound → mod Mersenne-61 → min
# per (doc, perm); band hash = FNV-style fold of the band's 4 sig rows
# in k order; buckets capped at 200 ids (deterministic: ordered by id)
# exactly like _minhash_pairs_partition's max_group
_SQL_MINHASH_CAND = f"""
perms(k, a, b) AS (VALUES {{perm_values}}),
hashes AS (SELECT doc_id, md5_number_lower(gram) AS h FROM grams),
sigs AS (
  SELECT doc_id, k,
         min((h::HUGEINT * a % {_M64} + b) % {_M64}
             % 2305843009213693951)::UBIGINT AS mh
  FROM hashes, perms GROUP BY doc_id, k
),
band_sigs AS (
  SELECT doc_id, (k // 4) AS band_id,
         list_reduce(list(mh::HUGEINT ORDER BY k),
                     (x, y) -> (x * 1099511628211 + y) % {_M64}) AS band_hash
  FROM sigs GROUP BY doc_id, (k // 4)
),
ranked AS (
  SELECT band_id, band_hash, doc_id,
         row_number() OVER (PARTITION BY band_id, band_hash
                            ORDER BY doc_id) AS rn
  FROM band_sigs
),
cand AS (
  SELECT DISTINCT ra.doc_id AS doc_a, rb.doc_id AS doc_b
  FROM ranked ra JOIN ranked rb
    ON ra.band_id = rb.band_id AND ra.band_hash = rb.band_hash
   AND ra.rn < rb.rn AND rb.rn <= 200
),
est AS (
  SELECT c.doc_a, c.doc_b,
         avg(CASE WHEN sa.mh = sb.mh THEN 1.0 ELSE 0.0 END) AS est_jaccard
  FROM cand c
  JOIN sigs sa ON sa.doc_id = c.doc_a
  JOIN sigs sb ON sb.doc_id = c.doc_b AND sb.k = sa.k
  GROUP BY c.doc_a, c.doc_b
),
mh_pairs AS MATERIALIZED (
  SELECT doc_a, doc_b, est_jaccard FROM est WHERE est_jaccard >= 0.5
)"""
# mh_pairs/edges/dgrams are MATERIALIZED: DuckDB otherwise re-inlines
# the whole minhash prefix at every reference (and every recursion step
# of the clusters closure) — measured 52s -> 2.7s at sf0.01

_SQL_MINHASH_PREFIX = (
    "WITH RECURSIVE " + _SQL_DUP_CORPUS.strip() + ",\n"
    + _SQL_GRAMS.strip() + ",\n"
    + _SQL_MINHASH_CAND.format(perm_values=_minhash_perm_values()).strip()
)

SQL_MINHASH_DEDUP = _SQL_MINHASH_PREFIX + """
SELECT doc_a, doc_b, est_jaccard FROM mh_pairs ORDER BY doc_a, doc_b
"""

# connected components by transitive closure (UNION dedups → fixpoint);
# cluster id = min member id — the twin of
# duplicate_clusters_distributed + cluster_summary
SQL_MINHASH_CLUSTERS = _SQL_MINHASH_PREFIX + """,
edges AS MATERIALIZED (
  SELECT doc_a AS u, doc_b AS v FROM mh_pairs
  UNION SELECT doc_b, doc_a FROM mh_pairs
),
reach(node, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT reach.node, e.v FROM reach JOIN edges e ON reach.r = e.u
),
labels AS (SELECT node AS doc_id, min(r) AS cluster_id
           FROM reach GROUP BY node)
SELECT cluster_id, count(*)::BIGINT AS n_members,
       min(doc_id) AS keep_doc_id
FROM labels GROUP BY cluster_id ORDER BY cluster_id
"""

# exact word-3-gram Jaccard of the candidate pairs over DISTINCT gram
# hashes — the twin of ngram_jaccard_pairs (round_even == np.round)
SQL_NGRAM_JACCARD = _SQL_MINHASH_PREFIX + """,
dgrams AS MATERIALIZED (
  SELECT DISTINCT doc_id, md5_number_lower(gram) AS h FROM grams),
gsize AS (SELECT doc_id, count(*) AS n FROM dgrams GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS i
  FROM mh_pairs p
  JOIN dgrams ga ON ga.doc_id = p.doc_a
  JOIN dgrams gb ON gb.doc_id = p.doc_b AND gb.h = ga.h
  GROUP BY p.doc_a, p.doc_b
),
jacc AS (
  SELECT p.doc_a, p.doc_b, p.est_jaccard,
         round_even(coalesce(i.i, 0)::DOUBLE
                    / greatest(1, na.n + nb.n - coalesce(i.i, 0)),
                    4) AS jaccard
  FROM mh_pairs p
  LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
  JOIN gsize na ON na.doc_id = p.doc_a
  JOIN gsize nb ON nb.doc_id = p.doc_b
)
SELECT doc_a, doc_b, est_jaccard, jaccard FROM jacc
WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b
"""

# simhash: per-token md5 hash → per-bit majority vote (ties round UP:
# 2*s >= cnt, same as simhash_batch) → 64-bit sig → 4x16-bit banding →
# bucket-capped pairs → hamming ≤ 3
SQL_SIMHASH_DEDUP = (
    "WITH " + _SQL_DUP_CORPUS.strip() + ""","""
    + """
toks AS (
  SELECT doc_id,
         md5_number_lower(unnest(CASE WHEN len(w)=0 THEN ['']
                                      ELSE w END)) AS h
  FROM corpus
),
bits AS (
  SELECT doc_id, k, sum(((h >> k) & 1)::BIGINT) AS s, count(*) AS cnt
  FROM toks, UNNEST(range(0, 64)) AS t(k)
  GROUP BY doc_id, k
),
sig AS (
  SELECT doc_id,
         sum(CASE WHEN 2*s >= cnt THEN (1::HUGEINT << k::INT)
                  ELSE 0::HUGEINT END)::UBIGINT AS simhash
  FROM bits GROUP BY doc_id
),
chunks AS (
  SELECT doc_id, c AS chunk_id,
         (simhash >> (16*c)::INT) & 65535 AS chunk_val
  FROM sig, UNNEST(range(0, 4)) AS t(c)
),
ranked AS (
  SELECT chunk_id, chunk_val, doc_id,
         row_number() OVER (PARTITION BY chunk_id, chunk_val
                            ORDER BY doc_id) AS rn
  FROM chunks
),
cand AS (
  SELECT DISTINCT ra.doc_id AS doc_a, rb.doc_id AS doc_b
  FROM ranked ra JOIN ranked rb
    ON ra.chunk_id = rb.chunk_id AND ra.chunk_val = rb.chunk_val
   AND ra.rn < rb.rn AND rb.rn <= 200
)
SELECT c.doc_a, c.doc_b,
       bit_count(xor(sa.simhash, sb.simhash))::BIGINT AS hamming
FROM cand c
JOIN sig sa ON sa.doc_id = c.doc_a
JOIN sig sb ON sb.doc_id = c.doc_b
WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
ORDER BY doc_a, doc_b
""")


def q_minhash_dedup(sf_dir: str):
    """MinHash+LSH near-dup pairs in verification hash mode (md5 —
    DuckDB-reproducible, SQL_MINHASH_DEDUP); the bench path runs the
    same pipeline with hash_fn='fast'."""
    corpus = _dup_corpus(sf_dir)
    pairs = minhash_lsh_pairs(corpus, threshold=0.5, num_perm=64,
                              num_bands=16, shingle=3, hash_fn="md5")
    df = pairs.to_pandas()
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def q_minhash_clusters(sf_dir: str):
    """Near-dup pairs resolved into duplicate clusters (connected
    components, min-id keeper) — the full dedup decision output.

    Clustering runs distributed (min-label propagation over the edge
    list, stages/dedup.duplicate_clusters_distributed): no whole-edge-set
    union-find on the driver; only the final (doc_id, cluster_id) rows —
    bounded by the candidate set — are collected for the summary."""
    from gush_ray.stages.dedup import (
        cluster_summary,
        duplicate_clusters_distributed,
    )

    corpus = _dup_corpus(sf_dir)
    pairs = minhash_lsh_pairs(corpus, threshold=0.5, hash_fn="md5")
    clusters = duplicate_clusters_distributed(pairs)
    return cluster_summary(clusters.to_pandas())


def q_simhash_dedup(sf_dir: str):
    """SimHash near-dup pairs in verification hash mode (md5 —
    DuckDB-reproducible, SQL_SIMHASH_DEDUP)."""
    corpus = _dup_corpus(sf_dir)
    pairs = simhash_near_dup_pairs(corpus, max_hamming=3, hash_fn="md5")
    df = pairs.to_pandas()
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def q_ngram_jaccard(sf_dir: str):
    """MinHash candidates verified with exact n-gram Jaccard via a hash
    join of the (small-by-construction) candidate-pair set back to the
    corpus — the corpus is never materialized driver-side
    (stages/dedup.ngram_jaccard_pairs)."""
    from gush_ray.stages.dedup import ngram_jaccard_pairs

    corpus = _dup_corpus(sf_dir)
    pairs = minhash_lsh_pairs(corpus, threshold=0.5, hash_fn="md5")
    out = ngram_jaccard_pairs(corpus, pairs, n=3, hash_fn="md5")
    df = out.filter(expr="jaccard >= 0.5").to_pandas()
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _emb_dup_corpus(sf_dir: str):
    """embeddings ∪ slightly-perturbed copies (vec_id + 1_000_000):
    deterministic ground-truth near-dups at cosine ≈ 0.999.

    Per-dim noise is uniform ±0.01 derived from the pandas int64 hash
    (splitmix64) of ``vec_id*1024 + dim`` in float64 — keyed by
    (vec_id, dim) so it is batch-boundary-independent AND exactly
    reproducible by the DuckDB oracle (_splitmix_cte recomputes the
    hash; identical float64 op order on both sides)."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def perturb(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        embs = []
        for i, v in zip(out["vec_id"], out["embedding"]):
            v = np.asarray(v, dtype=np.float64)
            keys = (np.int64(i) * np.int64(1024)
                    + np.arange(len(v), dtype=np.int64))
            h = pd.util.hash_array(keys, categorize=False)
            noise = (h.astype(np.float64) / 2.0**64 - 0.5) * 0.02
            embs.append((v + noise).tolist())
        out["embedding"] = embs
        out["vec_id"] = out["vec_id"] + 1_000_000
        return out

    return emb.union(emb.map_batches(perturb, batch_format="pandas"))


def _lsh_plane_values(n_planes: int = 48, dim: int = 64,
                      seed: int = 99) -> str:
    """The engine's seeded hyperplanes as exact SQL DOUBLE literals
    (repr round-trips float64; DuckDB parses decimal literals with
    correct rounding)."""
    from gush_ray.stages.dedup import _lsh_planes

    planes = _lsh_planes(n_planes, dim, seed)
    return ", ".join(
        "(%d, [%s])" % (p, ", ".join(repr(float(w)) for w in planes[p]))
        for p in range(n_planes)
    )


# random-hyperplane LSH near-dup over the perturbed embedding corpus —
# the twin of embedding_near_dup_pairs: the ±0.01 uniform perturbation
# is recomputed from the same splitmix64 hash of vec_id*1024+dim
# (identical float64 op order → bitwise-equal vectors), the 48 seeded
# hyperplanes are baked in as exact literals, buckets are the 6-bit
# sign patterns per band, candidate pairs are bucket-capped at 500 and
# verified with exact cosine >= 0.95 (round_even == np.round)
SQL_EMBEDDING_NEAR_DUP = None  # assigned below (needs _splitmix helpers)


def _build_sql_embedding_near_dup() -> str:
    m64 = _M64
    cols = "vec_id, d, v"
    return f"""
WITH
dims AS (
  SELECT vec_id, d, embedding[d+1]::DOUBLE AS v,
         (vec_id * 1024 + d)::BIGINT AS key
  FROM embeddings, UNNEST(range(0, 64)) AS t(d)
),
h0 AS (SELECT {cols},
              ((key::HUGEINT % {m64} + {m64}) % {m64})::UBIGINT AS x
       FROM dims),
{_splitmix_steps('h0', cols, 'h').strip()},
pert AS (
  SELECT vec_id + 1000000 AS vec_id,
         list(v + (x::DOUBLE / 18446744073709551616.0 - 0.5) * 0.02
              ORDER BY d) AS emb
  FROM h5 GROUP BY vec_id
),
corpus AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
  UNION ALL SELECT vec_id, emb FROM pert
),
planes(p, vec) AS (VALUES {_lsh_plane_values()}),
bits AS (
  SELECT c.vec_id, p.p // 6 AS band, p.p % 6 AS k,
         CASE WHEN list_inner_product(c.emb, p.vec) > 0
              THEN 1 ELSE 0 END AS bit
  FROM corpus c, planes p
),
buckets AS (
  SELECT vec_id, band, sum(bit * (1 << k))::BIGINT AS bucket
  FROM bits GROUP BY vec_id, band
),
ranked AS (
  SELECT band, bucket, vec_id,
         row_number() OVER (PARTITION BY band, bucket
                            ORDER BY vec_id) AS rn
  FROM buckets
),
cand AS (
  SELECT DISTINCT ra.vec_id AS doc_a, rb.vec_id AS doc_b
  FROM ranked ra JOIN ranked rb
    ON ra.band = rb.band AND ra.bucket = rb.bucket
   AND ra.rn < rb.rn AND rb.rn <= 500
)
SELECT c.doc_a, c.doc_b,
       round_even(list_cosine_similarity(ca.emb, cb.emb), 4) AS cosine
FROM cand c
JOIN corpus ca ON ca.vec_id = c.doc_a
JOIN corpus cb ON cb.vec_id = c.doc_b
WHERE list_cosine_similarity(ca.emb, cb.emb) >= 0.95
ORDER BY doc_a, doc_b
"""


SQL_EMBEDDING_NEAR_DUP = _build_sql_embedding_near_dup()


def q_embedding_near_dup(sf_dir: str):
    corpus = _emb_dup_corpus(sf_dir)
    pairs = embedding_near_dup_pairs(corpus, threshold=0.95)
    df = pairs.to_pandas()
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# the pruned probe is DETERMINISTIC (seeded hyperplanes, fixed 1-bit
# multi-probe set), so even the approximate path is SQL-verifiable:
# bake the 6 seed-17 planes as exact literals, recompute bucket
# signatures and the probe set in SQL, and take the exact cosine top-k
# over probed candidates only. Pairs BOTH q_lsh_ann_topk (re-sign per
# query) and q_lsh_index_ann (bucket-partitioned index read) — the two
# paths must agree with each other AND with this SQL.
SQL_LSH_ANN_TOPK = None  # assigned below


def _build_sql_lsh_ann_topk() -> str:
    return f"""
WITH planes(p, vec) AS (VALUES {_lsh_plane_values(6, 64, 17)}),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
qsig AS (
  SELECT sum(CASE WHEN list_inner_product((SELECT qv FROM q), vec) > 0
                  THEN (1 << p) ELSE 0 END)::BIGINT AS s
  FROM planes
),
probe AS (
  SELECT s FROM qsig
  UNION
  SELECT xor(s, (1 << b)::BIGINT) FROM qsig, UNNEST(range(0, 6)) AS t(b)
),
sigs AS (
  SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
         sum(CASE WHEN list_inner_product(e.embedding::DOUBLE[], p.vec) > 0
                  THEN (1 << p.p) ELSE 0 END)::BIGINT AS s
  FROM embeddings e, planes p GROUP BY e.vec_id, e.embedding
),
sims AS (
  SELECT vec_id, list_cosine_similarity(v, (SELECT qv FROM q)) AS raw_sim
  FROM sigs WHERE s IN (SELECT s FROM probe)
)
SELECT vec_id, round_even(raw_sim, 4) AS sim
FROM sims ORDER BY raw_sim DESC, vec_id LIMIT 10
"""


SQL_LSH_ANN_TOPK = _build_sql_lsh_ann_topk()


def q_lsh_ann_topk(sf_dir: str):
    """Approximate ANN (LSH-bucketed) — scale path of ann_topk.
    Oracle-paired (round 3): the probe set is deterministic, so
    SQL_LSH_ANN_TOPK reproduces even the pruned result."""
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    from gush_ray.stages.similarity import lsh_bucket_topk

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    qrow = qtab.filter(pc.equal(qtab["vec_id"], 0))
    qvec = np.array(qrow["embedding"][0].as_py(), dtype=np.float64)
    return lsh_bucket_topk(emb, qvec, k=10, n_planes=6)


def q_lsh_index_ann(sf_dir: str):
    """ANN with a BUILD-ONCE index: signatures computed once and laid
    out as bucket-partitioned parquet; the query reads only the probed
    buckets (<20% of the index — asserted in tests). The reuse path of
    lsh_ann_topk, which re-signs the corpus per query."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from gush_ray.stages.similarity import build_lsh_index, lsh_index_topk

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    key = _fixture_cache_key(sf_dir)
    idx = build_lsh_index(emb, f"/tmp/gush_ray_lsh_index/{key}", n_planes=6)
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    qrow = qtab.filter(pc.equal(qtab["vec_id"], 0))
    qvec = np.array(qrow["embedding"][0].as_py(), dtype=np.float64)
    return lsh_index_topk(idx, qvec, k=10, n_planes=6)


def q_lsh_index_ann_full(sf_dir: str):
    """The LSH index machinery verified end-to-end against SQL: probing
    ALL buckets degrades the index read to the exact brute-force scan,
    so build_lsh_index's signatures + bucket-partitioned layout +
    lsh_index_topk's read path must reproduce the DuckDB cosine top-k
    bit-exactly (any row misplaced or dropped by the index breaks the
    pair). The PRUNED probe stays the separate rows-only lsh_index_ann
    (recall < 1 by design; scan fraction pinned by tests)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from gush_ray.stages.similarity import build_lsh_index, lsh_index_topk

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    key = _fixture_cache_key(sf_dir)
    idx = build_lsh_index(emb, f"/tmp/gush_ray_lsh_index/{key}", n_planes=6)
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    qrow = qtab.filter(pc.equal(qtab["vec_id"], 0))
    qvec = np.array(qrow["embedding"][0].as_py(), dtype=np.float64)
    return lsh_index_topk(idx, qvec, k=10, n_planes=6, all_buckets=True)


def q_kmeans_clusters(sf_dir: str):
    """Distributed k-means over the embeddings table: full-data Lloyd
    (per-batch (cluster, n, sumvec, sse) partials — the corpus never
    shuffles), then one assign pass; returns per-cluster sizes. Rows-only
    (FLOAT centroids aren't SQL-reproducible — a DuckDB SUM cannot
    replay numpy's summation order); the integer-exact sibling
    ``kmeans_exact`` pairs the same iterative-training machinery with a
    bit-exact oracle. Deterministic via sorted partial folds."""
    from gush_ray.stages.clustering import kmeans_assign, kmeans_fit

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    fit = kmeans_fit(emb, k=8, n_iters=10, sample_size=2000, seed=7)
    out = kmeans_assign(emb, fit["centroids"]).to_pandas()
    sizes = out.groupby("cluster", as_index=False).size()
    sizes.columns = ["cluster", "n"]
    return sizes.sort_values("cluster").reset_index(drop=True)


def q_kmeans_exact(sf_dir: str):
    """Integer-exact distributed k-means (clustering.kmeans_fit_exact):
    embeddings quantize to int64 once, then seeding, assignment and
    centroid updates are all integer arithmetic with SQL-expressible
    tie-breaks — so the ENTIRE iterative fit (greedy farthest-point
    init + 5 Lloyd steps + final assignment) is replayed bit-exactly by
    a static DuckDB oracle (SQL_KMEANS_EXACT: the init unrolls as CTE
    steps, each Lloyd step as assign/mean CTE pairs — the BPE
    fixed-loop-unroll technique). This closes the kmeans verification
    gap the float path (q_kmeans_clusters) documents: float centroids
    aren't SQL-reproducible, floor-divided integer ones are.
    Returns per-cluster (cluster, n, sse, centroid_key)."""
    from gush_ray.stages.clustering import (kmeans_exact_summary,
                                            kmeans_fit_exact)

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    fit = kmeans_fit_exact(emb, k=8, n_iters=5)
    return kmeans_exact_summary(emb, fit["centroids"])


def _d2e(a: str, b: str) -> str:
    """Exact integer squared distance between two BIGINT-list columns."""
    return (f"list_sum(list_transform(generate_series(1, len({a})), "
            f"i -> ({a}[i]-{b}[i])*({a}[i]-{b}[i])))")


def _kmeans_exact_ctes(k: int, n_iters: int, scale: int) -> list[str]:
    """The CTE chain replaying clustering.kmeans_fit_exact: quantize →
    greedy farthest-point init unrolled as k seed CTEs (max
    distance-to-chosen, ties to the lexicographically smallest vector —
    DuckDB list comparison IS lexicographic) → each Lloyd step as an
    assignment CTE (row_number over (d2, cluster)) plus a floor-divided
    integer mean CTE; empty clusters COALESCE to their previous
    centroid. All arithmetic is int64/hugeint-exact, so oracles built
    on this chain are bit-identical to the engine, not
    tolerance-checked. Integer floor division
    (a - ((a % n) + n) % n) // n == numpy floor_divide for negative
    sums (pinned in test_clustering). Ends with ``fin``
    (vec_id, ev, cluster, d2 under the final centroids ``c{n_iters}``).
    """
    d2e = _d2e
    ctes = [
        f"e AS MATERIALIZED (SELECT vec_id, "
        f"list_transform(embedding::DOUBLE[], "
        f"x -> CAST(round_even(x * {scale}.0, 0) AS BIGINT)) AS ev "
        f"FROM embeddings)",
        "s0 AS MATERIALIZED (SELECT ev FROM e ORDER BY ev LIMIT 1)",
        # seed distances live in a running LEAST chain; lambdas cannot
        # hold subqueries, so each one-row seed CTE cross-joins in
        f"d0 AS MATERIALIZED (SELECT e.vec_id, e.ev, {d2e('e.ev', 's.sv')}"
        f" AS d2 FROM e CROSS JOIN (SELECT ev AS sv FROM s0) s)",
    ]
    for s in range(1, k):
        ctes.append(f"s{s} AS MATERIALIZED (SELECT ev FROM d{s-1} "
                    f"ORDER BY d2 DESC, ev ASC LIMIT 1)")
        if s < k - 1:
            ctes.append(
                f"d{s} AS MATERIALIZED (SELECT d.vec_id, d.ev, "
                f"LEAST(d.d2, {d2e('d.ev', 's.sv')}) AS d2 FROM d{s-1} d "
                f"CROSS JOIN (SELECT ev AS sv FROM s{s}) s)")
    union = " UNION ALL ".join(
        f"SELECT {j} AS cluster, ev FROM s{j}" for j in range(k))
    ctes.append(f"c0 AS MATERIALIZED ({union})")
    for t in range(n_iters):
        ctes.append(
            f"a{t} AS MATERIALIZED (SELECT vec_id, ev, cluster FROM ("
            f"SELECT x.*, row_number() OVER (PARTITION BY vec_id "
            f"ORDER BY d2, cluster) AS rn "
            f"FROM (SELECT e.vec_id, e.ev, c.cluster, "
            f"{d2e('e.ev', 'c.ev')} AS d2 "
            f"FROM e CROSS JOIN c{t} c) x) WHERE rn = 1)")
        ctes.append(
            f"m{t} AS (SELECT cluster, list(fd ORDER BY dim) AS ev FROM ("
            f"SELECT cluster, dim, (s - ((s % n) + n) % n) // n AS fd "
            f"FROM (SELECT cluster, i AS dim, sum(ev[i]) AS s, "
            f"count(*) AS n "
            f"FROM a{t}, UNNEST(generate_series(1, len(ev))) AS u(i) "
            f"GROUP BY cluster, i)) GROUP BY cluster)")
        ctes.append(
            f"c{t + 1} AS MATERIALIZED (SELECT c.cluster, "
            f"COALESCE(m.ev, c.ev) AS ev "
            f"FROM c{t} c LEFT JOIN m{t} m USING (cluster))")
    ctes.append(
        f"fin AS MATERIALIZED (SELECT vec_id, ev, cluster, d2 FROM ("
        f"SELECT x.*, row_number() OVER (PARTITION BY vec_id "
        f"ORDER BY d2, cluster) AS rn "
        f"FROM (SELECT e.vec_id, e.ev, c.cluster, "
        f"{d2e('e.ev', 'c.ev')} AS d2 "
        f"FROM e CROSS JOIN c{n_iters} c) x) WHERE rn = 1)")
    return ctes


def _gen_sql_kmeans_exact(k: int = 8, n_iters: int = 5,
                          scale: int = 1 << 20) -> str:
    """Per-cluster summary over the exact-fit chain (the kmeans_exact
    oracle): (cluster, n, sse, centroid_key) — sse is the exact integer
    SSE cast to DOUBLE once (rounds half-even, same as numpy),
    centroid_key is md5_number_lower of the comma-joined centroid."""
    ctes = _kmeans_exact_ctes(k, n_iters, scale)
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT f.cluster, count(*) AS n, CAST(sum(f.d2) AS DOUBLE) AS sse,
       any_value(kk.ckey) AS centroid_key
FROM fin f JOIN (SELECT cluster,
                        md5_number_lower(array_to_string(ev, ',')) AS ckey
                 FROM c{n_iters}) kk USING (cluster)
GROUP BY f.cluster ORDER BY f.cluster""")


SQL_KMEANS_EXACT = _gen_sql_kmeans_exact()


def q_semdedup_exact(sf_dir: str):
    """Integer-exact SemDeDup (clustering.semdedup_exact): clusters from
    the exact k-means fit, rank-by-centroid-cosine and the eps test both
    exact rational arithmetic — the full pipeline (iterative fit +
    cosine pruning) replays in one static SQL (SQL_SEMDEDUP_EXACT).
    Pairs the machinery the float ``semdedup`` query documents as
    rows-only. Returns (vec_id, cluster, keep) per row. eps = 2/5: the
    synthetic embeddings have no true near-dups (max pairwise cosine
    ~0.51), so the paper's 0.95 would never exercise the drop path —
    0.4 makes the oracle check cover BOTH branches."""
    from gush_ray.stages.clustering import semdedup_exact

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = semdedup_exact(emb, k=8, eps=(2, 5), n_iters=5).to_pandas()
    out["keep"] = out["keep"].astype(bool)
    return out.sort_values("vec_id").reset_index(drop=True)


def _gen_sql_semdedup_exact(k: int = 8, n_iters: int = 5,
                            scale: int = 1 << 14,
                            eps: tuple[int, int] = (2, 5)) -> str:
    """SemDeDup over the exact-fit chain. Sign-aware rational cosine
    comparisons: rank key = a·|a|/max(nx,1) cross-multiplied in hugeint
    (strictly monotone in cos); the eps test is
    b > 0 AND b²·den² > num²·nx_i·nx_j. scale 2^14 bounds every product
    under hugeint (see clustering.semdedup_exact docstring)."""
    num, den = eps

    def dot(a: str, b: str) -> str:
        return (f"list_sum(list_transform(generate_series(1, len({a})), "
                f"i -> {a}[i]*{b}[i]))")

    ctes = _kmeans_exact_ctes(k, n_iters, scale)
    ctes.append(
        f"nrm AS MATERIALIZED (SELECT f.vec_id, f.cluster, f.ev, "
        f"{dot('f.ev', 'f.ev')} AS nx, {dot('f.ev', 'c.ev')} AS a "
        f"FROM fin f JOIN c{n_iters} c USING (cluster))")
    ctes.append(
        "pr AS (SELECT x.vec_id AS xid, y.vec_id AS yid, "
        "x.nx AS xn, y.nx AS yn, "
        "CAST(x.a AS HUGEINT)*abs(x.a)*GREATEST(y.nx, 1) AS kx, "
        "CAST(y.a AS HUGEINT)*abs(y.a)*GREATEST(x.nx, 1) AS ky, "
        f"{dot('x.ev', 'y.ev')} AS b "
        "FROM nrm x JOIN nrm y ON y.cluster = x.cluster "
        "AND y.vec_id <> x.vec_id)")
    ctes.append(
        "drops AS (SELECT DISTINCT xid AS vec_id FROM pr "
        "WHERE (ky < kx OR (ky = kx AND yid < xid)) AND b > 0 "
        f"AND CAST(b AS HUGEINT)*b*{den * den} > "
        f"{num * num}*CAST(xn AS HUGEINT)*yn)")
    return ("WITH " + ",\n".join(ctes) + """
SELECT n.vec_id, n.cluster, d.vec_id IS NULL AS keep
FROM nrm n LEFT JOIN drops d USING (vec_id)
ORDER BY n.vec_id""")


SQL_SEMDEDUP_EXACT = _gen_sql_semdedup_exact()


def q_semdedup(sf_dir: str):
    """Semantic dedup (SemDeDup, arXiv:2303.09540) over the embeddings
    table: k-means the embedding space, then within each cluster drop
    items whose cosine similarity to a higher-ranked (farther-from-
    centroid) clustermate exceeds eps. One fit + one assign pass + ONE
    hash shuffle by cluster; the within-cluster kernel is a chunked
    matmul. Rows-only (iterative k-means isn't SQL-expressible);
    distributed == single-process rule pinned by test_clustering.
    Runs over the planted-dup corpus (original ∪ perturbed copy at
    cosine ≈ 0.999): every copy lands in its original's cluster and
    one of each pair is dropped, so n_kept ≈ n/2 per cluster."""
    from gush_ray.stages.clustering import semdedup

    out = semdedup(_emb_dup_corpus(sf_dir), k=8, eps=0.95, seed=7,
                   n_iters=10, sample_size=2000,
                   num_partitions=8).to_pandas()
    agg = out.groupby("cluster", as_index=False).agg(
        n=("vec_id", "size"), n_kept=("keep", "sum"))
    agg["n_kept"] = agg["n_kept"].astype("int64")
    return agg.sort_values("cluster").reset_index(drop=True)


def q_ivf_index_ann(sf_dir: str):
    """ANN with a TRAINED build-once IVF index: spherical-k-means list
    assignment written as list-partitioned parquet; the query reads only
    the n_probe nearest lists. Data-adaptive complement of
    lsh_index_ann (better pruning on clustered corpora; needs a
    training sample). Rows-only: k-means lists aren't SQL-expressible."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from gush_ray.stages.similarity import build_ivf_index, ivf_index_topk

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    key = _fixture_cache_key(sf_dir)
    idx = build_ivf_index(emb, f"/tmp/gush_ray_ivf_index/{key}",
                          n_lists=16, sample_size=2000)
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    qrow = qtab.filter(pc.equal(qtab["vec_id"], 0))
    qvec = np.array(qrow["embedding"][0].as_py(), dtype=np.float64)
    # full probe => exact top-k (deterministic vs the data layout);
    # callers trade recall for reads by lowering n_probe
    return ivf_index_topk(idx, qvec, k=10, n_probe=16)


def _cdc_hash_terms(window: int = 16) -> str:
    """The rolling polynomial window hash as a closed-form SQL sum:
    h(j) = sum_i byte[j+i] * P^i (uint64 wraparound) — mod 2^64 is
    addition/multiplication-homomorphic, so one trailing mod equals
    numpy's per-op wrap. ASCII corpus: substr chars == utf-8 bytes."""
    p, m64 = 1099511628211, 1 << 64
    return " + ".join(
        f"ascii(substr(text, j+{i}, 1))::HUGEINT * {pow(p, i, m64)}"
        for i in range(window)
    )


# content-defined chunking, the twin of chunk_documents(hash_fn='md5')
# + the chunk-hash dedup aggregate: window hash -> candidate
# boundaries (h % 64 == 0) -> the greedy min/max clamp as a recursive
# per-candidate scan (f = number of forced max_len splits before each
# candidate, computed arithmetically), final tail as an accept-always
# sentinel, short docs (n <= min_len) as a single whole-doc chunk
SQL_CONTENT_CHUNKS = f"""
WITH RECURSIVE
d AS (SELECT doc_id, coalesce(text,'') AS text,
             len(coalesce(text,'')) AS n FROM documents),
wh AS (
  SELECT doc_id, j, (({_cdc_hash_terms()}) % {_M64})::UBIGINT AS h
  FROM d, UNNEST(range(1, n - 14)) AS t(j)
  WHERE n > 24
),
cand0 AS (
  SELECT doc_id, (j + 15)::BIGINT AS c, FALSE AS is_final
  FROM wh WHERE h % 64 = 0
  UNION ALL
  SELECT doc_id, n::BIGINT, TRUE FROM d WHERE n > 24
),
cands AS (
  SELECT doc_id, c, is_final,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY c, is_final) AS rn
  FROM cand0
),
rec(doc_id, rn, start, f, c, accepted) AS (
  SELECT doc_id, 0::BIGINT, 0::BIGINT, 0::BIGINT, 0::BIGINT, FALSE
  FROM d WHERE n > 24
  UNION ALL
  SELECT r.doc_id, cd.rn,
         CASE WHEN (NOT cd.is_final AND cd.c - (r.start
                    + greatest(0, (cd.c - r.start - 1) // 256) * 256) >= 24)
                OR (cd.is_final AND cd.c > r.start
                    + greatest(0, (cd.c - r.start - 1) // 256) * 256)
              THEN cd.c
              ELSE r.start
                   + greatest(0, (cd.c - r.start - 1) // 256) * 256 END,
         greatest(0, (cd.c - r.start - 1) // 256),
         cd.c,
         (NOT cd.is_final AND cd.c - (r.start
              + greatest(0, (cd.c - r.start - 1) // 256) * 256) >= 24)
           OR (cd.is_final AND cd.c > r.start
               + greatest(0, (cd.c - r.start - 1) // 256) * 256)
  FROM rec r JOIN cands cd ON cd.doc_id = r.doc_id AND cd.rn = r.rn + 1
),
steps AS (
  SELECT r.doc_id, r.rn, p.start AS prev_start, r.f, r.c, r.accepted
  FROM rec r JOIN rec p ON p.doc_id = r.doc_id AND p.rn = r.rn - 1
),
ends0 AS (
  SELECT doc_id, (prev_start + i * 256)::BIGINT AS e
  FROM steps, UNNEST(range(1, f + 1)) AS t(i)
  UNION ALL
  SELECT doc_id, c FROM steps WHERE accepted
  UNION ALL
  SELECT doc_id, n::BIGINT FROM d WHERE n > 0 AND n <= 24
),
chunks AS (
  SELECT doc_id, e,
         coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY e), 0) AS s
  FROM ends0
),
hashed AS (
  SELECT c.doc_id, (c.e - c.s)::BIGINT AS chunk_len,
         md5_number_lower(substr(d.text, c.s + 1, c.e - c.s)) AS chunk_hash
  FROM chunks c JOIN d USING (doc_id)
)
SELECT chunk_hash, count(*)::BIGINT AS n_copies, min(doc_id) AS keep_doc,
       max(chunk_len) AS chunk_len
FROM hashed GROUP BY chunk_hash ORDER BY chunk_hash
"""


def q_content_chunks(sf_dir: str):
    """Content-defined chunking + chunk-level exact dedup: documents
    explode into rolling-hash-bounded chunks; duplicate chunks collapse
    by hash (sub-document dedup, the CDC primitive). Verification hash
    mode (md5) — SQL_CONTENT_CHUNKS reproduces boundaries AND chunk
    hashes; the bench path keeps hash_fn='fast'."""
    from gush_ray.stages.agg import partial_aggregate
    from gush_ray.stages.chunking import chunk_documents

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def guard_ascii(b: pd.DataFrame) -> pd.DataFrame:
        # the SQL twin hashes CHARACTERS (ascii(substr), len) while the
        # engine chunks utf-8 BYTES — identical only on ASCII text. The
        # engine itself is byte-correct on any corpus; the VERIFICATION
        # query makes its equivalence assumption checkable instead of
        # silently wrong if the fixture ever gains accents (review
        # finding)
        bad = ~b["text"].fillna("").map(str.isascii)
        if bad.any():
            ids = b.loc[bad, "doc_id"].head(5).tolist()
            raise ValueError(
                f"content_chunks oracle assumes ASCII text (chars == "
                f"utf-8 bytes); non-ASCII docs found, e.g. {ids}")
        return b

    docs = docs.map_batches(guard_ascii, batch_format="pandas")
    chunks = chunk_documents(docs, hash_fn="md5")
    agg = partial_aggregate(
        chunks, ["chunk_hash"],
        {"n_copies": (None, "count"), "keep_doc": ("doc_id", "min"),
         "chunk_len": ("chunk_len", "max")},
    )
    df = agg.to_pandas()
    return (df.sort_values(["chunk_hash"]).reset_index(drop=True)
            .astype({"chunk_hash": "uint64"}))


def q_approx_distinct(sf_dir: str):
    """HyperLogLog approximate distinct users WITH a driver-verifiable
    tolerance check: each batch ships 2^12 one-byte registers instead of
    its keyspace. Output = the distributed EXACT distinct count (the
    SQL-matchable value) plus ``hll_ok`` — whether the HLL estimate is
    within 4x its standard error (1.04/sqrt(2^p)) of the exact count.
    The estimate stays approximate by design; its accuracy bound is what
    the oracle row verifies (plus the <5% pin in tests)."""
    from gush_ray.stages.shuffle import partition_map
    from gush_ray.stages.sketches import approx_distinct

    ev = _read(sf_dir, "events", columns=["user_id"])
    est = approx_distinct(ev, "user_id", p=12)
    distinct = partition_map(
        ev, "user_id", lambda df: df.drop_duplicates(["user_id"]), 8
    )
    n_exact = int(distinct.count())
    rel_bound = 4 * 1.04 / (2 ** 6)  # 4 sigma at p=12 (sqrt(2^12) = 64)
    ok = abs(est - n_exact) <= rel_bound * max(n_exact, 1)
    return pd.DataFrame({"n_exact": [n_exact], "hll_ok": [bool(ok)]})


SQL_APPROX_DISTINCT = """
SELECT count(DISTINCT user_id) AS n_exact, TRUE AS hll_ok FROM events
"""


def _lang_stop_values() -> str:
    from gush_ray.stages.text import _STOP

    return ", ".join(f"('{lang}', '{w}')"
                     for lang in sorted(_STOP) for w in _STOP[lang])


# stopword-hit scoring, largest-score / largest-lang tie-break, 'und'
# when no profile hits — the twin of LangIdModel.__call__ (profile
# membership by string equality == by hash, collision-free here; the
# token alphabet is text.LANGID_TOKEN_CHARS, defined once and CLOSED so
# Python re and RE2 agree by construction on ANY corpus)
SQL_LANG_ID = f"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(regexp_extract_all(lower(coalesce(text,'')),
                                   '[{{token_chars}}]+')) AS tok
  FROM documents
),
stop(lang_s, tok) AS (VALUES {{stop_values}}),
scores AS (
  SELECT t.doc_id, s.lang_s, count(*) AS score
  FROM toks t JOIN stop s USING (tok)
  GROUP BY t.doc_id, s.lang_s
),
best AS (
  SELECT doc_id, lang_s AS lang_pred,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang_s DESC) AS rn
  FROM scores
),
pred AS (
  SELECT d.doc_id, d.lang, coalesce(b.lang_pred, 'und') AS lang_pred
  FROM documents d
  LEFT JOIN (SELECT doc_id, lang_pred FROM best WHERE rn = 1) b
    USING (doc_id)
)
SELECT lang, lang_pred, count(*)::BIGINT AS n
FROM pred GROUP BY lang, lang_pred ORDER BY lang, lang_pred
"""

# winnowing fingerprint = min md5-lower64 over char 5-shingles (docs of
# <=5 chars hash whole-text; null docs -> 0) — twin of fingerprint_batch
# in hash_fn="md5" mode
SQL_FINGERPRINT = """
WITH g AS (
  SELECT doc_id, lang, substr(text, j, 5) AS gram
  FROM documents, UNNEST(range(1, len(text) - 3)) AS t(j)
  WHERE text IS NOT NULL AND len(text) > 5
  UNION ALL
  SELECT doc_id, lang, text FROM documents
  WHERE text IS NOT NULL AND len(text) <= 5
)
SELECT doc_id, lang, min(md5_number_lower(gram)) AS fingerprint
FROM g GROUP BY doc_id, lang
UNION ALL
SELECT doc_id, lang, 0::UBIGINT FROM documents WHERE text IS NULL
ORDER BY doc_id
"""


def _splitmix_cte(src: str, val_cols: str, key: str = "doc_id") -> str:
    """CTE chain computing pandas' int64 hash (the splitmix64 finalizer
    pandas.core.util.hashing applies to integer arrays — verified
    value-equal) as column ``x`` over ``src``; delegates the chain to
    :func:`_splitmix_steps` (one implementation for every oracle)."""
    return f"""
h0 AS (SELECT {val_cols},
              ((({key})::HUGEINT % {_M64} + {_M64}) % {_M64})::UBIGINT AS x
       FROM {src}),{_splitmix_steps('h0', val_cols, 'h')}"""


# greedy per-partition context-window packing — the twin of
# pack_sequences: partition = pandas-hash(doc_id) % 16, docs packed in
# doc_id order by a sequential recursive scan (fill resets are not a
# window function), bin_id = (part << 32) | local_bin
SQL_PACK_SEQUENCES = f"""
WITH RECURSIVE base AS (
  SELECT doc_id,
         (len(coalesce(text,''))
          - len(replace(coalesce(text,''), ' ', '')) + 1)::BIGINT
           AS n_tokens
  FROM documents
),{{splitmix}},
rows_ AS (
  SELECT doc_id, n_tokens, (x % 16)::BIGINT AS part,
         row_number() OVER (PARTITION BY x % 16 ORDER BY doc_id) AS rn
  FROM h5
),
rec(part, rn, doc_id, n_tokens, fill, bin) AS (
  SELECT part, rn, doc_id, n_tokens, n_tokens, 0::BIGINT
  FROM rows_ WHERE rn = 1
  UNION ALL
  SELECT r.part, r.rn, r.doc_id, r.n_tokens,
         CASE WHEN rec.fill + r.n_tokens > 512 THEN r.n_tokens
              ELSE rec.fill + r.n_tokens END,
         CASE WHEN rec.fill + r.n_tokens > 512 THEN rec.bin + 1
              ELSE rec.bin END
  FROM rec JOIN rows_ r ON r.part = rec.part AND r.rn = rec.rn + 1
)
SELECT doc_id, n_tokens, (part * 4294967296 + bin)::BIGINT AS bin_id
FROM rec ORDER BY doc_id
"""


from gush_ray.stages.text import LANGID_TOKEN_CHARS as _LANGID_CHARS

SQL_LANG_ID = SQL_LANG_ID.format(stop_values=_lang_stop_values(),
                                 token_chars=_LANGID_CHARS)
SQL_PACK_SEQUENCES = SQL_PACK_SEQUENCES.format(
    splitmix=_splitmix_cte("base", "doc_id, n_tokens"))


def q_lang_id(sf_dir: str):
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    pred = docs.map_batches(LangIdModel, batch_format="pandas",
                            concurrency=2, batch_size=256, num_cpus=1)
    from gush_ray.stages.agg import partial_aggregate

    return partial_aggregate(pred, ["lang", "lang_pred"],
                             {"n": (None, "count")})


def q_fingerprint(sf_dir: str):
    """Winnowing fingerprints in verification hash mode (md5 —
    DuckDB-reproducible, SQL_FINGERPRINT); bench path keeps
    hash_fn='fast'."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    fp = docs.map_batches(lambda b: fingerprint_batch(b, hash_fn="md5"),
                          batch_format="pandas")

    def to_out(b: pd.DataFrame) -> pd.DataFrame:
        return b[["doc_id", "lang", "fingerprint"]]

    return fp.map_batches(to_out, batch_format="pandas")


def q_multimodal_features(sf_dir: str):
    """Binary-blob plumbing: sniff + actor-pool decode stub over the
    synthetic pages' html column; per-lang feature aggregate."""
    pages_dir = ensure_pages(n_urls=1_000, seed=7)
    ds = rd.read_parquet(pages_dir)
    ds = ds.map_batches(sniff_blob_batch, batch_format="pyarrow",
                        zero_copy_batch=True)
    ds = decode_features(ds, blob_col="html", concurrency=2, batch_size=256)
    from gush_ray.stages.agg import partial_aggregate

    agg = partial_aggregate(
        ds, ["lang", "blob_kind"],
        {"n": (None, "count"), "sum_w": ("width", "sum")},
    )
    df = agg.to_pandas()
    df["avg_width"] = (df["sum_w"] / df["n"]).round(4)
    return df.drop(columns=["sum_w"])


MEDIA_FIXTURE = "/tmp/gush_ray_media/v3"
VIDEO_FIXTURE = "/tmp/gush_ray_video/v2"


def q_multimodal_decode(sf_dir: str):
    """REAL media decode (pure-stdlib PNG/BMP/WAV codecs + JPEG/GIF
    header-walk geometry) over a fixture of actual encoded blobs:
    actor-pool decode → per-blob (kind, ok, width, height). Oracle-
    paired: the DuckDB side reads the GENERATOR's ground-truth parquet
    (datagen.ensure_media_fixture), so any codec drift — one wrong
    pixel dimension on any blob — breaks the pair. Truncated blobs
    surface as decode_ok=False (dead-letter analog)."""
    from gush_ray.datagen import ensure_media_fixture

    root = ensure_media_fixture(MEDIA_FIXTURE)
    ds = rd.read_parquet(os.path.join(root, "media.parquet"),
                         columns=["media_id", "blob"])
    ds = decode_features(ds, blob_col="blob", concurrency=2, batch_size=32)
    df = ds.select_columns(
        ["media_id", "decode_kind", "decode_ok", "width", "height"]
    ).to_pandas()
    return df.sort_values("media_id").reset_index(drop=True)


SQL_MULTIMODAL_DECODE = f"""
SELECT media_id, decode_kind, decode_ok, width, height
FROM read_parquet('{MEDIA_FIXTURE}/expected.parquet')
ORDER BY media_id
"""


RESIZE_FIXTURE = "/tmp/gush_ray_media_rs/v1"


def q_multimodal_resize(sf_dir: str):
    """Real image resize pipeline, EXACTLY paired (round 4 — the
    multimodal_decode technique): decode PNG/BMP → nearest-neighbor
    resize to 32×32 → re-encode PNG (actor-pool stage) → RE-DECODE the
    output blob and hash the canonical pixel bytes. The oracle reads
    the GENERATOR's ground truth (datagen.ensure_resize_fixture: the
    raw synthetic pixel arrays indexed by an independently-written
    floor mapping), so one wrong pixel anywhere in the
    decode/resize/encode/decode round trip breaks the hash. WAV /
    truncated / header-only JPEG/GIF blobs must pass through
    unresized (null hash)."""
    import hashlib

    from gush_ray.datagen import ensure_resize_fixture
    from gush_ray.stages.codecs import decode_png
    from gush_ray.stages.multimodal import ResizeImages, sniff_blob_batch

    root = ensure_resize_fixture(RESIZE_FIXTURE)
    ds = rd.read_parquet(os.path.join(root, "media.parquet"),
                         columns=["media_id", "blob"])
    ds = ds.map_batches(lambda b: sniff_blob_batch(b, blob_col="blob"),
                        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(
        ResizeImages,
        fn_constructor_kwargs={"blob_col": "blob", "out_w": 32, "out_h": 32},
        batch_format="pyarrow", batch_size=32, concurrency=2, num_cpus=1,
    )

    def verify(b: pa.Table) -> pa.Table:
        hashes = []
        for blob, did in zip(b["blob"].to_pylist(),
                             b["resized"].to_pylist()):
            if not did:
                hashes.append(None)
                continue
            px = decode_png(blob)
            c = px.shape[2] if px.ndim == 3 else 1
            hashes.append(hashlib.md5(
                f"{px.shape[0]}:{px.shape[1]}:{c}:".encode()
                + np.ascontiguousarray(px).tobytes()).hexdigest())
        return pa.table({
            "media_id": b["media_id"],
            "resized": b["resized"],
            "px_md5": pa.array(hashes, type=pa.string()),
        })

    df = ds.map_batches(verify, batch_format="pyarrow").to_pandas()
    return df.sort_values("media_id").reset_index(drop=True)


SQL_MULTIMODAL_RESIZE = f"""
SELECT media_id, resized, px_md5
FROM read_parquet('{RESIZE_FIXTURE}/expected_resize.parquet')
ORDER BY media_id
"""


def q_frame_sample(sf_dir: str):
    """Real video frame sampling over Y4M clips: every 5th frame
    explodes into its own row with true dims + luma features; per-clip
    sampled-frame counts returned. Oracle-paired against the generator's
    ground-truth parquet (datagen.ensure_video_fixture): frame counts,
    dims and the sampling arithmetic are all verified; the truncated
    clip must be dropped whole (it is absent from both sides)."""
    from gush_ray.datagen import ensure_video_fixture
    from gush_ray.stages.agg import partial_aggregate
    from gush_ray.stages.multimodal import SampleFrames

    root = ensure_video_fixture(VIDEO_FIXTURE)
    ds = rd.read_parquet(os.path.join(root, "video.parquet"))
    ds = ds.map_batches(
        SampleFrames,
        fn_constructor_kwargs={"blob_col": "blob", "every_k": 5},
        batch_format="pyarrow", batch_size=8, concurrency=2, num_cpus=1,
    )
    agg = partial_aggregate(
        ds, ["media_id"],
        {"n_sampled": (None, "count"), "n_frames": ("n_frames", "max"),
         "width": ("width", "max"), "height": ("height", "max")},
    )
    return agg.to_pandas().sort_values("media_id").reset_index(drop=True)


SQL_FRAME_SAMPLE = f"""
SELECT media_id, n_sampled, n_frames, width, height
FROM read_parquet('{VIDEO_FIXTURE}/expected.parquet')
ORDER BY media_id
"""


def q_pages_flagship(sf_dir: str):
    """The full streaming CEP pipeline (extract → dedup/version → windows
    → sessions → NFA → exactly-once sink) over the deterministic synthetic
    pages stream; returns the closed event-time windows.

    num_partitions=1 so the watermark (min over partition maxima) is the
    global running event-time max — the one watermark a static DuckDB
    oracle can reproduce (SQL_PAGES_FLAGSHIP; the engine's partition
    hash is not SQL-expressible). Multi-partition watermark/late/resume
    behavior is pinned by tests/test_epoch_loop.py."""
    from gush_ray.pipelines.epoch_loop import StreamingJob

    pages_dir = ensure_pages(n_urls=2_000, seed=7)
    out_dir = f"/tmp/gush_ray_q/{uuid.uuid4().hex}"
    job = StreamingJob(pages_dir, out_dir, run_id=uuid.uuid4().hex,
                       num_partitions=1)
    job.run()
    windows = job.read_output("windows")
    job.kill_actors()
    shutil.rmtree(out_dir, ignore_errors=True)
    return windows.sort_values(
        ["lang", "change_kind", "window_id"]
    ).reset_index(drop=True)


def q_stream_join(sf_dir: str):
    """Stream-stream windowed join (changes × clicks within ±30 min,
    buffered per-partition state, watermark-pruned, exactly-once): pair
    counts per change version. Streaming == batch interval join is
    pinned by tests/test_stream_join.py; additionally oracle-paired
    directly (SQL_STREAM_JOIN: the survivor pipeline + the two-stream
    watermark + the inclusive interval join, all in SQL over the same
    fixture parquet). num_partitions=1 for the same reason as
    q_pages_flagship."""
    from gush_ray.pipelines.epoch_loop import StreamingJob
    from gush_ray.state.join_state import JoinSpec

    pages_dir = ensure_pages(n_urls=2_000, seed=7)
    clicks_dir = _ensure_clicks()
    out_dir = f"/tmp/gush_ray_q/{uuid.uuid4().hex}"
    HALF_H = _HALF_H_US
    job = StreamingJob(
        pages_dir, out_dir, run_id=uuid.uuid4().hex, num_partitions=1,
        right_dir=clicks_dir,
        join_spec=JoinSpec(-HALF_H, HALF_H, left_cols=("version",),
                           right_cols=("click_id",)),
    )
    job.run()
    joined = job.read_output("joined")
    job.kill_actors()
    shutil.rmtree(out_dir, ignore_errors=True)
    out = joined.groupby("version", as_index=False).size().rename(
        columns={"size": "n_pairs"}
    )
    return out.sort_values("version").reset_index(drop=True)


SQL_ASOF_STREAM_JOIN = f"""
WITH pages AS (
  SELECT url, epoch_us(warc_ts) AS ts_us, CAST(epoch AS BIGINT) AS epoch
  FROM read_parquet('{PAGES_FIXTURE}/epoch=*/part-*.parquet',
                    hive_partitioning=1)
  WHERE text IS NOT NULL
),
clicks AS (
  SELECT url, epoch_us(ts) AS c_ts, click_id, CAST(epoch AS BIGINT) AS epoch
  FROM read_parquet('{CLICKS_FIXTURE}/epoch=*/part-*.parquet',
                    hive_partitioning=1)
),
uniq AS (SELECT url, ts_us, epoch FROM pages GROUP BY ALL),
wm AS (
  SELECT p.epoch,
         least(max(p.mx) OVER (ORDER BY p.epoch),
               max(c.mx) OVER (ORDER BY c.epoch)) AS wm_after
  FROM (SELECT epoch, max(ts_us) AS mx FROM pages GROUP BY epoch) p
  JOIN (SELECT epoch, max(c_ts) AS mx FROM clicks GROUP BY epoch) c
    ON c.epoch = p.epoch
),
flagged AS (
  SELECT u.*, coalesce(w.wm_after, {NEG_INF_SQL}) AS wm_prev
  FROM uniq u LEFT JOIN wm w ON w.epoch = u.epoch - 1
),
nonlate AS (SELECT * FROM flagged WHERE ts_us >= wm_prev),
survivors AS (
  SELECT a.url, a.ts_us FROM nonlate a
  WHERE NOT EXISTS (
    SELECT 1 FROM nonlate b
    WHERE b.url = a.url AND b.epoch < a.epoch AND b.ts_us >= a.ts_us
  )
),
changes AS (
  SELECT url, ts_us,
         row_number() OVER (PARTITION BY url ORDER BY ts_us) - 1 AS version
  FROM survivors
),
flagged_c AS (
  SELECT c.*, coalesce(w.wm_after, {NEG_INF_SQL}) AS wm_prev
  FROM clicks c LEFT JOIN wm w ON w.epoch = c.epoch - 1
),
admitted AS (SELECT * FROM flagged_c WHERE c_ts >= wm_prev)
SELECT a.url, s.ts_us AS l_ts_us, a.c_ts AS r_ts_us,
       s.version, a.click_id
FROM admitted a ASOF JOIN changes s
  ON a.url = s.url AND a.c_ts >= s.ts_us
ORDER BY a.url, l_ts_us, r_ts_us, a.click_id
"""


SQL_ASOF_STREAM_JOIN_OUTER = SQL_ASOF_STREAM_JOIN.replace(
    "FROM admitted a ASOF JOIN changes s",
    "FROM admitted a ASOF LEFT JOIN changes s")


def q_asof_stream_join_outer(sf_dir: str):
    """LEFT OUTER variant of the streaming temporal join
    (JoinSpec(mode="asof", outer=True)): clicks with NO earlier change
    version of their url still emit, with null l_ts_us/version —
    DuckDB's ASOF LEFT JOIN semantics, paired by swapping exactly that
    keyword pair in the inner oracle. Same num_partitions=1 watermark
    reasoning as q_asof_stream_join."""
    from gush_ray.pipelines.epoch_loop import StreamingJob
    from gush_ray.state.join_state import JoinSpec

    pages_dir = ensure_pages(n_urls=2_000, seed=7)
    clicks_dir = _ensure_clicks()
    out_dir = f"/tmp/gush_ray_q/{uuid.uuid4().hex}"
    job = StreamingJob(
        pages_dir, out_dir, run_id=uuid.uuid4().hex, num_partitions=1,
        right_dir=clicks_dir,
        join_spec=JoinSpec(0, 0, mode="asof", outer=True,
                           left_cols=("version",),
                           right_cols=("click_id",)),
    )
    job.run()
    joined = job.read_output("joined")
    job.kill_actors()
    shutil.rmtree(out_dir, ignore_errors=True)
    out = joined[["url", "l_ts_us", "r_ts_us", "version",
                  "click_id"]].copy()
    # nullable int columns -> float64/NaN: the representation DuckDB's
    # fetchdf gives a nullable BIGINT, so both compare sides agree (a
    # pandas Int64 with NA cannot cast to plain int64 in the harness)
    out["l_ts_us"] = out["l_ts_us"].astype("float64")
    out["version"] = out["version"].astype("float64")
    return out.sort_values(
        ["url", "l_ts_us", "r_ts_us", "click_id"]).reset_index(drop=True)


def q_asof_stream_join(sf_dir: str):
    """Streaming event-time TEMPORAL join (Flink FOR SYSTEM_TIME AS OF /
    DuckDB ASOF JOIN): each click pairs with the LATEST change-stream
    version of its url at-or-before the click's event time, exactly
    once, emitted when the watermark passes the click (only then is the
    url's version history at that instant final). Left state is pruned
    to latest-version-per-url + in-flight rows — bounded by key
    cardinality like the V1 dedup map, not by stream length
    (state/join_state.drain_asof). num_partitions=1 for the same
    SQL-expressible-watermark reason as q_stream_join; multi-P and
    kill->resume are pinned by tests/test_stream_join.py."""
    from gush_ray.pipelines.epoch_loop import StreamingJob
    from gush_ray.state.join_state import JoinSpec

    pages_dir = ensure_pages(n_urls=2_000, seed=7)
    clicks_dir = _ensure_clicks()
    out_dir = f"/tmp/gush_ray_q/{uuid.uuid4().hex}"
    job = StreamingJob(
        pages_dir, out_dir, run_id=uuid.uuid4().hex, num_partitions=1,
        right_dir=clicks_dir,
        join_spec=JoinSpec(0, 0, mode="asof", left_cols=("version",),
                           right_cols=("click_id",)),
    )
    job.run()
    joined = job.read_output("joined")
    job.kill_actors()
    shutil.rmtree(out_dir, ignore_errors=True)
    out = joined[["url", "l_ts_us", "r_ts_us", "version", "click_id"]]
    return out.sort_values(
        ["url", "l_ts_us", "r_ts_us", "click_id"]).reset_index(drop=True)


def q_windowed_unique(sf_dir: str):
    """Windowed DISTINCT-url counts (streaming "unique visitors"):
    the flagship pipeline with ``window_distinct=True`` — every open
    window additionally tracks the exact set of urls seen and emits
    ``n_distinct`` at close. num_partitions=1 for the same watermark
    reason as q_pages_flagship; the P>1 partition-exactness (global
    distinct == SUM of per-partition n_distinct, since url is the
    exchange key) is pinned by tests/test_epoch_loop.py."""
    from gush_ray.pipelines.epoch_loop import StreamingJob

    pages_dir = ensure_pages(n_urls=2_000, seed=7)
    out_dir = f"/tmp/gush_ray_q/{uuid.uuid4().hex}"
    job = StreamingJob(pages_dir, out_dir, run_id=uuid.uuid4().hex,
                       num_partitions=1, window_distinct=True)
    job.run()
    windows = job.read_output("windows")
    job.kill_actors()
    shutil.rmtree(out_dir, ignore_errors=True)
    out = windows[["lang", "change_kind", "window_id", "n",
                   "n_distinct"]]
    return out.sort_values(
        ["lang", "change_kind", "window_id"]
    ).reset_index(drop=True)


def _ensure_events_epochs(sf_dir: str) -> str:
    """Micro-batch ``sf_dir``'s events table into 3 epoch shard dirs of
    4 parts each (globally ts-sorted — the same rows the batch oracle
    reads, in stream form; sorted arrival means no row is ever
    late-routed, so streaming == batch for ANY partition count).
    Cached per (path, size, mtime) of the source parquet, so a
    regenerated fixture is never served a stale cut (round-2 ADVICE
    cache-keying rule)."""
    import hashlib

    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "events.parquet")
    stt = os.stat(src)
    key = hashlib.md5(
        f"{os.path.abspath(src)}:{stt.st_size}:{stt.st_mtime_ns}"
        .encode()).hexdigest()[:16]
    d = f"/tmp/gush_ray_events_epochs/{key}"
    done = os.path.join(d, "_COMPLETE")
    if os.path.exists(done):
        return d
    tmp = f"{d}.tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    t = pq.read_table(src).sort_by([("ts", "ascending")])
    n = t.num_rows
    cuts = [0, n // 3, 2 * n // 3, n]
    for e in range(3):
        sub = t.slice(cuts[e], cuts[e + 1] - cuts[e])
        ed = os.path.join(tmp, f"epoch={e:04d}")
        os.makedirs(ed, exist_ok=True)
        per = max(1, sub.num_rows // 4)
        for k in range(4):
            sh = sub.slice(k * per,
                           per if k < 3 else sub.num_rows - 3 * per)
            pq.write_table(sh, os.path.join(ed, f"part-{k:04d}.parquet"))
    with open(os.path.join(tmp, "_COMPLETE"), "w") as f:
        f.write("ok")
    try:
        os.replace(tmp, d)   # atomic publish; loser of a race is a noop
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return d


_WQ_QS = (0.5, 0.95, 1.0)

SQL_WINDOW_QUANTILES = (
    "WITH b AS (SELECT event_type, epoch_us(ts) // 21600000000 AS "
    "window_id, value FROM events) SELECT * FROM ("
    + " UNION ALL ".join(
        f"SELECT event_type, window_id, CAST({q} AS DOUBLE) AS q, "
        f"quantile_disc(value, {q}) AS value, count(value) AS n "
        "FROM b GROUP BY 1, 2"
        for q in _WQ_QS)
    + ") ORDER BY 1, 2, 3"
)


_WQ_SKETCH_K = 128

# DuckDB twin of state.store._sketch_rep: the exact octave E is
# recovered from floor(log2(abs(x))) with a verify-adjust CASE (log2 may
# be an ulp off at boundaries; pow(2, E) <= |x| < pow(2, E+1) pins the
# unique integer), then the two rounding float ops ((|x|/2^E - 1)*k and
# j/k) are STRUCTURALLY IDENTICAL to the numpy expressions — IEEE-754
# doubles round the same everywhere, so engine == oracle bit-exactly.
# SIGN handling mirrors the engine's abs + copysign: the bucket rep is
# computed on |value| and the sign reapplied, so negative values are
# monotone too (log2 of the raw value would be NaN for v < 0 and sort
# greatest under DuckDB quantile semantics — the round-3 latent bug).
_SQL_SKETCH_REP = f"""
      sign(value) * pow(2.0, E)
        * (1.0 + LEAST(floor((abs(value) / pow(2.0, E) - 1.0)
                             * {_WQ_SKETCH_K}),
                       {_WQ_SKETCH_K} - 1) / {_WQ_SKETCH_K})
"""

SQL_WINDOW_QUANTILES_SKETCH = (
    "WITH b AS (SELECT event_type, epoch_us(ts) // 21600000000 AS "
    "window_id, value FROM events), "
    "e0 AS (SELECT *, floor(log2(abs(value))) AS E0 FROM b "
    "WHERE value <> 0), "
    "ee AS (SELECT event_type, window_id, value, CASE "
    "  WHEN pow(2.0, E0 + 1) <= abs(value) THEN E0 + 1 "
    "  WHEN pow(2.0, E0) > abs(value) THEN E0 - 1 ELSE E0 END AS E "
    "FROM e0), "
    "r AS (SELECT event_type, window_id, " + _SQL_SKETCH_REP + " AS v "
    "FROM ee UNION ALL SELECT event_type, window_id, 0.0 AS v FROM b "
    "WHERE value = 0) SELECT * FROM ("
    + " UNION ALL ".join(
        f"SELECT event_type, window_id, CAST({q} AS DOUBLE) AS q, "
        f"quantile_disc(v, {q}) AS value, count(v) AS n "
        "FROM r GROUP BY 1, 2"
        for q in _WQ_QS)
    + ") ORDER BY 1, 2, 3"
)


def q_window_quantiles_sketch(sf_dir: str):
    """Bounded-state SKETCH variant of window_quantiles_stream: the
    same two-stage dataflow with ``quantile_sketch_k=128`` — values are
    log-bucketized at accumulation (128 sub-buckets per base-2 octave,
    state/store._sketch_rep), so open-window state is O(octaves x k)
    whatever the value cardinality (the 100-TB path for unbounded
    domains). The transform is rank-preserving and deterministic, so
    the sketch quantile is EXACTLY rep(exact quantile) — relative
    error < 1/128 toward zero, and the DuckDB oracle replays the whole
    thing bit-exactly (SQL_WINDOW_QUANTILES_SKETCH: verify-adjusted
    octave + structurally identical IEEE double ops)."""
    from gush_ray.pipelines.epoch_loop import StreamingJob

    epochs_dir = _ensure_events_epochs(sf_dir)
    out_dir = f"/tmp/gush_ray_q/{uuid.uuid4().hex}"
    job = StreamingJob(
        epochs_dir, out_dir, run_id=uuid.uuid4().hex, num_partitions=4,
        pattern=None, window_size_us=6 * 3600 * 1_000_000,
        window_group_cols=("event_type",), key_col="user_id",
        raw_ts_col="ts", value_col="value", window_quantiles=_WQ_QS,
        quantile_sketch_k=_WQ_SKETCH_K,
    )
    job.run()
    qd = job.read_output("quantiles")
    job.kill_actors()
    shutil.rmtree(out_dir, ignore_errors=True)
    out = qd[["event_type", "window_id", "q", "value", "n"]]
    return out.sort_values(["event_type", "window_id", "q"]).reset_index(
        drop=True)


SQL_SESSION_VALUES = """
WITH e AS (SELECT user_id, epoch_us(ts) AS tus, value FROM events),
x AS (
  SELECT user_id, tus, value,
         CASE WHEN lag(tus) OVER w IS NULL
                   OR tus - lag(tus) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)
),
y AS (
  SELECT user_id, tus, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY tus
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM x
)
SELECT user_id, min(tus) AS session_start_us, max(tus) AS session_end_us,
       count(*) AS n_events, round(sum(value), 6) AS sum_value,
       min(value) AS min_value, max(value) AS max_value
FROM y GROUP BY user_id, sid
ORDER BY user_id, session_start_us
"""


def q_session_values_stream(sf_dir: str):
    """Streaming session windows with per-session VALUE aggregates
    (StateParams.session_values): every open session additionally
    carries (sum, min, max) of value_col through in-batch splits,
    cross-epoch merges and watermark closes. min/max/n/start/end are
    bit-exact vs the SQL islands oracle (order-independent aggregates);
    sum_value is rounded to 6 decimals on BOTH sides — the engine sums
    in event-time order (in-batch grouped sum + cross-epoch appends)
    while SQL sums in scan order, so the ~1e-13 summation-order ulps
    must not leak into the hash (values are O(100) 2-decimal doubles;
    the 1e-6 grid is 7 orders above the noise). Same sorted-arrival
    fixture argument as q_window_quantiles_stream: streaming == batch
    at any P."""
    from gush_ray.pipelines.epoch_loop import StreamingJob

    epochs_dir = _ensure_events_epochs(sf_dir)
    out_dir = f"/tmp/gush_ray_q/{uuid.uuid4().hex}"
    job = StreamingJob(
        epochs_dir, out_dir, run_id=uuid.uuid4().hex, num_partitions=4,
        pattern=None, window_size_us=6 * 3600 * 1_000_000,
        session_gap_us=30 * 60 * 1_000_000,
        window_group_cols=("event_type",), key_col="user_id",
        raw_ts_col="ts", value_col="value", session_values=True,
    )
    job.run()
    s = pd.concat([job.read_output("sessions"),
                   job.read_output("sessions_wm")], ignore_index=True)
    job.kill_actors()
    shutil.rmtree(out_dir, ignore_errors=True)
    out = s[["user_id", "session_start_us", "session_end_us", "n_events",
             "sum_value", "min_value", "max_value"]].copy()
    out["sum_value"] = out["sum_value"].round(6)
    return out.sort_values(["user_id", "session_start_us"]).reset_index(
        drop=True)


SQL_EARLY_FIRE_FOLD = """
SELECT event_type, epoch_us(ts) // 21600000000 AS window_id,
       count(*) AS n, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_early_fire_fold(sf_dir: str):
    """Flink-style EARLY FIRING (speculative triggers): every epoch,
    each open window re-emits its current per-partition partial on the
    ``window_early`` retraction changelog; the close emits the final
    pair. The changelog's defining invariant — fold sum(change*col) per
    (group, window) equals the final totals — IS the oracle: folding
    the whole P=4 changelog must reproduce the plain SQL per-window
    aggregates (and the intermediate emissions are pinned by
    test_state_store/test_epoch_loop, incl. kill->resume identity).
    sum rounded to 1e-6 on both sides for the same summation-order
    reason as q_session_values_stream."""
    from gush_ray.pipelines.epoch_loop import StreamingJob

    epochs_dir = _ensure_events_epochs(sf_dir)
    out_dir = f"/tmp/gush_ray_q/{uuid.uuid4().hex}"
    job = StreamingJob(
        epochs_dir, out_dir, run_id=uuid.uuid4().hex, num_partitions=4,
        pattern=None, window_size_us=6 * 3600 * 1_000_000,
        window_group_cols=("event_type",), key_col="user_id",
        raw_ts_col="ts", value_col="value", window_early_fire=True,
    )
    job.run()
    log = job.read_output("window_early")
    job.kill_actors()
    shutil.rmtree(out_dir, ignore_errors=True)
    fold = log.assign(
        n=log["change"] * log["n"],
        sum_value=log["change"] * log["sum_value"],
    ).groupby(["event_type", "window_id"], as_index=False)[
        ["n", "sum_value"]].sum()
    fold = fold[fold["n"] != 0]  # a fully-retracted window folds away
    fold["sum_value"] = fold["sum_value"].round(6)
    return fold.sort_values(["event_type", "window_id"]).reset_index(
        drop=True)


SQL_WINDOW_COMBINE = """
SELECT event_type,
       epoch_us(ts) // 21600000000 AS window_id,
       count(*) AS n,
       round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_window_combine_stream(sf_dir: str):
    """MAP-SIDE-COMBINED streaming windows (round-5 hot-key
    mitigation, StateParams.window_combine): the map task
    pre-aggregates each shard's on-time rows into per-(group, window)
    cells — count, sum, per-cell max event ts — routed by group+window
    hash; the reduce folds cells into the window slots, so a hot key
    costs its owner O(map tasks × windows) instead of O(rows)
    (chaos-pinned 816× owner-load drop in tests/test_window_combine.py).
    Window semantics in this profile are ON-TIME ARRIVALS; over the
    ts-sorted events epoch stream nothing is ever late, so the
    combined streaming result equals the plain batch GROUP BY at any
    partition count — P=4 here exercises the real cell exchange +
    cross-partition additive merge. sum_value carries the repo's
    6-decimal summation-order rounding contract (see
    q_session_values_stream)."""
    from gush_ray.pipelines.epoch_loop import StreamingJob

    epochs_dir = _ensure_events_epochs(sf_dir)
    out_dir = f"/tmp/gush_ray_q/{uuid.uuid4().hex}"
    job = StreamingJob(
        epochs_dir, out_dir, run_id=uuid.uuid4().hex, num_partitions=4,
        pattern=None, window_size_us=6 * 3600 * 1_000_000,
        window_group_cols=("event_type",), key_col="user_id",
        raw_ts_col="ts", value_col="value", window_combine=True,
    )
    job.run()
    w = job.read_output("windows")
    job.kill_actors()
    shutil.rmtree(out_dir, ignore_errors=True)
    m = w.groupby(["event_type", "window_id"], as_index=False).agg(
        n=("n", "sum"), sum_value=("sum_value", "sum"))
    m["sum_value"] = m["sum_value"].round(6)
    return m.sort_values(["event_type", "window_id"]).reset_index(
        drop=True)


def q_window_quantiles_stream(sf_dir: str):
    """Streaming windowed EXACT order statistics (two-stage dataflow):
    every open (event_type, 6h window) accumulates an exact value
    HISTOGRAM in partition state (state/store.py winq); at window close
    the partitions emit their histogram partials on the ``window_hist``
    stream and the per-epoch merge task
    (epoch_loop._quantile_windows) sums them — exact, histograms are
    additive — and reports quantile_disc-semantics percentiles on the
    ``quantiles`` stream, exactly-once.

    Runs over sf_dir's events micro-batched into a ts-sorted epoch
    stream (_ensure_events_epochs): sorted arrival means no late rows,
    so the streaming result equals the batch oracle at ANY partition
    count — P=4 here exercises the real cross-partition merge (unlike
    the P=1 pages queries, no watermark subtlety leaks into the
    result). Kill->resume and P-independence are additionally pinned by
    tests/test_streaming_batch_equivalence.py."""
    from gush_ray.pipelines.epoch_loop import StreamingJob

    epochs_dir = _ensure_events_epochs(sf_dir)
    out_dir = f"/tmp/gush_ray_q/{uuid.uuid4().hex}"
    job = StreamingJob(
        epochs_dir, out_dir, run_id=uuid.uuid4().hex, num_partitions=4,
        pattern=None, window_size_us=6 * 3600 * 1_000_000,
        window_group_cols=("event_type",), key_col="user_id",
        raw_ts_col="ts", value_col="value", window_quantiles=_WQ_QS,
    )
    job.run()
    qd = job.read_output("quantiles")
    job.kill_actors()
    shutil.rmtree(out_dir, ignore_errors=True)
    out = qd[["event_type", "window_id", "q", "value", "n"]]
    return out.sort_values(["event_type", "window_id", "q"]).reset_index(
        drop=True)


def q_windowed_hll(sf_dir: str):
    """Bounded-state windowed DISTINCT (the sketch counterpart of
    q_windowed_unique, same exact/sketch duality as the quantile pair):
    each open (group, window) holds a 2^12-register HLL over the url
    instead of the exact key set — fixed state per window whatever the
    key cardinality (the 100-TB path). The run enables BOTH modes, so
    the exact n_distinct pins the driver hash bit-exactly and the HLL
    estimate is tolerance-checked against it in the same row (hll_ok;
    bound = 3 + 5% — p=12 standard error is 1.6%, and these windows sit
    in the near-exact linear-counting regime). P=1 for the watermark
    reason of q_pages_flagship; P-independence of the merged estimate
    (register max across partitions) is pinned by test_epoch_loop."""
    from gush_ray.pipelines.epoch_loop import StreamingJob

    pages_dir = ensure_pages(n_urls=2_000, seed=7)
    out_dir = f"/tmp/gush_ray_q/{uuid.uuid4().hex}"
    job = StreamingJob(pages_dir, out_dir, run_id=uuid.uuid4().hex,
                       num_partitions=1, window_distinct=True,
                       window_hll_p=12)
    job.run()
    windows = job.read_output("windows")
    hll = job.read_output("window_hll")
    job.kill_actors()
    shutil.rmtree(out_dir, ignore_errors=True)
    key = ["lang", "change_kind", "window_id"]
    w = windows.groupby(key, as_index=False)["n_distinct"].sum()
    m = w.merge(hll, on=key, validate="one_to_one")
    m["hll_ok"] = (m["n_est"] - m["n_distinct"]).abs() \
        <= 3 + 0.05 * m["n_distinct"]
    out = m[key + ["n_distinct", "hll_ok"]]
    return out.sort_values(key).reset_index(drop=True)


def q_streaming_topk(sf_dir: str):
    """Streaming windowed TOP-K hosts (two-stage dataflow): the url-keyed
    stage-1 accumulators group by a derived host column
    (derive_host=True, window_group_cols=("host",)) and the per-epoch
    stage-2 merge task ranks the global counts per closed window
    (epoch_loop._topk_windows), exactly-once on the `topk` stream.
    num_partitions=1 for the watermark reason of q_pages_flagship; the
    P-independence of the topk stream itself (global merge) is pinned
    by tests/test_epoch_loop.py."""
    from gush_ray.pipelines.epoch_loop import StreamingJob

    pages_dir = ensure_pages(n_urls=2_000, seed=7)
    out_dir = f"/tmp/gush_ray_q/{uuid.uuid4().hex}"
    job = StreamingJob(pages_dir, out_dir, run_id=uuid.uuid4().hex,
                       num_partitions=1, derive_host=True,
                       window_group_cols=("host",), window_topk=3)
    job.run()
    topk = job.read_output("topk")
    job.kill_actors()
    shutil.rmtree(out_dir, ignore_errors=True)
    out = topk[["window_id", "host", "n", "rank"]]
    return out.sort_values(["window_id", "rank"]).reset_index(drop=True)



def q_pages_late_routing(sf_dir: str):
    """Watermark late-data routing (W5): per-lang late-row counts from the
    streaming job's late side-output. Oracle-paired (SQL_PAGES_LATE);
    num_partitions=1 for the same reason as q_pages_flagship."""
    from gush_ray.pipelines.epoch_loop import StreamingJob

    pages_dir = ensure_pages(n_urls=2_000, seed=7)
    out_dir = f"/tmp/gush_ray_q/{uuid.uuid4().hex}"
    job = StreamingJob(pages_dir, out_dir, run_id=uuid.uuid4().hex,
                       num_partitions=1)
    job.run()
    late = job.read_output("late")
    job.kill_actors()
    shutil.rmtree(out_dir, ignore_errors=True)
    if late.empty:
        return pd.DataFrame({"lang": [], "n_late": []})
    out = late.groupby("lang", as_index=False).size()
    return out.rename(columns={"size": "n_late"}).sort_values(
        "lang"
    ).reset_index(drop=True)


def q_pages_refire(sf_dir: str):
    """Flink-style allowed-lateness window RE-FIRING with a retraction
    changelog (window "update mode"): windows fire on time, their
    accumulators are retained for allowed_lateness past the end, and
    each epoch's accepted late rows re-fire their window as a
    (-1 old, +1 new) pair on the `window_updates` stream; folding
    sum(change*n) per window over the changelog yields the final
    totals. num_partitions=1 for the same watermark reason as
    q_pages_flagship; multi-partition fold correctness and kill→resume
    parity are pinned by tests/test_refire.py."""
    from gush_ray.config import EngineConfig
    from gush_ray.pipelines.epoch_loop import StreamingJob

    pages_dir = ensure_pages(n_urls=2_000, seed=7)
    out_dir = f"/tmp/gush_ray_q/{uuid.uuid4().hex}"
    job = StreamingJob(
        pages_dir, out_dir, run_id=uuid.uuid4().hex, num_partitions=1,
        pattern=None, window_group_cols=("lang",), window_refire=True,
        cfg=EngineConfig(allowed_lateness_us=_REFIRE_LATE_US),
    )
    job.run()
    upd = job.read_output("window_updates")
    job.kill_actors()
    shutil.rmtree(out_dir, ignore_errors=True)
    out = upd[["lang", "window_id", "change", "n", "sum_value",
               "fire_seq"]]
    return out.sort_values(
        ["lang", "window_id", "fire_seq", "change"]
    ).reset_index(drop=True)


def q_extract_parity(sf_dir: str):
    """Byte-identity audit of html→text extraction over the synthetic
    pages: returns per-lang (rows, n_identical, n_errors) — n_identical
    must equal rows-n_errors (asserted in tests)."""
    from gush_ray.extract import extract_text_batch

    pages_dir = ensure_pages(n_urls=2_000, seed=7)
    ds = rd.read_parquet(pages_dir)
    ds = ds.map_batches(
        lambda b: extract_text_batch(b, out_col="text_extracted"),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def flags(b: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        return pa.table({
            "lang": b["lang"],
            "ok": b["extract_ok"],
            "same": pc.fill_null(
                pc.equal(b["text_extracted"], b["text"]), False
            ),
        }).to_pandas()

    f = ds.map_batches(flags, batch_format="pyarrow")
    from gush_ray.stages.agg import partial_aggregate

    df = partial_aggregate(
        f, ["lang"],
        {"rows": (None, "count"), "n_identical": ("same", "sum"),
         "n_ok": ("ok", "sum")},
    ).to_pandas()
    df["n_identical"] = df["n_identical"].astype("int64")
    df["n_ok"] = df["n_ok"].astype("int64")
    return df.sort_values("lang").reset_index(drop=True)


def q_warc_roundtrip(sf_dir: str):
    """WARC source byte-identity (the Common Crawl container format):
    pages → write_warc_dir (record-per-gzip-member shards) → read_warc
    (one parse task per shard) must reproduce every
    (url, warc_ts, html, lang) row exactly. html is compared through
    the md5 verification hash (stages/dedup.md5_hash_strings ==
    DuckDB md5_number_lower, unit-pinned), so the oracle check is
    byte-level, not just row counts."""
    from gush_ray.sources.warc import ensure_warc_fixture, read_warc
    from gush_ray.stages.dedup import md5_hash_strings

    root = ensure_warc_fixture()
    ds = read_warc(os.path.join(root, "warc"))

    def project(b: pa.Table) -> pa.Table:
        return pa.table({
            "url": b["url"],
            "ts_us": b["warc_ts"].cast(pa.int64()),
            "lang": b["lang"],
            "html_h": pa.array(
                md5_hash_strings(b["html"].to_pylist()), pa.uint64()),
        })

    df = ds.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    return df.sort_values(["url", "ts_us", "html_h"]).reset_index(drop=True)


def q_wet_roundtrip(sf_dir: str):
    """WET (extracted-text conversion records) round trip: text comes
    back VERBATIM including the null-vs-empty distinction (nulls are
    marked records, see sources/warc.write_wet_dir)."""
    from gush_ray.sources.warc import ensure_warc_fixture, read_wet

    root = ensure_warc_fixture()
    ds = read_wet(os.path.join(root, "wet"))

    def project(b: pa.Table) -> pa.Table:
        return pa.table({
            "url": b["url"],
            "ts_us": b["warc_ts"].cast(pa.int64()),
            "text": b["text"],
        })

    df = ds.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    return df.sort_values(["url", "ts_us"]).reset_index(drop=True)


# the truth parquet is written by the SAME ensure_warc_fixture call the
# query uses; decode(html) is safe because every generated page is
# valid UTF-8 (render_html encodes utf-8; the malformed variant is
# ASCII) — real crawl data would hash raw bytes instead
SQL_WARC_ROUNDTRIP = f"""
SELECT url, epoch_us(warc_ts) AS ts_us, lang,
       md5_number_lower(decode(html)) AS html_h
FROM read_parquet('{WARC_FIXTURE}/truth.parquet')
ORDER BY url, ts_us, html_h
"""

SQL_WET_ROUNDTRIP = f"""
SELECT url, epoch_us(warc_ts) AS ts_us, text
FROM read_parquet('{WARC_FIXTURE}/truth.parquet')
ORDER BY url, ts_us
"""


def _sweep_replace(s_expr: str, a_expr: str, b_expr: str) -> str:
    """ONE replace() == one left-to-right greedy merge sweep.

    Each symbol is rendered as chr(30)||sym||chr(31) (open/close
    brackets, both outside any word alphabet: Python str.split treats
    \\x1c-\\x1f as whitespace, so corpus words can never contain them,
    and chr(30) never appears inside a symbol). Adjacent pattern
    occurrences therefore share NO characters, so replace()'s
    left-to-right non-overlapping scan visits exactly the occurrences
    the trainer's sweep merges — including back-to-back repeats and
    self-pair runs (a,a), where the older single-separator encoding
    consumed the shared boundary and mis-paired odd runs
    ('aaaaa' → [aa,a,aa] instead of the sweep's [aa,aa,a]; caught by
    the hypothesis property in tests/test_bpe.py)."""
    pat = f"chr(30)||{a_expr}||chr(31)||chr(30)||{b_expr}||chr(31)"
    rep = f"chr(30)||{a_expr}||{b_expr}||chr(31)"
    return f"replace({s_expr}, {pat}, {rep})"


def _build_sql_bpe_tokenize(n_merges: int = 60,
                            max_words: int = 100_000) -> str:
    """BPE training AND application in plain SQL — the twin of
    train_bpe + apply_bpe (q_bpe_tokenize).

    Representation: each symbol renders as chr(30)||sym||chr(31)
    (see _sweep_replace — the bracket pair makes ONE replace() per
    merge EXACTLY the trainer's left-to-right greedy sweep, with no
    fixpoint nesting and no self-pair mis-pairing). Each of the
    ``n_merges`` training iterations is a generated CTE triplet
    (pair-count → deterministic argmax → sweep-replace), chained —
    SQL cannot aggregate over a recursive reference, so the fixed
    merge count unrolls instead.

    The encoder's recursive CTE replaces ALL occurrences of the
    min-rank pair present, then recurses; that equals the engine's
    one-occurrence-at-a-time loop (_encode_word) because merging an
    occurrence of the min-rank pair can neither create another pair
    of rank ≤ that rank (new pairs involve the merged token, created
    later ⇒ higher rank) nor destroy a non-overlapping occurrence,
    and overlapping self-pair runs resolve left-to-right in both.
    Every state is MATERIALIZED (60 chained inlined CTEs would blow
    up planning)."""
    parts = [f"""
words0 AS MATERIALIZED (
  SELECT unnest(list_filter(regexp_split_to_array(coalesce(text,''),
                                                  '\\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
hist AS MATERIALIZED (
  SELECT w, count(*)::BIGINT AS f FROM words0 GROUP BY w
  ORDER BY f DESC, w LIMIT {max_words}
),
state0 AS MATERIALIZED (
  SELECT w,
         chr(30) || array_to_string(string_split(w, ''),
                                    chr(31) || chr(30))
                 || chr(31) || chr(30) || chr(9601) || chr(31) AS s,
         f
  FROM hist
)"""]
    for k in range(1, n_merges + 1):
        p = k - 1
        parts.append(f"""
pc{k} AS (
  SELECT sy[i] AS a, sy[i+1] AS b, sum(f) AS c
  FROM (SELECT list_filter(string_split(replace(s, chr(30), ''),
                                        chr(31)),
                           x -> x <> '') AS sy,
               f
        FROM state{p}),
       UNNEST(range(1, len(sy))) AS t(i)
  GROUP BY sy[i], sy[i+1]
),
best{k} AS MATERIALIZED (
  SELECT a, b FROM pc{k} WHERE c >= 2 ORDER BY c DESC, a, b LIMIT 1
),
state{k} AS MATERIALIZED (
  SELECT st.w,
         CASE WHEN bb.a IS NOT NULL
              THEN {_sweep_replace('st.s', 'bb.a', 'bb.b')}
              ELSE st.s END AS s,
         st.f
  FROM state{p} st LEFT JOIN best{k} bb ON TRUE
)""")
    merge_union = "\nUNION ALL\n".join(
        f"SELECT {k - 1} AS r, a, b FROM best{k}"
        for k in range(1, n_merges + 1))
    parts.append(f"""
merges AS MATERIALIZED ({merge_union}),
enc(w, s, it) AS (
  SELECT w, s, 0 FROM state0
  UNION ALL
  SELECT e.w,
         replace(e.s,
                 chr(30)||m.a||chr(31)||chr(30)||m.b||chr(31),
                 chr(30)||m.a||m.b||chr(31)),
         e.it + 1
  FROM enc e
  JOIN merges m
    ON m.r = (SELECT min(m2.r) FROM merges m2
              WHERE position(chr(30)||m2.a||chr(31)||chr(30)||m2.b
                             ||chr(31) IN e.s) > 0)
),
encf AS MATERIALIZED (
  SELECT w, arg_max(s, it) AS s FROM enc GROUP BY w
),
wtok AS MATERIALIZED (
  SELECT w,
         len(list_filter(string_split(replace(s, chr(30), ''), chr(31)),
                         x -> x <> ''))::BIGINT AS n_tok
  FROM encf
),
docwords AS (
  SELECT doc_id, lang,
         unnest(list_filter(regexp_split_to_array(coalesce(text,''),
                                                  '\\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
perdoc AS (
  SELECT d.doc_id, d.lang,
         count(dw.w)::BIGINT AS n_words,
         coalesce(sum(wt.n_tok), 0)::BIGINT AS n_tokens
  FROM documents d
  LEFT JOIN docwords dw USING (doc_id)
  LEFT JOIN wtok wt ON wt.w = dw.w
  GROUP BY d.doc_id, d.lang
)
SELECT lang, count(*)::BIGINT AS n_docs, sum(n_words)::BIGINT AS n_words,
       sum(n_tokens)::BIGINT AS n_tokens
FROM perdoc GROUP BY lang ORDER BY lang
""")
    return ("WITH RECURSIVE " + parts[0].strip() + ","
            + ",".join(p.strip() for p in parts[1:-1]) + ","
            + parts[-1].strip())


SQL_BPE_TOKENIZE = _build_sql_bpe_tokenize()


def q_bpe_tokenize(sf_dir: str):
    """Distributed BPE tokenizer training (word-histogram shape: one
    combiner shuffle, driver payload bounded by max_words) + broadcast
    application with per-actor word caches. Oracle-paired (round 3):
    SQL_BPE_TOKENIZE unrolls the 60 training merges as generated CTEs
    and encodes via a recursive CTE — histogram==corpus training
    parity and losslessness additionally pinned by tests/test_bpe.py."""
    from gush_ray.stages.agg import partial_aggregate
    from gush_ray.stages.bpe import apply_bpe, train_bpe

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    bpe = train_bpe(docs, n_merges=60, max_words=100_000)
    toks = apply_bpe(docs, bpe, id_cols=("doc_id", "lang"))

    def drop_tokens(b: pd.DataFrame) -> pd.DataFrame:
        return b[["lang", "n_words", "n_tokens"]]

    agg = partial_aggregate(
        toks.map_batches(drop_tokens, batch_format="pandas"), ["lang"],
        {"n_docs": (None, "count"), "n_words": ("n_words", "sum"),
         "n_tokens": ("n_tokens", "sum")},
    ).to_pandas()
    agg["n_words"] = agg["n_words"].astype("int64")
    agg["n_tokens"] = agg["n_tokens"].astype("int64")
    return agg.sort_values("lang").reset_index(drop=True)


def q_global_shuffle(sf_dir: str):
    """Deterministic global shuffle for training-data ordering: docs
    ranked by md5(doc_id) — reproducible across runs/machines, unlike
    random_shuffle — with the head materialized via per-batch top-k
    partials (no global sort; only blocks' local top-k rows move).
    The 100-TB shape: the full ordering is realized lazily (any shard
    range can be produced by rank-range filters); the query pins the
    global head against SQL."""
    import hashlib

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def topk(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["shuffle_key"] = b["doc_id"].map(
            lambda i: hashlib.md5(str(int(i)).encode()).hexdigest())
        # nsmallest rejects object dtype: hex keys sort lexicographically,
        # so plain sort + head is the same top-k
        return b.sort_values("shuffle_key", kind="mergesort").head(100)

    head = docs.map_batches(topk, batch_format="pandas").to_pandas()
    head = (head.sort_values("shuffle_key", kind="mergesort").head(100)
            .reset_index(drop=True))
    head["rank"] = np.arange(1, len(head) + 1, dtype=np.int64)
    return head[["rank", "doc_id", "lang"]]


SQL_GLOBAL_SHUFFLE = """
SELECT row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rank,
       doc_id, lang
FROM documents
ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 100
"""


SQL_CCNET_BUCKETS = None  # assigned below (imports the LM prefix)


def _build_sql_ccnet_buckets() -> str:
    from gush_ray.pipelines.queries_analytic import SQL_LM_SCORED_PREFIX

    # tercile cuts: exact_quantiles_nosort implements DuckDB
    # quantile_disc semantics by construction, so the SQL cut IS the
    # engine's cut; buckets compare the same rounded per-doc NLLs
    return SQL_LM_SCORED_PREFIX + """,
cuts AS (SELECT quantile_disc(nll, 1.0/3) AS lo,
                quantile_disc(nll, 2.0/3) AS hi FROM scored)
SELECT lang,
       CASE WHEN nll <= (SELECT lo FROM cuts) THEN 'head'
            WHEN nll <= (SELECT hi FROM cuts) THEN 'middle'
            ELSE 'tail' END AS bucket,
       count(*)::BIGINT AS n_docs
FROM scored GROUP BY lang, bucket ORDER BY lang, bucket
"""


SQL_CCNET_BUCKETS = _build_sql_ccnet_buckets()


def q_ccnet_buckets(sf_dir: str):
    """The full CCNet shape (Wenzek et al. 2019): LM perplexity per doc
    (bigram LM trained on the deterministic quarter), then docs bucketed
    head/middle/tail by the corpus-wide EXACT perplexity terciles
    (histogram-refinement quantiles — no global sort), per-lang bucket
    counts out. Rows-only (log-likelihoods aren't SQL-hashable);
    deterministic via rounded per-doc NLL and exact tercile cuts."""
    import ray

    from gush_ray.stages.agg import partial_aggregate
    from gush_ray.stages.lm import score_perplexity, train_bigram_lm
    from gush_ray.stages.sketches import exact_quantiles_nosort

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    train = docs.map_batches(
        lambda b: b[(b["doc_id"] % 4 == 0).to_numpy()],
        batch_format="pandas")
    lm_ref = ray.put(train_bigram_lm(train, min_count=2,
                                     max_table=5_000_000))
    scored = score_perplexity(docs, lm_ref,
                              id_cols=("doc_id", "lang")).materialize()
    cuts = exact_quantiles_nosort(scored, "nll", [1 / 3, 2 / 3])
    lo, hi = cuts[1 / 3], cuts[2 / 3]

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["nll"].notna()].copy()
        b["bucket"] = np.where(
            b["nll"] <= lo, "head",
            np.where(b["nll"] <= hi, "middle", "tail"))
        return b[["lang", "bucket"]]

    agg = partial_aggregate(
        scored.map_batches(bucket, batch_format="pandas"),
        ["lang", "bucket"], {"n_docs": (None, "count")},
    ).to_pandas()
    return agg.sort_values(["lang", "bucket"]).reset_index(drop=True)


def q_pack_sequences(sf_dir: str):
    """Greedy context-window packing: documents assigned to <=512-token
    bins in deterministic per-partition order (no SQL analog — the
    packing state is sequential; invariants pinned by unit tests)."""
    from gush_ray.stages.corpus import pack_sequences
    from gush_ray.pipelines.queries import _read

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def add_tokens(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["n_tokens"] = (b["text"].fillna("").str.count(" ") + 1).astype("int64")
        return b[["doc_id", "n_tokens"]]

    with_counts = docs.map_batches(add_tokens, batch_format="pandas")
    return pack_sequences(with_counts, "n_tokens", budget=512)


def _build_sql_bloom_semi() -> str:
    """The Bloom filter is deterministic for a fixed input (probes =
    pandas-int64-hash + splitmix64-derived second hash,
    Kirsch-Mitzenmacher double hashing into 2^16 bits), so even the
    'probabilistic' semi join is SQL-reproducible bit for bit: rebuild
    the set-bit positions from the key subset in SQL, keep a doc iff
    none of its 5 probe positions is missing. Both hash stages go
    through the shared :func:`_splitmix_steps` chain."""
    m64 = _M64
    return f"""
WITH
d0 AS (SELECT doc_id, lang,
              ((doc_id::HUGEINT % {m64} + {m64}) % {m64})::UBIGINT AS x
       FROM documents),
{_splitmix_steps('d0', 'doc_id, lang', 'a').strip()},
h1t AS (SELECT doc_id, lang, x AS h1 FROM a5),
b0 AS (SELECT doc_id, lang, h1, h1 AS x FROM h1t),
{_splitmix_steps('b0', 'doc_id, lang, h1', 'b').strip()},
hh AS (SELECT doc_id, lang, h1, (x | 1) AS h2 FROM b5),
probes AS (
  SELECT doc_id, lang,
         (((h1::HUGEINT + (i::HUGEINT * h2 % {m64})) % {m64})
          % 65536)::BIGINT AS idx
  FROM hh, UNNEST(range(0, 5)) AS t(i)
),
bits AS MATERIALIZED (
  SELECT DISTINCT idx FROM probes WHERE doc_id % 3 = 0
),
miss AS (
  SELECT DISTINCT doc_id FROM probes
  WHERE idx NOT IN (SELECT idx FROM bits)
),
kept AS (
  SELECT d.doc_id, d.lang, (d.doc_id % 3 = 0) AS is_member
  FROM documents d WHERE d.doc_id NOT IN (SELECT doc_id FROM miss)
)
SELECT lang, count(*)::BIGINT AS n_kept,
       sum(is_member::BIGINT)::BIGINT AS n_true,
       (count(*) - sum(is_member::BIGINT))::BIGINT AS n_false_pos
FROM kept GROUP BY lang ORDER BY lang
"""


SQL_BLOOM_SEMI = _build_sql_bloom_semi()


def q_bloom_semi(sf_dir: str):
    """Bloom-filter semi join (scale path of the exact broadcast semi
    filter): build a Bloom over a deterministic key subset (doc_id % 3
    == 0), filter the corpus through it, and report per-lang kept
    counts alongside the exact ground truth — n_false_pos quantifies
    the filter's one-sided error. Oracle-paired (round 3): the filter
    is deterministic for a fixed input, so SQL_BLOOM_SEMI rebuilds the
    exact bit set and membership (the fpp BOUND stays pinned by
    test)."""
    import pyarrow.compute as pc

    from gush_ray.stages.sketches import bloom_semi_filter, build_bloom

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    def pick_keys(b: pa.Table) -> pa.Table:
        # pyarrow.compute has no mod kernel — numpy on the zero-copy view
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 3 == 0))

    keys = docs.map_batches(pick_keys, batch_format="pyarrow",
                            zero_copy_batch=True)
    bloom = build_bloom(keys, "doc_id", m_bits=1 << 16, k=5)
    kept = bloom_semi_filter(docs, bloom, "doc_id")

    def truth(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.append_column("is_member", pa.array(ids % 3 == 0))

    from gush_ray.stages.agg import partial_aggregate

    flagged = kept.map_batches(truth, batch_format="pyarrow",
                               zero_copy_batch=True)
    agg = partial_aggregate(
        flagged, ["lang"],
        {"n_kept": (None, "count"), "n_true": ("is_member", "sum")},
    )
    df = agg.to_pandas()
    df["n_true"] = df["n_true"].astype("int64")
    df["n_false_pos"] = df["n_kept"] - df["n_true"]
    return df.sort_values("lang").reset_index(drop=True)


def q_bucketed_join_agg(sf_dir: str):
    """Shuffle-free bucketed join (stages/bucketed.py): both sides laid
    out ONCE as hash-bucketed parquet on the join key (the amortized
    layout cost), then joined as independent per-bucket tasks — zero
    all-to-all exchange at query time, the repeated-pipeline shape that
    matters most at 10^12 rows. Oracle-paired: per-nation order
    counts/revenue must equal the plain SQL join."""
    import pyarrow.compute as pc

    from gush_ray.stages.agg import partial_aggregate
    from gush_ray.stages.bucketed import bucketed_join, write_bucketed

    root = f"/tmp/gush_ray_buckets/{_fixture_cache_key(sf_dir, 'orders')}"
    dir_o = os.path.join(root, "orders")
    dir_c = os.path.join(root, "customer")
    if not os.path.exists(os.path.join(dir_o, "_BUCKETS.json")):
        orders = _read(sf_dir, "orders",
                       columns=["o_custkey", "o_totalprice"])
        orders = orders.map_batches(
            lambda b: b.rename_columns(["custkey", "o_totalprice"]),
            batch_format="pyarrow", zero_copy_batch=True)
        write_bucketed(orders, dir_o, "custkey", num_buckets=16)
    if not os.path.exists(os.path.join(dir_c, "_BUCKETS.json")):
        cust = _read(sf_dir, "customer",
                     columns=["c_custkey", "c_nationkey"])
        cust = cust.map_batches(
            lambda b: b.rename_columns(["custkey", "c_nationkey"]),
            batch_format="pyarrow", zero_copy_batch=True)
        write_bucketed(cust, dir_c, "custkey", num_buckets=16)
    joined = bucketed_join(dir_o, dir_c, on="custkey")
    agg = partial_aggregate(
        joined, ["c_nationkey"],
        {"n_orders": (None, "count"), "revenue": ("o_totalprice", "sum")},
    ).to_pandas()
    agg["revenue"] = agg["revenue"].round(2)
    return agg.sort_values("c_nationkey").reset_index(drop=True)


SQL_BUCKETED_JOIN_AGG = """
SELECT c.c_nationkey, count(*) AS n_orders,
       round(sum(o.o_totalprice), 2) AS revenue
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_nationkey ORDER BY c.c_nationkey
"""


def q_bloom_semi_checked(sf_dir: str):
    """Bloom semi join in its production shape: Bloom prefilter (no
    false negatives) + exact verification join that removes the one-sided
    false positives — output therefore equals the exact semi join and is
    SQL-verifiable. The raw filter's FP rate stays quantified by the
    rows-only bloom_semi entry."""
    import pyarrow.compute as pc

    from gush_ray.stages.agg import partial_aggregate
    from gush_ray.stages.joins import hash_join
    from gush_ray.stages.sketches import bloom_semi_filter, build_bloom

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def pick_keys(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 3 == 0))

    keys = docs.map_batches(pick_keys, batch_format="pyarrow",
                            zero_copy_batch=True)
    bloom = build_bloom(keys, "doc_id", m_bits=1 << 16, k=5)
    kept = bloom_semi_filter(docs, bloom, "doc_id")
    # exact verify: inner hash join of the (small) prefiltered side
    # against the distinct true key set — kills the Bloom FPs
    verified = hash_join(
        kept, keys.select_columns(["doc_id"]), on=("doc_id",),
        num_partitions=8,
    )
    agg = partial_aggregate(verified, ["lang"], {"n_kept": (None, "count")})
    return agg.to_pandas().sort_values("lang").reset_index(drop=True)


SQL_BLOOM_SEMI_CHECKED = """
SELECT lang, count(*) AS n_kept FROM documents
WHERE doc_id % 3 = 0 GROUP BY lang ORDER BY lang
"""


def q_approx_quantiles(sf_dir: str):
    """Mergeable approximate quantiles (bounded memory at every level)
    WITH a driver-verifiable tolerance check. Output per q = the EXACT
    quantile from the no-sort histogram-refinement path (the
    SQL-matchable value, quantile_disc semantics) plus ``rank_ok`` —
    whether the sketch estimate's true rank (one distributed counting
    pass) is within 2% of q*n. The sketch stays approximate by design;
    its rank-error bound is what the oracle row verifies."""
    from gush_ray.stages.sketches import approx_quantiles, exact_quantiles_nosort

    ev = _read(sf_dir, "events", columns=["value"])
    qs = [0.1, 0.5, 0.9, 0.99]
    est = approx_quantiles(ev, "value", qs)
    exact = exact_quantiles_nosort(ev, "value", qs)
    est_vals = np.array([est[q] for q in qs], dtype=np.float64)

    def rank_partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b["value"].dropna().to_numpy(dtype=np.float64)
        le = (x[:, None] <= est_vals[None, :]).sum(axis=0)
        return pd.DataFrame({"n": [len(x)],
                             "le": [le.astype(np.int64).tobytes()]})

    parts = ev.map_batches(rank_partial, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    ranks = np.sum([np.frombuffer(b, dtype=np.int64) for b in parts["le"]],
                   axis=0)
    ok = np.abs(ranks - np.array(qs) * n) <= 0.02 * n
    return pd.DataFrame({"q": np.array(qs, dtype=np.float64),
                         "value": [float(exact[q]) for q in qs],
                         "rank_ok": ok.astype(bool)})


SQL_APPROX_QUANTILES = """
SELECT 0.1 AS q, CAST(quantile_disc(value, 0.1) AS DOUBLE) AS value,
       TRUE AS rank_ok FROM events
UNION ALL
SELECT 0.5, CAST(quantile_disc(value, 0.5) AS DOUBLE), TRUE FROM events
UNION ALL
SELECT 0.9, CAST(quantile_disc(value, 0.9) AS DOUBLE), TRUE FROM events
UNION ALL
SELECT 0.99, CAST(quantile_disc(value, 0.99) AS DOUBLE), TRUE FROM events
"""


from gush_ray.pipelines.queries import SQL_ANN_TOPK as _SQL_ANN_TOPK

EXTRA_QUERIES = {
    # oracle-paired (round 3): streaming e2e, index ANN at full probe,
    # tolerance-checked sketches, checked bloom semi
    "pages_flagship": (q_pages_flagship, SQL_PAGES_FLAGSHIP),
    "windowed_unique": (q_windowed_unique, SQL_WINDOWED_UNIQUE),
    "windowed_hll": (q_windowed_hll, SQL_WINDOWED_HLL),
    "streaming_topk": (q_streaming_topk, SQL_STREAMING_TOPK),
    "window_combine_stream": (q_window_combine_stream,
                              SQL_WINDOW_COMBINE),
    "window_quantiles_stream": (q_window_quantiles_stream,
                                SQL_WINDOW_QUANTILES),
    "window_quantiles_sketch": (q_window_quantiles_sketch,
                                SQL_WINDOW_QUANTILES_SKETCH),
    "session_values_stream": (q_session_values_stream,
                              SQL_SESSION_VALUES),
    "early_fire_fold": (q_early_fire_fold, SQL_EARLY_FIRE_FOLD),
    "pages_late_routing": (q_pages_late_routing, SQL_PAGES_LATE),
    "pages_refire": (q_pages_refire, SQL_PAGES_REFIRE),
    "stream_join": (q_stream_join, SQL_STREAM_JOIN),
    "asof_stream_join": (q_asof_stream_join, SQL_ASOF_STREAM_JOIN),
    "asof_stream_join_outer": (q_asof_stream_join_outer,
                               SQL_ASOF_STREAM_JOIN_OUTER),
    "extract_parity": (q_extract_parity, SQL_EXTRACT_PARITY),
    "warc_roundtrip": (q_warc_roundtrip, SQL_WARC_ROUNDTRIP),
    "wet_roundtrip": (q_wet_roundtrip, SQL_WET_ROUNDTRIP),
    "ivf_index_ann": (q_ivf_index_ann, _SQL_ANN_TOPK),
    "lsh_index_ann_full": (q_lsh_index_ann_full, _SQL_ANN_TOPK),
    "approx_distinct_users": (q_approx_distinct, SQL_APPROX_DISTINCT),
    "approx_quantiles": (q_approx_quantiles, SQL_APPROX_QUANTILES),
    "bloom_semi_checked": (q_bloom_semi_checked, SQL_BLOOM_SEMI_CHECKED),
    "bucketed_join_agg": (q_bucketed_join_agg, SQL_BUCKETED_JOIN_AGG),
    "multimodal_decode": (q_multimodal_decode, SQL_MULTIMODAL_DECODE),
    "frame_sample": (q_frame_sample, SQL_FRAME_SAMPLE),
    "streaming_near_dup": (q_streaming_near_dup, _sql_streaming_near_dup()),
    "streaming_frontier": (q_streaming_frontier, _sql_streaming_frontier()),
    # rows-only entries (None) are the documented honest boundary:
    # iterative training / float NLL / probabilistic or recall-lossy
    # surfaces / binary decode — each with a SQL-paired sibling or
    # unit-test pin (module docstring)
    "bloom_semi": (q_bloom_semi, SQL_BLOOM_SEMI),
    "minhash_dedup": (q_minhash_dedup, SQL_MINHASH_DEDUP),
    "minhash_clusters": (q_minhash_clusters, SQL_MINHASH_CLUSTERS),
    "simhash_dedup": (q_simhash_dedup, SQL_SIMHASH_DEDUP),
    "ngram_jaccard": (q_ngram_jaccard, SQL_NGRAM_JACCARD),
    "embedding_near_dup": (q_embedding_near_dup, SQL_EMBEDDING_NEAR_DUP),
    "lsh_ann_topk": (q_lsh_ann_topk, SQL_LSH_ANN_TOPK),
    "lsh_index_ann": (q_lsh_index_ann, SQL_LSH_ANN_TOPK),
    "kmeans_exact": (q_kmeans_exact, SQL_KMEANS_EXACT),
    "semdedup_exact": (q_semdedup_exact, SQL_SEMDEDUP_EXACT),
    "kmeans_clusters": (q_kmeans_clusters, None),
    "semdedup": (q_semdedup, None),
    "lang_id": (q_lang_id, SQL_LANG_ID),
    "content_chunks": (q_content_chunks, SQL_CONTENT_CHUNKS),
    "fingerprint": (q_fingerprint, SQL_FINGERPRINT),
    "multimodal_features": (q_multimodal_features, None),
    "multimodal_resize": (q_multimodal_resize, SQL_MULTIMODAL_RESIZE),
    "pack_sequences": (q_pack_sequences, SQL_PACK_SEQUENCES),
    "bpe_tokenize": (q_bpe_tokenize, SQL_BPE_TOKENIZE),
    "ccnet_buckets": (q_ccnet_buckets, SQL_CCNET_BUCKETS),
    "global_shuffle": (q_global_shuffle, SQL_GLOBAL_SHUFFLE),
}
