"""Operator query registry: Ray pipelines + matching DuckDB oracle SQL.

Each entry exercises one operator family from SURVEY.md §2 over the
driver-provided tables (``/root/testdata/sf*/``). Column names are kept
identical between the Ray result and the oracle SQL (driver compares
row-count + schema + order-insensitive value hash).

Float columns are rounded (4 digits for ratios/averages, 2 for money
sums) on BOTH sides so summation-order differences can't flip the hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from gush_ray.config import EngineConfig
from gush_ray.stages.agg import partial_aggregate
from gush_ray.stages.changes import classify_changes, latest_snapshot
from gush_ray.stages.filters import apply_deny_filters, min_length_filter
from gush_ray.stages.joins import find_hot_keys, hash_join, salted_join, broadcast_join
from gush_ray.stages.text import quality_score_batch, token_count_batch
from gush_ray.stages.windows import (
    session_windows,
    sliding_aggregate,
    tumbling_aggregate,
)

HOUR_US = 3600 * 1_000_000
SIX_H_US = 6 * HOUR_US
TWO_H_US = 2 * HOUR_US
DAY30_US = 30 * 86400 * 1_000_000


def _round_ha(x, d: int):
    """Round half-AWAY-from-zero (DuckDB's ROUND mode; numpy/pandas round
    half-even — the modes disagree exactly on .5 boundaries, which real
    2-decimal money/value data hits constantly)."""
    scale = 10.0 ** d
    arr = np.asarray(x, dtype=np.float64)
    return np.copysign(np.floor(np.abs(arr) * scale + 0.5), arr) / scale


def _read(sf_dir: str, name: str, columns=None):
    """Size-aware read: Ray's default block heuristic splits small files
    into cpu-count blocks, drowning small inputs in per-task overhead
    (measured 4-10x on this suite at 32 cpus). Keep >=4 MiB per block for
    small files; leave large inputs to the default 128 MiB target."""
    import os

    path = f"{sf_dir}/{name}.parquet"
    size = os.path.getsize(path)
    kw = {}
    if size < 256 * 1024 * 1024:
        kw["override_num_blocks"] = max(4, min(64, size // (4 << 20) + 1))
    return rd.read_parquet(path, columns=columns, **kw)


def _ts_us(ds, ts_col: str, out: str):
    """Append int64 microseconds column (oracle pairs with epoch_us());
    precision-aware via stages.windows.ts_to_us."""
    from gush_ray.stages.windows import ts_to_us

    return ds.map_batches(
        lambda b: b.append_column(out, ts_to_us(b[ts_col])),
        batch_format="pyarrow", zero_copy_batch=True,
    )


# ---------------------------------------------------------------- W1 / W2

def q_tumbling_count(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])
    return tumbling_aggregate(
        ev, ["event_type"], "ts", SIX_H_US, {"n": (None, "count")}
    )


SQL_TUMBLING_COUNT = """
SELECT event_type, epoch_us(ts) // 21600000000 AS window_id, count(*) AS n
FROM events GROUP BY 1, 2
"""


def q_tumbling_avg(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    agg = tumbling_aggregate(
        ev, ["event_type"], "ts", SIX_H_US,
        {"sum_v": ("value", "sum"), "n": (None, "count")},
    )
    df = agg.to_pandas()
    df["avg_value"] = _round_ha(_round_ha(df["sum_v"], 2) / df["n"], 4)
    return df[["event_type", "window_id", "avg_value", "n"]]


SQL_TUMBLING_AVG = """
SELECT event_type, epoch_us(ts) // 21600000000 AS window_id,
       round(round(sum(value), 2) / count(*), 4) AS avg_value, count(*) AS n
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------- W3

def q_sliding_count(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])
    return sliding_aggregate(
        ev, ["event_type"], "ts", SIX_H_US, TWO_H_US, {"n": (None, "count")}
    )


SQL_SLIDING_COUNT = """
SELECT event_type, (epoch_us(ts) // 7200000000) - r.range AS window_id,
       count(*) AS n
FROM events CROSS JOIN range(3) r GROUP BY 1, 2
"""


# ---------------------------------------------------------------- W4

def q_session_count(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["ts", "user_id"])
    ev = _ts_us(ev, "ts", "ts_us")
    ev = ev.drop_columns(["ts"])
    return session_windows(ev, "user_id", "ts_us", gap_us=1_800_000_000)


SQL_SESSION_COUNT = """
WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
s AS (
  SELECT user_id, tus,
         CASE WHEN lag(tus) OVER w IS NULL
                   OR tus - lag(tus) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)
),
s2 AS (
  SELECT user_id, tus,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY tus
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM s
)
SELECT user_id, min(tus) AS session_start_us, max(tus) AS session_end_us,
       count(*) AS n_events
FROM s2 GROUP BY user_id, sid
"""


# ---------------------------------------------------------------- V1 batch

def q_change_classify(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    out = classify_changes(ev, key="user_id", ts_col="ts",
                           drop_replays=False, tie_col="event_id")
    return out.select_columns(["event_id", "user_id", "version", "change_kind"])


SQL_CHANGE_CLASSIFY = """
SELECT event_id, user_id,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
         AS version,
       CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
            THEN 'insert' ELSE 'update' END AS change_kind
FROM events
"""


# ---------------------------------------------------------------- D1

def q_latest_version(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["ts", "user_id"])
    ev = _ts_us(ev, "ts", "ts_us").drop_columns(["ts"])
    return partial_aggregate(
        ev, ["user_id"],
        {"last_ts_us": ("ts_us", "max"), "first_ts_us": ("ts_us", "min"),
         "n_versions": (None, "count")},
    )


SQL_LATEST_VERSION = """
SELECT user_id, max(epoch_us(ts)) AS last_ts_us,
       min(epoch_us(ts)) AS first_ts_us, count(*) AS n_versions
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------- J1

def _lineitem_with_revenue(sf_dir: str):
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def add_rev(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return b.append_column("revenue", rev)

    return li.map_batches(add_rev, batch_format="pyarrow", zero_copy_batch=True)


def q_hash_join_agg(sf_dir: str):
    li = _lineitem_with_revenue(sf_dir)
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    joined = hash_join(li, orders, on=("l_orderkey",), num_partitions=8,
                       right_on=("o_orderkey",))
    agg = partial_aggregate(
        joined, ["o_orderpriority"],
        {"revenue": ("revenue", "sum"), "n": (None, "count")},
    )
    df = agg.to_pandas()
    df["revenue"] = _round_ha(df["revenue"], 2)
    return df


SQL_HASH_JOIN_AGG = """
SELECT o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


# ---------------------------------------------------------------- J2

def q_salted_join_agg(sf_dir: str):
    li = _lineitem_with_revenue(sf_dir)
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])
    hot = find_hot_keys(li, "l_orderkey", threshold=6)
    joined = salted_join(li, orders.map_batches(
        lambda b: b.rename_columns(
            ["l_orderkey" if c == "o_orderkey" else c for c in b.column_names]
        ),
        batch_format="pyarrow"), on="l_orderkey", hot_keys=hot,
        num_salts=4, num_partitions=8)
    agg = partial_aggregate(
        joined, ["o_orderstatus"],
        {"revenue": ("revenue", "sum"), "n": (None, "count")},
    )
    df = agg.to_pandas()
    df["revenue"] = _round_ha(df["revenue"], 2)
    return df


SQL_SALTED_JOIN_AGG = """
SELECT o_orderstatus,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


# ---------------------------------------------------------------- broadcast join

def q_broadcast_join_agg(sf_dir: str):
    import pyarrow.parquet as pq

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey", "c_acctbal"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    dim = dim[["n_nationkey", "r_name"]].rename(
        columns={"n_nationkey": "c_nationkey"}
    )
    joined = broadcast_join(cust, dim, on="c_nationkey")
    agg = partial_aggregate(
        joined, ["r_name"],
        {"sum_acctbal": ("c_acctbal", "sum"), "n_customers": (None, "count")},
    )
    df = agg.to_pandas()
    df["sum_acctbal"] = _round_ha(df["sum_acctbal"], 2)
    return df


SQL_BROADCAST_JOIN_AGG = """
SELECT r_name, round(sum(c_acctbal), 2) AS sum_acctbal,
       count(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1
"""


# ---------------------------------------------------------------- F1-F3

def q_deny_filter(sf_dir: str):
    docs = _read(sf_dir, "documents", columns=["text", "lang", "source"])
    cfg = EngineConfig(ignored_langs=("de",), ignored_url_prefixes=("src0",))
    docs = apply_deny_filters(docs, cfg, lang_col="lang", url_col="source")
    docs = min_length_filter(docs, "text", 100)
    return partial_aggregate(docs, ["lang", "source"], {"n": (None, "count")})


SQL_DENY_FILTER = """
SELECT lang, source, count(*) AS n
FROM documents
WHERE lang <> 'de' AND NOT starts_with(source, 'src0') AND length(text) >= 100
GROUP BY 1, 2
"""


# ---------------------------------------------------------------- windowed join

def q_windowed_join_agg(sf_dir: str):
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_totalprice"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = hash_join(orders, cust, on=("o_custkey",), num_partitions=8,
                       right_on=("c_custkey",))
    agg = tumbling_aggregate(
        joined, ["c_mktsegment"], "o_orderdate", DAY30_US,
        {"sum_price": ("o_totalprice", "sum"), "n": (None, "count")},
    )
    df = agg.to_pandas()
    df["sum_price"] = _round_ha(df["sum_price"], 2)
    return df


SQL_WINDOWED_JOIN_AGG = """
SELECT c_mktsegment, epoch_us(o_orderdate) // 2592000000000 AS window_id,
       round(sum(o_totalprice), 2) AS sum_price, count(*) AS n
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------- W6

def q_global_count(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["event_type"])
    n = ev.map_batches(
        lambda b: b.filter(pc.equal(b["event_type"], "purchase")),
        batch_format="pyarrow", zero_copy_batch=True,
    ).count()
    return pa.table({"n": pa.array([n], type=pa.int64())})


SQL_GLOBAL_COUNT = "SELECT count(*) AS n FROM events WHERE event_type = 'purchase'"


# ---------------------------------------------------------------- sort/limit

def q_topk_docs(sf_dir: str):
    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    top = docs.sort(["n_chars", "doc_id"], descending=[True, False]).limit(10)
    return top


SQL_TOPK_DOCS = """
SELECT doc_id, n_chars FROM documents
ORDER BY n_chars DESC, doc_id LIMIT 10
"""


# ---------------------------------------------------------------- distinct

def q_lang_counts(sf_dir: str):
    docs = _read(sf_dir, "documents", columns=["lang"])
    return partial_aggregate(docs, ["lang"], {"n": (None, "count")})


SQL_LANG_COUNTS = "SELECT lang, count(*) AS n FROM documents GROUP BY 1"


# ---------------------------------------------------------------- text ops

def q_token_stats(sf_dir: str):
    docs = _read(sf_dir, "documents", columns=["text", "lang"])
    toks = docs.map_batches(token_count_batch, batch_format="pyarrow",
                            zero_copy_batch=True)
    agg = partial_aggregate(
        toks, ["lang"],
        {"total_tokens": ("n_tokens", "sum"), "n_docs": (None, "count")},
    )
    df = agg.to_pandas()
    df["avg_tokens"] = _round_ha(df["total_tokens"] / df["n_docs"], 4)
    return df


SQL_TOKEN_STATS = """
SELECT lang,
       CAST(sum(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                x -> x <> ''))) AS BIGINT) AS total_tokens,
       count(*) AS n_docs,
       round(CAST(sum(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                      x -> x <> ''))) AS DOUBLE)
             / count(*), 4) AS avg_tokens
FROM documents GROUP BY 1
"""


def q_bpe_token_stats(sf_dir: str):
    """BPE-ish subword counting (GPT-2 pre-tokenizer regex) — RE2 on
    both sides, so the DuckDB oracle runs the SAME pattern."""
    from gush_ray.stages.text import bpe_token_count_batch

    docs = _read(sf_dir, "documents", columns=["text", "lang"])
    toks = docs.map_batches(bpe_token_count_batch, batch_format="pyarrow",
                            zero_copy_batch=True)
    agg = partial_aggregate(
        toks, ["lang"],
        {"total_bpe": ("n_bpe_tokens", "sum"), "n_docs": (None, "count")},
    )
    df = agg.to_pandas()
    df["avg_bpe"] = _round_ha(df["total_bpe"] / df["n_docs"], 4)
    return df


SQL_BPE_TOKEN_STATS = """
SELECT lang,
       CAST(sum(len(regexp_extract_all(text,
         '''s|''t|''re|''ve|''m|''ll|''d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+')))
         AS BIGINT) AS total_bpe,
       count(*) AS n_docs,
       round(CAST(sum(len(regexp_extract_all(text,
         '''s|''t|''re|''ve|''m|''ll|''d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+')))
         AS DOUBLE) / count(*), 4) AS avg_bpe
FROM documents GROUP BY 1
"""


def q_stopword_ratio(sf_dir: str):
    """Stopword-ratio quality signal per source."""
    from gush_ray.stages.text import stopword_ratio_batch

    docs = _read(sf_dir, "documents", columns=["text", "source"])
    scored = docs.map_batches(stopword_ratio_batch, batch_format="pyarrow",
                              zero_copy_batch=True)
    agg = partial_aggregate(
        scored, ["source"],
        {"sum_ratio": ("stopword_ratio", "sum"), "n_docs": (None, "count")},
    )
    df = agg.to_pandas()
    df["avg_stopword_ratio"] = _round_ha(df["sum_ratio"] / df["n_docs"], 4)
    return df[["source", "n_docs", "avg_stopword_ratio"]]


SQL_STOPWORD_RATIO = """
WITH q AS (
  SELECT source,
         len(regexp_extract_all(lower(text),
             '\\b(the|and|of|to|a|in|is|that|it|for)\\b'))
           / greatest(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                      x -> x <> '')), 1.0) AS ratio
  FROM documents
)
SELECT source, count(*) AS n_docs,
       round(sum(ratio) / count(*), 4) AS avg_stopword_ratio
FROM q GROUP BY 1
"""


def q_quality_score(sf_dir: str):
    docs = _read(sf_dir, "documents", columns=["text", "source"])
    scored = docs.map_batches(quality_score_batch, batch_format="pyarrow",
                              zero_copy_batch=True)
    agg = partial_aggregate(
        scored, ["source"],
        {"sum_punct": ("punct_ratio", "sum"),
         "sum_mtl": ("mean_token_len", "sum"),
         "n_docs": (None, "count")},
    )
    df = agg.to_pandas()
    df["avg_punct_ratio"] = _round_ha(df["sum_punct"] / df["n_docs"], 4)
    df["avg_token_len"] = _round_ha(df["sum_mtl"] / df["n_docs"], 4)
    return df[["source", "n_docs", "avg_punct_ratio", "avg_token_len"]]


SQL_QUALITY_SCORE = """
WITH q AS (
  SELECT source,
         (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
           / greatest(length(text), 1.0) AS punct_ratio,
         length(text)
           / greatest(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                      x -> x <> '')), 1.0) AS mean_token_len
  FROM documents
)
SELECT source, count(*) AS n_docs,
       round(sum(punct_ratio) / count(*), 4) AS avg_punct_ratio,
       round(sum(mean_token_len) / count(*), 4) AS avg_token_len
FROM q GROUP BY 1
"""


# ------------------------------------------------- URL canonicalization

def q_url_normalize(sf_dir: str):
    """URL canonicalization (dedup-key normalization): messy URLs built
    deterministically from documents rows, then lowercased, fragment /
    utm-param / trailing-slash stripped, scheme+www canonicalized — the
    oracle applies the IDENTICAL RE2 rule chain in SQL."""
    from gush_ray.stages.text import normalize_urls_batch

    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def build(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"],
            "url": "HTTP://WWW.Example.COM/" + b["source"] + "/Page/"
            + (b["doc_id"] % 7).astype(str)
            + "/?utm_source=feed&id=" + b["doc_id"].astype(str) + "#frag",
        })

    messy = docs.map_batches(build, batch_format="pandas")
    normed = messy.map_batches(normalize_urls_batch, batch_format="pyarrow",
                               zero_copy_batch=True)
    return normed.select_columns(["doc_id", "url_norm"])


SQL_URL_NORMALIZE = """
WITH m AS (
  SELECT doc_id,
         lower('HTTP://WWW.Example.COM/' || source || '/Page/'
               || CAST(doc_id % 7 AS VARCHAR)
               || '/?utm_source=feed&id=' || CAST(doc_id AS VARCHAR)
               || '#frag') AS u
  FROM documents
)
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
  regexp_replace(regexp_replace(regexp_replace(u,
    '#.*$', '', 'g'),
    '[?&]utm_[^&#]*', '', 'g'),
    '^([^?]*)&', '\\1?', 'g'),
    '\\?$', '', 'g'),
    '^https?://www\\.', 'https://', 'g'),
    '^http://', 'https://', 'g'),
    '/+$', '', 'g') AS url_norm
FROM m
"""


# ------------------------------------------------- robots.txt filtering

_ROBOTS_FIXTURE = {
    # one robots.txt per site class: prefix rules + a wildcard/$ rule +
    # an allow-everything group (empty Disallow) — covering each RFC
    # 9309 semantics branch the stage implements
    "site0000.example.org": ("User-agent: *\n"
                             "Disallow: /p/1\n"
                             "Allow: /p/12\n"),
    "site0001.example.org": ("User-agent: specialbot\n"
                             "Disallow: /\n"
                             "User-agent: *\n"
                             "Disallow: /p/\n"
                             "Allow: /p/*2$\n"),
    "site0002.example.org": "User-agent: *\nDisallow:\n",
}


def q_robots_filter(sf_dir: str):
    """robots.txt (RFC 9309) URL filtering: deterministic urls built
    from documents rows spread over three sites whose robots rules
    exercise prefix matching, wildcard+$ anchoring, longest-match-wins
    with Allow on ties, the empty-Disallow group, and user-agent group
    selection — the oracle re-derives every decision as SQL CASE logic
    over the same constants (stages/robots.py)."""
    from gush_ray.stages.robots import RobotsFilter

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def build(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"],
            "url": ("https://site000" + (b["doc_id"] % 3).astype(str)
                    + ".example.org/p/" + (b["doc_id"] % 100).astype(str)),
        })

    urls = docs.map_batches(build, batch_format="pandas")
    out = urls.map_batches(
        RobotsFilter,
        fn_constructor_kwargs={"rules_by_site": _ROBOTS_FIXTURE},
        batch_format="pyarrow", concurrency=2, num_cpus=1,
    )
    return out.select_columns(["doc_id", "url", "allowed"])


SQL_ROBOTS_FILTER = """
WITH m AS (
  SELECT doc_id,
         'https://site000' || CAST(doc_id % 3 AS VARCHAR)
         || '.example.org/p/' || CAST(doc_id % 100 AS VARCHAR) AS url,
         '/p/' || CAST(doc_id % 100 AS VARCHAR) AS p,
         doc_id % 3 AS site
  FROM documents
)
SELECT doc_id, url,
  CASE site
    -- site0: Disallow /p/1 (len 4) vs Allow /p/12 (len 5): longer wins
    WHEN 0 THEN (NOT starts_with(p, '/p/1')) OR starts_with(p, '/p/12')
    -- site1: '*' group applies (we are not specialbot):
    -- Disallow /p/ (len 3) vs Allow /p/*2$ (len 6): the anchored
    -- wildcard wins wherever it matches
    WHEN 1 THEN regexp_matches(p, '^/p/.*2$')
    -- site2: empty Disallow = no rule = everything allowed
    ELSE TRUE
  END AS allowed
FROM m
"""


# ---------------------------------------------------------------- exact dedup

def q_exact_dedup_docs(sf_dir: str):
    import hashlib

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["text_hash"] = batch["text"].map(
            lambda s: hashlib.md5(s.encode("utf-8")).hexdigest()
        )
        return batch[["doc_id", "text_hash"]]

    hashed = docs.map_batches(add_hash, batch_format="pandas")
    return partial_aggregate(
        hashed, ["text_hash"],
        {"keep_doc_id": ("doc_id", "min"), "n_copies": (None, "count")},
    )


SQL_EXACT_DEDUP_DOCS = """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,
       count(*) AS n_copies
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------- ANN

def q_ann_topk(sf_dir: str):
    import pyarrow.parquet as pq

    from gush_ray.stages.similarity import brute_force_topk

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    qrow = qtab.filter(pc.equal(qtab["vec_id"], 0))
    qvec = np.array(qrow["embedding"][0].as_py(), dtype=np.float64)
    return brute_force_topk(emb, qvec, k=10)


SQL_ANN_TOPK = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
s AS (SELECT vec_id,
             list_cosine_similarity(embedding::DOUBLE[], (SELECT qv FROM q))
               AS raw_sim
      FROM embeddings)
SELECT vec_id, round_even(raw_sim, 4) AS sim
FROM s ORDER BY raw_sim DESC, vec_id LIMIT 10
"""


# ------------------------------------------------- F8/F10 update deltas

def q_change_delta(sf_dir: str):
    """Update rows carrying old→new deltas (graft of gush's
    UpdateStatement updatedFields-vs-target semantics,
    parser/UpdateNodeVisitor.scala:111-143): per user in ts order, the
    change in ``value`` vs the previous event."""
    from gush_ray.stages.shuffle import partition_map

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "value"])

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        # event_id tie-break matches the oracle's ORDER BY ts, event_id
        # (ties would otherwise resolve by nondeterministic block order)
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = df.groupby("user_id", sort=False)["value"].shift()
        out = df[["event_id", "user_id"]].copy()
        out["delta_value"] = _round_ha(df["value"] - prev, 4)
        return out[prev.notna()]

    return partition_map(ev, "user_id", per_part, 8)


SQL_CHANGE_DELTA = """
SELECT event_id, user_id,
       round(value - lag(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id), 4)
         AS delta_value
FROM events
QUALIFY lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        IS NOT NULL
"""


# --------------------------------------------- F9 where-field rendering

def q_where_fields(sf_dir: str):
    """Multi-valued where-field concatenation: a change key spanning
    SEVERAL columns is rendered as the concatenated column list and the
    concatenated key value — graft of the reference's repeated-column
    where-field join (parser/UpdateNodeVisitor.scala:31-63, pinned by
    FoundationParserTest.scala:97's ``"a, b"``). Round 1 only had
    single-column change keys; this is the composite-key case."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    agg = partial_aggregate(
        ev, ["user_id", "event_type"], {"n_changes": (None, "count")}
    )

    def render(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "where_fields": "user_id, event_type",
            "where_key": df["user_id"].astype("int64").astype(str)
            + ", " + df["event_type"],
            "n_changes": df["n_changes"],
        })
        return out

    return agg.map_batches(render, batch_format="pandas")


SQL_WHERE_FIELDS = """
SELECT 'user_id, event_type' AS where_fields,
       CAST(user_id AS VARCHAR) || ', ' || event_type AS where_key,
       count(*) AS n_changes
FROM events GROUP BY 2
"""


# ------------------------------------------- F10 symbolic set expression

def q_change_set_expr(sf_dir: str):
    """Symbolic SET-expression capture: the change stream carries the
    update expression RENDERED, not evaluated — ``k=k+(<delta>)`` as a
    string (graft of the reference's non-evaluating expression visitor,
    parser/UpdateNodeVisitor.scala:65-109, pinned there by
    FoundationParserTest.scala:101-110 — the one reference test family
    with no graft analog until now). The delta itself stays numeric in
    ``change_delta``; here the symbolic column is the output."""
    from gush_ray.stages.shuffle import partition_map

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "props"])

    def extract(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["props"], r'"k": (?P<k>\d+)')
        k = pc.struct_field(m, "k").cast(pa.int64())
        return pa.table({"event_id": b["event_id"], "ts": b["ts"],
                         "user_id": b["user_id"], "k": k})

    typed = ev.map_batches(extract, batch_format="pyarrow",
                           zero_copy_batch=True)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = df.groupby("user_id", sort=False)["k"].shift()
        keep = prev.notna()
        out = df.loc[keep, ["event_id", "user_id"]].copy()
        delta = (df["k"] - prev)[keep].astype("int64")
        out["set_expr"] = "k=k+(" + delta.astype(str) + ")"
        return out

    return partition_map(typed, "user_id", per_part, 8)


SQL_CHANGE_SET_EXPR = """
WITH t AS (
  SELECT event_id, user_id, ts,
         CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k
  FROM events
)
SELECT event_id, user_id,
       'k=k+(' || CAST(k - lag(k) OVER w AS VARCHAR) || ')' AS set_expr
FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
QUALIFY lag(k) OVER w IS NOT NULL
"""


# ------------------------------------------------- F12 typed extraction

def q_typed_field_extract(sf_dir: str):
    """Typed field extractor (graft of getField/getAsFloat,
    binlog/BinlogEvent.scala:34-36): pull the numeric ``k`` out of the
    stringly-typed ``props`` JSON and aggregate it — strict-cast errors
    would route to the side output (none in this data)."""
    ev = _read(sf_dir, "events", columns=["event_type", "props"])

    def extract(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["props"], r'"k": (?P<k>\d+)')
        k = pc.struct_field(m, "k").cast(pa.int64())
        return pa.table({"event_type": b["event_type"], "k": k})

    typed = ev.map_batches(extract, batch_format="pyarrow",
                           zero_copy_batch=True)
    return partial_aggregate(
        typed, ["event_type"], {"sum_k": ("k", "sum"), "n": (None, "count")}
    )


SQL_TYPED_FIELD_EXTRACT = """
SELECT event_type,
       CAST(sum(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT))
            AS BIGINT) AS sum_k,
       count(*) AS n
FROM events GROUP BY 1
"""


# ------------------------------------------------- semi/anti join

def q_anti_join(sf_dir: str):
    """Anti join via broadcast key set: customers with no high-value
    order (a bare never-ordered set is empty in this data)."""
    from gush_ray.stages.joins import broadcast_semi_filter

    import pyarrow.parquet as pq

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    big = pq.read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
    buyers = big.filter(
        pc.greater(big["o_totalprice"], pa.scalar(250_000.0))
    )["o_custkey"]
    filtered = broadcast_semi_filter(cust, set(buyers.to_pylist()),
                                     on="c_custkey", keep=False)
    return partial_aggregate(filtered, ["c_mktsegment"],
                             {"n": (None, "count")})


SQL_ANTI_JOIN = """
SELECT c_mktsegment, count(*) AS n
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_totalprice > 250000.0)
GROUP BY 1
"""


# ------------------------------------------------- union (S6 fan-in)

def q_union_counts(sf_dir: str):
    """Dataset.union of two filtered streams then one aggregate."""
    ev1 = _read(sf_dir, "events", columns=["event_type", "value"])
    ev1 = ev1.map_batches(
        lambda b: b.filter(pc.equal(b["event_type"], "click")),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    ev2 = _read(sf_dir, "events", columns=["event_type", "value"])
    ev2 = ev2.map_batches(
        lambda b: b.filter(pc.greater(b["value"], pa.scalar(15.0))),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    u = ev1.union(ev2)
    agg = partial_aggregate(
        u, ["event_type"], {"n": (None, "count"), "sum_v": ("value", "sum")}
    )
    df = agg.to_pandas()
    df["sum_v"] = _round_ha(df["sum_v"], 2)
    return df


SQL_UNION_COUNTS = """
WITH u AS (
  SELECT event_type, value FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT event_type, value FROM events WHERE value > 15.0
)
SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_v
FROM u GROUP BY 1
"""


# ------------------------------------------------- W3 sliding avg

def q_sliding_avg(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    agg = sliding_aggregate(
        ev, ["event_type"], "ts", SIX_H_US, TWO_H_US,
        {"sum_v": ("value", "sum"), "n": (None, "count")},
    )
    df = agg.to_pandas()
    df["avg_value"] = _round_ha(_round_ha(df["sum_v"], 2) / df["n"], 4)
    return df[["event_type", "window_id", "avg_value", "n"]]


SQL_SLIDING_AVG = """
SELECT event_type, (epoch_us(ts) // 7200000000) - r.range AS window_id,
       round(round(sum(value), 2) / count(*), 4) AS avg_value, count(*) AS n
FROM events CROSS JOIN range(3) r GROUP BY 1, 2
"""


# ------------------------------------------------- rank / top-k / distinct

def q_windowed_topk(sf_dir: str):
    """Top-2 users by summed value per (event_type, 6h window) — grouped
    rank after a combiner aggregate."""
    from gush_ray.stages.shuffle import partition_map

    ev = _read(sf_dir, "events", columns=["ts", "event_type", "user_id",
                                          "value"])
    agg = tumbling_aggregate(
        ev, ["event_type", "user_id"], "ts", SIX_H_US,
        {"sum_v": ("value", "sum")},
    )

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["sum_v"] = _round_ha(df["sum_v"], 2)
        df = df.sort_values(["event_type", "window_id", "sum_v", "user_id"],
                            ascending=[True, True, False, True],
                            kind="mergesort")
        df["rank"] = (df.groupby(["event_type", "window_id"],
                                 sort=False).cumcount() + 1)
        return df[df["rank"] <= 2]

    return partition_map(agg, ["event_type", "window_id"], topk, 8)


SQL_WINDOWED_TOPK = """
WITH a AS (
  SELECT event_type, epoch_us(ts) // 21600000000 AS window_id, user_id,
         round(sum(value), 2) AS sum_v
  FROM events GROUP BY 1, 2, 3
)
SELECT event_type, window_id, user_id, sum_v,
       row_number() OVER (PARTITION BY event_type, window_id
                          ORDER BY sum_v DESC, user_id) AS rank
FROM a QUALIFY rank <= 2
"""


def q_latest_row(sf_dir: str):
    """D1 with payload: the full latest row per key (arg-max by ts)."""
    from gush_ray.stages.shuffle import partition_map

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "value"])
    ev = _ts_us(ev, "ts", "ts_us").drop_columns(["ts"])

    def last_row(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts_us", "event_id"],
                            kind="mergesort")
        return df.drop_duplicates("user_id", keep="last")

    return partition_map(ev, "user_id", last_row, 8)


SQL_LATEST_ROW = """
SELECT event_id, user_id, value, epoch_us(ts) AS ts_us
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 1
"""


def q_grouped_quantiles(sf_dir: str):
    """Exact grouped quantiles (p50/p90, linear interpolation — the
    same definition as DuckDB's quantile_cont): one shuffle by group
    key, vectorized pandas quantile per partition. Exact quantiles
    fundamentally need the group's values co-located; the partitioning
    assumption (one group's rows fit a partition) is the same one the
    asof/NFA stages document."""
    from gush_ray.stages.shuffle import partition_map

    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type")["value"]
        out = pd.DataFrame({
            "p50": g.quantile(0.5),
            "p90": g.quantile(0.9),
            "n": g.size(),
        }).reset_index()
        out["p50"] = _round_ha(out["p50"], 4)
        out["p90"] = _round_ha(out["p90"], 4)
        return out

    return partition_map(ev, "event_type", per_part, 8)


SQL_GROUPED_QUANTILES = """
SELECT event_type, round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90, count(*) AS n
FROM events GROUP BY 1
"""


def q_distinct_users(sf_dir: str):
    """Exact grouped count-distinct via per-partition nunique."""
    from gush_ray.stages.shuffle import partition_map

    ev = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def nu(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("event_type", as_index=False).agg(
            n_users=("user_id", "nunique")
        )

    return partition_map(ev, "event_type", nu, 8)


SQL_DISTINCT_USERS = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------- sketches

def q_heavy_hitters(sf_dir: str):
    """Bounded-memory top-k (Misra-Gries-style count bounds). Capacity
    4096 ≥ the fixture's distinct users, so the sketch is EXACT here and
    oracle-pairable; at corpus scale capacity is the memory knob and
    n_upper-n the reported error bound."""
    from gush_ray.stages.sketches import heavy_hitters

    ev = _read(sf_dir, "events", columns=["user_id"])
    return heavy_hitters(ev, "user_id", k=10, capacity=4096)


SQL_HEAVY_HITTERS = """
SELECT user_id, count(*) AS n, count(*) AS n_upper
FROM events GROUP BY 1
ORDER BY n DESC, user_id LIMIT 10
"""


# ---------------------------------------------------------------- C3 NFA

def q_nfa_match(sf_dir: str):
    from gush_ray.stages.nfa import Pattern, Step, match_pattern_batch

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "event_type"])
    ev = _ts_us(ev, "ts", "ts_us").drop_columns(["ts"])
    pat = Pattern(
        steps=(Step("click", "event_type", "click"),
               Step("purchase", "event_type", "purchase")),
        within_us=HOUR_US, key="user_id", ts_col="ts_us", id_col="event_id",
    )
    out = match_pattern_batch(ev, pat, num_partitions=8)
    return out.select_columns(["user_id", "click_id", "purchase_id"])


SQL_NFA_MATCH = """
SELECT a.user_id AS user_id, a.event_id AS click_id,
       b.event_id AS purchase_id
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'purchase'
 AND b.ts > a.ts
 AND epoch_us(b.ts) - epoch_us(a.ts) <= 3600000000
"""


def q_nfa_strict_match(sf_dir: str):
    """Strict-contiguity NFA: click immediately followed by purchase
    (no intervening event of the same key) within 1h — the lead() oracle."""
    from gush_ray.stages.nfa import Pattern, Step, match_pattern_batch

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "event_type"])
    ev = _ts_us(ev, "ts", "ts_us").drop_columns(["ts"])
    pat = Pattern(
        steps=(Step("click", "event_type", "click"),
               Step("purchase", "event_type", "purchase")),
        within_us=HOUR_US, key="user_id", ts_col="ts_us",
        id_col="event_id", contiguity="strict",
    )
    out = match_pattern_batch(ev, pat, num_partitions=8)
    return out.select_columns(["user_id", "click_id", "purchase_id"])


SQL_NFA_STRICT_MATCH = """
WITH w AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
         lead(event_id) OVER win AS next_id,
         lead(event_type) OVER win AS next_type,
         lead(epoch_us(ts)) OVER win AS next_tus
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id AS click_id, next_id AS purchase_id
FROM w
WHERE event_type = 'click' AND next_type = 'purchase'
  AND next_tus > tus AND next_tus - tus <= 3600000000
"""


def q_embedding_pairs_exact(sf_dir: str):
    """Exact cosine near-dup pairs (the SQL-checkable baseline the LSH
    variant approximates)."""
    from gush_ray.stages.similarity import exact_cosine_pairs

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return exact_cosine_pairs(emb, threshold=0.3)


SQL_EMBEDDING_PAIRS_EXACT = """
SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
       round_even(list_cosine_similarity(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]), 4) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                             b.embedding::DOUBLE[]) >= 0.3
"""


def q_asof_join(sf_dir: str):
    """As-of (temporal) join: each purchase paired with the user's most
    recent strictly-prior click (the change-stream 'value as of t'
    lookup; DuckDB ASOF JOIN oracle)."""
    from gush_ray.stages.joins import asof_join

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "event_type"])
    ev = _ts_us(ev, "ts", "ts_us")

    def side(kind, idcol, tscol):
        def f(b: pa.Table) -> pa.Table:
            b = b.filter(pc.equal(b["event_type"], kind))
            return pa.table({
                idcol: b["event_id"], "user_id": b["user_id"],
                tscol: b["ts_us"],
            })
        return f

    purchases = ev.map_batches(side("purchase", "purchase_id", "p_ts_us"),
                               batch_format="pyarrow", zero_copy_batch=True)
    clicks = ev.map_batches(side("click", "click_id", "c_ts_us"),
                            batch_format="pyarrow", zero_copy_batch=True)
    joined = asof_join(purchases, clicks, key="user_id",
                       ts_col="p_ts_us", right_ts_col="c_ts_us")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df[df["click_id"].notna()].copy()
        out["click_id"] = out["click_id"].astype("int64")
        out["purchase_id"] = out["purchase_id"].astype("int64")
        out["user_id"] = out["user_id"].astype("int64")
        return out[["purchase_id", "user_id", "click_id"]]

    return joined.map_batches(finish, batch_format="pandas")


SQL_ASOF_JOIN = """
SELECT p.event_id AS purchase_id, p.user_id AS user_id,
       c.event_id AS click_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT user_id AS cu, ts AS cts, event_id
           FROM events WHERE event_type = 'click') c
  ON p.user_id = c.cu AND p.ts > c.cts
"""


def q_interval_join(sf_dir: str):
    """Range join: each purchase paired with every view of the same user
    within ±30 minutes (either order) — the windowed event-correlation
    join, oracle = DuckDB inequality join."""
    from gush_ray.stages.joins import interval_join

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "event_type"])
    ev = _ts_us(ev, "ts", "ts_us")

    def side(kind, idcol, tscol):
        def f(b: pa.Table) -> pa.Table:
            b = b.filter(pc.equal(b["event_type"], kind))
            return pa.table({
                idcol: b["event_id"], "user_id": b["user_id"],
                tscol: b["ts_us"],
            })
        return f

    purchases = ev.map_batches(side("purchase", "purchase_id", "p_ts_us"),
                               batch_format="pyarrow", zero_copy_batch=True)
    views = ev.map_batches(side("view", "view_id", "v_ts_us"),
                           batch_format="pyarrow", zero_copy_batch=True)
    HALF_H = 1_800_000_000
    joined = interval_join(purchases, views, key="user_id",
                           ts_col="p_ts_us", right_ts_col="v_ts_us",
                           low_us=-HALF_H, high_us=HALF_H)
    return joined.select_columns(["purchase_id", "user_id", "view_id"])


SQL_INTERVAL_JOIN = """
SELECT p.event_id AS purchase_id, p.user_id AS user_id,
       v.event_id AS view_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id
 AND epoch_us(v.ts) - epoch_us(p.ts) BETWEEN -1800000000 AND 1800000000
"""


def q_nfa_three_step(sf_dir: str):
    """3-step sequence signup→click→purchase within 24h per user
    (all-runs ≡ the triple self-join oracle)."""
    from gush_ray.stages.nfa import Pattern, Step, match_pattern_batch

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "event_type"])
    ev = _ts_us(ev, "ts", "ts_us").drop_columns(["ts"])
    pat = Pattern(
        steps=(Step("signup", "event_type", "signup"),
               Step("click", "event_type", "click"),
               Step("purchase", "event_type", "purchase")),
        within_us=24 * HOUR_US, key="user_id", ts_col="ts_us",
        id_col="event_id",
    )
    out = match_pattern_batch(ev, pat, num_partitions=8)
    return out.select_columns(["user_id", "signup_id", "click_id",
                               "purchase_id"])


SQL_NFA_THREE_STEP = """
SELECT s.user_id AS user_id, s.event_id AS signup_id,
       c.event_id AS click_id, p.event_id AS purchase_id
FROM events s
JOIN events c ON s.user_id = c.user_id
 AND s.event_type = 'signup' AND c.event_type = 'click'
 AND c.ts > s.ts
JOIN events p ON s.user_id = p.user_id
 AND p.event_type = 'purchase' AND p.ts > c.ts
 AND epoch_us(p.ts) - epoch_us(s.ts) <= 86400000000
"""


def q_nfa_negation(sf_dir: str):
    """Negation (notFollowedBy): click→purchase within 1h per user with
    NO intervening error event — the NOT EXISTS oracle."""
    from gush_ray.stages.nfa import Pattern, Step, match_pattern_batch

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "event_type"])
    ev = _ts_us(ev, "ts", "ts_us").drop_columns(["ts"])
    pat = Pattern(
        steps=(Step("click", "event_type", "click"),
               Step("err", "event_type", "error", negated=True),
               Step("purchase", "event_type", "purchase")),
        within_us=HOUR_US, key="user_id", ts_col="ts_us", id_col="event_id",
    )
    out = match_pattern_batch(ev, pat, num_partitions=8)
    return out.select_columns(["user_id", "click_id", "purchase_id"])


SQL_NFA_NEGATION = """
SELECT a.user_id AS user_id, a.event_id AS click_id,
       b.event_id AS purchase_id
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'purchase'
 AND b.ts > a.ts
 AND epoch_us(b.ts) - epoch_us(a.ts) <= 3600000000
WHERE NOT EXISTS (
  SELECT 1 FROM events c
  WHERE c.user_id = a.user_id AND c.event_type = 'error'
    AND c.ts > a.ts AND c.ts < b.ts
)
"""


def q_nfa_gap(sf_dir: str):
    """Per-step gap bounds: signup→click→purchase within 24h where each
    consecutive hop is itself <= 6h (tighter than the run-wide window)."""
    from gush_ray.stages.nfa import Pattern, Step, match_pattern_batch

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "event_type"])
    ev = _ts_us(ev, "ts", "ts_us").drop_columns(["ts"])
    pat = Pattern(
        steps=(Step("signup", "event_type", "signup"),
               Step("click", "event_type", "click",
                    max_gap_us=6 * HOUR_US),
               Step("purchase", "event_type", "purchase",
                    max_gap_us=6 * HOUR_US)),
        within_us=24 * HOUR_US, key="user_id", ts_col="ts_us",
        id_col="event_id",
    )
    out = match_pattern_batch(ev, pat, num_partitions=8)
    return out.select_columns(["user_id", "signup_id", "click_id",
                               "purchase_id"])


SQL_NFA_GAP = """
SELECT s.user_id AS user_id, s.event_id AS signup_id,
       c.event_id AS click_id, p.event_id AS purchase_id
FROM events s
JOIN events c ON s.user_id = c.user_id
 AND s.event_type = 'signup' AND c.event_type = 'click'
 AND c.ts > s.ts
 AND epoch_us(c.ts) - epoch_us(s.ts) <= 21600000000
JOIN events p ON s.user_id = p.user_id
 AND p.event_type = 'purchase' AND p.ts > c.ts
 AND epoch_us(p.ts) - epoch_us(c.ts) <= 21600000000
 AND epoch_us(p.ts) - epoch_us(s.ts) <= 86400000000
"""


# ------------------------------------------------- corpus cleaning ops

def q_line_dedup(sf_dir: str):
    """C4/CCNet-style cross-corpus line dedup: a line (10-word chunk)
    appearing in several documents survives only at its first
    occurrence; documents are reassembled from surviving lines."""
    from gush_ray.stages.corpus import line_dedup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return line_dedup(docs, words_per_line=10, num_partitions=8)


SQL_LINE_DEDUP = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
nums AS (SELECT doc_id, ws,
                unnest(generate_series(0, (len(ws)-1)//10)) AS line_no
         FROM d),
lines AS (SELECT doc_id, line_no,
                 array_to_string(ws[line_no*10+1 : line_no*10+10], ' ')
                   AS line
          FROM nums),
keep AS (SELECT doc_id, line_no, line FROM lines
         QUALIFY row_number()
           OVER (PARTITION BY line ORDER BY doc_id, line_no) = 1)
SELECT doc_id, string_agg(line, ' ' ORDER BY line_no) AS text,
       count(*) AS n_lines
FROM keep GROUP BY doc_id
"""


def q_repeat_scrub(sf_dir: str):
    """Within-document repetition removal (3-word lines): duplicate
    lines inside a document are dropped, first occurrence kept, order
    preserved. Shuffle-free — documents never span batches."""
    from gush_ray.stages.corpus import scrub_repeated_lines_batch

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(
        lambda b: scrub_repeated_lines_batch(b, words_per_line=3),
        batch_format="pandas",
    )


SQL_REPEAT_SCRUB = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
nums AS (SELECT doc_id, ws,
                unnest(generate_series(0, (len(ws)-1)//3)) AS line_no
         FROM d),
lines AS (SELECT doc_id, line_no,
                 array_to_string(ws[line_no*3+1 : line_no*3+3], ' ')
                   AS line
          FROM nums),
keep AS (SELECT doc_id, line_no, line FROM lines
         QUALIFY row_number()
           OVER (PARTITION BY doc_id, line ORDER BY line_no) = 1)
SELECT doc_id, string_agg(line, ' ' ORDER BY line_no) AS text,
       count(*) AS n_lines
FROM keep GROUP BY doc_id
"""


def q_stratified_sample(sf_dir: str):
    """Deterministic quota sample: the 20 docs with smallest md5(id)
    per language (reproducible training-mixture construction)."""
    from gush_ray.stages.corpus import stratified_sample

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    return stratified_sample(docs, "lang", k=20)


SQL_STRATIFIED_SAMPLE = """
SELECT doc_id, lang FROM documents
QUALIFY row_number() OVER (
  PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 20
"""


def q_pii_redact(sf_dir: str):
    """PII scrub over the stringly-JSON props column: emails / IPs /
    phone runs / digit runs → typed placeholders (vectorized RE2 on
    both sides, so replacement semantics match exactly)."""
    from gush_ray.stages.text import redact_batch

    ev = _read(sf_dir, "events", columns=["event_id", "props"])
    out = ev.map_batches(
        lambda b: redact_batch(b, "props", "clean"),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return out.select_columns(["event_id", "clean"])


SQL_PII_REDACT = """
SELECT event_id,
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(props,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
    '\\+?\\d[\\d() .-]{7,}\\d', '<PHONE>', 'g'),
    '\\d+', '<NUM>', 'g') AS clean
FROM events
"""


CORE_QUERIES = {
    "nfa_match": (q_nfa_match, SQL_NFA_MATCH),
    "nfa_strict_match": (q_nfa_strict_match, SQL_NFA_STRICT_MATCH),
    "nfa_three_step": (q_nfa_three_step, SQL_NFA_THREE_STEP),
    "nfa_negation": (q_nfa_negation, SQL_NFA_NEGATION),
    "nfa_gap": (q_nfa_gap, SQL_NFA_GAP),
    "embedding_pairs_exact": (q_embedding_pairs_exact,
                              SQL_EMBEDDING_PAIRS_EXACT),
    "asof_join": (q_asof_join, SQL_ASOF_JOIN),
    "interval_join": (q_interval_join, SQL_INTERVAL_JOIN),
    "windowed_topk": (q_windowed_topk, SQL_WINDOWED_TOPK),
    "latest_row": (q_latest_row, SQL_LATEST_ROW),
    "distinct_users": (q_distinct_users, SQL_DISTINCT_USERS),
    "heavy_hitters": (q_heavy_hitters, SQL_HEAVY_HITTERS),
    "grouped_quantiles": (q_grouped_quantiles, SQL_GROUPED_QUANTILES),
    "change_delta": (q_change_delta, SQL_CHANGE_DELTA),
    "change_set_expr": (q_change_set_expr, SQL_CHANGE_SET_EXPR),
    "where_fields": (q_where_fields, SQL_WHERE_FIELDS),
    "typed_field_extract": (q_typed_field_extract, SQL_TYPED_FIELD_EXTRACT),
    "anti_join": (q_anti_join, SQL_ANTI_JOIN),
    "union_counts": (q_union_counts, SQL_UNION_COUNTS),
    "sliding_avg": (q_sliding_avg, SQL_SLIDING_AVG),
    "tumbling_count": (q_tumbling_count, SQL_TUMBLING_COUNT),
    "tumbling_avg": (q_tumbling_avg, SQL_TUMBLING_AVG),
    "sliding_count": (q_sliding_count, SQL_SLIDING_COUNT),
    "session_count": (q_session_count, SQL_SESSION_COUNT),
    "change_classify": (q_change_classify, SQL_CHANGE_CLASSIFY),
    "latest_version": (q_latest_version, SQL_LATEST_VERSION),
    "hash_join_agg": (q_hash_join_agg, SQL_HASH_JOIN_AGG),
    "salted_join_agg": (q_salted_join_agg, SQL_SALTED_JOIN_AGG),
    "broadcast_join_agg": (q_broadcast_join_agg, SQL_BROADCAST_JOIN_AGG),
    "deny_filter": (q_deny_filter, SQL_DENY_FILTER),
    "windowed_join_agg": (q_windowed_join_agg, SQL_WINDOWED_JOIN_AGG),
    "global_count": (q_global_count, SQL_GLOBAL_COUNT),
    "topk_docs": (q_topk_docs, SQL_TOPK_DOCS),
    "lang_counts": (q_lang_counts, SQL_LANG_COUNTS),
    "token_stats": (q_token_stats, SQL_TOKEN_STATS),
    "bpe_token_stats": (q_bpe_token_stats, SQL_BPE_TOKEN_STATS),
    "stopword_ratio": (q_stopword_ratio, SQL_STOPWORD_RATIO),
    "quality_score": (q_quality_score, SQL_QUALITY_SCORE),
    "exact_dedup_docs": (q_exact_dedup_docs, SQL_EXACT_DEDUP_DOCS),
    "url_normalize": (q_url_normalize, SQL_URL_NORMALIZE),
    "robots_filter": (q_robots_filter, SQL_ROBOTS_FILTER),
    "ann_topk": (q_ann_topk, SQL_ANN_TOPK),
    "line_dedup": (q_line_dedup, SQL_LINE_DEDUP),
    "repeat_scrub": (q_repeat_scrub, SQL_REPEAT_SCRUB),
    "stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "pii_redact": (q_pii_redact, SQL_PII_REDACT),
}
