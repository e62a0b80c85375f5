"""Analytic (window-function) + corpus-statistics queries, oracle-paired.

The SQL window-function family (running totals, lag gaps, ranks, NTILE),
ROLLUP/pivot aggregates, Gopher-style quality rules and the inverted
token index — each entry returns the Ray pipeline result AND carries the
exact DuckDB SQL; column names and float rounding match on both sides.

Scale notes: every per-key analytic is ONE hash shuffle
(``stages/analytic`` → ``partition_map``); rollup/pivot shuffle partial
aggregates only; the token index pre-collapses (token, doc) pairs inside
``map_batches`` so the shuffle moves one row per distinct (token, doc),
never one per occurrence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from gush_ray.pipelines.queries import _read, _round_ha, _ts_us
from gush_ray.stages.agg import partial_aggregate
from gush_ray.stages.analytic import (
    lag_columns,
    ntile_per_key,
    pivot_counts,
    rank_per_key,
    rollup_aggregate,
    running_aggregate,
)
from gush_ray.stages.text import gopher_rules_batch

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# ------------------------------------------------------- running aggregate

def q_running_total(sf_dir: str):
    """Per-user running money total in deterministic (ts, event_id) order.
    The sum runs over integer cents (floor(value*100)) so the cumulative
    value is EXACT on both sides — a float running sum would make the
    hash compare summation-order-sensitive."""
    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "value"])
    ev = _ts_us(ev, "ts", "ts_us")

    def cents(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "cents", pa.array(np.floor(v * 100).astype(np.int64))
        )

    ev = ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    out = running_aggregate(ev, "user_id", ["ts_us", "event_id"],
                            {"run_cents": ("cents", "sum")},
                            row_number_col="rn")
    return out.map_batches(
        lambda b: b[["event_id", "user_id", "rn", "run_cents"]],
        batch_format="pandas",
    )


SQL_RUNNING_TOTAL = """
SELECT event_id, user_id,
       ROW_NUMBER() OVER w AS rn,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER w AS BIGINT)
           AS run_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------- lag gaps

def q_event_gaps(sf_dir: str):
    """Per-user inter-event gap (ts - LAG(ts)) — the change-stream
    staleness signal. A user's first event gets -1 (not NULL: a typed
    sentinel keeps the compare hash integer-exact on both sides)."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    ev = _ts_us(ev, "ts", "ts_us")
    out = lag_columns(ev, "user_id", ["ts_us", "event_id"],
                      lag_specs={}, delta_specs={"gap_us": "ts_us"})

    def proj(b: pd.DataFrame) -> pd.DataFrame:
        b = b[["event_id", "user_id", "ts_us", "gap_us"]].copy()
        # pandas shift() promoted the int64 gaps to float64-with-NaN;
        # values are exact ints < 2^53 — sentinel the NaNs, restore int64
        b["gap_us"] = b["gap_us"].fillna(-1).astype("int64")
        return b

    return out.map_batches(proj, batch_format="pandas")


SQL_EVENT_GAPS = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       COALESCE(epoch_us(ts) - LAG(epoch_us(ts)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id), -1) AS gap_us
FROM events
"""


# -------------------------------------------------------------------- ntile

def q_ntile_buckets(sf_dir: str):
    """NTILE(4) value-quartile assignment per event type (the
    stratification primitive for balanced sampling)."""
    ev = _read(sf_dir, "events",
               columns=["event_id", "event_type", "value"])
    out = ntile_per_key(ev, "event_type", ["value", "event_id"], 4)
    return out.map_batches(
        lambda b: b[["event_id", "event_type", "tile"]],
        batch_format="pandas",
    )


SQL_NTILE_BUCKETS = """
SELECT event_id, event_type,
       NTILE(4) OVER (PARTITION BY event_type ORDER BY value, event_id)
           AS tile
FROM events
"""


# -------------------------------------------------------------------- ranks

def q_dense_ranks(sf_dir: str):
    """RANK + DENSE_RANK of documents by length within language (ties
    share a rank, so the result is deterministic without a tie-break)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    out = rank_per_key(docs, "lang", "n_chars", ascending=False)
    return out.map_batches(
        lambda b: b[["doc_id", "lang", "n_chars", "rnk", "drnk"]],
        batch_format="pandas",
    )


SQL_DENSE_RANKS = """
SELECT doc_id, lang, n_chars,
       CAST(RANK() OVER w AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
FROM documents
WINDOW w AS (PARTITION BY lang ORDER BY n_chars DESC)
"""


# ------------------------------------------------------------------- rollup

def q_rollup_counts(sf_dir: str):
    """GROUP BY ROLLUP(lang, source): counts + char sums at every level,
    coarser levels re-aggregated from finer PARTIALS (one input scan)."""
    docs = _read(sf_dir, "documents", columns=["lang", "source", "n_chars"])
    return rollup_aggregate(
        docs, ["lang", "source"],
        {"n": (None, "count"), "sum_chars": ("n_chars", "sum")},
    )


SQL_ROLLUP_COUNTS = """
SELECT lang, source, COUNT(*) AS n,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY ROLLUP(lang, source)
"""


# -------------------------------------------------------------------- pivot

def q_pivot_events(sf_dir: str):
    """Per-user event-type crosstab (COUNT FILTER pivot) — distributed:
    the (user, type) partial counts shuffle, then pivot per partition."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    return pivot_counts(ev, "user_id", "event_type", EVENT_TYPES)


SQL_PIVOT_EVENTS = """
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
       COUNT(*) FILTER (WHERE event_type = 'view') AS n_view,
       COUNT(*) AS n_total
FROM events
GROUP BY user_id
"""


# ----------------------------------------------------------- gopher quality

def q_lm_oov_rate(sf_dir: str):
    """CCNet-style LM quality filter, integer-exact surface: a bigram LM
    trained DISTRIBUTED on the deterministic quarter of the corpus
    (doc_id %% 4 == 0, min_count 2), broadcast once, then every doc
    scored for bigram out-of-vocabulary counts — the whole
    train→broadcast→score machinery is SQL-verified because membership
    counts are integers (stages/lm.py; the continuous perplexity score
    is the rows-only lm_perplexity)."""
    import ray

    from gush_ray.stages.lm import score_oov, train_bigram_lm

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def train_split(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["doc_id"] % 4 == 0]

    train = docs.map_batches(train_split, batch_format="pandas")
    lm = train_bigram_lm(train, min_count=2, max_table=5_000_000)
    lm_ref = ray.put(lm)
    scored = score_oov(docs, lm_ref, id_cols=("doc_id", "lang"))
    agg = partial_aggregate(
        scored, ["lang"],
        {"n_docs": (None, "count"), "n_bigrams": ("n_bigrams", "sum"),
         "n_oov": ("n_oov", "sum")},
    ).to_pandas()
    agg["n_bigrams"] = agg["n_bigrams"].astype("int64")
    agg["n_oov"] = agg["n_oov"].astype("int64")
    return agg.sort_values("lang").reset_index(drop=True)


SQL_LM_OOV_RATE = r"""
WITH docs_w AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'),
                     x -> x <> '') AS ws
  FROM documents
),
pairs AS (
  SELECT doc_id, lang, ws[i] AS w1, ws[i + 1] AS w2
  FROM docs_w, LATERAL (
    SELECT unnest(generate_series(1, len(ws) - 1)) AS i
  ) t
),
lm AS (
  SELECT w1, w2 FROM pairs WHERE doc_id % 4 = 0
  GROUP BY w1, w2 HAVING count(*) >= 2
),
scored AS (
  SELECT p.doc_id, count(*) AS n_bigrams,
         sum(CASE WHEN lm.w1 IS NULL THEN 1 ELSE 0 END) AS n_oov
  FROM pairs p
  LEFT JOIN lm ON lm.w1 = p.w1 AND lm.w2 = p.w2
  GROUP BY p.doc_id
)
SELECT d.lang, count(*) AS n_docs,
       CAST(coalesce(sum(s.n_bigrams), 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(sum(s.n_oov), 0) AS BIGINT) AS n_oov
FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
GROUP BY d.lang ORDER BY d.lang
"""


# Shared CTE prefix for the bigram-LM float oracles: training counts
# by string equality (== the engine's hash lookups, collision-free at
# this vocabulary), the same add-k/backoff probability formula, and
# the per-doc NLL rounded to 4 decimals BEFORE anything downstream.
# The rounding is what makes a float surface hash-checkable: numpy's
# SIMD log / pairwise mean and DuckDB's libm ln / sequential avg agree
# to ~1e-15, so the 1e-4 grid collapses both to identical doubles
# (residual flake risk ~1e-12 per document).
SQL_LM_SCORED_PREFIX = """
WITH RECURSIVE
dwords AS MATERIALIZED (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(coalesce(text,''), '\\s+'),
                     x -> x <> '') AS w
  FROM documents
),
tuni AS MATERIALIZED (
  SELECT tok, count(*)::BIGINT AS n FROM (
    SELECT unnest(w) AS tok FROM dwords WHERE doc_id % 4 = 0
  ) GROUP BY tok HAVING count(*) >= 2
),
tbi AS MATERIALIZED (
  SELECT a, b, count(*)::BIGINT AS n FROM (
    SELECT w[i] AS a, w[i+1] AS b
    FROM dwords, UNNEST(range(1, len(w))) AS t(i)
    WHERE doc_id % 4 = 0
  ) GROUP BY a, b HAVING count(*) >= 2
),
consts AS MATERIALIZED (
  SELECT greatest((SELECT count(*) FROM tuni), 1)::DOUBLE AS V,
         greatest((SELECT coalesce(sum(n), 0) FROM tuni), 1)::DOUBLE AS T
),
pairs AS (
  SELECT d.doc_id, d.lang, w[i] AS a, w[i+1] AS b
  FROM dwords d, UNNEST(range(1, len(w))) AS t(i)
),
probs AS (
  SELECT p.doc_id, p.lang,
         CASE WHEN coalesce(cu.n, 0) > 0
              THEN (coalesce(cb.n, 0) + 0.1) / (cu.n + 0.1 * c.V)
              ELSE (coalesce(cw.n, 0) + 0.1) / (c.T + 0.1 * c.V) END AS p
  FROM pairs p
  CROSS JOIN consts c
  LEFT JOIN tbi cb ON cb.a = p.a AND cb.b = p.b
  LEFT JOIN tuni cu ON cu.tok = p.a
  LEFT JOIN tuni cw ON cw.tok = p.b
),
scored AS MATERIALIZED (
  SELECT doc_id, lang, round_even(avg(-ln(p)), 4) AS nll
  FROM probs GROUP BY doc_id, lang
)
"""

SQL_LM_PERPLEXITY = SQL_LM_SCORED_PREFIX + """
SELECT lang, count(*)::BIGINT AS n_docs,
       round_even(sum(round_even(nll * 10000, 0)::BIGINT)
                  / (10000.0 * count(*)), 3) AS avg_nll
FROM scored GROUP BY lang ORDER BY lang
"""


def q_lm_perplexity(sf_dir: str):
    """CCNet-style continuous score: add-k-smoothed bigram NLL with
    unigram backoff (stages/lm.py), LM trained on the deterministic
    quarter of the corpus. Oracle-paired (round 3): per-doc NLLs are
    rounded to 4 decimals then integer-summed in micro-nats, which
    makes the float surface hash-checkable (SQL_LM_PERPLEXITY)."""
    import ray

    from gush_ray.stages.lm import score_perplexity, train_bigram_lm

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def train_split(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["doc_id"] % 4 == 0]

    train = docs.map_batches(train_split, batch_format="pandas")
    lm = train_bigram_lm(train, min_count=2, max_table=5_000_000)
    lm_ref = ray.put(lm)
    scored = score_perplexity(docs, lm_ref, id_cols=("doc_id", "lang"))

    def to_micro(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["nll"].notna()].copy()
        b["nll_u"] = (b["nll"] * 10_000).round().astype("int64")
        return b[["lang", "nll_u"]]

    agg = partial_aggregate(
        scored.map_batches(to_micro, batch_format="pandas"), ["lang"],
        {"n_docs": (None, "count"), "nll_sum": ("nll_u", "sum")},
    ).to_pandas()
    agg["avg_nll"] = (agg["nll_sum"] / (10_000 * agg["n_docs"])).round(3)
    return (agg.drop(columns=["nll_sum"])
            .sort_values("lang").reset_index(drop=True))


def q_gopher_quality(sf_dir: str):
    """Gopher-rule quality signals per document (word-count bounds,
    mean-word-length bounds, stopword floor) + the pass flag."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    out = docs.map_batches(gopher_rules_batch, batch_format="pandas")

    def proj(b: pd.DataFrame) -> pd.DataFrame:
        b = b[["doc_id", "lang", "n_words", "mean_word_len", "n_stop",
               "gopher_pass"]].copy()
        b["mean_word_len"] = _round_ha(b["mean_word_len"], 4)
        return b

    return out.map_batches(proj, batch_format="pandas")


SQL_GOPHER_QUALITY = """
WITH g AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(text, '\\S+')) AS n_words,
         length(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace,
         len(list_filter(regexp_extract_all(lower(text), '\\S+'),
             x -> x IN ('the','and','of','to','a','in','is','that','it','for')
         )) AS n_stop
  FROM documents
), m AS (
  SELECT doc_id, lang, n_words, n_stop,
         CASE WHEN n_words > 0
              THEN CAST(n_nonspace AS DOUBLE) / n_words
              ELSE 0.0 END AS mwl
  FROM g
)
SELECT doc_id, lang, n_words, ROUND(mwl, 4) AS mean_word_len, n_stop,
       (n_words BETWEEN 50 AND 100000)
       AND mwl >= 3.0 AND mwl <= 10.0
       AND n_stop >= 2 AS gopher_pass
FROM m
"""


# ----------------------------------------------------------- inverted index

def q_token_df(sf_dir: str):
    """Inverted-index statistics: per token, document frequency + total
    term frequency, for tokens in ≥5 docs. The per-batch combine emits
    one row per distinct (token, doc) — a doc never spans batches, so
    the pairs are exact and the shuffle moves |vocab×docs| rows, not
    token occurrences."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].fillna("").str.split()
        e = pd.DataFrame({"doc_id": b["doc_id"], "token": toks}).explode(
            "token"
        )
        e = e.dropna(subset=["token"])
        g = e.groupby(["token", "doc_id"], as_index=False, sort=False).size()
        return g.rename(columns={"size": "tf"})

    pairs = docs.map_batches(explode, batch_format="pandas")
    agg = partial_aggregate(pairs, ["token"],
                            {"df": (None, "count"), "tf": ("tf", "sum")})
    return agg.filter(expr="df >= 5")


SQL_TOKEN_DF = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
  FROM documents
)
SELECT token, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS tf
FROM toks
GROUP BY token
HAVING COUNT(DISTINCT doc_id) >= 5
"""


# --------------------------------------------------------------------- cube

def q_cube_counts(sf_dir: str):
    """GROUP BY CUBE(lang, source): every grouping subset (4 levels),
    each re-aggregated from the finest level's partials."""
    from gush_ray.stages.analytic import cube_aggregate

    docs = _read(sf_dir, "documents", columns=["lang", "source", "n_chars"])
    return cube_aggregate(
        docs, ["lang", "source"],
        {"n": (None, "count"), "sum_chars": ("n_chars", "sum")},
    )


SQL_CUBE_COUNTS = """
SELECT lang, source, COUNT(*) AS n,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY CUBE(lang, source)
"""


# ---------------------------------------------------------------- semi join

def q_semi_join(sf_dir: str):
    """Semi join (IN-subquery): events of users who ever purchased —
    the key set is collected once (bounded: distinct purchasers) and
    broadcast; the big side streams through a vectorized is_in filter."""
    from gush_ray.stages.joins import broadcast_semi_filter

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    buyers = (
        ev.filter(expr="event_type == 'purchase'")
        .select_columns(["user_id"]).unique("user_id")
    )
    kept = broadcast_semi_filter(ev, buyers, on="user_id")
    return partial_aggregate(kept, ["event_type"], {"n": (None, "count")})


SQL_SEMI_JOIN = """
SELECT event_type, COUNT(*) AS n
FROM events
WHERE user_id IN (SELECT user_id FROM events WHERE event_type = 'purchase')
GROUP BY event_type
"""


# --------------------------------------------------------- left outer join

def q_left_outer_join_agg(sf_dir: str):
    """LEFT OUTER hash join with unmatched-row accounting: events ⟕ a
    derived vip dimension (user_id % 3 == 0); per event_type, total rows
    and matched rows — the outer join's null-extension is the signal."""
    import pyarrow.compute as pc

    from gush_ray.stages.joins import hash_join

    ev = _read(sf_dir, "events", columns=["event_id", "user_id",
                                          "event_type"])
    # distinct users via the combiner aggregate (stays distributed),
    # then the vip predicate + constant column, Arrow-native
    distinct = partial_aggregate(
        _read(sf_dir, "events", columns=["user_id"]),
        ["user_id"], {"n_ev": (None, "count")},
    )

    def mk_dim(b: pa.Table) -> pa.Table:
        # pyarrow.compute has no mod kernel — numpy on the zero-copy view
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        f = b.filter(pa.array(uid % 3 == 0))
        return pa.table({
            "user_id": f["user_id"],
            "vip": pa.array(np.ones(f.num_rows, dtype=np.int64)),
        })

    dim = distinct.map_batches(mk_dim, batch_format="pyarrow")
    joined = hash_join(ev, dim, on=("user_id",), join_type="left_outer")

    def flag(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "matched": pc.is_valid(b["vip"]).cast(pa.int64()),
        })

    flagged = joined.map_batches(flag, batch_format="pyarrow")
    return partial_aggregate(
        flagged, ["event_type"],
        {"n": (None, "count"), "n_matched": ("matched", "sum")},
    )


SQL_LEFT_OUTER_JOIN_AGG = """
WITH dim AS (
  SELECT DISTINCT user_id, 1 AS vip FROM events WHERE user_id % 3 = 0
)
SELECT e.event_type, COUNT(*) AS n,
       CAST(SUM(CASE WHEN dim.vip IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_matched
FROM events e LEFT JOIN dim ON e.user_id = dim.user_id
GROUP BY e.event_type
"""


# --------------------------------------------------------- source formats

def _fixture_path(sf_dir: str, name: str) -> str:
    import hashlib

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    return f"/tmp/gush_ray_sources/{key}/{name}"


def q_jsonl_source_agg(sf_dir: str):
    """JSONL source roundtrip: events → deterministic JSONL file →
    ``sources.read_jsonl`` → grouped aggregate. The oracle aggregates
    the ORIGINAL parquet — matching proves the JSON encode/parse
    roundtrip is value-exact (ints and IEEE doubles)."""
    import os

    import pyarrow.parquet as pq

    from gush_ray.sources.formats import read_jsonl, roundtrip_table_jsonl

    path = _fixture_path(sf_dir, "events.jsonl")
    if not os.path.exists(path):
        tab = pq.read_table(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "event_type",
                                     "value"])
        roundtrip_table_jsonl(tab.sort_by("event_id"), path)
    ds = read_jsonl(path, columns=["event_type", "value"])

    def cents(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "cents", pa.array(np.floor(v * 100).astype(np.int64))
        )

    ds = ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    return partial_aggregate(
        ds, ["event_type"],
        {"n": (None, "count"), "sum_cents": ("cents", "sum")},
    )


SQL_JSONL_SOURCE_AGG = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
GROUP BY event_type
"""


def q_jsonl_gz_source_agg(sf_dir: str):
    """Compressed-JSONL source (the common webtext interchange shape:
    one .jsonl.gz per shard): events → gzip JSONL → ``read_jsonl``
    (transparent arrow-stream decompression) → grouped aggregate; the
    oracle aggregates the ORIGINAL parquet, so matching proves the
    compress/parse roundtrip is value-exact. The zstd path is pinned by
    tests/test_sources_sketches.py."""
    import os

    import pyarrow.parquet as pq

    from gush_ray.sources.formats import read_jsonl, roundtrip_table_jsonl

    path = _fixture_path(sf_dir, "events.jsonl.gz")
    if not os.path.exists(path):
        tab = pq.read_table(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "event_type",
                                     "value"])
        roundtrip_table_jsonl(tab.sort_by("event_id"), path)
    ds = read_jsonl(path, columns=["event_type", "value"])

    def cents(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "cents", pa.array(np.floor(v * 100).astype(np.int64))
        )

    ds = ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    return partial_aggregate(
        ds, ["event_type"],
        {"n": (None, "count"), "sum_cents": ("cents", "sum")},
    )


def q_csv_source_agg(sf_dir: str):
    """CSV source roundtrip: documents metadata → deterministic CSV →
    ``sources.read_csv`` → grouped aggregate; oracle over the original
    parquet proves the CSV encode/parse roundtrip."""
    import os

    import pyarrow.parquet as pq

    from gush_ray.sources.formats import read_csv, roundtrip_table_csv

    path = _fixture_path(sf_dir, "documents.csv")
    if not os.path.exists(path):
        tab = pq.read_table(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang", "n_chars"])
        roundtrip_table_csv(tab.sort_by("doc_id"), path)
    ds = read_csv(path, columns=["lang", "n_chars"])
    return partial_aggregate(
        ds, ["lang"],
        {"n": (None, "count"), "sum_chars": ("n_chars", "sum"),
         "max_chars": ("n_chars", "max")},
    )


SQL_CSV_SOURCE_AGG = """
SELECT lang, COUNT(*) AS n,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MAX(n_chars) AS max_chars
FROM documents
GROUP BY lang
"""


# ------------------------------------------------------------------ TF-IDF

def q_tfidf_top_terms(sf_dir: str):
    """Top-3 terms per document ranked by (tf DESC, df ASC, token ASC) —
    an integer-deterministic keyword-extraction order (a float tfidf
    ORDER BY would be 1-ulp-fragile across engines); the tfidf score
    ``tf * ln(N/df)`` is emitted rounded to 4 (ln outputs are irrational,
    so a 4-decimal round can't straddle an ulp)."""
    from gush_ray.stages.joins import hash_join
    from gush_ray.stages.shuffle import partition_map

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = docs.count()

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].fillna("").str.split()
        e = pd.DataFrame({"doc_id": b["doc_id"], "token": toks}).explode(
            "token"
        )
        e = e.dropna(subset=["token"])
        g = e.groupby(["token", "doc_id"], as_index=False, sort=False).size()
        return g.rename(columns={"size": "tf"})

    pairs = docs.map_batches(explode, batch_format="pandas").materialize()
    df_tab = partial_aggregate(pairs, ["token"], {"df": (None, "count")})
    # num_partitions sized for small sessions: the join spawns one
    # aggregator actor per partition and 32 starves a 4-cpu test session
    scored = hash_join(pairs, df_tab, on=("token",), num_partitions=8)

    def topk(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(
            ["doc_id", "tf", "df", "token"],
            ascending=[True, False, True, True], kind="mergesort",
        )
        out = part.groupby("doc_id", sort=False).head(3).copy()
        out["tfidf"] = _round_ha(
            out["tf"].to_numpy() * np.log(n_docs / out["df"].to_numpy()), 4
        )
        return out[["doc_id", "token", "tf", "df", "tfidf"]]

    return partition_map(scored, "doc_id", topk, num_partitions=8)


SQL_TFIDF_TOP_TERMS = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token
), df AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY token
), nd AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         ROUND(tf.tf * ln(CAST(nd.n_docs AS DOUBLE) / df.df), 4) AS tfidf,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, df.df ASC, tf.token ASC)
             AS rn
  FROM tf JOIN df USING (token) CROSS JOIN nd
)
SELECT doc_id, token, tf, df, tfidf FROM scored WHERE rn <= 3
"""


# -------------------------------------------------- RANGE moving window

def _with_cents(ds):
    def cents(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "cents", pa.array(np.floor(v * 100).astype(np.int64))
        )

    return ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)


def q_moving_window(sf_dir: str):
    """Per-user 10-minute RANGE moving window (count + money sum): the
    time-decayed activity signal. ANSI RANGE semantics incl. equal-ts
    peers; integer cents keep the frame sums exact on both sides."""
    from gush_ray.stages.analytic import moving_aggregate

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "value"])
    ev = _with_cents(_ts_us(ev, "ts", "ts_us"))
    out = moving_aggregate(ev, "user_id", "ts_us", 600_000_000,
                           {"win_cents": "cents"}, count_col="n_win")
    return out.map_batches(
        lambda b: b[["event_id", "user_id", "n_win", "win_cents"]],
        batch_format="pandas",
    )


SQL_MOVING_WINDOW = """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_win,
       CAST(SUM(cents) OVER w AS BIGINT) AS win_cents
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
"""


# ------------------------------------------------------- ratio to report

def q_value_share(sf_dir: str):
    """Each event's integer basis-point share of its event_type's money
    total (``RATIO_TO_REPORT``-style). Integer floor-division end to end
    — exact, summation-order-free."""
    from gush_ray.stages.analytic import group_share

    ev = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])
    ev = _with_cents(ev)
    out = group_share(ev, ["event_type"], "cents", out_col="share_bp")
    return out.map_batches(
        lambda b: b[["event_id", "event_type", "cents", "share_bp"]],
        batch_format="pandas",
    )


SQL_VALUE_SHARE = """
WITH e AS (
  SELECT event_id, event_type,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, event_type, cents,
       CAST((cents * 10000) // SUM(cents) OVER (PARTITION BY event_type)
            AS BIGINT) AS share_bp
FROM e
"""


# ----------------------------------------------------- per-group z-score

def q_zscore(sf_dir: str):
    """Per-event_type z-score of the event's money value (anomaly
    signal). mean/var derive from exact integer sums, so the float
    expression evaluates over identical operands in both engines; z is
    rounded to 6 digits on both sides."""
    from gush_ray.stages.analytic import group_zscore

    ev = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])
    ev = _with_cents(ev)
    out = group_zscore(ev, "event_type", "cents", z_col="z")
    return out.map_batches(
        lambda b: b[["event_id", "event_type", "z"]],
        batch_format="pandas",
    )


SQL_ZSCORE = """
WITH e AS (
  SELECT event_id, event_type,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events
),
s AS (
  SELECT event_type, SUM(cents) AS sc, SUM(cents * cents) AS sq,
         COUNT(*) AS n
  FROM e GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       ROUND((e.cents - sc / CAST(n AS DOUBLE))
             / sqrt(sq / CAST(n AS DOUBLE)
                    - (sc / CAST(n AS DOUBLE)) * (sc / CAST(n AS DOUBLE))),
             6) AS z
FROM e JOIN s USING (event_type)
"""


# ----------------------------------------------------- value histogram

def q_value_histogram(sf_dir: str):
    """Fixed-width ($20) histogram of event values per event_type —
    the distribution profile a quality dashboard reads. Pure integer
    bucketing; the count shuffle moves one partial per (type, bin)."""
    ev = _read(sf_dir, "events", columns=["event_type", "value"])
    ev = _with_cents(ev)

    def binify(b: pa.Table) -> pa.Table:
        c = b["cents"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": b["event_type"],
            "bin": pa.array((c // 2000).astype(np.int64)),
        })

    binned = ev.map_batches(binify, batch_format="pyarrow",
                            zero_copy_batch=True)
    return partial_aggregate(binned, ["event_type", "bin"],
                             {"n": (None, "count")})


SQL_VALUE_HISTOGRAM = """
SELECT event_type,
       CAST(CAST(FLOOR(value * 100) AS BIGINT) // 2000 AS BIGINT) AS bin,
       COUNT(*) AS n
FROM events
GROUP BY event_type, bin
"""


# ------------------------------------- blocked edit-distance pair join

def q_editdist_pairs(sf_dir: str):
    """Blocked string-similarity self-join over the corpus: documents
    sharing a 16-char prefix whose 40-char heads are within 4 edits —
    the OCR-noise / near-identical-title dedup primitive. Block + verify
    are both declared semantics, so the DuckDB oracle (substr equality +
    levenshtein) pairs bit-exactly."""
    from gush_ray.stages.strings import prefix_blocked_editdist_pairs

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return prefix_blocked_editdist_pairs(
        docs, "doc_id", "text", block_len=16, cmp_len=40, max_dist=4,
    )


SQL_EDITDIST_PAIRS = """
WITH d AS (
  SELECT doc_id, substr(text, 1, 16) AS blk, substr(text, 1, 40) AS s
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
WHERE levenshtein(a.s, b.s) <= 4
"""


# ------------------------------------------- benchmark decontamination

def q_decontaminate(sf_dir: str):
    """GPT-3/PaLM-style eval decontamination: docs sharing any word
    4-gram with the held-out benchmark slice (doc_id % 20 == 0) are
    flagged with their distinct-gram hit count. The benchmark gram set
    is small by contract and broadcast once (``ray.put``); the corpus
    side streams — only (doc_id, n_hits) rows come back."""
    from gush_ray.stages.decontam import (collect_bench_grams,
                                          contamination_hits)

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    bench = docs.map_batches(
        lambda b: b[(b["doc_id"] % 20 == 0).to_numpy()],
        batch_format="pandas")
    corpus = docs.map_batches(
        lambda b: b[(b["doc_id"] % 20 != 0).to_numpy()],
        batch_format="pandas")
    grams = collect_bench_grams(bench, n=4)
    return contamination_hits(corpus, grams, n=4)


SQL_DECONTAMINATE = """
WITH bw AS (SELECT string_split(text, ' ') AS ws FROM documents
            WHERE doc_id % 20 = 0),
bi AS (SELECT ws, unnest(generate_series(1, len(ws) - 3)) AS i FROM bw),
bg AS (SELECT DISTINCT array_to_string(ws[i : i+3], ' ') AS gram FROM bi),
cw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
       WHERE doc_id % 20 <> 0),
ci AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 3)) AS i
       FROM cw),
cg AS (SELECT DISTINCT doc_id, array_to_string(ws[i : i+3], ' ') AS gram
       FROM ci)
SELECT cg.doc_id AS doc_id, count(*) AS n_hits
FROM cg JOIN bg USING (gram)
GROUP BY cg.doc_id
"""


# --------------------------------------- exact substring duplication

def q_dup_spans(sf_dir: str):
    """Lee et al. 2021 exact-substring duplication stats: per-document
    merged spans of ≥30 chars whose content occurs more than once in
    the corpus. Fingerprint shuffle only — text never leaves the map
    side (see stages/decontam.duplicated_spans)."""
    from gush_ray.stages.decontam import duplicated_spans

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return duplicated_spans(docs, k=30, num_partitions=8)


SQL_DUP_SPANS = """
WITH w AS (SELECT doc_id, i, substring(text, i, 30) AS win
           FROM (SELECT doc_id, text,
                        unnest(generate_series(1, length(text) - 29)) AS i
                 FROM documents)),
d AS (SELECT win FROM w GROUP BY win HAVING count(*) > 1),
dw AS (SELECT w.doc_id, w.i FROM w JOIN d USING (win)),
flg AS (SELECT doc_id, i,
         CASE WHEN i > coalesce(lag(i) OVER (PARTITION BY doc_id
                                             ORDER BY i), -30) + 30
              THEN 1 ELSE 0 END AS new_island
        FROM dw),
isl AS (SELECT doc_id, i,
         sum(new_island) OVER (PARTITION BY doc_id ORDER BY i) AS island
        FROM flg),
sp AS (SELECT doc_id, island, min(i) AS s, max(i) + 29 AS e
       FROM isl GROUP BY doc_id, island)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(e - s + 1) AS BIGINT) AS dup_chars
FROM sp GROUP BY doc_id
"""


def q_dup_span_removal(sf_dir: str):
    """Remove-all-copies substring dedup: every duplicated ≥30-char span
    is cut out of every document; untouched docs pass through. One
    docs⟖spans co-partition join moves each document exactly once."""
    from gush_ray.stages.decontam import remove_duplicated_spans

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return remove_duplicated_spans(docs, k=30, num_partitions=8)


SQL_DUP_SPAN_REMOVAL = """
WITH w AS (SELECT doc_id, i, substring(text, i, 30) AS win
           FROM (SELECT doc_id, text,
                        unnest(generate_series(1, length(text) - 29)) AS i
                 FROM documents)),
d AS (SELECT win FROM w GROUP BY win HAVING count(*) > 1),
dw AS (SELECT w.doc_id, w.i FROM w JOIN d USING (win)),
flg AS (SELECT doc_id, i,
         CASE WHEN i > coalesce(lag(i) OVER (PARTITION BY doc_id
                                             ORDER BY i), -30) + 30
              THEN 1 ELSE 0 END AS new_island
        FROM dw),
isl AS (SELECT doc_id, i,
         sum(new_island) OVER (PARTITION BY doc_id ORDER BY i) AS island
        FROM flg),
sp AS (SELECT doc_id, island, min(i) AS s, max(i) + 30 AS e
       FROM isl GROUP BY doc_id, island),
seg AS (SELECT doc_id, s, e,
         coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 1)
           AS prev_e
        FROM sp),
cuts AS (SELECT dd.doc_id,
          string_agg(substring(dd.text, seg.prev_e, seg.s - seg.prev_e),
                     '' ORDER BY seg.s)
            || substring(dd.text, max(seg.e)) AS text,
          CAST(sum(least(seg.e, length(dd.text) + 1) - seg.s) AS BIGINT)
            AS removed_chars
         FROM documents dd JOIN seg ON dd.doc_id = seg.doc_id
         GROUP BY dd.doc_id, dd.text)
SELECT dd.doc_id, coalesce(c.text, dd.text) AS text,
       CAST(coalesce(c.removed_chars, 0) AS BIGINT) AS removed_chars
FROM documents dd LEFT JOIN cuts c USING (doc_id)
"""


# --------------------------------------------- exact distributed quantile

def q_exact_quantiles(sf_dir: str):
    """EXACT p50/p90 of order totalprice with no global sort: iterative
    histogram refinement (stats pass → bucket-count rounds → one
    collect pass over the final narrow value range). The exact
    counterpart of the approx_quantiles sketch; DuckDB quantile_disc is
    the oracle."""
    from gush_ray.stages.sketches import exact_quantiles_nosort

    orders = _read(sf_dir, "orders", columns=["o_totalprice"])
    qs = exact_quantiles_nosort(orders, "o_totalprice", [0.5, 0.9])
    return pd.DataFrame({"p50": [qs[0.5]], "p90": [qs[0.9]]})


SQL_EXACT_QUANTILES = """
SELECT CAST(quantile_disc(o_totalprice, 0.5) AS DOUBLE) AS p50,
       CAST(quantile_disc(o_totalprice, 0.9) AS DOUBLE) AS p90
FROM orders
"""


def q_grouped_quantiles(sf_dir: str):
    """Per-group EXACT p50/p90 with no sort: shared histogram-refinement
    rounds across every (group, q) task — one grouped stats pass, the
    rounds, one collect pass, regardless of group count."""
    from gush_ray.stages.sketches import grouped_exact_quantiles

    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_extendedprice"])
    long = grouped_exact_quantiles(li, "l_returnflag", "l_extendedprice",
                                   [0.5, 0.9])
    wide = long.pivot(index="l_returnflag", columns="q",
                      values="value").reset_index()
    wide.columns = ["l_returnflag", "p50", "p90"]
    return wide.sort_values("l_returnflag").reset_index(drop=True)


SQL_GROUPED_QUANTILES = """
SELECT l_returnflag,
       CAST(quantile_disc(l_extendedprice, 0.5) AS DOUBLE) AS p50,
       CAST(quantile_disc(l_extendedprice, 0.9) AS DOUBLE) AS p90
FROM lineitem GROUP BY l_returnflag
"""


def q_bm25(sf_dir: str):
    """BM25 retrieval scoring (Robertson/Lucene idf variant) for a fixed
    term query, fully distributed: one pass computes per-doc term
    frequencies + doc length; the global stats (N, avg doc length, per-
    term document frequency) fold from per-batch scalar partials; the
    scoring pass broadcasts those few floats and keeps per-batch top-k,
    so the driver merges k rows per batch — never the corpus."""
    TERMS = ("data", "stream", "window")
    K1, B = 1.2, 0.75
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def tf_len(bt: pd.DataFrame) -> pd.DataFrame:
        toks = bt["text"].str.split(" ")
        out = {"doc_id": bt["doc_id"], "dl": toks.map(len)}
        for t in TERMS:
            out[f"tf_{t}"] = toks.map(lambda ws, t=t: ws.count(t))
        return pd.DataFrame(out)

    stats = docs.map_batches(tf_len, batch_format="pandas")

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        row = {"n": [len(b)], "sdl": [int(b["dl"].sum())]}
        for t in TERMS:
            row[f"df_{t}"] = [int((b[f"tf_{t}"] > 0).sum())]
        return pd.DataFrame(row)

    # one scalar row per batch — driver-small by construction
    g = stats.map_batches(partials, batch_format="pandas").to_pandas()
    n = int(g["n"].sum())
    avgdl = g["sdl"].sum() / n
    idf = {t: np.log((n - int(g[f"df_{t}"].sum()) + 0.5)
                     / (int(g[f"df_{t}"].sum()) + 0.5) + 1.0)
           for t in TERMS}

    def score_topk(b: pd.DataFrame) -> pd.DataFrame:
        dl = b["dl"].to_numpy(dtype=np.float64)
        denom_dl = K1 * (1.0 - B + B * dl / avgdl)
        s = np.zeros(len(b))
        for t in TERMS:
            tf = b[f"tf_{t}"].to_numpy(dtype=np.float64)
            s += idf[t] * tf * (K1 + 1.0) / (tf + denom_dl)
        out = pd.DataFrame({"doc_id": b["doc_id"], "bm25": _round_ha(s, 4)})
        out = out[out["bm25"] > 0]
        return out.sort_values(["bm25", "doc_id"],
                               ascending=[False, True]).head(20)

    top = stats.map_batches(score_topk, batch_format="pandas").to_pandas()
    return top.sort_values(["bm25", "doc_id"], ascending=[False, True]) \
              .head(20).reset_index(drop=True)


SQL_BM25 = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
g AS (SELECT (SELECT count(*) FROM documents) AS n,
             (SELECT sum(dl) / (SELECT count(*) FROM documents) FROM dl)
                 AS avgdl),
tf AS (SELECT doc_id, w, count(*) AS tf FROM toks
       WHERE w IN ('data', 'stream', 'window') GROUP BY doc_id, w),
df AS (SELECT w, count(DISTINCT doc_id) AS df FROM tf GROUP BY w),
sc AS (SELECT tf.doc_id,
         sum(ln((g.n - df.df + 0.5) / (df.df + 0.5) + 1)
             * tf.tf * (1.2 + 1)
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / g.avgdl)))
             AS score
       FROM tf JOIN df USING (w) JOIN dl USING (doc_id) CROSS JOIN g
       GROUP BY tf.doc_id)
SELECT doc_id, round(score, 4) AS bm25 FROM sc
WHERE round(score, 4) > 0
ORDER BY round(score, 4) DESC, doc_id LIMIT 20
"""


def q_normalize_text(sf_dir: str):
    """Unicode NFC normalization (the canonical pre-dedup step): a
    decomposed combining sequence is prepended to every document so the
    fixture (pure ASCII) actually exercises recomposition; DuckDB's
    nfc_normalize is the oracle."""
    from gush_ray.stages.corpus import normalize_text

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pre = docs.map_batches(
        lambda b: b.assign(text="e\u0301" + b["text"]),
        batch_format="pandas")
    out = normalize_text(pre, col="text", out="norm_text")
    return out.select_columns(["doc_id", "norm_text"])


SQL_NORMALIZE_TEXT = """
SELECT doc_id, nfc_normalize(chr(101) || chr(769) || text) AS norm_text
FROM documents
"""


def q_group_corr(sf_dir: str):
    """Pearson correlation per group from ONE pass of sufficient
    statistics (n, Σx, Σy, Σx², Σy², Σxy) — the textbook mergeable-
    moments shape: per-batch partial sums, one tiny combiner shuffle,
    driver-side closed form over G rows."""
    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        x = b["l_quantity"].astype("float64")
        y = b["l_extendedprice"].astype("float64")
        return b.assign(x=x, y=y, xx=x * x, yy=y * y, xy=x * y)[
            ["l_returnflag", "x", "y", "xx", "yy", "xy"]]

    agg = partial_aggregate(
        li.map_batches(moments, batch_format="pandas"), ["l_returnflag"],
        {"n": (None, "count"), "sx": ("x", "sum"), "sy": ("y", "sum"),
         "sxx": ("xx", "sum"), "syy": ("yy", "sum"),
         "sxy": ("xy", "sum")},
    ).to_pandas()
    n = agg["n"].astype("float64")
    num = n * agg["sxy"] - agg["sx"] * agg["sy"]
    den = np.sqrt((n * agg["sxx"] - agg["sx"] ** 2)
                  * (n * agg["syy"] - agg["sy"] ** 2))
    out = pd.DataFrame({
        "l_returnflag": agg["l_returnflag"],
        "corr_qty_price": _round_ha(num / den, 4),
    })
    return out.sort_values("l_returnflag").reset_index(drop=True)


SQL_GROUP_CORR = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_group_mode(sf_dir: str):
    """Most frequent value per group, deterministic tie-break (highest
    count, then smallest value). Combiner shape: per-batch (group,
    value) counts, one partial shuffle; the merged table is
    groups × distinct-values rows — driver-small whenever the value
    column has bounded cardinality (quantity: 50)."""
    li = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    agg = partial_aggregate(
        li, ["l_returnflag", "l_quantity"], {"n": (None, "count")},
    ).to_pandas()
    agg = agg.sort_values(["l_returnflag", "n", "l_quantity"],
                          ascending=[True, False, True], kind="mergesort")
    out = agg.groupby("l_returnflag", as_index=False).head(1)
    out = out.rename(columns={"l_quantity": "mode_qty"})[
        ["l_returnflag", "mode_qty"]]
    return out.sort_values("l_returnflag").reset_index(drop=True)


SQL_GROUP_MODE = """
SELECT l_returnflag, l_quantity AS mode_qty FROM (
  SELECT l_returnflag, l_quantity,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY count(*) DESC, l_quantity) AS rn
  FROM lineitem GROUP BY l_returnflag, l_quantity)
WHERE rn = 1 ORDER BY l_returnflag
"""


def q_group_mad(sf_dir: str):
    """Median absolute deviation per group: grouped exact median (no
    sort), broadcast the G medians, one residual pass, grouped exact
    median again — a composition of two grouped_exact_quantiles runs,
    every scan column-pruned."""
    from gush_ray.stages.sketches import grouped_exact_quantiles

    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_extendedprice"])
    med = grouped_exact_quantiles(li, "l_returnflag", "l_extendedprice",
                                  [0.5])
    med_by_g = dict(zip(med["l_returnflag"], med["value"]))

    def residual(b: pd.DataFrame) -> pd.DataFrame:
        m = b["l_returnflag"].map(med_by_g).astype("float64")
        return pd.DataFrame({
            "l_returnflag": b["l_returnflag"],
            "r": (b["l_extendedprice"].astype("float64") - m).abs(),
        })

    resid = li.map_batches(residual, batch_format="pandas")
    mad = grouped_exact_quantiles(resid, "l_returnflag", "r", [0.5])
    out = pd.DataFrame({
        "l_returnflag": mad["l_returnflag"],
        "mad_price": _round_ha(mad["value"], 4),
    })
    return out.sort_values("l_returnflag").reset_index(drop=True)


SQL_GROUP_MAD = """
WITH m AS (
  SELECT l_returnflag, quantile_disc(l_extendedprice, 0.5) AS med
  FROM lineitem GROUP BY l_returnflag)
SELECT l.l_returnflag,
       round(CAST(quantile_disc(abs(l_extendedprice - med), 0.5)
                  AS DOUBLE), 4) AS mad_price
FROM lineitem l JOIN m USING (l_returnflag)
GROUP BY l.l_returnflag ORDER BY l.l_returnflag
"""


# --------------------------------------------- end-to-end training mix

def q_training_mix(sf_dir: str):
    """The composed training-data flagship: quality filter (Gopher-style
    word/stopword floors) → benchmark decontamination (4-gram overlap vs
    the held-out doc_id%20==0 slice) → exact dedup (min doc_id per
    md5(text)) → deterministic per-language quota sample. Every stage is
    the already-oracle-paired operator; this query pins that the
    COMPOSITION matches one SQL plan end-to-end."""
    import hashlib

    from gush_ray.stages.corpus import stratified_sample
    from gush_ray.stages.decontam import collect_bench_grams, doc_ngrams
    from gush_ray.stages.shuffle import partition_map
    from gush_ray.stages.text import gopher_rules_batch

    import ray

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    bench = docs.map_batches(
        lambda b: b[(b["doc_id"] % 20 == 0).to_numpy()],
        batch_format="pandas")
    corpus = docs.map_batches(
        lambda b: b[(b["doc_id"] % 20 != 0).to_numpy()],
        batch_format="pandas")

    grams_ref = ray.put(collect_bench_grams(bench, n=4))

    def quality_and_clean(b: pd.DataFrame) -> pd.DataFrame:
        g = gopher_rules_batch(b)
        g = g[(g["n_words"] >= 30) & (g["n_stop"] >= 2)]
        grams = ray.get(grams_ref)
        mask = [not (doc_ngrams(t or "", 4) & grams)
                for t in g["text"].tolist()]
        g = g[np.asarray(mask, dtype=bool)]
        g = g.copy()
        g["text_hash"] = g["text"].map(
            lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())
        return g[["doc_id", "lang", "n_words", "text_hash"]]

    cleaned = corpus.map_batches(quality_and_clean, batch_format="pandas")

    def keep_min(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["text_hash", "doc_id"], kind="mergesort")
        return df.groupby("text_hash", sort=False).head(1)

    deduped = partition_map(cleaned, ["text_hash"], keep_min,
                            num_partitions=8)
    mix = stratified_sample(deduped, "lang", k=30)
    return mix.drop_columns(["text_hash"])


SQL_TRAINING_MIX = """
WITH corpus AS (SELECT doc_id, text, lang FROM documents
                WHERE doc_id % 20 <> 0),
g AS (SELECT doc_id, text, lang,
        len(regexp_extract_all(text, '\\S+')) AS n_words,
        len(list_filter(regexp_extract_all(lower(text), '\\S+'),
            x -> x IN ('the','and','of','to','a','in','is','that','it','for')
        )) AS n_stop
      FROM corpus),
q AS (SELECT doc_id, text, lang, n_words FROM g
      WHERE n_words >= 30 AND n_stop >= 2),
bw AS (SELECT string_split(text, ' ') AS ws FROM documents
       WHERE doc_id % 20 = 0),
bi AS (SELECT ws, unnest(generate_series(1, len(ws) - 3)) AS i FROM bw),
bg AS (SELECT DISTINCT array_to_string(ws[i : i+3], ' ') AS gram FROM bi),
cw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM q),
ci AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 3)) AS i
       FROM cw),
cg AS (SELECT DISTINCT doc_id, array_to_string(ws[i : i+3], ' ') AS gram
       FROM ci),
cont AS (SELECT DISTINCT doc_id FROM cg JOIN bg USING (gram)),
clean AS (SELECT * FROM q
          WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
ded AS (SELECT * FROM clean
        QUALIFY row_number()
          OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1)
SELECT doc_id, lang, n_words FROM ded
QUALIFY row_number() OVER (
  PARTITION BY lang
  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 30
"""


def q_training_mix_v2(sf_dir: str):
    """Round-3 composed training-data pipeline: word floor → CCNet-style
    LM OOV filter (bigram LM trained distributed on the doc_id%4==0
    slice; drop docs with > 0.5%% out-of-vocabulary bigrams, compared in
    INTEGERS so the plan stays hash-exact) → exact dedup (min doc_id per
    md5(text)) → deterministic per-language quota sample. One plan, one
    SQL oracle — pins that the round-3 LM operator composes with the
    established cleaning stages."""
    import hashlib

    import ray

    from gush_ray.stages.corpus import stratified_sample
    from gush_ray.stages.lm import score_oov, train_bigram_lm
    from gush_ray.stages.shuffle import partition_map

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    train = docs.map_batches(
        lambda b: b[(b["doc_id"] % 4 == 0).to_numpy()],
        batch_format="pandas")
    lm_ref = ray.put(train_bigram_lm(train, min_count=2,
                                     max_table=5_000_000))
    scored = score_oov(docs, lm_ref, id_cols=("doc_id", "lang", "text"))

    def qual(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["n_words"] = b["text"].fillna("").map(lambda t: len(t.split()))
        b = b[(b["n_words"] >= 30)
              & (b["n_oov"] * 200 <= b["n_bigrams"])]
        b["text_hash"] = b["text"].map(
            lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())
        return b[["doc_id", "lang", "n_words", "text_hash"]]

    cleaned = scored.map_batches(qual, batch_format="pandas")

    def keep_min(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["text_hash", "doc_id"], kind="mergesort")
        return df.groupby("text_hash", sort=False).head(1)

    deduped = partition_map(cleaned, ["text_hash"], keep_min,
                            num_partitions=8)
    mix = stratified_sample(deduped, "lang", k=30)
    return mix.drop_columns(["text_hash"])


SQL_TRAINING_MIX_V2 = r"""
WITH docs_w AS (
  SELECT doc_id, lang, text,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'),
                     x -> x <> '') AS ws
  FROM documents
),
pairs AS (
  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
  FROM docs_w, LATERAL (
    SELECT unnest(generate_series(1, len(ws) - 1)) AS i
  ) t
),
lm AS (
  SELECT w1, w2 FROM pairs WHERE doc_id % 4 = 0
  GROUP BY w1, w2 HAVING count(*) >= 2
),
sc AS (
  SELECT p.doc_id, count(*) AS nb,
         sum(CASE WHEN lm.w1 IS NULL THEN 1 ELSE 0 END) AS no
  FROM pairs p
  LEFT JOIN lm ON lm.w1 = p.w1 AND lm.w2 = p.w2
  GROUP BY p.doc_id
),
q AS (
  SELECT d.doc_id, d.lang, d.text, len(d.ws) AS n_words
  FROM docs_w d LEFT JOIN sc s ON s.doc_id = d.doc_id
  WHERE len(d.ws) >= 30
    AND coalesce(s.no, 0) * 200 <= coalesce(s.nb, 0)
),
ded AS (
  SELECT * FROM q
  QUALIFY row_number()
    OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
)
SELECT doc_id, lang, n_words FROM ded
QUALIFY row_number() OVER (
  PARTITION BY lang
  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 30
"""


ANALYTIC_QUERIES = {
    "running_total": (q_running_total, SQL_RUNNING_TOTAL),
    "event_gaps": (q_event_gaps, SQL_EVENT_GAPS),
    "ntile_buckets": (q_ntile_buckets, SQL_NTILE_BUCKETS),
    "dense_ranks": (q_dense_ranks, SQL_DENSE_RANKS),
    "rollup_counts": (q_rollup_counts, SQL_ROLLUP_COUNTS),
    "pivot_events": (q_pivot_events, SQL_PIVOT_EVENTS),
    "gopher_quality": (q_gopher_quality, SQL_GOPHER_QUALITY),
    "token_df": (q_token_df, SQL_TOKEN_DF),
    "jsonl_source_agg": (q_jsonl_source_agg, SQL_JSONL_SOURCE_AGG),
    "jsonl_gz_source_agg": (q_jsonl_gz_source_agg, SQL_JSONL_SOURCE_AGG),
    "csv_source_agg": (q_csv_source_agg, SQL_CSV_SOURCE_AGG),
    "tfidf_top_terms": (q_tfidf_top_terms, SQL_TFIDF_TOP_TERMS),
    "cube_counts": (q_cube_counts, SQL_CUBE_COUNTS),
    "semi_join": (q_semi_join, SQL_SEMI_JOIN),
    "left_outer_join_agg": (q_left_outer_join_agg, SQL_LEFT_OUTER_JOIN_AGG),
    "moving_window": (q_moving_window, SQL_MOVING_WINDOW),
    "value_share": (q_value_share, SQL_VALUE_SHARE),
    "zscore": (q_zscore, SQL_ZSCORE),
    "value_histogram": (q_value_histogram, SQL_VALUE_HISTOGRAM),
    "editdist_pairs": (q_editdist_pairs, SQL_EDITDIST_PAIRS),
    "decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    "dup_spans": (q_dup_spans, SQL_DUP_SPANS),
    "dup_span_removal": (q_dup_span_removal, SQL_DUP_SPAN_REMOVAL),
    "training_mix": (q_training_mix, SQL_TRAINING_MIX),
    "exact_quantiles": (q_exact_quantiles, SQL_EXACT_QUANTILES),
    "grouped_quantiles": (q_grouped_quantiles, SQL_GROUPED_QUANTILES),
    "group_corr": (q_group_corr, SQL_GROUP_CORR),
    "group_mode": (q_group_mode, SQL_GROUP_MODE),
    "group_mad": (q_group_mad, SQL_GROUP_MAD),
    "normalize_text": (q_normalize_text, SQL_NORMALIZE_TEXT),
    "bm25": (q_bm25, SQL_BM25),
    "lm_oov_rate": (q_lm_oov_rate, SQL_LM_OOV_RATE),
    "lm_perplexity": (q_lm_perplexity, SQL_LM_PERPLEXITY),
    "training_mix_v2": (q_training_mix_v2, SQL_TRAINING_MIX_V2),
}
