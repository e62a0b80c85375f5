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


ANALYTIC_QUERIES = {
    "running_total": (q_running_total, SQL_RUNNING_TOTAL),
    "event_gaps": (q_event_gaps, SQL_EVENT_GAPS),
    "ntile_buckets": (q_ntile_buckets, SQL_NTILE_BUCKETS),
    "dense_ranks": (q_dense_ranks, SQL_DENSE_RANKS),
    "rollup_counts": (q_rollup_counts, SQL_ROLLUP_COUNTS),
    "pivot_events": (q_pivot_events, SQL_PIVOT_EVENTS),
    "gopher_quality": (q_gopher_quality, SQL_GOPHER_QUALITY),
    "token_df": (q_token_df, SQL_TOKEN_DF),
}
