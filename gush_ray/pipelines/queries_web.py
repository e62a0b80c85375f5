"""Web-graph / URL / data-mixing queries (round-3 fifth wave), each
oracle-paired:

* ``link_extract`` — anchor (``<a href``) targets out of raw html bytes;
  the oracle recomputes the edge list with ``regexp_extract_all``.
* ``pagerank`` — integer-exact damped PageRank over the extracted link
  graph (stages/web.pagerank); the oracle unrolls the iterations as a
  generated CTE chain over the SAME int64 floor-division arithmetic, so
  the match is bit-exact, not tolerance-based.
* ``link_components`` — undirected connected components over the link
  graph via the distributed min-label propagation
  (stages/dedup.duplicate_clusters_distributed); the oracle is the
  classic recursive-CTE reachability min.
* ``url_canonical_dedup`` — canonical-URL grouping under the documented
  rule set (stages/web.canonicalize_urls); the oracle reimplements every
  rule in DuckDB string/list functions (independent implementation, not
  a shared helper).
* ``dsir_select`` — DSIR-style importance resampling (hashed-unigram
  bucket distributions, target = ``lang='en'`` docs) with per-bucket
  log-ratios rounded to integer micro-nats BEFORE the per-doc sum, so
  numpy-vs-libm ``ln`` ulp differences collapse and the per-doc weights
  are exact int64 (same trick as the bigram-LM oracles).

Reference parity note: the reference (simao/gush) is a pure CDC/CEP
engine with no web-graph or data-mixing surface; these operators belong
to the graft brief's LLM-training-data families.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from gush_ray.datagen import (
    LINK_FIXTURE,
    URL_FIXTURE,
    ensure_link_fixture,
    ensure_url_fixture,
)
from gush_ray.stages.web import (
    canonicalize_batch,
    extract_links_batch,
    pagerank,
)

# ---------------------------------------------------------------------------
# link extraction
# ---------------------------------------------------------------------------

_LINK_PARQUET = f"{LINK_FIXTURE}/pages.parquet"
_URL_PARQUET = f"{URL_FIXTURE}/urls.parquet"


def _read_links():
    ensure_link_fixture()
    return rd.read_parquet(_LINK_PARQUET, override_num_blocks=8)


def q_link_extract(sf_dir: str):
    """(src_url, dst_url) anchor edge list (external targets included)."""
    return _read_links().map_batches(
        lambda b: extract_links_batch(b.select(["url", "html"])),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_LINK_EXTRACT = f"""
SELECT url AS src_url,
       unnest(regexp_extract_all(decode(html), '<a href="([^"<]*)"', 1))
         AS dst_url
FROM read_parquet('{_LINK_PARQUET}')
"""


# ---------------------------------------------------------------------------
# the internal edge list (page_id → page_id), shared by pagerank and
# the components query; external hrefs drop out at the node join
# ---------------------------------------------------------------------------

def _edge_dataset(node_field: str = "page_id"):
    """THE single definition of an internal link edge (href extraction
    + dst-in-pages join), parameterized by the node identity: page_id
    (the graph queries) or url (the host-contraction query). Any change
    to extraction or internal-edge semantics lands in every graph
    operator at once (round-3 review finding: host_pagerank had its own
    inline copy)."""
    from gush_ray.stages.joins import hash_join

    pages = _read_links()

    def links(b: pa.Table) -> pa.Table:
        out = extract_links_batch(
            b.select([node_field, "html"]).rename_columns(["url", "html"]))
        return out.rename_columns(["src", "dst_url"])

    edges_raw = pages.map_batches(links, batch_format="pyarrow",
                                  zero_copy_batch=True)
    if node_field == "url":
        # the matched page's identity IS the join key — no second column
        nodes = pages.map_batches(
            lambda b: b.select(["url"]).rename_columns(["dst_url"]),
            batch_format="pyarrow")
        edges = hash_join(edges_raw, nodes, on="dst_url").map_batches(
            lambda b: b.rename(columns={"dst_url": "dst"})[["src", "dst"]],
            batch_format="pandas")
    else:
        nodes = pages.map_batches(
            lambda b: b.select(["url", node_field]).rename_columns(
                ["dst_url", "dst"]),
            batch_format="pyarrow")
        edges = hash_join(edges_raw, nodes, on="dst_url").map_batches(
            lambda b: b[["src", "dst"]], batch_format="pandas")
    return edges.materialize(), pages


_SQL_GRAPH_BASE = f"""
pages AS MATERIALIZED (
  SELECT page_id, url, decode(html) AS h
  FROM read_parquet('{_LINK_PARQUET}')),
links AS (
  SELECT page_id AS src,
         unnest(regexp_extract_all(h, '<a href="([^"<]*)"', 1)) AS dst_url
  FROM pages),
edges AS MATERIALIZED (
  SELECT l.src AS src, p.page_id AS dst
  FROM links l JOIN pages p ON p.url = l.dst_url)
"""

_PR_ITERS = 8
_PR_SCALE = 10**12


def q_pagerank(sf_dir: str):
    """Integer-exact PageRank, 8 iterations, d=0.85, micro-rank units."""
    edges, pages = _edge_dataset()
    nodes = pages.map_batches(lambda b: b[["page_id"]].rename(
        columns={"page_id": "node"}), batch_format="pandas")
    pr = pagerank(edges, nodes, iters=_PR_ITERS, scale=_PR_SCALE)
    return pr.map_batches(
        lambda b: b.rename(columns={"node": "page_id"}),
        batch_format="pandas")


def _sql_pagerank() -> str:
    n_nodes = 900  # gen_linked_pages default — fixture-fixed, like the
    # baked hyperplane literals of the LSH oracles; a size change would
    # fail the row-count gate immediately
    r0 = _PR_SCALE // n_nodes
    base = (15 * _PR_SCALE) // (100 * n_nodes)
    ctes = [f"pr0 AS (SELECT page_id, {r0}::BIGINT AS r FROM pages)"]
    for k in range(1, _PR_ITERS + 1):
        ctes.append(f"""
pr{k} AS MATERIALIZED (
  SELECT n.page_id AS page_id,
         {base}::BIGINT + (85 * COALESCE(s.c, 0)) // 100 AS r
  FROM pages n LEFT JOIN (
    SELECT e.dst AS dst, SUM(p.r // d.d) AS c
    FROM pr{k-1} p
    JOIN edges e ON e.src = p.page_id
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst) s ON s.dst = n.page_id)""")
    chain = ",".join(ctes)
    return f"""
WITH {_SQL_GRAPH_BASE},
deg AS MATERIALIZED (SELECT src, count(*) AS d FROM edges GROUP BY src),
{chain}
SELECT page_id, CAST(r AS BIGINT) AS rank_micro FROM pr{_PR_ITERS}
"""


SQL_PAGERANK = _sql_pagerank()


def q_incremental_pagerank(sf_dir: str):
    """INCREMENTAL PageRank (evolving-graph warm restart, round-5
    new family): phase A runs 4 integer-exact iterations over the
    "first crawl" edge subset (the deterministic arithmetic cut
    ``(src*31 + dst) % 3 != 0`` — no extra fixture column needed);
    phase B continues 4 MORE iterations over the FULL edge set,
    warm-started from phase A's rank vector (stages/web.pagerank
    ``init_ranks``) — the production pattern when a crawl grows and
    ranks keep converging from where they were instead of restarting
    uniform. All arithmetic is int64 floor division, so the two-phase
    result is bit-identical to the oracle's unrolled CTE chain (warm
    pr4 feeding the full-graph iterations with their own out-degrees).
    """
    edges, pages = _edge_dataset()
    nodes = pages.map_batches(lambda b: b[["page_id"]].rename(
        columns={"page_id": "node"}), batch_format="pandas")
    edges_a = edges.map_batches(
        lambda b: b[(b["src"] * 31 + b["dst"]) % 3 != 0],
        batch_format="pandas").materialize()
    pr_a = pagerank(edges_a, nodes, iters=_PR_ITERS // 2,
                    scale=_PR_SCALE)
    pr = pagerank(edges, nodes, iters=_PR_ITERS // 2, scale=_PR_SCALE,
                  init_ranks=pr_a)
    return pr.map_batches(
        lambda b: b.rename(columns={"node": "page_id"}),
        batch_format="pandas")


def _sql_incremental_pagerank() -> str:
    n_nodes = 900  # fixture-fixed, as for the pagerank oracle
    r0 = _PR_SCALE // n_nodes
    base = (15 * _PR_SCALE) // (100 * n_nodes)
    half = _PR_ITERS // 2

    def step(k: int, edges_name: str, deg_name: str) -> str:
        return f"""
pr{k} AS MATERIALIZED (
  SELECT n.page_id AS page_id,
         {base}::BIGINT + (85 * COALESCE(s.c, 0)) // 100 AS r
  FROM pages n LEFT JOIN (
    SELECT e.dst AS dst, SUM(p.r // d.d) AS c
    FROM pr{k-1} p
    JOIN {edges_name} e ON e.src = p.page_id
    JOIN {deg_name} d ON d.src = e.src
    GROUP BY e.dst) s ON s.dst = n.page_id)"""

    ctes = [f"pr0 AS (SELECT page_id, {r0}::BIGINT AS r FROM pages)"]
    for k in range(1, half + 1):
        ctes.append(step(k, "edges_a", "deg_a"))
    for k in range(half + 1, 2 * half + 1):
        ctes.append(step(k, "edges", "deg"))
    chain = ",".join(ctes)
    return f"""
WITH {_SQL_GRAPH_BASE},
edges_a AS MATERIALIZED (
  SELECT src, dst FROM edges WHERE (src*31 + dst) % 3 <> 0),
deg_a AS MATERIALIZED (SELECT src, count(*) AS d FROM edges_a GROUP BY src),
deg AS MATERIALIZED (SELECT src, count(*) AS d FROM edges GROUP BY src),
{chain}
SELECT page_id, CAST(r AS BIGINT) AS rank_micro FROM pr{2 * half}
"""


SQL_INCREMENTAL_PAGERANK = _sql_incremental_pagerank()


_HITS_ITERS = 4


def q_hits(sf_dir: str):
    """Integer-exact HITS (hubs & authorities) over the link graph,
    4 iterations, L1-normalized to micro units each half-step
    (stages/web.hits_dense; the oracle replays the identical integer
    arithmetic in HUGEINT CTEs)."""
    from gush_ray.stages.web import hits_dense

    edges, pages = _edge_dataset()
    out = hits_dense(edges, 900, iters=_HITS_ITERS, scale=_PR_SCALE)
    return out.map_batches(
        lambda b: b.rename(columns={"node": "page_id"}),
        batch_format="pandas")


def _sql_hits() -> str:
    n_nodes = 900  # fixture-fixed, as for the pagerank oracle
    s0 = _PR_SCALE // n_nodes
    ctes = [f"h0 AS (SELECT page_id AS v, {s0}::BIGINT AS x FROM pages)"]

    def norm_step(name: str, raw_from: str, join_on: str,
                  group_to: str) -> str:
        # raw sums over one edge direction, then exact HUGEINT
        # sum-normalization to {_PR_SCALE} total mass
        return f"""
{name}r AS MATERIALIZED (
  SELECT e.{group_to} AS v, SUM(p.x) AS s
  FROM {raw_from} p JOIN edges e ON e.{join_on} = p.v
  GROUP BY e.{group_to}),
{name} AS MATERIALIZED (
  SELECT n.page_id AS v,
         CAST(COALESCE((r.s * {_PR_SCALE}) // t.tot, 0) AS BIGINT) AS x
  FROM pages n
  LEFT JOIN {name}r r ON r.v = n.page_id
  CROSS JOIN (SELECT SUM(s) AS tot FROM {name}r) t)"""

    for k in range(1, _HITS_ITERS + 1):
        ctes.append(norm_step(f"a{k}", f"h{k-1}", "src", "dst"))
        ctes.append(norm_step(f"h{k}", f"a{k}", "dst", "src"))
    chain = ",".join(ctes)
    K = _HITS_ITERS
    return f"""
WITH {_SQL_GRAPH_BASE},
{chain}
SELECT a{K}.v AS page_id, a{K}.x AS auth_micro, h{K}.x AS hub_micro
FROM a{K} JOIN h{K} ON h{K}.v = a{K}.v
"""


SQL_HITS = _sql_hits()


def q_link_components(sf_dir: str):
    """Undirected connected components; component_id = min page_id."""
    from gush_ray.stages.dedup import duplicate_clusters_distributed
    from gush_ray.stages.joins import hash_join

    edges, pages = _edge_dataset()
    comps = duplicate_clusters_distributed(edges, a_col="src", b_col="dst")
    nodes = pages.map_batches(
        lambda b: b[["page_id"]].rename(columns={"page_id": "doc_id"}),
        batch_format="pandas")
    joined = hash_join(nodes, comps, on="doc_id", join_type="left_outer")

    def out(b: pd.DataFrame) -> pd.DataFrame:
        comp = b["cluster_id"].fillna(b["doc_id"]).astype(np.int64)
        return pd.DataFrame({"page_id": b["doc_id"].to_numpy(),
                             "component_id": comp.to_numpy()})

    return joined.map_batches(out, batch_format="pandas")


SQL_LINK_COMPONENTS = f"""
WITH RECURSIVE {_SQL_GRAPH_BASE},
und AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM edges
  UNION ALL
  SELECT dst, src FROM edges),
cc AS (
  SELECT page_id AS node, page_id AS lab FROM pages
  UNION
  SELECT u.b, cc.lab FROM cc JOIN und u ON u.a = cc.node)
SELECT node AS page_id, MIN(lab) AS component_id FROM cc GROUP BY node
"""


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

def q_url_canonical_dedup(sf_dir: str):
    """Canonical-URL dedup groups: (canon_url, n_variants, keeper_uid)."""
    from gush_ray.stages.agg import partial_aggregate

    ensure_url_fixture()
    ds = rd.read_parquet(_URL_PARQUET, override_num_blocks=8)
    canon = ds.map_batches(canonicalize_batch, batch_format="pyarrow",
                           zero_copy_batch=True)
    return partial_aggregate(canon, ["canon_url"],
                             {"n_variants": (None, "count"),
                              "keeper_uid": ("uid", "min")})


def _sql_canon_cte(src_rel: str, col: str, prefix: str = "cn") -> str:
    """CTE chain ``{prefix}_map(raw, canon)`` mapping the distinct
    values of ``src_rel.col`` through the 5 canonicalization rules —
    an independent SQL reimplementation of stages/web.canonicalize_urls
    (positional regex groups here, named groups engine-side; RE2 both
    ways). A value that doesn't match ``scheme://authority...`` passes
    through unchanged (scheme is never '' in a match)."""
    return f"""
{prefix}_g AS (
  SELECT raw, regexp_extract(raw,
      '^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]+)([^?#]*)(\\?[^#]*)?(#.*)?$',
      ['scheme','auth','path','query','frag']) AS m
  FROM (SELECT DISTINCT {col} AS raw FROM {src_rel})),
{prefix}_hp AS (
  SELECT raw, m,
         regexp_extract(m.auth, '^([^:]*)(:.*)?$', ['h','p']) AS a
  FROM {prefix}_g),
{prefix}_map AS (
  SELECT raw,
    CASE WHEN m.scheme = '' THEN raw
         ELSE lower(m.scheme) || '://' || lower(a.h)
           || CASE WHEN (lower(m.scheme)='http'  AND a.p=':80')
                     OR (lower(m.scheme)='https' AND a.p=':443')
                   THEN '' ELSE a.p END
           || CASE WHEN m.path='' THEN '/'
                   WHEN m.path='/' THEN '/'
                   ELSE regexp_replace(m.path, '/$', '') END
           || CASE WHEN m.query='' THEN ''
                   ELSE '?' || array_to_string(
                        list_sort(string_split(substr(m.query, 2), '&')),
                        '&') END
    END AS canon
  FROM {prefix}_hp)"""


SQL_URL_CANONICAL_DEDUP = f"""
WITH u AS (SELECT uid, raw_url FROM read_parquet('{_URL_PARQUET}')),
{_sql_canon_cte('u', 'raw_url')}
SELECT c.canon AS canon_url,
       count(*) AS n_variants,
       min(u.uid) AS keeper_uid
FROM u JOIN cn_map c ON c.raw = u.raw_url
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# DSIR importance resampling
# ---------------------------------------------------------------------------

_DSIR_B = 256  # hashed-unigram feature buckets
_DSIR_TOPN = 100


def q_dsir_select(sf_dir: str, hash_fn: str = "md5"):
    """Top-100 docs by DSIR importance weight (target = lang='en').

    Per-bucket log-ratio ``ln(p_target/p_raw)`` (add-1 smoothed) is
    rounded half-even to integer micro-nats; per-doc weight is the exact
    int64 sum of its tokens' bucket ratios. Distributed shape: token
    explode → bucket-count partial agg (target + raw in one pass); the
    B=256 ratio table broadcasts (fixed-size, corpus-independent); per-doc
    weights partial-agg by doc; top-N via per-batch partials + one
    single-partition final cut.

    ``hash_fn='md5'`` is the oracle-verification mode (DuckDB can
    recompute the token buckets); ``'fast'`` is the bench/production
    path (same pipeline, vectorized hashing).
    """
    from gush_ray.pipelines.queries import _read
    from gush_ray.stages.agg import partial_aggregate
    from gush_ray.stages.dedup import _hash_strings

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({
            "doc_id": b["doc_id"],
            "is_tgt": (b["lang"] == "en"),
            "tok": b["text"].str.split(" "),
        }).explode("tok")
        bucket = (_hash_strings(df["tok"].to_numpy(), hash_fn)
                  % np.uint64(_DSIR_B)).astype(np.int64)
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "bucket": bucket,
                             "t": df["is_tgt"].to_numpy().astype(np.int64)})

    toks = docs.map_batches(explode, batch_format="pandas").materialize()
    counts = partial_aggregate(
        toks, ["bucket"], {"raw": (None, "count"), "tgt": ("t", "sum")},
    ).to_pandas()  # B=256 rows — fixed-size, corpus-independent

    full = pd.DataFrame({"bucket": np.arange(_DSIR_B, dtype=np.int64)})
    counts = full.merge(counts, on="bucket", how="left").fillna(0)
    rc = counts["raw"].to_numpy(np.int64)
    tc = counts["tgt"].to_numpy(np.int64)
    r_tot, t_tot = int(rc.sum()), int(tc.sum())
    num = (tc + 1) * (r_tot + _DSIR_B)
    den = (rc + 1) * (t_tot + _DSIR_B)
    # np.round is half-even == DuckDB round_even; the 1e6 grid collapses
    # numpy-vs-libm ln ulp differences (bigram-LM oracle precedent)
    ratio_micro = np.round(
        np.log(num.astype(np.float64) / den.astype(np.float64)) * 1e6
    ).astype(np.int64)

    def weigh(b: pd.DataFrame) -> pd.DataFrame:
        w = ratio_micro[b["bucket"].to_numpy(np.int64)]
        return pd.DataFrame({"doc_id": b["doc_id"].to_numpy(),
                             "weight_micro": w})

    weights = partial_aggregate(
        toks.map_batches(weigh, batch_format="pandas"),
        ["doc_id"], {"weight_micro": ("weight_micro", "sum")})

    def topk(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "weight_micro": pd.Series(dtype="int64")})
        return b.sort_values(["weight_micro", "doc_id"],
                             ascending=[False, True]).head(_DSIR_TOPN)

    partials = weights.map_batches(topk, batch_format="pandas")
    return partials.repartition(1).map_batches(topk, batch_format="pandas")


SQL_DSIR_SELECT = f"""
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
  FROM documents),
bt AS MATERIALIZED (
  SELECT doc_id, lang,
         ((md5_number_lower(tok) % {_DSIR_B}) + {_DSIR_B}) % {_DSIR_B}
           AS bucket
  FROM toks),
rawc AS (SELECT bucket, count(*) AS c FROM bt GROUP BY bucket),
tgtc AS (SELECT bucket, count(*) AS c FROM bt WHERE lang='en'
         GROUP BY bucket),
tot AS (SELECT (SELECT count(*) FROM bt) AS r,
               (SELECT count(*) FROM bt WHERE lang='en') AS t),
ratio AS MATERIALIZED (
  SELECT g.range AS bucket,
         CAST(round_even(ln(
             ((COALESCE(tc.c, 0) + 1) * (tot.r + {_DSIR_B}))::DOUBLE
           / ((COALESCE(rc.c, 0) + 1) * (tot.t + {_DSIR_B}))::DOUBLE)
           * 1000000.0, 0) AS BIGINT) AS ratio_micro
  FROM range(0, {_DSIR_B}) g
  LEFT JOIN rawc rc ON rc.bucket = g.range
  LEFT JOIN tgtc tc ON tc.bucket = g.range
  CROSS JOIN tot)
SELECT bt.doc_id, CAST(SUM(r.ratio_micro) AS BIGINT) AS weight_micro
FROM bt JOIN ratio r ON r.bucket = bt.bucket
GROUP BY bt.doc_id
ORDER BY weight_micro DESC, doc_id
LIMIT {_DSIR_TOPN}
"""


_BFS_MAX_DEPTH = 12


def q_crawl_depth(sf_dir: str):
    """BFS crawl depth from a deterministic seed set (page_id % 50 == 0)
    over the extracted link graph; (page_id, depth) for every page
    reachable within 12 hops. Oracle: bounded recursive-CTE reachability
    with MIN(depth) — integer-exact, like the components pair."""
    from gush_ray.stages.web import bfs_depth

    edges, pages = _edge_dataset()
    seeds = pages.map_batches(
        lambda b: b[b["page_id"] % 50 == 0][["page_id"]].rename(
            columns={"page_id": "node"}),
        batch_format="pandas")
    out = bfs_depth(edges, seeds, max_depth=_BFS_MAX_DEPTH)
    return out.map_batches(
        lambda b: b.rename(columns={"node": "page_id"}),
        batch_format="pandas")


SQL_CRAWL_DEPTH = f"""
WITH RECURSIVE {_SQL_GRAPH_BASE},
seeds AS (SELECT page_id FROM pages WHERE page_id % 50 = 0),
r AS (
  SELECT page_id AS node, 0 AS d FROM seeds
  UNION
  SELECT e.dst, r.d + 1 FROM r JOIN edges e ON e.src = r.node
  WHERE r.d < {_BFS_MAX_DEPTH}
)
SELECT node AS page_id, CAST(MIN(d) AS BIGINT) AS depth
FROM r GROUP BY node
"""


def q_host_stats(sf_dir: str):
    """Per-host crawl analytics over the linked-pages fixture:
    (host, n_pages, n_links) — the domain-level aggregation every crawl
    pipeline starts with. Link counts reuse the anchor-extraction kernel
    (same closed-quote rule as the SQL regex), so counts stay bit-exact
    on malformed html too."""
    import pyarrow.compute as pc

    from gush_ray.stages.agg import partial_aggregate
    from gush_ray.stages.web import extract_links_table

    def per_page(b: pa.Table) -> pa.Table:
        host = pc.struct_field(
            pc.extract_regex(b["url"], r"^[a-z]+://(?P<h>[^/]+)/"), "h")
        idx_tbl = pa.table({
            "url": pa.array(np.arange(b.num_rows, dtype=np.int64)),
            "html": b["html"],
        })
        links = extract_links_table(idx_tbl)
        parents = links["src_url"].to_numpy(zero_copy_only=False)
        n_links = np.bincount(parents, minlength=b.num_rows)
        return pa.table({"host": host,
                         "n_links": pa.array(n_links.astype(np.int64))})

    ds = _read_links().map_batches(per_page, batch_format="pyarrow",
                                   zero_copy_batch=True)
    return partial_aggregate(ds, ["host"],
                             {"n_pages": (None, "count"),
                              "n_links": ("n_links", "sum")})


SQL_HOST_STATS = f"""
SELECT regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host,
       count(*) AS n_pages,
       CAST(SUM(len(regexp_extract_all(decode(html),
                                       '<a href="([^"<]*)"', 1)))
            AS BIGINT) AS n_links
FROM read_parquet('{_LINK_PARQUET}')
GROUP BY 1
"""


def q_anchor_terms(sf_dir: str):
    """Anchor-text term counts per link target — the classic web-search
    ranking signal: (dst_url, term, n) over every anchor pointing at
    that url. Extraction shares the anchor-pair kernel
    (stages/web.extract_anchors_table); one partial-agg shuffle."""
    from gush_ray.stages.agg import partial_aggregate
    from gush_ray.stages.web import extract_anchors_table

    def pairs(b: pa.Table) -> pa.Table:
        return extract_anchors_table(b.select(["url", "html"]))

    ds = _read_links().map_batches(pairs, batch_format="pyarrow",
                                   zero_copy_batch=True)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({
            "dst_url": b["dst_url"],
            "term": b["anchor_text"].str.split(" "),
        }).explode("term")
        return df

    terms = ds.map_batches(explode, batch_format="pandas")
    return partial_aggregate(terms, ["dst_url", "term"],
                             {"n": (None, "count")})


# '<' excluded from both groups + literal '</a>' terminator: no match
# can cross an anchor boundary, so the engine's per-tail match equals
# this sequential scan on arbitrary bytes (stages/web docstring)
_ANCHOR_RE = '<a href="([^"<]*)">([^<]*)</a>'

SQL_ANCHOR_TERMS = f"""
WITH h AS (SELECT url, decode(html) AS h
           FROM read_parquet('{_LINK_PARQUET}')),
z AS (SELECT url AS src_url,
        unnest(list_zip(regexp_extract_all(h, '{_ANCHOR_RE}', 1),
                        regexp_extract_all(h, '{_ANCHOR_RE}', 2))) AS p
      FROM h),
terms AS (SELECT struct_extract(p, 1) AS dst_url,
                 unnest(string_split(struct_extract(p, 2), ' ')) AS term
          FROM z)
SELECT dst_url, term, count(*) AS n
FROM terms GROUP BY dst_url, term
"""


def q_recrawl_stats(sf_dir: str):
    """Crawl-freshness analytics over the standard pages stream:
    per url — number of distinct crawls (exact (url, ts) replays
    collapse), first/last crawl time, and the mean inter-crawl gap in
    integer µs (-1 for single-crawl urls, keeping the column int64 on
    both sides). Two combiner-shaped shuffles: (url, ts) collapse, then
    the per-url aggregate."""
    import pyarrow.compute as pc

    from gush_ray.datagen import ensure_pages
    from gush_ray.stages.agg import partial_aggregate
    from gush_ray.stages.windows import ts_to_us

    pages_dir = ensure_pages(n_urls=2_000, seed=7)
    ds = rd.read_parquet(pages_dir, columns=["url", "warc_ts"],
                         override_num_blocks=16)

    def to_us(b: pa.Table) -> pa.Table:
        return pa.table({"url": b["url"],
                         "ts_us": ts_to_us(b["warc_ts"])})

    uniq = partial_aggregate(
        ds.map_batches(to_us, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["url", "ts_us"], {"n": (None, "count")})
    per_url = partial_aggregate(
        uniq, ["url"], {"n_crawls": (None, "count"),
                        "first_ts": ("ts_us", "min"),
                        "last_ts": ("ts_us", "max")})

    def gap(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n_crawls"].to_numpy(np.int64)
        first = b["first_ts"].to_numpy(np.int64)
        last = b["last_ts"].to_numpy(np.int64)
        g = np.where(n > 1, (last - first) // np.maximum(n - 1, 1), -1)
        return b.assign(gap_us=g.astype(np.int64))

    return per_url.map_batches(gap, batch_format="pandas")


def _sql_recrawl_stats() -> str:
    from gush_ray.pipelines.queries_extra import PAGES_FIXTURE

    return f"""
WITH uniq AS (
  SELECT url, epoch_us(warc_ts) AS ts
  FROM read_parquet('{PAGES_FIXTURE}/epoch=*/part-*.parquet',
                    hive_partitioning=1)
  GROUP BY ALL
)
SELECT url, count(*) AS n_crawls,
       min(ts) AS first_ts, max(ts) AS last_ts,
       CASE WHEN count(*) > 1
            THEN (max(ts) - min(ts)) // (count(*) - 1)
            ELSE -1 END AS gap_us
FROM uniq GROUP BY url
"""


def q_streaming_frontier_canon(sf_dir: str):
    """Streaming frontier with URL canonicalization active
    (FrontierSpec(canonicalize=True)) over a stream whose anchor
    targets carry surface variants (host case / default port /
    trailing slash): every variant of one page collapses to ONE
    frontier discovery. Composes the two verified kernels — anchor
    extraction and the 5-rule canonicalizer — inside the CEP loop;
    P=1 for the SQL-expressible watermark (q_pages_flagship
    rationale)."""
    import shutil
    import uuid

    from gush_ray.datagen import ensure_frontier_messy_pages
    from gush_ray.pipelines.epoch_loop import StreamingJob
    from gush_ray.state.frontier import FrontierSpec

    pages_dir = ensure_frontier_messy_pages()
    out_dir = f"/tmp/gush_ray_q/{uuid.uuid4().hex}"
    job = StreamingJob(pages_dir, out_dir, run_id=uuid.uuid4().hex,
                       num_partitions=1,
                       frontier_spec=FrontierSpec(canonicalize=True))
    job.run()
    fr = job.read_output("frontier")
    job.kill_actors()
    shutil.rmtree(out_dir, ignore_errors=True)
    return fr.sort_values(["url"]).reset_index(drop=True)


def _sql_streaming_frontier_canon() -> str:
    from gush_ray.datagen import FRONTIER_MESSY_FIXTURE
    from gush_ray.pipelines.queries_extra import _sql_streaming_frontier

    return _sql_streaming_frontier(
        fixture=FRONTIER_MESSY_FIXTURE,
        canon_cte=_sql_canon_cte("rawlinks", "dst_url", prefix="cn"),
        canon_src_cte=_sql_canon_cte("rawlinks", "src_url", prefix="cs"))




# ---------------------------------------------------------------------------
# host-level PageRank (crawl prioritization: contract the page graph to
# hosts, KEEPING multiplicity — k page-links host A → host B are k
# multi-edges, i.e. an edge of weight k — then run the integer-exact
# PageRank over host nodes; at 10^12 pages the host graph is ~10^4x
# smaller, which is why real crawl schedulers rank hosts, not pages)
# ---------------------------------------------------------------------------

def q_host_pagerank(sf_dir: str):
    """Integer-exact PageRank over the host-contracted link graph,
    8 iterations, micro-rank units; nodes = distinct hosts of the page
    set, edges = internal page links mapped to (src_host, dst_host)
    with multiplicity kept (weight == multi-edge count both sides)."""
    from gush_ray.stages.agg import partial_aggregate
    from gush_ray.stages.web import host_of_urls, pagerank

    edges, pages = _edge_dataset(node_field="url")

    def to_hosts(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "src": host_of_urls(pa.array(b["src"])).to_pylist(),
            "dst": host_of_urls(pa.array(b["dst"])).to_pylist()})

    hedges = edges.map_batches(to_hosts, batch_format="pandas")
    hosts = partial_aggregate(
        pages.map_batches(
            lambda b: pa.table({"host": host_of_urls(b["url"])}),
            batch_format="pyarrow"),
        ["host"], {"n": (None, "count")},
    ).map_batches(lambda b: b[["host"]], batch_format="pandas")         .repartition(4)
    pr = pagerank(hedges, hosts, iters=_PR_ITERS, scale=_PR_SCALE,
                  node_col="host")
    return pr


def _sql_host_pagerank() -> str:
    host_re = "'^[a-z]+://([^/]+)'"
    ctes = [f"""
hosts AS MATERIALIZED (
  SELECT DISTINCT regexp_extract(url, {host_re}, 1) AS host FROM pages),
nn AS MATERIALIZED (SELECT count(*) AS n FROM hosts),
hedges AS MATERIALIZED (
  SELECT regexp_extract(ps.url, {host_re}, 1) AS src,
         regexp_extract(pd.url, {host_re}, 1) AS dst
  FROM edges e
  JOIN pages ps ON ps.page_id = e.src
  JOIN pages pd ON pd.page_id = e.dst),
hdeg AS MATERIALIZED (SELECT src, count(*) AS d FROM hedges GROUP BY src),
hpr0 AS (SELECT host, {_PR_SCALE} // nn.n AS r FROM hosts, nn)"""]
    for k in range(1, _PR_ITERS + 1):
        ctes.append(f"""
hpr{k} AS MATERIALIZED (
  SELECT n.host AS host,
         (15 * {_PR_SCALE}::BIGINT) // (100 * nn.n)
           + (85 * COALESCE(s.c, 0)) // 100 AS r
  FROM hosts n CROSS JOIN nn LEFT JOIN (
    SELECT e.dst AS dst, SUM(p.r // d.d) AS c
    FROM hpr{k-1} p
    JOIN hedges e ON e.src = p.host
    JOIN hdeg d ON d.src = e.src
    GROUP BY e.dst) s ON s.dst = n.host)""")
    chain = ",".join(ctes)
    return f"""
WITH {_SQL_GRAPH_BASE},
{chain}
SELECT host, CAST(r AS BIGINT) AS rank_micro FROM hpr{_PR_ITERS}
"""


SQL_HOST_PAGERANK = _sql_host_pagerank()


# ---------------------------------------------------------------------------
# per-node triangle counts (community structure / spam-farm signal)
# ---------------------------------------------------------------------------

def q_triangle_count(sf_dir: str):
    """Per-node triangle participation over the undirected simple graph
    of the page link fixture (stages/web.triangle_counts)."""
    from gush_ray.stages.web import triangle_counts

    edges, _pages = _edge_dataset()
    out = triangle_counts(edges)
    return out.map_batches(
        lambda b: b.rename(columns={"node": "page_id"}),
        batch_format="pandas")


SQL_TRIANGLE_COUNT = f"""
WITH {_SQL_GRAPH_BASE},
ue AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM edges WHERE src <> dst),
tri AS MATERIALIZED (
  SELECT a.u AS x, a.v AS y, b.v AS z
  FROM ue a
  JOIN ue b ON b.u = a.v
  JOIN ue c ON c.u = a.u AND c.v = b.v),
n3 AS (SELECT unnest([x, y, z]) AS page_id FROM tri)
SELECT page_id, count(*) AS n_tri FROM n3 GROUP BY page_id
"""


# ---------------------------------------------------------------------------
# per-host boilerplate removal (CCNet/C4 cleaning over real \n lines)
# ---------------------------------------------------------------------------

from gush_ray.datagen import BOILER_FIXTURE, ensure_boiler_fixture

_BOILER_PARQUET = f"{BOILER_FIXTURE}/pages.parquet"


def q_boilerplate(sf_dir: str):
    """Per-host line-frequency boilerplate removal over the boiler
    fixture (stages/corpus.boilerplate_removal, min_docs=3):
    (doc_id, text, n_kept) with boilerplate lines stripped; docs left
    empty drop out."""
    from gush_ray.stages.corpus import boilerplate_removal

    ensure_boiler_fixture()
    ensure_redirect_fixture()
    ds = rd.read_parquet(_BOILER_PARQUET, override_num_blocks=8)
    return boilerplate_removal(ds, min_docs=3)


SQL_BOILERPLATE = f"""
WITH d AS (SELECT doc_id, host, text
           FROM read_parquet('{_BOILER_PARQUET}')),
l AS (SELECT doc_id, host,
             unnest(string_split(text, chr(10))) AS line,
             unnest(range(1, len(string_split(text, chr(10))) + 1)) AS i
      FROM d),
freq AS (SELECT host, line, count(DISTINCT doc_id) AS nd
         FROM l GROUP BY host, line),
kept AS (SELECT l.doc_id, l.line, l.i
         FROM l JOIN freq ON freq.host = l.host AND freq.line = l.line
         WHERE freq.nd < 3)
SELECT doc_id,
       string_agg(line, chr(10) ORDER BY i) AS text,
       count(*) AS n_kept
FROM kept GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# redirect-chain resolution (HTTP 3xx pointer chasing, log-round doubling)
# ---------------------------------------------------------------------------

from gush_ray.datagen import REDIRECT_FIXTURE, ensure_redirect_fixture

_REDIR_PARQUET = f"{REDIRECT_FIXTURE}/redirects.parquet"
_REDIR_ROUNDS = 6  # resolves chains up to 2^6 = 64 hops


def q_redirect_resolve(sf_dir: str):
    """Pointer-doubling redirect resolution over the redirect fixture
    (stages/web.resolve_redirects): (src_url, final_url, n_hops,
    resolved); cycles and >64-hop chains are flagged, never looped on."""
    from gush_ray.stages.web import resolve_redirects

    ensure_redirect_fixture()
    ds = rd.read_parquet(_REDIR_PARQUET, override_num_blocks=8)
    return resolve_redirects(ds, max_rounds=_REDIR_ROUNDS)


SQL_REDIRECT_RESOLVE = f"""
WITH RECURSIVE r AS (SELECT src, dst FROM
                     read_parquet('{_REDIR_PARQUET}')),
walk(src, cur, hops) AS (
  SELECT src, dst, 1 FROM r
  UNION ALL
  SELECT w.src, r.dst, w.hops + 1
  FROM walk w JOIN r ON r.src = w.cur
  WHERE w.hops < {2 ** _REDIR_ROUNDS}
),
term AS (
  SELECT w.src, w.cur, w.hops FROM walk w
  WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.src = w.cur)
)
SELECT r0.src AS src_url,
       coalesce(t.cur, '') AS final_url,
       CAST(coalesce(t.hops, -1) AS BIGINT) AS n_hops,
       t.src IS NOT NULL AS resolved
FROM (SELECT DISTINCT src FROM r) r0
LEFT JOIN term t ON t.src = r0.src
"""


# ---------------------------------------------------------------------------
# crawl politeness schedule (per-host round-robin fetch slots)
# ---------------------------------------------------------------------------

_CRAWL_RATE = 4  # fetches per host per round


def q_crawl_schedule(sf_dir: str):
    """Politeness scheduling: assign every page a fetch round such that
    no host gets more than ``_CRAWL_RATE`` fetches per round —
    deterministic per-host round-robin (rank urls within host by url,
    round = rank // rate). One host-keyed shuffle; the per-partition
    kernel is a vectorized sort + cumcount."""
    from gush_ray.stages.shuffle import partition_map
    from gush_ray.stages.web import host_of_urls

    ensure_link_fixture()
    pages = _read_links()

    def hostify(b: pa.Table) -> pa.Table:
        return pa.table({"url": b["url"],
                         "host": host_of_urls(b["url"])})

    withhost = pages.map_batches(hostify, batch_format="pyarrow",
                                 zero_copy_batch=True)

    def schedule(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["host", "url"], kind="mergesort")
        rank = df.groupby("host", sort=False).cumcount()
        return pd.DataFrame({
            "url": df["url"].to_numpy(),
            "host": df["host"].to_numpy(),
            "fetch_round": (rank // _CRAWL_RATE).to_numpy()
            .astype("int64"),
        })

    return partition_map(withhost, "host", schedule, 8)


SQL_CRAWL_SCHEDULE = f"""
WITH p AS (
  SELECT url, regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host
  FROM read_parquet('{_LINK_PARQUET}'))
SELECT url, host,
       CAST((row_number() OVER (PARTITION BY host ORDER BY url) - 1)
            // {_CRAWL_RATE} AS BIGINT) AS fetch_round
FROM p
"""


# ---------------------------------------------------------------------------
# personalized PageRank (seed-biased teleport — frontier prioritization
# around trusted roots)
# ---------------------------------------------------------------------------

_PPR_SEEDS = tuple(range(0, 900, 90))  # 10 deterministic seed pages


def q_personalized_pagerank(sf_dir: str):
    """Integer-exact PERSONALIZED PageRank: teleport mass restricted to
    the 10-page seed set (stages/web.pagerank(seeds=...)); same
    iteration shape as q_pagerank, bit-identical to the seed-cased SQL
    CTE chain."""
    from gush_ray.stages.web import pagerank

    edges, pages = _edge_dataset()
    nodes = pages.map_batches(lambda b: b[["page_id"]].rename(
        columns={"page_id": "node"}), batch_format="pandas")
    pr = pagerank(edges, nodes, iters=_PR_ITERS, scale=_PR_SCALE,
                  seeds=_PPR_SEEDS)
    return pr.map_batches(
        lambda b: b.rename(columns={"node": "page_id"}),
        batch_format="pandas")


def _sql_personalized_pagerank() -> str:
    n_seeds = len(_PPR_SEEDS)
    seed_list = ", ".join(str(s) for s in _PPR_SEEDS)
    r0 = _PR_SCALE // n_seeds
    base = (15 * _PR_SCALE) // (100 * n_seeds)
    ctes = [f"""
ppr0 AS (SELECT page_id,
                CASE WHEN page_id IN ({seed_list})
                     THEN {r0}::BIGINT ELSE 0::BIGINT END AS r
         FROM pages)"""]
    for k in range(1, _PR_ITERS + 1):
        ctes.append(f"""
ppr{k} AS MATERIALIZED (
  SELECT n.page_id AS page_id,
         CASE WHEN n.page_id IN ({seed_list})
              THEN {base}::BIGINT ELSE 0::BIGINT END
           + (85 * COALESCE(s.c, 0)) // 100 AS r
  FROM pages n LEFT JOIN (
    SELECT e.dst AS dst, SUM(p.r // d.d) AS c
    FROM ppr{k-1} p
    JOIN edges e ON e.src = p.page_id
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst) s ON s.dst = n.page_id)""")
    chain = ",".join(ctes)
    return f"""
WITH {_SQL_GRAPH_BASE},
deg AS MATERIALIZED (SELECT src, count(*) AS d FROM edges GROUP BY src),
{chain}
SELECT page_id, CAST(r AS BIGINT) AS rank_micro FROM ppr{_PR_ITERS}
"""


SQL_PERSONALIZED_PAGERANK = _sql_personalized_pagerank()


# ---------------------------------------------------------------------------
# integer-exact distributed linear probe (quality regression)
# ---------------------------------------------------------------------------

def q_quality_probe(sf_dir: str):
    """Linear probe of a quality signal over the documents corpus:
    fit ``distinct_tokens ~ 1 + tokens + chars`` by exact integer least
    squares (stages/linear.linear_probe — per-batch integer sufficient
    statistics, one fixed-size gather, Cramer in Python ints). The SQL
    twin replays the identical HUGEINT determinant arithmetic."""
    from gush_ray.stages.linear import linear_probe

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def feats(b: pd.DataFrame) -> pd.DataFrame:
        txt = b["text"].fillna("")
        sp = txt.str.split(" ")
        return pd.DataFrame({
            "f1": sp.str.len().to_numpy("int64"),
            "f2": txt.str.len().to_numpy("int64"),
            "y": sp.map(lambda w: len(set(w))).to_numpy("int64"),
        })

    return linear_probe(ds.map_batches(feats, batch_format="pandas"),
                        ["f1", "f2"], "y")


SQL_QUALITY_PROBE = """
WITH f AS (
  SELECT len(string_split(text, ' ')) AS f1,
         length(text) AS f2,
         len(list_distinct(string_split(text, ' '))) AS y
  FROM documents),
s AS (SELECT
    CAST(count(*) AS HUGEINT) AS s00,
    SUM(CAST(f1 AS HUGEINT)) AS s01,
    SUM(CAST(f2 AS HUGEINT)) AS s02,
    SUM(CAST(f1 AS HUGEINT) * f1) AS s11,
    SUM(CAST(f1 AS HUGEINT) * f2) AS s12,
    SUM(CAST(f2 AS HUGEINT) * f2) AS s22,
    SUM(CAST(y AS HUGEINT)) AS t0,
    SUM(CAST(f1 AS HUGEINT) * y) AS t1,
    SUM(CAST(f2 AS HUGEINT) * y) AS t2,
    count(*) AS n
  FROM f),
d AS (SELECT *,
    (s00*(s11*s22 - s12*s12) - s01*(s01*s22 - s12*s02)
       + s02*(s01*s12 - s11*s02)) AS det,
    (t0*(s11*s22 - s12*s12) - s01*(t1*s22 - s12*t2)
       + s02*(t1*s12 - s11*t2)) AS det0,
    (s00*(t1*s22 - s12*t2) - t0*(s01*s22 - s12*s02)
       + s02*(s01*t2 - t1*s02)) AS det1,
    (s00*(s11*t2 - t1*s12) - s01*(s01*t2 - t1*s02)
       + t0*(s01*s12 - s11*s02)) AS det2
  FROM s)
SELECT CAST(n AS BIGINT) AS n_rows,
       CAST(det AS VARCHAR) AS det,
       CAST((det0 * 1000000) // det AS BIGINT) AS b0_micro,
       CAST((det1 * 1000000) // det AS BIGINT) AS b1_micro,
       CAST((det2 * 1000000) // det AS BIGINT) AS b2_micro
FROM d
"""


# ---------------------------------------------------------------------------
# crawl hygiene: nofollow-aware link extraction + meta-robots noindex
# ---------------------------------------------------------------------------

def q_nofollow_links(sf_dir: str):
    """(src_url, dst_url) edges EXCLUDING rel="nofollow" anchors
    (stages/web.extract_links_nofollow_table) — the edge list a ranking
    pipeline is allowed to pass mass through."""
    from gush_ray.stages.web import extract_links_nofollow_table

    return _read_links().map_batches(
        lambda b: extract_links_nofollow_table(b.select(["url", "html"])),
        batch_format="pyarrow", zero_copy_batch=True)


# two parallel regexp_extract_all calls over the SAME pattern unnest in
# lockstep (DuckDB aligns parallel list unnests positionally), giving
# (href, attrs) pairs; the filter drops nofollow attrs
SQL_NOFOLLOW_LINKS = f"""
WITH pairs AS (
  SELECT url AS src_url,
         unnest(regexp_extract_all(decode(html),
                '<a href="([^"<]*)"([^>]*)', 1)) AS dst_url,
         unnest(regexp_extract_all(decode(html),
                '<a href="([^"<]*)"([^>]*)', 2)) AS attrs
  FROM read_parquet('{_LINK_PARQUET}'))
SELECT src_url, dst_url FROM pairs
WHERE NOT contains(attrs, 'rel="nofollow"')
"""


def q_noindex_filter(sf_dir: str):
    """Meta-robots noindex filter: the per-page indexability verdict
    (page_id, indexable) over the link fixture
    (stages/web.noindex_mask)."""
    import pyarrow.compute as pc

    from gush_ray.stages.web import noindex_mask

    def verdict(b: pa.Table) -> pa.Table:
        return pa.table({
            "page_id": b["page_id"],
            "indexable": pc.invert(noindex_mask(b["html"])),
        })

    return _read_links().map_batches(verdict, batch_format="pyarrow",
                                     zero_copy_batch=True)


SQL_NOINDEX_FILTER = f"""
SELECT page_id,
       NOT regexp_matches(decode(html),
           '<meta name="robots" content="[^"]*noindex') AS indexable
FROM read_parquet('{_LINK_PARQUET}')
"""


def ensure_web_fixtures() -> None:
    from gush_ray.datagen import ensure_frontier_messy_pages

    ensure_link_fixture()
    ensure_url_fixture()
    ensure_frontier_messy_pages()
    ensure_boiler_fixture()
    ensure_redirect_fixture()


WEB_QUERIES = {
    "link_extract": (q_link_extract, SQL_LINK_EXTRACT),
    "pagerank": (q_pagerank, SQL_PAGERANK),
    "incremental_pagerank": (q_incremental_pagerank,
                             SQL_INCREMENTAL_PAGERANK),
    "link_components": (q_link_components, SQL_LINK_COMPONENTS),
    "url_canonical_dedup": (q_url_canonical_dedup,
                            SQL_URL_CANONICAL_DEDUP),
    "dsir_select": (q_dsir_select, SQL_DSIR_SELECT),
    "host_stats": (q_host_stats, SQL_HOST_STATS),
    "crawl_depth": (q_crawl_depth, SQL_CRAWL_DEPTH),
    "hits": (q_hits, SQL_HITS),
    "recrawl_stats": (q_recrawl_stats, _sql_recrawl_stats()),
    "anchor_terms": (q_anchor_terms, SQL_ANCHOR_TERMS),
    "host_pagerank": (q_host_pagerank, SQL_HOST_PAGERANK),
    "triangle_count": (q_triangle_count, SQL_TRIANGLE_COUNT),
    "boilerplate_removal": (q_boilerplate, SQL_BOILERPLATE),
    "redirect_resolve": (q_redirect_resolve, SQL_REDIRECT_RESOLVE),
    "crawl_schedule": (q_crawl_schedule, SQL_CRAWL_SCHEDULE),
    "personalized_pagerank": (q_personalized_pagerank,
                              SQL_PERSONALIZED_PAGERANK),
    "quality_probe": (q_quality_probe, SQL_QUALITY_PROBE),
    "nofollow_links": (q_nofollow_links, SQL_NOFOLLOW_LINKS),
    "noindex_filter": (q_noindex_filter, SQL_NOINDEX_FILTER),
    # import-order note: building this SQL imports queries_extra at
    # module-load time; queries_extra only imports THIS module inside
    # functions, so the load order is acyclic either way
    "streaming_frontier_canon": (q_streaming_frontier_canon,
                                 _sql_streaming_frontier_canon()),
}
