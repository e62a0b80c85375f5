"""Web-graph and URL-normalization operators over Common-Crawl-style
pages: anchor (href) extraction, URL canonicalization, integer-exact
PageRank and link-graph connected components.

All operators are Arrow-vectorized per batch and oracle-reproducible:

* **link extraction** — ``<a href="...">`` targets pulled out of the
  raw html bytes with one vectorized split (no per-row regex loop);
  the DuckDB oracle recomputes the identical edge list with
  ``regexp_extract_all(decode(html), ...)``.
* **URL canonicalization** — a fixed, documented rule set (lowercase
  scheme+host, strip default port, drop fragment, sort query params,
  normalize the path's trailing slash) applied with pyarrow compute
  kernels end to end (``extract_regex`` → list ops → ``binary_join``);
  every rule is expressible in DuckDB string/list functions, so
  canonical-URL dedup is hash-verifiable.
* **PageRank** — damping and rank arithmetic in scaled int64
  ("micro-rank" units, scale 1e12) with floor division, so the
  distributed fit is bit-identical to an unrolled SQL CTE chain: no
  float accumulation order to diverge. Dangling-node mass is dropped
  (documented; both sides identical). The iteration is hash-join +
  partial-aggregate shaped — ranks and edges never land on the driver,
  only the node count does.

Reference parity note: gush (the reference, 644-LoC Scala CDC engine)
has no web-graph operators; these belong to the graft brief's
LLM-training-data surface (SURVEY.md §2 "beyond-reference" families).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# link extraction
# ---------------------------------------------------------------------------

_A_HREF = '<a href="'


def _html_as_string(html: pa.ChunkedArray | pa.Array) -> pa.Array:
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    try:
        return html.cast(pa.string())
    except pa.ArrowInvalid:  # non-utf8 bytes: row-wise cold path
        py = [
            v.decode("utf-8", errors="replace") if v is not None else None
            for v in html.to_pylist()
        ]
        return pa.array(py, type=pa.string())


def _anchor_tails(tbl: pa.Table, html_col: str,
                  url_col: str) -> tuple[pa.Array, pa.Array]:
    """Shared extraction preamble: split every page on the
    ``<a href="`` prefix and return (tails, srcs) — one tail per anchor
    candidate (the text following the prefix, up to the next prefix),
    paired with its page's ``url_col`` value. Null html and the
    before-first-anchor text contribute nothing."""
    as_str = _html_as_string(tbl[html_col])
    parts = pc.split_pattern(as_str, _A_HREF)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = pc.list_flatten(parts)
    parents = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    # drop the first element of every list (the text before the first
    # anchor, or the whole page when there is none)
    offsets = parts.offsets.to_numpy(zero_copy_only=False)
    keep = np.ones(len(flat), dtype=bool)
    starts = offsets[:-1][offsets[:-1] < len(flat)]
    keep[starts] = False
    keep_idx = np.nonzero(keep)[0]
    tails = flat.take(pa.array(keep_idx))
    srcs = tbl[url_col].combine_chunks().take(pa.array(parents[keep_idx]))
    return tails, srcs


def extract_links_table(tbl: pa.Table, html_col: str = "html",
                        url_col: str = "url") -> pa.Table:
    """(url, html) rows → exploded (src_url, dst_url) edge rows.

    Vectorized: one ``split_pattern`` on the anchor-prefix, one flatten,
    one anchored regex per tail. Duplicate hrefs are kept (a page
    linking twice contributes two edges — PageRank treats the
    multi-edge as double weight, same as the SQL oracle's
    ``regexp_extract_all``). Rows with null html contribute no edges.

    The href group is ``[^"<]*`` — no quote, no '<' — in BOTH the
    engine and the SQL twin ``<a href="([^"<]*)"``. The '<' exclusion
    is what makes the independent per-tail match equal to the SQL's
    sequential non-overlapping scan on ARBITRARY bytes: a match can
    never extend past the next anchor prefix (which a plain ``[^"]*``
    can, by swallowing the next anchor's opening quote when a
    truncated href has no closing quote of its own).
    """
    tails, srcs = _anchor_tails(tbl, html_col, url_col)
    m = pc.extract_regex(tails, r'^(?P<d>[^"<]*)"')
    ok = pc.is_valid(m)
    return pa.table({
        "src_url": srcs.filter(ok),
        "dst_url": pc.struct_field(m, "d").filter(ok),
    })


def extract_links_batch(batch: pa.Table) -> pa.Table:
    """map_batches stage form of :func:`extract_links_table`."""
    return extract_links_table(batch)


def extract_anchors_table(tbl: pa.Table, html_col: str = "html",
                          url_col: str = "url") -> pa.Table:
    """(url, html) rows → exploded (src_url, dst_url, anchor_text)
    rows — link targets WITH their anchor text (the web-search ranking
    signal). Same split as :func:`extract_links_table`, then one
    anchored regex per tail requiring the full ``DST">TEXT</a>`` shape;
    an incomplete tail (truncated page, unclosed anchor) is dropped.

    Exactly mirrors the SQL twin
    ``regexp_extract_all(h, '<a href="([^"<]*)">([^<]*)</a>', k)``:
    with '<' excluded from both groups and a literal ``</a>``
    terminator, no match can cross an anchor boundary, so the per-tail
    independent match equals the sequential scan on arbitrary bytes
    (an unclosed anchor followed by another anchor yields only the
    CLOSED one, both sides).
    """
    tails, srcs = _anchor_tails(tbl, html_col, url_col)
    m = pc.extract_regex(tails, r'^(?P<d>[^"<]*)">(?P<t>[^<]*)</a>')
    ok = pc.is_valid(m)
    return pa.table({
        "src_url": srcs.filter(ok),
        "dst_url": pc.struct_field(m, "d").filter(ok),
        "anchor_text": pc.struct_field(m, "t").filter(ok),
    })


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

# one regex, shared semantics with the SQL oracle (positional groups
# there, named groups here — RE2 both sides)
_URL_RE = (
    r"^(?P<scheme>[a-zA-Z][a-zA-Z0-9+.-]*)://(?P<auth>[^/?#]+)"
    r"(?P<path>[^?#]*)(?P<query>\?[^#]*)?(?P<frag>#.*)?$"
)

_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def _sorted_query(query: pa.Array) -> pa.Array:
    """'?b=2&a=1' → '?a=1&b=2' (missing/empty queries → '').

    Vectorized: strip '?', split on '&', lexsort the flattened params by
    (row, value), rebuild the list array on the unchanged offsets, and
    ``binary_join`` back — no per-row Python. ``extract_regex`` yields
    ``''`` (not null) for an unmatched optional group, so '' means "no
    query"; a bare '?' canonicalizes to '?' (kept, both sides).
    """
    has_q = pc.not_equal(pc.fill_null(query, ""), "")
    bare = pc.utf8_slice_codeunits(pc.fill_null(query, "?"), 1)
    parts = pc.split_pattern(bare, "&")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = parts.values.to_numpy(zero_copy_only=False)
    parents = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    order = np.lexsort((flat, parents))
    sorted_list = pa.ListArray.from_arrays(parts.offsets,
                                           pa.array(flat[order],
                                                    type=pa.string()))
    joined = pc.binary_join(sorted_list, "&")
    rebuilt = pc.binary_join_element_wise("?", joined, "")
    return pc.if_else(has_q, rebuilt, "")


def canonicalize_urls(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Apply the canonical-URL rule set. Rules (and the SQL mirror):

    1. scheme and host lowercased
    2. default port stripped (``:80`` for http, ``:443`` for https)
    3. fragment dropped
    4. query parameters sorted bytewise (separator ``&``; '?' kept only
       when a query exists)
    5. empty path → ``/``; otherwise one trailing ``/`` stripped unless
       the path is exactly ``/``

    URLs that don't match ``scheme://authority...`` pass through
    unchanged (null-safe).
    """
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    m = pc.extract_regex(urls, _URL_RE)
    matched = pc.is_valid(m)
    scheme = pc.utf8_lower(pc.struct_field(m, "scheme"))
    auth = pc.struct_field(m, "auth")
    path = pc.struct_field(m, "path")
    query = pc.struct_field(m, "query")

    # authority → host[:port]; host lowercased, default port stripped
    # (an unmatched optional group extracts as '', so '' == "no port")
    hp = pc.extract_regex(auth, r"^(?P<h>[^:]*)(?P<p>:.*)?$")
    host = pc.utf8_lower(pc.struct_field(hp, "h"))
    port_raw = pc.struct_field(hp, "p")
    is_default = pc.or_(
        pc.and_(pc.equal(scheme, "http"), pc.equal(port_raw, ":80")),
        pc.and_(pc.equal(scheme, "https"), pc.equal(port_raw, ":443")),
    )
    port = pc.if_else(is_default, "", port_raw)

    # path normalization: '' → '/', '/' stays, else one trailing '/'
    # stripped (regex replace — same expression as the SQL mirror)
    empty_path = pc.equal(path, "")
    is_root = pc.equal(path, "/")
    stripped = pc.replace_substring_regex(path, "/$", "",
                                          max_replacements=1)
    norm_path = pc.if_else(
        empty_path, "/", pc.if_else(is_root, path, stripped))

    q = _sorted_query(query)
    rebuilt = pc.binary_join_element_wise(
        scheme, "://", host, port, norm_path, q, "")
    return pc.if_else(matched, rebuilt, urls)


def canonicalize_batch(batch: pa.Table, url_col: str = "raw_url",
                       out_col: str = "canon_url") -> pa.Table:
    """map_batches stage: add the canonical form of ``url_col``."""
    return batch.append_column(out_col, canonicalize_urls(batch[url_col]))


# ---------------------------------------------------------------------------
# PageRank (integer-exact, distributed join/agg shape)
# ---------------------------------------------------------------------------

PR_SCALE = 10**12  # micro-rank units: 1.0 of rank mass == PR_SCALE


def pagerank(edges, nodes, *, iters: int = 8, scale: int = PR_SCALE,
             damp_num: int = 85, damp_den: int = 100,
             node_col: str = "node", src_col: str = "src",
             dst_col: str = "dst", seeds=None, init_ranks=None):
    """Integer-exact PageRank over a Dataset edge list.

    ``r0(v) = scale // N``;
    ``r_{k+1}(v) = (den-num)*scale // (den*N)
                   + num * Σ_{(u,v)∈E} (r_k(u) // outdeg(u)) // den``.

    ``seeds`` (a small collection of node ids) switches to PERSONALIZED
    PageRank: the teleport mass lands only on the seed set —
    ``r0(v) = scale // |S|`` for v ∈ S else 0, and the per-iteration
    base term is likewise seed-only — the seed-biased relevance score a
    crawler uses to prioritize its frontier around trusted roots.
    Seeds are broadcast by closure (a curated seed list is small BY
    DEFINITION; a huge teleport vector would need a join instead).

    All arithmetic is int64 floor division on positive values, so the
    result is bit-identical to the unrolled SQL CTE chain regardless of
    batch boundaries or summation order. Mass entering dangling nodes
    (outdeg 0) is dropped, same both sides.

    Scale shape: outdeg is a partial-agg shuffle; each iteration is one
    hash join (edges×ranks on src) + one partial-agg (sum by dst) + one
    left join back to nodes — ranks and edges stay distributed; the
    driver holds only the node count. ``ranks`` is materialized per
    iteration (the checkpoint a 10^12-edge run would persist to parquet
    between iterations; see the resumable-output note in SURVEY §7).
    """
    from gush_ray.stages.agg import partial_aggregate
    from gush_ray.stages.joins import hash_join

    n_nodes = int(nodes.count())
    if n_nodes == 0:
        raise ValueError("pagerank: empty node set")
    seed_set = frozenset(seeds) if seeds is not None else None
    if seed_set is not None and not seed_set:
        raise ValueError("pagerank: empty seed set")
    n_base = len(seed_set) if seed_set is not None else n_nodes
    r0 = scale // n_base
    base = ((damp_den - damp_num) * scale) // (damp_den * n_base)

    # trailing repartitions after partial_aggregate are load-bearing:
    # map_groups emits schema-LESS empty blocks for empty partitions and
    # the Acero hash join rejects a schemaless side (same gotcha as
    # dedup.duplicate_clusters_distributed)
    deg = partial_aggregate(
        edges, [src_col], {"outdeg": (None, "count")}).repartition(4)
    # repartition before materialize: the join's schemaless empty blocks
    # would poison every iteration's join against ranks (whose keys
    # include isolated nodes absent from edges) — see resolve_redirects
    edges_deg = hash_join(edges, deg, on=src_col).repartition(8) \
        .materialize()

    def init(b: pd.DataFrame) -> pd.DataFrame:
        v = b[node_col]
        r = (np.full(len(b), r0, dtype=np.int64) if seed_set is None
             else np.where(v.isin(seed_set), r0, 0).astype(np.int64))
        return pd.DataFrame({src_col: v.to_numpy(), "r": r})

    if init_ranks is not None:
        # WARM START (incremental recomputation): continue iterating
        # from a previous run's rank vector instead of uniform — the
        # evolving-graph pattern (crawl grows, ranks keep converging
        # from where they were; same iterations thereafter, so the
        # result stays bit-replayable by the SQL chain with a warm pr0)
        def warm(b: pd.DataFrame) -> pd.DataFrame:
            cols = {node_col: src_col, "rank_micro": "r"}
            out_b = b.rename(columns={k: v for k, v in cols.items()
                                      if k in b.columns})
            return pd.DataFrame({
                src_col: out_b[src_col].to_numpy(),
                "r": out_b["r"].to_numpy(np.int64)})

        ranks = init_ranks.map_batches(
            warm, batch_format="pandas").materialize()
    else:
        ranks = nodes.map_batches(init,
                                  batch_format="pandas").materialize()

    def contrib(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({dst_col: pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        c = b["r"].to_numpy(np.int64) // b["outdeg"].to_numpy(np.int64)
        return pd.DataFrame({dst_col: b[dst_col].to_numpy(), "c": c})

    for _ in range(iters):
        joined = hash_join(edges_deg, ranks, on=src_col)
        sums = partial_aggregate(
            joined.map_batches(contrib, batch_format="pandas"),
            [dst_col], {"c": ("c", "sum")},
        ).repartition(4)

        def renamed(b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:
                return pd.DataFrame({src_col: pd.Series(dtype="int64"),
                                     "c": pd.Series(dtype="int64")})
            return b.rename(columns={dst_col: src_col})

        def next_rank(b: pd.DataFrame) -> pd.DataFrame:
            c = b["c"].fillna(0).to_numpy(np.int64)
            b_arr = (base if seed_set is None
                     else np.where(b[src_col].isin(seed_set),
                                   base, 0).astype(np.int64))
            r = b_arr + (damp_num * c) // damp_den
            return pd.DataFrame({src_col: b[src_col].to_numpy(),
                                 "r": r.astype(np.int64)})

        ranks = hash_join(
            ranks.map_batches(lambda b: b[[src_col]], batch_format="pandas"),
            sums.map_batches(renamed, batch_format="pandas"),
            on=src_col, join_type="left_outer",
        ).map_batches(next_rank, batch_format="pandas").materialize()

    def out(b: pd.DataFrame) -> pd.DataFrame:
        return b.rename(columns={src_col: node_col, "r": "rank_micro"})

    return ranks.map_batches(out, batch_format="pandas")


def bfs_depth(edges, seeds, *, max_depth: int = 12,
              src_col: str = "src", dst_col: str = "dst",
              node_col: str = "node"):
    """Unit-weight BFS depth from a seed set over a Dataset edge list —
    crawl depth: how many link hops from the seeds each page sits.

    Returns (node, depth) for every node REACHED within ``max_depth``
    hops (seeds at depth 0); unreached nodes are absent, exactly like
    the bounded recursive-CTE twin. Distributed Bellman-Ford with unit
    weights: each round is one hash join (edges×frontier dists on src)
    + one min partial-agg — only the dist table and edges move, the
    driver holds two scalars for the convergence check. Rounds stop at
    the fixpoint or ``max_depth``, whichever first (identical results:
    BFS relaxation is monotone).
    """
    from gush_ray.stages.agg import partial_aggregate
    from gush_ray.stages.joins import hash_join

    def init(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({src_col: b[node_col].to_numpy(),
                             "d": np.zeros(len(b), dtype=np.int64)})

    dist = seeds.map_batches(init, batch_format="pandas").materialize()
    edges = edges.materialize()
    prev = (int(dist.count()), 0)
    for _ in range(max_depth):
        def relax(b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:
                return pd.DataFrame({src_col: pd.Series(dtype="int64"),
                                     "d": pd.Series(dtype="int64")})
            return pd.DataFrame({src_col: b[dst_col].to_numpy(),
                                 "d": b["d"].to_numpy(np.int64) + 1})

        cand = hash_join(edges, dist, on=src_col).map_batches(
            relax, batch_format="pandas")
        dist = partial_aggregate(
            cand.union(dist), [src_col], {"d": ("d", "min")},
        ).repartition(4).materialize()
        # (count, sum) is a monotone fixpoint witness: count only grows,
        # the dist sum only shrinks per node — both stable == converged
        cur = (int(dist.count()), int(dist.sum("d") or 0))
        if cur == prev:
            break
        prev = cur

    def out(b: pd.DataFrame) -> pd.DataFrame:
        return b.rename(columns={src_col: node_col, "d": "depth"})

    return dist.map_batches(out, batch_format="pandas")


def hits_dense(edges, n_nodes: int, *, iters: int = 4,
               scale: int = PR_SCALE, src_col: str = "src",
               dst_col: str = "dst"):
    """Integer-exact HITS (hubs & authorities, Kleinberg 1999) for
    DENSE int node ids ``0..n_nodes-1``.

    Each half-step is one ``map_batches`` pass over the edges + one
    partial-agg shuffle of integer partials; the raw score vector
    (≤ n_nodes rows, the dense-path premise) is then sum-normalized to
    ``scale`` total mass with EXACT arithmetic — ``x*scale//total``
    in Python ints, since the product overflows int64 — so the result
    is bit-identical to the HUGEINT SQL CTE chain regardless of batch
    boundaries. L1 (sum) normalization instead of the classical L2:
    exact in integers, same fixpoint direction.

    Raises if an iteration's total mass is 0 (no edges / all mass on
    dangling side) — a silent all-zero result would read as converged.
    """
    import ray

    from gush_ray.stages.agg import partial_aggregate

    if n_nodes <= 0:
        raise ValueError("hits_dense: empty node set")
    edges = edges.materialize()

    def half_step(vec: np.ndarray, in_col: str, out_col: str) -> np.ndarray:
        ref = ray.put(vec)

        def contrib(b: pd.DataFrame) -> pd.DataFrame:
            vv = ray.get(ref)
            i = b[in_col].to_numpy(np.int64)
            o = b[out_col].to_numpy(np.int64)
            if len(i) and (min(i.min(), o.min()) < 0
                           or max(i.max(), o.max()) >= n_nodes):
                raise ValueError(
                    f"hits_dense: node ids outside [0, {n_nodes})")
            return pd.DataFrame({"v": o, "s": vv[i]})

        sums = partial_aggregate(
            edges.map_batches(contrib, batch_format="pandas"),
            ["v"], {"s": ("s", "sum")},
        ).to_pandas()
        raw = np.zeros(n_nodes, dtype=np.int64)
        if len(sums):
            raw[sums["v"].to_numpy(np.int64)] = sums["s"].to_numpy(np.int64)
        total = int(raw.sum())
        if total == 0:
            raise ValueError("hits_dense: zero total mass (no edges?)")
        # exact normalization: int64 * scale overflows, so go through
        # Python ints (the SQL twin uses HUGEINT for the same product)
        return np.array([x * scale // total for x in raw.tolist()],
                        dtype=np.int64)

    auth = np.full(n_nodes, scale // n_nodes, dtype=np.int64)
    hub = np.full(n_nodes, scale // n_nodes, dtype=np.int64)
    for _ in range(iters):
        auth = half_step(hub, src_col, dst_col)   # a(v) = Σ h(u), u→v
        hub = half_step(auth, dst_col, src_col)   # h(u) = Σ a(v), u→v

    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "node": np.arange(n_nodes, dtype=np.int64),
        "auth_micro": auth, "hub_micro": hub}))


def pagerank_dense(edges, n_nodes: int, *, iters: int = 8,
                   scale: int = PR_SCALE, damp_num: int = 85,
                   damp_den: int = 100, src_col: str = "src",
                   dst_col: str = "dst"):
    """Broadcast-ranks PageRank for DENSE int node ids ``0..n_nodes-1``.

    Bit-identical to :func:`pagerank` (parity-pinned) but with the rank
    vector broadcast per iteration (``ray.put`` of one packed int64
    array, ~8 bytes/node) instead of a hash join: each iteration is ONE
    ``map_batches`` pass over the edges + one partial-agg shuffle of
    (dst, sum) partials. This is the ngram_jaccard-style SMALL-SIDE
    fast path — valid while the rank vector fits a worker's memory
    (10^9 nodes ≈ 8 GB; beyond that, use :func:`pagerank`, whose ranks
    stay distributed).
    """
    import ray

    from gush_ray.stages.agg import partial_aggregate

    if n_nodes <= 0:
        raise ValueError("pagerank_dense: empty node set")
    deg_df = partial_aggregate(
        edges, [src_col], {"outdeg": (None, "count")}).to_pandas()
    srcs = deg_df[src_col].to_numpy(np.int64)
    if len(srcs) and (srcs.min() < 0 or srcs.max() >= n_nodes):
        # fail fast: numpy NEGATIVE indexing would silently credit the
        # wrong node (a -1 sentinel from an upstream failed join lands
        # on node n_nodes-1 with no error)
        raise ValueError(
            f"pagerank_dense: {src_col} ids outside [0, {n_nodes})")
    outdeg = np.zeros(n_nodes, dtype=np.int64)
    outdeg[srcs] = deg_df["outdeg"].to_numpy(np.int64)
    edges = edges.materialize()
    deg_ref = ray.put(outdeg)

    r = np.full(n_nodes, scale // n_nodes, dtype=np.int64)
    base = ((damp_den - damp_num) * scale) // (damp_den * n_nodes)
    for _ in range(iters):
        r_ref = ray.put(r)

        def contrib(b: pd.DataFrame) -> pd.DataFrame:
            rr = ray.get(r_ref)
            dd = ray.get(deg_ref)
            s = b[src_col].to_numpy(np.int64)
            d = b[dst_col].to_numpy(np.int64)
            if len(d) and d.min() < 0:  # same negative-indexing trap
                raise ValueError(
                    f"pagerank_dense: negative {dst_col} id")
            return pd.DataFrame({dst_col: d, "c": rr[s] // dd[s]})

        sums = partial_aggregate(
            edges.map_batches(contrib, batch_format="pandas"),
            [dst_col], {"c": ("c", "sum")},
        ).to_pandas()  # ≤ n_nodes rows — fits by the dense-path premise
        r = np.full(n_nodes, base, dtype=np.int64)
        if len(sums):
            d = sums[dst_col].to_numpy(np.int64)
            if d.min() < 0:
                raise ValueError(
                    f"pagerank_dense: negative {dst_col} id")
            r[d] += (damp_num * sums["c"].to_numpy(np.int64)) // damp_den

    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "node": np.arange(n_nodes, dtype=np.int64), "rank_micro": r}))


_HOST_RE = r"^(?P<s>[a-z]+)://(?P<h>[^/]+)"


def host_of_urls(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Extract the authority (host[:port]) from absolute URLs — one
    vectorized RE2 pass; a non-URL string yields null. The SQL twin is
    ``regexp_extract(url, '^[a-z]+://([^/]+)', 1)`` (RE2 both sides;
    NULL there is '' — callers that join on host drop both)."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    m = pc.extract_regex(urls, _HOST_RE)
    return pc.struct_field(m, "h")


def triangle_counts(edges, *, src_col: str = "src", dst_col: str = "dst",
                    num_partitions: int = 16):
    """Per-node triangle participation counts over the UNDIRECTED simple
    graph induced by a (possibly directed, possibly multi-) edge list.

    Algorithm: orient every edge low-id→high-id and dedupe (drops self
    loops and direction/multiplicity), producing ``ue`` with u<v; join
    ue(x,y) with ue(y,z) on the middle node — each wedge has x<y<z by
    construction, so each triangle is enumerated exactly once — then
    close the wedge with a composite-key hash join against ue on (x,z).
    Per-node counts are a partial-agg over the 3-way exploded triangle
    rows.

    Scale shape: three hash shuffles (dedupe, wedge join, closing join);
    the wedge set is Σ_y out(y)·in(y) under the id-orientation — at
    100 TB orient by DEGREE instead (lower-degree endpoint first, id as
    tiebreak), which bounds wedges by O(m^1.5) on any graph; the id
    orientation keeps the SQL twin trivially identical and is fine at
    fixture scale. Only node-id pairs/triples ever move.
    """
    from gush_ray.stages.agg import partial_aggregate
    from gush_ray.stages.joins import hash_join
    from gush_ray.stages.shuffle import partition_map

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        s = b[src_col].to_numpy(np.int64)
        d = b[dst_col].to_numpy(np.int64)
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        keep = u != v
        return pd.DataFrame({"u": u[keep], "v": v[keep]}) \
            .drop_duplicates(["u", "v"])

    # partitioned by u alone: all copies of an (u,v) pair share u, so a
    # within-partition drop_duplicates is a global dedupe
    ue = partition_map(
        edges.map_batches(orient, batch_format="pandas"), "u",
        lambda df: df.drop_duplicates(["u", "v"]), num_partitions,
    ).materialize()

    a = ue.map_batches(lambda b: b.rename(columns={"u": "x", "v": "y"}),
                       batch_format="pandas")
    bb = ue.map_batches(lambda b: b.rename(columns={"u": "y", "v": "z"}),
                        batch_format="pandas")
    # repartition: drop the wedge join's schemaless empty blocks before
    # they reach the closing join's left side (see resolve_redirects)
    wedges = hash_join(a, bb, on="y").repartition(4)
    closing = ue.map_batches(lambda b: b.rename(columns={"u": "x",
                                                         "v": "z"}),
                             batch_format="pandas")
    tri = hash_join(wedges, closing, on=("x", "z"))

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": np.concatenate([
            b["x"].to_numpy(np.int64), b["y"].to_numpy(np.int64),
            b["z"].to_numpy(np.int64)])})

    counts = partial_aggregate(
        tri.map_batches(explode, batch_format="pandas"),
        ["node"], {"n_tri": (None, "count")},
    ).materialize()

    # triangle-free graph: the closing join of an empty wedge set yields
    # a SCHEMALESS empty dataset (zero typed blocks — a map_batches
    # re-type never even runs), so pin the result schema explicitly
    sch = counts.schema(fetch_if_missing=True)
    if sch is None or "node" not in sch.names:
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame({
            "node": pd.Series(dtype="int64"),
            "n_tri": pd.Series(dtype="int64")}))
    return counts


def resolve_redirects(redirects, *, src_col: str = "src",
                      dst_col: str = "dst", max_rounds: int = 6,
                      num_partitions: int = 16):
    """Redirect-chain resolution by POINTER DOUBLING: each round
    composes the partial-resolution function with itself, so a chain of
    length L resolves in ceil(log2 L) rounds instead of L — the
    distributed pointer-chasing shape (vs the per-hop iteration of
    bfs_depth and the min-label propagation of connected components).

    State table T(u, v, h, done): v = the known endpoint after h hops
    from u, done = v is TERMINAL (not itself a redirect source). Init:
    T(u) = (dst(u), 1, dst(u) ∉ sources). Round: for undone u, look up
    v in T itself — T'(u) = (T[v].v, h + T[v].h, T[v].done). Terminals
    are absent from T, so done rows pass through unchanged and an
    undone row whose v has no T entry is impossible (v undone ⇒ v is a
    source ⇒ v ∈ T). After ``max_rounds`` rounds every chain of length
    ≤ 2^max_rounds is resolved; what remains is a CYCLE (or a deeper
    chain) and is flagged ``resolved=false, final_url='', n_hops=-1``
    — never looped on.

    Scale shape: one hash self-join + map per round, log2(max chain)
    rounds; the state stays distributed (one row per redirect source),
    the driver holds nothing. Matches the SQL twin exactly: the
    recursive CTE walks single hops with the same 2^max_rounds bound.
    """
    from gush_ray.stages.joins import hash_join
    from gush_ray.stages.shuffle import partition_map

    def init(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"u": b[src_col].to_numpy(),
                             "v": b[dst_col].to_numpy(),
                             "h": np.ones(len(b), dtype=np.int64)})

    edges = redirects.map_batches(init, batch_format="pandas")
    # done(u) = v not among sources: left join v against the source set
    srcs = redirects.map_batches(
        lambda b: pd.DataFrame({"v": b[src_col].to_numpy(),
                                "is_src": np.ones(len(b), dtype=np.int64)}),
        batch_format="pandas")

    def mark(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"u": b["u"].to_numpy(),
                             "v": b["v"].to_numpy(),
                             "h": b["h"].to_numpy(np.int64),
                             "done": b["is_src"].isna().to_numpy()})

    # the trailing repartition is LOAD-BEARING: a join's output keeps
    # schema-LESS empty blocks for empty hash partitions, and feeding
    # them back into the next join's left side crashes Acero FieldRef
    # resolution ('No match ... on left side') whenever a partition
    # holds only right rows — found by the random-functional-graph fuzz
    # (same class as the pagerank/dedup partial-agg gotcha)
    state = hash_join(edges, srcs, on="v", join_type="left_outer") \
        .map_batches(mark, batch_format="pandas") \
        .repartition(4).materialize()

    for _ in range(max_rounds):
        # F = the function table keyed by its INPUT url
        f_tab = state.map_batches(
            lambda b: b.rename(columns={"u": "v", "v": "fv", "h": "fh",
                                        "done": "fdone"}),
            batch_format="pandas")

        def step(b: pd.DataFrame) -> pd.DataFrame:
            done = b["done"].to_numpy(bool)
            # done rows keep their endpoint; undone rows ALWAYS have a
            # match (their v is a source), so fv/fh/fdone are non-null
            v = np.where(done, b["v"].to_numpy(object),
                         b["fv"].to_numpy(object))
            h = np.where(done, b["h"].to_numpy(np.int64),
                         b["h"].to_numpy(np.int64)
                         + b["fh"].fillna(0).to_numpy(np.int64))
            nd = np.where(done, True, b["fdone"].fillna(False)
                          .to_numpy(bool))
            return pd.DataFrame({"u": b["u"].to_numpy(), "v": v,
                                 "h": h.astype(np.int64),
                                 "done": nd.astype(bool)})

        state = hash_join(state, f_tab, on="v", join_type="left_outer") \
            .map_batches(step, batch_format="pandas") \
            .repartition(4).materialize()

    def out(b: pd.DataFrame) -> pd.DataFrame:
        done = b["done"].to_numpy(bool)
        return pd.DataFrame({
            "src_url": b["u"].to_numpy(),
            "final_url": np.where(done, b["v"].to_numpy(object), ""),
            "n_hops": np.where(done, b["h"].to_numpy(np.int64),
                               -1).astype(np.int64),
            "resolved": done,
        })

    return state.map_batches(out, batch_format="pandas")


def extract_links_nofollow_table(tbl: pa.Table, html_col: str = "html",
                                 url_col: str = "url") -> pa.Table:
    """(url, html) rows → (src_url, dst_url) edges EXCLUDING anchors
    whose attribute tail carries ``rel="nofollow"`` — the link-graph
    hygiene every ranking pipeline applies (nofollow edges must not
    pass PageRank mass). Same split as :func:`extract_links_table`, one
    anchored two-group regex per tail: href + the attribute run up to
    the tag close (``[^>]*`` — stops at '>' or end-of-tail, both
    sides). The SQL twin extracts the same two groups with parallel
    ``regexp_extract_all`` calls and filters on the attrs group."""
    tails, srcs = _anchor_tails(tbl, html_col, url_col)
    m = pc.extract_regex(tails, r'^(?P<d>[^"<]*)"(?P<a>[^>]*)')
    ok = pc.is_valid(m)
    attrs = pc.struct_field(m, "a").filter(ok)
    keep = pc.invert(pc.match_substring(attrs, 'rel="nofollow"'))
    return pa.table({
        "src_url": srcs.filter(ok).filter(keep),
        "dst_url": pc.struct_field(m, "d").filter(ok).filter(keep),
    })


_NOINDEX_RE = r'<meta name="robots" content="[^"]*noindex'


def noindex_mask(html: pa.ChunkedArray | pa.Array) -> pa.Array:
    """True for pages whose meta-robots declares ``noindex`` (the page
    must be excluded from every indexing/ranking output — crawl hygiene
    alongside robots.txt). One vectorized RE2 pass; null html → False
    (no meta tag, indexable). SQL twin: ``regexp_matches(decode(html),
    '<meta name="robots" content="[^"]*noindex')``."""
    s = _html_as_string(html)
    return pc.fill_null(pc.match_substring_regex(s, _NOINDEX_RE), False)
