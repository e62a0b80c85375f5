"""Web-graph / URL / DSIR operators (stages/web.py, pipelines/queries_web).

Engine-vs-SQL parity for every paired query runs in test_oracle.py;
here: unit semantics (canonicalization rule table, extraction vs a
regex reference, PageRank vs an independent integer reference) and
fixture invariants.
"""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from gush_ray.datagen import gen_linked_pages, gen_messy_urls
from gush_ray.stages.web import (
    PR_SCALE,
    canonicalize_urls,
    extract_links_table,
    pagerank,
)


CANON_CASES = [
    # (raw, canonical)
    ("https://SiteA.Example.org:443/p/1?b=2&a=1#frag",
     "https://sitea.example.org/p/1?a=1&b=2"),
    ("HTTP://host.com:80/", "http://host.com/"),
    ("https://host.com", "https://host.com/"),
    ("http://host.com:8080/a/b/", "http://host.com:8080/a/b"),
    ("http://host.com/a?x=1", "http://host.com/a?x=1"),
    ("http://host.com/a?", "http://host.com/a?"),
    ("https://h.io/p#only-frag", "https://h.io/p"),
    ("https://h.io:443/", "https://h.io/"),
    ("http://h.io:443/x", "http://h.io:443/x"),  # 443 not http default
    ("not a url", "not a url"),  # pass-through
]


def test_canonicalize_rule_table():
    raw = pa.array([c[0] for c in CANON_CASES] + [None])
    got = canonicalize_urls(raw).to_pylist()
    assert got == [c[1] for c in CANON_CASES] + [None]


def test_canonicalize_idempotent():
    raw = pa.array([c[0] for c in CANON_CASES])
    once = canonicalize_urls(raw)
    twice = canonicalize_urls(once)
    assert once.to_pylist() == twice.to_pylist()


def test_extract_links_matches_regex_reference():
    tbl = gen_linked_pages(n_urls=120, seed=5)
    got = extract_links_table(tbl).to_pydict()
    want = []
    for url, html in zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()):
        for dst in re.findall(r'<a href="([^"]*)"', html.decode()):
            want.append((url, dst))
    assert list(zip(got["src_url"], got["dst_url"])) == want
    # the <link href> stylesheet decoy must never match
    assert "/static/site.css" not in set(got["dst_url"])


def test_extract_anchors_matches_regex_reference():
    """Anchor (href, text) pairs == the SQL twin's two-group regex on
    ADVERSARIAL bytes too: unclosed anchors (with and without a
    following anchor), truncated hrefs, null html. The '<'-excluded
    groups + literal '</a>' terminator make the per-tail match equal
    to the sequential non-overlapping scan."""
    from gush_ray.stages.web import extract_anchors_table

    htmls = [
        b'<a href="x">big dog</a>mid<a href="y">cat</a>',
        b'<a href="dangling',                    # no closing quote
        b'<a href="q">unterminated',             # no closing </a>
        b'<a href="x">foo<a href="y">bar</a>',   # unclosed + adjacent
        None,
        b"plain",
    ]
    tbl = pa.table({"url": [f"u{i}" for i in range(len(htmls))],
                    "html": pa.array(htmls, type=pa.binary())})
    got = extract_anchors_table(tbl).to_pydict()
    want = []
    for i, h in enumerate(htmls):
        if h is None:
            continue
        for d, t in re.findall(r'<a href="([^"<]*)">([^<]*)</a>',
                               h.decode()):
            want.append((f"u{i}", d, t))
    assert list(zip(got["src_url"], got["dst_url"],
                    got["anchor_text"])) == want
    assert want == [("u0", "x", "big dog"), ("u0", "y", "cat"),
                    ("u3", "y", "bar")]


def test_extract_links_unterminated_href_dropped():
    """A truncated page whose <a href=" never closes is NOT an anchor —
    the SQL twin's regex requires the closing quote, so the engine must
    drop it too (oracle contract on malformed input)."""
    tbl = pa.table({
        "url": ["a", "b", "c", "d"],
        "html": [b'<a href="http://dangling',  # no closing quote
                 b'<a href="',                  # page ends at the prefix
                 b'<a href="ok">x</a><a href="trunc',
                 # unterminated href followed by a CLOSED anchor: the
                 # '<'-excluded group means the scan recovers at the
                 # second anchor instead of swallowing its quote
                 b'<a href="dang<a href="y">l</a>'],
    })
    got = extract_links_table(tbl).to_pydict()
    assert got == {"src_url": ["c", "d"], "dst_url": ["ok", "y"]}
    # reference: the SQL twin's pattern on the same bytes
    want = []
    for u, h in zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()):
        for d in re.findall(r'<a href="([^"<]*)"', h.decode()):
            want.append((u, d))
    assert list(zip(got["src_url"], got["dst_url"])) == want


def test_extract_links_null_and_linkless_rows():
    tbl = pa.table({
        "url": ["a", "b", "c"],
        "html": [b"<p>none</p>", None, b'<a href="x">l</a>'],
    })
    got = extract_links_table(tbl).to_pydict()
    assert got == {"src_url": ["c"], "dst_url": ["x"]}


def _pagerank_reference(edges, n_nodes, iters, scale=PR_SCALE):
    """Independent int64 reference (plain dict loop)."""
    outdeg: dict = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: scale // n_nodes for v in range(n_nodes)}
    base = (15 * scale) // (100 * n_nodes)
    for _ in range(iters):
        sums = {v: 0 for v in range(n_nodes)}
        for s, d in edges:
            sums[d] += r[s] // outdeg[s]
        r = {v: base + (85 * sums[v]) // 100 for v in range(n_nodes)}
    return r


@pytest.mark.parametrize("edges,n", [
    ([(0, 1), (1, 0)], 2),                       # 2-cycle
    ([(0, 1), (1, 2), (2, 0), (0, 2)], 3),       # cycle + chord
    ([(0, 1), (0, 1), (2, 2)], 4),               # multi-edge, self-loop,
                                                 # dangling node 1→, iso 3
])
def test_pagerank_matches_integer_reference(edges, n):
    edges_ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    nodes_ds = rd.from_pandas(pd.DataFrame({"node": range(n)}))
    got = pagerank(edges_ds, nodes_ds, iters=5).to_pandas()
    got = dict(zip(got["node"], got["rank_micro"]))
    want = _pagerank_reference(edges, n, iters=5)
    assert got == want


@pytest.mark.parametrize("edges,n", [
    ([(0, 1), (1, 0)], 2),
    ([(0, 1), (0, 1), (2, 2)], 4),
])
def test_pagerank_dense_matches_join_path(edges, n):
    """The broadcast-ranks dense path (bench) is bit-identical to the
    distributed-join path (the scale shape the oracle checks)."""
    from gush_ray.stages.web import pagerank_dense

    edges_ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    nodes_ds = rd.from_pandas(pd.DataFrame({"node": range(n)}))
    a = pagerank(edges_ds, nodes_ds, iters=5).to_pandas()
    b = pagerank_dense(edges_ds, n, iters=5).to_pandas()
    key = "node"
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True), check_dtype=False)


def _hits_reference(edges, n, iters, scale=PR_SCALE):
    """Independent Python-int reference (plain dict loops)."""
    a = {v: scale // n for v in range(n)}
    h = dict(a)

    def step(vec, reverse):
        raw = {v: 0 for v in range(n)}
        for s, d in edges:
            if reverse:
                raw[s] += vec[d]
            else:
                raw[d] += vec[s]
        tot = sum(raw.values())
        return {v: raw[v] * scale // tot for v in range(n)}

    for _ in range(iters):
        a = step(h, reverse=False)
        h = step(a, reverse=True)
    return a, h


@pytest.mark.parametrize("edges,n", [
    ([(0, 1), (1, 0)], 2),
    ([(0, 1), (0, 2), (1, 2), (2, 0)], 3),
    ([(0, 1), (0, 1), (2, 1)], 3),  # multi-edge, hub competition
])
def test_hits_matches_integer_reference(edges, n):
    from gush_ray.stages.web import hits_dense

    edges_ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    got = hits_dense(edges_ds, n, iters=3).to_pandas()
    a, h = _hits_reference(edges, n, iters=3)
    assert dict(zip(got["node"], got["auth_micro"])) == a
    assert dict(zip(got["node"], got["hub_micro"])) == h


def test_hits_zero_mass_raises():
    from gush_ray.stages.web import hits_dense

    edges_ds = rd.from_pandas(pd.DataFrame({"src": [], "dst": []},
                                           dtype="int64"))
    with pytest.raises(ValueError, match="zero total mass"):
        hits_dense(edges_ds, 3, iters=1)


def test_pagerank_mass_bound():
    # total rank never exceeds the injected mass (floor division and
    # dangling-node drop only ever lose mass)
    tbl = gen_linked_pages(n_urls=60, seed=9)
    links = extract_links_table(tbl)
    id_of = dict(zip(tbl["url"].to_pylist(), tbl["page_id"].to_pylist()))
    edges = [
        (id_of[s], id_of[d])
        for s, d in zip(links["src_url"].to_pylist(),
                        links["dst_url"].to_pylist())
        if d in id_of
    ]
    edges_ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    nodes_ds = rd.from_pandas(pd.DataFrame({"node": range(60)}))
    got = pagerank(edges_ds, nodes_ds, iters=4).to_pandas()
    assert len(got) == 60
    assert got["rank_micro"].min() > 0
    assert got["rank_micro"].sum() <= PR_SCALE


def test_bfs_depth_matches_reference():
    """bfs_depth vs a plain-dict BFS on a graph with a cycle, a chain
    longer than max_depth, and an unreachable node."""
    from collections import deque

    from gush_ray.stages.web import bfs_depth

    edges = [(0, 1), (1, 2), (2, 0),          # cycle
             (2, 3), (3, 4), (4, 5), (5, 6),  # chain
             (8, 9)]                          # disconnected from seed
    seeds = [0]
    edges_ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    seeds_ds = rd.from_pandas(pd.DataFrame({"node": seeds}))
    for max_depth in (2, 12):
        got = bfs_depth(edges_ds, seeds_ds, max_depth=max_depth).to_pandas()
        got = dict(zip(got["node"], got["depth"]))
        # reference BFS bounded at max_depth
        want = {s: 0 for s in seeds}
        dq = deque(seeds)
        adj: dict = {}
        for a, b in edges:
            adj.setdefault(a, []).append(b)
        while dq:
            u = dq.popleft()
            if want[u] >= max_depth:
                continue
            for v in adj.get(u, []):
                if v not in want:
                    want[v] = want[u] + 1
                    dq.append(v)
        assert got == want


def test_messy_url_fixture_groups_of_three():
    tbl = gen_messy_urls(n_base=50, seed=29)
    canon = canonicalize_urls(tbl["raw_url"]).to_pylist()
    counts = pd.Series(canon).value_counts()
    assert len(counts) == 50
    assert (counts == 3).all()


def test_dsir_weights_deterministic(sf_dir):
    from gush_ray.pipelines.queries_web import q_dsir_select

    a = q_dsir_select(sf_dir).to_pandas()
    b = q_dsir_select(sf_dir).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True))
    assert len(a) == 100
    # weights sorted descending within the selected set
    assert a["weight_micro"].is_monotonic_decreasing


# ---------------------------------------------------- oracle fuzzing


def _duckdb_canon(urls):
    """Run the SQL canon-map (queries_web._sql_canon_cte — the
    INDEPENDENT oracle implementation) over a literal VALUES table."""
    import duckdb

    from gush_ray.pipelines.queries_web import _sql_canon_cte

    con = duckdb.connect()
    con.execute("CREATE TABLE u (raw_url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?)", [(u,) for u in urls])
    rows = con.execute(f"""
WITH {_sql_canon_cte('u', 'raw_url')}
SELECT raw, canon FROM cn_map
""").fetchall()
    return dict(rows)


def test_canonicalize_fuzz_vs_sql_oracle():
    """Property fuzz: engine canonicalization == the independent SQL
    rule implementation on randomly assembled urls (messy hosts, ports,
    params, fragments, traps like '?', '#', empty path, non-urls)."""
    import random

    rng = random.Random(404)
    schemes = ["http", "https", "HTTP", "Https", "ftp"]
    hosts = ["a.com", "A.Com", "x.y.z.org", "LOCALHOST", "h-1.io."]
    ports = ["", ":80", ":443", ":8080", ":0443"]
    paths = ["", "/", "/p", "/p/", "/a/b/", "//d", "/%7Euser", "/p q"]
    queries = ["", "?", "?a=1", "?b=2&a=1", "?a=1&a=1", "?x", "?&", "?="]
    frags = ["", "#", "#f", "#a#b"]
    urls = []
    for _ in range(300):
        urls.append(rng.choice(schemes) + "://" + rng.choice(hosts)
                    + rng.choice(ports) + rng.choice(paths)
                    + rng.choice(queries) + rng.choice(frags))
    urls += ["not a url", "", "http//broken", "://x", "a:b:c"]
    urls = sorted(set(urls))
    got = dict(zip(urls, canonicalize_urls(pa.array(urls)).to_pylist()))
    want = _duckdb_canon(urls)
    diffs = {u: (got[u], want[u]) for u in urls if got[u] != want[u]}
    assert not diffs, f"{len(diffs)} divergences, e.g. {list(diffs.items())[:3]}"
    # idempotence on every canonical output
    canon = pa.array(sorted(set(got.values())))
    assert canonicalize_urls(canon).to_pylist() == canon.to_pylist()


def test_extract_links_fuzz_vs_sql_oracle():
    """Property fuzz: engine link extraction == DuckDB's sequential
    regexp_extract_all on random byte soups full of anchor fragments,
    unclosed quotes and adjacent anchors."""
    import random

    import duckdb

    rng = random.Random(77)
    atoms = ['<a href="', '"', ">", "</a>", "<a", "x", "u1", "<",
             'href="', "txt ", '<a href="ok">t</a>']
    htmls = []
    for _ in range(200):
        htmls.append("".join(rng.choice(atoms)
                             for _ in range(rng.randint(0, 12))))
    tbl = pa.table({
        "url": [f"u{i}" for i in range(len(htmls))],
        "html": pa.array([h.encode() for h in htmls], type=pa.binary()),
    })
    got = list(zip(*extract_links_table(tbl).to_pydict().values())) or []
    con = duckdb.connect()
    con.execute("CREATE TABLE t (url VARCHAR, h VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    list(zip(tbl["url"].to_pylist(), htmls)))
    want = con.execute("""
SELECT url, unnest(regexp_extract_all(h, '<a href="([^"<]*)"', 1))
FROM t ORDER BY url
""").fetchall()
    assert sorted(got) == sorted(want)


# ---------------------------------------------------------------------------
# triangle counts
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("edges,want", [
    # K4: every node participates in C(3,2)=3 triangles
    ([(a, b) for a in range(4) for b in range(4) if a != b],
     {0: 3, 1: 3, 2: 3, 3: 3}),
    # one triangle + a pendant edge; direction mixed, one duplicate,
    # one self-loop — none of which may change the count
    ([(0, 1), (2, 1), (0, 2), (2, 0), (0, 0), (2, 3)],
     {0: 1, 1: 1, 2: 1}),
    # square without diagonals: zero triangles → empty result
    ([(0, 1), (1, 2), (2, 3), (3, 0)], {}),
])
def test_triangle_counts(edges, want):
    from gush_ray.stages.web import triangle_counts

    edges_ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    out = triangle_counts(edges_ds, num_partitions=4)
    # the result schema is pinned even when triangle-free (Ray's
    # to_pandas drops columns on zero-row datasets, so check it here)
    assert out.schema().names == ["node", "n_tri"]
    got = out.to_pandas()
    if len(got) == 0:
        assert want == {}
    else:
        assert dict(zip(got["node"], got["n_tri"])) == want


# ---------------------------------------------------------------------------
# host extraction
# ---------------------------------------------------------------------------

def test_host_of_urls():
    from gush_ray.stages.web import host_of_urls

    got = host_of_urls(pa.array([
        "https://a.example.org/p/1",
        "http://b.example.org:8080/x?q=1",
        "not a url",
    ])).to_pylist()
    assert got == ["a.example.org", "b.example.org:8080", None]


# ---------------------------------------------------------------------------
# redirect resolution (pointer doubling)
# ---------------------------------------------------------------------------

def test_resolve_redirects_semantics():
    """Chains resolve with exact hop counts in log rounds; a chain
    JOINING another chain resolves through it; 2-cycles, 3-cycles and
    self-loops are flagged unresolved (never looped on); max_rounds
    bounds resolvable chain length at 2^rounds."""
    from gush_ray.stages.web import resolve_redirects

    edges = [
        ("a", "b"), ("b", "c"), ("c", "T1"),       # 3-chain → T1
        ("x", "b"),                                # joins mid-chain: 3 hops
        ("p", "q"), ("q", "p"),                    # 2-cycle
        ("s", "s"),                                # self-loop
        ("long0", "long1"), ("long1", "long2"),
        ("long2", "long3"), ("long3", "long4"),
        ("long4", "T2"),                           # 5-chain → T2
    ]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    got = resolve_redirects(ds, max_rounds=4, num_partitions=4).to_pandas()
    rows = {r.src_url: (r.final_url, r.n_hops, r.resolved)
            for r in got.itertuples()}
    assert rows["a"] == ("T1", 3, True)
    assert rows["x"] == ("T1", 3, True)
    assert rows["b"] == ("T1", 2, True)
    assert rows["long0"] == ("T2", 5, True)
    for cyc in ("p", "q", "s"):
        assert rows[cyc] == ("", -1, False)

    # max_rounds=1 resolves only chains of length <= 2
    got2 = resolve_redirects(ds, max_rounds=1,
                             num_partitions=4).to_pandas()
    rows2 = {r.src_url: r.resolved for r in got2.itertuples()}
    assert rows2["b"] is True or rows2["b"] == True  # noqa: E712
    assert not rows2["a"]        # 3 hops > 2^1
    assert not rows2["long0"]


def _ppr_reference(edges, n_nodes, seeds, iters, scale=PR_SCALE):
    outdeg: dict = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    S = set(seeds)
    r = {v: (scale // len(S) if v in S else 0) for v in range(n_nodes)}
    base = (15 * scale) // (100 * len(S))
    for _ in range(iters):
        sums = {v: 0 for v in range(n_nodes)}
        for s, d in edges:
            sums[d] += r[s] // outdeg[s]
        r = {v: (base if v in S else 0) + (85 * sums[v]) // 100
             for v in range(n_nodes)}
    return r


def test_personalized_pagerank_matches_integer_reference():
    """Seed-biased teleport: mass concentrates downstream of the seeds;
    a node unreachable from the seed set scores exactly 0."""
    edges = [(0, 1), (1, 2), (2, 0), (3, 4)]  # {3,4} disconnected
    edges_ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    nodes_ds = rd.from_pandas(pd.DataFrame({"node": range(5)}))
    got = pagerank(edges_ds, nodes_ds, iters=5, seeds=[0]).to_pandas()
    got = dict(zip(got["node"], got["rank_micro"]))
    assert got == _ppr_reference(edges, 5, [0], iters=5)
    assert got[3] == 0 and got[4] == 0    # unreachable from seed
    assert got[0] > 0 and got[1] > 0      # seed + downstream

    with pytest.raises(ValueError):
        pagerank(edges_ds, nodes_ds, seeds=[])


def test_linear_probe_exactness():
    """The distributed integer least-squares fit equals the brute-force
    rational solution regardless of batch boundaries; truncating
    division matches DuckDB's // on a NEGATIVE coefficient; collinear
    features raise."""
    from fractions import Fraction

    from gush_ray.stages.linear import linear_probe

    rng = np.random.RandomState(11)
    n = 500
    f1 = rng.randint(1, 50, n).astype("int64")
    f2 = rng.randint(1, 2000, n).astype("int64")
    # engineered NEGATIVE slope on f2
    y = (5 + 3 * f1 - 2 * f2 + rng.randint(-3, 4, n)).astype("int64")
    df = pd.DataFrame({"f1": f1, "f2": f2, "y": y})
    ds = rd.from_pandas(df).repartition(7)  # arbitrary batch boundaries
    got = linear_probe(ds, ["f1", "f2"], "y").iloc[0]

    # brute-force exact rational solution
    X = np.stack([np.ones(n, dtype=object), f1.astype(object),
                  f2.astype(object)], axis=1)
    A = (X.T @ X)
    t = (X.T @ y.astype(object))
    def det3(m):
        return (m[0][0]*(m[1][1]*m[2][2]-m[1][2]*m[2][1])
                - m[0][1]*(m[1][0]*m[2][2]-m[1][2]*m[2][0])
                + m[0][2]*(m[1][0]*m[2][1]-m[1][1]*m[2][0]))
    D = det3(A)
    assert str(D) == got["det"]
    for i in range(3):
        Ai = A.copy()
        Ai[:, i] = t
        num = det3(Ai) * 10**6
        q = abs(num) // abs(D)
        want = q if (num >= 0) == (D >= 0) else -q  # truncation
        assert got[f"b{i}_micro"] == want
    # sanity: recovered slopes near the generating ones
    assert abs(Fraction(int(got["b1_micro"]), 10**6) - 3) < 1
    assert abs(Fraction(int(got["b2_micro"]), 10**6) + 2) < 1
    assert got["b2_micro"] < 0

    # collinear features → singular → loud error
    bad = pd.DataFrame({"f1": f1, "f2": 2 * f1, "y": y})
    with pytest.raises(Exception):
        linear_probe(rd.from_pandas(bad), ["f1", "f2"], "y")


def test_nofollow_and_noindex_kernels():
    from gush_ray.stages.web import (
        extract_links_nofollow_table,
        extract_links_table,
        noindex_mask,
    )

    tbl = pa.table({
        "url": ["a", "b"],
        "html": [
            b'<a href="x" rel="nofollow">n</a><a href="y">f</a>'
            b'<a href="z" class="c" rel="nofollow">n2</a>',
            b'<a href="q">plain</a><a href="trunc',
        ],
    })
    got = extract_links_nofollow_table(tbl).to_pydict()
    assert got == {"src_url": ["a", "b"], "dst_url": ["y", "q"]}
    # plain extraction still sees every closed href
    assert extract_links_table(tbl).num_rows == 4

    m = noindex_mask(pa.array([
        b'<head><meta name="robots" content="noindex,follow"></head>',
        b'<head><meta name="robots" content="nofollow"></head>',
        b"<head></head>",
        None,
    ], type=pa.binary())).to_pylist()
    assert m == [True, False, False, False]
