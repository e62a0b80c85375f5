"""Fluent Stream API tests (the user extension surface, SURVEY.md §2.7)."""

import pandas as pd
import pyarrow as pa

from gush_ray.api import Stream
from gush_ray.stages.nfa import Pattern, Step

SF = "/root/testdata/sf0.001"
HOUR_US = 3600 * 1_000_000


def test_filter_window_pipeline():
    out = (
        Stream.from_parquet(f"{SF}/events.parquet",
                            columns=["ts", "event_type"])
        .filter_equals("event_type", "purchase")
        .window_tumbling(["event_type"], "ts", 6 * HOUR_US,
                         {"n": (None, "count")})
        .to_pandas()
    )
    assert len(out) > 0 and set(out["event_type"]) == {"purchase"}


def test_from_arrow_classify_and_session():
    t = pa.table(
        {
            "url": ["a", "a", "b"],
            "ts_us": pa.array([10, 2_000_000_000, 30], type=pa.int64()),
        }
    )
    ch = Stream.from_arrow(t).classify_changes("url", "ts_us").to_pandas()
    assert sorted(ch["change_kind"]) == ["insert", "insert", "update"]
    sess = (
        Stream.from_arrow(t)
        .window_session("url", "ts_us", gap_us=100)
        .to_pandas()
    )
    assert len(sess) == 3  # the two 'a' events are > gap apart


def test_join_and_union():
    li = Stream.from_parquet(f"{SF}/lineitem.parquet",
                             columns=["l_orderkey", "l_quantity"])
    orders = Stream.from_parquet(f"{SF}/orders.parquet",
                                 columns=["o_orderkey", "o_orderstatus"])
    j = li.join(orders, on=("l_orderkey",), right_on=("o_orderkey",))
    agg = j.aggregate(["o_orderstatus"], {"n": (None, "count")}).to_pandas()
    assert agg["n"].sum() == 6000

    a = Stream.from_parquet(f"{SF}/events.parquet", columns=["event_type"])
    u = a.union(Stream.from_parquet(f"{SF}/events.parquet",
                                    columns=["event_type"]))
    assert u.count() == 2000


def test_match_pattern_and_sink(tmp_path):
    pat = Pattern(
        steps=(Step("c", "event_type", "click"),
               Step("p", "event_type", "purchase")),
        within_us=HOUR_US, key="user_id", ts_col="ts_us",
        id_col="event_id",
    )
    s = (
        Stream.from_parquet(f"{SF}/events.parquet",
                            columns=["event_id", "ts", "user_id",
                                     "event_type"])
        .with_ts_us("ts")
        .match_pattern(pat)
    )
    out_dir = str(tmp_path / "matches")
    s.sink_parquet(out_dir)
    import pyarrow.parquet as pq

    back = pq.read_table(out_dir)
    assert back.num_rows == s.count() and back.num_rows > 0


def test_extract_text_stream():
    from gush_ray.datagen import gen_pages

    table, _ = gen_pages(n_urls=100, seed=3)
    out = (
        Stream.from_arrow(table.drop_columns(["text"]))
        .extract_text(html_col="html", out_col="text")
        .to_pandas()
    )
    truth = table.to_pandas()
    merged = out.merge(
        truth[["url", "warc_ts", "text"]], on=["url", "warc_ts"],
        suffixes=("_got", "_want"),
    )
    ok = merged["text_want"].notna()
    assert (merged.loc[ok, "text_got"] == merged.loc[ok, "text_want"]).all()


def test_stream_join_interval_and_sketches(sf_dir):
    from gush_ray.api import Stream

    ev = Stream.from_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "ts", "user_id",
                                      "event_type"]).with_ts_us("ts")
    p = (ev.filter_equals("event_type", "purchase")
           .map_batches(lambda b: b.select(["event_id", "user_id", "ts_us"])
                        .rename_columns(["purchase_id", "user_id",
                                         "p_ts_us"])))
    v = (ev.filter_equals("event_type", "view")
           .map_batches(lambda b: b.select(["event_id", "user_id", "ts_us"])
                        .rename_columns(["view_id", "user_id", "v_ts_us"])))
    HALF_H = 1_800_000_000
    joined = p.join_interval(v, key="user_id", ts_col="p_ts_us",
                             right_ts_col="v_ts_us",
                             low_us=-HALF_H, high_us=HALF_H).to_pandas()
    assert {"purchase_id", "view_id", "user_id"} <= set(joined.columns)
    assert len(joined) > 0
    assert (joined["v_ts_us"] - joined["p_ts_us"]).abs().max() <= HALF_H

    hh = ev.heavy_hitters("user_id", k=5, capacity=1024)
    assert list(hh.columns) == ["user_id", "n", "n_upper"]
    assert len(hh) == 5 and (hh["n"] == hh["n_upper"]).all()
    est = ev.approx_distinct("user_id")
    assert est > 0


def test_stream_corpus_ops():
    docs = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["a b c d e f", "a b c x y z", "x y z x y z"],
    })
    deduped = Stream.from_arrow(docs).dedup_lines(
        words_per_line=3, num_partitions=2).to_pandas()
    assert set(deduped.doc_id) <= {1, 2, 3}
    scrubbed = Stream.from_arrow(docs).scrub_repeats(
        words_per_line=3).to_pandas().sort_values("doc_id")
    assert scrubbed.loc[scrubbed.doc_id == 3, "text"].iloc[0] == "x y z"
    sampled = Stream.from_arrow(
        pa.table({"doc_id": list(range(50)),
                  "lang": ["en", "de"] * 25})
    ).sample_stratified("lang", k=3).to_pandas()
    assert sampled.groupby("lang").size().tolist() == [3, 3]
    packed = Stream.from_arrow(
        pa.table({"doc_id": [1, 2], "n_tokens": [100, 100]})
    ).pack("n_tokens", budget=512, num_partitions=1).to_pandas()
    assert packed.bin_id.nunique() == 1
    red = Stream.from_arrow(
        pa.table({"s": ["id 123 ok"]})
    ).redact("s").to_pandas()
    assert red.s.iloc[0] == "id <NUM> ok"


def test_stream_nfa_negation():
    ev = pa.table({
        "k": ["u"] * 3, "ts": [10, 20, 30],
        "etype": ["A", "C", "B"], "eid": [1, 2, 3],
    })
    pat = Pattern(
        steps=(Step("a", "etype", "A"),
               Step("c", "etype", "C", negated=True),
               Step("b", "etype", "B")),
        within_us=100, key="k", ts_col="ts", id_col="eid",
    )
    out = Stream.from_arrow(ev).match_pattern(pat).to_pandas()
    assert len(out) == 0


def test_stream_round2_analytics():
    ev = pa.table({
        "id": [1, 2, 3, 4],
        "k": [0, 0, 1, 1],
        "ts": [0, 50, 0, 500],
        "v": [10, 30, 7, 7],
    })
    mw = Stream.from_arrow(ev).moving_window(
        "k", "ts", 100, {"ws": "v"}, num_partitions=2,
    ).to_pandas().sort_values("id")
    assert mw.ws.tolist() == [10, 40, 7, 7]
    sh = Stream.from_arrow(ev).share_of(
        ["k"], "v", num_partitions=2,
    ).to_pandas().sort_values("id")
    assert sh.share_bp.tolist() == [2500, 7500, 5000, 5000]
    zs = Stream.from_arrow(ev).zscore(
        "k", "v", num_partitions=2,
    ).to_pandas().sort_values("id")
    assert (zs.loc[zs.k == 1, "z"] == 0).all()


def test_stream_editdist_pairs():
    docs = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["abcdefghijklmnop done", "abcdefghijklmnop dont",
                 "something unrelated here"],
    })
    out = Stream.from_arrow(docs).similar_pairs_editdist(
        "doc_id", "text", block_len=16, cmp_len=30, max_dist=3,
        num_partitions=2,
    ).to_pandas()
    assert [(a, b) for a, b in zip(out.id_a, out.id_b)] == [(1, 2)]


def test_stream_decontam_and_substring_dedup():
    corpus = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["the quick brown fox jumps over it",
                 "a completely different document body here",
                 "the quick brown fox jumps far away"],
    })
    bench = pa.table({
        "doc_id": [9],
        "text": ["watch the quick brown fox jumps now"],
    })
    clean = Stream.from_arrow(corpus).decontaminate(
        Stream.from_arrow(bench), n=4).to_pandas()
    assert set(clean.doc_id) == {2}
    spans = Stream.from_arrow(corpus).dup_spans(
        k=20, num_partitions=2).to_pandas()
    assert set(spans.doc_id) == {1, 3}
    deduped = Stream.from_arrow(corpus).dedup_substrings(
        k=20, num_partitions=2).to_pandas().sort_values("doc_id")
    assert deduped.removed_chars.tolist()[1] == 0
    assert (deduped.removed_chars.tolist()[0] > 0
            and deduped.removed_chars.tolist()[2] > 0)


def test_stream_exact_quantiles(ray_session):
    import numpy as np

    x = np.arange(1, 1002, dtype=float)  # 1..1001, median 501
    s = Stream.from_arrow(pa.table({"v": x}))
    got = s.exact_quantiles("v", [0.5, 0.9], n_buckets=16, collect_cap=50)
    assert got[0.5] == 501.0
    assert got[0.9] == 901.0  # ceil(0.9*1001)-1 = 900 -> value 901


def test_stream_kmeans_ann_normalize(ray_session):
    import numpy as np

    rng = np.random.RandomState(3)
    centers = rng.randn(3, 8) * 6
    rows = [{"vec_id": i,
             "embedding": (centers[i % 3] + rng.randn(8) * 0.2)
             .astype("float32").tolist()}
            for i in range(120)]
    s = Stream.from_arrow(pa.Table.from_pylist(rows))
    clustered = s.cluster_kmeans(3, sample_size=120, seed=5).to_pandas()
    assert clustered.groupby("cluster").size().min() >= 30
    top = s.ann_topk(centers[0], k=5)
    assert len(top) == 5 and (top["vec_id"] % 3 == 0).all()

    t = Stream.from_arrow(pa.table({"text": ["école"]}))
    norm = t.normalize_unicode().to_pandas()
    assert norm["text"][0] == "école"


def test_stream_dedup_semantic(ray_session):
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.randn(3, 8) * 8
    rows = []
    for i in range(60):
        base = centers[i % 3] + rng.randn(8) * 2.0
        for j in range(2):  # every item + one near-copy
            rows.append({"vec_id": 2 * i + j,
                         "embedding": (base + rng.randn(8) * 1e-4)
                         .astype("float32").tolist()})
    s = Stream.from_arrow(pa.Table.from_pylist(rows))
    out = s.dedup_semantic(k=3, eps=0.999, seed=5,
                           sample_size=200).to_pandas()
    assert len(out) == 120
    # one survivor per near-copy pair (both land in the same cluster)
    assert int(out["keep"].sum()) == 60


def test_stream_lm_scoring(sf_dir):
    from gush_ray.api import Stream

    docs = Stream.from_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    lm = docs.train_lm(min_count=2)
    oov = docs.lm_oov(lm).to_pandas()
    assert {"doc_id", "n_bigrams", "n_oov"} <= set(oov.columns)
    assert (oov["n_oov"] <= oov["n_bigrams"]).all()
    # trained on the full corpus with min_count=2: mostly in-vocab
    assert oov["n_oov"].sum() < 0.5 * oov["n_bigrams"].sum()
    ppl = docs.lm_perplexity(lm).to_pandas()
    assert ppl["nll"].notna().any() and (ppl["nll"].dropna() > 0).all()


def test_stream_web_ops(ray_session):
    import pandas as pd

    from gush_ray.api import Stream
    from gush_ray.datagen import gen_linked_pages

    pages = Stream.from_arrow(gen_linked_pages(n_urls=80, seed=3))
    edges = pages.extract_links(url_col="page_id")
    df = edges.to_pandas()
    assert set(df.columns) == {"src_url", "dst_url"}
    assert len(df) > 50

    # canonicalize in place and into a new column
    raw = pa.table({"url": ["HTTP://A.com:80/x/", "http://a.com/x"]})
    inplace = Stream.from_arrow(raw).canonicalize_urls().to_pandas()
    assert inplace["url"].tolist() == ["http://a.com/x", "http://a.com/x"]
    added = Stream.from_arrow(raw).canonicalize_urls(out="canon").to_pandas()
    assert list(added.columns) == ["url", "canon"]

    # fluent pagerank over a hand graph == the stage function directly
    e = Stream.from_arrow(pa.table({"src": [0, 1], "dst": [1, 0]}))
    n = Stream.from_arrow(pa.table({"node": [0, 1]}))
    pr = e.pagerank(n, iters=3).to_pandas().sort_values("node")
    assert pr["rank_micro"].tolist() == [10**12 // 2] * 2


def test_stream_web_ops_round3(ray_session):
    from gush_ray.api import Stream

    # triangle counts over a K3 with a reversed duplicate edge
    e = Stream.from_arrow(pa.table({"src": [0, 1, 2, 1],
                                    "dst": [1, 2, 0, 0]}))
    tri = e.triangle_counts(num_partitions=2).to_pandas()
    assert dict(zip(tri["node"], tri["n_tri"])) == {0: 1, 1: 1, 2: 1}

    # host derivation
    t = pa.table({"url": ["https://a.example.org/p/1", "nope"]})
    got = Stream.from_arrow(t).hosts().to_pandas()
    assert got["host"].tolist()[0] == "a.example.org"
    assert pd.isna(got["host"].tolist()[1])

    # boilerplate removal end to end through the fluent form
    docs = pa.table({
        "doc_id": [0, 1, 2],
        "host": ["A", "A", "A"],
        "text": ["nav\nx", "nav\ny", "nav\nz"],
    })
    out = Stream.from_arrow(docs).remove_boilerplate(min_docs=3).to_pandas()
    assert sorted(out["text"]) == ["x", "y", "z"]


def test_stream_redirects_and_probe(ray_session):
    from gush_ray.api import Stream

    e = Stream.from_arrow(pa.table({
        "src": ["a", "b", "p", "q"],
        "dst": ["b", "T", "q", "p"],
    }))
    got = e.resolve_redirects(num_partitions=2).to_pandas()
    rows = {r.src_url: (r.final_url, r.n_hops, r.resolved)
            for r in got.itertuples()}
    assert rows["a"] == ("T", 2, True)
    assert rows["p"] == ("", -1, False)

    t = pa.table({"f1": [1, 2, 3, 4], "f2": [2, 1, 5, 3],
                  "y": [10, 13, 22, 21]})
    fit = Stream.from_arrow(t).linear_probe(["f1", "f2"], "y")
    assert list(fit.columns) == ["n_rows", "det", "b0_micro", "b1_micro",
                                 "b2_micro"]
    assert fit.iloc[0]["n_rows"] == 4
