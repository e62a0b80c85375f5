"""Dedup family + similarity + multimodal + extra-query tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from gush_ray.pipelines.queries_extra import EXTRA_QUERIES

SF_DIR = "/root/testdata/sf0.001"


def corpus_with_dups():
    base = [
        ("the quick brown fox jumps over the lazy dog again and again", 1),
        ("an entirely different document about ray data pipelines", 2),
        ("numbers and words mixed together in a long stream of text", 3),
    ]
    rows = []
    for text, did in base:
        rows.append({"doc_id": did, "text": text})
        # near-dup: last word changed
        rows.append({"doc_id": did + 100,
                     "text": " ".join(text.split()[:-1] + ["changed"])})
    rows.append({"doc_id": 999, "text": "totally unrelated tiny text"})
    return rd.from_pandas(pd.DataFrame(rows))


def test_minhash_finds_near_dups():
    from gush_ray.stages.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(corpus_with_dups(), threshold=0.5).to_pandas()
    found = set(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()))
    assert {(1, 101), (2, 102), (3, 103)} <= found
    # unrelated docs must not pair
    assert not any(999 in p for p in found)


def test_simhash_finds_near_dups():
    # simhash needs long-ish docs: one changed word in 60 flips few bits,
    # keeping hamming within the 4x16-bit banding guarantee (<=3)
    from gush_ray.stages.dedup import simhash_near_dup_pairs

    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lam mu nu xi omicron pi rho sigma tau upsilon").split()
    rows = []
    for did in (1, 2, 3):
        base = " ".join(words[(did + i) % len(words)] for i in range(60))
        rows.append({"doc_id": did, "text": base})
        rows.append({"doc_id": did + 100,
                     "text": base.rsplit(" ", 1)[0] + " changed"})
    ds = rd.from_pandas(pd.DataFrame(rows))
    pairs = simhash_near_dup_pairs(ds, max_hamming=8).to_pandas()
    found = set(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()))
    assert {(1, 101), (2, 102), (3, 103)} <= found


def test_ngram_jaccard_exact():
    from gush_ray.stages.dedup import ngram_jaccard_verify

    texts = {1: "a b c d e", 2: "a b c d x"}
    pairs = pd.DataFrame({"doc_a": [1], "doc_b": [2], "est_jaccard": [0.5]})
    out = ngram_jaccard_verify(pairs, texts, n=3)
    # 3-grams: {abc,bcd,cde} vs {abc,bcd,cdx}: |∩|=2 |∪|=4
    assert out.iloc[0]["jaccard"] == 0.5


def test_embedding_near_dup_self_plus_noise():
    from gush_ray.stages.dedup import embedding_near_dup_pairs

    rng = np.random.RandomState(0)
    base = rng.randn(20, 16)
    noisy = base + rng.randn(20, 16) * 0.01  # ~identical directions
    mat = np.vstack([base, noisy])
    ids = np.arange(40)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              type=pa.list_(pa.float32())),
    }))
    pairs = embedding_near_dup_pairs(ds, threshold=0.99).to_pandas()
    found = set(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()))
    # OR-amplified banding: collision prob ≈0.99+ at cosine ~0.9999
    hits = sum((i, i + 20) in found for i in range(20))
    assert hits >= 18


def test_multimodal_stub_plumbing():
    from gush_ray.stages.multimodal import (
        DecodeFeaturesStub,
        FEATURE_DIM,
        sniff_blob_batch,
    )

    t = pa.table({
        "id": [1, 2],
        "html": pa.array([b"\x89PNG\r\n fake", b"<!DOCTYPE html><p>x"],
                         type=pa.binary()),
    })
    sniffed = sniff_blob_batch(t)
    assert sniffed["blob_kind"].to_pylist() == ["png", "html"]
    stage = DecodeFeaturesStub(blob_col="html")
    out = stage(t)
    assert "html" not in out.column_names
    assert out["features"].type.list_size == FEATURE_DIM
    # deterministic fake
    out2 = DecodeFeaturesStub(blob_col="html")(t)
    assert out.equals(out2)
    # real-codec path is explicitly unimplemented
    with pytest.raises(NotImplementedError):
        DecodeFeaturesStub(blob_col="html", use_real_codec=True)._decode_impl(b"x")


@pytest.mark.parametrize(
    "name", [n for n in EXTRA_QUERIES if not n.startswith("pages_")]
)
def test_extra_queries_run_and_are_deterministic(name):
    fn, _ = EXTRA_QUERIES[name]
    r1 = fn(SF_DIR)
    r1 = r1.to_pandas() if hasattr(r1, "to_pandas") else r1
    assert len(r1) >= 0 and len(r1.columns) > 0
    r2 = fn(SF_DIR)
    r2 = r2.to_pandas() if hasattr(r2, "to_pandas") else r2
    a = r1.sort_values(list(r1.columns)).reset_index(drop=True)
    b = r2.sort_values(list(r2.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_minhash_recall_on_mutated_corpus():
    from gush_ray.pipelines.queries_extra import q_minhash_dedup

    pairs = q_minhash_dedup(SF_DIR)
    # ground truth: every doc_id pairs with doc_id + 1_000_000
    truth_hits = pairs[pairs["doc_b"] == pairs["doc_a"] + 1_000_000]
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows
    recall = len(truth_hits) / n_docs
    assert recall >= 0.8, f"minhash recall {recall:.2f}"


def test_pages_flagship_query_runs():
    fn, _ = EXTRA_QUERIES["pages_flagship"]
    out = fn(SF_DIR)
    assert len(out) > 0
    assert {"lang", "change_kind", "window_id", "n"} <= set(out.columns)


def test_extract_parity_query_all_identical():
    fn, _ = EXTRA_QUERIES["extract_parity"]
    out = fn(SF_DIR)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    # every successfully-extracted row is byte-identical
    assert (out["n_identical"] == out["n_ok"]).all()
    assert out["n_ok"].sum() > 0


def test_duplicate_clusters_union_find():
    from gush_ray.stages.dedup import cluster_summary, duplicate_clusters

    pairs = pd.DataFrame(
        {"doc_a": [1, 2, 10, 20], "doc_b": [2, 3, 11, 21]}
    )
    cl = duplicate_clusters(pairs)
    m = dict(zip(cl.doc_id, cl.cluster_id))
    assert m[1] == m[2] == m[3] == 1
    assert m[10] == m[11] == 10
    assert m[20] == m[21] == 20
    s = cluster_summary(cl)
    assert list(s.n_members) == [3, 2, 2]
    assert list(s.keep_doc_id) == [1, 10, 20]


def test_embedding_lsh_recall_vs_exact():
    """LSH near-dup recall audited against the exact all-pairs baseline
    on the ground-truth perturbed corpus."""
    from gush_ray.pipelines.queries_extra import (
        _emb_dup_corpus, q_embedding_near_dup,
    )
    from gush_ray.stages.similarity import exact_cosine_pairs

    corpus = _emb_dup_corpus(SF_DIR)
    exact = exact_cosine_pairs(corpus, threshold=0.95).to_pandas()
    lsh = q_embedding_near_dup(SF_DIR)
    e = set(zip(exact.doc_a, exact.doc_b))
    l = set(zip(lsh.doc_a, lsh.doc_b))
    assert l <= e  # exact verification inside buckets → precision 1.0
    assert len(e) > 0
    recall = len(l & e) / len(e)
    assert recall >= 0.9, f"LSH recall {recall:.3f}"


def test_distributed_clusters_match_union_find():
    """Min-label propagation (the distributed/100-TB path) must produce
    the identical (doc_id, cluster_id) mapping as driver union-find —
    including a chain (propagation depth > 1)."""
    from gush_ray.stages.dedup import (
        duplicate_clusters, duplicate_clusters_distributed,
    )

    pairs = pd.DataFrame({
        "doc_a": [1, 2, 3, 10, 20, 30, 31],
        "doc_b": [2, 3, 4, 11, 21, 31, 32],   # chain 1-2-3-4, chain 30-31-32
    })
    ref = duplicate_clusters(pairs).sort_values("doc_id")
    got = (
        duplicate_clusters_distributed(rd.from_pandas(pairs))
        .to_pandas().sort_values("doc_id")
    )
    pd.testing.assert_frame_equal(
        ref.reset_index(drop=True),
        got[["doc_id", "cluster_id"]].reset_index(drop=True),
        check_dtype=False,
    )


def test_distributed_clusters_on_fixture_corpus():
    """Cluster parity old-vs-new on the real fixture pipeline output."""
    from gush_ray.stages.dedup import (
        duplicate_clusters, duplicate_clusters_distributed, minhash_lsh_pairs,
    )
    from gush_ray.pipelines.queries_extra import _dup_corpus

    pairs = minhash_lsh_pairs(_dup_corpus(SF_DIR), threshold=0.5).materialize()
    ref = duplicate_clusters(pairs.to_pandas()).sort_values("doc_id")
    got = (duplicate_clusters_distributed(pairs)
           .to_pandas().sort_values("doc_id"))
    pd.testing.assert_frame_equal(
        ref.reset_index(drop=True),
        got[["doc_id", "cluster_id"]].reset_index(drop=True),
        check_dtype=False,
    )


def test_ngram_jaccard_join_matches_broadcast_dict():
    """The hash-join verification path (no driver-side corpus dict) must
    produce identical jaccard values to the reference broadcast-dict
    implementation."""
    from gush_ray.stages.dedup import (
        minhash_lsh_pairs, ngram_jaccard_pairs, ngram_jaccard_verify,
    )

    corpus = corpus_with_dups()
    pairs = minhash_lsh_pairs(corpus, threshold=0.3).materialize()
    cdf = corpus.to_pandas()
    ref = ngram_jaccard_verify(
        pairs.to_pandas(), dict(zip(cdf["doc_id"], cdf["text"])), n=3
    ).sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    got = (
        ngram_jaccard_pairs(corpus, pairs, n=3)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        ref[["doc_a", "doc_b", "jaccard"]],
        got[["doc_a", "doc_b", "jaccard"]],
        check_dtype=False,
    )


def test_ngram_jaccard_distributed_semi_matches_broadcast():
    """The distributed semi-filter (candidate ids stay a Dataset,
    corpus inner-joined against them — zero driver-side pair state) must
    produce identical output to the broadcast id-set fast path."""
    from gush_ray.stages.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    corpus = corpus_with_dups()
    pairs = minhash_lsh_pairs(corpus, threshold=0.3).materialize()
    ref = (
        ngram_jaccard_pairs(corpus, pairs, n=3, broadcast_ids=True)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    got = (
        ngram_jaccard_pairs(corpus, pairs, n=3, broadcast_ids=False)
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    cols = ["doc_a", "doc_b", "jaccard"]
    pd.testing.assert_frame_equal(ref[cols], got[cols], check_dtype=False)


def test_minhash_batch_vectorized_parity():
    """The batch-vectorized minhash (concat + minimum.reduceat) must
    produce byte-identical signatures to the per-doc reference math."""
    from gush_ray.stages.dedup import (
        _MERSENNE, _perm_params, _token_hashes, minhash_batch,
    )

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"]).head(200)
    docs.loc[docs.index[:2], "text"] = ["", "one two"]  # short/empty docs
    got = minhash_batch(docs.copy(), num_perm=64, shingle=3, seed=1234)

    a, b = _perm_params(64, 1234)
    for i, (did, text) in enumerate(zip(docs["doc_id"], docs["text"].fillna(""))):
        h = _token_hashes(text, 3)
        ref = ((h[:, None] * a[None, :] + b[None, :]) % _MERSENNE).min(axis=0)
        assert (got["sig"].iloc[i] == ref).all(), f"doc {did} mismatch"


def test_minhash_batch_chunking_parity():
    """Chunk boundaries must not change signatures (force tiny chunks)."""
    import gush_ray.stages.dedup as D

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"]).head(50)
    full = D.minhash_batch(docs.copy())
    orig = D._MINHASH_CHUNK_TOKENS
    try:
        D._MINHASH_CHUNK_TOKENS = 7  # force many tiny doc chunks
        tiny = D.minhash_batch(docs.copy())
    finally:
        D._MINHASH_CHUNK_TOKENS = orig
    for s1, s2 in zip(full["sig"], tiny["sig"]):
        assert (s1 == s2).all()


def test_fingerprint_batch_vectorized_parity():
    from gush_ray.stages.text import fingerprint_batch

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"]).head(200)
    docs.loc[docs.index[0], "text"] = None     # null row → 0
    docs.loc[docs.index[1], "text"] = "abc"    # shorter than shingle
    got = fingerprint_batch(docs.copy(), shingle=5)

    def ref_fp(s):
        if s is None:
            return np.uint64(0)
        if len(s) <= 5:
            return pd.util.hash_array(np.array([s], dtype=object))[0]
        grams = np.array([s[i:i + 5] for i in range(len(s) - 4)],
                         dtype=object)
        return pd.util.hash_array(grams, categorize=False).min()

    for i, s in enumerate(docs["text"]):
        assert got["fingerprint"].iloc[i] == ref_fp(s), f"row {i}"


def test_exact_cosine_pairs_guard():
    """The O(n²) exact baseline must fail fast when invoked beyond its
    small-by-contract input size instead of broadcasting a corpus."""
    from gush_ray.stages.similarity import exact_cosine_pairs

    emb = pd.DataFrame({
        "vec_id": range(50),
        "embedding": [np.ones(4, dtype=np.float32).tolist()] * 50,
    })
    ds = rd.from_pandas(emb)
    with pytest.raises(ValueError, match="max_rows"):
        exact_cosine_pairs(ds, threshold=0.5, max_rows=10)
    # under the cap it still works
    out = exact_cosine_pairs(ds, threshold=0.5, max_rows=100).to_pandas()
    assert len(out) == 50 * 49 // 2


def test_lsh_index_build_once_and_pruned_read(tmp_path):
    """Build-once LSH index: bucket-partitioned layout, query reads <20%
    of the index bytes, results agree with the per-query LSH scan."""
    from gush_ray.stages.similarity import (
        build_lsh_index, lsh_bucket_topk, lsh_index_scan_fraction,
        lsh_index_topk,
    )
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    emb = rd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    idx = str(tmp_path / "lsh_idx")
    build_lsh_index(emb, idx, n_planes=6)
    # layout: hive bucket dirs
    import os
    buckets = [d for d in os.listdir(idx) if d.startswith("bucket=")]
    assert len(buckets) > 4

    qtab = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    qvec = np.array(
        qtab.filter(pc.equal(qtab["vec_id"], 0))["embedding"][0].as_py(),
        dtype=np.float64,
    )
    got = lsh_index_topk(idx, qvec, k=10, n_planes=6)
    ref = lsh_bucket_topk(emb, qvec, k=10, n_planes=6)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), ref.reset_index(drop=True)
    )
    frac = lsh_index_scan_fraction(idx, qvec, n_planes=6)
    assert 0 < frac < 0.2, f"probed fraction {frac:.3f}"
    # build is idempotent: second call reuses, results identical
    build_lsh_index(emb, idx, n_planes=6)
    again = lsh_index_topk(idx, qvec, k=10, n_planes=6)
    pd.testing.assert_frame_equal(got, again)
    # parameter mismatch against an existing index fails loudly instead
    # of silently probing a stale bucket layout
    with pytest.raises(ValueError, match="built with"):
        build_lsh_index(emb, idx, n_planes=8)
    with pytest.raises(ValueError, match="queried with"):
        lsh_index_topk(idx, qvec, k=10, n_planes=8)


def test_ivf_index_clustered_recall_and_pruning(tmp_path):
    """IVF (trained, data-adaptive) vs the data-oblivious LSH cut: on a
    clustered corpus a query near a cluster center gets perfect recall
    probing ~1/8 of the lists, because k-means lists track the clusters."""
    from gush_ray.stages.similarity import (
        brute_force_topk, build_ivf_index, ivf_index_topk,
        ivf_scan_fraction,
    )

    rng = np.random.RandomState(5)
    centers = rng.randn(8, 32) * 4
    rows = []
    for i in range(800):
        c = i % 8
        rows.append({"vec_id": i,
                     "embedding": (centers[c] + rng.randn(32) * 0.3)
                     .astype(np.float32).tolist()})
    ds = rd.from_pandas(pd.DataFrame(rows))
    idx = str(tmp_path / "ivf_clustered")
    build_ivf_index(ds, idx, n_lists=16, sample_size=400, seed=3)
    qvec = centers[2] + 0.05  # near cluster 2's center
    ref = set(brute_force_topk(ds, qvec, k=10)["vec_id"])
    got = set(ivf_index_topk(idx, qvec, k=10, n_probe=2)["vec_id"])
    assert got == ref, "clustered recall@10 must be perfect at n_probe=2"
    frac = ivf_scan_fraction(idx, qvec, n_probe=2)
    assert 0 < frac < 0.3, f"probed fraction {frac:.3f}"


def test_ivf_index_exact_at_full_probe_and_guards(tmp_path):
    """On the (near-random) embeddings fixture: n_probe=n_lists degrades
    to the exact scan; build is idempotent; param mismatch fails loudly."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from gush_ray.stages.similarity import (
        brute_force_topk, build_ivf_index, ivf_index_topk,
    )

    emb = rd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    idx = str(tmp_path / "ivf_fixture")
    build_ivf_index(emb, idx, n_lists=16, sample_size=400)
    qtab = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    qvec = np.array(
        qtab.filter(pc.equal(qtab["vec_id"], 7))["embedding"][0].as_py(),
        dtype=np.float64,
    )
    ref = brute_force_topk(emb, qvec, k=10)
    full = ivf_index_topk(idx, qvec, k=10, n_probe=16)
    pd.testing.assert_frame_equal(full.reset_index(drop=True),
                                  ref.reset_index(drop=True))
    # partial probe: top-k subset of candidates is still ordered by sim,
    # and every returned id scores what the exact scan says it scores
    part = ivf_index_topk(idx, qvec, k=10, n_probe=4)
    assert len(part) == 10
    assert (part["sim"].to_numpy()[:-1] >= part["sim"].to_numpy()[1:]).all()
    # idempotent rebuild reuses the index
    build_ivf_index(emb, idx, n_lists=16, sample_size=400)
    again = ivf_index_topk(idx, qvec, k=10, n_probe=16)
    pd.testing.assert_frame_equal(full, again)
    with pytest.raises(ValueError, match="built with"):
        build_ivf_index(emb, idx, n_lists=8, sample_size=400)


def test_langid_vectorized_parity():
    """Vectorized stopword scoring must reproduce the per-row reference
    scoring exactly, including the largest-lang tie-break and 'und'."""
    import re

    from gush_ray.stages.text import _STOP, LangIdModel

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"]).head(300)
    extra = pd.DataFrame({
        "doc_id": [-1, -2, -3],
        "text": ["", "zzz qqq xxx", "the der le el o"],  # und / und / tie
    })
    docs = pd.concat([docs, extra], ignore_index=True)
    got = LangIdModel()(docs.copy())["lang_pred"]

    token_re = re.compile(r"[\wéíáóúüßñàè]+", re.U)
    profiles = {lang: frozenset(ws) for lang, ws in _STOP.items()}

    def ref(t):
        ws = token_re.findall((t or "").lower())
        if not ws:
            return "und"
        scores = {lang: sum(w in prof for w in ws)
                  for lang, prof in profiles.items()}
        lang, score = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
        return lang if score > 0 else "und"

    for i, t in enumerate(docs["text"]):
        assert got.iloc[i] == ref(t), f"row {i}: {got.iloc[i]} != {ref(t)}"


def test_md5_hash_mode_matches_duckdb_and_fast_mode_contract():
    """The md5 verification hash (hash_fn='md5') must equal DuckDB's
    md5_number_lower on both str and bytes inputs — this equality is
    what makes every near-dup SQL oracle bit-exact — and the 'fast'
    mode must stay pd.util.hash_array (the bench path)."""
    import duckdb

    from gush_ray.stages.dedup import _hash_strings, md5_hash_strings

    vals = ["", "a", "hello world", "naïve häßlich", "x" * 1000]
    got = md5_hash_strings(vals)
    con = duckdb.connect()
    want = [con.execute("select md5_number_lower(?)", [v]).fetchone()[0]
            for v in vals]
    assert got.tolist() == want
    # bytes input (content-defined chunking hashes utf-8 chunk bytes)
    assert md5_hash_strings([b"hello world"])[0] == got[2]
    fast = _hash_strings(vals, "fast")
    assert fast.tolist() == pd.util.hash_array(
        np.asarray(vals, dtype=object), categorize=False).tolist()
    with pytest.raises(ValueError):
        _hash_strings(vals, "sha9000")


def test_langid_accented_tokens_match_sql_oracle(tmp_path):
    """Regression (round-3 review): the SQL token class omitted 'ã' —
    a letter in the baked pt stopword 'não' — so accented corpora
    diverged Python-vs-SQL. Both sides now share the CLOSED alphabet
    text.LANGID_TOKEN_CHARS; pin parity on an accent-heavy corpus."""
    import duckdb

    from gush_ray.pipelines.queries_extra import SQL_LANG_ID
    from gush_ray.stages.text import LangIdModel

    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "lang": ["pt", "pt", "en", "de", "es", "fr"],
        "text": ["o que é uma não coisa", "não não não é",
                 "the and of naïve-émü", "der die und das ist",
                 "el la los que", ""],
    })
    pred = LangIdModel()(df)
    want = (pred.groupby(["lang", "lang_pred"], as_index=False)
            .agg(n=("doc_id", "size"))
            .sort_values(["lang", "lang_pred"]).reset_index(drop=True))
    assert ("pt", "pt") in set(zip(want["lang"], want["lang_pred"]))
    p = tmp_path / "documents.parquet"
    df.to_parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}'")
    got = con.execute(SQL_LANG_ID).fetchdf()
    pd.testing.assert_frame_equal(want.astype({"n": "int64"}),
                                  got.astype({"n": "int64"}))
