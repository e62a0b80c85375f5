"""Decontamination + exact-substring-duplication stage semantics:
brute-force parity on small corpora, the winnowing detection guarantee,
Bloom one-sided error, and removal invariants."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gush_ray.stages.decontam import (
    _rolling_hashes,
    _winnow_select,
    collect_bench_grams,
    contamination_hits,
    decontaminate,
    decontaminate_bloom,
    doc_ngrams,
    duplicated_spans,
    remove_duplicated_spans,
    window_fingerprints,
)


def _docs(rows):
    return rd.from_pandas(pd.DataFrame(rows))


CORPUS = [
    {"doc_id": 0, "text": "the cat sat on the mat and looked around"},
    {"doc_id": 1, "text": "a dog ran over the hill very fast today"},
    {"doc_id": 2, "text": "the cat sat on a chair instead of it"},
    {"doc_id": 3, "text": "completely unrelated words fill this one up"},
]
BENCH = [
    {"doc_id": 100, "text": "yes the cat sat on something"},
    {"doc_id": 101, "text": "nothing shared here whatsoever friend"},
]


# ----------------------------------------------------------- decontam

def test_doc_ngrams_matches_sql_split_semantics():
    assert doc_ngrams("a b c d", 3) == {"a b c", "b c d"}
    assert doc_ngrams("a b", 3) == set()
    assert doc_ngrams("", 3) == set()
    # double space yields an empty token, like string_split(text, ' '),
    # and array_to_string re-joins across it — parity with the SQL side
    assert doc_ngrams("a  b c", 3) == {"a  b", " b c"}
    assert "a  b c".split(" ") == ["a", "", "b", "c"]


def test_contamination_hits_brute_force():
    grams = collect_bench_grams(_docs(BENCH), n=3)
    out = contamination_hits(_docs(CORPUS), grams, n=3).to_pandas()
    want = {}
    bench_grams = set()
    for r in BENCH:
        bench_grams |= doc_ngrams(r["text"], 3)
    for r in CORPUS:
        h = len(doc_ngrams(r["text"], 3) & bench_grams)
        if h:
            want[r["doc_id"]] = h
    got = dict(zip(out["doc_id"], out["n_hits"]))
    assert got == want
    assert 0 in got and 2 in got  # "the cat sat" / "cat sat on" overlap


def test_decontaminate_keeps_only_clean_docs():
    kept = decontaminate(_docs(CORPUS), _docs(BENCH), n=3).to_pandas()
    bench_grams = set()
    for r in BENCH:
        bench_grams |= doc_ngrams(r["text"], 3)
    clean_ids = {r["doc_id"] for r in CORPUS
                 if not (doc_ngrams(r["text"], 3) & bench_grams)}
    assert set(kept["doc_id"]) == clean_ids
    assert len(kept.columns) == 2  # corpus schema unchanged


def test_bloom_decontaminate_never_keeps_contaminated():
    """One-sided error: the Bloom path may over-drop but must never keep
    a doc the exact path drops."""
    exact = set(decontaminate(_docs(CORPUS), _docs(BENCH), n=3)
                .to_pandas()["doc_id"])
    bloom = set(decontaminate_bloom(_docs(CORPUS), _docs(BENCH), n=3)
                .to_pandas()["doc_id"])
    assert bloom <= exact
    # at this tiny scale the default-sized filter has ~zero fpp
    assert bloom == exact


def test_collect_bench_grams_guard():
    with pytest.raises(ValueError, match="max_grams"):
        collect_bench_grams(_docs(CORPUS), n=3, max_grams=2)


# ------------------------------------------------- duplicated spans

def _brute_spans(texts_by_id: dict, k: int) -> dict:
    """Content-equality reference: per-doc merged spans of duplicated
    k-char windows (count>1 corpus-wide)."""
    from collections import Counter
    c = Counter()
    for t in texts_by_id.values():
        for i in range(len(t) - k + 1):
            c[t[i:i + k]] += 1
    out = {}
    for did, t in texts_by_id.items():
        pos = [i for i in range(len(t) - k + 1) if c[t[i:i + k]] > 1]
        spans = []
        for p in pos:
            if spans and p <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], max(spans[-1][1], p + k - 1))
            else:
                spans.append((p, p + k - 1))
        if spans:
            out[did] = (len(spans), sum(e - s + 1 for s, e in spans))
    return out


DUP_CORPUS = [
    {"doc_id": 0,
     "text": "PREFIX shared duplicated content block here SUFFIX one"},
    {"doc_id": 1,
     "text": "other shared duplicated content block here trailing two"},
    {"doc_id": 2, "text": "no overlap with anything else at all in this"},
    # within-doc repeat: the window repeats inside one document
    {"doc_id": 3,
     "text": "zzz REPEATREPEATREPEATREPEATREPEAT mid REPEATREPEATREPEATREPEATREPEAT end"},
]


def test_duplicated_spans_matches_brute_force():
    k = 20
    got = duplicated_spans(_docs(DUP_CORPUS), k=k,
                           num_partitions=4).to_pandas()
    want = _brute_spans({r["doc_id"]: r["text"] for r in DUP_CORPUS}, k)
    got_d = {int(r.doc_id): (int(r.n_spans), int(r.dup_chars))
             for r in got.itertuples()}
    assert got_d == want
    assert 0 in got_d and 1 in got_d and 3 in got_d and 2 not in got_d


def test_duplicated_spans_fixture_brute_force(sf_dir):
    """Hash-based detection == content-based detection on the real
    fixture corpus (validates the 128-bit no-collision assumption)."""
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    k = 30
    got = duplicated_spans(rd.from_pandas(t), k=k,
                           num_partitions=4).to_pandas()
    want = _brute_spans(dict(zip(t.doc_id, t.text)), k)
    got_d = {int(r.doc_id): (int(r.n_spans), int(r.dup_chars))
             for r in got.itertuples()}
    assert got_d == want
    assert len(got_d) > 0


def test_winnow_detects_long_spans():
    """Winnowing guarantee: a duplicated span of length ≥ k + w - 1 is
    still detected with w-winnowed fingerprints."""
    k, w = 12, 4
    shared = "abcdefghijklmnopqrstuvwxyz0123456789"  # len 36 ≥ k+w-1
    docs = [
        {"doc_id": 0, "text": "xx " + shared + " left side padding"},
        {"doc_id": 1, "text": "totally different " + shared + " yy"},
        {"doc_id": 2, "text": "nothing in common with the others here ok"},
    ]
    got = duplicated_spans(_docs(docs), k=k, num_partitions=2,
                           winnow_w=w).to_pandas()
    assert set(got["doc_id"]) >= {0, 1}
    assert 2 not in set(got["doc_id"])


def test_winnow_shrinks_fingerprint_volume():
    texts = [r["text"] for r in DUP_CORPUS]
    di, pos, h1, _h2 = _rolling_hashes(texts, 10)
    m = _winnow_select(di, pos, h1, 6)
    # expected density ~2/(w+1); allow generous slack on tiny input
    assert m.sum() < 0.6 * len(m)
    all_fp = window_fingerprints(_docs(DUP_CORPUS), k=10).count()
    few_fp = window_fingerprints(_docs(DUP_CORPUS), k=10,
                                 winnow_w=6).count()
    assert few_fp < all_fp


def test_remove_duplicated_spans_invariants():
    k = 20
    out = remove_duplicated_spans(_docs(DUP_CORPUS), k=k,
                                  num_partitions=4).to_pandas()
    stats = duplicated_spans(_docs(DUP_CORPUS), k=k,
                             num_partitions=4).to_pandas()
    by_id = {r["doc_id"]: r["text"] for r in DUP_CORPUS}
    removed = dict(zip(out.doc_id, out.removed_chars))
    dup_chars = dict(zip(stats.doc_id, stats.dup_chars))
    assert len(out) == len(DUP_CORPUS)
    for r in out.itertuples():
        orig = by_id[int(r.doc_id)]
        want_removed = int(dup_chars.get(int(r.doc_id), 0))
        assert int(r.removed_chars) == want_removed
        assert len(r.text) == len(orig) - want_removed
        if want_removed == 0:
            assert r.text == orig
    # the untouched doc survives byte-identical
    assert removed[2] == 0


def test_rolling_hash_equal_content_equal_hash():
    texts = ["shared window content here!", "yy shared window content here!"]
    di, pos, h1, h2 = _rolling_hashes(texts, 14)
    seen = {}
    for d, p, a, b in zip(di, pos, h1, h2):
        content = texts[d][p:p + 14]
        key = (int(a), int(b))
        if content in seen:
            assert seen[content] == key
        else:
            seen[content] = key
    # and distinct contents → distinct hashes on this input
    assert len(set(seen.values())) == len(seen)


def test_rolling_hash_rejects_non_ascii():
    with pytest.raises(ValueError, match="non-ascii"):
        _rolling_hashes(["héllo world padded out"], 5)
