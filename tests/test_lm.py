"""Bigram-LM quality scoring (CCNet-style): the score must separate
in-distribution text from garbage, training must bound its broadcast
payload, and the oracle-paired OOV surface must agree with brute force."""

import numpy as np
import pandas as pd
import pytest

import ray


@pytest.fixture(scope="module")
def corpus():
    import ray.data as rd

    rng = np.random.RandomState(42)
    vocab = [f"tok{i}" for i in range(50)]
    # clean docs: markov-ish chains (tok_i -> tok_{(i+1)%50}) with noise
    clean = []
    for d in range(60):
        i = int(rng.randint(0, 50))
        words = []
        for _ in range(80):
            words.append(vocab[i])
            i = (i + 1) % 50 if rng.rand() < 0.9 else int(rng.randint(0, 50))
        clean.append(" ".join(words))
    # garbage docs: tokens the LM never saw
    garbage = [
        " ".join(f"zzx{rng.randint(0, 10_000)}" for _ in range(80))
        for _ in range(20)
    ]
    df = pd.DataFrame({
        "doc_id": range(80),
        "text": clean + garbage,
        "is_garbage": [False] * 60 + [True] * 20,
    })
    return rd.from_pandas(df), df


def test_oov_separates_garbage(corpus):
    from gush_ray.stages.lm import score_oov, train_bigram_lm

    ds, df = corpus
    train = ds.filter(expr="doc_id < 40")  # clean-only training slice
    lm = train_bigram_lm(train, min_count=2)
    out = score_oov(ds, ray.put(lm)).to_pandas().merge(
        df[["doc_id", "is_garbage"]], on="doc_id")
    rate = out["n_oov"] / out["n_bigrams"].clip(lower=1)
    assert rate[out["is_garbage"]].min() > 0.99      # all-unseen bigrams
    assert rate[~out["is_garbage"]].mean() < 0.5     # chains mostly known


def test_oov_matches_bruteforce(corpus):
    """Distributed train+score == a plain-Python reference on the same
    split (mirrors what the DuckDB oracle pins for the fixture corpus)."""
    from collections import Counter

    from gush_ray.stages.lm import score_oov, train_bigram_lm

    ds, df = corpus
    train_df = df[df["doc_id"] < 40]
    cnt = Counter()
    for t in train_df["text"]:
        w = t.split()
        cnt.update(zip(w, w[1:]))
    known = {p for p, n in cnt.items() if n >= 2}

    lm = train_bigram_lm(ds.filter(expr="doc_id < 40"), min_count=2)
    got = score_oov(ds, ray.put(lm)).to_pandas().set_index("doc_id")
    for _i, row in df.iterrows():
        w = row["text"].split()
        pairs = list(zip(w, w[1:]))
        want_oov = sum(1 for p in pairs if p not in known)
        assert got.loc[row["doc_id"], "n_bigrams"] == len(pairs)
        assert got.loc[row["doc_id"], "n_oov"] == want_oov


def test_perplexity_separates_garbage(corpus):
    from gush_ray.stages.lm import score_perplexity, train_bigram_lm

    ds, df = corpus
    lm = train_bigram_lm(ds.filter(expr="doc_id < 40"), min_count=2)
    out = score_perplexity(ds, ray.put(lm)).to_pandas().merge(
        df[["doc_id", "is_garbage"]], on="doc_id")
    clean_nll = out.loc[~out["is_garbage"], "nll"]
    garbage_nll = out.loc[out["is_garbage"], "nll"]
    assert garbage_nll.min() > clean_nll.max() + 1.0  # clear margin


def test_train_bounds_broadcast_payload(corpus):
    from gush_ray.stages.lm import train_bigram_lm

    ds, _df = corpus
    lm = train_bigram_lm(ds, min_count=1, max_table=10)
    assert len(lm["bi_h"]) <= 10 and len(lm["uni_h"]) <= 10


def test_scores_deterministic(corpus):
    from gush_ray.stages.lm import (score_oov, score_perplexity,
                                    train_bigram_lm)

    ds, _df = corpus
    a_lm = train_bigram_lm(ds.filter(expr="doc_id < 40"), min_count=2)
    b_lm = train_bigram_lm(ds.filter(expr="doc_id < 40"), min_count=2)
    assert (a_lm["bi_h"] == b_lm["bi_h"]).all()
    assert (a_lm["uni_n"] == b_lm["uni_n"]).all()
    a = score_perplexity(ds, ray.put(a_lm)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    b = score_perplexity(ds, ray.put(b_lm)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    oa = score_oov(ds, ray.put(a_lm)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    ob = score_oov(ds, ray.put(b_lm)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(oa, ob)
