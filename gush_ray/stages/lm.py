"""N-gram language-model quality scoring (CCNet-style perplexity filter).

CCNet (Wenzek et al. 2019, arXiv:1911.00359) filters web text by the
perplexity of a language model trained on a trusted corpus: low-quality
/ wrong-language documents score high and are dropped or bucketed. The
from-scratch stand-in here is a word-bigram model with add-k smoothing
and unigram backoff — small enough to broadcast, rich enough that the
scores separate clean text from shuffled/garbage text (pinned by test).

Shapes (the 100-TB discipline):

* **training** is one combiner-shuffle over hashed-gram partial counts
  (``partial_aggregate``) — documents never shuffle, and the model is
  truncated to the top-``max_table`` bigrams/unigrams by count BEFORE it
  leaves the cluster, so the driver/broadcast payload is bounded by a
  constant, not by corpus vocabulary;
* **scoring** broadcasts the model once via ``ray.put`` and runs
  vectorized membership (``np.isin`` against sorted hash arrays) per
  batch — no shuffle at all.

Two score surfaces:

* :func:`score_oov` — integer bigram out-of-vocabulary counts (the
  membership core; integers make it exactly SQL-verifiable, so the
  driver oracle covers the whole train→broadcast→score machinery);
* :func:`score_perplexity` — smoothed per-word negative log-likelihood
  (the CCNet-style continuous score; floats, so rows-only, pinned by
  ordering tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray


def _word_pairs(text: str) -> tuple[list[str], list[str]]:
    words = text.split()
    return words, [f"{a}\x00{b}" for a, b in zip(words, words[1:])]


def _hash64(values: list[str] | np.ndarray) -> np.ndarray:
    from gush_ray.stages.dedup import hash_object_chunks

    arr = np.asarray(values, dtype=object)
    if len(arr) == 0:
        return np.array([], dtype=np.uint64)
    return hash_object_chunks(arr)


def train_bigram_lm(ds, col: str = "text", min_count: int = 2,
                    max_table: int = 500_000,
                    num_partitions: int = 8) -> dict:
    """Train the bigram LM distributed; returns a broadcast-ready dict:
    sorted uint64 hash arrays + counts for bigrams and unigrams, plus
    the total token count. Only hashed-gram count partials shuffle."""
    from gush_ray.stages.agg import partial_aggregate

    def grams(b: pd.DataFrame) -> pd.DataFrame:
        uni: list[str] = []
        bi: list[str] = []
        for t in b[col].fillna(""):
            w, p = _word_pairs(t)
            uni.extend(w)
            bi.extend(p)
        h = np.concatenate([
            _hash64(uni), _hash64(bi),
        ]) if (uni or bi) else np.array([], dtype=np.uint64)
        kind = np.concatenate([
            np.zeros(len(uni), dtype=np.int8),
            np.ones(len(bi), dtype=np.int8),
        ]) if (uni or bi) else np.array([], dtype=np.int8)
        # collapse within the batch first: the shuffle moves one row per
        # distinct gram per batch, not one per token
        df = pd.DataFrame({"g": h, "kind": kind})
        return df.groupby(["kind", "g"], as_index=False).size().rename(
            columns={"size": "n"})

    counts_ds = partial_aggregate(
        ds.map_batches(grams, batch_format="pandas"),
        ["kind", "g"], {"n": ("n", "sum")},
        num_partitions=num_partitions,
    )

    # prune BEFORE anything reaches the driver: the min_count filter and
    # a per-block top-max_table cut run distributed, so driver volume is
    # ≤ num_partitions × 2 × max_table rows — bounded by configuration,
    # never by corpus vocabulary (the raw distinct-gram table at 10^12
    # docs is exactly the thing the driver must not hold)
    def prune(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["n"] >= min_count]
        return (b.sort_values(["n", "g"], ascending=[False, True],
                              kind="mergesort")
                .groupby("kind", sort=False).head(max_table))

    counts = counts_ds.map_batches(
        prune, batch_format="pandas"
    ).to_pandas()
    out: dict = {}
    for kind, key in ((0, "uni"), (1, "bi")):
        sub = counts[counts["kind"] == kind]
        if len(sub) > max_table:  # final cut across partitions
            # deterministic tie-break: (count desc, hash) so equal-count
            # grams at the boundary don't flap with block layout
            sub = sub.sort_values(["n", "g"],
                                  ascending=[False, True]).head(max_table)
        g = sub["g"].to_numpy(dtype=np.uint64)
        n = sub["n"].to_numpy(dtype=np.int64)
        order = np.argsort(g)
        out[f"{key}_h"] = g[order]
        out[f"{key}_n"] = n[order]
    out["total_tokens"] = int(counts[counts["kind"] == 0]["n"].sum())
    return out


def _lookup(sorted_h: np.ndarray, sorted_n: np.ndarray,
            h: np.ndarray) -> np.ndarray:
    """Counts for each hash (0 if absent) via searchsorted."""
    if len(sorted_h) == 0 or len(h) == 0:
        return np.zeros(len(h), dtype=np.int64)
    idx = np.searchsorted(sorted_h, h)
    idx = np.clip(idx, 0, len(sorted_h) - 1)
    hit = sorted_h[idx] == h
    return np.where(hit, sorted_n[idx], 0)


def score_oov(ds, lm_ref, col: str = "text", id_cols: tuple = ("doc_id",)):
    """Per-document integer counts against the broadcast LM: total
    bigrams and how many are out-of-vocabulary. Exact semantics (no
    smoothing, no floats) — the SQL-verifiable core of the filter."""

    def score(b: pd.DataFrame) -> pd.DataFrame:
        lm = ray.get(lm_ref) if not isinstance(lm_ref, dict) else lm_ref
        n_bi = np.zeros(len(b), dtype=np.int64)
        n_oov = np.zeros(len(b), dtype=np.int64)
        for i, t in enumerate(b[col].fillna("")):
            _w, pairs = _word_pairs(t)
            if not pairs:
                continue
            cnt = _lookup(lm["bi_h"], lm["bi_n"], _hash64(pairs))
            n_bi[i] = len(pairs)
            n_oov[i] = int((cnt == 0).sum())
        out = b[list(id_cols)].copy()
        out["n_bigrams"] = n_bi
        out["n_oov"] = n_oov
        return out

    return ds.map_batches(score, batch_format="pandas")


def score_perplexity(ds, lm_ref, col: str = "text",
                     id_cols: tuple = ("doc_id",), add_k: float = 0.1):
    """CCNet-style per-word NLL (nats): add-k-smoothed bigram
    probability with unigram-frequency backoff for unseen contexts.
    Lower = more like the training corpus. Floats → rows-only surface;
    order-stable because each doc's sum is computed in one numpy call
    over its own grams."""

    def score(b: pd.DataFrame) -> pd.DataFrame:
        lm = ray.get(lm_ref) if not isinstance(lm_ref, dict) else lm_ref
        total = max(lm["total_tokens"], 1)
        vocab = max(len(lm["uni_h"]), 1)
        nll = np.full(len(b), np.nan)
        n_words = np.zeros(len(b), dtype=np.int64)
        for i, t in enumerate(b[col].fillna("")):
            words, pairs = _word_pairs(t)
            n_words[i] = len(words)
            if not pairs:
                continue
            c_bi = _lookup(lm["bi_h"], lm["bi_n"], _hash64(pairs))
            c_ctx = _lookup(lm["uni_h"], lm["uni_n"],
                            _hash64(words[:-1]))
            c_w = _lookup(lm["uni_h"], lm["uni_n"], _hash64(words[1:]))
            p_bi = (c_bi + add_k) / (c_ctx + add_k * vocab)
            p_uni = (c_w + add_k) / (total + add_k * vocab)
            p = np.where(c_ctx > 0, p_bi, p_uni)
            nll[i] = float(-np.log(p).mean())
        out = b[list(id_cols)].copy()
        out["n_words"] = n_words
        out["nll"] = np.round(nll, 4)
        return out

    return ds.map_batches(score, batch_format="pandas")
