"""Distributed BPE tokenizer training + application.

Byte-pair encoding (Sennrich et al. 2016, arXiv:1508.07909) the way real
trainers run it at scale: the corpus collapses to a WORD HISTOGRAM first
(one combiner shuffle — the only distributed pass; documents never move
and each batch pre-collapses to its distinct words), the histogram is
pruned to the top ``max_words`` DISTRIBUTED before collection (driver
payload bounded by configuration, not corpus vocabulary — same
discipline as stages/lm.py), and the merge loop then runs on that
compact table driver-side, which is exact: BPE pair counts are a pure
function of the word histogram, so training on the histogram equals
training on the corpus (up to the prune).

Application broadcasts the merge ranks once (``ray.put``) and tokenizes
per batch with a per-worker word→tokens cache — web text repeats words
heavily, so the greedy merge loop runs once per DISTINCT word per
worker, not once per occurrence.

Determinism: merge selection breaks count ties lexicographically, and
the histogram prune tie-breaks on the word itself, so the learned vocab
is a pure function of (corpus, params).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

_END = "▁"  # end-of-word sentinel (SentencePiece-style marker)


def _word_hist(ds, col: str, max_words: int,
               num_partitions: int = 8) -> pd.DataFrame:
    from gush_ray.stages.agg import partial_aggregate

    def words(b: pd.DataFrame) -> pd.DataFrame:
        cnt: dict[str, int] = {}
        for t in b[col].fillna(""):
            for w in t.split():
                cnt[w] = cnt.get(w, 0) + 1
        return pd.DataFrame({"w": list(cnt), "n": list(cnt.values())})

    hist_ds = partial_aggregate(
        ds.map_batches(words, batch_format="pandas"),
        ["w"], {"n": ("n", "sum")}, num_partitions=num_partitions,
    )

    def prune(b: pd.DataFrame) -> pd.DataFrame:
        # distributed pre-prune: driver sees ≤ partitions × max_words
        return b.sort_values(["n", "w"], ascending=[False, True],
                             kind="mergesort").head(max_words)

    hist = hist_ds.map_batches(prune, batch_format="pandas").to_pandas()
    return hist.sort_values(["n", "w"], ascending=[False, True],
                            kind="mergesort").head(max_words)


def train_bpe(ds, col: str = "text", n_merges: int = 200,
              max_words: int = 100_000) -> dict:
    """Learn ``n_merges`` BPE merges from the corpus; returns
    {"merges": [(a, b), ...], "ranks": {(a, b): rank}}."""
    hist = _word_hist(ds, col, max_words)
    # symbol sequences per distinct word, weighted by frequency
    seqs = [tuple(w) + (_END,) for w in hist["w"]]
    freqs = hist["n"].to_numpy(dtype=np.int64)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for seq, f in zip(seqs, freqs):
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + int(f)
        if not pair_counts:
            break
        # deterministic argmax: count desc, pair lexicographic
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        new_seqs = []
        for seq in seqs:
            if a not in seq:
                new_seqs.append(seq)
                continue
            out = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs.append(tuple(out))
        seqs = new_seqs
    return {"merges": merges,
            "ranks": {m: r for r, m in enumerate(merges)}}


def _encode_word(word: str, ranks: dict) -> list[str]:
    seq = list(word) + [_END]
    while len(seq) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        seq[best_i: best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


class BpeTokenizer:
    """Actor-pool application stage: merge ranks arrive once via the
    broadcast ref; a per-actor word→tokens cache makes the greedy loop
    run once per DISTINCT word per actor."""

    def __init__(self, bpe_ref, col: str = "text",
                 id_cols: tuple = ("doc_id",)):
        bpe = ray.get(bpe_ref) if not isinstance(bpe_ref, dict) else bpe_ref
        self.ranks = bpe["ranks"]
        self.col = col
        self.id_cols = id_cols
        self.cache: dict[str, list[str]] = {}

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        n_tokens = np.zeros(len(b), dtype=np.int64)
        n_words = np.zeros(len(b), dtype=np.int64)
        toks_col = []
        for i, t in enumerate(b[self.col].fillna("")):
            toks: list[str] = []
            words = t.split()
            n_words[i] = len(words)
            for w in words:
                got = self.cache.get(w)
                if got is None:
                    got = _encode_word(w, self.ranks)
                    self.cache[w] = got
                toks.extend(got)
            n_tokens[i] = len(toks)
            toks_col.append(toks)
        out = b[list(self.id_cols)].copy()
        out["n_words"] = n_words
        out["n_tokens"] = n_tokens
        out["tokens"] = toks_col
        return out


def apply_bpe(ds, bpe: dict, col: str = "text",
              id_cols: tuple = ("doc_id",), concurrency: int = 2,
              batch_size: int = 256):
    """Tokenize the corpus with a trained BPE (broadcast once)."""
    ref = ray.put(bpe)
    return ds.map_batches(
        BpeTokenizer,
        fn_constructor_kwargs={"bpe_ref": ref, "col": col,
                               "id_cols": id_cols},
        batch_format="pandas", concurrency=concurrency,
        batch_size=batch_size, num_cpus=1,
    )


def detokenize(tokens: list[str]) -> str:
    """Inverse of tokenization (BPE is lossless over split words)."""
    return "".join(tokens).replace(_END, " ").rstrip(" ")
