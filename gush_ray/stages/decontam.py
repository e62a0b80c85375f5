"""Benchmark decontamination and exact substring-duplication detection.

Two training-data operators the large-scale pipelines need beyond
near-dup LSH (stages/dedup.py):

1. **N-gram decontamination** (GPT-3 appendix C / PaLM style): flag and
   drop corpus documents that share any word n-gram with a held-out
   benchmark set, so evaluation data never leaks into training data.
   The benchmark side is SMALL BY CONTRACT (eval suites are thousands
   of documents, the corpus is billions) — its distinct gram set is
   collected once, broadcast via ``ray.put``, and probed per batch with
   O(1) set lookups. The corpus side streams; only per-doc hit counts
   come back. A Bloom-filter variant (``decontaminate_bloom``) bounds
   broadcast memory when the gram set outgrows a plain set; it can only
   over-flag (no false negatives), which is the safe direction for
   decontamination.

2. **Exact substring duplication** (Lee et al. 2021, "Deduplicating
   Training Data Makes Language Models Better"): find character spans
   of length ≥ k whose content occurs more than once in the corpus,
   report merged per-document duplicated-span stats, and optionally cut
   the spans out. Instead of a corpus-wide suffix array (the paper's
   single-machine construction), the Ray-native shape is a fingerprint
   shuffle: every k-char window gets a 128-bit vectorized polynomial
   rolling hash, fingerprints hash-partition by value so duplicate
   detection is local to a partition, and only (hash, doc_id, pos)
   tuples move — never document text. At stride 1 (``winnow_w=1``)
   detection is exact (up to 2^-128 hash collisions — the unit tests
   cross-check against content-equality brute force). The 100-TB scale
   path is **winnowing** (Schleimer et al. 2003, MOSS): keep only the
   minimum fingerprint of every w consecutive windows, shrinking the
   shuffle ~w/2× while guaranteeing any duplicated span of length
   ≥ k + w - 1 still collides on at least one selected fingerprint.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# Odd multipliers -> invertible mod 2^64, so position scale factors can
# be divided back out and equal windows hash equally at any offset.
_P1 = np.uint64(0x9E3779B97F4A7C15)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P1_INV = np.uint64(pow(int(_P1), -1, 1 << 64))
_P2_INV = np.uint64(pow(int(_P2), -1, 1 << 64))


# --------------------------------------------------------------- decontam

def doc_ngrams(text: str, n: int) -> set:
    """Distinct word n-grams of one document (space-split, matching
    DuckDB ``string_split(text, ' ')`` including empty tokens)."""
    ws = text.split(" ") if text else [""]
    if len(ws) < n:
        return set()
    return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}


def collect_bench_grams(bench_ds, n: int, text_col: str = "text",
                        max_grams: int = 50_000_000) -> frozenset:
    """Distinct n-grams of the benchmark set, collected to the driver.

    Benchmark suites are small by contract; ``max_grams`` guards against
    accidentally pointing this at a corpus-scale dataset (use
    ``decontaminate_bloom`` / a pre-sharded gram table at that size).
    Per-batch gram sets are built in the workers; only distinct gram
    strings reach the driver.
    """
    def gramset(b: pd.DataFrame) -> pd.DataFrame:
        grams: set = set()
        for t in b[text_col]:
            grams |= doc_ngrams(t or "", n)
        return pd.DataFrame({"gram": sorted(grams)})

    parts = bench_ds.map_batches(gramset, batch_format="pandas")
    out: set = set()
    for b in parts.iter_batches(batch_format="pandas"):
        out.update(b["gram"].tolist())
        if len(out) > max_grams:
            raise ValueError(
                f"benchmark gram set exceeds max_grams={max_grams}; "
                "use decontaminate_bloom for corpus-scale benchmark sets"
            )
    return frozenset(out)


def contamination_hits(corpus_ds, bench_grams: frozenset, n: int,
                       id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, n_hits) for every corpus doc sharing ≥1 distinct n-gram
    with the benchmark set. The gram set is shipped once per worker via
    the object store (``ray.put``); per-batch work is O(output grams)
    set probes."""
    import ray

    ref = ray.put(bench_grams)

    def probe(b: pd.DataFrame) -> pd.DataFrame:
        grams = ray.get(ref)
        ids, hits = [], []
        for did, t in zip(b[id_col].tolist(), b[text_col].tolist()):
            h = len(doc_ngrams(t or "", n) & grams)
            if h:
                ids.append(did)
                hits.append(h)
        return pd.DataFrame({id_col: pd.array(ids, dtype="int64"),
                             "n_hits": pd.array(hits, dtype="int64")})

    return corpus_ds.map_batches(probe, batch_format="pandas")


def decontaminate(corpus_ds, bench_ds, n: int = 4,
                  id_col: str = "doc_id", text_col: str = "text"):
    """Corpus rows whose documents share NO word n-gram with the
    benchmark set (the kept/training side). Returns the corpus schema
    unchanged."""
    import ray

    grams = collect_bench_grams(bench_ds, n, text_col)
    ref = ray.put(grams)

    def keep_clean(b: pd.DataFrame) -> pd.DataFrame:
        g = ray.get(ref)
        mask = [not (doc_ngrams(t or "", n) & g)
                for t in b[text_col].tolist()]
        return b[np.asarray(mask, dtype=bool)]

    return corpus_ds.map_batches(keep_clean, batch_format="pandas")


def decontaminate_bloom(corpus_ds, bench_ds, n: int = 4,
                        id_col: str = "doc_id", text_col: str = "text",
                        m_bits: int = 1 << 23, k_hashes: int = 5):
    """Bloom-filter decontamination scale path: the benchmark gram set
    becomes a fixed-size bit array (built distributed, OR-merged on the
    driver — stages/sketches.build_bloom ships m/8 bytes per block, never
    the grams), so broadcast size is bounded regardless of gram count.
    False positives only: a clean doc may be dropped (~fpp per gram), a
    contaminated doc is NEVER kept."""
    import ray

    from gush_ray.stages.sketches import build_bloom

    def gramrows(b: pd.DataFrame) -> pd.DataFrame:
        grams: set = set()
        for t in b[text_col]:
            grams |= doc_ngrams(t or "", n)
        return pd.DataFrame({"gram": sorted(grams)})

    gram_ds = bench_ds.map_batches(gramrows, batch_format="pandas")
    bloom = build_bloom(gram_ds, "gram", m_bits=m_bits, k=k_hashes)
    ref = ray.put(bloom)

    def keep_clean(b: pd.DataFrame) -> pd.DataFrame:
        f = ray.get(ref)
        mask = np.ones(len(b), dtype=bool)
        for i, t in enumerate(b[text_col].tolist()):
            grams = doc_ngrams(t or "", n)
            if grams and f.contains(np.array(sorted(grams), dtype=object)).any():
                mask[i] = False
        return b[mask]

    return corpus_ds.map_batches(keep_clean, batch_format="pandas")


# ---------------------------------------------- exact substring duplication

def _rolling_hashes(texts: list, k: int):
    """128-bit polynomial rolling hashes of every k-char window of every
    text, computed in ONE vectorized pass over the concatenated bytes.

    Returns (doc_idx, pos, h1, h2) int64/uint64 arrays; windows never
    cross document boundaries. Position ``pos`` is 0-based within its
    document. Equal window CONTENT ⇒ equal (h1, h2); the converse fails
    with probability ~(#windows)^2 / 2^128.
    """
    if not texts:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z.astype(np.uint64), z.astype(np.uint64)
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    blob = "".join(texts).encode("utf-8", "surrogatepass")
    # utf-8 multibyte chars make byte offsets differ from char offsets;
    # the fixture corpora are ascii. Guard rather than silently misalign.
    if len(blob) != int(lens.sum()):
        raise ValueError("non-ascii text: use byte-typed input for "
                         "duplicated-span detection")
    b = np.frombuffer(blob, dtype=np.uint8).astype(np.uint64)
    total = len(b)
    with np.errstate(over="ignore"):
        # pw[i] = p^i, pinv[i] = p^-i (mod 2^64), via cumulative products
        pw1 = np.ones(total + 1, dtype=np.uint64)
        pw2 = np.ones(total + 1, dtype=np.uint64)
        pi1 = np.ones(total + 1, dtype=np.uint64)
        pi2 = np.ones(total + 1, dtype=np.uint64)
        np.multiply.accumulate(np.full(total, _P1, dtype=np.uint64),
                               out=pw1[1:])
        np.multiply.accumulate(np.full(total, _P2, dtype=np.uint64),
                               out=pw2[1:])
        np.multiply.accumulate(np.full(total, _P1_INV, dtype=np.uint64),
                               out=pi1[1:])
        np.multiply.accumulate(np.full(total, _P2_INV, dtype=np.uint64),
                               out=pi2[1:])
        # prefix[i] = sum_{t<i} (b[t]+1) * p^t ; window [i, i+k) hashes to
        # (prefix[i+k]-prefix[i]) * p^-i  — offset +1 keeps NUL bytes live
        pref1 = np.zeros(total + 1, dtype=np.uint64)
        pref2 = np.zeros(total + 1, dtype=np.uint64)
        np.cumsum((b + np.uint64(1)) * pw1[:total], out=pref1[1:])
        np.cumsum((b + np.uint64(1)) * pw2[:total], out=pref2[1:])
        starts = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        # global start index of every valid window
        n_win = np.maximum(lens - k + 1, 0)
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), n_win)
        first = np.repeat(starts, n_win)
        within = np.arange(len(doc_idx), dtype=np.int64) - np.repeat(
            np.cumsum(n_win) - n_win, n_win)
        gpos = first + within
        h1 = (pref1[gpos + k] - pref1[gpos]) * pi1[gpos]
        h2 = (pref2[gpos + k] - pref2[gpos]) * pi2[gpos]
    return doc_idx, within, h1, h2


def _winnow_select(doc_idx: np.ndarray, pos: np.ndarray, h1: np.ndarray,
                   w: int) -> np.ndarray:
    """Boolean mask of winnowed fingerprints: for every run of w
    consecutive window positions within a document, the (leftmost)
    minimum h1 is selected. Guarantees any duplicated span of length
    ≥ k + w - 1 keeps at least one selected fingerprint on both sides
    (Schleimer et al. 2003, thm 1)."""
    if w <= 1 or len(h1) == 0:
        return np.ones(len(h1), dtype=bool)
    keep = np.zeros(len(h1), dtype=bool)
    # per-doc sliding-window argmin via sliding_window_view; doc runs are
    # contiguous because _rolling_hashes emits docs in order
    bounds = np.flatnonzero(np.diff(doc_idx)) + 1
    for s, e in zip(np.r_[0, bounds], np.r_[bounds, len(doc_idx)]):
        hs = h1[s:e]
        if len(hs) <= w:
            keep[s + int(np.argmin(hs))] = True
            continue
        win = np.lib.stride_tricks.sliding_window_view(hs, w)
        sel = np.argmin(win, axis=1) + np.arange(len(win))
        keep[s + np.unique(sel)] = True
    return keep


def window_fingerprints(ds, k: int = 30, id_col: str = "doc_id",
                        text_col: str = "text", winnow_w: int = 1):
    """(doc_id, pos, h1, h2) fingerprint rows for every (winnowed)
    k-char window. Only these 32-byte tuples shuffle downstream — text
    never leaves the map side."""
    def fp(b: pd.DataFrame) -> pd.DataFrame:
        texts = ["" if t is None else t for t in b[text_col].tolist()]
        di, pos, h1, h2 = _rolling_hashes(texts, k)
        if winnow_w > 1:
            m = _winnow_select(di, pos, h1, winnow_w)
            di, pos, h1, h2 = di[m], pos[m], h1[m], h2[m]
        ids = b[id_col].to_numpy()
        return pd.DataFrame({
            id_col: ids[di] if len(di) else np.zeros(0, dtype=ids.dtype),
            "pos": pos,
            "h1": h1.astype("uint64"),
            "h2": h2.astype("uint64"),
        })

    return ds.map_batches(fp, batch_format="pandas")


def duplicated_spans(ds, k: int = 30, id_col: str = "doc_id",
                     text_col: str = "text", num_partitions: int = 16,
                     winnow_w: int = 1):
    """Per-document merged duplicated-span stats: (doc_id, n_spans,
    dup_chars) for every doc containing ≥1 char span of length ≥ k whose
    content occurs >1 time in the corpus (any document, any position —
    within-doc repeats count, matching the SQL oracle's HAVING count>1).

    Two fingerprint-sized shuffles, zero text movement:
      fingerprints → partition by hash value (duplicate detection is
      partition-local because equal hashes co-locate) → duplicated
      (doc, pos) rows → partition by doc → vectorized interval merge.
    With ``winnow_w > 1`` only ~2/(w+1) of positions shuffle and spans
    shorter than k + w - 1 may be missed (the documented scale trade).
    """
    from gush_ray.stages.shuffle import partition_map

    fps = window_fingerprints(ds, k=k, id_col=id_col, text_col=text_col,
                              winnow_w=winnow_w)

    def dup_positions(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df[[id_col, "pos"]]
        counts = df.groupby(["h1", "h2"], sort=False)["pos"].transform("size")
        out = df.loc[counts.to_numpy() > 1, [id_col, "pos"]]
        return out

    dups = partition_map(fps, ["h1"], dup_positions,
                         num_partitions=num_partitions)

    def merge_spans(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({id_col: pd.array([], dtype="int64"),
                                 "n_spans": pd.array([], dtype="int64"),
                                 "dup_chars": pd.array([], dtype="int64")})
        df = df.sort_values([id_col, "pos"], kind="mergesort")
        ids = df[id_col].to_numpy()
        pos = df["pos"].to_numpy()
        # same-k windows have monotone ends, so the gaps-and-islands
        # running max(end) is just the previous end: new span iff the
        # doc changes or pos jumps past prev_pos + k (end+1 adjacency)
        new_span = np.ones(len(df), dtype=bool)
        new_span[1:] = (ids[1:] != ids[:-1]) | (pos[1:] > pos[:-1] + k)
        span_id = np.cumsum(new_span)
        g = pd.DataFrame({id_col: ids, "s": pos, "e": pos + k - 1,
                          "span": span_id}).groupby("span", sort=False)
        spans = g.agg(**{id_col: (id_col, "first"), "s": ("s", "min"),
                         "e": ("e", "max")})
        spans["len"] = spans["e"] - spans["s"] + 1
        per_doc = spans.groupby(id_col, sort=False).agg(
            n_spans=("s", "size"), dup_chars=("len", "sum"))
        return per_doc.reset_index().astype(
            {id_col: "int64", "n_spans": "int64", "dup_chars": "int64"})

    return partition_map(dups, [id_col], merge_spans,
                         num_partitions=num_partitions)


def remove_duplicated_spans(ds, k: int = 30, id_col: str = "doc_id",
                            text_col: str = "text",
                            num_partitions: int = 16):
    """Cut every duplicated span (content occurring >1 time, length ≥ k)
    out of every document — the remove-all-copies variant of Lee et al.
    §4; returns (doc_id, text, removed_chars) with untouched docs intact.

    Span positions come from ``duplicated_spans``'s fingerprint path and
    are collapsed to ONE encoded row per affected document, so the
    spans⟖docs left join (Dataset.join on doc_id) is the only stage that
    moves text, and it moves each document exactly once — no driver-side
    span table, no per-span text replication.
    """
    from gush_ray.stages.joins import hash_join
    from gush_ray.stages.shuffle import partition_map

    fps = window_fingerprints(ds, k=k, id_col=id_col, text_col=text_col)

    def dup_positions(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df[[id_col, "pos"]]
        counts = df.groupby(["h1", "h2"], sort=False)["pos"].transform("size")
        return df.loc[counts.to_numpy() > 1, [id_col, "pos"]]

    dups = partition_map(fps, ["h1"], dup_positions,
                         num_partitions=num_partitions)

    def merge_to_doc_rows(df: pd.DataFrame) -> pd.DataFrame:
        """Merged [s, e) intervals per doc, encoded "s:e;s:e" — one row
        per affected document."""
        if not len(df):
            return pd.DataFrame({id_col: pd.array([], dtype="int64"),
                                 "spans": pd.Series([], dtype="object")})
        df = df.sort_values([id_col, "pos"], kind="mergesort")
        ids = df[id_col].to_numpy()
        pos = df["pos"].to_numpy()
        new_span = np.ones(len(df), dtype=bool)
        new_span[1:] = (ids[1:] != ids[:-1]) | (pos[1:] > pos[:-1] + k)
        span_id = np.cumsum(new_span)
        g = pd.DataFrame({id_col: ids, "s": pos, "e": pos + k,
                          "span": span_id}).groupby("span", sort=False)
        spans = g.agg(**{id_col: (id_col, "first"), "s": ("s", "min"),
                         "e": ("e", "max")})
        spans["enc"] = (spans["s"].astype(str) + ":"
                        + spans["e"].astype(str))
        out = spans.groupby(id_col, sort=False)["enc"].agg(";".join)
        return out.reset_index().rename(columns={"enc": "spans"}).astype(
            {id_col: "int64"})

    span_rows = partition_map(dups, [id_col], merge_to_doc_rows,
                              num_partitions=num_partitions)
    joined = hash_join(ds, span_rows, on=id_col, join_type="left_outer",
                       num_partitions=num_partitions)

    def cut(b: pd.DataFrame) -> pd.DataFrame:
        texts, removed = [], []
        for t, enc in zip(b[text_col].tolist(), b["spans"].tolist()):
            t = t or ""
            if enc is None or (isinstance(enc, float) and np.isnan(enc)):
                texts.append(t)
                removed.append(0)
                continue
            kept, prev, cut_n = [], 0, 0
            for part in enc.split(";"):
                s_str, e_str = part.split(":")
                s, e = int(s_str), int(e_str)
                kept.append(t[prev:s])
                cut_n += min(e, len(t)) - s
                prev = e
            kept.append(t[prev:])
            texts.append("".join(kept))
            removed.append(cut_n)
        out = b.drop(columns=["spans"]).copy()
        out[text_col] = texts
        out["removed_chars"] = pd.array(removed, dtype="int64")
        return out

    return joined.map_batches(cut, batch_format="pandas")
