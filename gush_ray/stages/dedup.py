"""Near-duplicate detection family: MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine — the training-data-pipeline operators (driver brief),
all expressed as Ray Data stages with shuffles only over small derived
rows (signatures / band keys / candidate pairs), never the corpus.

Scale shape (ray_guide.md "Aggregation at scale"): shingle+minhash per
batch (vectorized numpy) → explode to (band_id, band_hash, doc_id[, sig])
rows → groupby bands → candidate pairs verified inside the group →
global pair dedup. The documents never shuffle; only ~bands×O(doc) small
rows do.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = np.uint64((1 << 61) - 1)


def _token_hashes(text: str, shingle: int,
                  hash_fn: str = "fast") -> np.ndarray:
    """Word-shingle uint64 hashes (deterministic)."""
    words = text.split()
    if len(words) < shingle:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [
            " ".join(words[i : i + shingle])
            for i in range(len(words) - shingle + 1)
        ]
    return _hash_strings(grams, hash_fn)


from functools import lru_cache


@lru_cache(maxsize=32)
def _perm_params(num_perm: int, seed: int):
    # cached per worker process: regenerating per batch wastes the RNG
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


@lru_cache(maxsize=32)
def _lsh_planes(n_planes: int, dim: int, seed: int) -> np.ndarray:
    return np.random.RandomState(seed).randn(n_planes, dim)


def hash_object_chunks(arr: np.ndarray, chunk: int = 1 << 16) -> np.ndarray:
    """``pd.util.hash_array`` in cache-sized chunks: one call over a
    megabyte-scale object array runs ~2x slower than chunked on this
    memory-bandwidth-bound machine (measurement in BENCH/BASELINE.md).
    Elementwise hash → chunking cannot change values."""
    if len(arr) <= chunk:
        return pd.util.hash_array(arr, categorize=False)
    return np.concatenate([
        pd.util.hash_array(arr[i : i + chunk], categorize=False)
        for i in range(0, len(arr), chunk)
    ])


def md5_hash_strings(arr) -> np.ndarray:
    """Oracle-reproducible string hash: equals DuckDB's
    ``md5_number_lower(s)`` — bytes 8..16 of the md5 digest read
    little-endian. The point of this mode is that a plain ANSI-SQL
    oracle (the driver's DuckDB check) can recompute the EXACT same
    token hashes, making the whole MinHash/SimHash/Jaccard family
    hash-verifiable instead of rows-only. Slower than
    :func:`hash_object_chunks` (Python loop over hashlib), so it is the
    verification mode, not the bench default."""
    import hashlib

    out = np.empty(len(arr), dtype=np.uint64)
    for i, s in enumerate(arr):
        data = s if isinstance(s, bytes) else s.encode("utf-8")
        out[i] = int.from_bytes(hashlib.md5(data).digest()[8:16], "little")
    return out


def _hash_strings(arr, hash_fn: str) -> np.ndarray:
    if hash_fn == "fast":
        return hash_object_chunks(np.asarray(arr, dtype=object))
    if hash_fn == "md5":
        return md5_hash_strings(arr)
    raise ValueError(f"unknown hash_fn {hash_fn!r} (want 'fast' or 'md5')")


def _batch_grams(texts, shingle: int) -> tuple[list, np.ndarray]:
    """All docs' word-shingle grams concatenated + doc-boundary starts.
    Every doc contributes ≥1 gram (short/empty docs yield one), so the
    starts are strictly increasing — a reduceat precondition."""
    all_grams: list = []
    bounds = [0]
    for text in texts:
        words = text.split()
        if len(words) < shingle:
            grams = [" ".join(words)] if words else [""]
        else:
            grams = [
                " ".join(words[i : i + shingle])
                for i in range(len(words) - shingle + 1)
            ]
        all_grams.extend(grams)
        bounds.append(bounds[-1] + len(grams))
    return all_grams, np.asarray(bounds, dtype=np.int64)


# tokens per permute chunk. Two jobs: (1) bound the (tokens × num_perm)
# temp regardless of batch text volume; (2) keep it CACHE-SIZED — 2048
# tokens × 64 perms × 8 B = 1 MiB. Measured on this sandbox: the same
# arithmetic over a 64 MiB temp is 7x SLOWER than 1 MiB chunks (memory
# bandwidth, not flops, is the wall; sweep recorded in BENCH/BASELINE.md)
_MINHASH_CHUNK_TOKENS = 2048


def minhash_batch(batch: pd.DataFrame, text_col: str = "text",
                  num_perm: int = 64, shingle: int = 3,
                  seed: int = 1234, hash_fn: str = "fast") -> pd.DataFrame:
    """doc → minhash signature (uint64[num_perm]), vectorized over the
    WHOLE batch: one hash_array call for every doc's grams, then
    ``np.minimum.reduceat`` at doc boundaries (the same pattern as
    :func:`simhash_batch`; the per-doc outer-product loop this replaces
    was the hot path of the dedup family — measured speedup recorded in
    BENCH/BASELINE.md). Chunked over docs so the permute temp stays
    bounded for text-heavy batches."""
    a, b = _perm_params(num_perm, seed)
    n = len(batch)
    sigs = np.empty((n, num_perm), dtype=np.uint64)
    if n:
        all_grams, bounds = _batch_grams(batch[text_col].fillna(""), shingle)
        h = _hash_strings(all_grams, hash_fn)
        d0 = 0
        while d0 < n:
            d1 = d0 + 1  # always take ≥1 doc, even one over the token cap
            while d1 < n and bounds[d1 + 1] - bounds[d0] <= _MINHASH_CHUNK_TOKENS:
                d1 += 1
            hh = h[bounds[d0] : bounds[d1]]
            # (a*h + b) mod p over all tokens at once, min per doc segment
            vals = (hh[:, None] * a[None, :] + b[None, :]) % _MERSENNE
            sigs[d0:d1] = np.minimum.reduceat(
                vals, bounds[d0:d1] - bounds[d0], axis=0
            )
            d0 = d1
    out = batch[[c for c in batch.columns if c != text_col]].copy()
    out["sig"] = list(sigs)
    return out


def explode_bands(batch: pd.DataFrame, num_bands: int,
                  id_col: str = "doc_id") -> pd.DataFrame:
    """signature rows → (band_id, band_hash, id, sig) rows (×num_bands)."""
    sigs = np.stack(batch["sig"].to_numpy())  # (n, num_perm)
    n, num_perm = sigs.shape
    rows_per_band = num_perm // num_bands
    out_frames = []
    for band in range(num_bands):
        chunk = sigs[:, band * rows_per_band : (band + 1) * rows_per_band]
        # deterministic band hash: fold the chunk columns
        bh = np.zeros(n, dtype=np.uint64)
        for j in range(chunk.shape[1]):
            bh = bh * np.uint64(1099511628211) + chunk[:, j]
        out_frames.append(
            pd.DataFrame(
                {
                    "band_id": np.full(n, band, dtype=np.int64),
                    "band_hash": bh,
                    id_col: batch[id_col].to_numpy(),
                    "sig": batch["sig"].to_numpy(),
                }
            )
        )
    return pd.concat(out_frames, ignore_index=True)


def _bucket_slices(df: pd.DataFrame, bucket_cols: list[str],
                   id_col: str):
    """Sort one hash partition by (bucket key, id) and return the sort
    order plus (start, end) boundaries of each bucket.

    This is the vectorized core of the per-partition bucket scan: the
    partition is sorted ONCE with ``np.lexsort`` and buckets are found by
    boundary detection, so the only per-bucket Python work left for the
    caller is the (rare) buckets of size ≥ 2. The previous design ran
    ``groupby(bucket_cols).map_groups`` — one Ray-level Python call per
    bucket (~n_docs × bands calls at corpus scale)."""
    arrs = [df[c].to_numpy() for c in bucket_cols]
    ids = df[id_col].to_numpy()
    # lexsort: last key is primary → bucket cols outermost, id innermost
    order = np.lexsort([ids] + arrs[::-1])
    change = np.zeros(len(df), dtype=bool)
    change[0] = True
    for a in arrs:
        s = a[order]
        change[1:] |= s[1:] != s[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], len(df))
    return order, starts, ends


def _minhash_pairs_partition(df: pd.DataFrame, id_col: str,
                             max_group: int = 200) -> pd.DataFrame:
    """Candidate pairs within every LSH bucket of one hash partition,
    with signature-estimated Jaccard.

    ``max_group`` caps degenerate buckets (a bucket of size m yields
    m(m-1)/2 pairs — a poisoned bucket would explode; log-and-truncate is
    the documented behavior, mirroring salting for skewed joins). The
    truncation is deterministic: buckets are sorted by id before capping.
    """
    ids_dtype = df[id_col].to_numpy().dtype if len(df) else np.int64
    empty = pd.DataFrame(
        {"doc_a": np.array([], dtype=ids_dtype),
         "doc_b": np.array([], dtype=ids_dtype),
         "est_jaccard": np.array([], dtype=np.float64)}
    )
    if len(df) < 2:
        return empty
    order, starts, ends = _bucket_slices(df, ["band_id", "band_hash"],
                                         id_col)
    ids = df[id_col].to_numpy()[order]
    sigs = np.stack(df["sig"].to_numpy())[order]
    out_a, out_b, out_e = [], [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        e = min(e, s + max_group)
        m = e - s
        ia, ib = np.triu_indices(m, k=1)
        est = (sigs[s:e][ia] == sigs[s:e][ib]).mean(axis=1)
        out_a.append(ids[s:e][ia])
        out_b.append(ids[s:e][ib])
        out_e.append(est)
    if not out_a:
        return empty
    return pd.DataFrame(
        {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b),
         "est_jaccard": np.concatenate(out_e)}
    )


def dedup_pairs(pairs_ds, num_partitions: int = 16):
    """Global (doc_a, doc_b) pair dedup: ONE hash shuffle keyed on the
    pair id, O(P) Python calls (vectorized ``drop_duplicates`` per
    partition) — not one call per pair group. Safe for any pair source
    here because the per-pair payload (est_jaccard / hamming / cosine) is
    a pure function of the pair, identical in every duplicate row."""
    from gush_ray.stages.shuffle import partition_map

    return partition_map(
        pairs_ds, ["doc_a", "doc_b"],
        lambda df: df.drop_duplicates(["doc_a", "doc_b"]),
        num_partitions=num_partitions,
    )


def minhash_lsh_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 64, num_bands: int = 16,
                      shingle: int = 3, threshold: float = 0.7,
                      seed: int = 1234, num_partitions: int = 16,
                      hash_fn: str = "fast"):
    """Full MinHash-LSH near-dup pipeline → unique candidate pairs with
    signature-estimated Jaccard ≥ threshold. ``hash_fn="md5"`` switches
    the gram hash to the DuckDB-reproducible one (md5_hash_strings) so a
    SQL oracle can verify the pairs bit-exactly."""
    from gush_ray.stages.shuffle import partition_map

    sigs = ds.map_batches(
        lambda b: minhash_batch(b, text_col, num_perm, shingle, seed,
                                hash_fn),
        batch_format="pandas",
    )
    bands = sigs.map_batches(
        lambda b: explode_bands(b, num_bands, id_col), batch_format="pandas"
    )
    # shuffle by the BUCKET key so every bucket lands whole in one
    # partition, then scan buckets vectorized inside the partition
    pairs = partition_map(
        bands, ["band_id", "band_hash"],
        lambda df: _minhash_pairs_partition(df, id_col),
        num_partitions=num_partitions,
    )
    # a pair can surface from several bands → global dedup (tiny shuffle)
    uniq = dedup_pairs(pairs, num_partitions)
    return uniq.filter(expr=f"est_jaccard >= {threshold}")


# ------------------------------------------------- duplicate clusters

def duplicate_clusters_distributed(pairs_ds, a_col: str = "doc_a",
                                   b_col: str = "doc_b",
                                   num_partitions: int = 8,
                                   max_rounds: int = 30):
    """Connected components over near-dup pairs → (doc_id, cluster_id)
    Dataset, cluster_id = minimum member id — computed DISTRIBUTED via
    min-label propagation: rounds of hash-join + groupby-min over the
    edge list until fixpoint. Only the edge list (small relative to the
    corpus, but potentially far beyond driver memory at 10^12 docs)
    shuffles; the driver holds one scalar per round.

    Rounds needed = O(cluster diameter); near-dup clusters are shallow
    (stars/cliques from shared LSH buckets), so 2-4 rounds is typical.
    ``max_rounds`` bounds pathological chains; hitting it raises rather
    than returning partially-merged clusters.
    """
    from gush_ray.stages.agg import partial_aggregate
    from gush_ray.stages.joins import hash_join

    def to_edges(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": np.concatenate([b[a_col].to_numpy(),
                                    b[b_col].to_numpy()]),
            "nbr": np.concatenate([b[b_col].to_numpy(),
                                   b[a_col].to_numpy()]),
        })

    edges = pairs_ds.map_batches(to_edges,
                                 batch_format="pandas").materialize()

    def init_label(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": b["node"].to_numpy(),
            "label": np.minimum(b["node"].to_numpy(), b["nbr"].to_numpy()),
        })

    # the trailing repartition is load-bearing, not cosmetic: map_groups
    # (inside partial_aggregate) emits schema-LESS empty blocks for empty
    # partitions, map_batches skips empty blocks so they can't be fixed
    # downstream, and the Acero hash join rejects a schemaless right side;
    # repartition folds the empties into schemaed blocks
    labels = partial_aggregate(
        edges.map_batches(init_label, batch_format="pandas"),
        ["node"], {"label": ("label", "min")},
    ).repartition(num_partitions).materialize()
    prev_sum = labels.sum("label")

    def to_nbr(b: pd.DataFrame) -> pd.DataFrame:
        # groupby().map_groups (inside partial_aggregate) can emit empty
        # blocks with NO schema; the Acero hash join rejects a schemaless
        # right side ("no match for key field") — normalize them here
        if len(b) == 0:
            return pd.DataFrame({"nbr": pd.Series(dtype="int64"),
                                 "nbr_label": pd.Series(dtype="int64")})
        return b.rename(columns={"node": "nbr", "label": "nbr_label"})

    for _ in range(max_rounds):
        # propagate each node's label across its edges, take the min of
        # (own label, every neighbor's label)
        nbr_labels = labels.map_batches(to_nbr, batch_format="pandas")
        def project(b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:
                return pd.DataFrame({"node": pd.Series(dtype="int64"),
                                     "label": pd.Series(dtype="int64")})
            return pd.DataFrame({"node": b["node"].to_numpy(),
                                 "label": b["nbr_label"].to_numpy()})

        cand = hash_join(edges, nbr_labels, on=("nbr",),
                         num_partitions=num_partitions).map_batches(
            project, batch_format="pandas",
        )
        labels = partial_aggregate(
            cand.union(labels), ["node"], {"label": ("label", "min")}
        ).repartition(num_partitions).materialize()
        # labels are componentwise non-increasing, so an unchanged sum IS
        # the fixpoint (total decrease per round is far below 2^63, so the
        # int64 sum can't alias a real decrease to equality)
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            return labels.map_batches(
                lambda b: b.rename(columns={"node": "doc_id",
                                            "label": "cluster_id"}),
                batch_format="pandas",
            )
        prev_sum = cur_sum
    raise RuntimeError(
        f"min-label propagation did not converge in {max_rounds} rounds"
    )


def duplicate_clusters(pairs_df: pd.DataFrame, a_col: str = "doc_a",
                       b_col: str = "doc_b") -> pd.DataFrame:
    """Connected components over near-dup pairs → (doc_id, cluster_id)
    with cluster_id = the minimum member id (the canonical keeper).

    Driver-side union-find with path compression — the small-input
    reference implementation (pair-set fits driver memory); the scale
    path is :func:`duplicate_clusters_distributed`, which produces the
    identical mapping (pinned by a parity test) without materializing
    the edge list on the driver.
    """
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs_df[a_col], pairs_df[b_col]):
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by smaller id so the root IS the canonical keeper
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = sorted(set(pairs_df[a_col]) | set(pairs_df[b_col]))
    return pd.DataFrame(
        {"doc_id": nodes, "cluster_id": [find(n) for n in nodes]}
    )


def cluster_summary(clusters: pd.DataFrame) -> pd.DataFrame:
    """(cluster_id, n_members, keep_doc_id) — one keeper per cluster."""
    g = clusters.groupby("cluster_id", as_index=False).agg(
        n_members=("doc_id", "size"), keep_doc_id=("doc_id", "min")
    )
    return g.sort_values("cluster_id").reset_index(drop=True)


# ------------------------------------------------------------------ SimHash

def simhash_batch(batch: pd.DataFrame, text_col: str = "text",
                  out: str = "simhash",
                  hash_fn: str = "fast") -> pd.DataFrame:
    """64-bit SimHash per doc — fully vectorized over the batch via
    unpackbits + add.reduceat on doc boundaries."""
    texts = batch[text_col].fillna("")
    hashes = []
    bounds = [0]
    for t in texts:
        h = _hash_strings(t.split() or [""], hash_fn)
        hashes.append(h)
        bounds.append(bounds[-1] + len(h))
    all_h = np.concatenate(hashes) if hashes else np.array([], dtype=np.uint64)
    bits = np.unpackbits(
        all_h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    )  # (total_tokens, 64)
    starts = np.asarray(bounds[:-1])
    sums = np.add.reduceat(bits, starts, axis=0) if len(all_h) else np.zeros(
        (len(batch), 64), dtype=np.int64
    )
    counts = np.diff(bounds)[:, None]
    sig_bits = (2 * sums >= counts).astype(np.uint64)
    sig = (sig_bits << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    out_df = batch[[c for c in batch.columns if c != text_col]].copy()
    out_df[out] = sig
    return out_df


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (unpackbits over the byte
    view — no per-element Python)."""
    if len(x) == 0:
        return np.array([], dtype=np.int64)
    return np.unpackbits(
        np.ascontiguousarray(x).view(np.uint8).reshape(-1, 8), axis=1
    ).sum(axis=1).astype(np.int64)


def _simhash_pairs_partition(df: pd.DataFrame, id_col: str,
                             max_hamming: int,
                             max_group: int = 200) -> pd.DataFrame:
    ids_dtype = df[id_col].to_numpy().dtype if len(df) else np.int64
    empty = pd.DataFrame(
        {"doc_a": np.array([], dtype=ids_dtype),
         "doc_b": np.array([], dtype=ids_dtype),
         "hamming": np.array([], dtype=np.int64)}
    )
    if len(df) < 2:
        return empty
    order, starts, ends = _bucket_slices(df, ["chunk_id", "chunk_val"],
                                         id_col)
    ids = df[id_col].to_numpy()[order]
    sh = df["simhash"].to_numpy().astype(np.uint64)[order]
    out_a, out_b, out_h = [], [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        e = min(e, s + max_group)
        ia, ib = np.triu_indices(e - s, k=1)
        ham = _popcount64(sh[s:e][ia] ^ sh[s:e][ib])
        keep = ham <= max_hamming
        out_a.append(ids[s:e][ia][keep])
        out_b.append(ids[s:e][ib][keep])
        out_h.append(ham[keep])
    if not out_a:
        return empty
    return pd.DataFrame(
        {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b),
         "hamming": np.concatenate(out_h)}
    )


def simhash_near_dup_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                           max_hamming: int = 3, num_partitions: int = 16,
                           hash_fn: str = "fast"):
    """Near-dup via SimHash banding: 4 chunks of 16 bits — any pair within
    hamming distance ≤ 3 shares at least one exact chunk (pigeonhole)."""
    from gush_ray.stages.shuffle import partition_map

    sigs = ds.map_batches(
        lambda b: simhash_batch(b, text_col, hash_fn=hash_fn),
        batch_format="pandas"
    )

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        sh = b["simhash"].to_numpy().astype(np.uint64)
        frames = []
        for c in range(4):
            chunk = (sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)
            frames.append(
                pd.DataFrame(
                    {
                        "chunk_id": np.full(len(b), c, dtype=np.int64),
                        "chunk_val": chunk,
                        id_col: b[id_col].to_numpy(),
                        "simhash": sh,
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    bands = sigs.map_batches(explode, batch_format="pandas")
    pairs = partition_map(
        bands, ["chunk_id", "chunk_val"],
        lambda df: _simhash_pairs_partition(df, id_col, max_hamming),
        num_partitions=num_partitions,
    )
    return dedup_pairs(pairs, num_partitions)


# --------------------------------------------------------- exact n-gram J

def _gram_hash_batch(t: pa.Table, id_col: str, text_col: str,
                     n: int, out_id: str, grams_col: str,
                     hash_fn: str = "fast") -> pa.Table:
    """doc → sorted unique uint64 word-n-gram hashes, PACKED AS BYTES:
    a binary column survives the Acero hash join as a payload field,
    whereas numpy-array cells become Ray's tensor extension type which
    the join rejects.  Arrow in/out with an EXPLICIT binary() type so an
    empty batch keeps the same schema as a full one — a pandas object
    column infers Arrow null on empty batches, which nondeterministically
    (block-split-dependent) breaks the downstream hash-join finalize."""
    grams = [
        np.unique(_token_hashes(x if x is not None else "", n,
                                hash_fn)).tobytes()
        for x in t[text_col].to_pylist()
    ]
    return pa.table({out_id: t[id_col].combine_chunks(),
                     grams_col: pa.array(grams, type=pa.binary())})


def candidate_id_ds(pairs_ds, id_col: str, num_partitions: int = 8):
    """Distinct doc ids referenced by a pair Dataset, AS A DATASET —
    pairs → (id) rows → hash-partitioned drop_duplicates. Nothing about
    the pair set ever lands on the driver, so this holds even when the
    candidate-pair list itself exceeds driver memory (the 100-TB case).
    """
    from gush_ray.stages.shuffle import partition_map

    def explode_ids(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: np.concatenate(
            [b["doc_a"].to_numpy(), b["doc_b"].to_numpy()]
        )})

    ids = pairs_ds.map_batches(explode_ids, batch_format="pandas")
    distinct = partition_map(ids, id_col,
                             lambda df: df.drop_duplicates([id_col]),
                             num_partitions=num_partitions)
    # repartition is load-bearing: map_groups emits schema-LESS empty
    # blocks for empty partitions and the Acero hash join downstream
    # rejects a schemaless side; repartition folds them into schemaed
    # blocks (same hazard as documented in ngram_jaccard_pairs)
    return distinct.repartition(num_partitions)


def ngram_jaccard_pairs(corpus_ds, pairs_ds, n: int = 3,
                        id_col: str = "doc_id", text_col: str = "text",
                        num_partitions: int = 8,
                        broadcast_ids: bool | None = None,
                        hash_fn: str = "fast"):
    """Exact word-n-gram Jaccard verification of candidate pairs WITHOUT
    materializing the corpus anywhere: the corpus is semi-filtered to the
    candidate doc ids, its n-gram hash sets are hash-joined onto the
    pairs, and the Jaccard is computed per batch. Only candidate docs'
    gram sets ever shuffle.

    The semi filter has two physical forms:

    - distributed (default at scale): distinct candidate ids stay a
      Dataset and the corpus is inner-hash-joined against them — the
      pair list NEVER lands on the driver, so the path holds even when
      the candidate pairs themselves exceed driver memory;
    - broadcast (small-input fast path, ``broadcast_ids=True`` or
      auto-picked when the pair count is tiny): a Python id set shipped
      to every filter task — one fewer shuffle.

    Both paths produce identical output (pinned by a parity test).
    """
    from gush_ray.stages.joins import broadcast_semi_filter, hash_join

    # pairs are consumed twice (id set + join): pin them so the upstream
    # LSH pipeline doesn't re-execute; they are small by construction.
    # The repartition is load-bearing (same hazard as in
    # duplicate_clusters_distributed): the pairs come out of
    # groupby().map_groups, which emits schema-LESS empty blocks for
    # empty partitions, and the Acero hash join's aggregator rejects a
    # schemaless side — nondeterministically, only when a partition
    # happens to land empty. Repartition folds empties into schemaed
    # blocks before the join sees them.
    pairs_ds = pairs_ds.repartition(num_partitions).materialize()
    if broadcast_ids is None:
        # auto: broadcast only when the pair list is trivially small
        broadcast_ids = pairs_ds.count() <= 10_000
    if broadcast_ids:
        pdf_ids = pairs_ds.select_columns(["doc_a", "doc_b"]).to_pandas()
        cand_ids = set(pdf_ids["doc_a"]) | set(pdf_ids["doc_b"])
        sub = broadcast_semi_filter(corpus_ds, cand_ids, on=id_col)
    else:
        cand = candidate_id_ds(pairs_ds, id_col, num_partitions)
        # inner join against DISTINCT ids == semi filter (no fan-out)
        sub = hash_join(
            corpus_ds.select_columns([id_col, text_col]), cand,
            on=(id_col,), num_partitions=num_partitions,
        )
    # pin the filtered corpus: the scan behind the semi filter must run
    # once, not once per join side
    sub = sub.materialize()
    grams_a = sub.map_batches(
        lambda b: _gram_hash_batch(b, id_col, text_col, n, "doc_a",
                                   "grams_a", hash_fn),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    grams_b = sub.map_batches(
        lambda b: _gram_hash_batch(b, id_col, text_col, n, "doc_b",
                                   "grams_b", hash_fn),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    j1 = hash_join(pairs_ds, grams_a, on=("doc_a",),
                   num_partitions=num_partitions)
    j2 = hash_join(j1, grams_b, on=("doc_b",),
                   num_partitions=num_partitions)

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        jac = np.empty(len(b), dtype=np.float64)
        for i, (ga, gb) in enumerate(zip(b["grams_a"], b["grams_b"])):
            ga = np.frombuffer(ga, dtype=np.uint64)
            gb = np.frombuffer(gb, dtype=np.uint64)
            inter = len(np.intersect1d(ga, gb, assume_unique=True))
            union = len(ga) + len(gb) - inter
            jac[i] = inter / max(1, union)
        out = b.drop(columns=["grams_a", "grams_b"]).copy()
        out["jaccard"] = np.round(jac, 4)
        return out

    return j2.map_batches(verify, batch_format="pandas")


def ngram_jaccard_verify(pairs_df: pd.DataFrame, texts: dict,
                         n: int = 3) -> pd.DataFrame:
    """Exact word-n-gram Jaccard for candidate pairs (verification stage).

    ``texts`` is a {id: text} dict — the SMALL-INPUT reference form; the
    scale path is :func:`ngram_jaccard_pairs`, which hash-joins the
    candidate pairs back to the corpus instead (identical jaccard values,
    pinned by a parity test).
    """
    def grams(t: str) -> set:
        w = t.split()
        if len(w) < n:
            return {" ".join(w)}
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    cache: dict = {}

    def g(i):
        if i not in cache:
            cache[i] = grams(texts.get(i, ""))
        return cache[i]

    jac = [
        len(g(a) & g(b)) / max(1, len(g(a) | g(b)))
        for a, b in zip(pairs_df["doc_a"], pairs_df["doc_b"])
    ]
    out = pairs_df.copy()
    out["jaccard"] = np.round(jac, 4)
    return out


# ---------------------------------------------------- embedding near-dup

def embedding_near_dup_pairs(ds, threshold: float = 0.9, n_bands: int = 8,
                             band_bits: int = 6, seed: int = 99,
                             id_col: str = "vec_id",
                             emb_col: str = "embedding"):
    """Cosine near-dup via OR-amplified random-hyperplane LSH.

    ``n_bands`` independent bands of ``band_bits`` hyperplanes each: a
    pair at angle θ collides in ≥1 band with probability
    ``1-(1-(1-θ/π)^band_bits)^n_bands`` — ≈0.98 at cosine 0.9 with the
    defaults (a single wide band has near-zero recall at any useful
    threshold; measured 0.017 before this design). Candidates are
    verified with EXACT cosine inside the bucket, so precision is 1.0
    and only recall is approximate.
    """
    from gush_ray.stages.similarity import _to_matrix

    def add_buckets(batch: pa.Table) -> pd.DataFrame:
        if batch.num_rows == 0:
            return pd.DataFrame({"band": pd.Series(dtype="int64"),
                                 "bucket": pd.Series(dtype="int64"),
                                 id_col: pd.Series(dtype="int64"),
                                 "emb": pd.Series(dtype="object")})
        mat = _to_matrix(batch[emb_col])
        planes = _lsh_planes(n_bands * band_bits, mat.shape[1], seed)
        bits = (mat @ planes.T > 0)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        frames = []
        weights = 1 << np.arange(band_bits)
        for b in range(n_bands):
            chunk = bits[:, b * band_bits : (b + 1) * band_bits]
            frames.append(pd.DataFrame({
                "band": np.full(len(ids), b, dtype=np.int64),
                "bucket": chunk.dot(weights).astype(np.int64),
                id_col: ids,
                "emb": list(mat),
            }))
        return pd.concat(frames, ignore_index=True)

    bucketed = ds.map_batches(add_buckets, batch_format="pyarrow")

    def pairs_partition(df: pd.DataFrame) -> pd.DataFrame:
        ids_dtype = df[id_col].to_numpy().dtype if len(df) else np.int64
        empty = pd.DataFrame(
            {"doc_a": np.array([], dtype=ids_dtype),
             "doc_b": np.array([], dtype=ids_dtype),
             "cosine": np.array([], dtype=np.float64)}
        )
        if len(df) < 2:
            return empty
        order, starts, ends = _bucket_slices(df, ["band", "bucket"], id_col)
        ids = df[id_col].to_numpy()[order]
        mat = np.stack(df["emb"].to_numpy())[order]
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        out_a, out_b, out_c = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            e = min(e, s + 500)
            sub = unit[s:e]
            ia, ib = np.triu_indices(e - s, k=1)
            cos = (sub @ sub.T)[ia, ib]
            keep = cos >= threshold
            out_a.append(ids[s:e][ia][keep])
            out_b.append(ids[s:e][ib][keep])
            out_c.append(np.round(cos[keep], 4))
        if not out_a:
            return empty
        return pd.DataFrame(
            {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b),
             "cosine": np.concatenate(out_c)}
        )

    from gush_ray.stages.shuffle import partition_map

    pairs = partition_map(bucketed, ["band", "bucket"], pairs_partition,
                          num_partitions=16)
    # a pair can surface from several bands → dedup (tiny shuffle)
    return dedup_pairs(pairs, 16)
