"""Distributed k-means over an embedding column (corpus clustering).

The full-data counterpart of the sample-trained IVF index: every Lloyd
iteration is ONE streaming pass — each batch reduces to at most k rows
(cluster id, point count, coordinate sum, SSE), so the per-iteration
traffic is O(blocks × k × d) floats and the corpus itself never moves.
The driver folds the partials (sorted first, so float summation order —
and therefore the fitted centroids — are independent of Ray's block
arrival order) and updates centroids; empty clusters keep their previous
centroid. Convergence is detected by centroid shift.

Training-data uses: domain/topic discovery, cluster-balanced sampling,
and as the list assignment for a full-data IVF build.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from gush_ray.stages.similarity import _to_matrix


def _farthest_point_init(mat: np.ndarray, k: int, seed: int) -> np.ndarray:
    """Deterministic greedy farthest-point seeding on a sample."""
    rng = np.random.RandomState(seed)
    first = int(rng.randint(len(mat)))
    cent = [mat[first]]
    d2 = ((mat - cent[0]) ** 2).sum(axis=1)
    for _ in range(min(k, len(mat)) - 1):
        nxt = int(np.argmax(d2))
        cent.append(mat[nxt])
        d2 = np.minimum(d2, ((mat - cent[-1]) ** 2).sum(axis=1))
    return np.stack(cent)


def _hash_sample(ds, emb_col: str, sample_size: int) -> np.ndarray:
    """Deterministic row sample for seeding (same splitmix-threshold
    trick as the IVF builder; one metadata count sets the rate)."""
    import pyarrow as pa

    n = ds.count()
    rate = min(1.0, sample_size / max(n, 1))
    thresh = np.uint64(min(int(rate * 2**64), 2**64 - 1))

    def pick(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or rate >= 1.0:
            return batch
        # CONTENT-only hash (vector head bit patterns): the decision must
        # not depend on row position — Ray's dynamic block splitting can
        # draw different batch boundaries between otherwise identical
        # runs, and a position-dependent sample would make the fit
        # nondeterministic
        m = _to_matrix(batch[emb_col])
        z = (m[:, 0].view(np.uint64)
             ^ (m[:, min(1, m.shape[1] - 1)].view(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
        return batch.filter(pa.array(z < thresh))

    sample = ds.map_batches(pick, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in sample[emb_col]])
    # canonical row order: the sample's arrival order varies run to run
    # (block completion order), and farthest-point seeding is
    # order-sensitive — sort rows lexicographically so the init (and
    # therefore the whole fit) is a pure function of the sampled SET
    return mat[np.lexsort(mat.T[::-1])]


def kmeans_fit(ds, emb_col: str = "embedding", k: int = 8,
               n_iters: int = 20, seed: int = 17,
               sample_size: int = 20_000, tol: float = 1e-6) -> dict:
    """Fit k-means on the FULL dataset; returns
    ``{"centroids": (k, d), "inertia": float, "iters": int}``."""
    import pyarrow as pa

    C = _farthest_point_init(_hash_sample(ds, emb_col, sample_size),
                             k, seed)
    k = len(C)
    inertia = float("inf")
    iters = 0
    for it in range(n_iters):
        cent_ref = ray.put(C)

        def partials(batch: pa.Table) -> pd.DataFrame:
            if batch.num_rows == 0:
                return pd.DataFrame({"cluster": pd.Series([], dtype="int64"),
                                     "n": pd.Series([], dtype="int64"),
                                     "vec": pd.Series([], dtype=object),
                                     "sse": pd.Series([], dtype="float64")})
            Cw = ray.get(cent_ref)
            m = _to_matrix(batch[emb_col])
            # ||x - c||² = ||x||² - 2 x·c + ||c||²; argmin over c
            d2 = (-2.0 * (m @ Cw.T)) + (Cw * Cw).sum(axis=1)
            assign = np.argmin(d2, axis=1)
            best = d2[np.arange(len(m)), assign] + (m * m).sum(axis=1)
            rows = []
            for c in np.unique(assign):
                sel = assign == c
                rows.append({
                    "cluster": int(c), "n": int(sel.sum()),
                    "vec": m[sel].sum(axis=0).tobytes(),
                    "sse": float(best[sel].sum()),
                })
            return pd.DataFrame(rows)

        parts = ds.map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
        # sorted fold: float summation order must not depend on block
        # arrival order, or the fit itself becomes nondeterministic
        parts = parts.sort_values(["cluster", "vec"], kind="mergesort")
        newC = C.copy()
        new_inertia = float(parts["sse"].sum())
        for c, grp in parts.groupby("cluster", sort=True):
            vecs = np.stack([np.frombuffer(b, dtype=np.float64)
                             for b in grp["vec"]])
            n_c = int(grp["n"].sum())
            if n_c > 0:
                newC[c] = vecs.sum(axis=0) / n_c
        shift = float(np.abs(newC - C).max())
        C = newC
        inertia = new_inertia
        iters = it + 1
        if shift < tol:
            break
    return {"centroids": C, "inertia": inertia, "iters": iters}


# --------------------------------------------------- integer-exact Lloyd
#
# kmeans_fit above is the scale path; its centroids are float means whose
# ulps depend on batch boundaries (sorted folds make the FIT deterministic
# but not SQL-reproducible — a DuckDB SUM cannot replay numpy's summation
# order). This variant closes that gap: quantize the embeddings to int64
# once, then keep EVERY quantity integer — distances are exact integer
# sums (order-free: integer addition commutes), centroids are
# floor-divided integer means, seeding is greedy farthest-point with
# lexicographic tie-breaks. A static SQL oracle replays the whole fit
# bit-exactly (queries_extra.SQL_KMEANS_EXACT). Same distributed shape
# as kmeans_fit: per-batch partials only, the corpus never moves and the
# driver folds k×d integers.

_I64_MAX = np.iinfo(np.int64).max


def _quant_matrix(batch, emb_col: str, scale: int) -> np.ndarray:
    """list<float> column → (n, d) int64 matrix: round-half-even of
    value×scale (== DuckDB round_even(x*scale, 0)). Exact for
    |value|·scale < 2^52."""
    m = _to_matrix(batch[emb_col])
    return np.rint(m * float(scale)).astype(np.int64)


def _int_d2(m: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n, k) exact integer squared distances (loop over k keeps the
    temp at n×d instead of n×k×d)."""
    out = np.empty((len(m), len(C)), dtype=np.int64)
    for j in range(len(C)):
        diff = m - C[j]
        out[:, j] = np.einsum("nd,nd->n", diff, diff)
    return out


def _lex_smaller(a: np.ndarray, b: np.ndarray) -> bool:
    return tuple(a.tolist()) < tuple(b.tolist())


def kmeans_fit_exact(ds, emb_col: str = "embedding", k: int = 8,
                     n_iters: int = 5, scale: int = 1 << 20) -> dict:
    """Integer-exact k-means (see block comment): returns
    ``{"centroids": (k, d) int64, "scale": scale}``.

    Deterministic tie-breaks throughout, chosen to be SQL-expressible:
    seed 0 is the lexicographically smallest quantized vector; each
    farthest-point step takes max distance-to-chosen, ties to the
    lexicographically smallest candidate vector; assignment takes
    argmin (d2, cluster); empty clusters keep their previous centroid.
    Runs exactly ``n_iters`` Lloyd steps (no float tolerance test —
    early exit would reintroduce a float surface).
    """
    import pyarrow as pa  # noqa: F401  (batch_format contract)

    # pass 0: lexicographically smallest vector
    def minvec(batch) -> pd.DataFrame:
        m = _quant_matrix(batch, emb_col, scale)
        if not len(m):
            return pd.DataFrame({"vec": pd.Series([], dtype=object)})
        i = np.lexsort(m.T[::-1])[0]
        return pd.DataFrame({"vec": [m[i].tobytes()]})

    parts = ds.map_batches(minvec, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    vecs = [np.frombuffer(b, dtype=np.int64) for b in parts["vec"]]
    seed = min(vecs, key=lambda v: tuple(v.tolist()))
    seeds = [seed]

    for _ in range(k - 1):
        seed_ref = ray.put(np.stack(seeds))

        def far(batch) -> pd.DataFrame:
            m = _quant_matrix(batch, emb_col, scale)
            if not len(m):
                return pd.DataFrame({"d2": pd.Series([], dtype="int64"),
                                     "vec": pd.Series([], dtype=object)})
            S = ray.get(seed_ref)
            d2 = _int_d2(m, S).min(axis=1)
            best = d2.max()
            cand = m[d2 == best]
            pick = cand[np.lexsort(cand.T[::-1])[0]]
            return pd.DataFrame({"d2": [int(best)], "vec": [pick.tobytes()]})

        p = ds.map_batches(far, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
        best_d2, best_vec = -1, None
        for d2v, b in zip(p["d2"].tolist(), p["vec"]):
            v = np.frombuffer(b, dtype=np.int64)
            if d2v > best_d2 or (d2v == best_d2 and _lex_smaller(v, best_vec)):
                best_d2, best_vec = d2v, v
        seeds.append(best_vec)

    C = np.stack(seeds)
    k = len(C)
    for _ in range(n_iters):
        cent_ref = ray.put(C)

        def partials(batch) -> pd.DataFrame:
            m = _quant_matrix(batch, emb_col, scale)
            if not len(m):
                return pd.DataFrame({"cluster": pd.Series([], dtype="int64"),
                                     "n": pd.Series([], dtype="int64"),
                                     "vec": pd.Series([], dtype=object)})
            Cw = ray.get(cent_ref)
            assign = np.argmin(_int_d2(m, Cw), axis=1)  # ties → low cluster
            rows = []
            for c in np.unique(assign):
                sel = assign == c
                rows.append({"cluster": int(c), "n": int(sel.sum()),
                             "vec": m[sel].sum(axis=0).tobytes()})
            return pd.DataFrame(rows)

        parts = ds.map_batches(partials, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
        newC = C.copy()
        for c, grp in parts.groupby("cluster", sort=True):
            # integer partial fold: exact, hence order-independent — no
            # sorted-fold dance needed, unlike the float path above
            s = np.sum(np.stack([np.frombuffer(b, dtype=np.int64)
                                 for b in grp["vec"]]), axis=0)
            n_c = int(grp["n"].sum())
            if n_c > 0:
                newC[c] = np.floor_divide(s, n_c)
        C = newC
    return {"centroids": C, "scale": scale}


def kmeans_exact_summary(ds, centroids: np.ndarray,
                         emb_col: str = "embedding",
                         scale: int = 1 << 20) -> pd.DataFrame:
    """Final assignment under the fitted integer centroids → per-cluster
    ``(cluster, n, sse, centroid_key)``; sse is the exact integer SSE
    converted to float64 once at the end (int→double rounds half-even
    identically in numpy and DuckDB), centroid_key is the md5 bridge
    hash of the comma-joined centroid (== md5_number_lower in SQL).
    Clusters with zero assigned points are omitted (the SQL GROUP BY
    does the same)."""
    from gush_ray.stages.dedup import md5_hash_strings

    C = np.asarray(centroids, dtype=np.int64)
    cent_ref = ray.put(C)

    def parts(batch) -> pd.DataFrame:
        m = _quant_matrix(batch, emb_col, scale)
        if not len(m):
            return pd.DataFrame({"cluster": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64"),
                                 "sse": pd.Series([], dtype="int64")})
        Cw = ray.get(cent_ref)
        d2 = _int_d2(m, Cw)
        assign = np.argmin(d2, axis=1)
        best = d2[np.arange(len(m)), assign]
        rows = []
        for c in np.unique(assign):
            sel = assign == c
            rows.append({"cluster": int(c), "n": int(sel.sum()),
                         "sse": int(best[sel].sum())})
        return pd.DataFrame(rows)

    parts_df = ds.map_batches(parts, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    agg = parts_df.groupby("cluster", as_index=False).agg(
        n=("n", "sum"), sse_i=("sse", "sum"))
    keys = md5_hash_strings(
        [",".join(str(int(v)) for v in C[c]) for c in agg["cluster"]])
    out = pd.DataFrame({
        "cluster": agg["cluster"].astype("int64"),
        "n": agg["n"].astype("int64"),
        "sse": agg["sse_i"].astype("float64"),
        "centroid_key": keys.astype(np.uint64),
    })
    return out.sort_values("cluster").reset_index(drop=True)


def semdedup_exact(ds, emb_col: str = "embedding", id_col: str = "vec_id",
                   k: int = 8, eps: tuple[int, int] = (19, 20),
                   n_iters: int = 5, scale: int = 1 << 14,
                   num_partitions: int = 8,
                   centroids: np.ndarray | None = None):
    """Integer-exact SemDeDup sibling (verification variant of
    :func:`semdedup`; same keep-low-centroid-similarity rule but every
    comparison is exact rational arithmetic, so a static SQL oracle
    replays it bit-for-bit — queries_extra.SQL_SEMDEDUP_EXACT):

    * clusters come from :func:`kmeans_fit_exact` (integer centroids),
    * rank within a cluster = ascending exact cosine to the centroid
      (key ``a·|a| / max(nx, 1)`` with ``a = x·c``, ``nx = x·x`` — a
      strictly monotone transform of cos, compared by hugeint
      cross-multiplication), ties by id,
    * drop ``i`` iff ANY earlier-ranked ``j`` has
      ``cos(i, j) > eps_num/eps_den``, tested exactly as
      ``b > 0 and b²·den² > num²·nx_i·nx_j`` (``b = x_i·x_j``).

    ``scale`` defaults to 2^14 (not the fit's 2^20) so every cross
    product stays inside hugeint on the SQL side; the dedup decisions
    are simply DEFINED at that quantization. Contract: per-dim
    ``|value|·scale < 2^25`` keeps all int64 dots exact. O(m²)
    Python-int pair tests per cluster — the scale path is
    :func:`semdedup`. Returns a Dataset of ``(id_col, cluster, keep)``.
    """
    from fractions import Fraction

    from gush_ray.stages.shuffle import partition_map

    num, den = eps
    if centroids is None:
        centroids = kmeans_fit_exact(ds, emb_col=emb_col, k=k,
                                     n_iters=n_iters, scale=scale
                                     )["centroids"]
    C = np.asarray(centroids, dtype=np.int64)
    cent_ref = ray.put(C)

    import pyarrow as pa

    def assign(batch: pa.Table) -> pa.Table:
        m = _quant_matrix(batch, emb_col, scale)
        if not len(m):
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
                "ev": pa.array([], pa.list_(pa.int64())),
            })
        Cw = ray.get(cent_ref)
        a = np.argmin(_int_d2(m, Cw), axis=1).astype(np.int64)
        return pa.table({
            id_col: batch[id_col],
            "cluster": pa.array(a),
            "ev": pa.array(list(m), pa.list_(pa.int64())),
        })

    assigned = ds.map_batches(assign, batch_format="pyarrow",
                              zero_copy_batch=True)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                "cluster": pd.Series([], dtype="int64"),
                "keep": pd.Series([], dtype="bool"),
            })
        Cw = ray.get(cent_ref)
        outs = []
        for c, grp in df.groupby("cluster", sort=True):
            vs = [np.asarray(v, dtype=np.int64) for v in grp["ev"]]
            ids = [int(i) for i in grp[id_col]]
            cen = Cw[int(c)]
            a = [int(v @ cen) for v in vs]
            nx = [int(v @ v) for v in vs]
            order = sorted(
                range(len(vs)),
                key=lambda i: (Fraction(a[i] * abs(a[i]),
                                        nx[i] if nx[i] else 1), ids[i]))
            keep = {}
            for pos, i in enumerate(order):
                ok = True
                for j in order[:pos]:
                    b = int(vs[i] @ vs[j])
                    if b > 0 and b * b * den * den > num * num * nx[i] * nx[j]:
                        ok = False
                        break
                keep[ids[i]] = ok
            outs.append(pd.DataFrame({
                id_col: ids, "cluster": int(c),
                "keep": [keep[i] for i in ids],
            }))
        return pd.concat(outs, ignore_index=True)

    return partition_map(assigned, "cluster", per_part,
                         num_partitions=num_partitions)


def _max_prev_sim(mat: np.ndarray, chunk: int = 1024) -> np.ndarray:
    """For rank-ordered unit rows, ``out[i] = max_{j<i} mat[i]·mat[j]``
    (``-1`` for row 0). Chunked upper-triangular matmul: O(m²d) flops but
    the live temp is bounded at chunk² floats regardless of cluster size
    (this sandbox is memory-bandwidth-bound — see BENCH minhash notes)."""
    m = len(mat)
    out = np.full(m, -1.0)
    for i0 in range(1, m, chunk):
        i1 = min(i0 + chunk, m)
        block = mat[i0:i1]
        best = np.full(i1 - i0, -1.0)
        for j0 in range(0, i1, chunk):
            j1 = min(j0 + chunk, i1)
            s = block @ mat[j0:j1].T
            if j1 > i0:  # mask pairs with j >= i (only earlier ranks count)
                mask = (np.arange(j0, j1)[None, :]
                        >= np.arange(i0, i1)[:, None])
                s[mask] = -1.0
            best = np.maximum(best, s.max(axis=1))
        out[i0:i1] = best
    return out


def semdedup(ds, emb_col: str = "embedding", id_col: str = "vec_id",
             k: int = 8, eps: float = 0.95, num_partitions: int = 16,
             seed: int = 17, n_iters: int = 10, sample_size: int = 20_000,
             centroids: np.ndarray | None = None):
    """Semantic dedup (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
    k-means the embedding space, then within each cluster drop every item
    whose cosine similarity to a higher-ranked clustermate exceeds
    ``eps``. Rank = ascending similarity to the cluster centroid (ties by
    id), so the survivor of each duplicate group is the one FARTHEST from
    the centroid — the paper's keep-low-centroid-similarity rule, which
    preferentially retains the cluster's atypical examples.

    Distributed shape: one k-means fit (streaming partials, corpus never
    shuffles), one assign pass, ONE hash shuffle by cluster id, then a
    vectorized per-cluster kernel inside ``partition_map`` (O(P) Python
    calls). Per-cluster flops are O((n/k)²·d) — at corpus scale pick
    k ∝ √n (the paper uses 50k clusters for LAION) so cluster sizes, and
    with them the quadratic term, stay bounded.

    Returns a Dataset of ``(id_col, cluster, centroid_sim, max_prev_sim,
    keep)`` — filter ``keep`` for the deduplicated corpus.
    """
    from gush_ray.stages.shuffle import partition_map

    if centroids is None:
        centroids = kmeans_fit(ds, emb_col=emb_col, k=k, n_iters=n_iters,
                               seed=seed, sample_size=sample_size
                               )["centroids"]
    assigned = kmeans_assign(ds, centroids, emb_col=emb_col)

    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    cent_ref = ray.put(Cn)

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                "cluster": pd.Series([], dtype="int64"),
                "centroid_sim": pd.Series([], dtype="float64"),
                "max_prev_sim": pd.Series([], dtype="float64"),
                "keep": pd.Series([], dtype="bool"),
            })
        Cw = ray.get(cent_ref)
        outs = []
        for c, grp in df.groupby("cluster", sort=True):
            mat = np.stack([np.asarray(v, dtype=np.float64)
                            for v in grp[emb_col]])
            mat /= np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            csim = mat @ Cw[int(c)]
            ids = grp[id_col].to_numpy()
            order = np.lexsort((ids, csim))  # ascending csim, ties by id
            mp = _max_prev_sim(mat[order])
            outs.append(pd.DataFrame({
                id_col: ids[order], "cluster": int(c),
                "centroid_sim": csim[order], "max_prev_sim": mp,
                "keep": mp <= eps,
            }))
        return pd.concat(outs, ignore_index=True)

    return partition_map(assigned, "cluster", per_partition,
                         num_partitions=num_partitions)


def kmeans_assign(ds, centroids: np.ndarray, emb_col: str = "embedding",
                  out_col: str = "cluster"):
    """Add each row's nearest-centroid id (one streaming pass)."""
    import pyarrow as pa

    C = np.asarray(centroids, dtype=np.float64)
    cent_ref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col,
                                       pa.array([], type=pa.int64()))
        Cw = ray.get(cent_ref)
        m = _to_matrix(batch[emb_col])
        d2 = (-2.0 * (m @ Cw.T)) + (Cw * Cw).sum(axis=1)
        return batch.append_column(
            out_col, pa.array(np.argmin(d2, axis=1).astype(np.int64)))

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)
