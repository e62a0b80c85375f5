"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k as the correctness baseline (numpy matmul per
batch against a broadcast query matrix) and an LSH-bucketed variant as the
100 TB scale path — no stage materializes the full embedding table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _to_matrix(col) -> np.ndarray:
    """list<float> arrow column → (n, d) float64 matrix (zero-copy-ish).

    Empty columns yield a (0, 0) matrix — callers must guard (Ray Data
    hands empty blocks to map_batches fns after filters/splits)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.zeros((0, 0), dtype=np.float64)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    d = len(col[0])
    return flat.reshape(len(col), d)


def _empty_topk(id_col: str) -> pa.Table:
    return pa.table({id_col: pa.array([], type=pa.int64()),
                     "sim": pa.array([], type=pa.float64())})


def brute_force_topk(ds, query_vec: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", emb_col: str = "embedding"):
    """Exact cosine top-k: per-batch matmul + per-batch top-k, tiny global
    merge on the driver (k rows per batch, not the table)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)

    def batch_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_topk(id_col)
        qv = ray.get(q_ref)
        mat = _to_matrix(batch[emb_col])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ qv) / norms
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        # deterministic cut: ties at the k-th boundary break by id asc
        # (matches the oracle's ORDER BY sim DESC, vec_id)
        order = np.lexsort((ids, -sims))[: min(k, len(sims))]
        return pa.table({id_col: pa.array(ids[order]),
                         "sim": pa.array(sims[order])})

    partial = ds.map_batches(batch_topk, batch_format="pyarrow",
                             zero_copy_batch=True)
    # global merge: ≤ k rows per batch → tiny
    top = partial.to_pandas()
    top = top.sort_values(["sim", id_col], ascending=[False, True]).head(k)
    top["sim"] = top["sim"].round(4)
    return top.reset_index(drop=True)


def exact_cosine_pairs(ds, threshold: float, id_col: str = "vec_id",
                       emb_col: str = "embedding", ndigits: int = 4,
                       max_rows: int = 200_000):
    """Exact all-pairs cosine ≥ threshold via a broadcast matrix: each
    batch computes batch × ALL sims with one matmul and keeps (a < b)
    pairs. O(n²) flops but O(n·d) broadcast traffic — the exact baseline
    the LSH-bucketed near-dup approximates; at corpus scale use
    :func:`~gush_ray.stages.dedup.embedding_near_dup_pairs` instead.

    ``max_rows`` guards the small-by-contract assumption: the whole
    table is broadcast AND the flop count is quadratic, so invoking this
    on a corpus-scale dataset by accident must fail fast, not OOM.
    """
    import pandas as pd

    # materialize ONCE: count() then to_pandas() then the map below
    # would otherwise execute the upstream pipeline three times
    ds = ds.materialize()
    n = ds.count()  # from block metadata — free after materialize
    if n > max_rows:
        raise ValueError(
            f"exact_cosine_pairs is the small-input exact baseline "
            f"(broadcasts all rows, O(n²) flops): got {n} rows > "
            f"max_rows={max_rows}; use "
            f"gush_ray.stages.dedup.embedding_near_dup_pairs at scale"
        )
    full = ds.to_pandas()  # the broadcast side (small by contract)
    ids_all = full[id_col].to_numpy()
    mat_all = np.stack([np.asarray(v, dtype=np.float64)
                        for v in full[emb_col]])
    norms_all = np.linalg.norm(mat_all, axis=1)
    norms_all[norms_all == 0] = 1.0
    unit_all = mat_all / norms_all[:, None]
    ref = ray.put((ids_all, unit_all))

    def batch_pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_a": pa.array([], type=pa.int64()),
                             "doc_b": pa.array([], type=pa.int64()),
                             "cosine": pa.array([], type=pa.float64())})
        ids_a, unit_a = ray.get(ref)
        mat = _to_matrix(batch[emb_col])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat / norms[:, None]) @ unit_a.T
        ids_b = batch[id_col].to_numpy(zero_copy_only=False)
        bi, ai = np.nonzero(sims >= threshold)
        keep = ids_b[bi] < ids_a[ai]  # (a < b), no self/dup pairs
        return pa.table({
            "doc_a": pa.array(ids_b[bi][keep], type=pa.int64()),
            "doc_b": pa.array(ids_a[ai][keep], type=pa.int64()),
            "cosine": pa.array(np.round(sims[bi, ai][keep], ndigits)),
        })

    return ds.map_batches(batch_pairs, batch_format="pyarrow",
                          zero_copy_batch=True)


def _check_index_params(index_dir: str, n_planes: int, seed: int) -> None:
    """Fail loudly when querying an index built with different LSH
    parameters (the bucket layout would not match the probe set)."""
    import json
    import os

    manifest = os.path.join(index_dir, "_lsh_index.json")
    if not os.path.exists(manifest):
        return  # pre-manifest index: caller vouches for the params
    with open(manifest) as f:
        have = json.load(f)
    want = {"n_planes": n_planes, "seed": seed}
    if have != want:
        raise ValueError(
            f"LSH index at {index_dir!r} was built with {have}, "
            f"queried with {want}"
        )


def build_lsh_index(ds, index_dir: str, n_planes: int = 8, seed: int = 17,
                    id_col: str = "vec_id", emb_col: str = "embedding") -> str:
    """Build-once ANN index: each row's random-hyperplane signature is
    computed ONCE and the table is written as parquet PARTITIONED BY
    bucket (``bucket=N/`` hive dirs) — repeated queries then prune at
    the read, scanning only the probed buckets' files instead of
    re-signing the whole corpus per query (round-1 ``lsh_bucket_topk``
    recomputed signatures for every row on every query).

    Idempotent: written to a temp dir, renamed into place; an existing
    index is reused ONLY if its recorded (n_planes, seed) match — a
    silent reuse across parameter changes would probe a stale bucket
    layout and return wrong top-k.
    """
    import json
    import os
    import shutil
    import uuid

    from gush_ray.stages.dedup import _lsh_planes

    params = {"n_planes": n_planes, "seed": seed}
    manifest = os.path.join(index_dir, "_lsh_index.json")
    if os.path.isdir(index_dir) and os.listdir(index_dir):
        try:
            with open(manifest) as f:
                have = json.load(f)
        except OSError:
            have = None  # pre-manifest index: caller vouches (as query)
        if have is not None and have != params:
            raise ValueError(
                f"existing LSH index at {index_dir!r} was built with "
                f"{have}, requested {params} — delete it or use a "
                f"different index_dir"
            )
        return index_dir
    weights = 1 << np.arange(n_planes)

    def sign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("bucket",
                                       pa.array([], type=pa.int64()))
        mat = _to_matrix(batch[emb_col])
        planes = _lsh_planes(n_planes, mat.shape[1], seed)
        sig = (mat @ planes.T > 0).dot(weights).astype(np.int64)
        return batch.append_column("bucket", pa.array(sig))

    tmp = f"{index_dir}.building-{uuid.uuid4().hex}"
    ds.map_batches(sign, batch_format="pyarrow",
                   zero_copy_batch=True).write_parquet(
        tmp, partition_cols=["bucket"]
    )
    with open(os.path.join(tmp, "_lsh_index.json"), "w") as f:
        json.dump(params, f)
    try:
        os.rename(tmp, index_dir)
    except OSError:
        # concurrent builder won the rename: use theirs
        shutil.rmtree(tmp, ignore_errors=True)
    return index_dir


def lsh_index_topk(index_dir: str, query_vec: np.ndarray, k: int = 10,
                   n_planes: int = 8, seed: int = 17, n_probe_bits: int = 1,
                   id_col: str = "vec_id", emb_col: str = "embedding",
                   all_buckets: bool = False):
    """Query a :func:`build_lsh_index` index: exact cosine top-k over
    ONLY the probed buckets' partitions (query bucket ± single-bit
    flips) — the read prunes to ~(1+n_planes)/2^n_planes of the corpus.
    Same plane family as the index builder (dedup._lsh_planes), so
    signatures agree by construction.

    ``all_buckets=True`` probes every bucket: the scan degrades to the
    exact brute-force top-k (recall 1.0, zero pruning) — the oracle
    anchor that lets the index read path be SQL-verified end-to-end."""
    import os

    import ray.data as rd

    from gush_ray.stages.dedup import _lsh_planes

    _check_index_params(index_dir, n_planes, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    planes = _lsh_planes(n_planes, len(q), seed)
    q_sig = int((planes @ q > 0).dot(1 << np.arange(n_planes)))
    probe = {q_sig}
    if all_buckets:
        probe = set(range(1 << n_planes))
    elif n_probe_bits >= 1:
        probe |= {q_sig ^ (1 << b) for b in range(n_planes)}
    dirs = [
        os.path.join(index_dir, f"bucket={s}")
        for s in sorted(probe)
        if os.path.isdir(os.path.join(index_dir, f"bucket={s}"))
    ]
    # read_parquet wants files when given a list: expand the bucket dirs
    paths = [
        os.path.join(d, f)
        for d in dirs
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if not paths:
        import pandas as pd

        return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             "sim": pd.Series(dtype="float64")})
    sub = rd.read_parquet(paths, columns=[id_col, emb_col])
    return brute_force_topk(sub, q, k=k, id_col=id_col, emb_col=emb_col)


def lsh_index_scan_fraction(index_dir: str, query_vec: np.ndarray,
                            n_planes: int = 8, seed: int = 17,
                            n_probe_bits: int = 1) -> float:
    """Bytes under the probed partitions / total index bytes — the
    read-pruning evidence a query benchmark records."""
    import os

    from gush_ray.stages.dedup import _lsh_planes

    _check_index_params(index_dir, n_planes, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    planes = _lsh_planes(n_planes, len(q), seed)
    q_sig = int((planes @ q > 0).dot(1 << np.arange(n_planes)))
    probe = {q_sig}
    if n_probe_bits >= 1:
        probe |= {q_sig ^ (1 << b) for b in range(n_planes)}

    def dir_bytes(d):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _dirs, fs in os.walk(d) for f in fs
        )

    total = dir_bytes(index_dir)
    probed = sum(
        dir_bytes(os.path.join(index_dir, f"bucket={s}"))
        for s in probe
        if os.path.isdir(os.path.join(index_dir, f"bucket={s}"))
    )
    return probed / max(total, 1)


def _spherical_kmeans(unit: np.ndarray, n_lists: int, n_iters: int,
                      seed: int) -> np.ndarray:
    """Vectorized spherical k-means (cosine Lloyd) over a UNIT-norm
    sample. kmeans++-style farthest-point seeding, empty lists reseeded
    to the worst-assigned points. Returns (n_lists, d) unit centroids."""
    rng = np.random.RandomState(seed)
    n = len(unit)
    n_lists = min(n_lists, n)
    # greedy farthest-point init: deterministic and spread-out
    first = int(rng.randint(n))
    cent = [unit[first]]
    best = unit @ cent[0]
    for _ in range(n_lists - 1):
        nxt = int(np.argmin(best))
        cent.append(unit[nxt])
        best = np.maximum(best, unit @ cent[-1])
    C = np.stack(cent)
    for _ in range(n_iters):
        sims = unit @ C.T
        assign = np.argmax(sims, axis=1)
        newC = np.zeros_like(C)
        np.add.at(newC, assign, unit)
        norms = np.linalg.norm(newC, axis=1)
        empty = norms == 0
        if empty.any():
            # reseed dead lists to the points farthest from their list
            worst = np.argsort(sims[np.arange(n), assign])[: int(empty.sum())]
            newC[empty] = unit[worst]
            norms[empty] = 1.0
        C = newC / norms[:, None]
    return C


def build_ivf_index(ds, index_dir: str, n_lists: int = 16,
                    sample_size: int = 20_000, n_iters: int = 15,
                    seed: int = 17, id_col: str = "vec_id",
                    emb_col: str = "embedding") -> str:
    """Build-once IVF (inverted-file) ANN index: spherical k-means
    centroids trained on a deterministic hash sample, every row assigned
    to its max-cosine list ONCE, table written as parquet PARTITIONED BY
    list (``list=N/`` hive dirs). Queries then read only the ``n_probe``
    lists nearest the query vector — data-adaptive pruning, the
    complement of the data-oblivious hyperplane cut in
    :func:`build_lsh_index` (IVF prunes better when the corpus is
    clustered; LSH needs no training pass).

    100-TB shape: the only driver-side materialization is the k-means
    SAMPLE (``sample_size`` rows, picked by a splitmix hash of the id —
    deterministic, one cheap metadata ``count()`` on the raw read to set
    the rate); assignment streams per batch against the broadcast
    (n_lists × d) centroid matrix. Idempotent + parameter-guarded like
    the LSH index: temp-dir build, rename into place, manifest mismatch
    fails loudly.
    """
    import json
    import os
    import shutil
    import uuid

    params = {"kind": "ivf", "n_lists": n_lists, "seed": seed,
              "sample_size": sample_size, "n_iters": n_iters}
    manifest = os.path.join(index_dir, "_ivf_index.json")
    if os.path.isdir(index_dir) and os.listdir(index_dir):
        try:
            with open(manifest) as f:
                have = json.load(f)
        except OSError:
            have = None
        if have != params:
            raise ValueError(
                f"existing IVF index at {index_dir!r} was built with "
                f"{have}, requested {params} — delete it or use a "
                f"different index_dir"
            )
        return index_dir

    n = ds.count()  # metadata-only on a raw parquet read
    rate = min(1.0, sample_size / max(n, 1))
    thresh = np.uint64(min(int(rate * 2**64), 2**64 - 1))

    def hash_sample(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or rate >= 1.0:
            return batch
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        # splitmix64 finalizer: uniform, deterministic in the id
        z = ids + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
        return batch.filter(pa.array(z < thresh))

    sample = ds.map_batches(
        hash_sample, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # ≤ ~sample_size rows by construction
    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in sample[emb_col]])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    centroids = _spherical_kmeans(mat / norms[:, None], n_lists,
                                  n_iters, seed)
    cent_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("list",
                                       pa.array([], type=pa.int64()))
        C = ray.get(cent_ref)
        m = _to_matrix(batch[emb_col])
        nn = np.linalg.norm(m, axis=1)
        nn[nn == 0] = 1.0
        lists = np.argmax((m / nn[:, None]) @ C.T, axis=1).astype(np.int64)
        return batch.append_column("list", pa.array(lists))

    tmp = f"{index_dir}.building-{uuid.uuid4().hex}"
    ds.map_batches(assign, batch_format="pyarrow",
                   zero_copy_batch=True).write_parquet(
        tmp, partition_cols=["list"]
    )
    np.save(os.path.join(tmp, "_centroids.npy"), centroids)
    with open(os.path.join(tmp, "_ivf_index.json"), "w") as f:
        json.dump(params, f)
    try:
        os.rename(tmp, index_dir)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # concurrent builder won
    return index_dir


def _ivf_probe_lists(index_dir: str, query_vec: np.ndarray,
                     n_probe: int) -> list[int]:
    import json
    import os

    with open(os.path.join(index_dir, "_ivf_index.json")) as f:
        params = json.load(f)
    centroids = np.load(os.path.join(index_dir, "_centroids.npy"))
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    order = np.argsort(-(centroids @ qn), kind="stable")
    return [int(i) for i in order[: min(n_probe, params["n_lists"])]]


def ivf_index_topk(index_dir: str, query_vec: np.ndarray, k: int = 10,
                   n_probe: int = 4, id_col: str = "vec_id",
                   emb_col: str = "embedding"):
    """Query a :func:`build_ivf_index` index: exact cosine top-k over
    ONLY the ``n_probe`` lists whose centroids are nearest the query —
    the read prunes to ~n_probe/n_lists of the corpus (exactly, when
    lists are balanced). ``n_probe = n_lists`` degrades to the exact
    scan, so recall is tunable per query with no rebuild."""
    import os

    import ray.data as rd

    paths = [
        os.path.join(d, f)
        for s in _ivf_probe_lists(index_dir, query_vec, n_probe)
        if os.path.isdir(d := os.path.join(index_dir, f"list={s}"))
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if not paths:
        return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             "sim": pd.Series(dtype="float64")})
    sub = rd.read_parquet(paths, columns=[id_col, emb_col])
    return brute_force_topk(sub, query_vec, k=k, id_col=id_col,
                            emb_col=emb_col)


def ivf_scan_fraction(index_dir: str, query_vec: np.ndarray,
                      n_probe: int = 4) -> float:
    """Bytes under the probed lists / total index bytes — the
    read-pruning evidence a query benchmark records."""
    import os

    def dir_bytes(d):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _dirs, fs in os.walk(d) for f in fs
        )

    probed = sum(
        dir_bytes(d)
        for s in _ivf_probe_lists(index_dir, query_vec, n_probe)
        if os.path.isdir(d := os.path.join(index_dir, f"list={s}"))
    )
    return probed / max(dir_bytes(index_dir), 1)


def lsh_bucket_topk(ds, query_vec: np.ndarray, k: int = 10, n_planes: int = 8,
                    seed: int = 17, id_col: str = "vec_id",
                    emb_col: str = "embedding", n_probe_bits: int = 1):
    """Approximate top-k: random-hyperplane LSH prefilter, then exact
    cosine only inside the query's bucket (± n_probe_bits flipped buckets).

    The scale path: at 10^12 vectors the brute-force scan touches
    everything; this touches ~n_probe/2^n_planes of it.
    """
    rng = np.random.RandomState(seed)
    q = np.asarray(query_vec, dtype=np.float64)
    d = len(q)
    planes = rng.randn(n_planes, d)
    q_sig = int((planes @ q > 0).dot(1 << np.arange(n_planes)))
    probe = {q_sig}
    if n_probe_bits >= 1:  # multi-probe: also search single-bit-flip buckets
        probe |= {q_sig ^ (1 << b) for b in range(n_planes)}
    probe_ref = ray.put((planes, frozenset(probe)))
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)

    def bucket_filter_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_topk(id_col)
        planes_, probe_ = ray.get(probe_ref)
        qv = ray.get(q_ref)
        mat = _to_matrix(batch[emb_col])
        sigs = (mat @ planes_.T > 0).dot(1 << np.arange(planes_.shape[0]))
        mask = np.isin(sigs, list(probe_))
        if not mask.any():
            return _empty_topk(id_col)
        sub = mat[mask]
        norms = np.linalg.norm(sub, axis=1)
        norms[norms == 0] = 1.0
        sims = (sub @ qv) / norms
        ids = batch[id_col].to_numpy(zero_copy_only=False)[mask]
        order = np.lexsort((ids, -sims))[: min(k, len(sims))]
        return pa.table({id_col: pa.array(ids[order]),
                         "sim": pa.array(sims[order])})

    partial = ds.map_batches(bucket_filter_topk, batch_format="pyarrow",
                             zero_copy_batch=True)
    top = partial.to_pandas()
    top = top.sort_values(["sim", id_col], ascending=[False, True]).head(k)
    top["sim"] = top["sim"].round(4)
    return top.reset_index(drop=True)
