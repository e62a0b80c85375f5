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
                   id_col: str = "vec_id", emb_col: str = "embedding"):
    """Query a :func:`build_lsh_index` index: exact cosine top-k over
    ONLY the probed buckets' partitions (query bucket ± single-bit
    flips) — the read prunes to ~(1+n_planes)/2^n_planes of the corpus.
    Same plane family as the index builder (dedup._lsh_planes), so
    signatures agree by construction."""
    import os

    import ray.data as rd

    from gush_ray.stages.dedup import _lsh_planes

    _check_index_params(index_dir, n_planes, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    planes = _lsh_planes(n_planes, len(q), seed)
    q_sig = int((planes @ q > 0).dot(1 << np.arange(n_planes)))
    probe = {q_sig}
    if n_probe_bits >= 1:
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
