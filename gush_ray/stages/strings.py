"""String-similarity operators: batched edit distance + blocked pair join.

The reference engine has no string-similarity family; this is part of the
training-data toolkit (near-duplicate titles/URLs, OCR noise clustering).
Semantics are declared as *blocked* similarity: candidate pairs share an
exact key (here: a fixed-length prefix), then the full edit distance is
verified — both halves are expressible in SQL (``substr`` equality +
``levenshtein``), so the whole operator oracle-pairs bit-exactly.

Scale shape: ONE hash shuffle by block key co-locates each block; the
in-block cross product is the declared semantics (blocks are tiny for
real text prefixes — the skew cap below guards pathological boilerplate
prefixes, and records what it dropped).

The Levenshtein kernel is vectorized ACROSS pairs: the classic two-row
DP iterates over the left string's characters only; the within-row
left-to-right relaxation ``d[k] = min(d[k], d[k-1]+1)`` — normally a
sequential scan — is computed as ``k + cummin(d[k] - k)`` with
``np.minimum.accumulate``, so each DP row is O(pairs × len) numpy work.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from gush_ray.stages.shuffle import partition_map


def levenshtein_batch(a_strs, b_strs, max_len: int = 64) -> np.ndarray:
    """Edit distance for each aligned pair, vectorized across pairs.

    Strings are compared on their first ``max_len`` UTF-32 code points
    (callers truncate consistently on both sides of an oracle compare).
    """
    a_list = ["" if s is None else s[:max_len] for s in a_strs]
    b_list = ["" if s is None else s[:max_len] for s in b_strs]
    P = len(a_list)
    if P == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.array([len(s) for s in a_list], dtype=np.int64)
    lb = np.array([len(s) for s in b_list], dtype=np.int64)
    La, Lb = int(la.max(initial=0)), int(lb.max(initial=0))
    # fixed-width code-point matrices (padded with an impossible value)
    A = np.zeros((P, max(La, 1)), dtype=np.uint32)
    B = np.zeros((P, max(Lb, 1)), dtype=np.uint32)
    for i, s in enumerate(a_list):
        if s:
            A[i, :len(s)] = np.frombuffer(s.encode("utf-32-le"),
                                          dtype=np.uint32)
    for i, s in enumerate(b_list):
        if s:
            B[i, :len(s)] = np.frombuffer(s.encode("utf-32-le"),
                                          dtype=np.uint32)

    BIG = np.int64(1 << 30)
    ks = np.arange(Lb + 1, dtype=np.int64)[None, :]
    # row j=0: distance from "" to b[:k] is k, but positions beyond each
    # pair's lb must never win a min — mask them BIG
    row = np.broadcast_to(ks, (P, Lb + 1)).copy()
    row[ks > lb[:, None]] = BIG
    out = np.where(la == 0, lb, 0).astype(np.int64)
    for j in range(1, La + 1):
        active = la >= j  # pairs whose left string still has chars
        cost = (A[:, j - 1][:, None] != B).astype(np.int64)
        new = np.empty_like(row)
        new[:, 0] = j
        # candidates without the horizontal dependency
        new[:, 1:] = np.minimum(row[:, 1:] + 1, row[:, :-1] + cost)
        # horizontal relaxation new[k] = min_{i<=k}(new[i] + (k-i))
        new = ks + np.minimum.accumulate(new - ks, axis=1)
        new[ks > lb[:, None]] = BIG
        row = np.where(active[:, None], new, row)
        done = la == j
        if done.any():
            out[done] = row[done, lb[done]]
    return out


def prefix_blocked_editdist_pairs(ds, id_col: str, text_col: str,
                                  block_len: int = 16, cmp_len: int = 40,
                                  max_dist: int = 4,
                                  max_block: int | None = None,
                                  num_partitions: int = 32):
    """Blocked edit-distance similarity join (self-join).

    Pairs (a, b) with ``a.id < b.id`` whose first ``block_len`` chars are
    equal and whose first ``cmp_len`` chars are within ``max_dist`` edits.
    One hash shuffle by block; the in-block cross product is the declared
    semantics. ``max_block`` (scale guard, off for oracle runs) caps a
    block to its ``max_block`` smallest ids — boilerplate-prefix skew at
    corpus scale — and is deterministic when applied.

    Returns columns: id_a, id_b, dist.
    """

    def project(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].fillna("")
        return pd.DataFrame({
            id_col: df[id_col],
            "__blk": s.str.slice(0, block_len),
            "__cmp": s.str.slice(0, cmp_len),
        })

    proj = ds.map_batches(project, batch_format="pandas")

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        if max_block is not None and len(df):
            df = (df.sort_values([ "__blk", id_col], kind="mergesort")
                    .groupby("__blk", sort=False).head(max_block))
        m = df.merge(df, on="__blk", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        if not len(m):
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "dist": pd.Series(dtype="int64")})
        d = levenshtein_batch(m["__cmp_a"].tolist(), m["__cmp_b"].tolist(),
                              max_len=cmp_len)
        keep = d <= max_dist
        return pd.DataFrame({
            "id_a": m[f"{id_col}_a"].to_numpy()[keep],
            "id_b": m[f"{id_col}_b"].to_numpy()[keep],
            "dist": d[keep],
        })

    return partition_map(proj, "__blk", per_part, num_partitions)
