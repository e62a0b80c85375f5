"""Integer-exact distributed linear probe (least-squares via normal
equations + Cramer's rule).

The training-data use: fit a tiny linear model of a quality signal over
integer text features (token counts, char counts, distinct-token
counts) across the whole corpus WITHOUT collecting it — the classic
"linear probe" diagnostic. The distributed shape is the same as every
combiner here: each batch reduces to the fixed-size sufficient
statistics ``X^T X`` (upper triangle) and ``X^T y`` — integer sums of
integer products — and only those partials move. The driver holds one
k×k matrix and solves the 3-coefficient system by CRAMER'S RULE in
exact Python ints (3×3 determinants of ~1e10-scale sums reach ~1e30,
past int64 — the SQL twin uses HUGEINT for the same products), then
emits the coefficients in micro units with TRUNCATING division
(``//`` in DuckDB truncates toward zero, unlike Python's floor — the
one semantic both sides must share for bit-exactness on negative
coefficients).

Why exact: float normal equations are summation-order-dependent, so a
distributed fit could never be hash-compared to SQL. Integer sufficient
statistics are associative/commutative — any batch boundary gives the
identical matrix — and the determinant ratio is a pure function of it.

Scale notes: the per-batch partial is O(k²) ints regardless of batch
size; the gather is one fixed-size row per block. int64 partial sums
bound the corpus at Σ f_i·f_j < 2^63 (~9e18 — e.g. 1e12 docs × 1e6
per-doc products); past that, promote the partial columns to Python
ints per batch (object dtype) or shard the sums — documented, not
needed at fixture scale.

Reference parity: the reference (simao/gush) has no ML surface; this
belongs to the graft brief's training-data families (quality scoring).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — DuckDB's ``//``."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def linear_probe(ds, feature_cols: list[str], target_col: str,
                 scale: int = 10**6):
    """Fit ``target ~ 1 + features`` by exact integer least squares.

    ``ds`` rows must carry INTEGER feature/target columns (compute them
    upstream with a vectorized map — e.g. token counts). Returns a
    one-row pandas DataFrame: ``n_rows``, ``det`` (the normal-matrix
    determinant as a string — it exceeds int64; the oracle compares it
    via the same cast) and ``b{i}_micro`` truncated-micro coefficients.

    Raises on a singular system (det == 0) — collinear features have no
    unique least-squares solution and silently emitting one would be a
    wrong answer.
    """
    k = len(feature_cols) + 1  # +1 intercept

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        cols = [np.ones(len(b), dtype=np.int64)] + [
            b[c].to_numpy(np.int64) for c in feature_cols]
        y = b[target_col].to_numpy(np.int64)
        out = {"n": np.int64(len(b))}
        for i in range(k):
            for j in range(i, k):
                out[f"s{i}{j}"] = (cols[i] * cols[j]).sum()
            out[f"t{i}"] = (cols[i] * y).sum()
        return pd.DataFrame([out])

    part = ds.map_batches(partials, batch_format="pandas").to_pandas()
    # fixed-size gather: one row per block, k(k+1)/2 + k + 1 ints each
    sums = {c: int(part[c].sum()) for c in part.columns}

    A = [[sums[f"s{min(i, j)}{max(i, j)}"] for j in range(k)]
         for i in range(k)]
    t = [sums[f"t{i}"] for i in range(k)]

    def det3(m) -> int:
        return (m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
                - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
                + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]))

    if k != 3:
        raise NotImplementedError(
            "linear_probe solves the 3-coefficient system (intercept + 2 "
            "features) — the Cramer expansion is written out to stay "
            "SQL-twin-checkable; extend det3 for more features")
    D = det3(A)
    if D == 0:
        raise ValueError("linear_probe: singular normal matrix "
                         "(collinear features)")
    out = {"n_rows": sums["n"], "det": str(D)}
    for i in range(3):
        Ai = [row[:] for row in A]
        for r in range(3):
            Ai[r][i] = t[r]
        out[f"b{i}_micro"] = _tdiv(det3(Ai) * scale, D)
    return pd.DataFrame([out])
