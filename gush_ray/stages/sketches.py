"""Mergeable sketches for corpus-scale statistics: bounded-memory heavy
hitters and HyperLogLog approximate distinct counts.

The brief's "novel sketch" family: at 10^12 rows an exact groupby of a
high-cardinality key is an all-to-all of the keyspace; these operators
bound worker AND driver memory by a fixed capacity, shuffling only
sketch summaries. Both follow the combine-per-batch → merge pattern
(the same discipline as agg.partial_aggregate):

* :func:`heavy_hitters` — per-batch exact counts truncated to
  ``capacity`` with the dropped mass tracked, merged by summation; the
  result carries ``[count_lower, count_upper]`` bounds (Misra-Gries
  style guarantee: upper - lower ≤ total dropped mass, which is 0 —
  i.e. EXACT — whenever per-batch distinct ≤ capacity).
* :class:`HyperLogLog` / :func:`approx_distinct` — classic HLL
  (Flajolet et al.): 2^p byte registers, vectorized rank extraction,
  elementwise-max merge, bias-corrected estimate with linear counting
  for the small range. Standard error ≈ 1.04/sqrt(2^p).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from gush_ray.stages.shuffle import stable_hash


# ---------------------------------------------------------- heavy hitters

def heavy_hitters(ds, col: str, k: int = 10, capacity: int = 256):
    """Top-k values of ``col`` with count bounds under fixed memory.

    Per batch: exact ``value_counts`` truncated to the ``capacity`` most
    frequent (deterministic tie-break by value), the truncated tail's
    total recorded as that batch's dropped mass. Partials are summed per
    value; every surviving value's true count lies in
    ``[n, n + dropped_mass_total]``. With ``capacity`` at or above the
    per-batch distinct count nothing is dropped and the answer is exact
    (how the oracle pairing stays bit-exact at test scale — at corpus
    scale the capacity is the memory knob and the bounds are the
    honesty).

    Returns a pandas DataFrame (k rows — driver-small by construction):
    ``(value_col, n, n_upper)`` sorted by count desc, value asc.
    """

    def sketch_batch(b: pd.DataFrame) -> pd.DataFrame:
        vc = b[col].value_counts(sort=False).reset_index()
        vc.columns = [col, "n"]
        vc = vc.sort_values(["n", col], ascending=[False, True],
                            kind="mergesort")
        kept = vc.iloc[:capacity]
        dropped = int(vc["n"].iloc[capacity:].sum())
        out = pd.DataFrame({col: kept[col], "n": kept["n"].astype("int64")})
        out["dropped"] = np.int64(0)
        if dropped:
            # one carrier row per batch for the dropped mass (null value)
            out = pd.concat(
                [out, pd.DataFrame({col: [None], "n": [0],
                                    "dropped": [dropped]})],
                ignore_index=True,
            )
        return out

    partials = ds.map_batches(sketch_batch, batch_format="pandas")
    from gush_ray.stages.agg import partial_aggregate

    merged = partial_aggregate(
        partials, [col], {"n": ("n", "sum"), "dropped": ("dropped", "sum")}
    ).to_pandas()
    total_dropped = int(merged["dropped"].sum())
    merged = merged[merged[col].notna()]
    top = merged.sort_values(["n", col], ascending=[False, True],
                             kind="mergesort").head(k)
    out = top[[col, "n"]].reset_index(drop=True)
    out["n_upper"] = out["n"] + total_dropped
    return out


# ------------------------------------------------------------ HyperLogLog

class HyperLogLog:
    """Vectorized HLL: add batches of values, merge, estimate."""

    def __init__(self, p: int = 12):
        assert 4 <= p <= 18
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add(self, values) -> None:
        h = stable_hash(np.asarray(values))
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining bits + 1, vectorized via
        # bit-length: clz(x) = 64 - bit_length(x) for x > 0
        bl = np.zeros(len(rest), dtype=np.int64)
        x = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            ge = x >= (np.uint64(1) << np.uint64(shift))
            bl[ge] += shift
            x[ge] >>= np.uint64(shift)
        bl += (x > 0).astype(np.int64)
        rank = (64 - bl + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        raw = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting, small range
        return raw

    def state(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_state(cls, p: int, blob: bytes) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(blob, dtype=np.uint8).copy()
        return h


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col): per-batch HLL registers, merged
    by elementwise max — each batch ships 2^p bytes regardless of batch
    cardinality (an exact distinct shuffles the whole keyspace)."""

    def sketch_batch(b: pd.DataFrame) -> pd.DataFrame:
        h = HyperLogLog(p)
        if len(b):
            h.add(b[col].to_numpy())
        return pd.DataFrame({"registers": [h.state()]})

    partials = ds.map_batches(sketch_batch, batch_format="pandas")
    merged = HyperLogLog(p)
    # one 2^p-byte row per input block: driver-small by construction
    for blob in partials.to_pandas()["registers"]:
        merged.merge(HyperLogLog.from_state(p, blob))
    return merged.estimate()
