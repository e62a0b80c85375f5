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
        # dropna=False: NULL is a countable group (SQL GROUP BY keeps
        # it; the repo's aggregation discipline throughout). The null
        # group coexists with the null-valued dropped-mass carrier row:
        # both land in the same merged group and their (n, dropped)
        # columns sum independently.
        vc = b[col].value_counts(sort=False, dropna=False).reset_index()
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
    # keep the null group when it has real counts; the pure carrier row
    # (n == 0) exists only to ship dropped mass and is not a value
    merged = merged[(merged["n"] > 0) | merged[col].notna()]
    top = merged.sort_values(["n", col], ascending=[False, True],
                             kind="mergesort", na_position="last").head(k)
    out = top[[col, "n"]].reset_index(drop=True)
    out["n_upper"] = out["n"] + total_dropped
    return out


# ------------------------------------------------------------ HyperLogLog

def hll_idx_rank(values, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) arrays for a value batch — the vectorized
    core of :meth:`HyperLogLog.add`, exposed so per-group streaming
    accumulators (state/store.py window_hll_p) can hash a batch ONCE and
    scatter-max into many per-window register arrays."""
    h = stable_hash(np.asarray(values))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
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
    return idx, rank


def hll_estimate(registers: np.ndarray) -> float:
    """Estimate from a raw register array (same math as
    :meth:`HyperLogLog.estimate`, usable on merged partials)."""
    m = float(len(registers))
    alpha = 0.7213 / (1 + 1.079 / m)
    inv = np.ldexp(1.0, -registers.astype(np.int64))
    raw = alpha * m * m / inv.sum()
    zeros = int((registers == 0).sum())
    if raw <= 2.5 * m and zeros:
        return float(m * np.log(m / zeros))  # linear counting
    return float(raw)


class HyperLogLog:
    """Vectorized HLL: add batches of values, merge, estimate."""

    def __init__(self, p: int = 12):
        assert 4 <= p <= 18
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add(self, values) -> None:
        idx, rank = hll_idx_rank(values, self.p)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        return hll_estimate(self.registers)

    def state(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_state(cls, p: int, blob: bytes) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(blob, dtype=np.uint8).copy()
        return h


# ------------------------------------------------------------ Bloom filter

class BloomFilter:
    """Vectorized Bloom filter: k double-hashed probes into an m-bit
    array. Deterministic (pd.util.hash_array with fixed keys) so the
    same values always map to the same bits across processes."""

    def __init__(self, m_bits: int = 1 << 23, k: int = 5):
        assert m_bits % 8 == 0 and m_bits > 0 and k > 0
        self.m = m_bits
        self.k = k
        self.bits = np.zeros(m_bits >> 3, dtype=np.uint8)

    @staticmethod
    def _mix64(x: np.ndarray) -> np.ndarray:
        """splitmix64 finalizer — an independent second hash derived
        from the first (pd.util.hash_array IGNORES hash_key for numeric
        dtypes, so 'hash twice with different keys' silently yields
        correlated probes and ~20x the theoretical fpp; measured)."""
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))

    def _probes(self, values: np.ndarray):
        arr = np.asarray(values)
        h1 = pd.util.hash_array(arr, categorize=False)
        # Kirsch-Mitzenmacher double hashing; stride forced odd so it
        # covers the table
        h2 = self._mix64(h1) | np.uint64(1)
        for i in range(self.k):
            yield (h1 + np.uint64(i) * h2) % np.uint64(self.m)

    def add(self, values) -> None:
        for idx in self._probes(values):
            byte = (idx >> np.uint64(3)).astype(np.int64)
            bit = np.left_shift(
                np.uint8(1), (idx & np.uint64(7)).astype(np.uint8)
            )
            np.bitwise_or.at(self.bits, byte, bit)

    def contains(self, values) -> np.ndarray:
        arr = np.asarray(values)
        out = np.ones(len(arr), dtype=bool)
        for idx in self._probes(arr):
            byte = (idx >> np.uint64(3)).astype(np.int64)
            shift = (idx & np.uint64(7)).astype(np.uint8)
            out &= ((self.bits[byte] >> shift) & np.uint8(1)).astype(bool)
        return out

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m == other.m and self.k == other.k
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self


def build_bloom(ds, col: str, m_bits: int = 1 << 23, k: int = 5
                ) -> BloomFilter:
    """Distributed Bloom build: each batch ships m/8 bytes of set bits
    (never its values); the driver ORs one blob per block. m is the
    fixed memory knob — at 10^9 keys use m ≈ 10 bits/key for ~1% fpp."""

    def sketch(b: pd.DataFrame) -> pd.DataFrame:
        f = BloomFilter(m_bits, k)
        if len(b):
            f.add(b[col].to_numpy())
        return pd.DataFrame({"bits": [f.bits.tobytes()]})

    merged = BloomFilter(m_bits, k)
    for blob in ds.map_batches(sketch,
                               batch_format="pandas").to_pandas()["bits"]:
        np.bitwise_or(merged.bits, np.frombuffer(blob, dtype=np.uint8),
                      out=merged.bits)
    return merged


def bloom_semi_filter(ds, bloom: BloomFilter, col: str, keep: bool = True):
    """Semi/anti filter against a broadcast Bloom filter — the scale path
    of joins.broadcast_semi_filter when the key set is too large for an
    exact Arrow value_set. One-sided error: semi keeps all true members
    plus ~fpp false positives (feed a cheap exact verify downstream);
    anti (keep=False) may drop ~fpp true negatives — use only where that
    is acceptable and documented."""
    import pyarrow as pa

    import ray

    from gush_ray.stages.joins import _get_cached

    ref = ray.put(bloom)

    def f(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        blm = _get_cached(ref)
        mask = blm.contains(batch[col].to_numpy(zero_copy_only=False))
        if not keep:
            mask = ~mask
        return batch.filter(pa.array(mask))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------- approximate quantiles

def _compact(vals: np.ndarray, wts: np.ndarray, cap: int):
    """Weighted-sample compaction: keep ``cap`` evenly-weight-spaced
    order statistics, preserving total weight (GK-style summary)."""
    if len(vals) <= cap:
        return vals, wts
    order = np.argsort(vals, kind="mergesort")
    v, w = vals[order], wts[order]
    cw = np.cumsum(w)
    total = cw[-1]
    targets = (np.arange(cap, dtype=np.float64) + 0.5) * total / cap
    idx = np.minimum(np.searchsorted(cw, targets), len(v) - 1)
    return v[idx], np.full(cap, total / cap)


def approx_quantiles(ds, col: str, qs: list[float],
                     cap: int = 2048, fanin: int = 16) -> dict[float, float]:
    """Approximate quantiles with bounded memory at every level:
    per-batch weighted summaries of ``cap`` order statistics → a
    ``fanin``-way intermediate combine → one driver merge of ≤ fanin
    summaries. Rank error ≈ 1/cap per merge level (2 levels here);
    deterministic for a fixed block layout. The exact counterpart
    (full sort) is the oracle at test scale."""

    def sketch(b: pd.DataFrame) -> pd.DataFrame:
        x = b[col].dropna().to_numpy(dtype=np.float64)
        if not len(x):
            return pd.DataFrame({"part": pd.Series(dtype="int64"),
                                 "vals": pd.Series(dtype="object"),
                                 "wts": pd.Series(dtype="object")})
        x.sort(kind="mergesort")
        v, w = _compact(x, np.ones(len(x)), cap)
        part = int(pd.util.hash_array(v[:1], categorize=False)[0]
                   % fanin)
        return pd.DataFrame({"part": [part], "vals": [v.tobytes()],
                             "wts": [w.tobytes()]})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        v = np.concatenate([np.frombuffer(b, dtype=np.float64)
                            for b in df["vals"]])
        w = np.concatenate([np.frombuffer(b, dtype=np.float64)
                            for b in df["wts"]])
        v, w = _compact(v, w, cap)
        return pd.DataFrame({"part": [int(df["part"].iloc[0])],
                             "vals": [v.tobytes()], "wts": [w.tobytes()]})

    from gush_ray.stages.shuffle import partition_map

    partials = ds.map_batches(sketch, batch_format="pandas")
    reduced = partition_map(partials, "part", combine,
                            num_partitions=fanin).to_pandas()
    if not len(reduced):
        return {q: float("nan") for q in qs}
    v = np.concatenate([np.frombuffer(b, dtype=np.float64)
                        for b in reduced["vals"]])
    w = np.concatenate([np.frombuffer(b, dtype=np.float64)
                        for b in reduced["wts"]])
    order = np.argsort(v, kind="mergesort")
    v, w = v[order], w[order]
    cw = np.cumsum(w)
    total = cw[-1]
    out = {}
    for q in qs:
        i = int(np.searchsorted(cw, q * total))
        out[q] = float(v[min(i, len(v) - 1)])
    return out


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


def _in_range(x, lo, hi, hi_incl):
    m = (x >= lo) & (x < hi)
    if hi_incl:
        m |= x == hi
    return m


def quantile_disc_rank0(q: float, n: int) -> int:
    """0-based rank of DuckDB ``quantile_disc(col, q)`` over ``n``
    non-null values — the STRUCTURALLY IDENTICAL IEEE-double twin of
    DuckDB's Interpolator<true>::Index double path::

        floored = floor(n - n*q)        # both ops in double
        idx     = max(1, n - floored) - 1

    This is NOT plain ceil(q*n)-1: the subtraction's rounding makes
    hair-above-integer products (0.035*200 = 7.000000000000001) land on
    the integer for q < 0.5 and ceil for q > 0.5. Pinned against DuckDB
    on a 4389-case (q, n) grid incl. every boundary anomaly
    (test_sources_sketches.test_quantile_disc_rank_matches_duckdb_grid).
    Exact for any n < 2^53 — the old ceil(q*n - 1e-9) absolute guard
    diverged by one both on boundary products and at n ~1e10+ where
    ulp(q*n) > 1e-9 (round-4 ADVICE finding)."""
    import math

    n_d = float(n)
    floored = math.floor(n_d - n_d * q)
    return min(max(1, n - floored), n) - 1


def exact_quantiles_nosort(ds, col: str, qs: list[float],
                           n_buckets: int = 2048,
                           collect_cap: int = 500_000,
                           max_rounds: int = 40) -> dict[float, float]:
    """EXACT order statistics with NO global sort: DuckDB
    ``quantile_disc`` semantics — the value at 0-based rank
    :func:`quantile_disc_rank0` (≈ ceil(q*n)-1, but computed by
    DuckDB's exact double formula; q=0 → min, q=1 → max).

    The exact counterpart of :func:`approx_quantiles`, built for data
    that cannot be sorted globally: one stats pass (count/min/max), then
    histogram-refinement passes that narrow every requested rank into a
    fixed-width value range until each range's row count fits
    ``collect_cap``, then ONE collect pass that ships only those narrow
    ranges to the driver for the final selects. All quantiles share each
    pass (a round histograms every still-open range in the same scan),
    so p50+p90 together cost the same scans as one of them — typically
    3-4 column-pruned scans total. Each refinement round moves only
    per-batch nonzero (range, bucket, count) partials through the
    engine's standard combiner shuffle — never rows. Degenerate mass
    (every value identical) exits via the lo == hi fast path.

    Scale contract: the ONLY driver materialization is the final
    collect, whose volume is ≤ len(qs) × ``collect_cap`` rows BY
    CONSTRUCTION (rounds keep narrowing until every open range fits the
    cap or raise) — at 100 TB keep ``collect_cap`` sized to driver heap
    and let the rounds run one scan longer rather than raising the cap.
    Prefer this (or :func:`approx_quantiles` when a rank-error bound is
    acceptable) over any sort-the-column approach.
    """
    import math

    from gush_ray.stages.agg import partial_aggregate

    def stats(b: pd.DataFrame) -> pd.DataFrame:
        x = b[col].dropna().to_numpy(dtype=np.float64)
        if len(x) == 0:
            return pd.DataFrame({"cnt": pd.Series([0], dtype="int64"),
                                 "mn": [np.inf], "mx": [-np.inf]})
        return pd.DataFrame({"cnt": pd.Series([len(x)], dtype="int64"),
                             "mn": [x.min()], "mx": [x.max()]})

    st = ds.map_batches(stats, batch_format="pandas").to_pandas()
    # a fully-empty Dataset yields zero batches → a columnless frame
    n = int(st["cnt"].sum()) if "cnt" in st.columns else 0
    if n == 0:
        return {q: float("nan") for q in qs}
    glo, ghi = float(st["mn"].min()), float(st["mx"].max())

    # per-quantile search state: [k, below, lo, hi, hi_incl, value]
    # (rank via quantile_disc_rank0 — DuckDB's exact double formula)
    tasks = {}
    out = {}
    for q in qs:
        k = quantile_disc_rank0(q, n)
        tasks[q] = {"k": k, "below": 0, "lo": glo, "hi": ghi,
                    "hi_incl": True}

    for _ in range(max_rounds):
        for q in list(tasks):
            t = tasks[q]
            if t["hi"] <= t["lo"]:
                out[q] = t["lo"]
                del tasks[q]
        if not tasks:
            return out
        # ranges is small (≤ len(qs) rows) — ships with the closure
        ranges = [(ri, t["lo"], t["hi"], t["hi_incl"],
                   np.linspace(t["lo"], t["hi"], n_buckets + 1))
                  for ri, t in enumerate(tasks.values())]

        def hist(b: pd.DataFrame, ranges=ranges) -> pd.DataFrame:
            x = b[col].dropna().to_numpy(dtype=np.float64)
            rs, bks, cts = [], [], []
            for ri, lo, hi, hi_incl, edges in ranges:
                xr = x[_in_range(x, lo, hi, hi_incl)]
                if len(xr) == 0:
                    continue
                idx = np.clip(np.searchsorted(edges, xr, side="right") - 1,
                              0, n_buckets - 1)
                u, c = np.unique(idx, return_counts=True)
                rs.append(np.full(len(u), ri, dtype=np.int64))
                bks.append(u.astype(np.int64))
                cts.append(c.astype(np.int64))
            if not rs:
                return pd.DataFrame(
                    {"r": pd.Series([], dtype="int64"),
                     "bucket": pd.Series([], dtype="int64"),
                     "cnt": pd.Series([], dtype="int64")})
            return pd.DataFrame({"r": np.concatenate(rs),
                                 "bucket": np.concatenate(bks),
                                 "cnt": np.concatenate(cts)})

        agg = partial_aggregate(
            ds.map_batches(hist, batch_format="pandas"),
            ["r", "bucket"], {"total": ("cnt", "sum")},
        ).to_pandas()
        narrow_enough = True
        for ri, (q, t) in enumerate(tasks.items()):
            sub = agg[agg["r"] == ri]
            counts = np.zeros(n_buckets, dtype=np.int64)
            counts[sub["bucket"].to_numpy()] = sub["total"].to_numpy()
            cum = np.cumsum(counts)
            b = int(np.searchsorted(cum, t["k"] - t["below"], side="right"))
            edges = ranges[ri][4]
            t["below"] += int(cum[b] - counts[b])
            t["lo"], t["hi"] = float(edges[b]), float(edges[b + 1])
            t["hi_incl"] = t["hi_incl"] and b == n_buckets - 1
            if counts[b] > collect_cap:
                narrow_enough = False
        if narrow_enough:
            break
    else:
        open_ranges = {q: (t["lo"], t["hi"]) for q, t in tasks.items()}
        raise RuntimeError(
            f"exact_quantiles_nosort did not converge in {max_rounds} "
            f"rounds (open ranges {open_ranges}, {collect_cap=})"
        )

    # ranges that collapsed to a point in the final round resolve here —
    # an exclusive-hi point range would collect zero rows
    for q in list(tasks):
        if tasks[q]["hi"] <= tasks[q]["lo"]:
            out[q] = tasks[q]["lo"]
            del tasks[q]
    if not tasks:
        return out

    # one shared collect pass over every still-open narrow range
    franges = [(ri, t["lo"], t["hi"], t["hi_incl"])
               for ri, t in enumerate(tasks.values())]

    def collect(bb: pd.DataFrame, franges=franges) -> pd.DataFrame:
        x = bb[col].dropna().to_numpy(dtype=np.float64)
        rs, vs = [], []
        for ri, lo, hi, hi_incl in franges:
            xr = x[_in_range(x, lo, hi, hi_incl)]
            rs.append(np.full(len(xr), ri, dtype=np.int64))
            vs.append(xr)
        return pd.DataFrame({"r": np.concatenate(rs),
                             "v": np.concatenate(vs)})

    vals = ds.map_batches(collect, batch_format="pandas").to_pandas()
    for ri, (q, t) in enumerate(tasks.items()):
        xr = vals[vals["r"] == ri]["v"].to_numpy()
        r = t["k"] - t["below"]
        out[q] = float(np.partition(xr, r)[r])
    return out


def exact_quantile(ds, col: str, q: float = 0.5, n_buckets: int = 2048,
                   collect_cap: int = 500_000, max_rounds: int = 40) -> float:
    """Single-quantile convenience wrapper of
    :func:`exact_quantiles_nosort`."""
    return exact_quantiles_nosort(
        ds, col, [q], n_buckets=n_buckets, collect_cap=collect_cap,
        max_rounds=max_rounds,
    )[q]


def grouped_exact_quantiles(ds, key: str, col: str, qs: list[float],
                            n_buckets: int = 512,
                            collect_cap: int = 100_000,
                            max_rounds: int = 40) -> pd.DataFrame:
    """Per-GROUP exact quantiles with no sort: the
    :func:`exact_quantiles_nosort` refinement generalized to (group, q)
    tasks. One grouped stats pass, then shared rounds — every group's
    every quantile narrows in the SAME scan, each round shuffling only
    (group, q, bucket) count partials through the standard combiner —
    then one shared collect pass over the final narrow ranges.

    Driver state is O(groups × len(qs)) search intervals (the groups
    themselves never materialize beyond the G-row stats table — same
    contract as any grouped aggregate's result). Returns a long frame
    (key, q, value), one row per (group, quantile).
    """
    import math

    from gush_ray.stages.agg import partial_aggregate

    def stats(b: pd.DataFrame) -> pd.DataFrame:
        g = b.dropna(subset=[col]).groupby(key, dropna=False)[col]
        return g.agg(cnt="count", mn="min", mx="max").reset_index()

    st = partial_aggregate(
        ds.map_batches(stats, batch_format="pandas"), [key],
        {"cnt": ("cnt", "sum"), "mn": ("mn", "min"), "mx": ("mx", "max")},
    ).to_pandas()

    # (group, q) search tasks; rank convention as exact_quantiles_nosort
    tasks: dict[tuple, dict] = {}
    out_rows = []
    for _, row in st.iterrows():
        n = int(row["cnt"])
        for q in qs:
            k = quantile_disc_rank0(q, n)
            tasks[(row[key], q)] = {
                "k": k, "below": 0, "lo": float(row["mn"]),
                "hi": float(row["mx"]), "hi_incl": True,
            }

    def resolve_points():
        for gq in list(tasks):
            t = tasks[gq]
            if t["hi"] <= t["lo"]:
                out_rows.append((gq[0], gq[1], t["lo"]))
                del tasks[gq]

    for _ in range(max_rounds):
        resolve_points()
        if not tasks:
            break
        # group -> [(task_index, lo, hi, hi_incl)]; edges are recomputed
        # in the worker (np.linspace is deterministic, so worker and
        # driver see bit-identical bucket boundaries) — shipping them
        # would broadcast O(G × qs × n_buckets) floats per round
        per_group: dict = {}
        order = list(tasks.items())
        for ti, ((grp, _q), t) in enumerate(order):
            per_group.setdefault(grp, []).append(
                (ti, t["lo"], t["hi"], t["hi_incl"]))

        def hist(b: pd.DataFrame, per_group=per_group) -> pd.DataFrame:
            rs, bks, cts = [], [], []
            sub = b.dropna(subset=[col])
            for grp, g in sub.groupby(key, dropna=False):
                specs = per_group.get(grp)
                if not specs:
                    continue
                x = g[col].to_numpy(dtype=np.float64)
                for ti, lo, hi, hi_incl in specs:
                    xr = x[_in_range(x, lo, hi, hi_incl)]
                    if len(xr) == 0:
                        continue
                    edges = np.linspace(lo, hi, n_buckets + 1)
                    idx = np.clip(
                        np.searchsorted(edges, xr, side="right") - 1,
                        0, n_buckets - 1)
                    u, c = np.unique(idx, return_counts=True)
                    rs.append(np.full(len(u), ti, dtype=np.int64))
                    bks.append(u.astype(np.int64))
                    cts.append(c.astype(np.int64))
            if not rs:
                return pd.DataFrame(
                    {"t": pd.Series([], dtype="int64"),
                     "bucket": pd.Series([], dtype="int64"),
                     "cnt": pd.Series([], dtype="int64")})
            return pd.DataFrame({"t": np.concatenate(rs),
                                 "bucket": np.concatenate(bks),
                                 "cnt": np.concatenate(cts)})

        agg = partial_aggregate(
            ds.map_batches(hist, batch_format="pandas"),
            ["t", "bucket"], {"total": ("cnt", "sum")},
        ).to_pandas()
        narrow_enough = True
        for ti, (gq, t) in enumerate(order):
            if gq not in tasks:
                continue
            sub = agg[agg["t"] == ti]
            counts = np.zeros(n_buckets, dtype=np.int64)
            counts[sub["bucket"].to_numpy()] = sub["total"].to_numpy()
            cum = np.cumsum(counts)
            b = int(np.searchsorted(cum, t["k"] - t["below"], side="right"))
            edges = np.linspace(t["lo"], t["hi"], n_buckets + 1)
            t["below"] += int(cum[b] - counts[b])
            t["lo"], t["hi"] = float(edges[b]), float(edges[b + 1])
            t["hi_incl"] = t["hi_incl"] and b == n_buckets - 1
            if counts[b] > collect_cap:
                narrow_enough = False
        if narrow_enough:
            break
    else:
        raise RuntimeError(
            f"grouped_exact_quantiles did not converge in {max_rounds} "
            f"rounds ({len(tasks)} open tasks, {collect_cap=})")

    resolve_points()
    if tasks:
        forder = list(tasks.items())
        fper_group: dict = {}
        for ti, ((grp, _q), t) in enumerate(forder):
            fper_group.setdefault(grp, []).append(
                (ti, t["lo"], t["hi"], t["hi_incl"]))

        def collect(bb: pd.DataFrame, fper_group=fper_group) -> pd.DataFrame:
            rs, vs = [], []
            sub = bb.dropna(subset=[col])
            for grp, g in sub.groupby(key, dropna=False):
                specs = fper_group.get(grp)
                if not specs:
                    continue
                x = g[col].to_numpy(dtype=np.float64)
                for ti, lo, hi, hi_incl in specs:
                    xr = x[_in_range(x, lo, hi, hi_incl)]
                    rs.append(np.full(len(xr), ti, dtype=np.int64))
                    vs.append(xr)
            if not rs:
                return pd.DataFrame({"t": pd.Series([], dtype="int64"),
                                     "v": pd.Series([], dtype="float64")})
            return pd.DataFrame({"t": np.concatenate(rs),
                                 "v": np.concatenate(vs)})

        vals = ds.map_batches(collect, batch_format="pandas").to_pandas()
        for ti, ((grp, q), t) in enumerate(forder):
            xr = vals[vals["t"] == ti]["v"].to_numpy()
            r = t["k"] - t["below"]
            out_rows.append((grp, q, float(np.partition(xr, r)[r])))

    out = pd.DataFrame(out_rows, columns=[key, "q", "value"])
    return out.sort_values([key, "q"]).reset_index(drop=True)
