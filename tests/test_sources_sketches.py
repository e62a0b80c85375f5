"""Tests for source-format roundtrips (JSONL/CSV) and the Bloom /
approximate-quantile sketches."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from gush_ray.sources.formats import (
    read_csv,
    read_jsonl,
    roundtrip_table_csv,
    roundtrip_table_jsonl,
)
from gush_ray.stages.sketches import (
    BloomFilter,
    approx_quantiles,
    bloom_semi_filter,
    build_bloom,
)


def _table(n=200, seed=3):
    rng = np.random.RandomState(seed)
    return pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "grp": pa.array([f"g{int(i)}" for i in rng.randint(0, 5, n)]),
        "val": pa.array(rng.uniform(0, 100, n)),
    })


def test_jsonl_roundtrip_value_exact(ray_session, tmp_path):
    tab = _table()
    path = roundtrip_table_jsonl(tab, str(tmp_path / "t" / "x.jsonl"))
    back = read_jsonl(path).to_pandas().sort_values("id").reset_index(
        drop=True)
    ref = tab.to_pandas()
    assert (back["id"].to_numpy() == ref["id"].to_numpy()).all()
    assert (back["grp"].to_numpy() == ref["grp"].to_numpy()).all()
    # IEEE doubles must roundtrip BIT-exact through json repr
    assert (back["val"].to_numpy() == ref["val"].to_numpy()).all()


def test_csv_roundtrip_and_projection(ray_session, tmp_path):
    tab = _table()
    path = roundtrip_table_csv(tab, str(tmp_path / "t" / "x.csv"))
    back = read_csv(path, columns=["id", "grp"]).to_pandas()
    assert sorted(back.columns) == ["grp", "id"]
    back = back.sort_values("id").reset_index(drop=True)
    assert (back["grp"].to_numpy() == tab["grp"].to_numpy(
        zero_copy_only=False)).all()


def test_bloom_no_false_negatives_and_bounded_fp():
    rng = np.random.RandomState(7)
    # choice(1e9, replace=False) would materialize a 1e9 permutation —
    # distinct draws via unique randint instead
    members = np.unique(rng.randint(0, 10**9, 6000).astype(np.int64))[:5000]
    f = BloomFilter(m_bits=1 << 16, k=5)  # ~13 bits/key -> fpp well <1%
    f.add(members)
    assert f.contains(members).all()  # Bloom guarantee: no false negatives
    non = np.unique(
        rng.randint(0, 10**9, 21000).astype(np.int64)
    )[:20000] + 10**10
    fpp = f.contains(non).mean()
    assert fpp < 0.02, fpp


def test_bloom_merge_equals_single_build():
    a, b = BloomFilter(1 << 12, 3), BloomFilter(1 << 12, 3)
    one = BloomFilter(1 << 12, 3)
    x = np.arange(100, dtype=np.int64)
    y = np.arange(100, 200, dtype=np.int64)
    a.add(x)
    b.add(y)
    one.add(np.concatenate([x, y]))
    assert (a.merge(b).bits == one.bits).all()


def test_bloom_semi_filter_superset_of_exact(ray_session):
    df = pd.DataFrame({"k": np.arange(1000, dtype=np.int64)})
    keys = df["k"][df["k"] % 7 == 0].to_numpy()
    bloom = BloomFilter(1 << 16, 5)
    bloom.add(keys)
    kept = bloom_semi_filter(rd.from_pandas(df), bloom, "k").to_pandas()
    assert set(keys).issubset(set(kept["k"]))  # one-sided error only


def test_build_bloom_distributed_matches_local(ray_session):
    df = pd.DataFrame({"k": np.arange(3000, dtype=np.int64)})
    dist = build_bloom(rd.from_pandas(df).repartition(6), "k",
                       m_bits=1 << 14, k=4)
    local = BloomFilter(1 << 14, 4)
    local.add(df["k"].to_numpy())
    assert (dist.bits == local.bits).all()


def test_approx_quantiles_rank_error(ray_session):
    rng = np.random.RandomState(11)
    x = rng.lognormal(0, 1, 50_000)
    ds = rd.from_pandas(pd.DataFrame({"v": x})).repartition(8)
    qs = [0.1, 0.5, 0.9, 0.99]
    est = approx_quantiles(ds, "v", qs, cap=2048)
    xs = np.sort(x)
    for q in qs:
        # rank of the estimate must be within 1% of the target rank
        rank = np.searchsorted(xs, est[q]) / len(xs)
        assert abs(rank - q) < 0.01, (q, rank, est[q])


def test_approx_quantiles_empty(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"v": pd.Series(dtype="float64")}))
    est = approx_quantiles(ds, "v", [0.5])
    assert np.isnan(est[0.5])


def _disc_rank(n: int, q: float) -> int:
    """DuckDB quantile_disc rank convention (probed: ceil(q*n) - 1)."""
    import math

    return min(max(0, math.ceil(q * n - 1e-9) - 1), n - 1)


def test_exact_quantile_matches_sorted_reference(ray_session):
    from gush_ray.stages.sketches import exact_quantile

    rng = np.random.RandomState(23)
    x = np.concatenate([
        rng.lognormal(0, 2, 20_000),           # heavy tail
        np.full(5_000, 7.5),                   # a huge tie block
        rng.randint(0, 50, 5_000).astype(float),
    ])
    ds = rd.from_pandas(pd.DataFrame({"v": x})).repartition(8)
    xs = np.sort(x)
    for q in (0.0, 0.1, 0.5, 0.9, 0.99, 1.0):
        got = exact_quantile(ds, "v", q, n_buckets=64, collect_cap=500)
        assert got == xs[_disc_rank(len(x), q)], (q, got)


def test_exact_quantiles_share_passes_multi_q(ray_session):
    """Multi-quantile call: every q exact, including both extremes and a
    pair whose refinement ranges diverge after round 1."""
    from gush_ray.stages.sketches import exact_quantiles_nosort

    rng = np.random.RandomState(7)
    x = rng.gamma(2.0, 3.0, 30_000)
    ds = rd.from_pandas(pd.DataFrame({"v": x})).repartition(4)
    qs = [0.0, 0.25, 0.5, 0.75, 0.99, 1.0]
    got = exact_quantiles_nosort(ds, "v", qs, n_buckets=32,
                                 collect_cap=400)
    xs = np.sort(x)
    for q in qs:
        assert got[q] == xs[_disc_rank(len(x), q)], (q, got[q])


def test_exact_quantile_degenerate_and_nulls(ray_session):
    from gush_ray.stages.sketches import exact_quantile

    # all-identical mass exits via the lo == hi fast path
    ds = rd.from_pandas(pd.DataFrame({"v": np.full(10_000, 3.25)}))
    assert exact_quantile(ds, "v", 0.5, collect_cap=10) == 3.25
    # nulls ignored (SQL aggregate semantics); tiny n
    ds2 = rd.from_pandas(pd.DataFrame({"v": [None, 4.0, None, 1.0, 2.0]}))
    assert exact_quantile(ds2, "v", 0.5) == 2.0
    # empty input -> NaN
    ds3 = rd.from_pandas(pd.DataFrame({"v": pd.Series(dtype="float64")}))
    assert np.isnan(exact_quantile(ds3, "v", 0.5))


def test_grouped_exact_quantiles_match_reference(ray_session):
    from gush_ray.stages.sketches import grouped_exact_quantiles

    rng = np.random.RandomState(31)
    frames = []
    for g, (n, scale) in enumerate([(8_000, 1.0), (500, 40.0), (3, 1.0),
                                    (2_000, 0.0)]):  # incl. all-ties group
        frames.append(pd.DataFrame({
            "g": f"grp{g}",
            "v": (rng.lognormal(0, 1, n) * scale if scale else
                  np.full(n, 42.0)),
        }))
    df = pd.concat(frames, ignore_index=True)
    ds = rd.from_pandas(df).repartition(8)
    qs = [0.1, 0.5, 0.9, 1.0]
    got = grouped_exact_quantiles(ds, "g", "v", qs, n_buckets=32,
                                  collect_cap=300)
    assert len(got) == 4 * len(qs)
    for g, sub in df.groupby("g"):
        xs = np.sort(sub["v"].to_numpy())
        for q in qs:
            want = xs[_disc_rank(len(xs), q)]
            have = got[(got["g"] == g) & (got["q"] == q)]["value"].iloc[0]
            assert have == want, (g, q, have, want)


def test_jsonl_compressed_roundtrips(tmp_path, ray_session):
    """gzip AND zstd JSONL round-trip value-exact through the arrow
    stream codecs; the plain reader stays byte-compatible."""
    import pyarrow as pa

    from gush_ray.sources.formats import read_jsonl, roundtrip_table_jsonl

    tab = pa.table({
        "k": ["a", "b", "a", "c"],
        "v": [1.5, -2.25, 3.0, 0.125],
        "n": pa.array([1, 2, 3, 4], type=pa.int64()),
    })
    frames = {}
    for name in ("t.jsonl", "t.jsonl.gz", "t.jsonl.zst"):
        p = str(tmp_path / name)
        roundtrip_table_jsonl(tab, p)
        df = read_jsonl(p).to_pandas().sort_values("n").reset_index(
            drop=True)
        frames[name] = df[["k", "v", "n"]]
    pd.testing.assert_frame_equal(frames["t.jsonl"], frames["t.jsonl.gz"])
    pd.testing.assert_frame_equal(frames["t.jsonl"], frames["t.jsonl.zst"])
    assert frames["t.jsonl"]["v"].tolist() == [1.5, -2.25, 3.0, 0.125]
    # the .gz file really is gzip bytes, not a misnamed plain file
    assert open(str(tmp_path / "t.jsonl.gz"), "rb").read(2) == b"\x1f\x8b"


def test_quantile_disc_rank_matches_duckdb_grid():
    """quantile_disc_rank0 == DuckDB's discrete-quantile rank on a
    (q, n) grid that includes every known boundary anomaly: products
    landing a hair above an integer (0.035*200 = 7.000000000000001 →
    DuckDB picks 7, NOT ceil's 8; 0.55*200 = 110.00000000000001 →
    DuckDB picks 111), exact-integer products, q→0/1 extremes. The
    old ceil(q*n - 1e-9) guard diverged on these AND at n ~1e10+
    (round-4 ADVICE finding); the shipped formula
    max(1, n - floor(n - q*n)) is DuckDB's own double path, exact for
    any n < 2^53."""
    import duckdb
    import numpy as np

    from gush_ray.stages.sketches import quantile_disc_rank0

    con = duckdb.connect()
    rng = np.random.RandomState(3)
    qs = ([qi / 200.0 for qi in range(1, 200, 3)]
          + [0.035, 0.55, 0.545, 0.0175, 0.07, 0.14, 0.28, 0.275,
             1 / 3, 2 / 3, 0.123456789, 0.9999999, 1e-10]
          + list(rng.uniform(0, 1, 25)))
    ns = (1, 2, 3, 7, 10, 50, 100, 200, 400, 999)
    # values are 1..n, so DuckDB's returned VALUE == its 1-based rank
    for n in ns:
        ranks = con.execute(
            "SELECT " + ", ".join(
                f"quantile_disc(v, CAST({q!r} AS DOUBLE))" for q in qs)
            + f" FROM (SELECT unnest(range(1, {n + 1})) v)"
        ).fetchone()
        for q, d in zip(qs, ranks):
            assert quantile_disc_rank0(q, n) == int(d) - 1, (q, n, d)
    # large-n sanity: the formula never exceeds bounds and is monotone
    for n in (10 ** 10, 2 ** 52):
        r = [quantile_disc_rank0(q, n) for q in (0.0, 1e-15, 0.5, 1.0)]
        assert r[0] == 0 and r[-1] == n - 1
        assert all(a <= b for a, b in zip(r, r[1:]))
