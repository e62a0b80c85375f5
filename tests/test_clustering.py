"""Distributed k-means: recovers planted clusters, deterministic fits,
streaming partials only."""

import numpy as np
import pandas as pd

import ray.data as rd

from gush_ray.stages.clustering import (
    _max_prev_sim,
    kmeans_assign,
    kmeans_fit,
    semdedup,
)


def planted(n_per=300, k=6, d=16, seed=11):
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, d) * 8
    rows = []
    for i in range(k * n_per):
        c = i % k
        rows.append({
            "truth": c,
            "embedding": (centers[c] + rng.randn(d) * 0.4)
            .astype(np.float32).tolist(),
        })
    return pd.DataFrame(rows)


def test_kmeans_recovers_planted_clusters(ray_session):
    df = planted()
    ds = rd.from_pandas(df).repartition(6)
    fit = kmeans_fit(ds, k=6, n_iters=15, sample_size=500, seed=3)
    assert fit["centroids"].shape == (6, 16)
    out = kmeans_assign(ds, fit["centroids"]).to_pandas()
    # purity: every planted cluster maps to ONE centroid, near-perfectly
    conf = out.groupby(["truth", "cluster"]).size().reset_index(name="n")
    top = conf.sort_values("n").groupby("truth").tail(1)
    assert len(set(top["cluster"])) == 6, "two truths share a centroid"
    purity = top["n"].sum() / len(df)
    assert purity > 0.98, purity


def test_kmeans_deterministic_and_converging(ray_session):
    df = planted(n_per=150, k=4, seed=5)
    ds = rd.from_pandas(df).repartition(4)
    a = kmeans_fit(ds, k=4, n_iters=12, sample_size=300, seed=9)
    b = kmeans_fit(ds, k=4, n_iters=12, sample_size=300, seed=9)
    assert np.array_equal(a["centroids"], b["centroids"])
    assert a["inertia"] == b["inertia"]
    # one-iteration fit has (weakly) worse inertia than the converged one
    one = kmeans_fit(ds, k=4, n_iters=1, sample_size=300, seed=9)
    assert a["inertia"] <= one["inertia"] + 1e-9


def planted_dups(k=4, d=16, groups_per=20, seed=3):
    """k well-separated clusters; every 4th item carries two near-copies
    (1e-4 noise), the rest are far apart within the cluster."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, d) * 8
    rows, truth_groups, vid = [], [], 0
    for c in range(k):
        for g in range(groups_per):
            base = centers[c] + rng.randn(d) * 3.0
            n_dup = 3 if g % 4 == 0 else 1
            ids = []
            for _ in range(n_dup):
                v = base + rng.randn(d) * 1e-4
                rows.append({"vec_id": vid,
                             "embedding": v.astype(np.float32).tolist()})
                ids.append(vid)
                vid += 1
            if n_dup > 1:
                truth_groups.append(ids)
    return pd.DataFrame(rows), truth_groups


def _brute_semdedup(df, centroids, eps):
    """Single-process reference of the SemDeDup rule."""
    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    mat = np.stack([np.asarray(v, float) for v in df["embedding"]])
    matn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    assign = np.argmin((-2 * (mat @ C.T)) + (C * C).sum(axis=1), axis=1)
    keep = {}
    for c in range(len(C)):
        sel = np.where(assign == c)[0]
        sub, ids = matn[sel], df["vec_id"].to_numpy()[sel]
        csim = sub @ Cn[c]
        order = np.lexsort((ids, csim))
        sub, ids = sub[order], ids[order]
        for i in range(len(sub)):
            mp = max((float(sub[i] @ sub[j]) for j in range(i)),
                     default=-1.0)
            keep[int(ids[i])] = mp <= eps
    return keep


def test_semdedup_matches_brute_force_and_kills_planted_dups(ray_session):
    df, groups = planted_dups()
    ds = rd.from_pandas(df).repartition(4)
    out = semdedup(ds, k=4, eps=0.9999, seed=9, sample_size=500,
                   num_partitions=4).to_pandas()
    assert len(out) == len(df)
    # exact parity with the single-process reference rule
    fit = kmeans_fit(ds, k=4, n_iters=10, seed=9, sample_size=500)
    ref = _brute_semdedup(df, fit["centroids"], 0.9999)
    got = dict(zip(out["vec_id"].astype(int), out["keep"]))
    assert got == ref
    # each planted near-copy group keeps exactly one member, and the
    # survivor is the group's lowest-centroid-similarity item
    by_id = out.set_index("vec_id")
    for ids in groups:
        kept = [i for i in ids if bool(by_id.loc[i, "keep"])]
        assert len(kept) == 1, (ids, kept)
        sims = {i: float(by_id.loc[i, "centroid_sim"]) for i in ids}
        assert kept[0] == min(sims, key=lambda i: (sims[i], i))


def test_semdedup_eps_extremes_and_determinism(ray_session):
    df, _ = planted_dups(k=3, groups_per=10, seed=8)
    ds = rd.from_pandas(df).repartition(3)
    hi = semdedup(ds, k=3, eps=1.01, seed=5, sample_size=300).to_pandas()
    assert hi["keep"].all()  # eps above max cosine keeps everything
    lo = semdedup(ds, k=3, eps=-1.0, seed=5, sample_size=300).to_pandas()
    # eps below min cosine keeps exactly one survivor per cluster
    kept = lo[lo["keep"]].groupby("cluster").size()
    assert (kept == 1).all() and len(kept) == lo["cluster"].nunique()
    a = semdedup(ds, k=3, eps=0.999, seed=5, sample_size=300).to_pandas()
    b = semdedup(ds, k=3, eps=0.999, seed=5, sample_size=300).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("vec_id").reset_index(drop=True),
        b.sort_values("vec_id").reset_index(drop=True))


def test_max_prev_sim_chunking_parity():
    rng = np.random.RandomState(2)
    mat = rng.randn(700, 8)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    small = _max_prev_sim(mat, chunk=64)
    big = _max_prev_sim(mat, chunk=4096)
    assert np.allclose(small, big)
    ref = np.full(len(mat), -1.0)
    for i in range(1, len(mat)):
        ref[i] = (mat[i] @ mat[:i].T).max()
    assert np.allclose(small, ref)


def test_kmeans_exact_block_layout_invariant(ray_session):
    """The integer fit must be a pure function of the row SET: integer
    partial folds commute exactly, so different block layouts (and
    therefore different partial groupings and arrival orders) yield
    IDENTICAL centroids — the property that makes the SQL oracle
    possible."""
    from gush_ray.stages.clustering import kmeans_exact_summary, kmeans_fit_exact

    df = planted(n_per=100, k=4, seed=13)
    a = kmeans_fit_exact(rd.from_pandas(df).repartition(1), k=4, n_iters=4)
    b = kmeans_fit_exact(rd.from_pandas(df).repartition(7), k=4, n_iters=4)
    c = kmeans_fit_exact(
        rd.from_pandas(df.sample(frac=1.0, random_state=3)).repartition(3),
        k=4, n_iters=4)
    assert np.array_equal(a["centroids"], b["centroids"])
    assert np.array_equal(a["centroids"], c["centroids"])
    s1 = kmeans_exact_summary(rd.from_pandas(df).repartition(5),
                              a["centroids"])
    assert int(s1["n"].sum()) == len(df)
    assert s1["cluster"].is_unique


def test_kmeans_exact_matches_sequential_reference(ray_session):
    """Distributed passes == a sequential numpy replay of the same
    integer semantics (seeding, argmin ties, floor-divided means)."""
    from gush_ray.stages.clustering import kmeans_fit_exact

    df = planted(n_per=60, k=3, seed=21)
    K, T, SCALE = 3, 4, 1 << 20
    got = kmeans_fit_exact(rd.from_pandas(df).repartition(4),
                           k=K, n_iters=T, scale=SCALE)["centroids"]

    mq = np.rint(np.stack([np.asarray(v, dtype=np.float64)
                           for v in df["embedding"]]) * float(SCALE)
                 ).astype(np.int64)
    seeds = [mq[np.lexsort(mq.T[::-1])[0]]]
    for _ in range(K - 1):
        d2 = np.min(np.stack([((mq - s) ** 2).sum(1) for s in seeds],
                             axis=1), axis=1)
        cand = mq[d2 == d2.max()]
        seeds.append(cand[np.lexsort(cand.T[::-1])[0]])
    C = np.stack(seeds)
    for _ in range(T):
        d2 = np.stack([((mq - c) ** 2).sum(1) for c in C], axis=1)
        a = np.argmin(d2, axis=1)
        newC = C.copy()
        for c in range(K):
            sel = a == c
            if sel.sum():
                newC[c] = np.floor_divide(mq[sel].sum(0), int(sel.sum()))
        C = newC
    assert np.array_equal(got, C)


def test_sql_floor_div_formula_matches_numpy():
    """The oracle's (s - ((s % n) + n) % n) // n must equal numpy
    floor_divide for NEGATIVE sums too (DuckDB % follows the dividend's
    sign and // truncates; the mod adjustment makes the numerator an
    exact multiple, so truncation == floor)."""
    import duckdb

    vals = [(-7, 3), (7, 3), (-6, 3), (-1, 5), (1, 5), (0, 3),
            (-(1 << 40) - 1, 977)]
    rows = ", ".join(f"({a}, {n})" for a, n in vals)
    got = [r[0] for r in duckdb.sql(
        f"SELECT (a - ((a % n) + n) % n) // n FROM (VALUES {rows}) t(a, n)"
    ).fetchall()]
    assert got == [int(np.floor_divide(a, n)) for a, n in vals]


def test_semdedup_exact_planted_dups_and_sql_parity(ray_session):
    """semdedup_exact kills planted near-copies (one survivor per dup
    group) AND the distributed result equals the generated SQL oracle
    replayed over the same rows in DuckDB — the parity that lets the
    driver verify the whole pipeline (values ~25 keep |v|·2^14 < 2^25,
    inside the integer-dot contract). eps 9999/10000 sits between the
    planted-copy cosine (~1-1e-9) and the within-cluster cross-base
    cosines, like the float test's 0.9999."""
    import duckdb

    from gush_ray.pipelines.queries_extra import _gen_sql_semdedup_exact
    from gush_ray.stages.clustering import semdedup_exact

    df, truth = planted_dups(k=3, groups_per=12, seed=6)
    got = semdedup_exact(
        rd.from_pandas(df).repartition(5), k=3, eps=(9999, 10000), n_iters=4,
    ).to_pandas().sort_values("vec_id").reset_index(drop=True)

    # every planted dup group loses all but exactly one member
    keep_of = dict(zip(got["vec_id"], got["keep"]))
    for ids in truth:
        assert sum(keep_of[i] for i in ids) == 1, ids
    assert (~got["keep"]).sum() == sum(len(g) - 1 for g in truth)

    con = duckdb.connect()
    con.register("embeddings", df)
    want = con.sql(
        _gen_sql_semdedup_exact(k=3, n_iters=4, eps=(9999, 10000))
    ).df().sort_values("vec_id").reset_index(drop=True)
    assert got["keep"].tolist() == want["keep"].tolist()
    assert got["cluster"].tolist() == want["cluster"].tolist()
