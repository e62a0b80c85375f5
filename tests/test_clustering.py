"""Distributed k-means: recovers planted clusters, deterministic fits,
streaming partials only."""

import numpy as np
import pandas as pd

import ray.data as rd

from gush_ray.stages.clustering import kmeans_assign, kmeans_fit


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
