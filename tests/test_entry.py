"""Driver-contract smoke tests."""

import pandas as pd

import __ray_entry__ as entrymod


def test_entry_runs():
    res = entrymod.entry()
    df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    assert len(df) > 0
    assert set(["lang", "change_kind", "window_id", "n"]) <= set(df.columns)
    assert set(df["change_kind"].unique()) <= {"insert", "update"}


def test_queries_oracle_keys_align():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 18


def test_batch_flagship_pipeline():
    """The batch-composed flagship (run_flagship) also works end-to-end."""
    from gush_ray.datagen import ensure_pages
    from gush_ray.pipelines.flagship import run_flagship

    pages_dir = ensure_pages("/tmp/gush_ray_pages", n_urls=2_000, seed=7)
    agg = run_flagship(pages_dir)
    df = agg.to_pandas()
    assert len(df) > 0
    assert {"category", "change_kind", "window_id", "n"} <= set(df.columns)
