"""Driver-mirror correctness gate: every SQL-paired query must match its
DuckDB oracle on the same parquet tables (row count + schema + values,
order-insensitive) — the same comparison CORRECTNESS_r{N}.json records.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from gush_ray.pipelines.queries import CORE_QUERIES
from gush_ray.pipelines.queries_analytic import ANALYTIC_QUERIES
from gush_ray.pipelines.queries_extra import (
    EXTRA_QUERIES,
    ensure_oracle_fixtures,
)
from gush_ray.pipelines.queries_web import WEB_QUERIES

PAIRED_QUERIES = {
    name: (fn, sql)
    for name, (fn, sql) in {**CORE_QUERIES, **ANALYTIC_QUERIES,
                            **EXTRA_QUERIES, **WEB_QUERIES}.items()
    if sql
}
# several extra-query oracles read fixed-path fixture parquet
ensure_oracle_fixtures()

SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def run_oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con.execute(sql).fetchdf()


def normalize(df) -> pd.DataFrame:
    if not isinstance(df, pd.DataFrame):
        if hasattr(df, "to_pandas"):
            df = df.to_pandas()
        else:
            df = pd.DataFrame(df)
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df


@pytest.mark.parametrize("name", list(PAIRED_QUERIES))
def test_query_matches_oracle(name):
    fn, sql = PAIRED_QUERIES[name]
    got = normalize(fn(SF_DIR))
    want = normalize(run_oracle(sql))
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    for c in got.columns:
        # the driver's value-hash is dtype-sensitive: int64 41 and
        # float64 41.0 hash differently even though == says equal
        assert got[c].dtype.kind == want[c].dtype.kind, (
            f"{name}: column {c} dtype {got[c].dtype} != {want[c].dtype}"
        )
    for c in got.columns:
        if pd.api.types.is_float_dtype(want[c]):
            assert np.allclose(
                got[c].to_numpy(), want[c].to_numpy(), rtol=0, atol=1e-9,
                equal_nan=True,
            ), f"{name}: float column {c} differs"
        else:
            mism = (got[c].to_numpy() != want[c].to_numpy())
            assert not mism.any(), (
                f"{name}: column {c} differs at {mism.sum()} rows; "
                f"e.g. {got[c][mism][:3].tolist()} vs {want[c][mism][:3].tolist()}"
            )
