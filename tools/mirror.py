"""Full driver-mirror: run every oracle-paired registry query against its
DuckDB oracle at a given scale factor (the same rows+schema+values
comparison CORRECTNESS_r{N}.json records).

Usage: python tools/mirror.py [/root/testdata/sf0.01]
"""
import sys, time, logging
import ray
ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level=logging.ERROR)
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
import duckdb, pandas as pd, numpy as np
import __ray_entry__ as e
q = e.queries(); o = e.oracle_sql()
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
def run_oracle(sql):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.execute(sql).fetchdf()
def norm(df):
    if hasattr(df, "to_pandas"): df = df.to_pandas()
    if not isinstance(df, pd.DataFrame): df = pd.DataFrame(df)
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]): df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]): df[c] = df[c].astype("float64")
    return df
bad = []
t0 = time.time()
for i, name in enumerate(o):
    try:
        got = norm(q[name](SF)); want = norm(run_oracle(o[name]))
        ok = len(got) == len(want) and list(got.columns) == list(want.columns)
        if ok:
            for c in got.columns:
                if got[c].dtype.kind != want[c].dtype.kind: ok = False; break
                if want[c].dtype.kind == 'f':
                    if not np.allclose(got[c], want[c], rtol=0, atol=1e-9, equal_nan=True): ok = False; break
                elif not (got[c].to_numpy() == want[c].to_numpy()).all(): ok = False; break
        if not ok:
            bad.append(name); print("FAIL", name, len(got), len(want), flush=True)
    except Exception as ex:
        bad.append(name); print("ERR", name, type(ex).__name__, str(ex)[:150], flush=True)
print(f"done: {len(o)-len(bad)}/{len(o)} green in {time.time()-t0:.0f}s; bad={bad}")
ray.shutdown()
