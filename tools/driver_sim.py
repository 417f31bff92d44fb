"""Simulate the driver: entry() smoke + queries vs oracle_sql via DuckDB."""
import sys, time
sys.path.insert(0, "/root/repo")
import ray

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

import duckdb
import pandas as pd
import importlib
entry_mod = importlib.import_module("__ray_entry__")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
only = sys.argv[2:] if len(sys.argv) > 2 else None

t0 = time.time()
res = entry_mod.entry()
n = res.count() if hasattr(res, "count") and not isinstance(res, pd.DataFrame) else len(res)
print(f"entry(): {n} rows in {time.time()-t0:.1f}s")

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs = entry_mod.queries()
sqls = entry_mod.oracle_sql()
ok = mismatch = err = noracle = 0
for name, fn in qs.items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        out = fn(SF)
        if hasattr(out, "to_pandas") and not isinstance(out, (pd.DataFrame,)):
            df = out.to_pandas()
        elif hasattr(out, "to_pandas"):
            df = out.to_pandas()
        else:
            df = out
        if not isinstance(df, pd.DataFrame):
            df = df.to_pandas()
        if name not in sqls:
            noracle += 1
            print(f"--  {name}: {len(df)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        odf = con.execute(sqls[name]).df()
        # driver-style compare: sort columns by name, sort rows, compare values
        a = df[sorted(df.columns)].sort_values(sorted(df.columns)).reset_index(drop=True)
        b = odf[sorted(odf.columns)].sort_values(sorted(odf.columns)).reset_index(drop=True)
        if list(a.columns) != list(b.columns):
            mismatch += 1
            print(f"XX  {name}: schema {list(a.columns)} vs {list(b.columns)}")
        elif len(a) != len(b):
            mismatch += 1
            print(f"XX  {name}: rows {len(a)} vs {len(b)}")
        elif not a.equals(b):
            # tolerate dtype diffs; compare as strings
            if a.astype(str).equals(b.astype(str)):
                ok += 1
                print(f"ok~ {name} (dtype diff only) [{time.time()-t0:.1f}s]")
            else:
                mismatch += 1
                neq_cols = [c for c in a.columns if not a[c].astype(str).equals(b[c].astype(str))]
                print(f"XX  {name}: value diff in {neq_cols}")
        else:
            ok += 1
            print(f"ok  {name} [{time.time()-t0:.1f}s]")
    except Exception as e:
        err += 1
        print(f"ERR {name}: {type(e).__name__}: {str(e)[:200]}")
print(f"\nok={ok} mismatch={mismatch} err={err} no_oracle={noracle}")
ray.shutdown()
