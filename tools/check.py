#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: runs each oracle SQL in
DuckDB over the same parquet tables and compares with the Verify parquet
dumps (sort columns by name, sort rows, compare values)."""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize: lists -> tuples for sorting; floats rounded to 9 sig places
    def norm(v):
        if isinstance(v, (list, tuple)) or type(v).__name__ == 'ndarray':
            return tuple(norm(x) for x in v)
        if isinstance(v, float):
            if math.isnan(v): return 'NaN'
            return round(v, 9)
        return v
    for c in df.columns:
        df[c] = df[c].map(norm)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    only = sys.argv[3:] or None
    for name, sql in sorted(oracle.items()):
        if only and name not in only: continue
        pdir = f"{out_dir}/{name}"
        if not os.path.isdir(pdir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = canon(pq.read_table(pdir).to_pandas())
            exp = canon(con.execute(sql).fetch_df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        if not got.equals(exp):
            diff = (got != exp)
            cells = diff.to_numpy().sum()
            print(f"FAIL {name}: {cells} differing cells")
            mask = diff.any(axis=1)
            print("  spark:", got[mask].head(3).to_dict('records'))
            print("  duck :", exp[mask].head(3).to_dict('records'))
            n_fail += 1; continue
        print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
