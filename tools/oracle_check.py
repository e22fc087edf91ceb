#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle comparison.

Usage: oracle_check.py <sfDir> <verifyOutDir> [comma-separated name filter]

Registers the testdata parquet as views, runs each oracle SQL from
oracle_sql.json, loads the corresponding Spark result parquet, sorts
columns by name and rows by all columns, and compares values exactly.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cmp_frames(a: pd.DataFrame, b: pd.DataFrame):
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    return f"VALUE col={c} row={i}: {x!r} != {y!r} (diff {abs(x-y)})"
            elif x != y:
                return f"VALUE col={c} row={i}: {x!r} != {y!r}"
    return None

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            ours = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            theirs = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        err = cmp_frames(canon(ours), canon(theirs))
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            a, b = canon(ours), canon(theirs)
            dt = [f"{c}:{a[c].dtype}/{b[c].dtype}" for c in a.columns
                  if str(a[c].dtype) != str(b[c].dtype)]
            note = f"  [dtype diff: {', '.join(dt)}]" if dt else ""
            print(f"PASS {name} ({len(ours)} rows){note}")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail; rows-only (no oracle): "
          f"{sorted(set(d.split('/')[-1] for d in glob.glob(out_dir + '/q*')) - set(oracle))}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
