#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the
matching SQL from oracle_sql.json in DuckDB over the sfDir tables,
sorts columns by name and rows by all columns, and compares values.
Exit 0 iff all queries match.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            failures += 1
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf())
            exp = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            failures += 1
            continue
        bad = []
        gv, ev = got.values.tolist(), exp.values.tolist()
        for i in range(len(gv)):
            for j in range(len(gv[i])):
                if not cell_eq(gv[i][j], ev[i][j]):
                    bad.append((i, got.columns[j], gv[i][j], ev[i][j]))
        if bad:
            print(f"FAIL {name}: {len(bad)} cell diffs; first: row={bad[0][0]} "
                  f"col={bad[0][1]} spark={bad[0][2]!r} duckdb={bad[0][3]!r}")
            dtypes = list(zip(got.dtypes, exp.dtypes))
            print(f"     dtypes spark vs duckdb: {dtypes}")
            failures += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
