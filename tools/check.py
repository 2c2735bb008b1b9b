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
    import datetime
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    # date vs timestamp-at-midnight: the driver hashes these equal
    # (r03 q92) — the arrow path keeps date32 as datetime.date while
    # Spark writes timestamp; normalize before comparing.
    for x, y in ((a, b), (b, a)):
        if isinstance(x, datetime.date) and not isinstance(x, datetime.datetime) \
                and hasattr(y, "to_pydatetime"):
            return y.to_pydatetime() == datetime.datetime(x.year, x.month, x.day)
        if isinstance(x, datetime.date) and not isinstance(x, datetime.datetime) \
                and isinstance(y, datetime.datetime):
            return y == datetime.datetime(x.year, x.month, x.day)
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
            got_rel = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            got_arrow = got_rel.arrow()
            exp_arrow = con.execute(sql).arrow()
            got = canon(got_arrow.to_pandas())
            exp = canon(exp_arrow.to_pandas())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        # The driver's hash is TYPE-sensitive at the KIND level: a
        # HUGEINT/decimal sum vs a BIGINT renders differently even when
        # values agree (round-3 q82/q89), while int32-vs-int64 and
        # date-vs-timestamp passed the driver (r03 q23/q24/q92).
        # Compare raw arrow type kinds, and flag huge decimals whose
        # pandas conversion is lossy/unstable.
        def kind(t):
            t = str(t)
            if t.startswith("decimal"):
                return "decimal"
            if t.startswith(("int", "uint")):
                return "int"
            if t.startswith(("float", "double", "halffloat")):
                return "float"
            if t.startswith(("timestamp", "date")):
                return "temporal"
            return t
        gt = {f.name: str(f.type) for f in got_arrow.schema}
        et = {f.name: str(f.type) for f in exp_arrow.schema}
        tdiff = [(c, gt.get(c), et.get(c)) for c in sorted(set(gt) | set(et))
                 if kind(gt.get(c)) != kind(et.get(c))]
        if tdiff:
            print(f"FAIL {name}: arrow type KIND mismatch (driver hash "
                  f"would differ): {tdiff}")
            failures += 1
            continue
        for c in sorted(set(gt) | set(et)):
            for side, t in (("spark", gt.get(c)), ("duckdb", et.get(c))):
                if t and t.startswith("decimal") and \
                        int(t.split("(")[1].split(",")[0]) > 18:
                    print(f"WARN {name}: {side}.{c} is {t} — >18-digit "
                          f"decimals render unstably through the driver; "
                          f"emit as VARCHAR or BIGINT")
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
