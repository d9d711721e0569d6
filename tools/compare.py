#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query result parquet written by graft.Verify, runs the matching
oracle SQL (oracle_sql.json) in DuckDB against the same testdata parquet
tables, then compares: row count, schema (sorted column names), and a hash
of all values with columns sorted by name (mirroring the driver's described
canonicalization). Prints a per-query PASS/FAIL table plus first diffs.
"""
import sys, os, json, glob
import duckdb

def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((v is not None, str(v)) for v in t))
    return out

def norm(v):
    import datetime, decimal
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        name = os.path.basename(p)[:-len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # optional third arg: comma-separated query names (matches Verify's
    # `only` filter for fast single-query iteration)
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    n_pass = n_fail = 0
    for qname in sorted(oracle):
        if only is not None and qname not in only:
            continue
        res_dir = os.path.join(out_dir, qname)
        try:
            spark_rel = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
            spark_cols = list(spark_rel.columns)
            spark_types = {c: str(t) for c, t in zip(spark_rel.columns, spark_rel.types)}
            spark_rows = spark_rel.fetchall()
            duck_rel = con.sql(oracle[qname])
            duck_cols = list(duck_rel.columns)
            duck_types = {c: str(t) for c, t in zip(duck_rel.columns, duck_rel.types)}
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {qname}: exec error: {str(e).splitlines()[0] if str(e) else e}")
            n_fail += 1
            continue
        problems = []
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"schema names differ: only-spark={set(spark_cols)-set(duck_cols)} only-duck={set(duck_cols)-set(spark_cols)}")
        else:
            tdiff = {c: (spark_types[c], duck_types[c]) for c in spark_cols if spark_types[c] != duck_types[c]}
            if tdiff:
                problems.append(f"types differ: {tdiff}")
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount {len(spark_rows)} vs {len(duck_rows)}")
        if not problems:
            a = canon(spark_rows, spark_cols)
            b = canon(duck_rows, duck_cols)
            if a != b:
                bad = sum(1 for x, y in zip(a, b) if x != y)
                problems.append(f"values differ in {bad}/{len(a)} rows")
                cols_sorted = sorted(spark_cols)
                shown = 0
                for x, y in zip(a, b):
                    if x != y and shown < 3:
                        for ci, (xv, yv) in enumerate(zip(x, y)):
                            if xv != yv:
                                problems.append(f"  col={cols_sorted[ci]} spark={xv!r} duck={yv!r}")
                        shown += 1
        if problems:
            n_fail += 1
            print(f"FAIL {qname} ({len(spark_rows)} rows)")
            for pr in problems:
                print(f"   {pr}")
        else:
            n_pass += 1
            print(f"PASS {qname} ({len(spark_rows)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
