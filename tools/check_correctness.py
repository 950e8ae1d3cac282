#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same sf
tables, and compares: row count, column names, and values (columns
sorted by name, rows sorted by all columns, stringified).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(str(r[i]) for i in order))
    out.sort()
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')")
            g_cols = [c.lower() for c in got.columns]
            g_rows = got.fetchall()
            exp = con.sql(sql)
            e_cols = [c.lower() for c in exp.columns]
            e_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        risky = [f"{c}:{t}" for c, t in
                 list(zip(got.columns, got.types)) + list(zip(exp.columns, exp.types))
                 if "DECIMAL" in str(t) or "HUGEINT" in str(t)]
        if risky:
            # The driver's comparator converts DuckDB results via pandas,
            # where DECIMAL/HUGEINT stringify differently than parquet
            # decimals ('0.0' vs '0.0000', '4568.0' vs '4568') -> hash
            # mismatch even when values agree. Final columns must be
            # DOUBLE/BIGINT/VARCHAR/BOOLEAN on both sides. Hard FAIL
            # (3rd incident of this class: r5 DECIMAL, r6 HUGEINT t105).
            print(f"FAIL {name}: driver-hostile output types {risky}")
            n_fail += 1
            continue
        if sorted(g_cols) != sorted(e_cols):
            print(f"FAIL {name}: cols spark={sorted(g_cols)} duck={sorted(e_cols)}")
            n_fail += 1
            continue
        if len(g_rows) != len(e_rows):
            print(f"FAIL {name}: rows spark={len(g_rows)} duck={len(e_rows)}")
            n_fail += 1
            continue
        cg, ce = canon(g_rows, g_cols), canon(e_rows, e_cols)
        if cg != ce:
            bad = [(a, b) for a, b in zip(cg, ce) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(g_rows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
