#!/usr/bin/env python3
"""Oracle output-type lint: fail on HUGEINT/DECIMAL final columns.

The driver's comparator hash-mismatches DuckDB HUGEINT/DECIMAL columns
even when values are equal (3rd incident of this class: r5 DECIMAL
rounds, r6 t105's windowed-sum HUGEINT). This lint runs every oracle
SQL in DuckDB (LIMIT 0 — types only, no data) and exits nonzero if
any output column is HUGEINT or DECIMAL.

Usage:
  sbt "runMain graft.Verify <sfDir> /tmp/oracles --oracles-only"
  python3 tools/lint_oracle_types.py <sfDir> /tmp/oracles
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = n_err = 0
    for name, sql in sorted(oracle.items()):
        try:
            # LIMIT 0 wrapper: resolve output types without executing.
            r = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
            risky = [f"{c}:{t}" for c, t in zip(r.columns, r.types)
                     if "DECIMAL" in str(t) or "HUGEINT" in str(t)]
        except Exception as e:
            # ORDER BY inside the subquery is fine in DuckDB; a genuine
            # parse error here means the oracle itself is broken.
            print(f"ERR  {name}: {str(e)[:120]}")
            n_err += 1
            continue
        if risky:
            print(f"RISKY {name}: {risky}")
            n_bad += 1
    print(f"== {len(oracle)} oracles, {n_bad} risky, {n_err} errors ==")
    sys.exit(1 if (n_bad or n_err) else 0)


if __name__ == "__main__":
    main()
