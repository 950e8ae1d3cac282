#!/usr/bin/env python3
"""Fixture-regeneration robustness probe.

The driver REGENERATES /root/testdata between rounds; gate failures
that "appear from nowhere" are usually data-dependent (row order,
parquet logical types — the round-4 bench crash was events.ts arriving
as TIMESTAMP(NANOS)). This tool manufactures the realistic
regeneration modes from an existing sf dir so Verify can be smoke-run
against them BEFORE the driver does it for real:

  - every table's rows deterministically shuffled (operators must not
    depend on input order), and
  - events.ts re-encoded as TIMESTAMP(NANOS) (Spark 4 rejects it on a
    native read; graft.queries.Tables.t must dispatch).

Usage: python3 tools/perturb_fixtures.py <srcSfDir> <outDir>
Then:  sbt "runMain graft.Verify <outDir> /tmp/verify_perturb"
       python3 tools/check_correctness.py <outDir> /tmp/verify_perturb
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    src, out = sys.argv[1], sys.argv[2]
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(20260814)
    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        perm = rng.permutation(tbl.num_rows)
        tbl = tbl.take(pa.array(perm))
        if t == "events":
            fields = []
            cols = []
            for f in tbl.schema:
                col = tbl.column(f.name)
                if f.name == "ts" and pa.types.is_timestamp(f.type):
                    col = col.cast(pa.timestamp("ns"))
                    f = pa.field(f.name, pa.timestamp("ns"))
                fields.append(f)
                cols.append(col)
            tbl = pa.table(cols, schema=pa.schema(fields))
        pq.write_table(tbl, f"{out}/{t}.parquet")
        print(f"{t}: {tbl.num_rows} rows shuffled"
              + (" + ts→nanos" if t == "events" else ""))


if __name__ == "__main__":
    main()
