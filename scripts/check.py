#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs
<verifyOutDir>/oracle_sql.json[name] in DuckDB with the sfDir parquet
files registered as views, and compares: column set (by name), row
count, and values (rows sorted, columns sorted by name, floats
rounded to 6 significant-ish decimals).
"""
import json
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # keep a type marker so a BIGINT column on one side vs a
        # float-widened HUGEINT on the other (1136 vs 1136.0) fails
        # locally the same way the driver's stricter hash does
        return f"f:{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        wcols, gcols = sorted(want.columns), sorted(got.columns)
        if wcols != gcols:
            print(f"FAIL {name}: columns differ: oracle={wcols} spark={gcols}")
            n_fail += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows differ: oracle={len(want)} spark={len(got)}")
            n_fail += 1
            continue
        w = sorted(tuple(norm(v) for v in row) for row in want[wcols].itertuples(index=False))
        g = sorted(tuple(norm(v) for v in row) for row in got[gcols].itertuples(index=False))
        if w != g:
            bad = next(i for i, (a, b) in enumerate(zip(w, g)) if a != b)
            print(f"FAIL {name}: values differ at sorted row {bad}:")
            print(f"  oracle: {w[bad]}")
            print(f"  spark : {g[bad]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(want)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
