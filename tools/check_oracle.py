#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Loads each <name>.parquet produced by graft.Verify, runs the matching SQL
from oracle_sql.json in DuckDB over the same fixture tables, and compares:
row count, column names (sorted), and cell values (columns sorted by name,
rows in result order; floats compared bitwise-then-tolerance so we see HOW
close a mismatch is).
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        return v
    return v


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_tbl = pq.read_table(f"{outdir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            duck_tbl = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck_tbl.column_names)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns {s_cols} vs {d_cols}")
            n_fail += 1
            continue
        if spark_tbl.num_rows != duck_tbl.num_rows:
            print(f"FAIL {name}: rows {spark_tbl.num_rows} vs {duck_tbl.num_rows}")
            n_fail += 1
            continue
        bad = None
        for c in s_cols:
            sv = spark_tbl.column(c).to_pylist()
            dv = duck_tbl.column(c).to_pylist()
            for i, (a, b) in enumerate(zip(sv, dv)):
                if a is None and b is None:
                    continue
                if a is None or b is None:
                    bad = (c, i, a, b)
                    break
                if isinstance(a, float) or isinstance(b, float):
                    if a == b:
                        continue
                    if math.isclose(float(a), float(b), rel_tol=1e-12, abs_tol=1e-12):
                        bad = (c, i, a, b, "CLOSE-BUT-NOT-BITWISE")
                        break
                    bad = (c, i, a, b)
                    break
                if a != b:
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: first diff col={bad[0]} row={bad[1]}: "
                  f"spark={bad[2]!r} duck={bad[3]!r} {bad[4:] or ''}")
            n_fail += 1
        else:
            print(f"PASS {name} ({spark_tbl.num_rows} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
