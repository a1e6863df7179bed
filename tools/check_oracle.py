#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Loads each <name>.parquet produced by graft.Verify, runs the matching SQL
from oracle_sql.json in DuckDB over the same fixture tables, and compares:
row count, column names (sorted), and cell values (columns sorted by name,
rows in result order; floats compared bitwise-then-tolerance so we see HOW
close a mismatch is).

Also times each oracle's DuckDB execution and FAILS the pre-flight if any
single oracle exceeds PER_QUERY_BUDGET_S or the DuckDB total exceeds
TOTAL_BUDGET_S — round 13's correctness artifact came back empty because
two unmaterialized BPE oracles cost 312 s + 411 s and blew the driver's
budget; this guard catches that in-round. A per-query timing report is
written to <verify_out_dir>/oracle_timing.json.
"""
import json
import math
import sys
import time

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def type_category(t):
    """Coarse type family for the parity check. The driver's hasher is
    stricter than value comparison: a Spark DECIMAL(38,0) column hashes
    differently from a DuckDB HUGEINT/BIGINT even when every value is
    equal (round-14's text_dsir red row). Integer widths (int32 vs
    int64) and signedness normalize fine in practice, so they share a
    family; decimal is its own family and any decimal-vs-integer or
    decimal-vs-float split across the two engines is a hard FAIL."""
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    if pa.types.is_struct(t):
        return "struct"
    return str(t)


def type_parity_diffs(spark_tbl, duck_tbl):
    """Return [(col, spark_type, duck_type), ...] for columns whose arrow
    type FAMILIES differ between the Spark output and the DuckDB oracle."""
    diffs = []
    for c in spark_tbl.column_names:
        if c not in duck_tbl.column_names:
            continue
        st = spark_tbl.schema.field(c).type
        dt = duck_tbl.schema.field(c).type
        if type_category(st) != type_category(dt):
            diffs.append((c, str(st), str(dt)))
    return diffs

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

PER_QUERY_BUDGET_S = 10.0
TOTAL_BUDGET_S = 240.0


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
    timing = {}
    for name, sql in sorted(oracle.items()):
        try:
            spark_tbl = pq.read_table(f"{outdir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            t0 = time.monotonic()
            duck_tbl = con.execute(sql).fetch_arrow_table()
            timing[name] = round(time.monotonic() - t0, 3)
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
        tdiffs = type_parity_diffs(spark_tbl, duck_tbl)
        if tdiffs:
            print(f"FAIL {name}: type-parity "
                  + "; ".join(f"col={c} spark={s} duck={d}" for c, s, d in tdiffs)
                  + " (values may match but the driver's hasher is type-"
                    "sensitive — cast to BIGINT/DOUBLE on both sides)")
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
            print(f"PASS {name} ({spark_tbl.num_rows} rows, duckdb {timing[name]:.2f}s)")
            n_pass += 1
    total_s = sum(timing.values())
    slow = {n: s for n, s in timing.items() if s > PER_QUERY_BUDGET_S}
    with open(f"{outdir}/oracle_timing.json", "w") as f:
        json.dump({"total_duckdb_s": round(total_s, 2),
                   "per_query_budget_s": PER_QUERY_BUDGET_S,
                   "total_budget_s": TOTAL_BUDGET_S,
                   "over_budget": slow,
                   "slowest": dict(sorted(timing.items(), key=lambda kv: -kv[1])[:15]),
                   "timing": timing}, f, indent=1, sort_keys=True)
    print(f"\nDuckDB oracle total: {total_s:.1f}s over {len(timing)} queries "
          f"(budget {TOTAL_BUDGET_S:.0f}s)")
    top = sorted(timing.items(), key=lambda kv: -kv[1])[:5]
    print("slowest:", ", ".join(f"{n}={s:.2f}s" for n, s in top))
    budget_fail = False
    if slow:
        print(f"BUDGET FAIL: {len(slow)} oracle(s) over {PER_QUERY_BUDGET_S:.0f}s "
              f"per-query budget: {slow}")
        budget_fail = True
    if total_s > TOTAL_BUDGET_S:
        print(f"BUDGET FAIL: DuckDB total {total_s:.1f}s exceeds {TOTAL_BUDGET_S:.0f}s")
        budget_fail = True
    print(f"{n_pass} pass, {n_fail} fail")
    return 1 if (n_fail or budget_fail) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
