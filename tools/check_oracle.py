#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only; the
shipped Scala library does not depend on this).

Usage: python3 tools/check_oracle.py [sfDir] [outDir]
Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
Registers each parquet table as a DuckDB view, runs every oracle SQL,
and compares against the Spark-written parquet: columns sorted by
name, rows as-written, exact value equality (floats: exact or 1e-12
rel tolerance reported separately).

norm() mirrors the driver's observed normalization (round-2 evidence):
 - DATE vs TIMESTAMP (DuckDB date_trunc returns DATE, Spark TIMESTAMP):
   dates are promoted to midnight datetimes -> both isoformat the same.
 - DECIMAL vs DOUBLE: Decimal coerced to float.
 - NaN == NaN (a NaN ratio is a legitimate match, ADVICE r2).
Rows are compared positionally (every oracle query MUST have a
total-order ORDER BY); on positional mismatch we fall back to a
sorted-multiset compare and report which of the two failed.
Additionally warns when an oracle result column is HUGEINT-typed
(DuckDB sum(INTEGER) etc.) — the round-2 s10 hash-FAIL class; cast
those to BIGINT in the oracle SQL.
"""
import datetime
import decimal
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"  # NaN == NaN for comparison purposes
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            oc = con.execute(sql)
            ocols = [c[0] for c in oc.description]
            otypes = [str(c[1]) for c in oc.description]
            orows = oc.fetchall()
            for cname, ctype in zip(ocols, otypes):
                if "HUGEINT" in ctype.upper() or "INT128" in ctype.upper():
                    print(f"WARN {name}: oracle col {cname} is {ctype} "
                          f"(driver hash-FAIL class; CAST to BIGINT in oracle SQL)")
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            sc = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'")
            scols = [c[0] for c in sc.description]
            srows = sc.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}")
            n_fail += 1
            continue
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: columns differ oracle={sorted(ocols)} spark={sorted(scols)}")
            n_fail += 1
            continue
        operm = sorted(range(len(ocols)), key=lambda i: ocols[i])
        sperm = sorted(range(len(scols)), key=lambda i: scols[i])
        og = [tuple(norm(r[i]) for i in operm) for r in orows]
        sg = [tuple(norm(r[i]) for i in sperm) for r in srows]
        if len(og) != len(sg):
            print(f"FAIL {name}: row count oracle={len(og)} spark={len(sg)}")
            n_fail += 1
            continue
        exact = og == sg
        if exact:
            print(f"PASS {name} ({len(og)} rows, exact)")
            n_pass += 1
            continue
        # find first diff
        close = True
        first = None
        for ri, (a, b) in enumerate(zip(og, sg)):
            if a == b:
                continue
            for ci, (x, y) in enumerate(zip(a, b)):
                if x == y:
                    continue
                if isinstance(x, float) and isinstance(y, float):
                    if math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                        continue
                close = False
                if first is None:
                    first = (ri, ci, x, y)
            if not close and first:
                break
        if close:
            print(f"WARN {name}: rows match only within float tolerance (driver may fail!)")
            n_fail += 1
        elif sorted(map(repr, og)) == sorted(map(repr, sg)):
            print(f"FAIL {name}: values match as multiset but row ORDER differs "
                  f"(oracle needs a total-order ORDER BY)")
            n_fail += 1
        else:
            ri, ci, x, y = first
            print(f"FAIL {name}: row {ri} col {sorted(ocols)[ci]}: oracle={x!r} spark={y!r}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
