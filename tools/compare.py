#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet output
against the DuckDB oracle SQL and diff. Usage: compare.py SFDIR OUTDIR [name...]
"""
import duckdb, json, sys, math

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = []
ran = 0
# Oracle output-type whitelist: the driver's hasher serializes DuckDB
# result columns via pandas, and exotic types (HUGEINT/int128, DECIMAL)
# round-trip differently from Spark's parquet output even when every
# value is identical (x217, round 9: an un-CAST correlated sum leaked
# HUGEINT into `bucket` -> pandas float64 -> hash mismatch). Any oracle
# column outside this list is a gate-dialect bug, not a Spark bug.
TYPE_OK = {"BIGINT", "INTEGER", "VARCHAR", "DOUBLE", "DATE", "BOOLEAN",
           "TIMESTAMP"}
type_bad = []
unknown = sorted(only - set(oracle)) if only else []
if unknown:
    print(f"WARNING: not in oracle_sql.json: {unknown}")
for name in sorted(oracle):
    if only and name not in only:
        continue
    ran += 1
    sql = oracle[name]
    try:
        # one bind+execute: types come off the relation the main
        # comparison consumes (the separate whitelist pre-pass doubled
        # gate latency by running every oracle query twice)
        rel = con.sql(sql)
        for c, t in zip(rel.columns, rel.types):
            if str(t) not in TYPE_OK:
                type_bad.append(f"{name}.{c}: {t}")
        exp = rel.df()
    except Exception as e:
        print(f"{name}: ORACLE ERROR: {e}")
        fail.append(name); continue
    try:
        got = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
    except Exception as e:
        print(f"{name}: SPARK OUTPUT MISSING: {e}")
        fail.append(name); continue
    exp = exp[sorted(exp.columns)]
    got_cols = sorted(got.columns)
    if list(exp.columns) != got_cols:
        print(f"{name}: COLUMNS exp={list(exp.columns)} got={got_cols}")
        fail.append(name); continue
    got = got[got_cols]
    if exp.shape != got.shape:
        print(f"{name}: SHAPE exp={exp.shape} got={got.shape}")
        fail.append(name); continue
    bad = []
    for c in exp.columns:
        ev, gv = exp[c].tolist(), got[c].tolist()
        for i, (x, y) in enumerate(zip(ev, gv)):
            same = (x == y)
            if not same:
                try:
                    same = (x is None and y is None) or \
                           (isinstance(x, float) and isinstance(y, float)
                            and math.isnan(x) and math.isnan(y)) or \
                           (x != x and y != y)
                except Exception:
                    pass
            if not same and str(x) != str(y):
                bad.append((c, i, x, y))
                if len(bad) >= 3:
                    break
        if bad:
            break
    if bad:
        print(f"{name}: VALUES {bad}")
        fail.append(name)
    else:
        print(f"{name}: OK rows={len(exp)} cols={list(exp.columns)}")
if type_bad:
    print(f"ORACLE TYPE WHITELIST VIOLATIONS (cast these in the oracle "
          f"SQL): {type_bad}")
print(f"\n{ran - len(fail)}/{ran} OK"
      + (f" (of {len(oracle)} total)" if only else "")
      + (f", FAILED: {fail}" if fail else ""))
sys.exit(1 if (fail or unknown or type_bad) else 0)
