#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [sfDir] [verifyOut]

For each query dumped by graft.Verify into <verifyOut>/<name>/ (parquet),
runs the matching oracle SQL from <verifyOut>/oracle_sql.json in DuckDB
over the same testdata parquet tables, then compares: row count, column
names (sorted), and cell values (rows sorted, columns sorted by name).
Dev tool only — NOT part of the engine.
"""
import sys, json, glob, math
import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

fails = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    got = con.execute(f"SELECT * FROM '{OUT}/{name}/*.parquet'").fetch_arrow_table()
    try:
        exp = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails += 1
        continue
    gcols, ecols = sorted(got.column_names), sorted(exp.column_names)
    if gcols != ecols:
        print(f"FAIL {name}: columns differ spark={gcols} oracle={ecols}")
        fails += 1
        continue
    # type drift is a FAIL, not a warning: the driver's hash is
    # type-sensitive, so an uncast DuckDB HUGEINT/DECIMAL against a
    # Spark BIGINT passes a value-only compare locally yet goes red at
    # the driver (round-8 q164). Mirror SQL must CAST to Spark's type.
    tbad = [(c, str(got.schema.field(c).type), str(exp.schema.field(c).type))
            for c in gcols
            if str(got.schema.field(c).type) != str(exp.schema.field(c).type)]
    if tbad:
        print(f"FAIL {name}: column type drift (spark vs oracle): {tbad}")
        fails += 1
        continue
    skey = lambda t: tuple((v is None, str(type(v)), v if v is not None else 0) for v in t)
    grows = sorted((tuple(norm(r[c]) for c in gcols) for r in got.to_pylist()), key=skey)
    erows = sorted((tuple(norm(r[c]) for c in ecols) for r in exp.to_pylist()), key=skey)
    if len(grows) != len(erows):
        print(f"FAIL {name}: rowcount spark={len(grows)} oracle={len(erows)}")
        fails += 1
        continue
    bad = [(g, e) for g, e in zip(grows, erows) if g != e]
    if bad:
        print(f"FAIL {name}: {len(bad)}/{len(grows)} rows differ; first: spark={bad[0][0]} oracle={bad[0][1]}")
        fails += 1
    else:
        print(f"PASS {name} ({len(grows)} rows)")

print(f"\n{len(oracle) - fails}/{len(oracle)} queries pass")
sys.exit(1 if fails else 0)
