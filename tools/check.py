#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Loads each Verify.scala output parquet, runs the matching oracle SQL in
DuckDB against views over the same testdata parquet, and compares:
row count, column-name set, and a hash over the value matrix with
columns sorted by name and rows sorted by all columns.
"""
import sys, json, glob, hashlib, os
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify-out"
TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
# match Verify.scala's SPARK_GRAFT_ONLY subset-run aid
_only = os.environ.get("SPARK_GRAFT_ONLY")
if _only:
    keep = {n.strip() for n in _only.split(",")}
    oracle = {k: v for k, v in oracle.items() if k in keep}

def canon(rel):
    df = rel.fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(df.astype(str).values.tolist())
    h = hashlib.sha256(json.dumps(rows).encode()).hexdigest()[:16]
    return len(df), sorted(df.columns), h, rows

fails = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = canon(con.sql(f"SELECT * FROM read_parquet({files!r})"))
        want = canon(con.sql(sql))
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    if got[:3] == want[:3]:
        print(f"OK   {name}: rows={got[0]} hash={got[2]}")
    else:
        fails += 1
        print(f"FAIL {name}: spark(rows={got[0]}, hash={got[2]}) vs oracle(rows={want[0]}, hash={want[2]})")
        if got[1] != want[1]:
            print(f"     cols spark={got[1]}\n     cols oracle={want[1]}")
        else:
            gs, ws = set(map(tuple, got[3])), set(map(tuple, want[3]))
            diff1 = list(gs - ws)[:3]; diff2 = list(ws - gs)[:3]
            print(f"     spark-only rows: {diff1}\n     oracle-only rows: {diff2}")
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
