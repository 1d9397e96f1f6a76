#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev loop only; the
library itself is pure Scala). Usage:

    python3 tools/check.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already produced
outDir/<name>/ parquet dirs + outDir/oracle_sql.json. Registers each
testdata parquet as a DuckDB view named after the table, runs every oracle
SQL, and compares to the Spark result: columns sorted by name, rows sorted,
exact value match (floats compared exactly — the queries are designed to be
bit-identical)."""
import json, sys, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        return repr(v)
    return str(v)

def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols, s_rows = norm_rows([d[0] for d in spark_rel.description], spark_rel.fetchall())
            o_rel = con.sql(sql)
            o_cols, o_rows = norm_rows([d[0] for d in o_rel.description], o_rel.fetchall())
        except Exception as ex:
            print(f"FAIL {name}: {ex}");  n_fail += 1;  continue
        if s_cols != o_cols:
            print(f"FAIL {name}: cols spark={s_cols} oracle={o_cols}");  n_fail += 1
        elif s_rows != o_rows:
            n_fail += 1
            diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
            print(f"FAIL {name}: {len(s_rows)} vs {len(o_rows)} rows, {len(diffs)} differing")
            for a, b in diffs[:3]:
                print(f"   spark : {a}\n   oracle: {b}")
            if len(s_rows) != len(o_rows):
                print(f"   spark[:2]={s_rows[:2]}\n   oracle[:2]={o_rows[:2]}")
        else:
            print(f"PASS {name} ({len(s_rows)} rows)");  n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
