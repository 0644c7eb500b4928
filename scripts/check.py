#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the sfDir
tables, and compares: schema (sorted column names), row count, and a hash of
the sorted rows (columns sorted by name, rows sorted by string repr).
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    out.sort()
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        srel = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
        scols, srows = [c for c in srel.columns], srel.fetchall()
        try:
            orel = con.sql(sql)
            ocols, orows = [c for c in orel.columns], orel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: schema {sorted(scols)} vs {sorted(ocols)}")
            n_fail += 1
            continue
        # column TYPE skew: a HUGEINT (e.g. DuckDB list_sum/sum over BIGINT)
        # renders as float64 "42.0" in pandas/arrow-based compares while the
        # int values still repr-match via fetchall — the exact doc_stats
        # round-5/6 failure mode. Flag any int-width/float skew as FAIL.
        stypes = dict(zip(srel.columns, [str(t) for t in srel.types]))
        otypes = dict(zip(orel.columns, [str(t) for t in orel.types]))
        skew = {c: (otypes[c], stypes[c]) for c in otypes
                if otypes[c] != stypes[c]}
        if skew:
            print(f"FAIL {name}: column type skew {skew}")
            n_fail += 1
            continue
        cs, co = canon(srows, scols), canon(orows, ocols)
        if cs != co:
            print(f"FAIL {name}: rows {len(cs)} vs {len(co)}")
            for a, b in list(zip(cs, co))[:5]:
                if a != b:
                    print(f"  spark={a}\n  duck ={b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(cs)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

main()
