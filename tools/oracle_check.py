#!/usr/bin/env python3
"""DuckDB oracle comparator for graft.Verify exports (dev tooling).

Usage: python3 tools/oracle_check.py /tmp/verify_r6 [--sf SFDIR] [q_name ...]

Registers every <SFDIR>/<table>.parquet as a DuckDB view named <table>
(default SFDIR: /root/testdata/sf0.001), matching the driver's setup.

For every query directory under the export dir, replays the oracle SQL from
oracle_sql.json in DuckDB and diffs it against the exported Spark parquet:
row count, column names, and the full sorted multiset of rows (exact values,
floats compared bit-for-bit after float64 cast). Prints one line per query
and a final PASS/FAIL summary.
"""
import json
import math
import os
import sys

import duckdb


def canon(v):
    if v is None:
        return ("\x00null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, (list, tuple)):
        return ("l",) + tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return ("d",) + tuple(sorted((k, canon(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return ("b", bytes(v).hex())
    return (type(v).__name__, str(v))


def rows_key(rows):
    return sorted(tuple(canon(c) for c in r) for r in rows)


def main():
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    out_dir = args[0]
    only = set(args[1:]) or None
    views = [
        f"CREATE VIEW {os.path.splitext(f)[0]} AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, f)}')"
        for f in sorted(os.listdir(sf_dir)) if f.endswith(".parquet")
    ]
    sql_map = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(n for n in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, n)))
    if only:
        names = [n for n in names if n in only]
    n_pass = n_fail = n_skip = 0
    for name in names:
        sql = sql_map.get(name)
        if sql is None:
            n_skip += 1
            print(f"SKIP  {name} (no oracle sql)")
            continue
        con = duckdb.connect()
        try:
            for v in views:
                con.execute(v)
            spark = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols = [d[0] for d in spark.description]
            s_rows = spark.fetchall()
            oracle = con.execute(sql)
            o_cols = [d[0] for d in oracle.description]
            o_rows = oracle.fetchall()
        except Exception as e:
            n_fail += 1
            print(f"ERR   {name}: {type(e).__name__}: {str(e)[:300]}")
            con.close()
            continue
        con.close()
        if s_cols != o_cols:
            n_fail += 1
            print(f"FAIL  {name}: schema {s_cols} != {o_cols}")
            continue
        if len(s_rows) != len(o_rows):
            n_fail += 1
            print(f"FAIL  {name}: rows {len(s_rows)} != {len(o_rows)}")
            continue
        sk, ok = rows_key(s_rows), rows_key(o_rows)
        if sk != ok:
            bad = sum(1 for a, b in zip(sk, ok) if a != b)
            n_fail += 1
            print(f"FAIL  {name}: {bad}/{len(sk)} sorted rows differ; "
                  f"first diff: {next((a, b) for a, b in zip(sk, ok) if a != b)}"[:400])
            continue
        n_pass += 1
        print(f"ok    {name} ({len(s_rows)} rows)")
    print(f"SUMMARY pass={n_pass} fail={n_fail} skip={n_skip}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
