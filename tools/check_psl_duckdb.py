#!/usr/bin/env python3
"""ACTUAL-DuckDB leg of the PSL production-swap property (r16).

PslPropertySpec proves when-chain == expression == broadcast-join ==
generated CASE over >=1k random (psl, host) cases, but its oracle-CASE
leg runs through Spark SQL (regexp_matches -> regexp_like). This script
replays the IDENTICAL draws in real DuckDB: the spec dumps every case
plus its generated CASE SQL to /tmp/psl_property_cases.jsonl; each line
is executed verbatim here and compared against the Spark-agreed result.

Usage: sbt "testOnly graft.PslPropertySpec"   # writes the dump
       python3 tools/check_psl_duckdb.py [dump_path]

Developer-side tool only (the shipped library has no Python deps).
"""
import json
import sys

import duckdb

def main(path):
    con = duckdb.connect()
    n = bad = 0
    with open(path) as f:
        for line in f:
            d = json.loads(line)
            con.execute("CREATE OR REPLACE TABLE t(i INT, host VARCHAR)")
            con.executemany("INSERT INTO t VALUES (?, ?)",
                            list(enumerate(d["hosts"])))
            got = dict(con.execute(
                f"SELECT i, {d['sql']} FROM t").fetchall())
            for i, (h, want) in enumerate(zip(d["hosts"], d["want"])):
                n += 1
                if got[i] != want:
                    bad += 1
                    print(f"MISMATCH host={h!r}: duckdb={got[i]!r} "
                          f"spark={want!r}")
    print(f"== {n - bad} pass / {bad} fail / {n} total (real DuckDB)")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1
                  else "/tmp/psl_property_cases.jsonl"))
