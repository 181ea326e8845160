#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [<summaryJson>]

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over views of <sfDir>'s tables,
and compares: columns sorted by name, rows in produced order, values exact
(floats: exact after both sides' rounding; report max abs diff when unequal).

With a third argument, also writes a machine-readable per-query summary in
the driver's CORRECTNESS shape — {"<name>": {"rows_match": bool,
"schema_match": bool, "hash_match": bool, "err": str|null}} — so the round's
gate survives as a committed artifact even when the driver's own
compare/capture step fails (r12/r13 both produced empty CORRECTNESS files
from perfect dumps).

Developer-side tool only — the shipped Scala library has no Python deps.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return v
    if isinstance(v, bytes):
        return v.hex()
    return v


def eq(a, b):
    """Exact equality, except NaN == NaN (floats compare exact otherwise)."""
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float) \
            and math.isnan(a) and math.isnan(b):
        return True
    return a == b


def main(sf_dir, out_dir, summary_path=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    summary = {}

    def record(name, rows_match, schema_match, hash_match, err=None):
        summary[name] = {"rows_match": rows_match,
                         "schema_match": schema_match,
                         "hash_match": hash_match, "err": err}

    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetch_arrow_table()
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            record(name, False, False, False, f"exec error: {e}")
            n_fail += 1
            continue
        gcols, wcols = sorted(got.column_names), sorted(want.column_names)
        if gcols != wcols:
            print(f"FAIL {name}: columns spark={gcols} oracle={wcols}")
            record(name, False, False, False,
                   f"columns spark={gcols} oracle={wcols}")
            n_fail += 1
            continue
        if got.num_rows != want.num_rows:
            print(f"FAIL {name}: rows spark={got.num_rows} oracle={want.num_rows}")
            record(name, False, True, False,
                   f"rows spark={got.num_rows} oracle={want.num_rows}")
            n_fail += 1
            continue
        g = [[norm(v) for v in got.column(c).to_pylist()] for c in gcols]
        w = [[norm(v) for v in want.column(c).to_pylist()] for c in gcols]
        bad = None
        for ci, c in enumerate(gcols):
            for ri in range(got.num_rows):
                a, b = g[ci][ri], w[ci][ri]
                if not eq(a, b):
                    bad = (ci, c, ri, a, b)
                    break
            if bad:
                break
        if bad:
            ci, c, ri, a, b = bad
            extra = ""
            if isinstance(a, float) or isinstance(b, float):
                diffs = [abs(x - y) for x, y in zip(g[ci], w[ci])
                         if isinstance(x, float) and isinstance(y, float)
                         and not (math.isnan(x) or math.isnan(y))]
                if diffs:
                    extra = f" max_abs_diff={max(diffs):.6g}"
            print(f"FAIL {name}: first diff col={c} row={ri} "
                  f"spark={a!r} oracle={b!r}{extra}")
            record(name, True, True, False,
                   f"first diff col={c} row={ri} spark={a!r} oracle={b!r}{extra}")
            n_fail += 1
        else:
            print(f"PASS {name} ({got.num_rows} rows, {len(gcols)} cols)")
            record(name, True, True, True)
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail / {len(oracle)} total")
    if summary_path:
        with open(summary_path, "w") as f:
            json.dump({"n_pass": n_pass, "n_fail": n_fail,
                       "n_total": len(oracle), "queries": summary}, f,
                      indent=None, separators=(",", ":"))
        print(f"== summary written to {summary_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
