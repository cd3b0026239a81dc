#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs DuckDB on each oracle_sql.json entry over the same parquet tables
and compares against the Verify-dumped Spark parquet: column names
(sorted), row counts, and values (exact where possible, else 1e-9 rel).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple(
        (x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        if fa == fb:
            return True
        return abs(fa - fb) <= 1e-9 * max(abs(fa), abs(fb), 1.0)
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols = [d[0] for d in spark_rel.description]
            s_rows = spark_rel.fetchall()
            duck_rel = con.execute(sql)
            d_cols = [d[0] for d in duck_rel.description]
            d_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            n_fail += 1
            continue
        sc, sr = canon(s_rows, s_cols)
        dc, dr = canon(d_rows, d_cols)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
            n_fail += 1
            continue
        bad = exact_bad = 0
        first = None
        for rs, rd in zip(sr, dr):
            for c, (a, b) in enumerate(zip(rs, rd)):
                if not eq(a, b):
                    bad += 1
                    if first is None:
                        first = (sc[c], a, b)
                if a != b and not (
                        isinstance(a, float) and isinstance(b, float)
                        and math.isnan(a) and math.isnan(b)):
                    exact_bad += 1
        if bad:
            print(f"FAIL {name}: {bad} value mismatches, first={first}")
            n_fail += 1
        else:
            tag = "exact" if exact_bad == 0 else f"approx({exact_bad} inexact)"
            print(f"PASS {name}: {len(sr)} rows [{tag}]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
