#!/usr/bin/env python3
"""Stricter-than-check.py gate: bitwise/typed comparison.

Differences from check.py: float compare is by raw IEEE bit pattern
(catches -0.0 vs 0.0 and last-ulp), non-floats compare by (type, repr),
so Decimal-vs-float or int-vs-Decimal mismatches that Python == hides
are surfaced. Approximates whatever canonical hashing the driver does.

Usage: python3 tools/strictcheck.py <sfDir> <verifyOutDir> [query...]
"""
import glob
import json
import math
import re
import struct
import sys
from decimal import Decimal

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


# The driver's compare evidently goes through pandas, where int widths
# and timestamp units vanish but int-vs-float survives (and HUGEINT —
# DuckDB's sum(BIGINT) result type — becomes float64!). So compare type
# FAMILIES, mapping hugeint to the float family.
def family_arrow(t):
    s = str(t)
    if s.startswith("decimal128"):
        return "dec"
    if s.startswith(("int", "uint")):
        return "i"
    if s in ("float", "double", "halffloat"):
        return "f"
    if s.startswith("timestamp"):
        return "ts"
    if s.startswith("date"):
        return "date"
    if s in ("string", "large_string"):
        return "s"
    if s in ("binary", "large_binary"):
        return "blob"
    return s


def family_duck(t):
    s = str(t).lower()
    if s.startswith("decimal"):
        return "dec"
    if s == "hugeint":
        return "f"  # pandas has no int128; duckdb df() emits float64
    if s.endswith("int") or s == "integer":
        return "i"
    if s in ("float", "double", "real"):
        return "f"
    if s.startswith("timestamp"):
        return "ts"
    if s == "date":
        return "date"
    if s == "varchar":
        return "s"
    if s == "blob":
        return "blob"
    if s == "boolean":
        return "bool"
    return s


def type_check(name, sdir):
    """Compare declared Spark parquet types vs DuckDB oracle types."""
    files = glob.glob(f"{sdir}/{name}/*.parquet")
    if not files:
        return None
    sch = pq.read_schema(files[0])
    return {f.name: family_arrow(f.type) for f in sch}


def key(x):
    if isinstance(x, float):
        return ("f", struct.pack("<d", x))
    if isinstance(x, Decimal):
        return ("dec", str(x))
    if isinstance(x, bool):
        return ("b", x)
    if isinstance(x, int):
        return ("i", x)
    return (type(x).__name__, str(x))


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(key(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            srel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols = [d[0] for d in srel.description]
            s_rows = srel.fetchall()
            drel = con.sql(sql)
            d_cols = list(drel.columns)
            dtypes = {c: family_duck(t)
                      for c, t in zip(drel.columns, drel.types)}
            d_rows = drel.fetchall()
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
        stypes = type_check(name, out_dir)
        hard = [(c, stypes[c], dtypes[c]) for c in stypes
                if c in dtypes and stypes[c] != dtypes[c]
                and {stypes[c], dtypes[c]} != {"dec", "f"}]
        soft = [(c, stypes[c], dtypes[c]) for c in stypes
                if c in dtypes and stypes[c] != dtypes[c]
                and {stypes[c], dtypes[c]} == {"dec", "f"}]
        if hard:
            print(f"FAIL {name}: type-family mismatch {hard}")
            n_fail += 1
            continue
        if soft:
            print(f"WARN {name}: dec-vs-float columns {soft} "
                  "(driver-tolerated but fragile)")
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
            n_fail += 1
            continue
        bad = 0
        first = None
        for rs, rd in zip(sr, dr):
            if rs != rd:
                bad += 1
                if first is None:
                    for c, (a, b) in enumerate(zip(rs, rd)):
                        if a != b:
                            first = (sc[c], a, b)
                            break
        if bad:
            print(f"FAIL {name}: {bad} strict row mismatches, first={first}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sr)} rows [bitwise]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
