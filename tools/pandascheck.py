#!/usr/bin/env python3
"""Driver-mimic gate: pandas-level hash comparison.

check.py compares values in Python (tolerant), strictcheck.py compares
typed rows via fetchall — but the driver's hash goes through PANDAS,
where representation differences invisible to both gates surface:
DuckDB's .df() converts DECIMAL -> float64 while pyarrow keeps Decimal
objects (the a6_gram_sums 3-round hash miss), HUGEINT -> float64, etc.
This gate reads the Spark parquet via pandas/pyarrow and the oracle via
duckdb .df(), sorts columns by name, and hash-compares the stringified
frames — the closest local approximation of the driver's canonicalizer.

Rule of thumb it enforces: NO decimal128 columns in hashed output (cast
via string to double on both sides), no HUGEINT-vs-int64 splits.

Usage: python3 tools/pandascheck.py <sfDir> <verifyOutDir> [query...]
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


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
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            sdf = pd.concat([pd.read_parquet(f) for f in files])
            ddf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            n_fail += 1
            continue
        if sorted(sdf.columns) != sorted(ddf.columns):
            print(f"FAIL {name}: columns {sorted(sdf.columns)} "
                  f"vs {sorted(ddf.columns)}")
            n_fail += 1
            continue
        cols = sorted(sdf.columns)
        s = sdf[cols].sort_values(by=cols).reset_index(drop=True)
        d = ddf[cols].sort_values(by=cols).reset_index(drop=True)
        if len(s) != len(d):
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}")
            n_fail += 1
            continue
        ss, dd = s.astype(str), d.astype(str)
        hs = pd.util.hash_pandas_object(ss, index=False).sum()
        hd = pd.util.hash_pandas_object(dd, index=False).sum()
        if hs != hd:
            first = None
            for c in cols:
                neq = ss[c] != dd[c]
                if neq.any():
                    i = neq.idxmax()
                    first = (c, repr(s[c][i]), repr(d[c][i]))
                    break
            print(f"FAIL {name}: pandas-hash mismatch, first={first}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(s)} rows [pandas-hash]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
