#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Reads the Verify output dir (parquet per query + oracle_sql.json),
runs each oracle in DuckDB over the same sf dir, and compares
row-by-row after sorting columns by name (mirroring the driver's
hash-compare: exact values, exact schema).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        # NaN must map to a deterministic key: a raw NaN in the tuple makes
        # Python tuple comparison inconsistent and the sort order unstable.
        df = df.sort_values(
            by=list(df.columns), ignore_index=True, kind="stable",
            key=lambda s: s.map(
                lambda v: (v is None, v != v,
                           v if v is not None and v == v else 0)))
    return df


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if a != a and b != b:  # NaN
            return True
    except Exception:
        pass
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    try:  # date vs midnight-timestamp representation drift
        import datetime
        if isinstance(a, (datetime.date, pd.Timestamp)) and \
           isinstance(b, (datetime.date, pd.Timestamp)):
            return pd.Timestamp(a) == pd.Timestamp(b)
    except Exception:
        pass
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Verify writes this sidecar when a query THREW (its output dir
    # then holds a 1-row verify_error marker frame): surface the real
    # exception up front instead of a bare column-mismatch FAIL below.
    try:
        ran_errs = json.load(open(f"{out_dir}/verify_errors.json"))
        for name, msg in sorted(ran_errs.items()):
            print(f"FAILED TO RUN {name}: {msg}")
    except FileNotFoundError:
        pass
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        g, x = norm(got), norm(exp)
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(x.columns)}")
            n_fail += 1
            continue
        # strict dtype compare (both sides read via duckdb → comparable):
        # int32 vs int64 values are == in Python but may hash-differ.
        dt_bad = [(c, str(g[c].dtype), str(x[c].dtype)) for c in g.columns
                  if str(g[c].dtype) != str(x[c].dtype)]
        if dt_bad:
            print(f"FAIL {name}: dtype mismatch {dt_bad}")
            n_fail += 1
            continue
        if len(g) != len(x):
            print(f"FAIL {name}: rows {len(g)} vs {len(x)}")
            n_fail += 1
            continue
        bad = None
        gv, xv = g.values.tolist(), x.values.tolist()
        for i in range(len(gv)):
            for j in range(len(g.columns)):
                if not values_equal(gv[i][j], xv[i][j]):
                    bad = (i, g.columns[j], gv[i][j], xv[i][j])
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} duckdb={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
