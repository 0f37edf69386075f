#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Runs DuckDB on oracle_sql.json against the sf parquet tables and compares
each result with the Spark parquet dumped by graft.Verify: schema (column
names sorted), row count, and values (columns sorted by name, rows sorted,
exact for ints/strings, tight tolerance for floats).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb
import pyarrow.parquet as pq
import pandas as pd
from pathlib import Path

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: str(v.date()) if hasattr(v, "date") and not isinstance(v, str) else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def dtype_kind(dt) -> str:
    """Collapse a pandas dtype to the kind the driver's value-hash is
    sensitive to: int64 19525 vs float64 19525.0 stringify differently,
    so a DuckDB HUGEINT (materialized as float64 by pandas) against a
    Spark bigint is a driver hash mismatch even when cmp_vals passes.
    int widths (int32 vs int64) stringify identically, so they share a
    kind."""
    k = getattr(dt, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "object"

def cmp_vals(a, b):
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_path = Path(out_dir) / name
        if not spark_path.exists():
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            duck = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        spark = pq.read_table(str(spark_path)).to_pandas()
        s, d = norm(spark), norm(duck)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); n_fail += 1; continue
        kind_bad = [(c, dtype_kind(s[c].dtype), dtype_kind(d[c].dtype))
                    for c in s.columns
                    if dtype_kind(s[c].dtype) != dtype_kind(d[c].dtype)]
        if kind_bad:
            c, ks, kd = kind_bad[0]
            hint = (" (DuckDB sum() is HUGEINT -> pandas float64;"
                    " CAST(... AS BIGINT) in the oracle)"
                    if {ks, kd} == {"int", "float"} else "")
            print(f"FAIL {name}: dtype col={c} spark={ks} duck={kd}{hint}")
            n_fail += 1; continue
        bad = None
        for c in s.columns:
            for i, (x, y) in enumerate(zip(s[c], d[c])):
                if not cmp_vals(x, y):
                    bad = (c, i, x, y); break
            if bad: break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: value col={c} row={i} spark={x!r} duck={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
