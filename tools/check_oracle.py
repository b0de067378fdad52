#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, runs the recorded oracle SQL in
DuckDB over the same parquet fixtures and compares: row count, column
names, and values (columns sorted by name, rows sorted by all columns,
floats rounded). Dev-only tool — not part of the shipped library.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        canon_row = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    canon_row.append("NaN")
                else:
                    canon_row.append(round(v, 6))
            elif isinstance(v, list):
                canon_row.append(tuple(round(x, 6) if isinstance(x, float) else x for x in v))
            else:
                canon_row.append(v)
        out.append(tuple(canon_row))
    return sorted(out, key=repr)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [c[0] for c in got_rel.description]
            got = got_rel.fetchall()
            exp_rel = con.execute(sql)
            exp_cols = [c[0] for c in exp_rel.description]
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            n_fail += 1
            continue
        # reorder both to sorted column order
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = canon([[r[i] for i in gidx] for r in got])
        e = canon([[r[i] for i in eidx] for r in exp])
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}")
            n_fail += 1
        elif g != e:
            diffs = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"FAIL {name}: values differ, first diffs: {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len(oracle)} oracle-checked")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
