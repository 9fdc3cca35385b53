#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dir (Spark output) and
<verifyOutDir>/oracle_sql.json, runs the oracle SQL in DuckDB against the
sfDir parquet tables, and compares: schema (column names), row count, and
values (columns sorted by name, rows sorted by all columns, exact match —
stricter than any plausible driver tolerance).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # list/array cells (e.g. collect_list results) aren't sortable/hashable
    # in pandas — canonicalize to tuples.
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple))
                     or hasattr(v, "tolist") and not pd.api.types.is_scalar(v)).any():
            df[c] = df[c].map(
                lambda v: tuple(v.tolist() if hasattr(v, "tolist") else v)
                if v is not None and not pd.api.types.is_scalar(v) else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = duckdb.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'", connection=con
            ).df()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        g, w = norm(got), norm(want)
        # dtype note: compare values, but flag dtype differences loudly
        dt_diff = [(c, str(g[c].dtype), str(w[c].dtype))
                   for c in g.columns if str(g[c].dtype) != str(w[c].dtype)]
        eq = True
        for c in g.columns:
            a, b = g[c], w[c]
            if not a.equals(b):
                try:
                    if (a.astype("object").where(pd.notna(a), None).tolist() ==
                            b.astype("object").where(pd.notna(b), None).tolist()):
                        continue
                except Exception:
                    pass
                eq = False
                mism = (a != b) & ~(pd.isna(a) & pd.isna(b))
                idx = mism[mism].index[:3]
                print(f"FAIL {name}: col {c} differs at rows {list(idx)}: "
                      f"{a.loc[idx].tolist()} vs {b.loc[idx].tolist()}")
                break
        if eq:
            tag = f" (dtype diff: {dt_diff})" if dt_diff else ""
            print(f"PASS {name}: {len(got)} rows{tag}")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
