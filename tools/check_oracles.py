#!/usr/bin/env python
"""Local pre-flight for the driver's correctness gate.

Usage: python tools/check_oracles.py SF_DIR VERIFY_OUT_DIR

Loads each VERIFY_OUT_DIR/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the SF_DIR tables,
normalizes (sort columns by name, sort rows), and reports exact-match status.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for compare: everything to string via repr of values
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
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
        if len(g) != len(x):
            print(f"FAIL {name}: rows {len(g)} vs {len(x)}")
            n_fail += 1
            continue
        # exact value compare, column by column
        bad = []
        for c in g.columns:
            a, b = g[c], x[c]
            try:
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    # BIT-pattern compare, like the driver's hash: catches
                    # the -0.0 vs +0.0 signed-zero class that float ==
                    # treats as equal (the r9 q154 failure mode)
                    import numpy as np
                    av = a.astype(float).fillna(-9e99).to_numpy()
                    bv = b.astype(float).fillna(-9e99).to_numpy()
                    eq = (av.view(np.int64) == bv.view(np.int64)).all()
                else:
                    eq = (a.astype(str) == b.astype(str)).all()
            except Exception:
                eq = (a.astype(str) == b.astype(str)).all()
            if not eq:
                bad.append(c)
        if bad:
            print(f"FAIL {name}: value mismatch in {bad}")
            for c in bad[:2]:
                m = (g[c].astype(str) != x[c].astype(str))
                print(f"  col {c}: first diffs (spark vs duckdb):")
                print(pd.DataFrame({"spark": g[c][m], "duck": x[c][m]}).head(5))
            n_fail += 1
        else:
            print(f"ok   {name} ({len(g)} rows)")
    print(f"\n{len(oracles) - n_fail}/{len(oracles)} matched")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
