#!/usr/bin/env python
"""sf0.1 oracle check for the scale-sensitive gate subset (r12 verdict #2).

Same normalize-and-compare as check_oracles.py, but sequential with
unbuffered per-query progress, a memory/temp-bounded DuckDB connection
(the suffix oracles spill hundreds of GB unbounded), and a per-query
wall-clock report so pathological oracles are identified instead of
silently hanging the whole run.

Usage: python tools/check_oracles_sf01.py SF_DIR OUT_DIR [query ...]
"""
import json
import sys
import time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    names = sys.argv[3:] or sorted(oracles)
    n_fail = 0
    for name in names:
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception:
            continue  # not in this Verify subset
        con = duckdb.connect()  # fresh connection: bounded, isolated spill
        con.execute("SET memory_limit='48GB'")
        con.execute("SET temp_directory='/tmp/duck_sf01_spill'")
        con.execute("SET max_temp_directory_size='60GB'")
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        t0 = time.time()
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error after {time.time()-t0:.0f}s: {e}",
                  flush=True)
            n_fail += 1
            con.close()
            continue
        con.close()
        g, x = norm(got), norm(exp)
        if list(g.columns) != list(x.columns) or len(g) != len(x):
            print(f"FAIL {name}: shape {g.shape} vs {x.shape}", flush=True)
            n_fail += 1
            continue
        bad = []
        for c in g.columns:
            a, b = g[c], x[c]
            try:
                import numpy as np
                if np.issubdtype(a.dtype, np.floating) or \
                   np.issubdtype(b.dtype, np.floating):
                    same = np.allclose(a.astype(float), b.astype(float),
                                       rtol=0, atol=1e-9, equal_nan=True)
                else:
                    same = a.astype(str).equals(b.astype(str))
            except Exception:
                same = a.astype(str).equals(b.astype(str))
            if not same:
                bad.append(c)
        if bad:
            print(f"FAIL {name}: value mismatch in {bad}", flush=True)
            n_fail += 1
        else:
            print(f"ok   {name} ({len(g)} rows, oracle {time.time()-t0:.0f}s)",
                  flush=True)
    print(f"{'ALL GREEN' if n_fail == 0 else f'{n_fail} FAILED'}", flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
