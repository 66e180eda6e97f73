#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracles.py <sfdir> <verify_out_dir>

Reads each <out>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB with the sf
tables registered as views, sorts columns by name then rows by all
columns, and compares values exactly (floats: bit-exact, with a
reported max-abs-diff fallback).
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd
import numpy as np

# object-dtype fillna downcasting warning (pandas 2.x) — the sentinel
# compare below is intentional object-dtype work
pd.set_option('future.no_silent_downcasting', True)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        try:
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            failures += 1
            continue
        ok = True
        for c in got.columns:
            g, w = got[c].to_numpy(), want[c].to_numpy()
            # Driver-strict dtype check: the driver hashes values without
            # coercion, so a DuckDB HUGEINT (sum() over BIGINT) that pandas
            # lands as float64 against Spark's int64 hash-FAILs there even
            # when the float compare below would pass. Mirror that: an
            # int-vs-float dtype split is a failure (fix: CAST the oracle
            # aggregate to BIGINT). Round-10 postmortem item #5.
            g_int = np.issubdtype(g.dtype, np.integer)
            w_int = np.issubdtype(w.dtype, np.integer)
            g_flt = np.issubdtype(g.dtype, np.floating)
            w_flt = np.issubdtype(w.dtype, np.floating)
            if (g_int and w_flt) or (g_flt and w_int):
                print(f"FAIL {name}.{c}: dtype {g.dtype} vs {w.dtype} "
                      f"(HUGEINT->float64 coercion? CAST the oracle to BIGINT)")
                ok = False
                continue
            if g_flt or w_flt:
                g = g.astype(float); w = w.astype(float)
                both_nan = np.isnan(g) & np.isnan(w)
                eq = (g == w) | both_nan
                if not eq.all():
                    d = np.nanmax(np.abs(g - w))
                    print(f"FAIL {name}.{c}: {int((~eq).sum())} mismatches, maxdiff={d:.3e}")
                    ok = False
            else:
                if not (pd.Series(g).astype(object).fillna("\0N") ==
                        pd.Series(w).astype(object).fillna("\0N")).all():
                    i = np.where(pd.Series(g).astype(object).fillna("\0N") !=
                                 pd.Series(w).astype(object).fillna("\0N"))[0][:3]
                    print(f"FAIL {name}.{c}: e.g. {g[i]} vs {w[i]}")
                    ok = False
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
        else:
            failures += 1
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
