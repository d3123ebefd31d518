#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>

Loads each query's parquet dump (written by graft.Verify), runs the
corresponding oracle SQL from oracle_sql.json in DuckDB against views of
the same sf parquet tables, and compares: row count, column names/dtypes
(sorted by name), and values (exact; floats compared bitwise, with a
reported max-abs-diff on mismatch).

Driver-side tooling only (duckdb/pandas are not available to the Scala
library; this script never ships in the jar).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def load_spark(outdir, name):
    con = duckdb.connect()
    df = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
    con.close()
    return df


def main(sfdir, outdir):
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    ok, bad = [], []
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            bad.append((name, f"oracle SQL error: {e}"))
            continue
        try:
            got = load_spark(outdir, name)
        except Exception as e:
            bad.append((name, f"spark dump missing: {e}"))
            continue
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        errs = []
        if list(exp.columns) != list(got.columns):
            errs.append(f"columns: oracle={list(exp.columns)} spark={list(got.columns)}")
        if len(exp) != len(got):
            errs.append(f"rows: oracle={len(exp)} spark={len(got)}")
        if not errs:
            for c in exp.columns:
                e_, g_ = exp[c], got[c]
                if str(e_.dtype) != str(g_.dtype):
                    errs.append(f"dtype[{c}]: oracle={e_.dtype} spark={g_.dtype}")
                try:
                    same = e_.equals(g_)
                except Exception:
                    same = False
                if not same:
                    # report first diff row
                    diffs = [i for i in range(len(e_)) if not _eq(e_.iloc[i], g_.iloc[i])]
                    if diffs:
                        i = diffs[0]
                        errs.append(f"values[{c}]: {len(diffs)} diffs, first at row {i}: oracle={e_.iloc[i]!r} spark={g_.iloc[i]!r}")
        if errs:
            bad.append((name, "; ".join(errs)))
        else:
            ok.append(name)
    print(f"PASS {len(ok)}/{len(oracle)}: {' '.join(ok)}")
    for name, msg in bad:
        print(f"FAIL {name}: {msg}")
    # queries without oracle → rows-only
    import os
    for d in sorted(os.listdir(outdir)):
        if d not in oracle and not d.endswith(".json"):
            try:
                n = len(load_spark(outdir, d))
                print(f"ROWS-ONLY {d}: {n} rows")
            except Exception as e:
                print(f"ROWS-ONLY {d}: ERROR {e}")
    return 1 if bad else 0


def _eq(a, b):
    if pd.isna(a) and pd.isna(b):
        return True
    try:
        import numpy as np
        if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
            return np.array_equal(a, b)
    except Exception:
        pass
    return a == b


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
