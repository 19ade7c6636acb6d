#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/verify_local.py [sfDir] [outDir]

Reads outDir/<name>/ parquet (written by graft.Verify) and
outDir/oracle_sql.json, runs each oracle in DuckDB with views over the
same sfDir parquet tables, and compares: column names (sorted), row
counts, and values (rows sorted, exact match; floats reported with
max-abs-diff when not exactly equal).
"""
import sys, json, glob, math

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        return v
    return v


def compare(name, spark_df, oracle_df):
    sc = sorted(spark_df.columns)
    oc = sorted(oracle_df.columns)
    if sc != oc:
        return f"SCHEMA mismatch: spark={sc} oracle={oc}"
    s = spark_df[sc].copy()
    o = oracle_df[oc].copy()
    if len(s) != len(o):
        return f"ROWS mismatch: spark={len(s)} oracle={len(o)}"
    if len(s) == 0:
        return None
    # sort rows by all columns (stringified for mixed types)
    skey = s.astype(str).agg("|".join, axis=1)
    okey = o.astype(str).agg("|".join, axis=1)
    s = s.iloc[skey.argsort(kind="mergesort")].reset_index(drop=True)
    o = o.iloc[okey.argsort(kind="mergesort")].reset_index(drop=True)
    bad = []
    for c in sc:
        sv, ov = s[c], o[c]
        # the driver hashes STRINGIFIED values, so int64 2048 vs
        # float64 2048.0 is a hash mismatch even though == says equal
        # (the round-4 q54/q76 DuckDB-HUGEINT trap) — flag diverging
        # dtype kinds as a failure here too
        s_int = pd.api.types.is_integer_dtype(sv)
        o_int = pd.api.types.is_integer_dtype(ov)
        s_flt = pd.api.types.is_float_dtype(sv)
        o_flt = pd.api.types.is_float_dtype(ov)
        if (s_int and o_flt) or (s_flt and o_int):
            bad.append(
                f"col {c}: DTYPE kind mismatch spark={sv.dtype} "
                f"oracle={ov.dtype} (stringified hash would differ)")
            continue
        try:
            eq = (sv.values == ov.values) | (sv.isna().values & ov.isna().values)
        except Exception:
            eq = sv.astype(str).values == ov.astype(str).values
        if not eq.all():
            n_bad = int((~eq).sum())
            detail = ""
            if pd.api.types.is_float_dtype(sv) and pd.api.types.is_float_dtype(ov):
                d = (sv - ov).abs().max()
                detail = f" max_abs_diff={d}"
            i = int((~eq).argmax())
            detail += f" first_bad: spark={sv.iloc[i]!r} oracle={ov.iloc[i]!r}"
            bad.append(f"col {c}: {n_bad} diffs{detail}")
    if bad:
        return "VALUES mismatch: " + "; ".join(bad)
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            import os
            err_file = f"{out_dir}/{name}/ERROR.txt"
            if os.path.exists(err_file):
                print(f"FAIL {name}: query threw: {open(err_file).read().strip()[:200]}")
            else:
                print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            oracle_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        err = compare(name, spark_df, oracle_df)
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
