#!/usr/bin/env python3
"""Local approximation of the driver's DuckDB-oracle compare.

Usage: check_oracle.py <verify_out_dir> <sf_dir>
Loads each <name>/ parquet result, runs oracle_sql.json[name] in DuckDB
with the sf tables registered as views, sorts columns by name and rows
by all values, and diffs.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    res_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not res_files:
        print(f"FAIL {name}: no spark result"); fails.append(name); continue
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in res_files])
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails.append(name); continue
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    s, d = norm(spark_df), norm(duck_df)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: cols spark={list(s.columns)} duck={list(d.columns)}")
        fails.append(name); continue
    # the driver hashes typed values: a DuckDB HUGEINT (int128 — lands
    # as float64/object in pandas) against a Spark int64 hash-mismatches
    # even when every value is equal (rounds 1-4: q70/q79). Int WIDTH
    # differences (int32 vs int64) are fine — the driver normalizes
    # those (q29/q39 etc. are hash-green) — so only a numpy-KIND drift
    # (int vs float vs object) is flagged.
    for c in s.columns:
        sk = getattr(s[c].dtype, "kind", "O")
        dk = getattr(d[c].dtype, "kind", "O")
        if sk != dk:
            print(f"TYPEWARN {name}.{c}: spark={s[c].dtype} duck={d[c].dtype} "
                  f"(HUGEINT leak? CAST the oracle column)")
            fails.append(name)
    if name in fails:
        continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
        fails.append(name); continue
    try:
        pd.testing.assert_frame_equal(s, d, check_dtype=False,
                                      check_exact=False, rtol=0, atol=1e-9)
        print(f"OK   {name} ({len(s)} rows)")
    except AssertionError as e:
        print(f"FAIL {name}: {str(e).splitlines()[-1] if str(e) else 'diff'}")
        fails.append(name)
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} OK")
sys.exit(1 if fails else 0)
