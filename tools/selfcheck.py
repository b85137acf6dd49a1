#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate.

Usage: python3 tools/selfcheck.py <verify_out_dir> <sf_dir> [query ...]

Runs each oracle SQL from <verify_out_dir>/oracle_sql.json in DuckDB over
the parquet tables in <sf_dir>, loads the Spark result parquet from
<verify_out_dir>/<name>/, and compares rows / column names / values
(columns sorted by name, rows sorted, floats rounded to 6 sig places).
This is tooling for the build loop only — the library itself has no
Python or DuckDB dependency.
"""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0"
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    failed = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            cur = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols = [d[0] for d in cur.description]
            srows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failed.append(name)
            continue
        oc, orows = canon(ocols, orows)
        sc, srows = canon(scols, srows)
        if sc != oc:
            print(f"FAIL {name}: schema spark={sc} oracle={oc}")
            failed.append(name)
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            failed.append(name)
        elif srows != orows:
            diff = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
            print(f"FAIL {name}: values differ at sorted row {diff}:\n"
                  f"  spark : {srows[diff]}\n  oracle: {orows[diff]}")
            failed.append(name)
        else:
            print(f"ok   {name} ({len(srows)} rows)")
    n = len([k for k in oracle if not only or k in only])
    print(f"\n{n - len(failed)}/{n} pass")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
