#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Loads <verifyOutDir>/oracle_sql.json, registers each parquet table of
<sfDir> as a DuckDB view, runs every oracle query, and compares it
value-by-value (columns sorted by name, exact equality after string
normalization) against the Spark parquet dump the Verify main wrote.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_repr(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = rel.fetchall()
    return [cols[i] for i in order], [
        tuple(norm_cell(r[i]) for i in order) for r in rows]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            o_cols, o_rows = table_repr(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}")
            n_bad += 1
            continue
        try:
            s_cols, s_rows = table_repr(
                con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {str(e).splitlines()[0]}")
            n_bad += 1
            continue
        if o_cols != s_cols:
            print(f"FAIL {name}: columns differ spark={s_cols} oracle={o_cols}")
            n_bad += 1
            continue
        if len(o_rows) != len(s_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} oracle={len(o_rows)}")
            n_bad += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows))
               if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(o_rows)} rows differ; "
                  f"first at {i}:\n  spark : {a}\n  oracle: {b}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(o_rows)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} failed ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
