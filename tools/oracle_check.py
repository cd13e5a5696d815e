#!/usr/bin/env python3
"""Dev loop: compare Verify output parquet against the DuckDB oracle, the
same way the driver does (sort columns by name, sort rows, hash values).

usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [query ...]
"""
import hashlib
import json
import sys

import duckdb

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

oracle = json.load(open(f"{out}/oracle_sql.json"))
con = duckdb.connect()
for t in ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"):
    try:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    except Exception:
        pass


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=sorted(df.columns)).reset_index(drop=True)
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(repr(v) for v in row)).encode())
    return len(df), h.hexdigest(), df


for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        spark_df = duckdb.sql(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
    except Exception as e:
        print(f"{name:24s} NO-SPARK-OUTPUT {e}")
        continue
    try:
        ora_df = con.execute(sql).df()
    except Exception as e:
        print(f"{name:24s} ORACLE-SQL-ERROR {e}")
        continue
    n1, h1, d1 = canon(spark_df)
    n2, h2, d2 = canon(ora_df)
    ok = "OK " if (n1 == n2 and h1 == h2) else "MISMATCH"
    print(f"{name:24s} {ok} spark={n1} oracle={n2}")
    if ok != "OK " and not d1.empty and not d2.empty:
        cmp = d1.compare(d2) if (n1 == n2 and list(d1.columns) == list(d2.columns)) else None
        if cmp is not None and not cmp.empty:
            print(cmp.head(10))
        else:
            print("  spark :", d1.head(4).to_dict("records"))
            print("  oracle:", d2.head(4).to_dict("records"))
