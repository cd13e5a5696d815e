#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle gate (dev tool, not library code).

Usage: python3 tools/gate.py <verify_out_dir> <sf_dir>
Reads <verify_out_dir>/<name>.parquet (Spark results) + oracle_sql.json,
runs each oracle SQL in DuckDB over the sf parquet tables, and compares
rows / schema / value-hash with columns sorted by name (the driver's rule).
"""
import duckdb, json, glob, os, sys, hashlib

out, sf = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = os.path.join(sf, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}/*.parquet')"
                    if os.path.isdir(p) else
                    f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")

oracles = json.load(open(os.path.join(out, "oracle_sql.json")))

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted(tuple(str(v) for v in r) for r in df.itertuples(index=False, name=None))
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return cols, len(rows), h.hexdigest()

fails, results = 0, {}
dirs = [d for d in sorted(glob.glob(os.path.join(out, "*")))
        if os.path.isdir(d)]
for d in dirs:
    name = os.path.basename(d)
    if name.endswith(".parquet"):
        name = name[:-len(".parquet")]
    spark = con.execute(f"SELECT * FROM parquet_scan('{d}/*.parquet')").df()
    if name not in oracles:
        results[name] = {"err": "no_oracle", "spark_rows": len(spark)}
        continue
    try:
        ora = con.execute(oracles[name]).df()
    except Exception as e:
        results[name] = {"err": f"oracle_sql_error: {e}"}
        fails += 1
        continue
    sc, sn, sh = canon(spark)
    oc, on, oh = canon(ora)
    ok = sc == oc and sn == on and sh == oh
    results[name] = {"rows_match": sn == on, "schema_match": sc == oc,
                     "hash_match": sh == oh, "spark_rows": sn, "oracle_rows": on}
    if not ok:
        fails += 1
        print(f"FAIL {name}: spark cols={sc} rows={sn} | oracle cols={oc} rows={on}")

n_ok = sum(1 for r in results.values() if r.get("hash_match"))
n_no = sum(1 for r in results.values() if r.get("err") == "no_oracle")
print(json.dumps(results, indent=1))
print(f"== {n_ok} hash-exact, {n_no} no-oracle, {fails} FAIL ==")
sys.exit(1 if fails else 0)
