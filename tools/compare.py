#!/usr/bin/env python3
"""Local replica of the driver's correctness compare: for each query dumped
by graft.Verify, run the oracle SQL in DuckDB over the same sf parquet
tables and compare rows/schema/hash. Usage: compare.py <sfDir> <verifyDir> [query...]"""
import sys, json, glob, hashlib
import duckdb, pandas as pd

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
oracle = json.load(open(f"{out}/oracle_sql.json"))
con = duckdb.connect()
tables = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]
for t in tables:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

results = {}
for name in sorted(oracle):
    if only and name not in only: continue
    try:
        spark_df = pd.concat([pd.read_parquet(p) for p in
                              sorted(glob.glob(f"{out}/{name}/*.parquet"))],
                             ignore_index=True)
        ora_df = con.execute(oracle[name]).fetchdf()
        rows = len(spark_df) == len(ora_df)
        schema = sorted(spark_df.columns) == sorted(ora_df.columns)
        a, b = canon(spark_df), canon(ora_df)
        h = lambda d: hashlib.md5(pd.util.hash_pandas_object(d.astype(str), index=False).values.tobytes()).hexdigest()
        match = rows and schema and h(a) == h(b)
        results[name] = dict(rows=(len(spark_df), len(ora_df)), schema=schema, match=bool(match))
        if not match and rows and schema:
            diff = a.astype(str).compare(b.astype(str)) if len(a)==len(b) else None
            if diff is not None and len(diff):
                results[name]["first_diff"] = diff.head(3).to_dict()
    except Exception as e:
        results[name] = dict(err=str(e)[:300])
for k, v in results.items():
    status = "OK " if v.get("match") else "FAIL"
    print(status, k, v if not v.get("match") else v["rows"])
