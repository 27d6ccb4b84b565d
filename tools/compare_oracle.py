#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query in
<outDir>/oracle_sql.json, run the SQL in DuckDB over the sfDir parquet
tables and compare (rows, schema, values) against the Spark parquet dump
at <outDir>/<name>. Columns are sorted by name before value compare,
matching the driver's hash protocol."""
import json, sys, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        o = con.execute(sql).fetch_df()
        s = duckdb.connect().execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_df()
        o = o[sorted(o.columns)]
        s = s[sorted(s.columns)]
        schema_ok = list(o.columns) == list(s.columns)
        rows_ok = len(o) == len(s)
        def canon(df):
            return sorted(df.itertuples(index=False, name=None),
                          key=lambda t: tuple(str(x) for x in t))
        vals_ok = schema_ok and rows_ok and all(
            all((str(a) == str(b)) or
                (isinstance(a, float) and isinstance(b, float)
                 and abs(a - b) < 1e-12)
                for a, b in zip(ra, rb))
            for ra, rb in zip(canon(o), canon(s)))
        status = "OK  " if (schema_ok and rows_ok and vals_ok) else "FAIL"
        if status == "FAIL":
            fails += 1
        print(f"{status} {name}: spark_rows={len(s)} oracle_rows={len(o)} "
              f"schema={schema_ok} values={vals_ok}")
        if not schema_ok:
            print(f"     spark cols:  {list(s.columns)}")
            print(f"     oracle cols: {list(o.columns)}")
    except Exception as e:
        fails += 1
        print(f"ERR  {name}: {e}")
print(f"\n{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
