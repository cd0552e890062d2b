#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables and compare (column-name-sorted, row-sorted)
against the parquet Verify dumped. Dev tool only — not part of the library."""
import sys, json, glob, math
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
import os
# larger-than-memory oracle runs (GenScale sf1): cap the working set
# and give DuckDB somewhere to spill; overridable via env
con.sql(f"SET memory_limit='{os.environ.get('CHECK_MEM', '24GB')}'")
con.sql(f"SET temp_directory='{os.environ.get('CHECK_TMP', '/tmp/duckdb_spill')}'")
con.sql(f"SET threads={os.environ.get('CHECK_THREADS', '16')}")
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    # driver data: one file per table; GenScale data: a Spark-written
    # directory of part files — glob both shapes
    p = f"{sf_dir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    if t == "events":
        # GenScale data stores ts as the RAW int64 (driver data carries
        # a parquet timestamp type) — surface it as TIMESTAMP with the
        # same magnitude-based unit pick graft.Tables.events makes
        dt = con.sql("DESCRIBE events").df()
        if dt.loc[dt["column_name"] == "ts", "column_type"].iloc[0] == "BIGINT":
            con.sql(
                "CREATE OR REPLACE VIEW events AS SELECT * REPLACE ("
                "make_timestamp(CASE WHEN ts > 50000000000000000 "
                f"THEN ts // 1000 ELSE ts END) AS ts) FROM '{src}'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracles.items()):
    try:
        exp = con.sql(sql).df()
        got = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        fails.append(name); continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
        fails.append(name); continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
        fails.append(name); continue
    exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    ok = True
    for c in exp.columns:
        e, g = exp[c], got[c]
        try:
            if e.dtype.kind == 'f' or g.dtype.kind == 'f':
                same = ((e.isna() & g.isna()) | (e == g))
            else:
                same = (e.astype(str) == g.astype(str))
            if not same.all():
                bad = (~same).idxmax()
                print(f"FAIL {name}: col {c} row {bad}: exp={e[bad]!r} got={g[bad]!r} (of {(~same).sum()} diffs)")
                ok = False; break
        except Exception as ex:
            print(f"FAIL {name}: col {c} compare error {ex}"); ok = False; break
    if ok:
        print(f"PASS {name} ({len(exp)} rows)")
    else:
        fails.append(name)

# queries with no oracle: rows-only check
for p in sorted(glob.glob(f"{out_dir}/*/")):
    name = p.rstrip('/').split('/')[-1]
    if name not in oracles:
        n = duckdb.sql(f"SELECT count(*) FROM '{p}*.parquet'").fetchone()[0]
        print(f"ROWS {name}: {n}")

print(f"\n{len(oracles)-len(fails)}/{len(oracles)} oracle-checked queries pass")
sys.exit(1 if fails else 0)
