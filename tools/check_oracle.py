#!/usr/bin/env python3
"""Dev-time mirror of the driver's correctness gate: load each Verify output
parquet, run the corresponding oracle SQL in DuckDB over the same sf tables,
and compare as sorted multisets (columns sorted by name, rows sorted).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pathlib

sf = pathlib.Path(sys.argv[1])
out = pathlib.Path(sys.argv[2])

con = duckdb.connect()
for p in sf.glob("*.parquet"):
    con.execute(f"CREATE VIEW {p.stem} AS SELECT * FROM read_parquet('{p}')")

oracle = json.loads((out / "oracle_sql.json").read_text())

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for r in df.itertuples(index=False):
        row = []
        for v in r:
            if isinstance(v, float):
                row.append(round(v, 9))
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return cols, sorted(map(str, rows))

fails = 0
for name in sorted(oracle):
    d = out / name
    files = list(d.glob("*.parquet")) if d.exists() else []
    if not files:
        print(f"MISSING  {name}: no verify output")
        fails += 1
        continue
    got = pq.read_table(files[0]).to_pandas()
    try:
        want = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}")
        fails += 1
        continue
    gc, gr = canon(got)
    wc, wr = canon(want)
    if gc != wc:
        print(f"SCHEMA   {name}: spark={gc} duckdb={wc}")
        fails += 1
    elif gr != wr:
        diff_g = [r for r in gr if r not in set(wr)][:3]
        diff_w = [r for r in wr if r not in set(gr)][:3]
        print(f"ROWS     {name}: spark={len(gr)} duckdb={len(wr)} "
              f"only-spark={diff_g} only-duckdb={diff_w}")
        fails += 1
    else:
        print(f"OK       {name}: {len(gr)} rows")

# rows-only queries (no oracle): just report counts
names_with_oracle = set(oracle)
for d in sorted(out.iterdir()):
    if d.is_dir() and d.name not in names_with_oracle:
        files = list(d.glob("*.parquet"))
        n = pq.read_table(files[0]).num_rows if files else -1
        print(f"ROWSONLY {d.name}: {n} rows")

sys.exit(1 if fails else 0)
