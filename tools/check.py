#!/usr/bin/env python3
"""Dev-only harness replicating the driver's t2 correctness gate.

Runs `graft.Verify` output (parquet per query + oracle_sql.json) against
DuckDB on the same testdata parquet, compares sorted rows. NOT part of the
Scala library — development feedback loop only.

Usage: python3 tools/check.py [sfDir] [outDir] [keys...]
"""
import sys, json, glob, os
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
only = set(sys.argv[3:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails, passes, skips = [], [], []
for name in sorted(oracle):
    if only and name not in only:
        continue
    sql = oracle[name]
    pq = f"{out}/{name}"
    if not glob.glob(f"{pq}/*.parquet"):
        fails.append((name, "no spark output"))
        continue
    try:
        got = con.execute(f"SELECT * FROM '{pq}/*.parquet'").fetchdf()
    except Exception as e:
        fails.append((name, f"read spark output: {e}"))
        continue
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle sql error: {e}"))
        continue
    # driver compare: sort columns by name, sort rows, hash values
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        fails.append((name, f"columns differ: spark={list(got.columns)} duckdb={list(want.columns)}"))
        continue
    if len(got) != len(want):
        fails.append((name, f"row count: spark={len(got)} duckdb={len(want)}"))
        continue
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    try:
        import pandas as pd

        # Dtype FAMILY must match: the driver's value hash is dtype-
        # sensitive (int64 1 != float64 1.0), so an oracle column that
        # DuckDB widened (e.g. windowed sum(BIGINT) -> HUGEINT, rendered
        # float64 by pandas) against a Spark int64 must FAIL here even
        # though numpy == would coerce and pass. int32 vs int64 is fine
        # (same family); int vs float is the driver-visible failure.
        def family(dt):
            k = dt.kind
            if k in "iu":
                return "int"
            if k == "f":
                return "float"
            if k == "b":
                return "bool"
            if k == "M":
                return "datetime"
            return "other"

        eq = True
        detail = ""
        for c in gs.columns:
            a, b = gs[c], ws[c]
            fa, fb = family(a.dtype), family(b.dtype)
            if fa != fb:
                eq = False
                detail += f" col {c} dtype family mismatch: spark={a.dtype} duckdb={b.dtype};"
                continue
            try:
                same = (a.isna() == b.isna()).all() and (a.dropna().values == b.dropna().values).all()
            except Exception:
                same = False
            if not same:
                eq = False
                mism = (a.fillna("<NA>").astype(str) != b.fillna("<NA>").astype(str))
                idx = mism[mism].index[:3].tolist()
                detail += f" col {c} first diffs at rows {idx}: spark={[a.iloc[i] for i in idx]} duckdb={[b.iloc[i] for i in idx]};"
        if eq:
            passes.append(name)
        else:
            fails.append((name, "values differ:" + detail))
    except Exception as e:
        fails.append((name, f"compare error: {e}"))

# queries with no oracle (rows-only check)
for d in sorted(glob.glob(f"{out}/*/")):
    name = os.path.basename(d.rstrip("/"))
    if name not in oracle and (not only or name in only):
        n = con.execute(f"SELECT count(*) FROM '{d}*.parquet'").fetchone()[0]
        (passes if n > 0 else fails).append((f"{name} [rows-only: {n}]", "0 rows")[0:1][0] if n > 0 else (name, "rows-only: 0 rows"))

print(f"\n== {len(passes)} PASS, {len(fails)} FAIL ==")
for p in passes:
    print(f"  PASS {p}")
for name, why in fails:
    print(f"  FAIL {name}: {why}")
sys.exit(1 if fails else 0)
