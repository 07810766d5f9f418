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

def _kcore_edges(con):
    """The strong co-purchase edge set both graph oracles share."""
    con.execute("DROP TABLE IF EXISTS tmp_edges")
    con.execute("""CREATE TEMP TABLE tmp_edges AS
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2""")


def _kcore_peel(con, k, rounds, prefix):
    """Sequential temp-table replay of GraphOps.kcoreSql's unrolled CTE
    chain — identical round semantics, but each round MATERIALIZES, so
    DuckDB never plans the exponentially-nested join tree that exhausts
    temp disk at sf0.1 (the tri-scale-sweep ceiling). Returns the final
    survivor table name."""
    for i in range(0, rounds + 1):
        con.execute(f"DROP TABLE IF EXISTS {prefix}_n{i}")
    con.execute(f"CREATE TEMP TABLE {prefix}_n0 AS SELECT DISTINCT src AS pk FROM tmp_edges")
    for i in range(1, rounds + 1):
        con.execute(f"""CREATE TEMP TABLE {prefix}_n{i} AS
            SELECT e.src AS pk FROM tmp_edges e
            JOIN {prefix}_n{i-1} a ON a.pk = e.src
            JOIN {prefix}_n{i-1} b ON b.pk = e.dst
            GROUP BY 1 HAVING count(*) >= {k}""")
    return f"{prefix}_n{rounds}"


def _oracle_graph_kcore(con):
    _kcore_edges(con)
    last = _kcore_peel(con, k=3, rounds=6, prefix="kc")
    return con.execute(f"""
        SELECT e.src AS part_key, CAST(count(*) AS BIGINT) AS core_deg
        FROM tmp_edges e JOIN {last} a ON a.pk = e.src JOIN {last} b ON b.pk = e.dst
        GROUP BY 1""").fetchdf()


def _oracle_graph_coreness(con):
    _kcore_edges(con)
    # same final-membership guard as corenessSql: survivors with >= 1
    # in-core edge, per k tier, coreness = max surviving k
    tiers = []
    for k in range(1, 4):
        last = _kcore_peel(con, k=k, rounds=6, prefix=f"c{k}")
        tiers.append(f"""SELECT e.src AS pk, {k} AS k FROM tmp_edges e
            JOIN {last} a ON a.pk = e.src JOIN {last} b ON b.pk = e.dst GROUP BY 1""")
    union = "\nUNION ALL\n".join(tiers)
    return con.execute(f"""
        SELECT pk AS part_key, CAST(max(k) AS BIGINT) AS coreness
        FROM ({union}) GROUP BY 1""").fetchdf()


# Oracles whose single-statement form DuckDB cannot execute at sf0.1
# (unrolled fixpoint CTEs): the driver still runs the SQL string from
# oracle_sql.json; this dev harness replays the same rounds iteratively.
ITERATIVE_ORACLES = {
    "graph_kcore": _oracle_graph_kcore,
    "graph_coreness": _oracle_graph_coreness,
}

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
        if name in ITERATIVE_ORACLES:
            want = ITERATIVE_ORACLES[name](con)
        else:
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
