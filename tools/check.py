#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify first
(writes <out>/<query>/ parquet + oracle_sql.json), then this script runs each
oracle SQL in DuckDB over the same sf tables and compares.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    got = con.execute(f"SELECT * FROM '{files[0]}'").fetchdf()
    if name not in oracle:
        print(f"ROWS-ONLY {name}: {len(got)} rows")
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fail += 1; continue
    # driver-style compare: sort columns by name, then rows, hash values
    gs = got.reindex(sorted(got.columns), axis=1)
    es = exp.reindex(sorted(exp.columns), axis=1)
    if list(gs.columns) != list(es.columns):
        print(f"FAIL {name}: columns {list(gs.columns)} vs {list(es.columns)}")
        fail += 1; continue
    if [str(t) for t in gs.dtypes] != [str(t) for t in es.dtypes]:
        print(f"WARN {name}: dtypes {list(map(str,gs.dtypes))} vs {list(map(str,es.dtypes))}")
    if len(gs) != len(es):
        print(f"FAIL {name}: rows {len(gs)} vs {len(es)}"); fail += 1; continue
    gs = gs.sort_values(by=list(gs.columns), ignore_index=True)
    es = es.sort_values(by=list(es.columns), ignore_index=True)
    if gs.equals(es):
        print(f"OK   {name}: {len(gs)} rows exact")
    else:
        neq = (gs != es) & ~(gs.isna() & es.isna())
        bad = neq.any(axis=0)
        print(f"FAIL {name}: value mismatch in cols {list(bad[bad].index)}")
        for c in bad[bad].index:
            i = neq[c].idxmax()
            print(f"   e.g. row {i} col {c}: got={gs[c][i]!r} exp={es[c][i]!r}")
        fail += 1
print("=" * 40)
print("ALL OK" if fail == 0 else f"{fail} FAILURES")
sys.exit(1 if fail else 0)
