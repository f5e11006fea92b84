#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py /tmp/verify_out /root/testdata/sf0.01
Loads each <out>/<name> parquet dir (Spark result), runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB against the sf tables,
sorts columns by name and rows by all columns, and diffs values exactly.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = []
# A gate that CRASHED in Verify writes no output dir at all — without this
# guard the loop below silently skips it and the run reads ALL GREEN on a
# failure (seen r15: datalog_pull_recursive crashed under a bare-java
# launch and the subset check still passed). Verify writes gates.json —
# the list of gates it actually ATTEMPTED (including rows-only gates with
# no oracle entry; ADVICE r15) — so that is the expected set; fall back to
# SPARK_GRAFT_ONLY / the oracle keys for outputs from older Verify builds.
gates_path = os.path.join(out_dir, "gates.json")
only = os.environ.get("SPARK_GRAFT_ONLY")
if os.path.exists(gates_path):
    expected = set(json.load(open(gates_path)))
elif only:
    expected = set(x.strip() for x in only.split(",") if x.strip())
else:
    expected = set(oracle.keys())
present = {n for n in os.listdir(out_dir)
           if os.path.isdir(os.path.join(out_dir, n))}
for name in sorted(expected - present):
    print(f"!! {name}: no output directory (gate crashed in Verify?)")
    fails.append(name)
for name in sorted(os.listdir(out_dir)):
    path = os.path.join(out_dir, name)
    if not os.path.isdir(path):
        continue
    files = glob.glob(f"{path}/*.parquet")
    if not files:
        print(f"!! {name}: no parquet written"); fails.append(name); continue
    got = canon(con.execute(f"SELECT * FROM '{path}/*.parquet'").fetchdf())
    if name not in oracle:
        print(f"ok {name}: rows-only ({len(got)} rows)")
        if len(got) == 0:
            print(f"   WARNING {name}: 0 rows");
        continue
    try:
        exp = canon(con.execute(oracle[name]).fetchdf())
    except Exception as e:
        print(f"!! {name}: oracle SQL error: {e}"); fails.append(name); continue
    if list(got.columns) != list(exp.columns):
        print(f"!! {name}: columns differ got={list(got.columns)} exp={list(exp.columns)}")
        fails.append(name); continue
    if len(got) != len(exp):
        print(f"!! {name}: row count got={len(got)} exp={len(exp)}")
        fails.append(name); continue
    bad = False
    for c in got.columns:
        g, e = got[c], exp[c]
        try:
            same = (g.astype(str) == e.astype(str))
        except Exception:
            same = g == e
        if not same.all():
            idx = (~same).idxmax()
            print(f"!! {name}.{c}: {int((~same).sum())}/{len(g)} mismatched; "
                  f"first at row {idx}: got={g[idx]!r} exp={e[idx]!r}")
            bad = True
    if bad:
        fails.append(name)
    else:
        print(f"OK {name}: {len(got)} rows exact-match")

print()
print(f"{'FAIL: ' + ', '.join(fails) if fails else 'ALL GREEN'}")
sys.exit(1 if fails else 0)
