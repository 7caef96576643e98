#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Reads the parquet dumps produced by graft.Verify plus oracle_sql.json,
runs each oracle in DuckDB against the same sf dir, and compares:
schema (column names), row count, and values (sorted by all columns,
exact match; floats compared both exactly and with 1e-9 reltol to
separate "hash would mismatch" from "genuinely wrong").

Usage: check_oracle.py OUTDIR SFDIR [--json PARITY_OUT]

With --json, also writes a machine-readable parity record:
{"sf": ..., "n_oracled": N, "n_match": M, "fails": [...], "warns": [...]}
— the artifact the sf0.1 parity sweep commits per round.
"""
import json, sys, math
import duckdb
import pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
json_out = None
if "--json" in sys.argv:
    i = sys.argv.index("--json")
    if i + 1 >= len(sys.argv):
        sys.exit("--json requires an output path")
    json_out = sys.argv[i + 1]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = 0
fail_names, warn_names = [], []
for name, sql in sorted(oracle.items()):
    try:
        got = pd.read_parquet(f"{outdir}/{name}")
    except Exception as e:
        print(f"FAIL {name}: no spark output ({e})"); fails += 1; fail_names.append(name); continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fails += 1; fail_names.append(name); continue
    if sorted(got.columns) != sorted(exp.columns):
        print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}")
        fails += 1; fail_names.append(name); continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; fail_names.append(name); continue
    g, e = canon(got), canon(exp)
    exact = True
    for c in g.columns:
        gv, ev = g[c], e[c]
        if gv.dtype != ev.dtype:
            # The driver's gate hashes value REPRESENTATIONS, so a kind
            # mismatch (int64 vs float64 from e.g. DuckDB HUGEINT sums,
            # "5" vs "5.0") IS a hash fail — flag it, don't coerce.
            # Same-kind width differences (int32 vs int64) render the
            # same text and are safe to align.
            if gv.dtype.kind != ev.dtype.kind:
                print(f"FAIL {name}: dtype {c}: {gv.dtype} vs {ev.dtype} "
                      f"(value-representation mismatch under the hash gate)")
                exact = False; break
            try:
                ev = ev.astype(gv.dtype)
            except Exception:
                print(f"FAIL {name}: dtype {c}: {gv.dtype} vs {ev.dtype}")
                exact = False; break
        if gv.dtype.kind == 'f':
            both_nan = gv.isna() & ev.isna()
            eq = (gv == ev) | both_nan
            if not eq.all():
                bad = (~eq)
                close = ((gv - ev).abs() <=
                         1e-9 * ev.abs().clip(lower=1.0)) | both_nan
                if close.all():
                    i = bad.idxmax()
                    print(f"WARN {name}: {c} close-but-not-exact "
                          f"e.g. {gv[i]!r} vs {ev[i]!r}")
                    if name not in warn_names:
                        warn_names.append(name)
                else:
                    i = (~close).idxmax()
                    print(f"FAIL {name}: {c} differs e.g. {gv[i]!r} vs {ev[i]!r}")
                exact = False
        else:
            eq = (gv == ev) | (gv.isna() & ev.isna())
            if not eq.all():
                i = (~eq).idxmax()
                print(f"FAIL {name}: {c} differs e.g. {gv[i]!r} vs {ev[i]!r}")
                exact = False
    if exact:
        print(f"OK   {name} ({len(got)} rows)")
    else:
        fails += 1
        fail_names.append(name)

print(f"\n{len(oracle) - fails}/{len(oracle)} oracled queries match")
if json_out:
    with open(json_out, "w") as f:
        json.dump({"sf": sfdir, "n_oracled": len(oracle),
                   "n_match": len(oracle) - fails,
                   "fails": fail_names, "warns": warn_names}, f, indent=1)
sys.exit(1 if fails else 0)
