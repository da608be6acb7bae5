#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: runs each oracle SQL in
DuckDB against the sf tables and compares (sorted columns, sorted rows, value
hash) with the Verify parquet dumps. Usage: selfcheck.py <sfDir> <verifyOut>"""
import sys, json, glob, os
import duckdb, pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
# Big-SF knobs (r18, the sf10 gate): DuckDB's default memory cap is 80%
# of RAM, which OOM-killed the whole run on a 60M-row join oracle, and
# its default temp dir is ./.tmp on whatever (possibly small) partition
# cwd sits on. All unset => behavior identical to the driver's runs.
if os.environ.get("GRAFT_DUCKDB_MEMORY"):
    con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEMORY']}'")
if os.environ.get("GRAFT_DUCKDB_TEMP"):
    os.makedirs(os.environ["GRAFT_DUCKDB_TEMP"], exist_ok=True)
    con.execute(f"SET temp_directory='{os.environ['GRAFT_DUCKDB_TEMP']}'")
only = set(os.environ["GRAFT_SELFCHECK_ONLY"].split(",")) \
    if os.environ.get("GRAFT_SELFCHECK_ONLY") else None
# r19 (sf10_gate.sh): names whose oracle is replayed by a SUBSTITUTE
# checker at big SF (tools/bigsf_oracles.py) — excluded here so the gate
# is one command; validated like ONLY so a typo cannot silently skip a
# real check
exclude = set(os.environ["GRAFT_SELFCHECK_EXCLUDE"].split(",")) \
    if os.environ.get("GRAFT_SELFCHECK_EXCLUDE") else set()
verbose = bool(os.environ.get("GRAFT_SELFCHECK_VERBOSE"))
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
# ADVICE r18 #3: a typo'd GRAFT_SELFCHECK_ONLY (or _EXCLUDE) name silently
# matched nothing and exited 0 ("0 ok, 0 failed" read as a pass) — both
# validate against the FULL oracle key set, before any filtering
for label, names in (("ONLY", only), ("EXCLUDE", exclude)):
    unknown = (names or set()) - oracle.keys()
    if unknown:
        print(f"ERROR: GRAFT_SELFCHECK_{label} names not in oracle_sql.json: "
              f"{sorted(unknown)}")
        sys.exit(2)
if only:
    oracle = {k: v for k, v in oracle.items() if k in only}
if exclude:
    print(f"excluding {sorted(exclude & oracle.keys())} "
          f"(substitute oracle replays them)")
    oracle = {k: v for k, v in oracle.items() if k not in exclude}
ok = fail = 0
for name, sql in sorted(oracle.items()):
    d = f"{out_dir}/{name}"
    if not os.path.isdir(d):
        print(f"MISSING  {name} (no parquet dump)"); fail += 1; continue
    try:
        got = pd.concat([pq.read_table(f).to_pandas()
                         for f in sorted(glob.glob(f"{d}/*.parquet"))])
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"ERROR    {name}: {e}"); fail += 1; continue
    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df.map(lambda v: f"{v:.6f}" if isinstance(v, float) else str(v))
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        print(f"SCHEMA   {name}: got {list(g.columns)} vs {list(e.columns)}"); fail += 1
    elif len(g) != len(e):
        print(f"ROWS     {name}: got {len(g)} vs {len(e)}"); fail += 1
    elif not g.equals(e):
        diff = (g != e).any(axis=1)
        print(f"VALUES   {name}: first diff rows:\n  got {g[diff].head(3).to_dict('records')}\n  exp {e[diff].head(3).to_dict('records')}")
        fail += 1
    else:
        ok += 1
        if verbose:
            print(f"ok       {name}", flush=True)
print(f"\n{ok} ok, {fail} failed of {len(oracle)}")
sys.exit(1 if fail else 0)
