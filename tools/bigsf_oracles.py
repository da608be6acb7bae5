#!/usr/bin/env python3
"""Substitute oracle replays for the two gate rows whose deliberately-naive
DuckDB oracles are infeasible at big SF (documented in BASELINE.md r18,
"sf10 FULL correctness gate"):

- p06_label_affinity: the naive all-pairs cosine join expands to ~1.3e12
  intermediate rows at 200k vectors. Replayed via the IDENTITY FORM:
  mean pairwise cosine over unit vectors u = (|sum u|^2 - n) / (n(n-1)),
  O(n*d) instead of O(n^2*d). At small SF the driver's naive oracle
  independently validates this identity, so substituting it at big SF
  checks the engine against the SAME ground truth.

- p07_minhash_lsh: the exact-Jaccard gram self-join is quadratic in gram
  frequency (stopword bigrams appear in ~1e3 docs per replica). Replayed
  via the REPLICATION STRUCTURE: graft.ScaleUp salts every token with
  the replica number (a bijection on tokens, so within-replica Jaccard
  is preserved EXACTLY) and strides doc ids by 1e9 — the scaled truth IS
  the source-dir naive oracle expanded factor-x with the stride. The
  source-dir oracle stays the driver's own naive SQL, verbatim.

Usage: bigsf_oracles.py <srcSfDir> <scaledSfDir> <verifyOut> <factor>
Exit 0 = both rows match the Verify parquet dumps (same canonicalization
as tools/selfcheck.py: sorted columns, sorted rows, floats at 6 digits).
"""
import sys, json, glob, os
import duckdb, pyarrow.parquet as pq
import pandas as pd

src_dir, scaled_dir, out_dir, factor = (
    sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4]))
STRIDE = 1000000000  # graft.ScaleUp.Stride

con = duckdb.connect()
if os.environ.get("GRAFT_DUCKDB_MEMORY"):
    con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEMORY']}'")
if os.environ.get("GRAFT_DUCKDB_TEMP"):
    os.makedirs(os.environ["GRAFT_DUCKDB_TEMP"], exist_ok=True)
    con.execute(f"SET temp_directory='{os.environ['GRAFT_DUCKDB_TEMP']}'")

# p06: identity-form mean pairwise cosine per label, on the SCALED table
P06_SQL = f"""
WITH e AS (SELECT vec_id, label, CAST(UNNEST(embedding) AS DOUBLE) AS v,
                  generate_subscripts(embedding, 1) AS i
           FROM read_parquet('{scaled_dir}/embeddings.parquet')),
     nrm AS (SELECT label, i,
                    v / SQRT(SUM(v * v) OVER (PARTITION BY vec_id)) AS u
             FROM e),
     s AS (SELECT label, i, SUM(u) AS su FROM nrm GROUP BY label, i),
     mag AS (SELECT label, SUM(su * su) AS s2 FROM s GROUP BY label),
     cnt AS (SELECT label, COUNT(*) AS n
             FROM read_parquet('{scaled_dir}/embeddings.parquet')
             GROUP BY label)
SELECT c.label AS label,
       ROUND((m.s2 - c.n) / (c.n * (c.n - 1.0)), 4) + 0.0 AS avg_cosine,
       CAST(c.n * (c.n - 1) // 2 AS BIGINT) AS pair_cnt
FROM cnt c JOIN mag m USING (label) ORDER BY label
"""

# p07: the driver's own naive oracle over the SOURCE dir, expanded
# factor-x with the id stride (replication-structure replay)
P07_SQL = f"""
WITH words AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
               FROM read_parquet('{src_dir}/documents.parquet')),
     pos AS (SELECT doc_id, UNNEST(w) AS word,
                    generate_subscripts(w, 1) AS i FROM words),
     grams AS (SELECT DISTINCT a.doc_id, a.word || ' ' || b.word AS g
               FROM pos a JOIN pos b
                 ON a.doc_id = b.doc_id AND b.i = a.i + 1),
     sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
     common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
                FROM grams a JOIN grams b
                  ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
     base AS (SELECT d1, d2,
                     ROUND(CAST(c AS DOUBLE) / (s1.sz + s2.sz - c), 4)
                       AS jaccard
              FROM common
              JOIN sizes s1 ON d1 = s1.doc_id
              JOIN sizes s2 ON d2 = s2.doc_id
              WHERE CAST(c AS DOUBLE) / (s1.sz + s2.sz - c) >= 0.9)
SELECT d1 + r.range * {STRIDE} AS d1, d2 + r.range * {STRIDE} AS d2, jaccard
FROM base CROSS JOIN range({factor}) r ORDER BY d1, d2
"""


def canon(df):
    # identical to tools/selfcheck.py
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df.map(lambda v: f"{v:.6f}" if isinstance(v, float) else str(v))


def check(name, sql):
    d = f"{out_dir}/{name}"
    if not os.path.isdir(d):
        print(f"MISSING  {name} (no parquet dump)")
        return False
    got = pd.concat([pq.read_table(f).to_pandas()
                     for f in sorted(glob.glob(f"{d}/*.parquet"))])
    exp = con.execute(sql).df()
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        print(f"SCHEMA   {name}: got {list(g.columns)} vs {list(e.columns)}")
        return False
    if len(g) != len(e):
        print(f"ROWS     {name}: got {len(g)} vs {len(e)}")
        return False
    if not g.equals(e):
        diff = (g != e).any(axis=1)
        print(f"VALUES   {name}: first diff rows:\n"
              f"  got {g[diff].head(3).to_dict('records')}\n"
              f"  exp {e[diff].head(3).to_dict('records')}")
        return False
    print(f"ok       {name} ({len(g)} rows, substitute replay)", flush=True)
    return True


ok6 = check("p06_label_affinity", P06_SQL)
ok7 = check("p07_minhash_lsh", P07_SQL)
print(f"\n{int(ok6) + int(ok7)} ok, {2 - int(ok6) - int(ok7)} failed of 2 "
      f"(substitute replays)")
sys.exit(0 if ok6 and ok7 else 1)
