#!/usr/bin/env python3
"""Sampled-oracle compare for the decade sweep's non-tractable tier
(round 15, r14 VERDICT #8).

At sf10-ind (500 k docs) some gates' FULL DuckDB oracles are themselves
quadratic-or-just-too-slow — the compare, not the engine, was the bound,
so those gates were pinned by completion only. This tool value-checks a
deterministic md5-selected subset so the decade claim becomes a hash
claim:

 - mode "docs" (per-row gates: one output row per doc, derived from that
   doc alone — winnow_fp, simhash, ...): restrict the DuckDB `documents`
   view to ids with md5('s15' || doc_id) starting below a hex threshold,
   run the gate's UNCHANGED oracle SQL from oracle_sql.json over the
   sampled view, and compare against the SAME md5-selected rows of the
   full Spark result. Sound exactly because the gate is per-row: each
   output row is a function of its own input row.

 - mode "pairs" (pair gates whose bucket guards make input sampling
   unsound — dedup_minhash, dedup_simhash): take the FULL Spark pair
   output, deterministically select up to --cap pairs by md5(a||'_'||b),
   and recompute each sampled pair's VALUE (exact 3-gram Jaccard /
   64-bit SimHash hamming — the same CTE logic as the full oracles,
   restricted to the pair's two docs) plus its threshold. This pins the
   signature math and the verification arithmetic at the decade;
   set-completeness stays pinned by the full hash-match at sf1-ind.

Usage:
  sampled_compare.py <sfDir> <verifyOutDir> <gate=mode,gate=mode,...>
      [--frac-hex 1] [--cap 2000]

where verifyOutDir is graft.Verify's output (per-gate parquet +
oracle_sql.json) produced against the SAME sfDir. frac-hex N keeps doc
ids whose md5 starts with a hex digit < N (N/16 of the corpus).
"""
import sys, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Set-wise per-pair value SQL, transcribed from the shared oracle CTEs
# (QueriesOracles.scala shinglesCte / simhashCtes) restricted to the
# sampled pairs' documents. Reads the temp table `pr(a, b)` — ONE query
# per gate (a per-pair loop re-scans the corpus parquet per row).
PAIR_JACCARD_SQL = r"""
WITH pids AS (SELECT a AS id FROM pr UNION SELECT b FROM pr),
t AS (SELECT doc_id AS id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents WHERE doc_id IN (SELECT id FROM pids)),
grams AS (
  SELECT id, unnest(list_distinct(list_transform(range(0, len(toks)-2),
           i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS gram
  FROM t WHERE len(toks) >= 3),
gsz AS (SELECT id, count(*)::DOUBLE AS sz FROM grams GROUP BY 1),
inter AS (SELECT pr.a, pr.b, count(*)::DOUBLE AS i
          FROM pr JOIN grams ga ON ga.id = pr.a
                  JOIN grams gb ON gb.id = pr.b AND gb.gram = ga.gram
          GROUP BY 1, 2)
SELECT inter.a, inter.b,
       round(inter.i / (sa.sz + sb.sz - inter.i), 4) AS v
FROM inter JOIN gsz sa ON sa.id = inter.a JOIN gsz sb ON sb.id = inter.b
"""

PAIR_HAMMING_SQL = r"""
WITH pids AS (SELECT a AS id FROM pr UNION SELECT b FROM pr),
t AS (SELECT doc_id AS id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents WHERE doc_id IN (SELECT id FROM pids)),
tf AS (SELECT id, term, count(*)::DOUBLE AS tf
       FROM (SELECT id, unnest(toks) AS term FROM t) GROUP BY 1, 2),
bits AS (
  SELECT id, p.pos,
         sum(CASE WHEN ((strpos('0123456789abcdef', substr(md5(term), ((p.pos-1)//4)+1, 1)) - 1)
                        >> (3 - ((p.pos-1)%4))) & 1 = 1
                  THEN tf ELSE -tf END) AS w
  FROM tf, (SELECT unnest(range(1, 65)) AS pos) p GROUP BY 1, 2),
sh AS (SELECT id, string_agg(CASE WHEN w > 0 THEN '1' ELSE '0' END, '' ORDER BY pos) AS sim
       FROM bits GROUP BY id)
SELECT pr.a, pr.b, list_sum(list_transform(range(1, 65),
    i -> CASE WHEN substr(sa.sim, i, 1) = substr(sb.sim, i, 1) THEN 0 ELSE 1 END))::BIGINT AS v
FROM pr JOIN sh sa ON sa.id = pr.a JOIN sh sb ON sb.id = pr.b
"""


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    sfdir, outdir, gatespec = sys.argv[1], sys.argv[2], sys.argv[3]
    frac_hex = 1
    cap = 2000
    args = sys.argv[4:]
    while args:
        if args[0] == "--frac-hex":
            frac_hex = int(args[1]); args = args[2:]
        elif args[0] == "--cap":
            cap = int(args[1]); args = args[2:]
        else:
            raise SystemExit(f"unknown arg {args[0]}")
    hexdigits = "0123456789abcdef"[:frac_hex]
    gates = [g.split("=") for g in gatespec.split(",") if g]

    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = fail = 0
    for name, mode in gates:
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"MISSING spark output: {name}"); fail += 1; continue
        sdf = pd.concat([pd.read_parquet(f) for f in files])
        con = duckdb.connect()
        for t in TABLES:
            if t == "documents" and mode == "docs":
                con.sql(f"""CREATE VIEW documents AS
                    SELECT * FROM '{sfdir}/documents.parquet'
                    WHERE substr(md5('s15' || CAST(doc_id AS VARCHAR)), 1, 1)
                          IN ({','.join(repr(h) for h in hexdigits)})""")
            else:
                try:
                    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
                except Exception:
                    pass  # decade dirs carry only the tables the gates use
        if mode == "docs":
            # sampled corpus through the UNCHANGED full oracle
            try:
                odf = con.sql(oracle[name]).df()
            except Exception as e:
                print(f"ORACLE SQL ERROR {name}: {e}"); fail += 1; continue
            ids = set(con.sql("SELECT doc_id FROM documents").df()["doc_id"])
            key = "id" if "id" in sdf.columns else "doc_id"
            s = norm(sdf[sdf[key].isin(ids)])
            o = norm(odf)
            if list(o.columns) != list(s.columns):
                print(f"SCHEMA MISMATCH {name}: oracle={list(o.columns)} spark={list(s.columns)}")
                fail += 1; continue
            if len(o) == 0:
                print(f"EMPTY SAMPLE {name}: 0 oracle rows at frac {frac_hex}/16 "
                      "— raise the fraction (a vacuous pass is not a check)")
                fail += 1; continue
            if len(o) != len(s):
                print(f"ROWCOUNT MISMATCH {name}: oracle={len(o)} spark={len(s)} "
                      f"(sampled {len(ids)} docs)"); fail += 1; continue
            if not o.equals(s):
                diff = (o != s).any(axis=1)
                print(f"VALUE MISMATCH {name}: {diff.sum()} differing rows")
                print("oracle:\n", o[diff].head(5).to_string())
                print("spark:\n", s[diff].head(5).to_string())
                fail += 1; continue
            ok += 1
            print(f"OK {name} [docs {frac_hex}/16] ({len(o)} sampled rows hash-match)", flush=True)
        elif mode in ("pair_jaccard", "pair_hamming"):
            import hashlib
            pairs = sdf.copy()
            pairs["_h"] = [hashlib.md5(f"{int(a)}_{int(b)}".encode()).hexdigest()
                           for a, b in zip(pairs["a"], pairs["b"])]
            pairs = pairs.sort_values("_h").head(cap)
            con.sql("CREATE TEMP TABLE pr (a BIGINT, b BIGINT)")
            con.executemany("INSERT INTO pr VALUES (?, ?)",
                            [(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])])
            tmpl = PAIR_JACCARD_SQL if mode == "pair_jaccard" else PAIR_HAMMING_SQL
            got = con.sql(tmpl).df().set_index(["a", "b"])["v"]
            bad = 0
            for _, row in pairs.iterrows():
                a, b = int(row["a"]), int(row["b"])
                if (a, b) not in got.index:
                    print(f"PAIR MISSING {name} ({a},{b}) in oracle recompute")
                    bad += 1; continue
                g = got.loc[(a, b)]
                if mode == "pair_jaccard":
                    want = float(row["jac"])
                    if abs(float(g) - want) > 1e-9 or float(g) < 0.8:
                        print(f"PAIR MISMATCH {name} ({a},{b}): spark jac={want} oracle={g}")
                        bad += 1
                else:
                    want = int(row["hamming"])
                    if int(g) != want or int(g) > 3:
                        print(f"PAIR MISMATCH {name} ({a},{b}): spark hamming={want} oracle={g}")
                        bad += 1
            if bad:
                fail += 1
            else:
                ok += 1
                print(f"OK {name} [{mode}] ({len(pairs)}/{len(sdf)} pairs value-checked)",
                      flush=True)
        else:
            print(f"UNKNOWN MODE {mode} for {name}"); fail += 1
        con.close()
    print(f"\n{ok} ok, {fail} failed")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
