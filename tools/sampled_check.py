#!/usr/bin/env python3
"""Sampled oracle for the by-design-quadratic dedup oracles at big SF
(driver-side tooling, like check.py — NOT part of the shipped library).

The scale replicas built by tools/scale_up.py guarantee CLOSURE of the
similarity relations under replica membership: replica r>0 suffixes
every document word with a replica token (no cross-replica
ngram/minhash/simhash/containment pairs), perturbs embeddings to ~0.95
cosine (below every tau=0.99 path), and leaves part names unchanged
while shifting only keys. Replica 0 IS the base sf0.1 corpus verbatim.

So the big-SF engine output, RESTRICTED to replica-0 ids (< 1e8), must
equal the full DuckDB oracle run on the sf0.1 tables — an exact
hash-style check of a slice of the real big-SF run, with the oracle
still at a size DuckDB can afford. A closure violation (a cross-replica
pair leaking in) shows up as extra rows and FAILS the compare.

Two queries are NOT id-restrictable and are recorded n/a with the
reason:
- curate_corpus: corpus-global per-language aggregate (n_docs/sum_ids
  count ALL replicas); its pair + cluster machinery is the same
  ngramJaccardPairs/components code path sampled via dedup_clusters.
- dedup_semantic: k-means centroids train on the full corpus, so
  cluster ids/membership legitimately differ across scales; the
  tau-pair semantics are sampled via dedup_embedding.

Usage: sampled_check.py <baseSfDir(sf0.1)> <dump1>[,dump2,...] [q1,q2,...]
Emits "SAMPLED <name>: pass (N rows)" / "SAMPLED <name>: fail ..." /
"SAMPLED <name>: n/a (...)" lines for assemble_scale_artifact.py, one
block per dump (prefixed "## <dump>"). The sf0.1 oracle result is
computed ONCE per query and reused across dumps — the text all-pairs
oracles cost ~8 min each at 5000 docs, the whole point of sampling.
"""
import glob
import json
import os
import sys

import duckdb

OFF = 100_000_000

# columns that must all be < OFF to restrict a row to replica 0
RESTRICT = {
    "dedup_ngram_jaccard": ("id_a", "id_b"),
    "dedup_minhash_lsh": ("id_a", "id_b"),
    "dedup_simhash": ("id_a", "id_b"),
    "dedup_containment": ("id_a", "id_b"),
    "dedup_incr_containment": ("id_a", "id_b"),
    "dedup_embedding": ("id_a", "id_b"),
    "dedup_embedding_blocked": ("id_a", "id_b"),
    "dedup_embedding_simhash": ("id_a", "id_b"),
    "dedup_incr_minhash": ("doc_id",),  # best_id/counts within-replica by closure
    "dedup_clusters": ("doc_id",),      # cluster_id = min member, < OFF by closure
    "dedup_keep_best": ("doc_id",),
    "fuzzy_match_join": ("rec_id",),    # canonical name list identical across replicas
}
NA = {
    "curate_corpus": "corpus-global per-language aggregate, not id-restrictable; "
                     "pair+cluster machinery sampled via dedup_clusters",
    "dedup_semantic": "k-means centroids train on the full corpus (cluster ids differ "
                      "across scales by design); tau-pair semantics sampled via dedup_embedding",
}

import time

base, dumps = sys.argv[1], sys.argv[2].split(",")
queries = sys.argv[3].split(",") if len(sys.argv) > 3 else sorted(set(RESTRICT) | set(NA))

con = duckdb.connect()
for p in glob.glob(f"{base}/*.parquet"):
    name = os.path.basename(p)[: -len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
oracle = json.load(open(f"{dumps[0]}/oracle_sql.json"))

fails = 0
cached = {}  # query -> (cols, sorted oracle rows)


def oracle_rows(q):
    if q not in cached:
        t0 = time.time()
        exp = con.sql(oracle[q])
        cols = sorted(exp.columns)
        sel = ", ".join(f'"{c}"' for c in cols)
        rows = con.sql(f"SELECT {sel} FROM exp ORDER BY ALL").fetchall()
        print(f"# oracle {q}: {len(rows)} rows in {time.time() - t0:.0f}s", flush=True)
        cached[q] = (cols, rows)
    return cached[q]


for dump in dumps:
    print(f"## {dump}", flush=True)
    for q in queries:
        if q in NA:
            print(f"SAMPLED {q}: n/a ({NA[q]})", flush=True)
            continue
        if q not in RESTRICT:
            print(f"SAMPLED {q}: fail (no restriction rule)", flush=True); fails += 1
            continue
        resdir = f"{dump}/{q}"
        if not os.path.isdir(resdir):
            print(f"SAMPLED {q}: fail (no engine dump)", flush=True); fails += 1
            continue
        try:
            ecols, erows = oracle_rows(q)
            pred = " AND ".join(f'"{c}" < {OFF}' for c in RESTRICT[q])
            got = con.sql(f"SELECT * FROM '{resdir}/*.parquet' WHERE {pred}")
            if sorted(got.columns) != ecols:
                print(f"SAMPLED {q}: fail (columns {sorted(got.columns)} vs {ecols})", flush=True)
                fails += 1
                continue
            sel = ", ".join(f'"{c}"' for c in ecols)
            grows = con.sql(f"SELECT {sel} FROM got ORDER BY ALL").fetchall()
            if grows == erows and grows:
                print(f"SAMPLED {q}: pass ({len(grows)} rows)", flush=True)
            elif grows == erows:
                print(f"SAMPLED {q}: fail (vacuous: zero rows on both sides)", flush=True)
                fails += 1
            else:
                fails += 1
                print(f"SAMPLED {q}: fail ({len(grows)} vs {len(erows)} rows)", flush=True)
                diff = [(a, b) for a, b in zip(grows, erows) if a != b]
                for a, b in diff[:3]:
                    print(f"   engine: {a}\n   oracle: {b}", flush=True)
        except Exception as e:
            print(f"SAMPLED {q}: fail ({e})", flush=True); fails += 1

sys.exit(1 if fails else 0)
