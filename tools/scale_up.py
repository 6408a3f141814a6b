#!/usr/bin/env python3
"""Build a larger scale-factor replica of the driver testdata for
scaling benchmarks (driver-side tooling, like check.py — NOT part of
the shipped library).

Replicates every fact table `factor` times with disjoint key ranges
(offset r*1e8 per replica) so join fan-outs scale linearly, exactly
like growing the real corpus would:

- dimension tables region/nation stay fixed (TPC-H semantics: 25
  nations at any SF);
- customer/supplier/part/orders/lineitem/events offset every key and
  foreign key;
- documents: replica > 0 suffixes every word with a replica token, so
  near-dup structure WITHIN a replica (the staged pairs) is preserved
  while no cross-replica n-gram/minhash/simhash pairs exist —
  otherwise every doc would gain `factor-1` artificial twins and the
  dedup workloads would scale quadratically by construction, not
  linearly like a real corpus;
- embeddings: replica > 0 adds value-keyed deterministic noise
  (~0.95 cosine to the base), same reasoning for tau=0.99 paths.

events.ts is TIMESTAMP_NS in the driver parquet; duckdb preserves
that physical type on write (Spark reads it via nanosAsLong, the
DuckDB oracle as a native timestamp — both sides must keep working).

Usage: python3 tools/scale_up.py <srcDir> <outDir> <factor>
"""
import os
import sys

import duckdb

src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
OFF = 100_000_000

def build(table, select_r, order):
    parts = [select_r(r) for r in range(factor)]
    union = " UNION ALL ".join(parts)
    con.sql(f"COPY ({union} ORDER BY {order}) TO '{out}/{table}.parquet' (FORMAT parquet)")
    n = con.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
    print(f"[scale_up] {table}: {n} rows")

for t in ("region", "nation"):
    con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT parquet)")
    print(f"[scale_up] {t}: copied")

build("customer", lambda r: f"""
  SELECT c_custkey + {r * OFF} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM '{src}/customer.parquet'""", "c_custkey")

build("supplier", lambda r: f"""
  SELECT s_suppkey + {r * OFF} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM '{src}/supplier.parquet'""", "s_suppkey")

build("part", lambda r: f"""
  SELECT p_partkey + {r * OFF} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
  FROM '{src}/part.parquet'""", "p_partkey")

build("orders", lambda r: f"""
  SELECT o_orderkey + {r * OFF} AS o_orderkey, o_custkey + {r * OFF} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{src}/orders.parquet'""", "o_orderkey")

build("lineitem", lambda r: f"""
  SELECT l_orderkey + {r * OFF} AS l_orderkey, l_partkey + {r * OFF} AS l_partkey,
         l_suppkey + {r * OFF} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice,
         l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM '{src}/lineitem.parquet'""", "l_orderkey, l_linenumber")

# events.ts is physical TIMESTAMP_NS; duckdb normalizes timestamps to
# micros on read/write, which would flip Spark's nanosAsLong read path
# to TimestampType — replicate with pyarrow, which round-trips ns.
def build_events():
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    t = pq.read_table(f"{src}/events.parquet")
    reps = []
    for r in range(factor):
        reps.append(t.set_column(t.schema.get_field_index("event_id"), "event_id",
                      pc.add(t.column("event_id"), r * OFF))
                     .set_column(t.schema.get_field_index("user_id"), "user_id",
                      pc.add(t.column("user_id"), r * OFF)))
    merged = pa.concat_tables(reps)
    merged = merged.take(pc.sort_indices(merged, sort_keys=[("event_id", "ascending")]))
    pq.write_table(merged, f"{out}/events.parquet")
    print(f"[scale_up] events: {merged.num_rows} rows ({t.schema.field('ts').type})")

build_events()

build("documents", lambda r: f"""
  SELECT doc_id + {r * OFF} AS doc_id,
         {"text" if r == 0 else f"replace(text, ' ', 'x{r} ') "} AS text,
         lang, source, n_chars
  FROM '{src}/documents.parquet'""", "doc_id")

build("embeddings", lambda r: f"""
  SELECT vec_id + {r * OFF} AS vec_id,
         {"embedding" if r == 0 else
          f"CAST(list_transform(embedding, x -> x + (CAST(hash(CAST(x * 1e6 AS BIGINT) + {r}) % 1000 AS BIGINT) - 500) / 1500.0) AS FLOAT[])"} AS embedding,
         label
  FROM '{src}/embeddings.parquet'""", "vec_id")

print("[scale_up] done")
