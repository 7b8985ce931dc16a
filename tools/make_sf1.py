#!/usr/bin/env python3
"""Build a ~10x replica of the sf0.1 testdata at /tmp/sf1 (driver-side
tool, DuckDB only) for the spot-bench's 10x-scale datapoint.

Replication respects the star-schema keys so join/dedup behavior stays
realistic instead of degenerate:
  - fact keys get a disjoint per-replica offset (orderkey/custkey/
    partkey/suppkey/event_id/user_id/doc_id/vec_id), so FK joins fan
    out 10x without collapsing onto one hot key;
  - region/nation stay as-is (dimensions);
  - document text is perturbed with a per-replica prefix token, so
    near-dup structure is within-replica (bounded clusters) rather
    than 10x-deep cross-replica clique blowups that no real corpus has;
  - events keep their timestamps (the time axis doesn't stretch at
    10x row count — a month of data with 10x traffic).

Usage: python3 tools/make_sf1.py [src_sfdir] [out_dir] [replicas]
"""
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10

K = 10_000_000  # key offset per replica — far above any base key

con = duckdb.connect()
con.execute(f"CREATE VIEW r AS SELECT unnest(generate_series(0, {R - 1})) AS i")


def write(name: str, sql: str) -> None:
    import os
    os.makedirs(OUT, exist_ok=True)
    con.execute(
        f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")


for t in ("region", "nation"):
    write(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

write("customer", f"""
  SELECT c_custkey + i * {K} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM '{SRC}/customer.parquet' CROSS JOIN r""")

write("supplier", f"""
  SELECT s_suppkey + i * {K} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM '{SRC}/supplier.parquet' CROSS JOIN r""")

write("part", f"""
  SELECT p_partkey + i * {K} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM '{SRC}/part.parquet' CROSS JOIN r""")

write("orders", f"""
  SELECT o_orderkey + i * {K} AS o_orderkey, o_custkey + i * {K} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet' CROSS JOIN r""")

write("lineitem", f"""
  SELECT l_orderkey + i * {K} AS l_orderkey, l_partkey + i * {K} AS l_partkey,
         l_suppkey + i * {K} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate
  FROM '{SRC}/lineitem.parquet' CROSS JOIN r""")

write("events", f"""
  SELECT event_id + i * {K} AS event_id, ts, user_id + i * {K} AS user_id,
         event_type, value, props
  FROM '{SRC}/events.parquet' CROSS JOIN r""")

write("documents", f"""
  SELECT doc_id + i * {K} AS doc_id,
         CASE WHEN i = 0 THEN text ELSE 'r' || i || ' ' || text END AS text,
         lang, source, n_chars
  FROM '{SRC}/documents.parquet' CROSS JOIN r""")

write("embeddings", f"""
  SELECT vec_id + i * {K} AS vec_id, embedding, label
  FROM '{SRC}/embeddings.parquet' CROSS JOIN r""")
