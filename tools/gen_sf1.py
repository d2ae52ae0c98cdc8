#!/usr/bin/env python3
"""Generate an sf1 fixture (10x sf0.1) for local scale probing.

Ten id-offset copies of every sf0.1 table, written to /tmp/sf1. Shapes
are chosen so workload STRUCTURE scales linearly, the way a real 10x
corpus would:
  - keys offset per copy so referential joins (orders->customer,
    lineitem->part/supplier, events per user) match within a copy and
    never across copies;
  - document text gets a per-copy token suffix, so near-dup families
    are preserved WITHIN a copy (pair counts scale 10x, linear) and no
    artificial cross-copy near-dup families appear (which would scale
    pair counts quadratically in the copy factor);
  - embeddings perturb one element per copy for the same reason;
  - bounded-by-contract query sets (rag/sim query ids, contamination
    benchmark ids) live in copy 0 only, matching their fixed-size role;
  - dimension tables (region, nation) stay as-is;
  - modest parquet row groups so Spark's scan parallelism scales with
    the data instead of being pinned to one row group.

Usage: python3 tools/gen_sf1.py [src_dir] [dst_dir]
"""
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
COPIES = 10

TABLES = {
    "region": None,   # dimension: unscaled
    "nation": None,   # dimension: unscaled
    "customer": """
        SELECT c_custkey + i * 1000000 AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment FROM t, r""",
    "supplier": """
        SELECT s_suppkey + i * 10000 AS s_suppkey, s_name, s_nationkey,
               s_acctbal FROM t, r""",
    "part": """
        SELECT p_partkey + i * 100000 AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice FROM t, r""",
    "orders": """
        SELECT o_orderkey + i * 10000000 AS o_orderkey,
               o_custkey + i * 1000000 AS o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority FROM t, r""",
    "lineitem": """
        SELECT l_orderkey + i * 10000000 AS l_orderkey,
               l_partkey + i * 100000 AS l_partkey,
               l_suppkey + i * 10000 AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate FROM t, r""",
    "events": """
        SELECT event_id + i * 10000000 AS event_id, ts,
               user_id + i * 1000000 AS user_id, event_type, value, props
        FROM t, r""",
    "documents": """
        SELECT doc_id + i * 1000000 AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE array_to_string(list_transform(
                           string_split(text, ' '), w -> w || i), ' ')
               END AS text,
               lang, source,
               CAST(length(CASE WHEN i = 0 THEN text
                    ELSE array_to_string(list_transform(
                           string_split(text, ' '), w -> w || i), ' ')
               END) AS BIGINT) AS n_chars
        FROM t, r""",
    "embeddings": """
        SELECT vec_id + i * 1000000 AS vec_id,
               CAST(CASE WHEN i = 0 THEN embedding
                    ELSE [embedding[1] + i * 0.01] || embedding[2:]
               END AS FLOAT[]) AS embedding,
               label FROM t, r""",
}


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TEMP TABLE r AS SELECT i FROM range({COPIES}) t(i)")
    for name, sql in TABLES.items():
        con.execute(f"""CREATE OR REPLACE TEMP VIEW t AS
                        SELECT * FROM read_parquet('{SRC}/{name}.parquet')""")
        body = sql if sql else "SELECT * FROM t"
        con.execute(f"""COPY ({body}) TO '{DST}/{name}.parquet'
                        (FORMAT PARQUET, ROW_GROUP_SIZE 65536)""")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{DST}/{name}.parquet')"
        ).fetchone()[0]
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
