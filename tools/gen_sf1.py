#!/usr/bin/env python3
"""Generate the sf1 SCALING fixture (builder-side, round-12 directive #3).

The driver ships sf0.001/0.01/0.1 (TESTDATA.md, read-only); the scaling
audit needs one more decade. This generator reproduces the driver tables'
schemas and value domains (profiled from sf0.1: same columns, same
categorical domains, same ranges, same independence structure — lineitem
orderkeys are independent uniforms over the order-key space, which is what
makes distinct(l_orderkey)/|orders| land at 1-e^-4) at 10x sf0.1 row
counts. It is NOT the driver's generator (seed and engine differ), so sf1
is used for RUNTIME scaling only — correctness stays gated on the
driver's sf0.01 via the DuckDB oracle.

Usage: python3 tools/gen_sf1.py [/tmp/sf1]
"""
import math
import os
import sys

import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.sql("SELECT setseed(0.42)")

N_CUST, N_SUPP, N_PART = 150_000, 10_000, 200_000
N_ORD, N_LINE, N_EVT = 1_500_000, 6_000_000, 1_000_000
N_DOC, N_VEC = 50_000, 20_000

def write(name: str, sql: str) -> None:
    con.sql(f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n}")

# region / nation: fixed dimensions, copied verbatim from the driver's sf0.1
for t in ("region", "nation"):
    write(t, f"SELECT * FROM '/root/testdata/sf0.1/{t}.parquet'")

write("customer", f"""
  SELECT i AS c_custkey,
         printf('Customer#%09d', i) AS c_name,
         CAST(floor(random() * 25) AS INTEGER) AS c_nationkey,
         round(random() * 9000 + 1000, 2) AS c_acctbal,
         ['HOUSEHOLD','FURNITURE','MACHINERY','BUILDING','AUTOMOBILE']
           [CAST(floor(random() * 5) AS INTEGER) + 1] AS c_mktsegment
  FROM range({N_CUST}) t(i)""")

write("supplier", f"""
  SELECT i AS s_suppkey,
         printf('Supplier#%09d', i) AS s_name,
         CAST(floor(random() * 25) AS INTEGER) AS s_nationkey,
         round(random() * 9000 + 1000, 2) AS s_acctbal
  FROM range({N_SUPP}) t(i)""")

write("part", f"""
  SELECT i AS p_partkey,
         ['large','hot','blue','red','green','small','shiny','dark']
           [CAST(floor(random() * 8) AS INTEGER) + 1] || ' ' ||
         ['ring','bolt','screw','nut','gear','wheel','pin','rod']
           [CAST(floor(random() * 8) AS INTEGER) + 1] AS p_name,
         'Brand#' || CAST(CAST(floor(random() * 25) AS INTEGER) + 1 AS VARCHAR)
           AS p_brand,
         ['ECONOMY','LARGE','MEDIUM','PROMO','SMALL','STANDARD']
           [CAST(floor(random() * 6) AS INTEGER) + 1] AS p_type,
         CAST(floor(random() * 50) AS INTEGER) + 1 AS p_size,
         round(900 + (i % 1000) / 10.0, 1) AS p_retailprice
  FROM range({N_PART}) t(i)""")

write("orders", f"""
  SELECT i AS o_orderkey,
         CAST(floor(random() * {N_CUST}) AS BIGINT) AS o_custkey,
         ['O','P','F'][CAST(floor(random() * 3) AS INTEGER) + 1] AS o_orderstatus,
         round(random() * 499000 + 1000, 2) AS o_totalprice,
         TIMESTAMP '1995-01-01' + INTERVAL (CAST(floor(random() * 2405) AS INTEGER)) DAY
           AS o_orderdate,
         ['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW']
           [CAST(floor(random() * 5) AS INTEGER) + 1] AS o_orderpriority
  FROM range({N_ORD}) t(i)""")

write("lineitem", f"""
  SELECT CAST(floor(random() * {N_ORD}) AS BIGINT) AS l_orderkey,
         CAST(floor(random() * {N_PART}) AS BIGINT) AS l_partkey,
         CAST(floor(random() * {N_SUPP}) AS BIGINT) AS l_suppkey,
         CAST(floor(random() * 7) AS INTEGER) + 1 AS l_linenumber,
         CAST(floor(random() * 50) + 1 AS DOUBLE) AS l_quantity,
         round(random() * 104100 + 900, 2) AS l_extendedprice,
         round(floor(random() * 11) / 100.0, 2) AS l_discount,
         round(floor(random() * 9) / 100.0, 2) AS l_tax,
         ['A','N','R'][CAST(floor(random() * 3) AS INTEGER) + 1] AS l_returnflag,
         ['O','F'][CAST(floor(random() * 2) AS INTEGER) + 1] AS l_linestatus,
         TIMESTAMP '1995-01-01' + INTERVAL (CAST(floor(random() * 2500) AS INTEGER)) DAY
           AS l_shipdate
  FROM range({N_LINE}) t(i)""")

write("events", f"""
  SELECT i AS event_id,
         TIMESTAMP '2024-01-01' +
           INTERVAL (CAST(floor(i * (30.0 * 86400000000 / {N_EVT})
             + random() * 2000000) AS BIGINT)) MICROSECOND AS ts,
         CAST(floor(random() * 15000) AS BIGINT) AS user_id,
         ['signup','click','error','view','purchase']
           [CAST(floor(random() * 5) AS INTEGER) + 1] AS event_type,
         round(random() * 560, 2) AS value,
         '{{"k": ' || CAST(CAST(floor(random() * 100) AS INTEGER) AS VARCHAR) || '}}'
           AS props
  FROM range({N_EVT}) t(i)""")

# documents: the driver's 31-word vocabulary, uniform word draws, doc
# length matching the sf0.1 n_chars profile (~44..577 chars)
VOCAB = ("a agg batch big column customer data dup fast filter group hash "
         "join key line merge order part query row scan slow small sort "
         "spark stream table the value vector window").split()
vocab_sql = "[" + ",".join(f"'{w}'" for w in VOCAB) + "]"
write("documents", f"""
  WITH d AS (
    SELECT i AS doc_id,
           list_aggregate(list_transform(range(1,
             CAST(floor(random() * 90) AS INTEGER) + 9),
             x -> {vocab_sql}[CAST(floor(random() * 31) AS INTEGER) + 1]),
             'string_agg', ' ') AS text,
           CASE WHEN random() < 0.43 THEN 'en'
                WHEN random() < 0.25 THEN 'es'
                WHEN random() < 0.33 THEN 'de'
                WHEN random() < 0.5 THEN 'fr'
                ELSE 'zh' END AS lang,
           'src' || CAST(CAST(floor(random() * 20) AS INTEGER) AS VARCHAR)
             AS source
    FROM range({N_DOC}) t(i))
  SELECT doc_id, text, lang, source,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM d""")

write("embeddings", f"""
  SELECT i AS vec_id,
         list_transform(range(1, 65),
           x -> CAST(random() - 0.5 AS FLOAT)) AS embedding,
         CAST(floor(random() * 10) AS INTEGER) AS label
  FROM range({N_VEC}) t(i)""")

print(f"done -> {OUT}")
