#!/usr/bin/env python
"""Synthesize an sf1-EQUIVALENT slice (10x sf0.1 rows) for the
heavy-tail scale-trend measurement (round-3 verdict item 7).

Only the three tables the five most expensive bench queries read
(documents, embeddings, customer) are scaled; method is 10 re-keyed
replicas of sf0.1 with replica-DISJOINT content:

- documents: every word gets a replica suffix, so replicas never
  near-dup each other — the corpus behaves like 10x fresh data (each
  replica keeps sf0.1's internal dup structure, vocabulary grows 10x
  like a real corpus would);
- embeddings: components shifted by a replica-specific epsilon so
  vectors are distinct but the label/cluster geometry is preserved;
- customer: keys re-based per replica, names re-derived in the same
  'Customer#%09d' layout so the band-blocked linkage sees the real
  format.

This is PERF data only — correctness stays pinned to the driver's
sf0.01 DuckDB checks; nothing here feeds an oracle.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf1synth"
# 10 -> the sf1-equivalent slice; SYNTH_REPS=100 + DST .sf100synth ->
# the 100x tail slice (same construction, two decades)
REPS = int(os.environ.get("SYNTH_REPS", "10"))
BASE = 10_000_000

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

con.execute(f"""
COPY (
  SELECT doc_id + r.range * {BASE} AS doc_id,
         CASE WHEN r.range = 0 THEN text
              ELSE replace(text, ' ', '_' || r.range || ' ') || '_' || r.range
         END AS text,
         lang,
         source,
         length(CASE WHEN r.range = 0 THEN text
                ELSE replace(text, ' ', '_' || r.range || ' ') || '_' || r.range
                END) AS n_chars
  FROM '{SRC}/documents.parquet', range(0, {REPS}) r
) TO '{DST}/documents.parquet' (FORMAT PARQUET)
""")

con.execute(f"""
COPY (
  SELECT vec_id + r.range * {BASE} AS vec_id,
         [CAST(x + r.range * 0.0001 AS FLOAT) FOR x IN embedding] AS embedding,
         label
  FROM '{SRC}/embeddings.parquet', range(0, {REPS}) r
) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)
""")

con.execute(f"""
COPY (
  SELECT c_custkey + r.range * {BASE} AS c_custkey,
         'Customer#' || lpad(CAST(c_custkey + r.range * {BASE} AS VARCHAR), 9, '0')
           AS c_name,
         c_nationkey, c_acctbal, c_mktsegment
  FROM '{SRC}/customer.parquet', range(0, {REPS}) r
) TO '{DST}/customer.parquet' (FORMAT PARQUET)
""")

# fact tables for the full-headline 10x sweep: keys re-based per
# replica so PK/FK structure is preserved (orders<->lineitem,
# orders<->customer); dims (part/supplier/nation/region) stay fixed —
# dim joins simply see 10x fact fan-out, which is what a broadcast
# join must absorb anyway. Dates/timestamps unchanged: time-windowed
# aggregates see 10x density per window, the worst case for state.
con.execute(f"""
COPY (
  SELECT o_orderkey + r.range * {BASE} AS o_orderkey,
         o_custkey + r.range * {BASE} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet', range(0, {REPS}) r
) TO '{DST}/orders.parquet' (FORMAT PARQUET)
""")

con.execute(f"""
COPY (
  SELECT l_orderkey + r.range * {BASE} AS l_orderkey,
         l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
         l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet', range(0, {REPS}) r
) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)
""")

con.execute(f"""
COPY (
  SELECT event_id + r.range * {BASE} AS event_id, ts,
         user_id + r.range * {BASE} AS user_id,
         event_type, value, props
  FROM '{SRC}/events.parquet', range(0, {REPS}) r
) TO '{DST}/events.parquet' (FORMAT PARQUET)
""")

for t in ("part", "supplier", "nation", "region"):
    con.execute(
        f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet'"
        " (FORMAT PARQUET)"
    )

for t in (
    "documents", "embeddings", "customer", "orders", "lineitem", "events",
):
    n = con.execute(f"SELECT COUNT(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    print(t, n)
