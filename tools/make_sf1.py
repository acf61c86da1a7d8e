#!/usr/bin/env python3
"""Build a deterministic 10x scale-up of the sf0.1 fixture ("sf1.0") for
wall-ratio probes of the heaviest queries (VERDICT r11 #7).

The driver ships no sf1.0 fixture and TESTDATA.md records no generator, so
this replicates sf0.1 ten times with SHIFTED KEYS (offsets are the key
domain size — a multiple of 10, so every `key % k` planting keeps its
residue class and the fixtures' planted semantics scale proportionally):

- orders/lineitem/customer: 10 disjoint key-shifted copies — 10x the
  entities (suppliers' daily series, the purchase graph's components),
  same per-entity history length; FKs to the untouched dims (nation,
  part positions) are left unshifted.
- documents: replica r>0 splices the first half of doc i's text with the
  second half of doc (i + 37r) mod n — genuinely distinct documents with
  the corpus's vocabulary/length marginals (NOT 10 identical twins, which
  would explode every near-dup family's true-pair count 45x and measure a
  different workload).
- embeddings: replica r>0 mixes 0.8*v_i + 0.6*v_{(i+101r) mod n} — new
  vectors, same scale/dimension marginals.
- region/nation/part/supplier/events copy through unchanged (no probed
  query reads them at this scale; suppliers enter via l_suppkey only).

Usage: python3 tools/make_sf1.py /root/testdata/sf0.1 /tmp/graft_sf1.0
"""
import os
import shutil
import sys

import duckdb


def main():
    src, dst = sys.argv[1], sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    R = 10
    for t in ["region", "nation", "part", "supplier", "events"]:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    con.execute(f"CREATE TABLE reps AS SELECT unnest(range({R})) AS r")

    def copy(sql, out):
        con.execute(f"COPY ({sql}) TO '{dst}/{out}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{dst}/{out}.parquet'").fetchone()[0]
        print(f"{out}: {n} rows")

    # key-domain offsets (all multiples of 10 -> residue-preserving)
    OO, CO, SO, PO, DO, VO = 150000, 15000, 1000, 20000, 5000, 2000

    copy(f"""
      SELECT o_orderkey + r*{OO} AS o_orderkey,
             o_custkey + r*{CO} AS o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM '{src}/orders.parquet', reps""", "orders")

    copy(f"""
      SELECT l_orderkey + r*{OO} AS l_orderkey,
             l_partkey + r*{PO} AS l_partkey,
             l_suppkey + r*{SO} AS l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount,
             l_tax, l_returnflag, l_linestatus, l_shipdate
      FROM '{src}/lineitem.parquet', reps""", "lineitem")

    copy(f"""
      SELECT c_custkey + r*{CO} AS c_custkey,
             c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM '{src}/customer.parquet', reps""", "customer")

    copy(f"""
      WITH d AS (SELECT * FROM '{src}/documents.parquet')
      SELECT a.doc_id + r*{DO} AS doc_id,
             CASE WHEN r = 0 THEN a.text
                  ELSE concat(substr(a.text, 1, len(a.text)//2), ' ',
                              substr(b.text, len(b.text)//2)) END AS text,
             a.lang, a.source,
             CAST(CASE WHEN r = 0 THEN a.n_chars
                  ELSE len(a.text)//2 + 1 + len(b.text) - len(b.text)//2 + 1
                  END AS BIGINT) AS n_chars
      FROM d a, reps
      JOIN d b ON b.doc_id = (a.doc_id + 37*r) % {DO}""", "documents")

    copy(f"""
      WITH e AS (SELECT * FROM '{src}/embeddings.parquet')
      SELECT a.vec_id + r*{VO} AS vec_id,
             CASE WHEN r = 0 THEN a.embedding
                  ELSE CAST(list_transform(range(1, len(a.embedding)+1),
                       i -> a.embedding[i]*0.8 + b.embedding[i]*0.6)
                       AS FLOAT[]) END AS embedding,
             a.label
      FROM e a, reps
      JOIN e b ON b.vec_id = (a.vec_id + 101*r) % {VO}""", "embeddings")


if __name__ == "__main__":
    main()
