#!/usr/bin/env python3
"""Dev tooling (not engine code): derive an sf1-scale dataset from the
driver's read-only sf0.1 tables, for the scaling checkpoint on the
documented super-linear-tail queries (PERF.md). 10x replication with
key-universe offsets so distributions per replica match sf0.1:

- lineitem: 10 replicas, l_orderkey/l_partkey/l_suppkey offset per
  replica -> order AND part universes scale 10x (the TPC-H sf1 shape);
  the co-purchase graph becomes a 10x disjoint union (10x nodes/edges,
  per-replica degree distribution preserved).
- events: 10 replicas, user_id/event_id offset -> 10x the user
  universe (so universe-squared fan-outs like q_corr_matrix should
  grow ~100x; that exponent is exactly what this checkpoint measures).
- documents: 10 replicas, doc_id offset; replica i>0 texts are
  word-rotated by 7*i and tagged with a replica token, so cross-replica
  texts share few 3-shingles and the near-dup pair distribution stays
  per-replica (a verbatim copy would make every doc a 10-way exact
  duplicate and distort the dedup shape, not scale it).
- embeddings: 10 replicas, vec_id offset, first component nudged by
  1e-3 * i (cross-replica cosine stays ~1 only for near-identical
  vectors, as with any real corpus growth).

Deterministic (pure function of the inputs). Writes /tmp/sf1.

Usage: python3 tools/gen_sf1.py [outdir] [replicas]
  replicas defaults to 10 (sf1); 30 -> sf3, 100 -> sf10 — the scaling
  sweep's larger checkpoints reuse the same construction.
"""
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    def rep(table, sql_tmpl):
        parts = " UNION ALL ".join(sql_tmpl.format(i=i) for i in range(R))
        con.execute(
            f"COPY ({parts}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET, CODEC ZSTD)")
        n = con.execute(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    maxok, maxpk, maxsk = con.execute(
        f"SELECT max(l_orderkey)+1, max(l_partkey)+1, max(l_suppkey)+1 "
        f"FROM '{SRC}/lineitem.parquet'").fetchone()
    rep("lineitem", f"""
        SELECT l_orderkey + {{i}}*{maxok} AS l_orderkey,
               l_partkey + {{i}}*{maxpk} AS l_partkey,
               l_suppkey + {{i}}*{maxsk} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet'""")

    maxe, maxu = con.execute(
        f"SELECT max(event_id)+1, max(user_id)+1 FROM '{SRC}/events.parquet'").fetchone()
    rep("events", f"""
        SELECT event_id + {{i}}*{maxe} AS event_id, ts,
               user_id + {{i}}*{maxu} AS user_id, event_type, value, props
        FROM '{SRC}/events.parquet'""")

    maxd = con.execute(
        f"SELECT max(doc_id)+1 FROM '{SRC}/documents.parquet'").fetchone()[0]
    # word rotation in SQL: split, slice twice, re-join, tag
    rep("documents", f"""
        SELECT doc_id + {{i}}*{maxd} AS doc_id,
               CASE WHEN {{i}} = 0 THEN text ELSE
                 array_to_string(
                   list_concat(
                     t[1 + (7*{{i}}) % greatest(len(t), 1):],
                     t[:(7*{{i}}) % greatest(len(t), 1)]), ' ')
                 || ' zrep{{i}}' END AS text,
               lang, source, n_chars
        FROM (SELECT *, string_split(trim(text), ' ') AS t
              FROM '{SRC}/documents.parquet')""")

    maxv = con.execute(
        f"SELECT max(vec_id)+1 FROM '{SRC}/embeddings.parquet'").fetchone()[0]
    rep("embeddings", f"""
        SELECT vec_id + {{i}}*{maxv} AS vec_id,
               list_concat([CAST(embedding[1] + 0.001*{{i}} AS FLOAT)],
                           embedding[2:]) AS embedding,
               label
        FROM '{SRC}/embeddings.parquet'""")

    for t in ["region", "nation", "customer", "supplier", "part", "orders"]:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
        print(f"{t}: copied verbatim")


if __name__ == "__main__":
    main()
