#!/usr/bin/env python3
"""Synthesize an sf1 dataset (10x sf0.1) for scale-slope measurement.

The driver ships sf0.001/0.01/0.1; the fourth point stresses the scale
claims one more decade (lineitem ~6M rows). Each table is the union of
10 key-shifted replicas of sf0.1, with foreign keys shifted by the SAME
per-id-space offset so join fan-outs stay realistic (one order still
has the same lineitems, one user the same events). Text gets a short
per-replica suffix and embeddings a tiny per-replica perturbation in
one dimension, so the dedup/ANN families see ~10x WORK, not 10
bit-identical copies of every group (exact duplicates would grow
candidate pairs quadratically inside each clone group and measure the
wrong thing). region/nation are fixed dimensions and copy as-is.

Usage: python3 tools/gen_sf1.py [src_sf_dir] [dst_dir]
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/sfgen/sf1"
REPS = 10

con = duckdb.connect()


def offset(table: str, col: str) -> int:
    return con.sql(f"SELECT max({col}) + 1 FROM '{SRC}/{table}.parquet'").fetchone()[0]


def gen(table: str, select_per_rep: str) -> None:
    parts = " UNION ALL ".join(
        f"SELECT {select_per_rep.format(r=r)} FROM '{SRC}/{table}.parquet'"
        for r in range(REPS)
    )
    con.sql(f"COPY ({parts}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    ords = offset("orders", "o_orderkey")
    cust = offset("customer", "c_custkey")
    part = offset("part", "p_partkey")
    supp = offset("supplier", "s_suppkey")
    evnt = offset("events", "event_id")
    user = offset("events", "user_id")
    doc = offset("documents", "doc_id")
    vec = offset("embeddings", "vec_id")

    for t in ("region", "nation"):
        con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")

    gen("customer", f"c_custkey + {{r}} * {cust} AS c_custkey, * EXCLUDE (c_custkey)")
    gen("supplier", f"s_suppkey + {{r}} * {supp} AS s_suppkey, * EXCLUDE (s_suppkey)")
    gen("part", f"p_partkey + {{r}} * {part} AS p_partkey, * EXCLUDE (p_partkey)")
    gen("orders",
        f"o_orderkey + {{r}} * {ords} AS o_orderkey, "
        f"o_custkey + {{r}} * {cust} AS o_custkey, "
        "* EXCLUDE (o_orderkey, o_custkey)")
    gen("lineitem",
        f"l_orderkey + {{r}} * {ords} AS l_orderkey, "
        f"l_partkey + {{r}} * {part} AS l_partkey, "
        f"l_suppkey + {{r}} * {supp} AS l_suppkey, "
        "* EXCLUDE (l_orderkey, l_partkey, l_suppkey)")
    gen("events",
        f"event_id + {{r}} * {evnt} AS event_id, ts, "
        f"user_id + {{r}} * {user} AS user_id, event_type, value, props")
    # a replica-specific token spliced onto every 4th word breaks ~3/4
    # of the 3-gram shingles between replicas, so cross-replica Jaccard
    # falls well below near-dup thresholds — cloned text would otherwise
    # put every doc in a 10-member near-dup group and grow pair queries
    # ~100x instead of ~10x (measuring the clone artifact, not scaling)
    gen("documents",
        f"doc_id + {{r}} * {doc} AS doc_id, "
        "array_to_string(list_transform(string_split(text, ' '), "
        "(w, i) -> CASE WHEN i % 4 = 0 THEN w || ' zq{r}x' ELSE w END), ' ') AS text, "
        "lang, source, length(text) AS n_chars")
    # cyclic dimension rotation: a rotated embedding is ~orthogonal to
    # its source, so replicas land in different LSH buckets / cosine
    # neighborhoods instead of forming 10-member near-dup cliques
    gen("embeddings",
        f"vec_id + {{r}} * {vec} AS vec_id, "
        "list_concat(embedding[{r}+1:], embedding[1:{r}]) AS embedding, "
        "label")


if __name__ == "__main__":
    main()
