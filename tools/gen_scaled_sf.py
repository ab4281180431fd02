#!/usr/bin/env python3
"""Generate a FACTOR-times scaled copy of a testdata SF dir (bench-only).

Usage: python3 tools/gen_scaled_sf.py <src_sf_dir> <dst_dir> <factor>

Scaling model (throughput measurement, not oracle correctness):
- region/nation: copied as-is (dims don't scale in TPC-H either).
- supplier/part/customer/orders/lineitem: FACTOR key-shifted copies;
  foreign keys shift together so join selectivity is preserved
  (copy i of lineitem references copy i of orders/part/supplier).
- events: key-shifted copies, timestamps unchanged (windows get
  FACTOR x rows). NOTE: written with DuckDB default timestamp units,
  so the NANOS-specific read path is not exercised here.
- documents: copy i > 0 gets EVERY token suffixed with 'c<i>' — a
  bijective per-copy token renaming. Within a copy, word-shingle
  Jaccard / minhash collision probability / exact-dup structure are
  EXACTLY preserved (the renaming is a bijection on tokens, hence on
  shingles); across copies, no shingle ever collides, so copies are
  not artificial near-duplicates of each other. (A first version
  prefixed one token per doc, which left copies ~99% Jaccard-similar
  and manufactured factor^2 cross-copy dup groups — measuring the
  wrong thing.)
- embeddings: copy i rotates the vector by i positions — norm-
  preserving, deterministic, and uncorrelated with the original, so
  near-dup/ANN structure is preserved within each copy. Planted
  vec_id % 100 twins (see Dedup.PlantMod) still plant per copy.
Column types are preserved via explicit casts back to DESCRIBE types.
"""
import os
import sys

import duckdb


def main():
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def types(table):
        rows = con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'").fetchall()
        return {r[0]: r[1] for r in rows}

    def maxv(table, col):
        return con.execute(
            f"SELECT max({col}) + 1 FROM '{src}/{table}.parquet'").fetchone()[0]

    def write(table, select_for_copy):
        sql = " UNION ALL ".join(select_for_copy(i) for i in range(factor))
        con.execute(
            f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        print(table, con.execute(
            f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0])

    def shifted(table, shifts):
        t = types(table)

        def sel(i):
            if not shifts or i == 0:
                repl = ""
            else:
                parts = ", ".join(
                    f"CAST({c} + {i * base} AS {t[c]}) AS {c}"
                    for c, base in shifts.items())
                repl = f" REPLACE ({parts})"
            return f"SELECT *{repl} FROM '{src}/{table}.parquet'"

        return sel

    for dim in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM '{src}/{dim}.parquet') "
                    f"TO '{dst}/{dim}.parquet' (FORMAT PARQUET)")
        print(dim, "copied")

    s = maxv("supplier", "s_suppkey")
    p = maxv("part", "p_partkey")
    c = maxv("customer", "c_custkey")
    o = maxv("orders", "o_orderkey")
    write("supplier", shifted("supplier", {"s_suppkey": s}))
    write("part", shifted("part", {"p_partkey": p}))
    write("customer", shifted("customer", {"c_custkey": c}))
    write("orders", shifted("orders", {"o_orderkey": o, "o_custkey": c}))
    write("lineitem", shifted("lineitem", {
        "l_orderkey": o, "l_partkey": p, "l_suppkey": s}))

    e = maxv("events", "event_id")
    u = maxv("events", "user_id")
    write("events", shifted("events", {"event_id": e, "user_id": u}))

    d = maxv("documents", "doc_id")
    td = types("documents")

    def docsel(i):
        if i == 0:
            return f"SELECT * FROM '{src}/documents.parquet'"
        return (f"SELECT * REPLACE (CAST(doc_id + {i * d} AS {td['doc_id']}) AS doc_id, "
                f"regexp_replace(text, '(\\S+)', '\\1c{i}', 'g') AS text) "
                f"FROM '{src}/documents.parquet'")

    write("documents", docsel)

    v = maxv("embeddings", "vec_id")
    tv = types("embeddings")
    dim_n = con.execute(
        f"SELECT len(embedding) FROM '{src}/embeddings.parquet' LIMIT 1"
    ).fetchone()[0]

    def vecsel(i):
        if i == 0:
            return f"SELECT * FROM '{src}/embeddings.parquet'"
        # 1..dim-1, never 0: rot == 0 would make the "rotation" the
        # identity and copy i a bit-exact duplicate of copy 0 at
        # factor > dim, manufacturing cross-copy near-dup pairs the
        # scaling model says must not exist
        rot = 1 + (i - 1) % (dim_n - 1)
        return (f"SELECT * REPLACE (CAST(vec_id + {i * v} AS {tv['vec_id']}) AS vec_id, "
                f"CAST(list_concat(embedding[{rot + 1}:], embedding[1:{rot}]) "
                f"AS {tv['embedding']}) AS embedding) "
                f"FROM '{src}/embeddings.parquet'")

    write("embeddings", vecsel)


if __name__ == "__main__":
    main()
