"""Generate a derived sf1 bench dataset (10x sf0.1) under
.benchdata/sf1 — NEVER touches /root/testdata (read-only).

Construction (VERDICT r7 task #7 — an sf1 headline bench point to
kill the job-overhead floor that makes sf0.1 noise-bound):

- fact/entity tables replicate 10x with consistent key offsets
  (copy i shifts every key family by i * (max_key + 1)), so FK joins
  keep exactly the sf0.1 selectivity and fan-out per copy;
- region/nation stay fixed (TPC-H dimension tables do not scale);
- documents: copy i >= 1 suffixes EVERY whitespace token with
  ``x<i>`` — within-copy duplicate/near-dup structure is preserved
  exactly while cross-copy token overlap drops to zero (naive
  replication would grow near-dup PAIR outputs quadratically in the
  copy count, which misrepresents scaling);
- embeddings: copy i circularly rotates the vector by i dimensions —
  norms and intra-copy distances are preserved bit-for-bit while
  cross-copy cosine structure decorrelates;
- events keep their time range (10x density — the realistic scale-up
  for a stream table).

Copy 0 is byte-identical to sf0.1, so sf1 is a superset.

Usage: python tools/gen_sf1.py [out_dir]   (default .benchdata/sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
R = 10


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        here, ".benchdata", "sf1"
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def off(t: str, key: str) -> int:
        return int(
            con.execute(f"SELECT max({key}) + 1 FROM {src(t)}").fetchone()[0]
        )

    o_c = off("customer", "c_custkey")
    o_s = off("supplier", "s_suppkey")
    o_p = off("part", "p_partkey")
    o_o = off("orders", "o_orderkey")
    o_e = off("events", "event_id")
    o_u = off("events", "user_id")
    o_d = off("documents", "doc_id")
    o_v = off("embeddings", "vec_id")

    copies = f"(SELECT unnest(range({R})) AS i) c"

    def emit(name: str, select: str) -> None:
        dst = os.path.join(out, f"{name}.parquet")
        con.execute(
            f"COPY ({select}) TO '{dst}' (FORMAT PARQUET, CODEC 'SNAPPY')"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{name}: {n} rows")

    # fixed dimensions
    for t in ("region", "nation"):
        emit(t, f"SELECT * FROM {src(t)}")

    emit("customer", f"""
        SELECT c_custkey + i * {o_c} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM {src('customer')}, {copies}""")
    emit("supplier", f"""
        SELECT s_suppkey + i * {o_s} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM {src('supplier')}, {copies}""")
    emit("part", f"""
        SELECT p_partkey + i * {o_p} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM {src('part')}, {copies}""")
    emit("orders", f"""
        SELECT o_orderkey + i * {o_o} AS o_orderkey,
               o_custkey + i * {o_c} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}, {copies}""")
    emit("lineitem", f"""
        SELECT l_orderkey + i * {o_o} AS l_orderkey,
               l_partkey + i * {o_p} AS l_partkey,
               l_suppkey + i * {o_s} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')}, {copies}""")
    emit("events", f"""
        SELECT event_id + i * {o_e} AS event_id, ts,
               user_id + i * {o_u} AS user_id, event_type, value, props
        FROM {src('events')}, {copies}""")
    emit("documents", f"""
        SELECT doc_id + i * {o_d} AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE regexp_replace(text, '(\\S+)',
                                        '\\1x' || CAST(i AS VARCHAR), 'g')
               END AS text,
               lang, source,
               CAST(length(CASE WHEN i = 0 THEN text
                    ELSE regexp_replace(text, '(\\S+)',
                                        '\\1x' || CAST(i AS VARCHAR), 'g')
               END) AS BIGINT) AS n_chars
        FROM {src('documents')}, {copies}""")
    emit("embeddings", f"""
        SELECT vec_id + i * {o_v} AS vec_id,
               CASE WHEN i = 0 THEN embedding
                    ELSE list_concat(embedding[i + 1:],
                                     embedding[1:i])
               END AS embedding,
               label
        FROM {src('embeddings')}, {copies}""")
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
