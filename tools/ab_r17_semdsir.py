"""Interleaved A/B at sf1 for the r17 semantic_dedup assignment path
and dsir_weights totals restructure. Arms alternate rep-by-rep inside
one session (the r16 protocol); each arm is forced via the module
seams (_arrow_ok for the assignment; a local replay of the old
dsir tail for dsir).

Usage: python tools/ab_r17_semdsir.py [n_reps] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def sem_new(spark, sf_dir):
    import __spark_entry__ as entrymod

    _noop(entrymod.queries()["semantic_dedup"](spark, sf_dir))


def sem_old(spark, sf_dir):
    import embeddinghub_spark.functions.vector as V
    import __spark_entry__ as entrymod

    orig = V._arrow_ok
    V._arrow_ok = lambda *a: False
    try:
        _noop(entrymod.queries()["semantic_dedup"](spark, sf_dir))
    finally:
        V._arrow_ok = orig


def _dsir_docs(spark, sf_dir):
    import __spark_entry__ as entrymod

    return entrymod._t(spark, sf_dir, "documents")


def dsir_new(spark, sf_dir):
    import __spark_entry__ as entrymod

    _noop(entrymod.queries()["dsir_weights"](spark, sf_dir))


def dsir_old(spark, sf_dir):
    # replay of the pre-r17 tail: tot aggregated from gb directly,
    # bt NOT checkpointed (the rest of dsir_weights is unchanged, so
    # reuse it up to gb by calling the private pieces)
    from embeddinghub_spark.functions.selection import (
        doc_grams,
        _gram_bucket,
    )
    from embeddinghub_spark.functions.vector import ensure_parallelism

    docs = ensure_parallelism(_dsir_docs(spark, sf_dir))
    target = F.col("lang") == "en"  # q_dsir_weights' target
    n_buckets, alpha, seed = 8192, 1.0, 7
    ktot = float(alpha) * n_buckets
    gb = (
        docs.select(
            F.col("doc_id"), target.alias("_tgt"),
            F.explode(doc_grams("text")).alias("_g"),
        )
        .select("doc_id", "_tgt",
                _gram_bucket(F.col("_g"), n_buckets, seed).alias("_b"))
        .groupBy("doc_id", "_tgt", "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=False)
    )
    bt = gb.groupBy("_b").agg(
        F.sum(F.when(F.col("_tgt"), F.col("_c")).otherwise(F.lit(0))).alias("_ct"),
        F.sum("_c").alias("_cr"),
    )
    tot = bt.agg(F.sum("_ct").alias("_T"), F.sum("_cr").alias("_R"))
    lr_raw = (
        F.log((F.col("_ct") + F.lit(1.0)) / (F.col("_T") + F.lit(ktot)))
        - F.log((F.col("_cr") + F.lit(1.0)) / (F.col("_R") + F.lit(ktot)))
    )
    lrdf = bt.crossJoin(F.broadcast(tot)).select(
        "_b",
        F.round(F.round(lr_raw, 9) * F.lit(1e9), 0).cast("bigint").alias("_lrs"),
    )
    out = (
        gb.join(F.broadcast(lrdf), "_b")
        .groupBy("doc_id")
        .agg(F.sum("_c").cast("bigint").alias("n_grams"),
             F.sum(F.col("_c") * F.col("_lrs")).alias("_s"))
        .select(
            "doc_id", "n_grams",
            (F.round(F.col("_s").cast("double") / F.lit(1000.0), 0)
             .cast("bigint") / F.lit(1e6)).alias("log_weight"),
        )
    )
    _noop(out)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else ".benchdata/sf1"
    from embeddinghub_spark.session import get_spark

    spark = get_spark("ab_r17")
    spark.sparkContext.setLogLevel("ERROR")
    arms = {
        "sem_old": sem_old, "sem_new": sem_new,
        "dsir_old": dsir_old, "dsir_new": dsir_new,
    }
    # untimed warm pass
    for name, fn in arms.items():
        fn(spark, sf_dir)
    res = {k: [] for k in arms}
    for i in range(n):
        order = list(arms) if i % 2 == 0 else list(reversed(list(arms)))
        for name in order:
            t0 = time.time()
            arms[name](spark, sf_dir)
            res[name].append(time.time() - t0)
            print(f"rep{i} {name}: {res[name][-1]:.3f}", flush=True)
    for name, vals in res.items():
        s = sorted(vals)
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s)//2-1] + s[len(s)//2]) / 2
        print(f"{name}: n={len(vals)} median={med:.3f} min={min(vals):.3f} max={max(vals):.3f}")


if __name__ == "__main__":
    main()
