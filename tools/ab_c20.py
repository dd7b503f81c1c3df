"""Interleaved same-session A/B of the c20 streaming materialization:
r3 shape (flat full-rewrite merge, n_buckets=None) vs r4 shape
(bucketed LSM, n_buckets=16) at sf0.1 — resolves VERDICT r4
"What's wrong #3": is the +0.76 s r3→r4 bench delta the
streaming-trigger floor or LSM creep?

Usage: python tools/ab_c20.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def run_once(spark, sf_dir: str, n_buckets):
    from embeddinghub_spark.sources.tables import read_bucketed_snapshot
    from embeddinghub_spark.streaming.stream_materialize import (
        streaming_materialize_to_dir,
    )

    ev = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .select("user_id", "value", "ts")
    )
    work = tempfile.mkdtemp(prefix="ab_c20_")
    in_dir = work + "/in"
    ev.repartition(4).write.parquet(in_dir)
    t0 = time.monotonic()
    stream = (
        spark.readStream.schema(spark.read.parquet(in_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = streaming_materialize_to_dir(
        stream, work + "/snap", entity_col="user_id", value_col="value",
        ts_col="ts", checkpoint_dir=work + "/ckpt", n_buckets=n_buckets,
    )
    assert q.awaitTermination(600)
    n = read_bucketed_snapshot(spark, work + "/snap").count()
    return time.monotonic() - t0, n


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("ab_c20")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warmup (JIT + stream machinery), not recorded
    run_once(spark, sf_dir, 16)
    a, b = [], []
    for i in range(reps):
        ta, na = run_once(spark, sf_dir, 16)      # r4 bucketed LSM
        tb, nb = run_once(spark, sf_dir, None)    # r3 flat rewrite
        assert na == nb, (na, nb)
        a.append(ta)
        b.append(tb)
        print(f"rep {i}: bucketed={ta:.2f}s flat={tb:.2f}s (rows={na})")
    print(
        f"median bucketed={sorted(a)[len(a)//2]:.2f}s "
        f"flat={sorted(b)[len(b)//2]:.2f}s "
        f"means {sum(a)/len(a):.2f} vs {sum(b)/len(b):.2f}"
    )


if __name__ == "__main__":
    main()
