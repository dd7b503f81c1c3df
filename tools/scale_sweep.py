"""Scale-evidence sweep (VERDICT r5 "Next round" #8).

Builds an sf1-equivalent blow-up of the hot tables (documents,
embeddings, lineitem ×SCALE, remaining tables symlinked), times the
most expensive registry entries at sf0.1 and at the blow-up IN ONE
SparkSession (interleaved per query: base, blown, base, blown — the
repo's A/B protocol, so VM drift cannot masquerade as a scaling
exponent), and prints per-query times plus the observed scaling
ratio. Anything super-linear beyond its documented complexity is a
hidden driver bottleneck to root-cause BEFORE a real cluster finds
it.

Blow-up construction keeps workload shape honest:
- documents: each copy gets a per-copy nonce appended to ``text`` so
  cross-copy rows are NOT byte-duplicates (otherwise every dedup op's
  pair count explodes quadratically by construction, which measures
  the synthetic duplication, not the operator); doc_id shifted.
- embeddings: one deterministic per-copy component perturbation (same
  reason for cosine near-dup ops); id shifted.
- lineitem: orderkey/linenumber shifted only — pure volume.

Usage: python tools/scale_sweep.py [--scale 10] [--reps 2] [--reuse]
                                   [query ...]
(--reuse keeps an existing blow-up dir instead of rebuilding it —
the build costs minutes at scale 10.)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
BLOWN = {"documents", "embeddings", "lineitem"}

DEFAULT_QUERIES = [
    "sparse_cosine",
    "pagerank",
    "dup_spans",
    "trim_spans",
    "embedding_clusters",
    "fuzzy_clusters",
    "bpe_merges",
    "minhash_bands",
    "embedding_near_dup",
    "binary_auc",
    "c6_pit_training_set",
    "c11_lag_features",
]


def build_blowup(spark, base_dir: str, out_dir: str, scale: int) -> None:
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    for t in TABLES:
        src = os.path.join(base_dir, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if t not in BLOWN:
            os.symlink(src, dst)
            continue
        df = spark.read.parquet(src)
        copies = []
        if t == "documents":
            mx = df.agg(F.max("doc_id")).collect()[0][0] + 1
            for k in range(scale):
                c = df.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(k * mx)
                )
                if k > 0:  # copy 0 == the original corpus, untouched
                    c = c.withColumn(
                        "text",
                        F.concat(
                            F.col("text"),
                            F.lit(f" nonce{k}x"),
                            F.col("doc_id").cast("string"),
                        ),
                    ).withColumn("n_chars", F.length("text"))
                copies.append(c)
        elif t == "embeddings":
            mx = df.agg(F.max("vec_id")).collect()[0][0] + 1
            for k in range(scale):
                c = df.withColumn("vec_id", F.col("vec_id") + F.lit(k * mx))
                if k > 0:
                    c = c.withColumn(
                        "embedding",
                        F.transform(
                            F.col("embedding"),
                            lambda v, i: v
                            + ((F.col("vec_id") * 31 + i + k) % 17 - 8)
                            * F.lit(0.013),
                        ).cast(dict(df.dtypes)["embedding"]),
                    )
                copies.append(c)
        else:  # lineitem: pure volume
            mx = df.agg(F.max("l_orderkey")).collect()[0][0] + 1
            for k in range(scale):
                copies.append(
                    df.withColumn(
                        "l_orderkey", F.col("l_orderkey") + F.lit(k * mx)
                    )
                )
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.parquet(dst)


def main() -> None:
    import __spark_entry__ as m
    from embeddinghub_spark.session import get_spark

    args = [a for a in sys.argv[1:]]
    scale, reps = 10, 2
    if "--scale" in args:
        i = args.index("--scale")
        scale = int(args[i + 1])
        del args[i : i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    reuse = "--reuse" in args
    if reuse:
        args.remove("--reuse")
    names = args or DEFAULT_QUERIES

    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    blow = f"/tmp/eh_scale_sweep_x{scale}"
    spark = get_spark(app_name="scale_sweep")
    if reuse and os.path.isdir(blow):
        print(f"reusing {blow}", flush=True)
    else:
        print(f"building {blow} (x{scale} of documents/embeddings/lineitem)",
              flush=True)
        build_blowup(spark, base, blow, scale)

    qs = dict(m.queries())
    qs.update(m.staged_queries())  # staged r7 candidates sweep too
    results = {}
    for name in names:
        fn = qs[name]
        times = {"base": [], "blown": []}
        # warm both once (scan caching, code paths) before timing
        for d in (base, blow):
            fn(spark, d).count()
        for _ in range(reps):
            for key, d in (("base", base), ("blown", blow)):
                t0 = time.monotonic()
                fn(spark, d).count()
                times[key].append(time.monotonic() - t0)
        b = min(times["base"])
        s = min(times["blown"])
        results[name] = {
            "base_s": round(b, 3),
            "blown_s": round(s, 3),
            "ratio": round(s / b, 2) if b > 0 else None,
        }
        print(f"{name}: base={b:.2f}s blown={s:.2f}s "
              f"ratio={s / b:.2f}x", flush=True)
    print(json.dumps({"scale": scale, "results": results}))


if __name__ == "__main__":
    main()
