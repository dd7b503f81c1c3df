"""sf1 headline bench point (VERDICT r7 task #7): run the 28
BASELINE.md headline queries plus the top-10 most expensive registry
entries at the derived sf1 dataset (tools/gen_sf1.py output, 10x
sf0.1), reps per query, reporting per-query seconds and the ratio vs
a same-session sf0.1 rep — the scaling evidence that kills the
job-overhead floor that makes sf0.1 per-query numbers noise-bound.

Usage: python tools/bench_sf1.py [--reps 2] [--sf1 .benchdata/sf1]
Prints one JSON line: {query: {"sf0.1": s, "sf1": s, "ratio": r}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE_28  # noqa: E402

TOP_EXPENSIVE = [
    "sparse_cosine", "pagerank", "embedding_clusters",
    "kn_bigram_logprob", "fuzzy_clusters", "c20_stream_materialize",
    "curation_v2", "corpus_curation", "trim_spans", "kn_trigram_logprob",
]


def main() -> None:
    reps = 2
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf1 = os.path.join(here, ".benchdata", "sf1")
    if "--sf1" in sys.argv:
        sf1 = sys.argv[sys.argv.index("--sf1") + 1]
    sf01 = "/root/testdata/sf0.1"

    import __spark_entry__ as m
    from embeddinghub_spark.session import get_spark

    spark = get_spark(app_name="bench_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    qs = m.queries()
    names = [n for n in HEADLINE_28 + TOP_EXPENSIVE if n in qs]

    def run(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(reps):
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.monotonic() - t0)
        return round(best, 3)

    # warm both datasets' footers + session
    for d in (sf01, sf1):
        spark.read.parquet(os.path.join(d, "lineitem.parquet")).count()

    out = {}
    for n in names:
        try:
            t01 = run(n, sf01)
            t1 = run(n, sf1)
            out[n] = {
                "sf0.1": t01,
                "sf1": t1,
                "ratio": round(t1 / t01, 2) if t01 > 0 else None,
            }
            print(f"{n}: sf0.1={t01}s sf1={t1}s x{out[n]['ratio']}",
                  file=sys.stderr)
        except Exception as e:
            out[n] = {"error": f"{type(e).__name__}: {e}"}
            print(f"{n}: ERROR {e}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
