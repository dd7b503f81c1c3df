"""Time given registry queries once at the derived sf1 dataset —
the wide-net companion to tools/bench_sf1.py (which reps the headline
+ top-10): one pass over everything else to flag super-linear
scaling suspects by comparing against the sf0.1 bench timings.

Usage: python tools/sf1_scan.py <query> [query ...]
Prints one `name seconds` line per query (errors print `name ERROR`).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf1 = os.environ.get(
        "SF1_DIR", os.path.join(here, ".benchdata", "sf1")
    )
    import __spark_entry__ as m
    from embeddinghub_spark.session import get_spark

    spark = get_spark(app_name="sf1_scan")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf1, "lineitem.parquet")).count()
    qs = dict(m.queries())
    qs.update(m.staged_queries())  # staged candidates scan too
    for name in sys.argv[1:]:
        try:
            t0 = time.monotonic()
            qs[name](spark, sf1).write.format("noop").mode(
                "overwrite"
            ).save()
            print(f"{name} {round(time.monotonic() - t0, 2)}", flush=True)
        except Exception as e:
            print(f"{name} ERROR {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
