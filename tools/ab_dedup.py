"""Interleaved same-session A/B for dedup_exact (VERDICT r6/r7 #3).

`functions/dedup.py` and `q_dedup_exact` are byte-identical since the
r5 close, yet the bench history reads 0.41/0.38 s (r4/r5), 2.37 s (r6),
1.89 s (r7) — a 6× swing on unchanged code. This script adjudicates
noise-vs-creep with numbers: N interleaved reps of dedup_exact and a
control query (text_stats — same documents-table scan shape, stable
across rounds) in one session at sf0.1, reporting min/median/max. If
dedup_exact's same-session spread covers the bench deltas, the history
is session/VM noise; a stable same-session median near 2 s would
instead indicate real creep.

Usage: python tools/ab_dedup.py [--reps 8]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as m
    from embeddinghub_spark.session import get_spark

    reps = 8
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_dedup")
    spark.sparkContext.setLogLevel("ERROR")
    qs = m.queries()
    names = ["dedup_exact", "text_stats"]
    # warm both
    for n in names:
        qs[n](spark, sf).count()
    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for n in names:  # interleaved: dedup, control, dedup, control...
            t0 = time.monotonic()
            qs[n](spark, sf).count()
            times[n].append(time.monotonic() - t0)
    out = {}
    for n in names:
        ts = times[n]
        out[n] = {
            "reps": [round(t, 3) for t in ts],
            "min": round(min(ts), 3),
            "median": round(statistics.median(ts), 3),
            "max": round(max(ts), 3),
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
