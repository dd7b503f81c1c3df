"""Interleaved same-session A/B for c11_lag_features (VERDICT r5 #5).

git shows `operators/pit.py` and `q_c11_lag_features` are byte-identical
between the r4 close (496c029) and HEAD, so there is no "r4 shape vs r5
shape" to compare — the code paths are the same object. The observed
0.76 s (r4 bench) vs 1.17 s (r5 bench) delta can therefore only be
session/VM noise. This script adjudicates that with numbers: N
interleaved reps of c11 and a control query (c10, which got FASTER in
the same bench) in one session at sf0.1, reporting min/median/max. If
c11's same-session spread covers the 0.41 s bench delta, the bench
delta is noise, full stop.

Usage: python tools/ab_c11.py [--reps 8]
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
    spark = get_spark(app_name="ab_c11")
    qs = m.queries()
    names = ["c11_lag_features", "c10_feature_group_join"]
    # warm both
    for n in names:
        qs[n](spark, sf).count()
    times: dict[str, list[float]] = {n: [] for n in names}
    for r in range(reps):
        for n in names:  # interleaved: c11, c10, c11, c10, ...
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
