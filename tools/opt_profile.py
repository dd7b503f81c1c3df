"""Median-of-N per-entry profiler for the optimization rounds.

The bench times each registry entry ONCE per run; at sf0.1 most
entries are 0.3-5 s, and box noise between runs is +/-50% per entry
(r16 measurement: two back-to-back full benches disagreed on
fuzzy_clusters by 3x). Any per-entry optimization claim therefore
needs repeated, interleaved timing in ONE session: this tool runs the
named entries round-robin for --reps repetitions (default 5) after the
same warm-up bench.py uses, timing fn() + noop write exactly like the
bench, and reports per-entry median/min/max.

Usage: python tools/opt_profile.py [--reps N] [--staged] [sf_dir] query [query ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = list(sys.argv[1:])
    reps = 5
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    staged = "--staged" in args
    if staged:
        args.remove("--staged")
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    names = args

    import bench as benchmod
    import __spark_entry__ as entrymod
    from embeddinghub_spark.session import get_spark

    spark = get_spark(app_name="opt_profile")
    spark.sparkContext.setLogLevel("ERROR")
    benchmod._warmup(spark, sf_dir)

    qs = entrymod.staged_queries() if staged else entrymod.queries()
    missing = [n for n in names if n not in qs]
    if missing:
        print(f"unknown entries: {missing}", file=sys.stderr)
        sys.exit(2)

    samples: dict[str, list[float]] = {n: [] for n in names}
    for r in range(reps):
        for n in names:
            spark.sparkContext.setJobDescription(f"opt_profile:{n}#{r}")
            t0 = time.time()
            try:
                qs[n](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples[n].append(time.time() - t0)
            except Exception as e:  # noqa: BLE001
                print(f"{n} rep{r}: ERROR {type(e).__name__}: {e}",
                      file=sys.stderr)
                samples[n].append(float("nan"))
    out = {}
    for n in names:
        s = [v for v in samples[n] if v == v]
        out[n] = {
            "median": round(statistics.median(s), 3) if s else None,
            "min": round(min(s), 3) if s else None,
            "max": round(max(s), 3) if s else None,
            "n": len(s),
        }
        print(f"{n:40s} median={out[n]['median']} min={out[n]['min']} "
              f"max={out[n]['max']} n={out[n]['n']}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
