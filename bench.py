"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints one JSON line.

Each query is forced to full materialization via a cheap count-style
action (no driver-side collect of big results).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from embeddinghub_spark.session import get_spark

    spark = get_spark(app_name="embeddinghub_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: session/codegen/parquet-footer costs land on a throwaway
    # query so the first timed query reports its own cost, not startup's
    try:
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).groupBy(
            "l_returnflag"
        ).count().write.format("noop").mode("overwrite").save()
    except Exception:
        pass

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # a failing query must not sink the bench
            print(f"bench error in {name}: {type(e).__name__}: {e}", file=sys.stderr)
            timings[name] = -1.0

    ok = [v for v in timings.values() if v >= 0]
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "total_wall_clock_headline_queries",
        "value": round(sum(ok), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    prev = _load_prev_round_bench()
    if prev:
        out["delta_vs_prev"] = {
            name: round(t - prev[name], 3)
            for name, t in timings.items()
            if name in prev and t >= 0 and prev[name] >= 0
        }
        prev_common = sum(prev[n] for n in out["delta_vs_prev"])
        cur_common = sum(timings[n] for n in out["delta_vs_prev"])
        out["delta_vs_prev_total"] = round(cur_common - prev_common, 3)
    print(json.dumps(out))


def _load_prev_round_bench() -> dict[str, float] | None:
    """Per-query timings from the newest BENCH_r{N}.json, if any."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = []
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            rounds.append((int(m.group(1)), path))
    if not rounds:
        return None
    path = max(rounds)[1]
    try:
        with open(path) as fh:
            data = json.load(fh)
        # the driver wraps the bench line under "parsed"
        inner = data.get("parsed", data)
        return inner.get("queries") or None
    except Exception:
        return None


if __name__ == "__main__":
    main()
