"""Physical-plan audit: counts shuffles / broadcasts / shuffled joins
and flags cartesian products for every ``queries()`` entry, plus spot
checks (PushedFilters on incremental scans, ReadSchema pruning).

Usage: python tools/audit_plans.py [--staged] [sf_dir] [query ...]
(--staged audits the staged_queries() r7 candidates instead of the
frozen registry.)

Feeds PLANS_r{N}.md — run after plan-shape changes to catch a new
exchange or a lost pushdown before the bench does.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = list(sys.argv[1:])
    staged = "--staged" in args
    if staged:
        args.remove("--staged")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod
    from embeddinghub_spark.session import get_spark

    spark = get_spark(app_name="plan_audit")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.staged_queries() if staged else entrymod.queries()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — audit must not die on one query
            print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)
            continue
        shuffles = len(re.findall(r"Exchange (hash|range)partitioning", plan))
        bcast = len(re.findall(r"BroadcastExchange", plan))
        joins = len(re.findall(r"SortMergeJoin|ShuffledHashJoin", plan))
        cart = "CartesianProduct" in plan
        pushed = re.findall(r"PushedFilters: \[[^\]]+\]", plan)
        pushed_n = sum(1 for p in pushed if p != "PushedFilters: []")
        flags = " CARTESIAN!" if cart else ""
        print(
            f"{name}: shuffles={shuffles} broadcast={bcast} "
            f"shuffled_joins={joins} pushed_filter_scans={pushed_n}{flags}",
            flush=True,
        )


if __name__ == "__main__":
    main()
