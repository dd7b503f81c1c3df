"""Dump ``explain('formatted')`` for registry entries to files.

Usage: python tools/dump_plans.py OUT_DIR SUFFIX [sf_dir] query [query ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt per entry — the judge-facing plan
artifacts for the optimization rounds (plans/r16/...). Entries that
perform setup work (temp-table writes, streams) execute that setup;
the dumped plan is the final returned DataFrame's.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.1"
    if rest and os.path.isdir(rest[0]):
        sf_dir = rest[0]
        rest = rest[1:]
    names = rest
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entrymod
    from embeddinghub_spark.session import get_spark

    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for n in names:
        if n not in qs:
            print(f"unknown entry {n}", file=sys.stderr)
            continue
        try:
            df = qs[n](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR {type(e).__name__}: {e}"
        with open(os.path.join(out_dir, f"{n}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"dumped {n}", flush=True)


if __name__ == "__main__":
    main()
