"""A/B the bench streaming-machinery warmup stage (VERDICT r16 #8).

Arm = one fresh JVM (classload state is per-session, so each rep is a
subprocess): run bench._warmup with (arm "plus") or without (arm
"stock") the streaming_machinery stage, then time the FIRST run of
c20_stream_materialize — the registry's first streaming entry, which
in-bench is charged the session's streaming first-use cost.

Usage:
  python tools/ab_stream_warmup.py child <stock|plus>   # one rep
  python tools/ab_stream_warmup.py <n_reps>             # alternating driver
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def child(arm: str) -> None:
    import bench
    from embeddinghub_spark.session import get_spark
    import __spark_entry__ as entrymod

    if arm == "stock":
        # drop the streaming stage: re-point the staged call list by
        # wrapping _warmup's stage() via monkeypatched source is
        # brittle; instead run the real _warmup but neutralize the
        # streaming stage through its unique tempdir prefix hook
        import tempfile

        orig = tempfile.mkdtemp

        def no_stream(prefix="", **kw):
            if prefix == "bench_warm_s_":
                raise RuntimeError("stock arm: streaming warmup disabled")
            return orig(prefix=prefix, **kw)

        tempfile.mkdtemp = no_stream
    spark = get_spark(app_name=f"ab_stream_{arm}")
    spark.sparkContext.setLogLevel("ERROR")
    bench._warmup(spark, SF_DIR)
    fn = entrymod.queries()["c20_stream_materialize"]
    t0 = time.time()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    print(f"RESULT {arm} {time.time() - t0:.3f}")


def driver(n: int) -> None:
    results: dict[str, list[float]] = {"stock": [], "plus": []}
    order = []
    for i in range(n):
        order += ["stock", "plus"] if i % 2 == 0 else ["plus", "stock"]
    for arm in order:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "child", arm],
            capture_output=True, text=True, cwd=HERE,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
        if not line:
            print(f"rep failed ({arm}): {out.stderr[-500:]}")
            continue
        v = float(line[0].split()[2])
        results[arm].append(v)
        print(f"{arm}: {v:.3f}")
    for arm, vals in results.items():
        if vals:
            s = sorted(vals)
            med = s[len(s) // 2] if len(s) % 2 else (
                s[len(s) // 2 - 1] + s[len(s) // 2]
            ) / 2
            print(f"{arm}: n={len(vals)} median={med:.3f} "
                  f"min={min(vals):.3f} max={max(vals):.3f}")


if __name__ == "__main__":
    if sys.argv[1] == "child":
        child(sys.argv[2])
    else:
        driver(int(sys.argv[1]))
