"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints JSON to stdout.

Each query is forced to full materialization via a cheap count-style
action (no driver-side collect of big results).

Output contract (the round driver records only the LAST 2,000 chars of
stdout and parses the last line as JSON — a 93-query map alone exceeds
that, which is what made round 3's artifact unparseable):

- line 1: FULL detail — every query at 3 decimals plus per-query
  ``delta_vs_prev`` (long; the artifact keeps only its tail).
- line 2 (final, guaranteed < 1,900 chars): the parseable summary —
  ``metric/value/unit/sf``, the 28 BASELINE.md headline queries as a
  name→seconds map, and ALL queries as ``queries_ms`` (integer
  milliseconds, ordered exactly like ``queries()``'s dict — zip with
  its keys to recover the full map).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Box-calibration anchor (VERDICT r12 task #2, redesigned per VERDICT r13
# task #2): the r11->r12 bench delta (16.60 -> 22.78 s baseline28) cost a
# full judge A/B to adjudicate because identical code cannot be compared
# across sessions on a drifting box. Round 13 then proved a SINGLE post-loop
# scalar is not enough: the r13 driver run measured its queries ~2.2x slow
# (baseline28 40.95 s vs the judge's quiet-box 19.18 s) while its post-loop
# calibration read within 2% of quiet — intra-run contention that subsided
# (or that one 0.2 s probe couldn't feel) was invisible.
#
# The anchor is now CONTENTION-AWARE:
# - a FIXED probe query (built inline below, deliberately NOT a registry
#   entry — the r13 review showed a registry probe pre-warms that query's
#   own raw timing) is compiled once untimed during warm-up, then timed
#   every PROBE_EVERY registry entries THROUGH the loop plus once after it;
# - the bench emits the full probe series (wall seconds + 1-min loadavg at
#   each probe), cal_median / cal_min / cal_max, and
#   ``baseline28_calibrated = baseline28_total * (PROBE_REF_SEC /
#   cal_median)``;
# - ``contention: true`` flags a run whose probe series is itself skewed
#   (max/min > CONTENTION_SPREAD) or whose median sits more than
#   CONTENTION_RATIO above the frozen reference — either way the RAW
#   numbers of that run are not comparable across rounds and the calibrated
#   number (median-based, so robust to a transient spike) is the one to
#   cite;
# - per-query time.process_time() deltas land in the detail line
#   (queries_cpu) with the total as py_cpu_sec — the Python driver's CPU is
#   a small fraction of wall for JVM-side work, but a round where even THAT
#   inflates is self-evidently load, not plan regression.
#
# PROBE_REF_SEC is FROZEN at the r14 quiet-box measurement (sf0.1,
# local[32]); do not re-measure it — recalibrating the reference would
# defeat the anchor. The legacy post-loop scalar (CAL_QUERY warm-min vs
# CAL_REF_SEC) is still emitted for continuity with the r12/r13 artifacts.
CAL_QUERY = "c3_materialize_latest"
CAL_REPS = 3
# frozen 2026-08-16 (r13 close, post-loop protocol): warm-min 0.2093 s
# on a quiet-box run where baseline28_total = 17.115 s — i.e. calibrated
# numbers read as "seconds on a box state where the headline-28 ran in
# ~17.1 s"
CAL_REF_SEC = 0.2093
PROBE_EVERY = 25
# frozen 2026-08-16 (r14, interleaved-probe protocol): the IN-BENCH
# probe median of the r14 round-close run on the quietest box state
# on record (raw baseline28_total = 16.5 s, faster than every prior
# quiet close; legacy post-loop scalar 0.191 vs its 0.209 reference).
# The reference must come from a probe series measured INSIDE a full
# bench run — probes between registry entries run in a heavy JVM (GC
# pressure from 200 queries) and read ~20% slower than the same probe
# in a light probe-only session, so a light-session reference would
# make every calibrated number over-correct downward. Calibrated
# numbers read as "seconds on a box state where the headline-28 ran
# in ~16.5 s". Do not re-measure — recalibrating the reference
# defeats the anchor.
PROBE_REF_SEC = 0.25
CONTENTION_SPREAD = 1.6
CONTENTION_RATIO = 1.3

# the 28 queries BASELINE.md's 48.73 s figure covers (BENCH_r01 order)
HEADLINE_28 = [
    "c1_sql_transformation", "c2_df_transformation", "c3_materialize_latest",
    "c4_materialize_no_ts", "c5_chunked_segment", "c6_pit_training_set",
    "c8_pit_label_no_ts", "c9_pit_feature_no_ts", "c11_lag_features",
    "c14_batch_features", "c15_train_test_split", "c16_resource_registration",
    "s5_incremental_read", "v5_knn_bruteforce", "dedup_exact", "text_stats",
    "minhash_bands", "jaccard_pairs", "simhash", "embedding_near_dup",
    "c12_composite_entities", "c10_feature_group_join", "f8_json_extract",
    "f8_window_topn", "f8_set_ops", "f8_cte_having", "f8_scalar_funcs",
    "f8_date_funcs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from embeddinghub_spark.session import get_spark

    spark = get_spark(app_name="embeddinghub_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up (VERDICT r6/r7 task: per-query times must not depend on
    # dict position). One untimed pre-pass exercises every session
    # startup-cost class so the first timed entries report their own
    # cost, not the session's: parquet footer reads for ALL tables,
    # whole-stage-codegen compilation via a shuffle agg, the broadcast
    # machinery, WindowExec, and the Python/Arrow worker pool that the
    # first mapInPandas query would otherwise pay to spin up.
    # BENCH_WARMUP=full additionally runs the entire registry once
    # untimed (doubles wall clock; off by default).
    _warmup(spark, sf_dir)

    qs = entrymod.queries()
    if os.environ.get("BENCH_WARMUP") == "full":
        for name, fn in qs.items():
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                pass
    timings: dict[str, float] = {}
    cpu_times: dict[str, float] = {}
    probes: list[float] = []
    probe_loads: list[float] = []

    def run_probe() -> None:
        p = _probe(spark, sf_dir)
        if p is not None:
            probes.append(p)
            probe_loads.append(_loadavg1())

    for i, (name, fn) in enumerate(qs.items()):
        if i % PROBE_EVERY == 0:  # interleaved box-state probe
            run_probe()
        t0 = time.time()
        c0 = time.process_time()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
            cpu_times[name] = round(time.process_time() - c0, 4)
        except Exception as e:  # a failing query must not sink the bench
            print(f"bench error in {name}: {type(e).__name__}: {e}", file=sys.stderr)
            timings[name] = -1.0
            cpu_times[name] = -1.0
    run_probe()  # closing probe — the series must cover the loop's tail

    # legacy post-loop scalar (r12/r13 artifact continuity; runs AFTER
    # the timed loop so it never pre-warms a headline query's raw time)
    cal_now = _calibrate(spark, sf_dir, qs)
    cal_median = _median(probes)
    ok = [v for v in timings.values() if v >= 0]
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    detail = {
        "metric": "total_wall_clock_headline_queries",
        "value": round(sum(ok), 3),
        "unit": "sec",
        "queries": timings,
        "queries_cpu": cpu_times,
        "sf": sf_val,
        "calibration_sec": cal_now,
        "calibration_ref_sec": CAL_REF_SEC,
        "cal_probes": [round(p, 4) for p in probes],
        "cal_probe_loadavg": [round(v, 2) for v in probe_loads],
        "cal_probe_every": PROBE_EVERY,
        "cal_median": cal_median,
        "probe_ref_sec": PROBE_REF_SEC,
    }
    prev = _load_prev_round_bench()
    if prev:
        detail["delta_vs_prev"] = {
            name: round(t - prev[name], 3)
            for name, t in timings.items()
            if name in prev and t >= 0 and prev[name] >= 0
        }
        prev_common = sum(prev[n] for n in detail["delta_vs_prev"])
        cur_common = sum(timings[n] for n in detail["delta_vs_prev"])
        detail["delta_vs_prev_total"] = round(cur_common - prev_common, 3)
    print(json.dumps(detail))

    baseline28 = {
        n: timings[n] for n in HEADLINE_28 if n in timings
    }
    baseline28_total = round(
        sum(v for v in baseline28.values() if v >= 0), 3
    )
    summary = {
        "metric": "total_wall_clock_headline_queries",
        "value": round(sum(ok), 3),
        "unit": "sec",
        "queries": baseline28,
        "baseline28_total": baseline28_total,
        "calibration_sec": cal_now,
        "baseline28_calibrated": _calibrated(
            baseline28_total, cal_median, PROBE_REF_SEC
        ),
        "baseline28_calibrated_legacy": _calibrated(
            baseline28_total, cal_now, CAL_REF_SEC
        ),
        "cal_median": cal_median,
        "cal_min": round(min(probes), 4) if probes else None,
        "cal_max": round(max(probes), 4) if probes else None,
        "cal_n": len(probes),
        "contention": _contention(probes, PROBE_REF_SEC),
        "py_cpu_sec": round(
            sum(v for v in cpu_times.values() if v >= 0), 2
        ),
        "queries_n": len(timings),
        "queries_ms": [
            int(round(t * 1000)) if t >= 0 else -1 for t in timings.values()
        ],
        "queries_ms_order": "queries() dict order",
        "sf": sf_val,
    }
    if "delta_vs_prev_total" in detail:
        summary["delta_vs_prev_total"] = detail["delta_vs_prev_total"]
    line = json.dumps(summary, separators=(",", ":"))
    if len(line) > 1900:  # never regress the artifact's parseability
        summary.pop("queries_ms", None)
        line = json.dumps(summary, separators=(",", ":"))
    print(line)


def _probe_df(spark, sf_dir: str):
    """The interleaved calibration probe: a fixed one-exchange
    aggregate over orders (scan -> partial hash agg -> exchange ->
    final agg), deliberately NOT a registry entry so probing never
    pre-warms any timed query's own raw number. ~0.15 s at
    sf0.1/local[32] on a quiet box."""
    from pyspark.sql import functions as F

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    return orders.groupBy("o_orderpriority").agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("bigint")
        ).alias("cents"),
        F.count("*").alias("n"),
        F.max("o_orderdate").alias("mx"),
    )


def _probe(spark, sf_dir: str) -> float | None:
    t0 = time.time()
    try:
        _probe_df(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception as e:
        print(f"bench probe failed (non-fatal): {e}", file=sys.stderr)
        return None
    return time.time() - t0


def _loadavg1() -> float:
    try:
        return os.getloadavg()[0]
    except OSError:  # platform without getloadavg
        return -1.0


def _median(vals: list[float]) -> float | None:
    if not vals:
        return None
    s = sorted(vals)
    n = len(s)
    mid = s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2
    return round(mid, 4)


def _calibrated(
    raw_total: float, cal: float | None, ref: float
) -> float | None:
    """``raw_total`` rescaled to the frozen reference box state:
    what the total would have measured when the probe ran in ``ref``
    seconds. Median-based when fed ``cal_median``, so a single
    transient spike doesn't distort the whole run."""
    if not cal or cal <= 0:
        return None
    return round(raw_total * (ref / cal), 3)


def _contention(probes: list[float], ref: float) -> bool:
    """True when the run's raw numbers are NOT cross-round comparable:
    the probe series is internally skewed (a sustained stretch of the
    run saw a far slower box) or the whole run sat well above the
    frozen reference. The r13 driver swing — queries ~2.2x slow while
    a single post-loop probe read quiet — trips this via the ratio
    term as soon as the interleaved probes feel the load.

    The spread term compares QUARTILES (p75/p25), not max/min: a
    0.2 s probe's single-rep tails are ±2x on this VM class (one GC
    pause, one lucky scheduling slot), and a max/min spread flagged
    the quietest run on record while median calibration had already
    absorbed the outliers. Sustained half-run load still inflates p75
    and trips; a lone spike in either direction does not."""
    if not probes:
        return False
    ps = sorted(probes)
    n = len(ps)
    if n >= 4:
        spread = ps[(3 * n) // 4] / max(ps[n // 4], 1e-9)
    else:
        spread = ps[-1] / max(ps[0], 1e-9)
    med = _median(probes) or 0.0
    return spread > CONTENTION_SPREAD or med > ref * CONTENTION_RATIO


def _calibrate(spark, sf_dir: str, qs) -> float | None:
    """Warm-min of CAL_REPS reps of the pinned calibration query, run
    after the timed loop so it measures the box (never session startup,
    and never pre-warming the query's own raw timing). Returns None
    (and the summary carries a null calibrated number) if the pinned
    query is missing or fails — the bench itself must never sink on
    the anchor."""
    fn = qs.get(CAL_QUERY)
    if fn is None:
        print(f"bench calibration query {CAL_QUERY} missing (non-fatal)",
              file=sys.stderr)
        return None
    reps = []
    for _ in range(CAL_REPS):
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:
            print(f"bench calibration failed (non-fatal): {e}", file=sys.stderr)
            return None
        reps.append(time.time() - t0)
    return round(min(reps), 4)


def _warmup(spark, sf_dir: str) -> None:
    """Untimed pre-pass over every session startup-cost class. Each
    stage is individually guarded: one failing stage (e.g. a missing
    table in a custom SPARK_GRAFT_SF_DIR) must not silently skip the
    remaining stages and reintroduce the position-dependent timing
    bias this pre-pass exists to remove."""
    from pyspark.sql import functions as F

    tables = (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split()
    dfs = {}

    def stage(name, fn):
        try:
            fn()
        except Exception as e:
            print(f"bench warm-up stage {name} failed (non-fatal): {e}",
                  file=sys.stderr)

    def footer(t):
        dfs[t] = spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
        dfs[t].count()

    for t in tables:  # parquet footers + schema inference for all inputs
        stage(f"footer:{t}", lambda t=t: footer(t))

    def shuffle_agg():  # whole-stage codegen + shuffle write/read paths
        dfs["lineitem"].groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity"), F.avg("l_extendedprice"), F.count("*")
        ).write.format("noop").mode("overwrite").save()

    def bcast_join():  # broadcast-hash-join machinery
        dfs["nation"].join(
            F.broadcast(dfs["region"]),
            dfs["nation"]["n_regionkey"] == dfs["region"]["r_regionkey"],
        ).write.format("noop").mode("overwrite").save()

    def window_exec():  # WindowExec
        from pyspark.sql import Window

        w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
        dfs["orders"].select(F.row_number().over(w).alias("rn")).write.format(
            "noop"
        ).mode("overwrite").save()

    def py_workers():  # Python/Arrow worker pool (mapInPandas spin-up)
        sdf = dfs["nation"].select("n_nationkey")
        sdf.mapInPandas(lambda it: it, schema=sdf.schema).write.format(
            "noop"
        ).mode("overwrite").save()

    def tokenize_sort():  # explode-tokenize + multi-stage agg + sort
        dfs["documents"].select(
            F.explode(F.split("text", " ")).alias("w")
        ).groupBy("w").count().orderBy(F.desc("count")).limit(
            10
        ).write.format("noop").mode("overwrite").save()

    def fingerprint_agg():  # regexp+md5 codegen over documents (the
        # dedup_exact shape: r8 adjudication left it ~4x its A/B
        # steady state at window position 16 — the regexp/md5-heavy
        # expression class had no untimed pre-pass of its own)
        dfs["documents"].select(
            F.md5(
                F.trim(
                    F.regexp_replace(
                        F.regexp_replace(
                            F.lower("text"), "[^a-z0-9 ]", ""
                        ),
                        " +",
                        " ",
                    )
                )
            ).alias("fp")
        ).groupBy("fp").count().write.format("noop").mode(
            "overwrite"
        ).save()

    def probe_compile():  # the interleaved calibration probe's plan
        # compiles once untimed here so probe #1 measures the box,
        # not codegen compilation
        _probe_df(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    def parquet_write():  # file-WRITE path (r16: the committer, codec
        # and write-side codegen classes, the range partitioner's
        # sampling machinery, the _metadata.file_path scan feature,
        # and the driver's first pyarrow import were all unwarmed —
        # the registry's first entries are the native table-format
        # DML ops, which were charged ~2-10 s of session first-use
        # cost that steady-state interleaved reps don't show)
        import shutil
        import tempfile

        import pyarrow.parquet  # noqa: F401  (driver-side first import)

        d = tempfile.mkdtemp(prefix="bench_warm_w_")
        try:
            dfs["nation"].repartitionByRange(2, "n_nationkey").write.mode(
                "overwrite"
            ).parquet(os.path.join(d, "t"))
            spark.read.parquet(os.path.join(d, "t")).select(
                F.col("_metadata.file_path")
            ).write.format("noop").mode("overwrite").save()
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def streaming_machinery():  # Structured Streaming first-use costs
        # (r17; the r16 candidate re-tried per VERDICT #8 on a box
        # where the A/B separates): the micro-batch execution engine,
        # offset/commit WAL classes, FileStreamSource listing and the
        # foreachBatch plumbing load on the session's FIRST stream —
        # charged to the first streaming entry (c20_stream_materialize,
        # registry position 17) in every bench run, ~1.5-2 s that
        # steady-state interleaved reps don't show. One tiny
        # availableNow foreachBatch stream over a 2-row temp dir pays
        # it untimed. Additions-only: no timed methodology change.
        import shutil
        import tempfile

        d = tempfile.mkdtemp(prefix="bench_warm_s_")
        try:
            src = os.path.join(d, "src")
            dfs["region"].limit(2).write.mode("overwrite").parquet(src)
            sdf = spark.readStream.schema(
                dfs["region"].schema
            ).parquet(src)
            q = (
                sdf.writeStream.foreachBatch(
                    lambda b, _i: b.write.format("noop")
                    .mode("overwrite")
                    .save()
                )
                .option("checkpointLocation", os.path.join(d, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(60)
        finally:
            shutil.rmtree(d, ignore_errors=True)

    stage("shuffle_agg", shuffle_agg)
    stage("probe_compile", probe_compile)
    stage("broadcast_join", bcast_join)
    stage("window_exec", window_exec)
    stage("python_workers", py_workers)
    stage("tokenize_sort", tokenize_sort)
    stage("fingerprint_agg", fingerprint_agg)
    stage("parquet_write", parquet_write)
    stage("streaming_machinery", streaming_machinery)


def _load_prev_round_bench() -> dict[str, float] | None:
    """Per-query timings from the newest BENCH_r{N}.json whose
    ``parsed`` is usable — rounds with a null parse (r3's overlong
    line) are skipped, falling back to the newest parseable round."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = []
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            rounds.append((int(m.group(1)), path))
    for _, path in sorted(rounds, reverse=True):
        try:
            with open(path) as fh:
                data = json.load(fh)
            # the driver wraps the bench line under "parsed"
            inner = data.get("parsed") or (data if "queries" in data else None)
            qs = (inner or {}).get("queries")
            if qs:
                return qs
        except Exception:
            continue
    return None


if __name__ == "__main__":
    main()
