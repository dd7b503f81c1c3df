"""Join two tools/sf1_scan.py raw outputs (sf0.1 and sf1 runs of the
SAME harness — per-entry noop-write wall seconds) into the round's
standing scale artifact ``SF1_r{N}.json``:

    {"sf01_dir": ..., "sf1_dir": ..., "entries":
        {name: {"sf01_s": x, "sf1_s": y, "ratio": y/x}, ...},
     "flagged": [names with ratio > FLAG_RATIO and sf1_s > FLAG_ABS_S]}

VERDICT r8 #7: the sf1 scan graduates from a one-off diagnostic to a
per-round gate artifact — every close commits SF1_r{N}.json and
PLANS_r{N} adjudicates any flagged entry against its documented
complexity class. Ratios are single-shot wall clock on a noisy VM
(±30%): the flag thresholds are coarse on purpose — they catch ×10+
super-linear landmines (the r8 scan caught ×21/×14.5/×21.8), not
×1.3 drift, which only interleaved A/B can see.

Usage: python tools/sf1_report.py <sf01_raw> <sf1_raw> <out_json> [--warm]

``--warm`` (VERDICT r12 #6): when the single-shot trips the coarse
rule, the artifact itself now carries the adjudication — each flagged
entry is re-measured as a warm interleaved A/B (alternating
sf0.1 ↔ sf1 reps in ONE SparkSession, warm-min per scale) and gains
``warm_sf01_s`` / ``warm_sf1_s`` / ``warm_ratio``; entries whose warm
ratio clears the rule land in ``self_adjudicated`` instead of needing
a manual PLANS adjudication (the redact_pii pattern: four rounds of
startup-floor single-shots, every warm A/B sub-linear). Scale dirs
come from $SF01_DIR / $SF1_DIR (defaults: /root/testdata/sf0.1 and
.benchdata/sf1).
"""

from __future__ import annotations

import json
import os
import sys

FLAG_RATIO = 10.0   # 10x data; documented-linear ops land ~x1-8 here
FLAG_ABS_S = 2.0    # ignore sub-2s sf1 entries (startup-floor noise)


def parse(path: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for line in open(path):
        parts = line.split()
        if len(parts) == 2 and parts[0] not in ("SCAN_DONE_0",):
            try:
                out[parts[0]] = float(parts[1])
            except ValueError:
                out[parts[0]] = -1.0  # ERROR sentinel
    return out


def _warm_ab(names: list[str], reps: int = 3) -> dict[str, dict]:
    """Warm interleaved A/B of the given entries: ``reps`` alternating
    (sf0.1, sf1) executions in one SparkSession, warm-min per scale.
    One session for ALL flagged entries — the point is cancelling
    session/startup cost, not isolating entries."""
    import time

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    sf01 = os.environ.get("SF01_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get(
        "SF1_DIR", os.path.join(here, ".benchdata", "sf1")
    )
    import __spark_entry__ as m
    from embeddinghub_spark.session import get_spark

    spark = get_spark(app_name="sf1_warm_adjudicate")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(m.queries())
    qs.update(m.staged_queries())
    out: dict[str, dict] = {}
    for name in names:
        fn = qs.get(name)
        if fn is None:
            continue
        t01: list[float] = []
        t1: list[float] = []
        try:
            for _ in range(reps):
                for sf_dir, acc in ((sf01, t01), (sf1, t1)):
                    t0 = time.monotonic()
                    fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    acc.append(time.monotonic() - t0)
        except Exception as e:  # an erroring warm rep must not sink the scan
            out[name] = {"warm_error": type(e).__name__}
            continue
        w01, w1 = round(min(t01), 3), round(min(t1), 3)
        out[name] = {
            "warm_sf01_s": w01,
            "warm_sf1_s": w1,
            "warm_ratio": round(w1 / w01, 2) if w01 > 0 else None,
        }
    return out


def main() -> None:
    warm = "--warm" in sys.argv
    argv = [x for x in sys.argv if x != "--warm"]
    sf01_raw, sf1_raw, out_json = argv[1], argv[2], argv[3]
    a, b = parse(sf01_raw), parse(sf1_raw)
    entries = {}
    flagged = []
    for name in b:
        x, y = a.get(name), b[name]
        if x is None or x <= 0 or y <= 0:
            entries[name] = {"sf01_s": x, "sf1_s": y, "ratio": None}
            continue
        r = round(y / x, 2)
        entries[name] = {"sf01_s": x, "sf1_s": y, "ratio": r}
        if r > FLAG_RATIO and y > FLAG_ABS_S:
            flagged.append(name)
    self_adjudicated: list[str] = []
    if warm and flagged:
        for name, w in _warm_ab(sorted(flagged)).items():
            entries[name].update(w)
            wr = w.get("warm_ratio")
            if wr is not None and wr <= FLAG_RATIO:
                self_adjudicated.append(name)
    doc = {
        "method": "tools/sf1_scan.py noop-write wall seconds, one shot "
                  "per entry per scale, serial, idle machine"
                  + ("; flagged entries re-measured as warm interleaved "
                     "A/B (3 alternating reps, one session, warm-min)"
                     if warm else ""),
        "flag_rule": f"ratio > {FLAG_RATIO} and sf1_s > {FLAG_ABS_S}",
        "entries": entries,
        "flagged": sorted(flagged),
        "self_adjudicated": sorted(self_adjudicated),
    }
    with open(out_json, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"{len(entries)} entries, flagged: {sorted(flagged)}")


if __name__ == "__main__":
    main()
