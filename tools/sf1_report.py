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

Usage: python tools/sf1_report.py <sf01_raw> <sf1_raw> <out_json>
"""

from __future__ import annotations

import json
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


def main() -> None:
    sf01_raw, sf1_raw, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
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
    doc = {
        "method": "tools/sf1_scan.py noop-write wall seconds, one shot "
                  "per entry per scale, serial, idle machine",
        "flag_rule": f"ratio > {FLAG_RATIO} and sf1_s > {FLAG_ABS_S}",
        "entries": entries,
        "flagged": sorted(flagged),
    }
    with open(out_json, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"{len(entries)} entries, flagged: {sorted(flagged)}")


if __name__ == "__main__":
    main()
