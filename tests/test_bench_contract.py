"""Pins bench.py's contention-aware calibration (VERDICT r13 task #2).

Round 13 proved a single post-loop calibration scalar cannot see
intra-run load: the driver's registry queries ran ~2.2x slow
(baseline28 40.95 s vs the judge's quiet-box 19.18 s raw / 17.92 s
calibrated) while its post-loop probe read within 2% of quiet. The
redesign interleaves a fixed probe through the timed loop and
calibrates from the probe MEDIAN; these tests replay that exact swing
through the new machinery and assert it would have been (a) corrected
and (b) flagged automatically.

Pure-arithmetic tests — no SparkSession.
"""

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def test_r13_driver_swing_is_corrected_and_flagged():
    """The r13 artifact replay: raw baseline28 = 40.95 s on a box
    running ~2.2x slow. Interleaved probes on that box read ~2.2x the
    frozen reference; median-based calibration lands the corrected
    number inside the judge's independently measured quiet-box range
    (19.18 raw / 17.92 calibrated), and the contention flag trips."""
    slow = bench.PROBE_REF_SEC * 2.2
    probes = [slow * f for f in (0.95, 1.0, 1.02, 0.98, 1.05, 1.0, 0.97)]
    cal = bench._median(probes)
    corrected = bench._calibrated(40.95, cal, bench.PROBE_REF_SEC)
    assert 17.0 < corrected < 20.0, corrected
    assert bench._contention(probes, bench.PROBE_REF_SEC) is True


def test_quiet_run_is_neither_rescaled_nor_flagged():
    probes = [bench.PROBE_REF_SEC * f for f in (0.95, 1.0, 1.08, 0.97, 1.02)]
    cal = bench._median(probes)
    corrected = bench._calibrated(17.1, cal, bench.PROBE_REF_SEC)
    assert abs(corrected - 17.1) < 17.1 * 0.1
    assert bench._contention(probes, bench.PROBE_REF_SEC) is False


def test_transient_mid_run_load_trips_the_spread_term():
    """Load that subsides before a post-loop probe would run — the
    exact blind spot of the r12 anchor design. Half the probes feel a
    3x-slow box, the rest read quiet: the quartile spread flags it
    even though the FINAL probe looks innocent."""
    r = bench.PROBE_REF_SEC
    probes = [r, r * 3.1, r * 2.9, r * 3.0, r * 1.02, r * 0.98]
    assert bench._contention(probes, bench.PROBE_REF_SEC) is True


def test_single_spike_neither_distorts_nor_flags():
    """One GC pause / page-cache miss must not distort the calibrated
    number (median) NOR flag the run (quartile spread): a 0.2 s
    probe's single-rep tails are ±2x on this VM class, and a max/min
    spread term flagged the quietest run on record. A lone outlier in
    either direction is absorbed; only a sustained stretch of slow
    probes (p75 inflated) or an elevated median trips."""
    r = bench.PROBE_REF_SEC
    probes = [r, r * 1.02, r * 0.99, r * 5.0, r * 1.01, r * 0.98, r]
    cal = bench._median(probes)
    corrected = bench._calibrated(17.1, cal, bench.PROBE_REF_SEC)
    assert abs(corrected - 17.1) < 17.1 * 0.1
    assert bench._contention(probes, bench.PROBE_REF_SEC) is False
    # a fast outlier (lucky scheduling slot) is equally ignored
    probes_fast = [r, r * 1.02, r * 0.99, r * 0.4, r * 1.01, r * 0.98]
    assert bench._contention(probes_fast, bench.PROBE_REF_SEC) is False


def test_calibration_edge_cases():
    assert bench._calibrated(10.0, None, 0.2) is None
    assert bench._calibrated(10.0, 0.0, 0.2) is None
    assert bench._median([]) is None
    assert bench._contention([], bench.PROBE_REF_SEC) is False


def test_probe_cadence_covers_the_registry():
    """PROBE_EVERY must give several probes across the registry loop
    (plus the closing probe) — one or two points cannot show an
    intra-run swing. 201 entries / 25 -> 9 interleaved + 1 closing."""
    import __spark_entry__ as m

    n = len(m.queries())
    interleaved = len(range(0, n, bench.PROBE_EVERY))
    assert interleaved >= 5


def test_probe_is_not_a_registry_entry():
    """The r13 review found a registry-query probe pre-warms that
    query's own raw timing; the interleaved probe is built inline.
    Guard: bench must not probe via any queries() entry."""
    import inspect

    src = inspect.getsource(bench._probe_df)
    assert "queries()" not in src and "entrymod" not in src
