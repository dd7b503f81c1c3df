"""Pins the driver-contract invariants of __spark_entry__.py so a
future edit can't silently break certification:

- every queries() entry has an oracle_sql() twin and vice versa
  (an entry without an oracle silently downgrades to rows-only);
- no duplicate keys; the never-yet-certified window layout holds.
"""

import pathlib
import sys

# Repo root derived from this file (ADVICE r11: hardcoded /root/repo
# broke the gate — or scanned the wrong tree — on any other checkout).
REPO = pathlib.Path(__file__).resolve().parents[1]

sys.path.insert(0, str(REPO))


# Entries the driver checks rows-only BY DESIGN (non-SQL-expressible:
# iterative argmax recursion / eigendecomposition / PAV recursion).
# Anything else missing an oracle is a silent downgrade and fails the pin.
ROWS_ONLY = {"bpe_merges", "pca_embeddings", "isotonic_calibration"}


def test_queries_and_oracles_align():
    import __spark_entry__ as m

    q = list(m.queries().keys())
    o = set(m.oracle_sql().keys())
    assert len(q) == len(set(q)), "duplicate queries() keys"
    missing = [n for n in q if n not in o and n not in ROWS_ONLY]
    assert missing == [], "queries missing an oracle"
    assert [n for n in o if n not in q] == [], "oracles without a query"
    assert [n for n in ROWS_ONLY if n not in q] == [], "stale ROWS_ONLY"


def test_round14_window_layout():
    """The rotation for round 14 (VERDICT r13 task #1): the 4
    oracle-backed entries staged through r13 (no-concat best-fit
    packing, the native Delta CDF fallback, the native Iceberg read
    with time travel, the Iceberg snapshot-incremental read; zero
    driver rows, judge-verified at both scales) occupy positions 1-4
    of the 50-slot window; positions 5-30 are the 26 canaries whose
    last green row is r5 (alphabetical); 31-37 the seven r7-stale
    canaries; 38-49 the first twelve r10-stale canaries (alphabetical;
    trailing_sessions carries to r15); slot 50 is the flagship
    sentinel. Rows-only entries can never hash-match, so they must
    stay OUT of the window. The registry is frozen at 201 entries
    until this window is certified."""
    import __spark_entry__ as m

    keys = list(m.queries().keys())
    assert len(keys) == 201, "registry frozen at 201 for r14"
    window = keys[:50]
    rotation = [
        "pack_bins", "delta_changes", "iceberg_native",
        "iceberg_increment",
    ]
    refreshed_r5_head = [
        "f8_date_funcs", "f8_moving_avg", "f8_rollup", "f8_scalar_funcs",
        "f9_stream_join", "funnel_steps", "gap_fill",
    ]
    refreshed_r7 = [
        "ann_disk_index", "backfill", "calibration_bins",
        "dedup_keep_best", "ece", "f8_tpch_q5", "winsorize",
    ]
    refreshed_r10_head = [
        "auc_by_group", "corpus_diversity", "decayed_trailing",
        "entity_split",
    ]
    assert window[:4] == rotation, "rotation entries must lead the window"
    assert window[4:11] == refreshed_r5_head, "r5 canaries moved"
    assert window[30:37] == refreshed_r7, "r7 canaries moved"
    assert window[37:41] == refreshed_r10_head, "r10 canaries moved"
    assert "trailing_sessions" not in window, "r10 leftover carries to r15"
    assert window[-1] == "c6_pit_training_set", "flagship sentinel moved"
    assert not ROWS_ONLY & set(window), "rows-only entry wastes a window slot"


def test_contract_gate_is_checkout_portable():
    """ADVICE r11: the orphan gate hardcoded /root/repo, so it broke
    (or scanned the wrong tree) on any other checkout. All paths in
    this module now derive from __file__; pin that no absolute
    checkout path creeps back in."""
    import re

    src = pathlib.Path(__file__).read_text()
    hard = re.findall(r'Path\(\s*"/', src) + re.findall(
        r'insert\(0,\s*"/', src
    )
    assert hard == [], "hardcoded checkout paths in the contract gate"
    assert (REPO / "embeddinghub_spark").is_dir()
    assert (REPO / "__spark_entry__.py").is_file()


def test_oracle_sql_is_static():
    """Oracle strings must build without a SparkSession (the driver
    may call oracle_sql() before/without Spark)."""
    import __spark_entry__ as m

    sqls = m.oracle_sql()
    assert all(isinstance(s, str) and s.strip() for s in sqls.values())


def test_staged_entries_do_not_leak_into_frozen_registry():
    """Freeze discipline: staged candidates are certified only via
    `tools/check.py --staged`; none may appear in the driver-visible
    queries()/oracle_sql() until the next rotation. Every staged entry
    has an oracle twin unless rows-only by design. (The registry may be
    empty right after a rotation promotes everything.)"""
    import __spark_entry__ as m

    staged = m.staged_queries()
    staged_oracles = m.staged_oracle_sql()
    live = set(m.queries())
    leak = set(staged) & live
    assert not leak, f"staged entries leaked into the frozen registry: {leak}"
    assert set(staged_oracles) <= set(staged)
    rows_only_staged = set()
    missing = set(staged) - set(staged_oracles) - rows_only_staged
    assert not missing, f"staged queries missing an oracle: {missing}"
    assert all(isinstance(s, str) and s.strip() for s in staged_oracles.values())


def test_no_orphan_public_definition():
    """VERDICT r10 task #2 permanent gate: every PUBLIC function or
    class defined anywhere in embeddinghub_spark must be referenced by
    name in tests/ or __spark_entry__.py (directly pinned), OR be
    called from package code outside its own definition (a building
    block whose tested consumers pin it). The r10 snapshot-tail gap
    (`shuffle_order`, `minhash_estimate_audit` landing with zero
    references anywhere) fails this; so does any future orphan — the
    repo's staging protocol (pin test / oracle twin BEFORE landing)
    made structural."""
    import ast
    import pathlib
    import re

    pkg = REPO / "embeddinghub_spark"
    test_corpus = "\n".join(
        p.read_text()
        for p in (REPO / "tests").glob("*.py")
    ) + (REPO / "__spark_entry__.py").read_text()
    pkg_srcs = {p: p.read_text() for p in pkg.rglob("*.py")}

    orphans = []
    for src in sorted(pkg_srcs):
        tree = ast.parse(pkg_srcs[src])
        for node in tree.body:
            if not isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ) or node.name.startswith("_"):
                continue
            if node.name in test_corpus:
                continue
            pat = re.compile(r"\b" + re.escape(node.name) + r"\b")
            defpat = re.compile(r"(?:def|class) " + re.escape(node.name) + r"\b")
            pkg_refs = sum(
                len(pat.findall(s)) - len(defpat.findall(s))
                for s in pkg_srcs.values()
            )
            if pkg_refs == 0:
                orphans.append(f"{src.relative_to(pkg)}:{node.name}")
    assert orphans == [], (
        "orphan public definitions (no test/entry reference, no package "
        "caller): " + ", ".join(orphans)
    )
