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


def test_round16_window_layout():
    """The rotation for round 16 (VERDICT r15 task #1): the 6
    oracle-backed entries staged through r15 (file-pruned MERGE in
    both native table formats, compaction in both, the row-level
    DELETE/UPDATE DML pair; zero driver rows, judge-verified at both
    scales) occupy positions 1-6 of the 50-slot window; positions 7-11
    are the five r11-stale canaries carried from the r15 window
    (trailing_topk, trailing_window, v5_knn_bruteforce,
    validate_rules, winnow_pairs); positions 12-49 are the first 38 of
    the 49 canaries whose last green row is r12 (alphabetical;
    s1_csv_scan through v8_preview carry to r17); slot 50 is the
    flagship sentinel. Rows-only entries can never hash-match, so they
    must stay OUT of the window. The registry is frozen at 211 entries
    until this window is certified."""
    import __spark_entry__ as m

    keys = list(m.queries().keys())
    assert len(keys) == 211, "registry frozen at 211 for r16"
    window = keys[:50]
    rotation = [
        "delta_merge_pruned", "iceberg_merge_pruned", "delta_compact",
        "iceberg_compact", "delta_dml", "iceberg_dml",
    ]
    r11_carry = [
        "trailing_topk", "trailing_window", "v5_knn_bruteforce",
        "validate_rules", "winnow_pairs",
    ]
    r12_head = [
        "c10_feature_group_join", "c12_composite_entities",
        "c16_resource_registration", "c17_ctas",
    ]
    r12_tail = ["redact_pii", "repetition_stats", "s12_merge_upsert"]
    r17_carry = {
        "s1_csv_scan", "s3_table_scan", "s8_parquet_sink",
        "semantic_dedup", "shuffle_order", "simhash", "sparse_cosine",
        "sparse_cosine_scaled", "stratified_sample", "tf_idf",
        "v8_preview",
    }
    assert window[:6] == rotation, "rotation entries must lead the window"
    assert window[6:11] == r11_carry, "r11 carries follow the rotation"
    assert window[11:15] == r12_head, "r12 canaries moved"
    assert window[46:49] == r12_tail, "r12 canaries moved"
    assert not r17_carry & set(window), "r12 leftovers carry to r17"
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
