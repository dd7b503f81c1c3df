"""Pins the driver-contract invariants of __spark_entry__.py so a
future edit can't silently break certification:

- every queries() entry has an oracle_sql() twin and vice versa
  (an entry without an oracle silently downgrades to rows-only);
- no duplicate keys; the never-yet-certified window layout holds.
"""

import sys

sys.path.insert(0, "/root/repo")


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


def test_round10_window_layout():
    """The rotation for round 10 (VERDICT r9 task #1): the 2 oracle-backed
    entries staged through r9 (streaming embedding dedup-on-ingest and
    the trailing top-k PIT feature; zero driver rows, judge-verified at
    both scales) occupy positions 1-2 of the 50-slot window; positions
    3-7 are the five entries the r9 window rotated in and certified;
    8-16 are fresh r9-certified canaries; 17-49 the remaining r9
    canaries + core sentinels; slot 50 is the flagship sentinel.
    Rows-only entries can never hash-match, so they must stay OUT of
    the window. The registry is frozen at 186 entries until this window
    is certified."""
    import __spark_entry__ as m

    keys = list(m.queries().keys())
    window = keys[:50]
    rotation = ["streaming_embedding_dedup", "trailing_topk"]
    r9_rotated = [
        "decayed_trailing", "sparse_cosine_scaled", "trailing_distinct",
        "trailing_sessions", "semantic_dedup_scaled",
    ]
    r9_canaries = [
        "kn_bigram_logprob", "auc_by_group", "ranking_metrics",
        "corpus_diversity", "semantic_contamination", "skew_report",
        "ann_recall", "kn_trigram_logprob", "entity_split",
    ]
    assert window[:2] == rotation, "rotation entries must lead the window"
    assert window[2:7] == r9_rotated, "r9-rotated entries moved"
    assert window[7:16] == r9_canaries, "r9-certified canaries moved"
    assert window[-1] == "c6_pit_training_set", "flagship sentinel moved"
    assert not ROWS_ONLY & set(window), "rows-only entry wastes a window slot"
    assert len(keys) == 186, "registry is frozen at 186 entries for r10"


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
