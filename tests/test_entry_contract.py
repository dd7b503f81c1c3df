"""Pins the driver-contract invariants of __spark_entry__.py so a
future edit can't silently break certification:

- every queries() entry has an oracle_sql() twin and vice versa
  (an entry without an oracle silently downgrades to rows-only);
- no duplicate keys; the never-yet-certified window layout holds.
"""

import sys

sys.path.insert(0, "/root/repo")


# Entries the driver checks rows-only BY DESIGN (non-SQL-expressible:
# iterative argmax recursion). Anything else missing an oracle is a
# silent downgrade and fails the pin.
ROWS_ONLY = {"bpe_merges", "pca_embeddings"}


def test_queries_and_oracles_align():
    import __spark_entry__ as m

    q = list(m.queries().keys())
    o = set(m.oracle_sql().keys())
    assert len(q) == len(set(q)), "duplicate queries() keys"
    missing = [n for n in q if n not in o and n not in ROWS_ONLY]
    assert missing == [], "queries missing an oracle"
    assert [n for n in o if n not in q] == [], "oracles without a query"
    assert [n for n in ROWS_ONLY if n not in q] == [], "stale ROWS_ONLY"


def test_round6_window_layout():
    """The ledger-closing rotation for round 6: every round-5 addition
    that landed past the frozen r5 window (36 entries, never
    driver-certified) sits inside the 50-slot window; slot 50 is the
    flagship sentinel. The registry is frozen at 164 entries until this
    window is certified."""
    import __spark_entry__ as m

    keys = list(m.queries().keys())
    window = keys[:50]
    debt = {
        "hll_by_group", "quantiles_by_group", "quantize_embeddings",
        "bigram_logprob", "winnow_pairs", "source_overlap",
        "robust_scale_by", "join_fanout", "validate_rules", "cdc_apply",
        "scd2_build", "scd2_lookup", "scd2_merge", "fuzzy_join",
        "fuzzy_clusters", "event_transitions", "class_tf_idf",
        "bpe_merges", "mm_phash", "bloom_join", "colocated_join",
        "auto_join", "kfold_split", "temporal_split",
        "temperature_mixture", "pca_embeddings", "winsorize", "psi_drift",
        "ann_disk_index", "dedup_keep_best", "binary_auc",
        "calibration_bins", "ece", "backfill", "f8_tpch_q3", "f8_tpch_q5",
    }
    assert len(debt) == 36
    missing = debt - set(window)
    assert not missing, f"uncertified entries fell out of the window: {missing}"
    assert window[-1] == "c6_pit_training_set", "flagship sentinel moved"
    assert len(keys) == 164, "registry is frozen at 164 entries for r6"


def test_oracle_sql_is_static():
    """Oracle strings must build without a SparkSession (the driver
    may call oracle_sql() before/without Spark)."""
    import __spark_entry__ as m

    sqls = m.oracle_sql()
    assert all(isinstance(s, str) and s.strip() for s in sqls.values())


def test_staged_r7_entries_do_not_leak_into_frozen_registry():
    """r6 freeze discipline: the staged r7 candidates are certified
    only via `tools/check.py --staged`; none of them may appear in the
    driver-visible queries()/oracle_sql() until the r7 rotation. Every
    staged entry has an oracle twin unless rows-only by design."""
    import __spark_entry__ as m

    staged = m.staged_queries()
    staged_oracles = m.staged_oracle_sql()
    live = set(m.queries())
    assert staged, "staged registry unexpectedly empty"
    leak = set(staged) & live
    assert not leak, f"staged entries leaked into the frozen registry: {leak}"
    assert set(staged_oracles) <= set(staged)
    rows_only_staged = {"isotonic_calibration"}
    missing = set(staged) - set(staged_oracles) - rows_only_staged
    assert not missing, f"staged queries missing an oracle: {missing}"
    assert all(isinstance(s, str) and s.strip() for s in staged_oracles.values())
