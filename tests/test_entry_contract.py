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


def test_round5_window_layout():
    """The ledger-closing rotation: every entry that had no driver
    CORRECTNESS row after r4 (the 25 post-window r4 additions) plus the
    four f8 entries evicted since their r2 certification sit inside the
    50-slot window; slot 50 is the flagship sentinel."""
    import __spark_entry__ as m

    window = list(m.queries().keys())[:50]
    debt = {
        "dup_spans", "cms_topk", "nb_classifier", "weighted_sample",
        "pagerank", "rrf_fusion", "f9_stream_join", "trim_spans",
        "zorder_key", "gap_fill", "funnel_steps", "hash_vectorizer",
        "sparse_cosine", "snapshot_diff", "curation_v2",
        "incremental_spans", "cohort_retention", "source_divergence",
        "negative_samples", "hard_negatives", "normalize_text",
        "bloom_filter", "s2_json_scan", "cap_per_group", "f8_moving_avg",
        "f8_scalar_funcs", "f8_date_funcs", "f8_rollup", "f8_array_funcs",
    }
    missing = debt - set(window)
    assert not missing, f"uncertified entries fell out of the window: {missing}"
    assert window[-1] == "c6_pit_training_set", "flagship sentinel moved"


def test_oracle_sql_is_static():
    """Oracle strings must build without a SparkSession (the driver
    may call oracle_sql() before/without Spark)."""
    import __spark_entry__ as m

    sqls = m.oracle_sql()
    assert all(isinstance(s, str) and s.strip() for s in sqls.values())
