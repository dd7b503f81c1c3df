"""Pins the driver-contract invariants of __spark_entry__.py so a
future edit can't silently break certification:

- every queries() entry has an oracle_sql() twin and vice versa
  (an entry without an oracle silently downgrades to rows-only);
- no duplicate keys; the never-yet-certified window layout holds.
"""

import sys

sys.path.insert(0, "/root/repo")


def test_queries_and_oracles_align():
    import __spark_entry__ as m

    q = list(m.queries().keys())
    o = set(m.oracle_sql().keys())
    assert len(q) == len(set(q)), "duplicate queries() keys"
    assert [n for n in q if n not in o] == [], "queries missing an oracle"
    assert [n for n in o if n not in q] == [], "oracles without a query"


def test_round4_window_layout():
    """Positions 1-49 carry only never-driver-certified entries (first-time
    coverage beats re-certification); slot 50 is the flagship sentinel."""
    import __spark_entry__ as m

    window = list(m.queries().keys())[:50]
    new_ops = {
        "semantic_dedup", "knn_join", "unigram_logprob",
        "hll_profile", "domain_tag", "histogram_quantiles",
        "perplexity_buckets", "embedding_clusters",
        "decayed_count", "robust_scale",
    }
    assert new_ops <= set(window), "a new r4 op fell out of the window"
    previously_certified = {
        "f8_scalar_funcs", "f8_date_funcs", "f8_rollup", "f8_array_funcs",
    }
    assert previously_certified.isdisjoint(window[:49]), (
        "an already-certified entry occupies a first-time-coverage slot"
    )
    assert window[-1] == "c6_pit_training_set", "flagship sentinel moved"


def test_oracle_sql_is_static():
    """Oracle strings must build without a SparkSession (the driver
    may call oracle_sql() before/without Spark)."""
    import __spark_entry__ as m

    sqls = m.oracle_sql()
    assert all(isinstance(s, str) and s.strip() for s in sqls.values())
