"""functions/selection.py — DSIR importance weights + token-budget
curation. Both are pinned against pure-Python replicas (the repo's
LM-operator test discipline, tests/test_text_dedup.py style) and
against naive single-window Spark equivalents."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from embeddinghub_spark.functions.selection import (
    budget_select,
    doc_grams,
    dsir_weights,
)

DOCS = [
    # (doc_id, text, lang) — en docs share a vocabulary; zz docs use a
    # disjoint one, so the hashed-bigram model separates them sharply.
    (1, "the cat sat on the mat", "en"),
    (2, "the dog sat on the log", "en"),
    (3, "qq ww ee rr tt yy", "zz"),
    (4, "ww ee qq tt rr qq", "zz"),
    (5, "the cat and the dog", "en"),
    (6, "zz xx cc vv bb nn", "zz"),
    (7, "single", "en"),
    (8, "", "en"),  # empty: no grams, no output row
]


def _py_grams(text: str) -> list[str]:
    toks = [t for t in text.split(" ") if t]
    return toks + [
        f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
    ]


def _py_bucket(gram: str, n_buckets: int, seed: int) -> int:
    h = int(hashlib.md5(f"{gram}|{seed}".encode()).hexdigest()[:15], 16)
    return h % n_buckets


def _py_dsir(docs, n_buckets=64, alpha=1.0, seed=7):
    """Pure-Python replica of dsir_weights (same rounding discipline)."""
    per_doc: dict[int, dict[int, int]] = {}
    tgt_tot: dict[int, int] = {}
    raw_tot: dict[int, int] = {}
    for doc_id, text, lang in docs:
        grams = _py_grams(text)
        if not grams:
            continue
        cnts = per_doc.setdefault(doc_id, {})
        for g in grams:
            b = _py_bucket(g, n_buckets, seed)
            cnts[b] = cnts.get(b, 0) + 1
            raw_tot[b] = raw_tot.get(b, 0) + 1
            if lang == "en":
                tgt_tot[b] = tgt_tot.get(b, 0) + 1
    T = sum(tgt_tot.values())
    R = sum(raw_tot.values())
    K = alpha * n_buckets
    out = {}
    for doc_id, cnts in per_doc.items():
        s = 0
        n = 0
        for b, c in cnts.items():
            lr = math.log((tgt_tot.get(b, 0) + alpha) / (T + K)) - math.log(
                (raw_tot.get(b, 0) + alpha) / (R + K)
            )
            # round(9dp) then 1e9-scale with half-away-from-zero — the
            # Spark F.round(x, 0) semantics (java BigDecimal HALF_UP)
            v = round(lr, 9) * 1e9
            lrs = int(math.floor(v + 0.5)) if v >= 0 else -int(
                math.floor(-v + 0.5)
            )
            s += c * lrs
            n += c
        out[doc_id] = (n, round(s / 1e9, 6))
    return out


@pytest.fixture()
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])


def test_doc_grams_unigrams_plus_bigrams(spark, docs_df):
    rows = {
        r["doc_id"]: r["g"]
        for r in docs_df.select(
            "doc_id", doc_grams("text").alias("g")
        ).collect()
    }
    assert rows[1] == _py_grams("the cat sat on the mat")
    assert rows[7] == ["single"]  # <2 tokens → unigrams only
    assert rows[8] == []


def test_dsir_weights_match_python_replica(spark, docs_df):
    got = {
        r["doc_id"]: (r["n_grams"], r["log_weight"])
        for r in dsir_weights(
            docs_df, F.col("lang") == "en", n_buckets=64
        ).collect()
    }
    want = _py_dsir(DOCS, n_buckets=64)
    assert got == want


def test_dsir_weights_separate_in_domain(spark, docs_df):
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_weights(
            docs_df, F.col("lang") == "en", n_buckets=64
        ).collect()
    }
    # every en doc scores above every zz doc (disjoint vocabularies)
    en = [w[i] for i in (1, 2, 5, 7)]
    zz = [w[i] for i in (3, 4, 6)]
    assert min(en) > max(zz)
    assert 8 not in w  # empty doc emits no row


def test_dsir_weights_deterministic_across_partitionings(spark, docs_df):
    a = dsir_weights(docs_df, F.col("lang") == "en", n_buckets=64)
    b = dsir_weights(
        docs_df.repartition(7), F.col("lang") == "en", n_buckets=64
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_dsir_weights_rejects_bad_buckets(spark, docs_df):
    with pytest.raises(ValueError):
        dsir_weights(docs_df, F.col("lang") == "en", n_buckets=0)


# --- budget_select -------------------------------------------------------


BUDGET_ROWS = [
    # (doc_id, score, n_tokens)
    (1, 90, 40),
    (2, 80, 30),
    (3, 80, 20),  # tie on score with 2 → doc_id breaks it (2 first)
    (4, 70, 25),
    (5, 60, 10),
]


@pytest.fixture()
def budget_df(spark):
    return spark.createDataFrame(BUDGET_ROWS, ["doc_id", "score", "n_tokens"])


def test_budget_select_exact_prefix(spark, budget_df):
    # order: 1(40) 2(70) 3(90) 4(115) 5(125); budget 90 keeps 1,2,3
    out = budget_select(
        budget_df, score_col="score", cost_col="n_tokens", budget=90
    )
    got = {r["doc_id"]: r["cum_cost"] for r in out.collect()}
    assert got == {1: 40, 2: 70, 3: 90}


def test_budget_select_boundary_inclusive_then_exclusive(spark, budget_df):
    kept_89 = {
        r["doc_id"]
        for r in budget_select(
            budget_df, score_col="score", cost_col="n_tokens", budget=89
        ).collect()
    }
    assert kept_89 == {1, 2}  # 90 > 89: row 3 drops
    kept_125 = {
        r["doc_id"]
        for r in budget_select(
            budget_df, score_col="score", cost_col="n_tokens", budget=125
        ).collect()
    }
    assert kept_125 == {1, 2, 3, 4, 5}


def test_budget_select_matches_naive_window(spark, sf_dir):
    """On real data: equal to the single-partition global-window
    formulation (which we refuse to ship, but is the semantic spec)."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            F.col("n_chars").alias("score"),
            F.regexp_count("text", F.lit("[^ ]+")).alias("n_tokens"),
        )
    )
    budget = 5_000
    got = {
        (r["doc_id"], r["cum_cost"])
        for r in budget_select(
            docs, score_col="score", cost_col="n_tokens", budget=budget
        ).collect()
    }
    w = (
        Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r["doc_id"], r["cum"])
        for r in docs.withColumn(
            "cum", F.sum(F.col("n_tokens").cast("bigint")).over(w)
        )
        .filter(F.col("cum") <= budget)
        .collect()
    }
    assert got == want and len(got) > 0


def test_budget_select_plan_has_no_global_window(spark, budget_df):
    """The window must be keyed by _pid (range partition), never a
    single-partition global sort — the C5 scale discipline."""
    out = budget_select(
        budget_df, score_col="score", cost_col="n_tokens", budget=90
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_pid" in plan
    # a global window renders as "Window [...] , [score DESC" with no
    # partition spec; partitioned windows render "partitionBy" via
    # hashpartitioning(_pid...)
    assert "hashpartitioning(_pid" in plan or "hashpartitioning('_pid" in plan
