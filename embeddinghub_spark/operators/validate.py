"""Declarative data-quality rule validation — the pre-ingest /
pre-training gate a 100 TB pipeline runs on every new source drop
(the great-expectations shape, computed Spark-native).

Rules are plain dicts; all single-table rules fold into ONE aggregate
pass over the table (conditional-count expressions — no per-rule
jobs, no driver loops), so validating 20 rules costs the same scan as
validating one. The ``referential`` rule needs the referenced table
and runs as a distinct-keys join (its cost is the distinct key
set, not the table). Output is one row per rule with violation
counts — a report frame a pipeline can gate on
(``violations == 0``), store as a run artifact, or diff across
drops.

r16 plan shape: the report is ONE lazy DataFrame (conditional-count
aggregate branch + one grouped-dup branch per ``unique`` rule + one
distinct-keys join branch per ``referential`` rule, unioned). The
previous design collected each branch to the driver eagerly — four
serial jobs and four driver round-trips per call before the caller
ever ran an action; now the caller's single action executes every
branch in one job (Spark schedules the independent branches
concurrently), and nothing transits the driver. Counts, labels and
the pass flag are expression-for-expression identical.

Rule types:
- ``not_null``:   column has no NULLs
- ``unique``:     column combination has no duplicate values
                  (NULL-containing keys excluded, the SQL UNIQUE
                  convention)
- ``range``:      numeric column within [lo, hi] (NULLs don't
                  violate — add not_null to forbid them)
- ``accepted_values``: column value in an allow-list (NULLs exempt)
- ``regexp``:     string column fully matches a pattern (NULLs
                  exempt)
- ``referential``: every non-NULL value exists in
                  ``ref_df[ref_column]`` (foreign-key check)

Reference semantics: SURVEY §2.5 ops tooling (the validation family
beside ``schema_diff``/``validate_pit``); rule shapes follow the
de-facto declarative-expectation vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SINGLE_PASS_TYPES = {"not_null", "range", "accepted_values", "regexp"}


def _report_row(name, rtype, col_label, violations, total):
    """One report row as a struct with the output schema's fields;
    ``passed`` derives from the violations expression so it stays a
    plan-side boolean."""
    v = violations.cast("bigint")
    return F.struct(
        F.lit(name).alias("rule"),
        F.lit(rtype).alias("rule_type"),
        F.lit(col_label).alias("column"),
        v.alias("violations"),
        total.cast("bigint").alias("total"),
        (v == 0).alias("passed"),
    )


def validate_rules(
    df: DataFrame,
    rules: list[dict],
    refs: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Evaluate ``rules`` against ``df``; returns one row per rule:
    ``(rule, rule_type, column, violations, total, passed)``.

    ``total`` is the table row count for row-scoped rules, the
    number of distinct non-NULL keys for ``unique``/``referential``.
    ``refs`` maps a referential rule's ``ref`` name to its DataFrame.
    The report is lazy — no job runs until the caller acts on it.
    """
    if not rules:
        raise ValueError("rules must be non-empty")
    names = [r.get("name") for r in rules]
    if len(set(names)) != len(names) or None in names:
        raise ValueError("every rule needs a unique 'name'")

    single_rows = []
    aggs = [F.count(F.lit(1)).alias("_total")]
    branches: list[DataFrame] = []
    for r in rules:
        t, name = r["type"], r["name"]
        if t in _SINGLE_PASS_TYPES:
            c = F.col(r["column"])
            if t == "not_null":
                bad = c.isNull()
            elif t == "range":
                lo, hi = r["lo"], r["hi"]
                bad = c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))
            elif t == "accepted_values":
                bad = c.isNotNull() & ~c.isin(list(r["values"]))
            else:  # regexp — FULL match (rlike alone is find-anywhere)
                anchored = "^(?:" + r["pattern"] + ")$"
                bad = c.isNotNull() & ~c.cast("string").rlike(anchored)
            aggs.append(
                F.sum(bad.cast("bigint")).alias(f"_v_{name}")
            )
            single_rows.append((name, t, r["column"]))
        elif t == "unique":
            cols = r.get("columns") or [r["column"]]
            nn = None
            for c in cols:
                cond = F.col(c).isNotNull()
                nn = cond if nn is None else (nn & cond)
            branches.append(
                df.filter(nn)
                .groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("_n"))
                .agg(
                    F.count(F.lit(1)).alias("_keys"),
                    F.sum(
                        F.when(F.col("_n") > 1, F.col("_n")).otherwise(0)
                    ).alias("_dup_rows"),
                )
                .select(
                    _report_row(
                        name, t, ",".join(cols),
                        F.coalesce(F.col("_dup_rows"), F.lit(0)),
                        F.coalesce(F.col("_keys"), F.lit(0)),
                    ).alias("_r")
                )
            )
        elif t == "referential":
            ref_df = (refs or {}).get(r["ref"])
            if ref_df is None:
                raise ValueError(
                    f"rule {name!r}: referential needs refs[{r['ref']!r}]"
                )
            keys = (
                df.filter(F.col(r["column"]).isNotNull())
                .select(F.col(r["column"]).alias("_k"))
                .distinct()
            )
            ref_keys = (
                ref_df.select(F.col(r["ref_column"]).alias("_k"))
                .distinct()
                .withColumn("_present", F.lit(1))
            )
            # one pass: LEFT join the distinct key sets — n_keys is the
            # row count, a missing key is a null _present (identical
            # counts to the previous count() + anti-join count() pair)
            branches.append(
                keys.join(ref_keys, "_k", "left")
                .agg(
                    F.count(F.lit(1)).alias("_nk"),
                    F.sum(
                        F.when(F.col("_present").isNull(), 1).otherwise(0)
                    ).alias("_missing"),
                )
                .select(
                    _report_row(
                        name, t, r["column"],
                        F.coalesce(F.col("_missing"), F.lit(0)),
                        F.coalesce(F.col("_nk"), F.lit(0)),
                    ).alias("_r")
                )
            )
        else:
            raise ValueError(f"unknown rule type {t!r} in rule {name!r}")

    if single_rows:
        one = df.agg(*aggs)
        row_structs = F.array(
            *[
                _report_row(
                    name, t, col,
                    F.coalesce(F.col(f"_v_{name}"), F.lit(0)),
                    F.col("_total"),
                )
                for name, t, col in single_rows
            ]
        )
        branches.insert(
            0, one.select(F.explode(row_structs).alias("_r"))
        )

    report = branches[0]
    for b in branches[1:]:
        report = report.unionByName(b)
    return report.select(
        F.col("_r.rule").alias("rule"),
        F.col("_r.rule_type").alias("rule_type"),
        F.col("_r.column").alias("column"),
        F.col("_r.violations").alias("violations"),
        F.col("_r.total").alias("total"),
        F.col("_r.passed").alias("passed"),
    )
