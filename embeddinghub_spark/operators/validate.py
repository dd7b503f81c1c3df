"""Declarative data-quality rule validation — the pre-ingest /
pre-training gate a 100 TB pipeline runs on every new source drop
(the great-expectations shape, computed Spark-native).

Rules are plain dicts; all single-table rules fold into ONE aggregate
pass over the table (conditional-count expressions — no per-rule
jobs, no driver loops), so validating 20 rules costs the same scan as
validating one. The ``referential`` rule needs the referenced table
and runs as a distinct-keys anti-join (its cost is the distinct key
set, not the table). Output is one row per rule with violation
counts — a report frame a pipeline can gate on
(``violations == 0``), store as a run artifact, or diff across
drops.

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
    """
    if not rules:
        raise ValueError("rules must be non-empty")
    names = [r.get("name") for r in rules]
    if len(set(names)) != len(names) or None in names:
        raise ValueError("every rule needs a unique 'name'")

    aggs = [F.count(F.lit(1)).alias("_total")]
    for r in rules:
        t = r["type"]
        if t not in _SINGLE_PASS_TYPES:
            continue
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
            F.sum(bad.cast("bigint")).alias(f"_v_{r['name']}")
        )
    one = df.agg(*aggs).collect()[0]  # bounded: one row of counters
    total = one["_total"]

    out_rows = []
    for r in rules:
        t, name = r["type"], r["name"]
        col_label = r.get("column") or ",".join(r.get("columns", []))
        if t in _SINGLE_PASS_TYPES:
            v = int(one[f"_v_{name}"] or 0)
            out_rows.append((name, t, col_label, v, int(total)))
        elif t == "unique":
            cols = r.get("columns") or [r["column"]]
            nn = None
            for c in cols:
                cond = F.col(c).isNotNull()
                nn = cond if nn is None else (nn & cond)
            stats = (
                df.filter(nn)
                .groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("_n"))
                .agg(
                    F.count(F.lit(1)).alias("_keys"),
                    F.sum(
                        F.when(F.col("_n") > 1, F.col("_n")).otherwise(0)
                    ).alias("_dup_rows"),
                )
                .collect()[0]
            )
            out_rows.append(
                (name, t, ",".join(cols),
                 int(stats["_dup_rows"] or 0), int(stats["_keys"] or 0))
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
            ref_keys = ref_df.select(
                F.col(r["ref_column"]).alias("_k")
            ).distinct()
            n_keys = keys.count()
            missing = keys.join(ref_keys, "_k", "left_anti").count()
            out_rows.append((name, t, r["column"], int(missing), int(n_keys)))
        else:
            raise ValueError(f"unknown rule type {t!r} in rule {name!r}")

    return df.sparkSession.createDataFrame(
        [(n, t, c, v, tot, v == 0) for n, t, c, v, tot in out_rows],
        "rule string, rule_type string, column string, "
        "violations bigint, total bigint, passed boolean",
    )
