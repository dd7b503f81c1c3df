"""Approximate string matching: an exact edit-distance similarity
join that never enumerates all pairs.

The shape is the ED-Join / q-gram filter recipe (Gravano et al. VLDB
2001; Xiao et al. ED-Join, VLDB 2008), recast as DataFrame ops:

1. every string emits its padded character q-grams;
2. only the ``q·k + 1`` globally RAREST grams of each string (its
   "prefix" in a corpus-frequency total order) enter the candidate
   self-join — by the pigeonhole/prefix-filter theorem any pair
   within edit distance ``k`` must share a prefix gram, so the
   filter is LOSSLESS while cutting the inverted-index join from
   Σ_g df(g)² over all grams to the rare-gram tail;
3. candidates are verified with the exact ``levenshtein`` and only
   true matches survive — the gram stage affects cost, never results.

Strings too short for the pigeonhole guarantee (both sides shorter
than ``q·k − q + 2``) are matched brute-force inside their own tiny
length bucket, so the guarantee holds for EVERY pair.

Reference parity: featureform exposes no fuzzy matching; this is part
of the build addendum (SURVEY.md §2.5) — the entity-resolution /
near-key-join primitive a crawl-curation pipeline uses to reconcile
free-text keys before a PIT join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Padding sentinels (Gravano-style): guarantee every non-empty string
# has length+q-1 grams and edits near the ends still disturb q grams.
_PAD_L = "\x01"
_PAD_R = "\x02"


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
    q: int = 3,
) -> DataFrame:
    """All pairs of rows whose ``text_col`` values are within edit
    distance ``max_dist`` — EXACT results (verified by
    ``levenshtein``), candidate generation by the lossless q-gram
    prefix filter. Output: ``(id_a, id_b, dist)`` with ``id_a <
    id_b``. NULL texts never match (excluded up front).

    Scale shape: gram explode is map-only; the global gram-frequency
    table is one map-side-combining aggregate joined back on gram
    (shuffle carries (id, gram) tuples, never full texts); the
    per-string rarest-(q·k+1) prefix pick is a window over ONE
    string's ≤ len+q−1 grams; the candidate self-join runs on prefix
    grams only (work = Σ over prefix grams of df², the documented
    cost driver — rarity ordering makes these the smallest df in the
    corpus); verification joins texts back by id. The short-string
    bucket is an all-pairs join within strings shorter than
    ``q·k − q + 2`` characters — a constant-bounded subset.
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    if q < 2:
        raise ValueError("q must be >= 2")
    k = max_dist
    prefix_len = q * k + 1
    # pigeonhole bound: pairs with max(len) >= short_bound share >= 1
    # prefix gram; below it both strings go to the brute bucket too.
    short_bound = q * k - q + 2

    t = (
        df.select(
            F.col(id_col).alias("id"), F.col(text_col).alias("s")
        )
        .filter(F.col("s").isNotNull())
        .withColumn("len", F.length("s"))
    )

    padded = F.concat(
        F.lit(_PAD_L * (q - 1)), F.col("s"), F.lit(_PAD_R * (q - 1))
    )
    grams = (
        t.withColumn("_p", padded)
        .select(
            "id",
            "len",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("len") + (q - 1)),
                    lambda i: F.substring(F.col("_p"), i, q),
                )
            ).alias("gram"),
        )
        # occurrence index turns the gram bag into a set of
        # (gram, occ) elements so duplicate grams stay distinct and
        # the multiset prefix theorem applies verbatim.
        .withColumn(
            "occ",
            F.row_number().over(
                Window.partitionBy("id", "gram").orderBy(F.lit(1))
            ),
        )
    )

    df_counts = grams.groupBy("gram", "occ").agg(
        F.count(F.lit(1)).alias("df")
    )
    ranked = grams.join(df_counts, ["gram", "occ"])
    # per-string prefix: the q·k+1 rarest (df, gram, occ) elements —
    # window state is one string's own gram list, never corpus-sized.
    prefix = (
        ranked.withColumn(
            "_r",
            F.row_number().over(
                Window.partitionBy("id").orderBy("df", "gram", "occ")
            ),
        )
        .filter(F.col("_r") <= prefix_len)
        .select("id", "len", "gram", "occ")
    )

    a = prefix.alias("a")
    b = prefix.alias("b")
    cand_long = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.occ") == F.col("b.occ"))
            & (F.col("a.id") < F.col("b.id"))
            & (
                F.abs(F.col("a.len") - F.col("b.len")) <= k
            )  # ed >= |len diff|
            & (
                F.greatest(F.col("a.len"), F.col("b.len")) >= short_bound
            ),
        )
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .distinct()
    )

    shorts = t.filter(F.col("len") < short_bound)
    sa = shorts.alias("sa")
    sb = shorts.alias("sb")
    cand_short = sa.join(
        sb,
        (F.col("sa.id") < F.col("sb.id"))
        & (F.abs(F.col("sa.len") - F.col("sb.len")) <= k),
    ).select(F.col("sa.id").alias("id_a"), F.col("sb.id").alias("id_b"))

    cand = cand_long.unionByName(cand_short).distinct()

    ta = t.select(F.col("id").alias("id_a"), F.col("s").alias("_sa"))
    tb = t.select(F.col("id").alias("id_b"), F.col("s").alias("_sb"))
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("dist", F.levenshtein("_sa", "_sb"))
        .filter(F.col("dist") <= k)
        .select("id_a", "id_b", "dist")
    )


def fuzzy_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
    q: int = 3,
) -> DataFrame:
    """Entity-resolution canonicalization: transitive clusters over
    the exact edit-distance pairs — every row maps to a canonical id
    (the cluster's smallest id; singletons map to themselves). The
    end-to-end dedup-keys step: ``fuzzy_pairs`` finds the near-key
    edges without all-pairs, large-star/small-star connected
    components (functions/dedup.py) closes them transitively in
    O(log n) id-only rounds, and the output joins back to EVERY input
    row. Output: (id, canonical_id).
    """
    from embeddinghub_spark.functions.dedup import connected_components

    pairs = (
        fuzzy_pairs(df, id_col, text_col, max_dist, q)
        .select("id_a", "id_b")
        # CC materializes its node set and edge set separately from
        # this lineage; checkpointing here makes the (expensive) pair
        # join compute ONCE (interleaved A/B at sf0.1: 7.1 -> 5.2 s)
        .localCheckpoint(eager=False)
    )
    comp = connected_components(pairs)
    ids = df.select(F.col(id_col).alias("id"))
    return ids.join(
        comp.select(F.col("node").alias("id"), F.col("component")),
        "id",
        "left",
    ).select(
        F.col("id").alias(id_col),
        F.coalesce("component", "id").alias("canonical_id"),
    )
