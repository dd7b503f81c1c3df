"""Physical-layout operators: multi-dimensional clustering keys.

At 100 TB the cheapest query is the one whose files you never open:
min/max footer stats (parquet row groups, Delta/Iceberg file stats)
prune scans only if rows with nearby values sit in the same files.
Sorting clusters ONE column perfectly and the others not at all;
Z-ORDERING interleaves the bits of several columns so a range
predicate on ANY of them touches ~N^((d-1)/d) of the files — the
standard multi-dimensional clustering recipe (Morton order; the same
layout Delta OPTIMIZE ZORDER BY computes).

Everything here is exact integer arithmetic (min-max scale by bigint
multiply/divide, bit interleave by shift/mask) — deterministic and
replayable by any SQL engine, so the clustering KEY itself is
oracle-checked, not just asserted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_expr(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Min-max scale a bigint column onto [0, 2^bits):
    ``floor((x - min) * (2^bits - 1) / (max - min))``. The division
    is double in Spark AND DuckDB (`/` on integers is float in
    both), so the two engines see identical bits; the product stays
    exact in a double while ``span * (2^bits - 1) < 2^53`` — far
    beyond any real column span at bits=16. That bound is ENFORCED,
    not just documented: a span past it would silently yield
    off-by-one (or bigint-wrapped) Morton keys, so the expression
    carries an ``assert_true`` guard that fails the job with the
    bound in the message — the eager-validation style of
    ``z_order_key``'s 62-bit check, applied to the one limit that
    can only be known at runtime. Constant columns (max == min)
    scale to 0."""
    span = cmax - cmin
    max_span = (1 << 53) // ((1 << bits) - 1)
    guard = F.assert_true(
        span <= F.lit(max_span),
        F.concat(
            F.lit("z-order scale overflow: column span "),
            span.cast("string"),
            F.lit(
                f" exceeds the 2^53 exactness bound ({max_span}) for "
                f"bits={bits}; reduce bits or pre-bucket the column"
            ),
        ),
    )
    return F.when(span == 0, F.lit(0).cast("bigint")).otherwise(
        F.when(
            guard.isNull(),
            F.floor(
                ((col - cmin) * F.lit((1 << bits) - 1)).cast("bigint")
                / span.cast("bigint")
            ),
        )
    ).cast("bigint")


def z_order_key(scaled: list[Column], bits: int = 16) -> Column:
    """Morton interleave of pre-scaled [0, 2^bits) bigint columns:
    bit b of column i lands at position b·ncols + i. Pure
    shift/mask/sum codegen — 2·bits·ncols integer ops per row,
    map-only."""
    ncols = len(scaled)
    if not 1 <= ncols * bits <= 62:
        raise ValueError(f"{ncols} cols x {bits} bits exceeds a signed bigint")
    terms = [
        F.shiftleft(
            F.shiftright(c, b).bitwiseAND(F.lit(1)), b * ncols + i
        )
        for i, c in enumerate(scaled)
        for b in range(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("bigint")


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    key_name: str = "z_key",
) -> DataFrame:
    """Append the Z-order clustering key for ``cols`` (numeric,
    null-free): per-column min/max from ONE aggregate (a 1-row
    broadcast — at scale these are footer stats, effectively free),
    exact bigint min-max scaling, Morton interleave.

    This computes the KEY; the layout step is
    ``cluster_by_zorder`` (range-partition + sort by the key before
    writing), separated so the key is independently oracle-checkable.
    """
    stats = df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(c).cast("bigint").alias(f"_min_{c}"),
                F.max(c).cast("bigint").alias(f"_max_{c}"),
            )
        ]
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    scaled = [
        _scale_expr(
            F.col(c).cast("bigint"),
            F.col(f"_min_{c}"),
            F.col(f"_max_{c}"),
            bits,
        )
        for c in cols
    ]
    return with_stats.withColumn(key_name, z_order_key(scaled, bits)).drop(
        *[f"_{m}_{c}" for c in cols for m in ("min", "max")]
    )


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    partitions: int | None = None,
) -> DataFrame:
    """Range-partition and sort by the Z-order key — the frame is
    write-ready: every output file covers a compact Morton-curve
    segment, so parquet/Delta/Iceberg min/max stats prune range
    predicates on ANY of ``cols``. One range exchange (plus Spark's
    range-bound sampling pass); the key column is dropped after
    clustering."""
    keyed = with_zorder_key(df, cols, bits)
    parted = (
        keyed.repartitionByRange(partitions, "z_key")
        if partitions
        else keyed.repartitionByRange("z_key")
    )
    return parted.sortWithinPartitions("z_key").drop("z_key")
