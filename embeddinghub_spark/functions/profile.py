"""Table profiling: the data-quality summary a pipeline runs before
training (and what the reference dashboard surfaces per source —
source stats in `metadata/proto/metadata.proto` SourceVariant; our
engine computes them in one pass instead of sampling).

One aggregate job over the table produces every column's profile:
row/null/distinct counts and min/max. The count(distinct) set uses
Spark's expand-based multi-distinct aggregate (one exchange with
partial aggregation — the f8_count_distinct plan); at 100 TB swap
``exact_distinct=False`` to run HyperLogLog ``approx_count_distinct``
instead, which collapses the expand entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, TimestampNTZType, TimestampType

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column profile: one row per column with
    ``(column, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str)``.

    Numeric columns fill the ``_num`` pair (cast to double);
    timestamp columns are formatted to second precision and string
    columns compared as-is into the ``_str`` pair. Everything is
    computed in a SINGLE aggregate (no per-column jobs, no driver
    loops over data); the per-column rows are unstacked from the one
    result row with ``stack`` — a 1×(6·C) projection, not a shuffle.
    """
    cols = columns or df.columns
    nd = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        dt = df.schema[c].dataType
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append(nd(c).alias(f"_nd_{c}"))
        if isinstance(dt, NumericType):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"_min_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"_max_{c}"))
        elif isinstance(dt, (TimestampType, TimestampNTZType)):
            aggs.append(
                F.date_format(F.min(F.col(c)), _TS_FMT).alias(f"_min_{c}")
            )
            aggs.append(
                F.date_format(F.max(F.col(c)), _TS_FMT).alias(f"_max_{c}")
            )
        else:
            s = F.col(c).cast("string")
            aggs.append(F.min(s).alias(f"_min_{c}"))
            aggs.append(F.max(s).alias(f"_max_{c}"))
    one = df.agg(*aggs)

    def piece(c: str) -> str:
        is_num = isinstance(df.schema[c].dataType, NumericType)
        mn, mx = f"`_min_{c}`", f"`_max_{c}`"
        num_pair = f"{mn}, {mx}" if is_num else "cast(null as double), cast(null as double)"
        str_pair = "cast(null as string), cast(null as string)" if is_num else f"{mn}, {mx}"
        return (
            f"'{c}', _n, _n - `_nn_{c}`, cast(`_nd_{c}` as bigint), "
            f"{num_pair}, {str_pair}"
        )

    stacked = ", ".join(piece(c) for c in cols)
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stacked}) AS "
            "(column, n_rows, n_nulls, n_distinct, "
            "min_num, max_num, min_str, max_str)"
        )
    ).select(
        "column", "n_rows", "n_nulls", "n_distinct",
        "min_num", "max_num", "min_str", "max_str",
    )
