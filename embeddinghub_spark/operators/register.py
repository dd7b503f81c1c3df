"""C16: resource registration — project a source into the canonical
``(entity, value, ts)`` triple.

Reference: ``provider/sql.go:1634-1655`` (``registerResources``),
Snowflake variant ``provider/snowflake_queries.go:101-116``; missing
ts ⇒ constant epoch-0 timestamp (provider/spark.go:118-129).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from embeddinghub_spark.catalog import ColumnMapping, EntityMapping


def resource_table(df: DataFrame, columns: ColumnMapping) -> DataFrame:
    """Project to (entity, value, ts); epoch-0 ts when unset."""
    ts = (
        F.col(columns.ts).cast("timestamp_ntz")
        if columns.ts
        else F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'")
    )
    return df.select(
        F.col(columns.entity).alias("entity"),
        F.col(columns.value).alias("value"),
        ts.alias("ts"),
    )


def label_resource_table(
    df: DataFrame,
    columns: ColumnMapping,
    entity_mappings: tuple[EntityMapping, ...] = (),
) -> DataFrame:
    """Labels generalize to composite entities (C12): keep one aliased
    entity column per mapping (metadata.proto:372-381); otherwise same
    triple projection as features."""
    if not entity_mappings:
        return resource_table(df, columns)
    ts = (
        F.col(columns.ts).cast("timestamp_ntz")
        if columns.ts
        else F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'")
    )
    cols = [F.col(m.entity_column).alias(f"entity__{m.name}") for m in entity_mappings]
    cols.append(F.col(columns.value).alias("value"))
    cols.append(ts.alias("ts"))
    return df.select(*cols)
