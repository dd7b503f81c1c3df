"""C14: batch features join — N materializations full-outer-joined on
entity with COALESCE'd entity key.

Reference: ``provider/spark.go:390-421`` (``createJoinQuery``), driver
``:261-352``: each feature contributes ``(entity, value, ts)``; the
batch table is ``COALESCE(e1, e2, …) AS entity`` with one value (+
optional ts) column per feature.

Scale: full-outer joins all shuffle on entity — Spark reuses the
hash partitioning across the chained joins (Exchange reuse), so the
chain is one shuffle per input, not per pair. Materializations are
per-entity-latest (bounded by |entities|), typically small enough
that AQE converts later joins to broadcast.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def batch_features(
    materializations: dict[str, DataFrame],
    include_ts: bool = False,
) -> DataFrame:
    """Full-outer join materializations on entity.

    ``materializations`` maps output column name → a C3/C4 output
    DataFrame with columns (entity, value, ts).
    """
    if not materializations:
        raise ValueError("batch_features needs at least one materialization")

    prepared = []
    for i, (out_name, m) in enumerate(materializations.items()):
        cols = [F.col("entity").alias(f"_e{i}"), F.col("value").alias(out_name)]
        if include_ts:
            cols.append(F.col("ts").alias(f"{out_name}__ts"))
        prepared.append(m.select(*cols))

    def join_pair(acc_with_idx, nxt_with_idx):
        (acc, i), (nxt, j) = acc_with_idx, nxt_with_idx
        cond = F.col(f"_e{i}") == F.col(f"_e{j}")
        joined = acc.join(nxt, cond, "full_outer").withColumn(
            f"_e{i}", F.coalesce(F.col(f"_e{i}"), F.col(f"_e{j}"))
        ).drop(f"_e{j}")
        return (joined, i)

    acc, idx = reduce(join_pair, [(df, i) for i, df in enumerate(prepared)])
    return acc.withColumnRenamed(f"_e{idx}", "entity").select(
        "entity", *[c for c in acc.columns if c != f"_e{idx}"]
    )
