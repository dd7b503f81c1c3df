"""Change-data-capture operators: ordered changelog application and
SCD Type-2 dimension builds.

Reference parity: featureform's MERGE upsert
(provider/scripts/spark/offline_store_spark_runner.py:688-765) applies
the LATEST row per key from a new batch. ``cdc_apply`` generalizes
that to an ordered insert/update/delete log (the Debezium/DMS shape a
warehouse ingests), and ``scd2_build`` keeps EVERY version with a
validity interval instead of only the latest — the slowly-changing
dimension form a point-in-time join (operators/pit.py) consumes when
features must be read "as of" the label timestamp.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdc_apply(
    snapshot: DataFrame,
    changelog: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply an ordered insert/update/delete changelog to a snapshot.

    ``changelog`` carries the snapshot's columns plus ``seq_col`` (a
    monotone per-key ordering — LSN, binlog offset, kafka offset) and
    ``op_col``. Per key, only the HIGHEST-seq change wins: if it is
    ``delete_op`` the key disappears; any other op value upserts the
    change row's values; keys the changelog never touches pass through
    from the snapshot. Output schema == snapshot schema.

    Seq ties are broken by ``op_col`` descending then the value
    columns descending (struct-major max), so an equal-seq U beats a D
    deterministically — real logs have unique per-key sequence
    numbers, and the tie-break only exists so replays stay stable.

    Scale shape: latest-per-key is ONE map-side-combining hash
    aggregate over the changelog (``max(struct(seq, op, values))`` —
    shuffle ∝ |changed keys|, whale-key immune, same trick as
    materialize's _latest_by_struct). The apply is then LEFT-ANTI
    (snapshot minus touched keys) UNION surviving changes — never a
    full-outer join, because full-outer can only ever be a shuffle
    join; the anti join broadcasts the reduced changelog in the
    common case (day's changes ≪ accumulated snapshot), so a 100 TB
    snapshot is never re-shuffled to absorb a 10 GB delta. No
    windows, no sorts.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    for c in key_cols + [seq_col, op_col]:
        if c not in changelog.columns:
            raise ValueError(f"changelog is missing column {c!r}")
    val_cols = [c for c in snapshot.columns if c not in key_cols]
    missing = [c for c in snapshot.columns if c not in changelog.columns]
    if missing:
        raise ValueError(f"changelog is missing snapshot columns {missing}")

    winner = F.struct(
        F.col(seq_col).alias("_seq"),
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(c) for c in val_cols],
    )
    latest = changelog.groupBy(*key_cols).agg(F.max(winner).alias("_w"))

    untouched = snapshot.join(
        latest.select(*key_cols), on=key_cols, how="left_anti"
    ).select(*key_cols, *val_cols)
    upserts = latest.filter(
        F.col("_w._op") != F.lit(delete_op)
    ).select(
        *key_cols, *[F.col(f"_w.{c}").alias(c) for c in val_cols]
    )
    # restore the snapshot's exact column ORDER (not just names) so
    # position-sensitive consumers — parquet append into an existing
    # layout, schema hashes — see an unchanged schema when keys are
    # not the leading columns (ADVICE r5)
    return untouched.unionByName(upserts).select(*snapshot.columns)


def scd2_build(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str] | None = None,
    collapse: bool = True,
) -> DataFrame:
    """Build an SCD Type-2 dimension from a change stream: one row per
    (key, version) with ``valid_from`` / ``valid_to`` / ``version`` /
    ``is_current``, ordered by change timestamp.

    With ``collapse=True`` (default) consecutive changes whose
    attributes are all unchanged are folded into the earlier version —
    a no-op update does not open a new validity interval (null-safe
    comparison, so NULL→NULL is "unchanged"). ``valid_to`` is the next
    kept version's ``valid_from`` (half-open intervals, NULL while
    current), which is exactly the shape an as-of / interval join
    (operators/pit.py, operators/batch.py interval_join) probes.

    Ordering within a key is (ts, attrs) so duplicate-timestamp change
    rows sequence deterministically; exact duplicate rows collapse.

    Scale shape: two windows partitioned BY KEY (lag-compare for the
    collapse, lead/row_number for intervals) — per-task state is one
    key's CHANGE HISTORY, which is bounded by update counts, not
    corpus size; this is the inherent lower bound for versioning (any
    SCD2 build must see a key's changes in order). No global sort, no
    driver collects.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if attr_cols is None:
        attr_cols = [
            c for c in changes.columns if c not in key_cols and c != ts_col
        ]
    if not attr_cols:
        raise ValueError("attr_cols must be non-empty")

    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in attr_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)

    if collapse:
        any_changed = reduce(
            lambda a, b: a | b,
            [
                ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
                for c in attr_cols
            ],
        )
        # row_number==1 detects "no predecessor" exactly — lag(ts)
        # IS NULL cannot, because a predecessor's ts value may itself
        # be NULL.
        changes = (
            changes.withColumn(
                "_keep", (F.row_number().over(w) == 1) | any_changed
            )
            .filter(F.col("_keep"))
            .drop("_keep")
        )

    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    out = changes.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
    )
    return out.withColumn("is_current", F.col("valid_to").isNull())


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    ts_col: str,
    prefix: str = "dim_",
) -> DataFrame:
    """As-of join of a fact stream against an SCD2 dimension
    (``scd2_build`` output): each fact row gets the dimension version
    whose ``[valid_from, valid_to)`` interval contains its timestamp
    — attributes come back prefixed, plus ``version``; facts before
    the key's first version get NULLs (left-join semantics). Assumes
    chained intervals (``valid_to`` = next ``valid_from``), which
    scd2_build guarantees.

    Computed as union + last-non-null — the PIT discipline
    (operators/pit.py) — NOT a range join: dimension changes and
    facts interleave in ONE per-key window ordered by (ts, dim-first,
    version), and each fact reads the latest dimension payload at or
    before it. A BETWEEN theta-join explodes to |facts|·|versions|
    candidates per key before filtering; the union form is one sort
    per key with no fanout — the same reason the reference's PIT join
    is a union, not an interval probe. Version payloads ride in ONE
    struct so a legitimately-NULL attribute in a newer version can
    never fall through to an older version's value.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    reserved = set(key_cols) | {"valid_from", "valid_to", "version", "is_current"}
    attr_cols = [c for c in dim.columns if c not in reserved]
    payload = F.struct(
        F.col("version").alias("version"),
        *[F.col(c).alias(c) for c in attr_cols],
    )
    fact_cols = [c for c in facts.columns]

    dim_side = dim.select(
        *key_cols,
        F.col("valid_from").alias("_ts"),
        F.lit(1).alias("_is_dim"),
        F.col("version").alias("_ord_v"),
        payload.alias("_payload"),
        *[F.lit(None).cast(facts.schema[c].dataType).alias(f"_f_{c}")
          for c in fact_cols],
    )
    fact_side = facts.select(
        *key_cols,
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_is_dim"),
        F.lit(None).cast("int").alias("_ord_v"),
        F.lit(None).cast(dim_side.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c).alias(f"_f_{c}") for c in fact_cols],
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(
            F.col("_ts").asc(),
            F.col("_is_dim").desc(),
            F.col("_ord_v").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = dim_side.unionByName(fact_side).withColumn(
        "_cur", F.last("_payload", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("_is_dim") == 0).select(
        *[F.col(f"_f_{c}").alias(c) for c in fact_cols],
        *[F.col(f"_cur.{c}").alias(f"{prefix}{c}") for c in attr_cols],
        F.col("_cur.version").alias("version"),
    )


def scd2_merge(
    dim: DataFrame,
    new_changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    on_late: str = "error",
) -> DataFrame:
    """Incrementally fold a new change batch into an existing SCD2
    dimension (``scd2_build`` output): keys untouched by the batch
    pass through UNREAD (a left-anti on the batch's key set, which
    broadcasts); touched keys rebuild from their kept version starts
    plus the new changes. Equal to a from-scratch ``scd2_build`` over
    the full concatenated change stream — pinned by property test —
    UNDER THE IN-ORDER CONTRACT: every new change for a key must be
    at or after that key's latest ``valid_from``.

    The contract is not pedantry: the collapsed dimension has
    forgotten which no-op changes were dropped, and a LATE change
    landing between two old versions can resurrect one of them — only
    the original full stream can rebuild that key correctly. So late
    rows fail loudly (``on_late='error'``, one bounded count
    aggregate) or are dropped explicitly (``'drop'``); there is no
    silent wrong-answer mode.

    Scale shape: the touched-key filter is a semi/anti join against
    the batch's distinct keys (small, broadcasts); the rebuild runs
    scd2_build's per-key windows over ONLY touched keys' versions +
    batch rows — a day's merge costs the day's touched histories, not
    the dimension.
    """
    if on_late not in ("error", "drop"):
        raise ValueError("on_late must be 'error' or 'drop'")
    reserved = {"valid_from", "valid_to", "version", "is_current"}
    attr_cols = [
        c for c in dim.columns if c not in set(key_cols) | reserved
    ]
    batch_keys = new_changes.select(*key_cols).distinct()

    latest = dim.groupBy(*key_cols).agg(
        F.max("valid_from").alias("_max_vf")
    )
    joined_new = new_changes.join(latest, key_cols, "left")
    late = joined_new.filter(
        F.col("_max_vf").isNotNull() & (F.col(ts_col) < F.col("_max_vf"))
    )
    n_late = late.count()
    if n_late:
        if on_late == "error":
            raise ValueError(
                f"{n_late} late change rows precede their key's latest "
                f"valid_from — an incremental SCD2 merge cannot rebuild "
                f"those keys exactly (the collapsed dimension has "
                f"forgotten its dropped no-ops); replay those keys "
                f"through scd2_build on their full history instead"
            )
        new_changes = joined_new.filter(
            F.col("_max_vf").isNull() | (F.col(ts_col) >= F.col("_max_vf"))
        ).drop("_max_vf")
    else:
        new_changes = joined_new.drop("_max_vf")

    untouched = dim.join(batch_keys, key_cols, "left_anti")
    old_touched = dim.join(batch_keys, key_cols, "left_semi").select(
        *key_cols,
        F.col("valid_from").alias(ts_col),
        *attr_cols,
    )
    merged_changes = old_touched.unionByName(
        new_changes.select(*key_cols, ts_col, *attr_cols)
    )
    rebuilt = scd2_build(merged_changes, key_cols, ts_col, attr_cols)
    return untouched.unionByName(rebuilt)
