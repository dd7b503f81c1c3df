"""C1 SQL transformations + C2 DataFrame transformations.

Reference: Go templating ``provider/spark.go:991-1079``
(``prepareQueryForSpark`` rewrites ``{{name.variant}}`` placeholders
to ``source_i``), execution ``offline_store_spark_runner.py:851-958``
(register temp views, ``spark.sql``); DF transformations
``offline_store_spark_runner.py:1112-1230`` (dill → FunctionType,
output validation ``:1233-1241``).

Our engine runs in-process so C2 takes a live callable (no dill), but
the contract is identical: ``fn(*input_dfs) -> DataFrame``.
"""

from __future__ import annotations

import re
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession

_PLACEHOLDER = re.compile(r"\{\{\s*([A-Za-z0-9_\-]+)\.([A-Za-z0-9_\-]+)\s*\}\}")
_lock = threading.Lock()


def referenced_sources(query: str) -> tuple[tuple[str, str], ...]:
    """Extract ``{{name.variant}}`` references in first-appearance
    order (dedup'd), like prepareQueryForSpark's source list."""
    seen: list[tuple[str, str]] = []
    for m in _PLACEHOLDER.finditer(query):
        key = (m.group(1), m.group(2))
        if key not in seen:
            seen.append(key)
    return tuple(seen)


def render_query(query: str, inputs: tuple[tuple[str, str], ...], view_names: list[str]) -> str:
    """Rewrite ``{{name.variant}}`` → registered view name (the
    reference renders to ``source_0..n`` — provider/spark.go:1030-1060)."""
    index = {key: view_names[i] for i, key in enumerate(inputs)}

    def sub(m: re.Match) -> str:
        key = (m.group(1), m.group(2))
        if key not in index:
            raise KeyError(f"query references unregistered source {key[0]}.{key[1]}")
        return index[key]

    return _PLACEHOLDER.sub(sub, query)


def run_sql_transformation(
    spark: SparkSession,
    query: str,
    inputs: tuple[tuple[str, str], ...],
    input_dfs: list[DataFrame],
) -> DataFrame:
    """C1: register inputs as temp views, run the rendered SQL.

    View names are uniquified per call so concurrent transformations
    can't collide (the reference runs one job per spark-submit and can
    use bare ``source_i``; we share one session).
    """
    tag = uuid.uuid4().hex[:8]
    view_names = [f"source_{i}_{tag}" for i in range(len(inputs))]
    with _lock:
        for df, view in zip(input_dfs, view_names):
            df.createOrReplaceTempView(view)
        rendered = render_query(query, inputs, view_names)
        out = spark.sql(rendered)
    return out


def run_df_transformation(fn, input_dfs: list[DataFrame]) -> DataFrame:
    """C2: call the user fn; validate it returned a DataFrame
    (runner ``_validate_output_df`` :1233-1241)."""
    out = fn(*input_dfs)
    if not isinstance(out, DataFrame):
        raise TypeError(
            f"DF transformation must return a DataFrame, got {type(out).__name__}"
        )
    return out
