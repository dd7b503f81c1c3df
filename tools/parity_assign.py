"""Parity proof for the r17 vectorized Arrow cell-assignment path.

Compares assign_ivf_cells' three strategies (inline literal fold,
Arrow argmax, broadcast-join+max-struct) on the REAL embeddings table
at a given SF across several K (including K·dim > the inline cap, the
regime the Arrow path takes over), asserting cell assignments are
IDENTICAL row by row. Run: python tools/parity_assign.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from embeddinghub_spark.session import get_spark  # noqa: E402
from embeddinghub_spark.functions import vector as V  # noqa: E402


def assignments(df, cents, dim, force):
    """Run assign_ivf_cells with exactly one strategy forced."""
    spark = df.sparkSession
    cent_df = spark.createDataFrame(
        [(int(c), [float(x) for x in v]) for c, v in cents],
        "cell int, centroid array<double>",
    )
    orig_inline, orig_arrow = V._inline_ok, V._arrow_ok
    try:
        if force == "inline":
            V._arrow_ok = lambda *a: False
        elif force == "arrow":
            V._inline_ok = lambda *a: False
        elif force == "broadcast":
            V._inline_ok = lambda *a: False
            V._arrow_ok = lambda *a: False
        out = V.assign_ivf_cells(
            df, cent_df, dim=dim, cells=cents
        ).select("vec_id", "cell")
        return {r[0]: r[1] for r in out.collect()}
    finally:
        V._inline_ok, V._arrow_ok = orig_inline, orig_arrow


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("parity_assign")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    dim = len(emb.select("embedding").first()[0])
    n = emb.count()
    nulls = emb.filter(
        F.col("embedding").isNull()
        | (F.size(F.col("embedding")) != dim)
        | F.exists("embedding", lambda x: x.isNull())
    ).count()
    print(f"rows={n} dim={dim} null/ragged={nulls}")
    assert nulls == 0, "arrow path requires complete vectors"

    for k in (3, 16, 129, 157, 400):
        k = min(k, n)
        first = (
            emb.select("vec_id", "embedding").orderBy("vec_id").limit(k).collect()
        )
        cents = [(i + 1, list(r[1])) for i, r in enumerate(first)]
        a = assignments(emb, cents, dim, "arrow")
        b = assignments(emb, cents, dim, "broadcast")
        i = assignments(emb, cents, dim, "inline") if k * dim <= 8192 else None
        diff_ab = {x: (a[x], b[x]) for x in a if a[x] != b[x]}
        assert not diff_ab, f"K={k} arrow!=broadcast: {list(diff_ab.items())[:5]}"
        if i is not None:
            diff_ai = {x: (a[x], i[x]) for x in a if a[x] != i[x]}
            assert not diff_ai, f"K={k} arrow!=inline: {list(diff_ai.items())[:5]}"
        print(f"K={k}: arrow==broadcast{'==inline' if i is not None else ''} "
              f"on {len(a)} rows  OK")
    print("PARITY OK")


if __name__ == "__main__":
    main()
