"""Shared scan-planning helpers of the native Delta and Iceberg
readers — the pieces that MUST stay byte-identical between the two
formats, extracted so a future fix lands in both at once:

- ``decoded_file_path_col``: normalize Spark's ``_metadata.file_path``
  (a percent-encoded URI — a space reads back as %20) to the literal
  filesystem path for joining against driver-side canonical paths.
  The literal-'+' pre-escape is the subtle part: URI encoding keeps
  '+' verbatim, while ``url_decode`` is FORM-decoding and would turn
  it into a space — so any '+' in the (URI-encoded) input is a
  literal plus and pre-escapes to %2B first.
- the ``range_filter`` machinery ({column: (lo, hi)} validation, the
  provably-misses-the-range file exclusion test, and the exact
  Spark-side BETWEEN) that Delta data skipping and Iceberg bound
  pruning share. Files without usable bounds are never excluded —
  a missing bound can only under-prune.
"""

from __future__ import annotations


def decoded_file_path_col(c):
    from pyspark.sql import functions as F

    return F.regexp_replace(
        F.url_decode(F.regexp_replace(c, r"\+", "%2B")),
        "^file:/+", "/",
    )


def validate_range_filter(range_filter: dict, schema_names) -> None:
    names = set(schema_names)
    for c, (lo, hi) in range_filter.items():
        if c not in names:
            raise ValueError(
                f"range_filter column {c!r} not in table schema"
            )
        if lo is None and hi is None:
            raise ValueError(
                f"range_filter for {c!r} is unbounded on both sides"
            )
        for side, v in (("lo", lo), ("hi", hi)):
            # non-numeric bounds would crash range_excluded with a raw
            # TypeError only when a file happens to record bounds —
            # make the contract explicit instead (ADVICE r14)
            if v is not None and not _usable(v):
                raise ValueError(
                    f"range_filter {side} bound for {c!r} must be a "
                    f"number or None, got {type(v).__name__}"
                )


def _usable(v) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def range_excluded(bounds: dict, range_filter: dict) -> bool:
    """True when a file's recorded {column: (lo, hi)} bounds PROVABLY
    miss the filter — the only case pruning may drop it."""
    for c, (lo, hi) in range_filter.items():
        b = bounds.get(c)
        if b is None:
            continue
        f_lo, f_hi = b
        if hi is not None and _usable(f_lo) and f_lo > hi:
            return True
        if lo is not None and _usable(f_hi) and f_hi < lo:
            return True
    return False


def range_row_filter(range_filter: dict):
    """The exact Spark-side BETWEEN for the same filter — applied
    regardless of pruning coverage so semantics never depend on which
    files carried bounds."""
    from pyspark.sql import functions as F

    cond = None
    for c, (lo, hi) in range_filter.items():
        if lo is not None:
            piece = F.col(c) >= F.lit(lo)
            cond = piece if cond is None else cond & piece
        if hi is not None:
            piece = F.col(c) <= F.lit(hi)
            cond = piece if cond is None else cond & piece
    return cond
