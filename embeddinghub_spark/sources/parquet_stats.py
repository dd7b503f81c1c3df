"""Per-file column bounds from parquet row-group statistics — the
shared stats source of the native Iceberg writer (manifest
``lower_bounds``/``upper_bounds``) and the native Delta writer
(``add.stats`` minValues/maxValues), both of which feed driver-side
file skipping.

Honesty rules (a missing bound can only UNDER-prune; a wrong bound
prunes live rows):
- a column reports a bound only when EVERY row group carries min/max
  stats for it — one stat gap and the column is silent for the file;
- NUMERIC values only (int/float, bool excluded): parquet string
  statistics can be TRUNCATED by writers, and a truncated upper bound
  used verbatim would wrongly exclude files (real table formats apply
  a truncate-and-increment rule these writers deliberately avoid);
- nested columns (list elements, struct members) are skipped.
"""

from __future__ import annotations


def column_bounds(meta) -> dict[str, tuple]:
    """{top-level column: (min, max)} from a
    ``pyarrow.parquet.FileMetaData``, per the module's honesty rules."""
    out: dict[str, list] = {}
    ok: dict[str, bool] = {}
    for rg in range(meta.num_row_groups):
        row_group = meta.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            if "." in name:  # nested: skip
                continue
            st = col.statistics
            if (
                st is None
                or not st.has_min_max
                or st.min is None
                or isinstance(st.min, bool)
                or not isinstance(st.min, (int, float))
            ):
                ok[name] = False
                continue
            if ok.get(name) is False:
                continue
            ok.setdefault(name, True)
            cur = out.get(name)
            if cur is None:
                out[name] = [st.min, st.max]
            else:
                cur[0] = min(cur[0], st.min)
                cur[1] = max(cur[1], st.max)
    return {n: (v[0], v[1]) for n, v in out.items() if ok.get(n)}
