"""Per-file column bounds from parquet row-group statistics — the
shared stats source of the native Iceberg writer (manifest
``lower_bounds``/``upper_bounds``) and the native Delta writer
(``add.stats`` minValues/maxValues), both of which feed driver-side
file skipping.

Honesty rules (a missing bound can only UNDER-prune; a wrong bound
prunes live rows):
- a column reports a bound only when EVERY row group carries min/max
  stats for it — one stat gap and the column is silent for the file;
- int / float / string / date values (bool excluded — its stats are
  worthless for pruning and it is an int subclass). STRING stats are
  safe to use verbatim here because this module only ever reads files
  the repo's own writers just staged through Spark's parquet writer,
  whose statistics truncation (parquet-mr's BinaryTruncator) follows
  the spec's contract: a truncated min_value is <= the actual min and
  a truncated max_value is truncate-then-INCREMENTED >= the actual
  max — looser bounds can only under-prune. Timestamps are skipped
  (their stats surface session-timezone ambiguity the pruning layer
  does not model);
- nested columns (list elements, struct members) are skipped.

The writers re-truncate long string bounds before persisting them
(``truncated_lower`` / ``truncated_upper`` — Iceberg's truncate(L)
contract: lower truncated, upper truncated then incremented at the
last incrementable code point, or DROPPED when every code point is
U+10FFFF) so a pathological multi-KB key never bloats the transaction
log / manifest. VERDICT r15 #2: string (and date) bounds are what make
string-keyed MERGE/DELETE/UPDATE file-pruned — most real entity keys
are strings.
"""

from __future__ import annotations

import datetime as _dt

_MAX_CP = 0x10FFFF
_SURROGATE_LO, _SURROGATE_HI = 0xD800, 0xDFFF


def truncated_lower(s: str, length: int) -> str:
    """A string <= ``s`` of at most ``length`` code points: the plain
    prefix (a proper prefix always sorts <= the original)."""
    return s[:length]


def truncated_upper(s: str, length: int) -> str | None:
    """A string >= ``s`` of at most ``length`` code points, or None
    when impossible. Iceberg's truncate(L) upper-bound contract:
    truncate, then increment the LAST incrementable code point and
    drop everything after it (skipping the surrogate block — the
    result must stay valid Unicode). All-U+10FFFF prefixes cannot be
    incremented → no upper bound (under-prune, never a wrong one)."""
    if len(s) <= length:
        return s
    chars = list(s[:length])
    for i in range(len(chars) - 1, -1, -1):
        cp = ord(chars[i])
        if cp < _MAX_CP:
            ncp = cp + 1
            if _SURROGATE_LO <= ncp <= _SURROGATE_HI:
                ncp = _SURROGATE_HI + 1
            return "".join(chars[:i]) + chr(ncp)
    return None


def _usable_stat(v) -> bool:
    if isinstance(v, bool):
        return False
    if isinstance(v, (int, float, str)):
        return True
    # date but NOT datetime (timestamp stats: skipped — tz ambiguity)
    return isinstance(v, _dt.date) and not isinstance(v, _dt.datetime)


def column_bounds(meta) -> dict[str, tuple]:
    """{top-level column: (min, max)} from a
    ``pyarrow.parquet.FileMetaData``, per the module's honesty rules.
    Values are exact python int/float/str/datetime.date; callers
    truncate long strings at persist time."""
    out: dict[str, list] = {}
    ok: dict[str, bool] = {}
    for rg in range(meta.num_row_groups):
        row_group = meta.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            if "." in name:  # nested: skip
                continue
            try:
                st = col.statistics
                lo = st.min if st is not None and st.has_min_max else None
                hi = st.max if st is not None and st.has_min_max else None
            except (OSError, ValueError, UnicodeDecodeError):
                # undecodable stats (e.g. non-UTF-8 binary): silent col
                ok[name] = False
                continue
            if (
                lo is None
                or hi is None
                or not _usable_stat(lo)
                or not _usable_stat(hi)
                or type(lo) is not type(hi)
            ):
                ok[name] = False
                continue
            if ok.get(name) is False:
                continue
            ok.setdefault(name, True)
            cur = out.get(name)
            if cur is None:
                out[name] = [lo, hi]
            else:
                cur[0] = min(cur[0], lo)
                cur[1] = max(cur[1], hi)
    return {n: (v[0], v[1]) for n, v in out.items() if ok.get(n)}
