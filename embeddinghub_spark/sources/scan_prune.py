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
            # unusable bounds would crash range_excluded with a raw
            # TypeError only when a file happens to record bounds —
            # make the contract explicit instead (ADVICE r14)
            if v is not None and _kind(v) is None:
                raise ValueError(
                    f"range_filter {side} bound for {c!r} must be a "
                    f"number, string, date, or None, got "
                    f"{type(v).__name__}"
                )
        # a mixed-kind pair (e.g. lo str / hi int) can never be
        # compared soundly against one column's bounds
        if (
            lo is not None and hi is not None
            and _kind(lo) != _kind(hi)
        ):
            raise ValueError(
                f"range_filter bounds for {c!r} must be of the same "
                f"kind, got {type(lo).__name__}/{type(hi).__name__}"
            )


def _kind(v) -> str | None:
    """Comparison family of a bound value: values prune only against
    bounds of the SAME kind (numeric vs numeric, str vs str, date vs
    date) — cross-kind comparisons raise in Python and are meaningless
    against file stats anyway. bool is excluded (it is an int subclass
    but parquet stats for it are excluded upstream); datetime is NOT a
    usable 'date' (date/datetime ordering comparisons raise)."""
    import datetime as _dt

    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return "num"
    if isinstance(v, str):
        return "str"
    if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
        return "date"
    return None


def _usable(v) -> bool:
    return _kind(v) is not None


def range_excluded(bounds: dict, range_filter: dict) -> bool:
    """True when a file's recorded {column: (lo, hi)} bounds PROVABLY
    miss the filter — the only case pruning may drop it. Bounds and
    filter values compare only within the same kind (numeric / string
    / date); a kind mismatch means the bound is unusable for this
    filter and the file stays a candidate (under-prune, never over)."""
    for c, (lo, hi) in range_filter.items():
        b = bounds.get(c)
        if b is None:
            continue
        f_lo, f_hi = b
        if (
            hi is not None and _usable(f_lo)
            and _kind(f_lo) == _kind(hi) and f_lo > hi
        ):
            return True
        if (
            lo is not None and _usable(f_hi)
            and _kind(f_hi) == _kind(lo) and f_hi < lo
        ):
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


# --------------------------------------------------------- DML bound derivation

def bounds_from_condition(
    cond: str, schema_names, *, date_as: str = "date"
) -> dict:
    """Derive a sound ``range_filter`` from a SQL condition STRING so
    bare ``delete_delta(spark, p, "id = 7")`` gets stage-1 stats
    pruning without the caller hand-seeding ``range_filter``
    (VERDICT r15 #3).

    Soundness rule: the condition is split on TOP-LEVEL ``AND`` only,
    and each conjunct independently implies its own bound — so any
    conjunct this mini-parser does not recognize is simply skipped
    (under-prune), never guessed. A top-level ``OR`` makes the whole
    condition one unrecognizable conjunct → no bounds → no pruning.
    Recognized conjunct shapes (either operand order, optional
    balanced parens, bare or backticked column names):

    - ``col = lit`` → (lit, lit)
    - ``col >/>= lit``  → (lit, None);  ``col </<= lit`` → (None, lit)
    - ``col BETWEEN a AND b`` → (a, b)
    - ``col IN (l1, …, ln)`` → (min, max)

    Literals: integer / float / ``'single-quoted'`` strings ('' escape)
    / ``DATE 'yyyy-mm-dd'``. ``date_as`` picks the date literal's
    Python shape to match the caller's bound store: ``"date"`` →
    ``datetime.date`` (Iceberg manifest bounds), ``"iso"`` → the ISO
    string (Delta JSON stats). Columns not in ``schema_names`` are
    skipped. Returns {} when nothing usable was recognized.
    """
    import re

    names = set(schema_names)
    out: dict = {}

    def _merge(col: str, lo, hi) -> None:
        plo, phi = out.get(col, (None, None))
        if lo is not None and (
            plo is None or (_kind(plo) == _kind(lo) and lo > plo)
        ):
            plo = lo
        if hi is not None and (
            phi is None or (_kind(phi) == _kind(hi) and hi < phi)
        ):
            phi = hi
        out[col] = (plo, phi)

    _IDENT = r"`(?P<bq%s>[^`]+)`|(?P<id%s>[A-Za-z_][A-Za-z0-9_]*)"
    _LIT = (
        r"(?:DATE\s*'(?P<date%s>\d{4}-\d{2}-\d{2})'"
        r"|'(?P<str%s>(?:[^']|'')*)'"
        r"|(?P<num%s>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?))"
    )

    def _lit_val(m, tag):
        import datetime as _dt

        d = m.group(f"date{tag}")
        if d is not None:
            if date_as == "iso":
                return d
            try:
                return _dt.date.fromisoformat(d)
            except ValueError:
                return None
        s = m.group(f"str{tag}")
        if s is not None:
            return s.replace("''", "'")
        n = m.group(f"num{tag}")
        if n is not None:
            return float(n) if any(c in n for c in ".eE") else int(n)
        return None

    def _col_name(m, tag):
        return m.group(f"bq{tag}") or m.group(f"id{tag}")

    # split on top-level AND: outside quotes and parens, and NOT the
    # AND that belongs to a pending BETWEEN (x BETWEEN a AND b is one
    # conjunct — its first AND is part of the predicate)
    conjuncts, depth, buf, i, n = [], 0, [], 0, len(cond)
    pending_between = False

    def _word_at(k: int, w: str) -> bool:
        return (
            cond[k:k + len(w)].upper() == w
            and (k == 0 or not (cond[k - 1].isalnum()
                                or cond[k - 1] in "_`"))
            and (k + len(w) >= n
                 or not (cond[k + len(w)].isalnum()
                         or cond[k + len(w)] in "_`"))
        )

    while i < n:
        ch = cond[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if cond[j] == "'":
                    if j + 1 < n and cond[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            buf.append(cond[i:j + 1])
            i = j + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if depth == 0 and _word_at(i, "BETWEEN"):
            pending_between = True
        if depth == 0 and _word_at(i, "AND"):
            if pending_between:
                pending_between = False  # BETWEEN's own AND: keep
            else:
                conjuncts.append("".join(buf))
                buf = []
                i += 3
                continue
        buf.append(ch)
        i += 1
    conjuncts.append("".join(buf))

    _ops = {
        "=": ("eq",), ">=": ("ge",), "<=": ("le",), ">": ("gt",),
        "<": ("lt",),
    }
    cmp_re = re.compile(
        r"^\s*(?:" + (_IDENT % ("c", "c")) + r")\s*"
        r"(?P<op>>=|<=|=|>|<)\s*" + (_LIT % ("v", "v", "v")) + r"\s*$"
    )
    cmp_rev_re = re.compile(
        r"^\s*" + (_LIT % ("v", "v", "v")) + r"\s*"
        r"(?P<op>>=|<=|=|>|<)\s*(?:" + (_IDENT % ("c", "c")) + r")\s*$"
    )
    btw_re = re.compile(
        r"^\s*(?:" + (_IDENT % ("c", "c")) + r")\s+BETWEEN\s+"
        + (_LIT % ("a", "a", "a")) + r"\s+AND\s+"
        + (_LIT % ("b", "b", "b")) + r"\s*$",
        re.IGNORECASE,
    )
    in_re = re.compile(
        r"^\s*(?:" + (_IDENT % ("c", "c")) + r")\s+IN\s*\("
        r"(?P<body>[^()]*)\)\s*$",
        re.IGNORECASE,
    )
    lit_only_re = re.compile(r"^\s*" + (_LIT % ("v", "v", "v")) + r"\s*$")

    _FLIP = {">": "<", "<": ">", ">=": "<=", "<=": ">=", "=": "="}

    for raw in conjuncts:
        c = raw.strip()
        # strip one or more layers of balanced outer parens
        while c.startswith("(") and c.endswith(")"):
            depth = 0
            ok = True
            for k, ch in enumerate(c):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0 and k != len(c) - 1:
                        ok = False
                        break
            if not ok:
                break
            c = c[1:-1].strip()
        m = cmp_re.match(c)
        op = None
        if m:
            op = m.group("op")
        else:
            m = cmp_rev_re.match(c)
            if m:
                op = _FLIP[m.group("op")]  # lit OP col ≡ col FLIP lit
        if m and op:
            col = _col_name(m, "c")
            val = _lit_val(m, "v")
            if col in names and val is not None:
                if op == "=":
                    _merge(col, val, val)
                elif op in (">", ">="):
                    _merge(col, val, None)
                else:
                    _merge(col, None, val)
            continue
        m = btw_re.match(c)
        if m:
            col = _col_name(m, "c")
            a, b = _lit_val(m, "a"), _lit_val(m, "b")
            if col in names and a is not None and b is not None:
                _merge(col, a, b)
            continue
        m = in_re.match(c)
        if m:
            col = _col_name(m, "c")
            vals = []
            for part in m.group("body").split(","):
                lm = lit_only_re.match(part)
                if not lm:
                    vals = None
                    break
                v = _lit_val(lm, "v")
                if v is None:
                    vals = None
                    break
                vals.append(v)
            if (
                col in names and vals
                and len({_kind(v) for v in vals}) == 1
            ):
                _merge(col, min(vals), max(vals))
            continue

    # drop anything that ended up unusable or mixed-kind
    return {
        col: (lo, hi)
        for col, (lo, hi) in out.items()
        if (lo is not None or hi is not None)
        and (lo is None or _usable(lo))
        and (hi is None or _usable(hi))
        and (lo is None or hi is None or _kind(lo) == _kind(hi))
    }
