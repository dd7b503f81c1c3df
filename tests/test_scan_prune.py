"""scan_prune.py unit pins: the kind-aware range machinery, the
string-bound truncation contract, and the DML condition→bounds
mini-parser (VERDICT r15 #2/#3). Pure driver-side logic — no Spark."""

import datetime

import pytest

from embeddinghub_spark.sources.parquet_stats import (
    truncated_lower,
    truncated_upper,
)
from embeddinghub_spark.sources.scan_prune import (
    bounds_from_condition,
    range_excluded,
    validate_range_filter,
)


def test_truncated_upper_contract():
    # short strings pass through (idempotent re-encode for carries)
    assert truncated_upper("abc", 16) == "abc"
    assert truncated_upper("a" * 16, 16) == "a" * 16
    # long strings: prefix with last code point incremented
    assert truncated_upper("abcdef", 3) == "abd"
    assert truncated_lower("abcdef", 3) == "abc"
    # the result is a true upper bound for ANY string with that prefix
    for s in ("abcdef", "abc" + "\U0010ffff" * 5, "abczzzzzz"):
        up = truncated_upper(s, 3)
        assert up is not None and up >= s and len(up) <= 3
    # carry the increment past un-incrementable tail chars
    top = "\U0010ffff"
    assert truncated_upper("ab" + top + "xx", 3) == "ac"
    # surrogate block is skipped (result must stay valid Unicode)
    s = "a" + chr(0xD7FF) + "ZZZ"  # U+D7FF + 1 would land in the surrogate range
    up = truncated_upper(s, 2)
    assert up == "a" + chr(0xE000) and up >= s
    # an all-U+10FFFF prefix has NO upper bound
    assert truncated_upper(top * 5, 3) is None


def test_range_excluded_kind_guard():
    # same-kind comparisons prune; cross-kind never do
    assert range_excluded({"k": ("b", "c")}, {"k": ("d", "e")})
    assert not range_excluded({"k": ("b", "e")}, {"k": ("d", "f")})
    assert not range_excluded({"k": (1, 2)}, {"k": ("d", "e")})
    d = datetime.date
    assert range_excluded(
        {"k": (d(2024, 1, 1), d(2024, 1, 5))},
        {"k": (d(2024, 2, 1), None)},
    )
    # ISO strings order like the dates they encode (the Delta form)
    assert range_excluded(
        {"k": ("2024-01-01", "2024-01-05")},
        {"k": ("2024-02-01", None)},
    )


def test_validate_range_filter_kinds():
    validate_range_filter({"k": ("a", "b")}, ["k"])
    validate_range_filter(
        {"k": (datetime.date(2024, 1, 1), None)}, ["k"]
    )
    with pytest.raises(ValueError, match="same kind"):
        validate_range_filter({"k": ("a", 5)}, ["k"])
    with pytest.raises(ValueError, match="must be a number"):
        validate_range_filter({"k": (True, None)}, ["k"])
    with pytest.raises(ValueError, match="must be a number"):
        # datetime is NOT a usable date (date/datetime ordering raises)
        validate_range_filter(
            {"k": (datetime.datetime(2024, 1, 1), None)}, ["k"]
        )


def test_bounds_from_condition_shapes():
    names = {"id", "v", "d"}
    assert bounds_from_condition("id = 7", names) == {"id": (7, 7)}
    assert bounds_from_condition("id >= 3 AND id < 9", names) == {
        "id": (3, 9)
    }
    assert bounds_from_condition(
        "id BETWEEN 2 AND 5 AND v = 'x''y'", names
    ) == {"id": (2, 5), "v": ("x'y", "x'y")}
    assert bounds_from_condition("id IN (5, 2, 9)", names) == {
        "id": (2, 9)
    }
    assert bounds_from_condition("7 > id", names) == {"id": (None, 7)}
    assert bounds_from_condition(
        "d = DATE '2024-01-05'", names
    ) == {"d": (datetime.date(2024, 1, 5),) * 2}
    assert bounds_from_condition(
        "d = DATE '2024-01-05'", names, date_as="iso"
    ) == {"d": ("2024-01-05", "2024-01-05")}


def test_bounds_from_condition_soundness_bails():
    """Anything the mini-parser can't PROVE implies a bound must fall
    through to no-pruning: OR, NOT, !=, expressions, unknown columns,
    string literals containing AND."""
    names = {"id", "v"}
    assert bounds_from_condition("id = 1 OR id = 2", names) == {}
    assert bounds_from_condition("NOT (id = 1)", names) == {}
    assert bounds_from_condition("id != 7", names) == {}
    assert bounds_from_condition("id % 31 = 0", names) == {}
    assert bounds_from_condition("nope = 3", names) == {}
    assert bounds_from_condition("v LIKE 'a%'", names) == {}
    assert bounds_from_condition("v = 'a AND b'", names) == {
        "v": ("a AND b", "a AND b")
    }
    # unparseable conjuncts skip; provable ones still land
    assert bounds_from_condition(
        "(id = 1) AND (upper(v) = 'A')", names
    ) == {"id": (1, 1)}
    assert bounds_from_condition(
        "x BETWEEN 1 AND 2 AND id = 3", names
    ) == {"id": (3, 3)}
