"""Column-expression helpers shared across the engine."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

# Open-ended SCD2 sentinel (reference main.ddl:154,170,181,191) — queries
# filter on it, so it must be preserved exactly.
SCD2_SENTINEL = "9999-12-31 00:00:00"


def sentinel_ts() -> Column:
    return F.lit(SCD2_SENTINEL).cast("timestamp_ntz")


def nullsafe_all_equal(left: DataFrame | str, right: DataFrame | str, cols: list[str]) -> Column:
    """True iff every column pair is NULL-safe equal (NULL == NULL).

    The reference expresses this as ``EXISTS (SELECT dwh-cols INTERSECT
    SELECT stg-cols)`` (etl.py:350-352, 403-405) — SQL set-op semantics
    treat NULLs as equal, unlike ``=``. Spark's ``<=>`` (eqNullSafe) is
    the exact equivalent; plain ``=`` would silently suppress updates for
    NULL-only differences.
    """

    def side(s, c):
        return F.col(f"{s}.{c}") if isinstance(s, str) else s[c]

    return reduce(
        lambda a, b: a & b,
        [side(left, c).eqNullSafe(side(right, c)) for c in cols],
    )


def any_col_differs(left, right, cols: list[str]) -> Column:
    """NULL-safe 'any column changed' — the SCD change-detection predicate."""
    return ~nullsafe_all_equal(left, right, cols)
