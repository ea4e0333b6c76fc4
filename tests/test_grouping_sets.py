"""ROLLUP/CUBE semantics: grouping_id must disambiguate subtotal NULLs
from DATA NULLs — the failure mode that makes naive rollup reports
silently merge the 'unknown' category into the subtotal row."""

from pyspark.sql import functions as F


def _df(spark):
    # lang=None is a REAL data value, colliding textually with the
    # subtotal rows rollup/cube synthesize
    rows = [
        ("en", "web", 10),
        ("en", "book", 5),
        (None, "web", 3),
        (None, None, 2),
    ]
    return spark.createDataFrame(rows, "lang string, src string, n int")


def test_rollup_distinguishes_data_null_from_subtotal(spark):
    out = (
        _df(spark)
        .rollup("lang", "src")
        .agg(F.grouping_id().alias("gid"), F.sum("n").alias("s"))
        .collect()
    )
    got = {(r["lang"], r["src"], r["gid"]): r["s"] for r in out}
    # detail row for the data-NULL lang group: gid=0, not a subtotal
    assert got[(None, "web", 0)] == 3
    assert got[(None, None, 0)] == 2      # fully-NULL DATA row, gid 0
    assert got[(None, None, 1)] == 5      # lang=NULL subtotal, gid 1
    assert got[(None, None, 3)] == 20     # grand total, gid 3
    assert got[("en", None, 1)] == 15


def test_cube_covers_all_grouping_sets(spark):
    out = (
        _df(spark)
        .cube("lang", "src")
        .agg(F.grouping_id().alias("gid"), F.sum("n").alias("s"))
        .collect()
    )
    gids = {r["gid"] for r in out}
    assert gids == {0, 1, 2, 3}
    bysrc = {r["src"]: r["s"] for r in out if r["gid"] == 2}
    assert bysrc["web"] == 13 and bysrc["book"] == 5 and bysrc[None] == 2
