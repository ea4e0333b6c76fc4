"""The DQ sweep must actually count violations — the catalog query runs
on clean TPC-H data (all zeros), so seed dirty frames here."""

from pyspark.sql import functions as F


def test_dq_checks_count_seeded_violations(spark):
    orders = spark.createDataFrame(
        [(1, 10), (1, 11), (2, None), (3, 12)],  # dup PK, null custkey
        "o_orderkey long, o_custkey long",
    )
    lineitem = spark.createDataFrame(
        [(1, 100.0, 0.05), (9, 50.0, 0.1), (3, -7.0, 1.5)],
        # orphan l_orderkey=9; negative price; discount out of range
        "l_orderkey long, l_extendedprice double, l_discount double",
    )
    checks = {
        "orders_pk_dups": orders.agg(
            (F.count("*") - F.countDistinct("o_orderkey")).alias("n")
        ),
        "orders_null_custkey": orders.where(F.col("o_custkey").isNull()).agg(
            F.count("*").alias("n")
        ),
        "lineitem_fk_orphans": lineitem.join(
            orders.select("o_orderkey"),
            lineitem["l_orderkey"] == orders["o_orderkey"],
            "left_anti",
        ).agg(F.count("*").alias("n")),
        "lineitem_negative_price": lineitem.where(
            F.col("l_extendedprice") < 0
        ).agg(F.count("*").alias("n")),
        "lineitem_discount_range": lineitem.where(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
        ).agg(F.count("*").alias("n")),
    }
    got = {name: df.collect()[0].n for name, df in checks.items()}
    assert got == {
        "orders_pk_dups": 1,
        "orders_null_custkey": 1,
        "lineitem_fk_orphans": 1,
        "lineitem_negative_price": 1,
        "lineitem_discount_range": 1,
    }
