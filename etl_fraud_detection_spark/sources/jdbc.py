"""JDBC database source (S6/S7): incremental extract with the
watermark predicate pushed into the source database's own SQL.

Reference parity: the reference reads live PostgreSQL with the
watermark inside the source query (reference etl.py:190-199 —
``SELECT cols, COALESCE(update_dt, create_dt) AS create_dt FROM t
WHERE COALESCE(update_dt, create_dt) > TO_DATE(...)`` — executed over
psycopg2, database.py:49-68). Here the same query template becomes the
JDBC reader's ``dbtable`` subquery, so the filter runs *inside the
source database* — already-loaded rows never leave it — and any
Spark-side residual predicate still pushes down as ``PushedFilters``
on the JDBCRelation scan.

Scale notes (100 TB):
- A single JDBC connection serializes the extract. ``partition_column``
  + ``lower_bound``/``upper_bound``/``num_partitions`` split it into
  parallel range queries (one per task), which is the only way a
  1000-executor cluster drains a large source table.
- ``fetchsize`` defaults to 10k rows per round trip; the JDBC default
  (driver-dependent, often 10) would make the extract latency-bound.
- The watermark predicate means daily work is O(delta), not O(table),
  no matter how big the source grows.

Dialect: timestamp literal rendering differs per engine (PostgreSQL
``TIMESTAMP '...'``, Derby ``TIMESTAMP('...')``), so it is a pluggable
callable; everything else in the template is ANSI.
"""

from __future__ import annotations

from datetime import datetime
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

TsLiteral = Callable[[datetime], str]


def ansi_ts(dt: datetime) -> str:
    """ANSI / PostgreSQL timestamp literal."""
    return f"TIMESTAMP '{dt.isoformat(sep=' ')}'"


def derby_ts(dt: datetime) -> str:
    """Apache Derby timestamp literal (function form)."""
    return f"TIMESTAMP('{dt.isoformat(sep=' ')}')"


def incremental_query(
    table: str,
    columns: tuple[str, ...] | list[str],
    watermark: datetime,
    update_col: str = "update_dt",
    create_col: str = "create_dt",
    ts_literal: TsLiteral = ansi_ts,
) -> str:
    """The reference's incremental-extract query (etl.py:190-199):
    select the mapped columns plus the effective change timestamp,
    filtered to rows newer than the watermark — evaluated by the
    source database, not by Spark."""
    cols = ", ".join(columns)
    eff = f"COALESCE({update_col}, {create_col})"
    return (
        f"SELECT {cols}, {eff} AS create_dt FROM {table} "
        f"WHERE {eff} > {ts_literal(watermark)}"
    )


def _normalize(df: DataFrame) -> DataFrame:
    """Case-folding databases (Derby, Oracle) hand identifiers back
    uppercase — the mapping registry is lowercase throughout — and the
    engine is TIMESTAMP_NTZ end-to-end (wall-clock semantics, matching
    the reference's timestamp-without-time-zone DDL)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampType

    df = df.toDF(*[c.lower() for c in df.columns])
    ts_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampType)]
    if ts_cols:
        df = df.withColumns({c: F.col(c).cast("timestamp_ntz") for c in ts_cols})
    return df


def _reader(spark: SparkSession, url: str, query: str, driver: str | None,
            fetchsize: int, prefer_ntz: bool = True):
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"({query}) src")
        .option("fetchsize", str(fetchsize))
        # partitioned scans reject TIMESTAMP_NTZ partition columns, so
        # those read as TIMESTAMP and _normalize casts after load
        .option("preferTimestampNTZ", str(prefer_ntz).lower())
    )
    if driver:
        r = r.option("driver", driver)
    return r


def read_incremental(
    spark: SparkSession,
    url: str,
    table: str,
    columns: tuple[str, ...] | list[str],
    watermark: datetime,
    update_col: str = "update_dt",
    create_col: str = "create_dt",
    driver: str | None = None,
    ts_literal: TsLiteral = ansi_ts,
    partition_column: str | None = None,
    lower_bound: str | int | None = None,
    upper_bound: str | int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10000,
) -> DataFrame:
    """S6: watermark-incremental JDBC extract. The WHERE clause ships to
    the source database inside the dbtable subquery; with
    ``partition_column`` the extract fans out to ``num_partitions``
    parallel range-bounded queries."""
    q = incremental_query(table, columns, watermark, update_col, create_col, ts_literal)
    r = _reader(spark, url, q, driver, fetchsize, prefer_ntz=partition_column is None)
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return _normalize(r.load())


def read_keys(
    spark: SparkSession,
    url: str,
    table: str,
    key_columns: tuple[str, ...] | list[str],
    driver: str | None = None,
    fetchsize: int = 10000,
) -> DataFrame:
    """S7: the full key snapshot for delete detection (reference
    etl.py:202-209) — keys only, never the full row, so even a huge
    source table ships O(keys) bytes."""
    q = f"SELECT {', '.join(key_columns)} FROM {table}"
    return _normalize(_reader(spark, url, q, driver, fetchsize).load())
