"""Test-table catalog: load the driver's parquet tables uniformly.

The driver generates TPC-H-ish parquet at /root/testdata/sf*/ (TESTDATA.md).
One wrinkle: ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which
Spark only reads via ``spark.sql.legacy.parquet.nanosAsLong=true`` (as a
bigint of nanoseconds). DuckDB (the correctness oracle) truncates nanos to
microseconds, so we convert ``ns div 1000 -> timestamp`` to match exactly.

All timestamp columns are normalized to TIMESTAMP_NTZ so query semantics
are independent of the session timezone (the driver's session may not be
UTC). Loading is a metadata-only operation — the conversions below are
projections Catalyst fuses into the scan; nothing is materialized.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from .session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Columns stored as TIMESTAMP(NANOS) in parquet (read as long ns).
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with normalized timestamp columns."""
    tune(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _NANOS_TS_COLS.get(name, ()):
        if isinstance(df.schema[c].dataType, T.LongType):
            # nanos -> micros, truncating exactly like DuckDB does.
            df = df.withColumn(
                c, F.expr(f"cast(timestamp_micros({c} div 1000) as timestamp_ntz)")
            )
    for field in df.schema.fields:
        if isinstance(field.dataType, T.TimestampType):
            # LTZ -> NTZ keeps the stored wall-clock under any session tz.
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp_ntz"))
    return df


def events_ts_physical(events_path: str) -> str:
    """``'nanos-long'`` | ``'timestamp'`` — the physical type of
    ``events.ts`` per the parquet footer.

    The driver's testdata has shipped ``events.ts`` both as
    TIMESTAMP(NANOS) (which Spark only reads via ``nanosAsLong=true``,
    i.e. as a bigint of nanoseconds) and as TIMESTAMP(MICROS) (read as
    a real (n)tz timestamp). Batch reads branch on the *inferred* Spark
    type (:func:`load_table`); streaming reads must declare a schema up
    front, so they branch here on the footer instead. ``events_path``
    may be a single parquet file or a directory of them.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    while os.path.isdir(events_path):
        # descend: a dir of part files, or a dir-valued events.parquet
        # symlink (the scaled-probe layout) — keep going until a file
        parts = sorted(
            f
            for f in os.listdir(events_path)
            if f.endswith(".parquet") or f.startswith("part-")
        )
        if not parts:
            raise FileNotFoundError(f"no parquet files under {events_path}")
        events_path = os.path.join(events_path, parts[0])
    t = pq.read_schema(events_path).field("ts").type
    if pa.types.is_timestamp(t) and t.unit != "ns":
        return "timestamp"
    return "nanos-long"


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """Register all tables as temp views (for spark.sql-based plans)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name + suffix)
