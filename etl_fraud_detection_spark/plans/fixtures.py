"""Shared fixtures for fixture-based driver queries (SCD engine, fraud
rules). One definition of the rows; rendered both as a Spark DataFrame
and as a DuckDB ``VALUES`` CTE so the oracle check stays exact
(FIXTURES.md family A).

All timestamps are fixture literals — the merge functions take explicit
``now``/``today`` so results are deterministic in both engines.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

SENTINEL = datetime(9999, 12, 31)
NOW = datetime(2025, 1, 15, 12, 0, 0)  # fixture 'NOW()' stamp
TODAY = datetime(2025, 1, 10)  # fixture CURRENT_DATE
BATCH = datetime(2025, 1, 10)  # stg create_dt (file date)


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def values_cte(rows: list[tuple], cols: list[str], types: list[str]) -> str:
    """Render rows as ``SELECT casts FROM (VALUES ...) t(cols)`` —
    explicit casts because DuckDB infers DECIMAL for bare float literals."""
    body = ",\n        ".join(
        "(" + ", ".join(_sql_literal(v) for v in r) + ")" for r in rows
    )
    casts = ", ".join(f"CAST({c} AS {t}) AS {c}" for c, t in zip(cols, types))
    return f"SELECT {casts} FROM (VALUES\n        {body}) AS t({', '.join(cols)})"


def spark_df(spark: SparkSession, rows: list[tuple], cols: list[str], types: list[str]) -> DataFrame:
    spark_types = {
        "VARCHAR": "string",
        "DOUBLE": "double",
        "INT": "int",
        "BIGINT": "bigint",
        "BOOLEAN": "boolean",
        "TIMESTAMP": "timestamp_ntz",
        "DATE": "date",
    }
    schema = ", ".join(f"{c} {spark_types[t]}" for c, t in zip(cols, types))
    # Parallelize into TWO slices at the source: fixture tables are
    # dozens of rows, and letting the default 32 nearly-empty Python
    # slices flow into every downstream stage costs ~150ms of per-slice
    # task/worker setup each. Slicing at the RDD keeps the plan free of
    # repartition Exchanges (plan audits stay about the real shuffles).
    rdd = spark.sparkContext.parallelize(rows, 2)
    return spark.createDataFrame(rdd, schema=schema)


# ---------------------------------------------------------------------------
# SCD1 fixture — fact-like table keyed on trans_id (FIXTURES.md A8 case 5)
# ---------------------------------------------------------------------------

SCD1_COLS = ["trans_id", "amt", "card_num"]
SCD1_KEYS = ["trans_id"]

SCD1_DWH_COLS = SCD1_COLS + ["create_dt", "update_dt", "processed_dt"]
SCD1_DWH_TYPES = ["VARCHAR", "DOUBLE", "VARCHAR", "TIMESTAMP", "TIMESTAMP", "TIMESTAMP"]
_D0 = datetime(2024, 12, 1)
_P0 = datetime(2024, 12, 1, 3, 30)
SCD1_DWH_ROWS = [
    ("T1", 100.0, "C1", _D0, None, _P0),  # unchanged in stg -> no-op
    ("T2", 200.0, "C2", _D0, None, _P0),  # amt changes -> update
    ("T3", None, "C3", _D0, None, _P0),   # NULL -> value: MUST update
    ("T4", 400.0, "C4", _D0, None, _P0),  # value -> NULL: MUST update
    ("T5", 500.0, "C5", _D0, None, _P0),  # absent from stg -> untouched
]

SCD1_STG_COLS = SCD1_COLS + ["create_dt"]
SCD1_STG_TYPES = ["VARCHAR", "DOUBLE", "VARCHAR", "TIMESTAMP"]
SCD1_STG_ROWS = [
    ("T1", 100.0, "C1", BATCH),
    ("T2", 250.0, "C2", BATCH),
    ("T3", 300.0, "C3", BATCH),
    ("T4", 400.0, None, BATCH),
    ("T6", 600.0, "C6", BATCH),  # new key -> insert
]

# ---------------------------------------------------------------------------
# SCD2 fixture — clients-like dim keyed on client_id (FIXTURES.md A4/A8)
# ---------------------------------------------------------------------------

SCD2_COLS = ["client_id", "name", "phone"]
SCD2_KEYS = ["client_id"]

SCD2_DWH_COLS = SCD2_COLS + ["effective_from", "effective_to", "deleted_flg", "processed_dt"]
SCD2_DWH_TYPES = ["VARCHAR", "VARCHAR", "VARCHAR", "TIMESTAMP", "TIMESTAMP", "BOOLEAN", "TIMESTAMP"]
_E0 = datetime(2024, 1, 1)
_E1 = datetime(2024, 6, 30, 23, 59, 59)
_E2 = datetime(2024, 7, 1)
SCD2_DWH_ROWS = [
    # K1: one closed history version + one live current; stg changes phone
    ("K1", "Alice", "110", _E0, _E1, False, _P0),
    ("K1", "Alice", "111", _E2, SENTINEL, False, _P0),
    # K2: live current, identical in stg -> untouched
    ("K2", "Bob", "222", _E0, SENTINEL, False, _P0),
    # K3: live current, key absent from src snapshot -> tombstone
    ("K3", "Carol", "333", _E0, SENTINEL, False, _P0),
    # K4: current IS a tombstone; key reappears in stg -> new live version
    ("K4", "Dan", "444", _E0, SENTINEL, True, _P0),
    # K6: live current with NULL phone; stg also NULL -> unchanged (NULL==NULL)
    ("K6", "Fay", None, _E0, SENTINEL, False, _P0),
    # K7: live current with phone; stg has NULL -> MUST version (value->NULL)
    ("K7", "Gus", "777", _E0, SENTINEL, False, _P0),
]

SCD2_STG_COLS = SCD2_COLS + ["create_dt"]
SCD2_STG_TYPES = ["VARCHAR", "VARCHAR", "VARCHAR", "TIMESTAMP"]
SCD2_STG_ROWS = [
    ("K1", "Alice", "119", BATCH),
    ("K2", "Bob", "222", BATCH),
    ("K4", "Dan", "449", BATCH),
    ("K5", "Eve", "555", BATCH),  # brand-new key -> insert
    ("K6", "Fay", None, BATCH),
    ("K7", "Gus", None, BATCH),
]

# Full source key snapshot: K3 is missing -> delete detection fires.
SCD2_SRC_KEYS_ROWS = [("K1",), ("K2",), ("K4",), ("K5",), ("K6",), ("K7",)]
SCD2_SRC_KEYS_COLS = ["client_id"]
SCD2_SRC_KEYS_TYPES = ["VARCHAR"]
