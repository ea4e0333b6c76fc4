"""Fraud-domain fixture tables (FIXTURES.md family A) mirroring the
reference DWH schema (main.ddl:139-218), with golden scenario rows for
each fraud rule including the strict-bound negative cases
(FIXTURES.md A8). Rendered both as Spark DataFrames and DuckDB VALUES
CTEs via plans.fixtures helpers.

Expected report at these fixtures: TX11 (rule 1, expired passport),
TX20 (rule 1, blacklisted), TX30 (rule 2), TX41 (rule 3), TX53 (rule 4).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from .fixtures import SENTINEL, spark_df, values_cte

_EF0 = datetime(2024, 1, 1)
BATCH = datetime(2025, 1, 10)

CLIENTS_COLS = [
    "client_id", "first_name", "last_name", "patronymic",
    "passport_num", "passport_valid_to", "phone",
    "effective_from", "effective_to", "deleted_flg",
]
CLIENTS_TYPES = [
    "VARCHAR", "VARCHAR", "VARCHAR", "VARCHAR",
    "VARCHAR", "TIMESTAMP", "VARCHAR",
    "TIMESTAMP", "TIMESTAMP", "BOOLEAN",
]
CLIENTS_ROWS = [
    # CL1: two SCD2 versions — passport expires in v2 (temporal-join test)
    ("CL1", "Ivan", "Petrov", "Sergeevich", "P1", datetime(2026, 1, 1), "+7001",
     _EF0, datetime(2025, 1, 4, 23, 59, 59), False),
    ("CL1", "Ivan", "Petrov", "Sergeevich", "P1", datetime(2025, 1, 5), "+7001",
     datetime(2025, 1, 5), SENTINEL, False),
    # CL2: NULL passport_valid_to (3-valued OR) + blacklisted passport
    ("CL2", "Anna", "Orlova", "Igorevna", "P2", None, "+7002", _EF0, SENTINEL, False),
    # CL3: NULL patronymic (CONCAT_WS skip)
    ("CL3", "Pyotr", "Sidorov", None, "P3", datetime(2026, 1, 1), "+7003", _EF0, SENTINEL, False),
    ("CL4", "Olga", "Popova", "Dmitrievna", "P4", datetime(2026, 1, 1), "+7004", _EF0, SENTINEL, False),
    ("CL5", "Igor", "Volkov", "Olegovich", "P5", datetime(2026, 1, 1), "+7005", _EF0, SENTINEL, False),
    ("CL6", "Dina", "Koneva", "Pavlovna", "P6", datetime(2026, 1, 1), "+7006", _EF0, SENTINEL, False),
    ("CL7", "Lev", "Orlov", "Maximovich", "P7", datetime(2026, 1, 1), "+7007", _EF0, SENTINEL, False),
]

ACCOUNTS_COLS = ["account_num", "valid_to", "client", "effective_from", "effective_to", "deleted_flg"]
ACCOUNTS_TYPES = ["VARCHAR", "TIMESTAMP", "VARCHAR", "TIMESTAMP", "TIMESTAMP", "BOOLEAN"]
ACCOUNTS_ROWS = [
    ("A1", datetime(2026, 1, 1), "CL1", _EF0, SENTINEL, False),
    ("A2", datetime(2026, 1, 1), "CL2", _EF0, SENTINEL, False),
    ("A3", datetime(2025, 1, 2), "CL3", _EF0, SENTINEL, False),  # rule-2 expired contract
    ("A4", datetime(2026, 1, 1), "CL4", _EF0, SENTINEL, False),
    ("A5", datetime(2026, 1, 1), "CL5", _EF0, SENTINEL, False),
    ("A6", datetime(2026, 1, 1), "CL6", _EF0, SENTINEL, False),
    ("A7", datetime(2026, 1, 1), "CL7", _EF0, SENTINEL, False),
]

CARDS_COLS = ["card_num", "account_num", "effective_from", "effective_to", "deleted_flg"]
CARDS_TYPES = ["VARCHAR", "VARCHAR", "TIMESTAMP", "TIMESTAMP", "BOOLEAN"]
CARDS_ROWS = [(f"CR{i}", f"A{i}", _EF0, SENTINEL, False) for i in range(1, 8)]

TERMINALS_COLS = ["terminal_id", "terminal_city", "effective_from", "effective_to", "deleted_flg"]
TERMINALS_TYPES = ["VARCHAR", "VARCHAR", "TIMESTAMP", "TIMESTAMP", "BOOLEAN"]
TERMINALS_ROWS = [
    ("TM1", "Moscow", _EF0, SENTINEL, False),
    ("TM2", "Tver", _EF0, SENTINEL, False),
    ("TM3", "Kazan", _EF0, SENTINEL, False),
]

BLACKLIST_COLS = ["passport_num", "entry_dt"]
BLACKLIST_TYPES = ["VARCHAR", "TIMESTAMP"]
BLACKLIST_ROWS = [("P2", datetime(2025, 1, 3))]

TRANS_COLS = ["trans_id", "trans_date", "amt", "card_num", "oper_type", "oper_result", "terminal", "create_dt"]
TRANS_TYPES = ["VARCHAR", "TIMESTAMP", "DOUBLE", "VARCHAR", "VARCHAR", "VARCHAR", "VARCHAR", "TIMESTAMP"]
TRANS_ROWS = [
    # CL1 — rule 1 via expired passport (v2); strict-bound negatives
    ("TX10", datetime(2025, 1, 4, 10, 0), 100.0, "CR1", "PAYMENT", "SUCCESS", "TM1", BATCH),
    ("TX11", datetime(2025, 1, 6, 10, 0), 110.0, "CR1", "PAYMENT", "SUCCESS", "TM1", BATCH),  # FRAUD r1
    ("TX12", datetime(2025, 1, 5, 0, 0), 120.0, "CR1", "PAYMENT", "SUCCESS", "TM1", BATCH),   # == valid_to: no
    # CL2 — rule 1 via blacklist (strict > entry_dt)
    ("TX20", datetime(2025, 1, 4, 12, 0), 50.0, "CR2", "PAYMENT", "SUCCESS", "TM1", BATCH),   # FRAUD r1
    ("TX21", datetime(2025, 1, 3, 0, 0), 60.0, "CR2", "PAYMENT", "SUCCESS", "TM1", BATCH),    # == entry_dt: no
    # CL3 — rule 2 (strict > account valid_to)
    ("TX30", datetime(2025, 1, 3, 9, 0), 70.0, "CR3", "PAYMENT", "SUCCESS", "TM1", BATCH),    # FRAUD r2
    ("TX31", datetime(2025, 1, 2, 0, 0), 80.0, "CR3", "PAYMENT", "SUCCESS", "TM1", BATCH),    # == valid_to: no
    # CL4 — rule 3: city hop within the hour; 1.5h gap negative
    ("TX40", datetime(2025, 1, 7, 12, 0), 10.0, "CR4", "PAYMENT", "SUCCESS", "TM1", BATCH),
    ("TX41", datetime(2025, 1, 7, 12, 30), 11.0, "CR4", "PAYMENT", "SUCCESS", "TM2", BATCH),  # FRAUD r3
    ("TX42", datetime(2025, 1, 7, 14, 0), 12.0, "CR4", "PAYMENT", "SUCCESS", "TM1", BATCH),   # 1.5h: no
    # CL7 — rule 3 negative: exactly 1 hour (strict <)
    ("TX70", datetime(2025, 1, 8, 12, 0), 10.0, "CR7", "PAYMENT", "SUCCESS", "TM1", BATCH),
    ("TX71", datetime(2025, 1, 8, 13, 0), 11.0, "CR7", "PAYMENT", "SUCCESS", "TM3", BATCH),   # == 1h: no
    # CL5 — rule 4 positive: 3 decreasing rejects then success within 20 min
    ("TX50", datetime(2025, 1, 9, 10, 0), 100.0, "CR5", "WITHDRAW", "REJECT", "TM1", BATCH),
    ("TX51", datetime(2025, 1, 9, 10, 5), 90.0, "CR5", "WITHDRAW", "REJECT", "TM1", BATCH),
    ("TX52", datetime(2025, 1, 9, 10, 10), 80.0, "CR5", "WITHDRAW", "REJECT", "TM1", BATCH),
    ("TX53", datetime(2025, 1, 9, 10, 15), 70.0, "CR5", "WITHDRAW", "SUCCESS", "TM1", BATCH),  # FRAUD r4
    # CL6 — rule 4 negative: success at exactly min_dt + 20 min (strict <)
    ("TX60", datetime(2025, 1, 9, 10, 0), 100.0, "CR6", "PAYMENT", "REJECT", "TM1", BATCH),
    ("TX61", datetime(2025, 1, 9, 10, 6), 90.0, "CR6", "PAYMENT", "REJECT", "TM1", BATCH),
    ("TX62", datetime(2025, 1, 9, 10, 12), 80.0, "CR6", "PAYMENT", "REJECT", "TM1", BATCH),
    ("TX63", datetime(2025, 1, 9, 10, 20), 70.0, "CR6", "PAYMENT", "SUCCESS", "TM1", BATCH),   # == 20min: no
]

_TABLES = {
    "ff_transactions": (TRANS_ROWS, TRANS_COLS, TRANS_TYPES),
    "ff_cards_hist": (CARDS_ROWS, CARDS_COLS, CARDS_TYPES),
    "ff_accounts_hist": (ACCOUNTS_ROWS, ACCOUNTS_COLS, ACCOUNTS_TYPES),
    "ff_clients_hist": (CLIENTS_ROWS, CLIENTS_COLS, CLIENTS_TYPES),
    "ff_terminals_hist": (TERMINALS_ROWS, TERMINALS_COLS, TERMINALS_TYPES),
    "ff_blacklist": (BLACKLIST_ROWS, BLACKLIST_COLS, BLACKLIST_TYPES),
}


def fraud_tables(spark: SparkSession) -> dict[str, DataFrame]:
    return {name: spark_df(spark, *spec) for name, spec in _TABLES.items()}


def fraud_tables_cte() -> str:
    """WITH-clause body defining every fixture table for the oracle,
    plus an empty accumulating report (watermark -> 1800-01-01)."""
    parts = [f"{name} AS ({values_cte(*spec)})" for name, spec in _TABLES.items()]
    parts.append(
        "ff_report AS (SELECT CAST(NULL AS DATE) AS report_dt WHERE 1 = 0)"
    )
    return ",\n    ".join(parts)
