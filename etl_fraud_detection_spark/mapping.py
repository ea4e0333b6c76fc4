"""TableMapping registry — the metadata catalog that drives the engine
(reference trsh_meta_core_table_mapping, main.ddl:53-66, seeded rows
main.ddl:271-347; read at init etl.py:28-43).

The reference stores (source table, target table, column arrays, key
arrays, scd mode) as array-typed columns and splices them into generated
SQL. Here the same metadata is a frozen dataclass registry: the SCD
engine (operators/scd.py) is parameterized by exactly these fields, so
adding a new table to the warehouse is one registry entry — no new code,
same as adding a mapping row in the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class TableMapping:
    source_name: str  # logical source (file stem or db table)
    stg_columns: tuple[str, ...]  # columns as they arrive in staging
    stg_keys: tuple[str, ...]
    dwh_table: str
    dwh_columns: tuple[str, ...]  # target business columns (incl. keys)
    dwh_keys: tuple[str, ...]
    scd: int  # 1 or 2
    decimal_comma_cols: tuple[str, ...] = field(default=())
    # Staging cast types (the reference got these implicitly from the stg
    # DDL, main.ddl:68-137; file sources arrive all-string)
    stg_types: tuple[str, ...] = field(default=())

    def __post_init__(self):
        if not self.stg_types:
            object.__setattr__(self, "stg_types", ("string",) * len(self.stg_columns))


# Seeded like main.ddl:271-347 (source->target column renames preserved:
# accounts/cards 'account' -> 'account_num', blacklist 'date' ->
# 'entry_dt', 'passport' -> 'passport_num').
MAPPINGS: dict[str, TableMapping] = {
    m.source_name: m
    for m in (
        TableMapping(
            source_name="transactions",
            stg_columns=("transaction_id", "transaction_date", "amount",
                         "card_num", "oper_type", "oper_result", "terminal"),
            stg_keys=("transaction_id",),
            dwh_table="fact_transaction",
            dwh_columns=("trans_id", "trans_date", "amt", "card_num",
                         "oper_type", "oper_result", "terminal"),
            dwh_keys=("trans_id",),
            scd=1,
            decimal_comma_cols=("amount",),
            stg_types=("string", "timestamp_ntz", "decimal(18,2)",
                       "string", "string", "string", "string"),
        ),
        TableMapping(
            source_name="passport_blacklist",
            stg_columns=("date", "passport"),
            stg_keys=("passport",),
            dwh_table="fact_passport_blacklist",
            dwh_columns=("entry_dt", "passport_num"),
            dwh_keys=("passport_num",),
            scd=1,
            stg_types=("timestamp_ntz", "string"),
        ),
        TableMapping(
            source_name="terminals",
            stg_columns=("terminal_id", "terminal_type", "terminal_city", "terminal_address"),
            stg_keys=("terminal_id",),
            dwh_table="dim_terminals_hist",
            dwh_columns=("terminal_id", "terminal_type", "terminal_city", "terminal_address"),
            dwh_keys=("terminal_id",),
            scd=2,
        ),
        TableMapping(
            source_name="clients",
            stg_columns=("client_id", "last_name", "first_name", "patronymic",
                         "date_of_birth", "passport_num", "passport_valid_to", "phone"),
            stg_keys=("client_id",),
            dwh_table="dim_clients_hist",
            dwh_columns=("client_id", "last_name", "first_name", "patronymic",
                         "date_of_birth", "passport_num", "passport_valid_to", "phone"),
            dwh_keys=("client_id",),
            scd=2,
        ),
        TableMapping(
            source_name="accounts",
            stg_columns=("account", "valid_to", "client"),
            stg_keys=("account",),
            dwh_table="dim_accounts_hist",
            dwh_columns=("account_num", "valid_to", "client"),
            dwh_keys=("account_num",),
            scd=2,
        ),
        TableMapping(
            source_name="cards",
            stg_columns=("card_num", "account"),
            stg_keys=("card_num",),
            dwh_table="dim_cards_hist",
            dwh_columns=("card_num", "account_num"),
            dwh_keys=("card_num",),
            scd=2,
        ),
    )
}
