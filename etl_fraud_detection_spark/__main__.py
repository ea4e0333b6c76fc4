"""Scheduled entry point — the rebuild of the reference's scheduler
artifact (main.cron:1 ``30 3 * * * .../main.py`` + main.py:6-18).

One daily invocation runs the full lifecycle (files → db tables →
mart) exactly like ``main.py``'s ``ETL(...)`` sequence; install it
under cron (or any scheduler) as:

    # m h dom mon dow command                       (reference: 03:30 daily)
    30 3 * * * /usr/bin/python3 -m etl_fraud_detection_spark \
        --data-dir /srv/etl/incoming --warehouse /srv/etl/warehouse \
        --jdbc-config /srv/etl/jdbc.json --archive

On a cluster, replace cron with your orchestrator of choice (Airflow /
Dagster task calling :func:`pipeline.run_daily`) — the function is the
unit of scheduling; this module is just the thinnest shell around it.

``--jdbc-config`` points at a JSON file mapping mapping-name → kwargs
for :func:`pipeline.ingest_database` (at least ``url`` and ``table``),
mirroring main.py:7-13's source-database connection block without
hard-coding credentials in code.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m etl_fraud_detection_spark",
        description="Run one daily ETL batch (files -> STG -> SCD DWH -> fraud report).",
    )
    ap.add_argument("--data-dir", required=True, help="incoming-file directory to scan")
    ap.add_argument("--warehouse", required=True, help="warehouse root (stg/dwh/rep layers)")
    ap.add_argument(
        "--jdbc-config",
        help="JSON file: {mapping_name: {url, table, ...}} for live JDBC sources",
    )
    ap.add_argument(
        "--archive", action="store_true",
        help="move consumed files to <data-dir>/archive/*.backup after commit",
    )
    args = ap.parse_args(argv)

    from . import pipeline
    from .session import get_spark

    jdbc_tables = None
    if args.jdbc_config:
        with open(args.jdbc_config) as fh:
            jdbc_tables = json.load(fh)

    spark = get_spark("etl-daily")
    run_id = pipeline.run_daily(
        spark, args.data_dir, args.warehouse,
        jdbc_tables=jdbc_tables, do_archive=args.archive,
    )
    print(f"run {run_id} committed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
