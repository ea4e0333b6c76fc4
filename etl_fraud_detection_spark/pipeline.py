"""The daily ETL pipeline: files/db-tables → STG → DWH (SCD) → report.

Reproduces the reference lifecycle (etl.py:132-284, main.py:14-18):

    from_file   : discover → stage (truncate-and-load) → watermark guard
                  → SCD merge (stg doubles as the delete snapshot for
                  file-fed SCD2 dims) → run log → archive
    from_database (here: from_table_snapshot) : incremental extract via
                  watermark predicate + full key snapshot for delete
                  detection → same SCD path
    mart_update : fraud_report() increment appended to the report

Storage is a three-layer parquet warehouse (stg/dwh/rep). SCD merges
read and logically overwrite the same table; parquet can't do that
in-place, so Warehouse.overwrite materializes to a temp dir and swaps —
the "careful write-read-same-path handling" SURVEY §4.2 calls out.

Deliberate deviations from the reference (SURVEY §7 quirks list):
- an already-loaded file (watermark guard) skips the whole batch; the
  reference would still run SCD against the now-empty stage and
  tombstone every key (etl.py:150-177 with empty stg).
- archive() is explicit after commit, not a __del__ side effect.

Scale notes: at 100 TB the fact table is the only big table; it flows
through scd1_merge whose join against the daily delta broadcasts the
delta side. Partition dwh fact parquet by create_dt date (done here via
partitionBy) so the report's watermark filter prunes partitions.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession, functions as F

from .mapping import MAPPINGS, TableMapping
from .operators.scd import scd1_merge, scd2_merge
from .plans.fraud import fraud_report
from .sources import files as fsrc
from .state import RunLog, WatermarkStore

FILE_TEMPLATES = ["transactions_*.txt", "passport_blacklist_*.xlsx", "terminals_*.xlsx",
                  "transactions_*.csv", "passport_blacklist_*.csv", "terminals_*.csv"]


class Warehouse:
    """Three-layer parquet warehouse with swap-on-overwrite."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, layer: str, table: str) -> str:
        return os.path.join(self.root, layer, table)

    def read(self, layer: str, table: str) -> DataFrame | None:
        p = self.path(layer, table)
        if not os.path.exists(p):
            return None
        return self.spark.read.parquet(p)

    def overwrite(self, layer: str, table: str, df: DataFrame, partition_by: list[str] | None = None) -> int:
        """Materialize to <path>.tmp then swap — safe when df reads the
        table being replaced (the SCD recompute pattern)."""
        p = self.path(layer, table)
        tmp = p + ".__tmp__"
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        n = self.spark.read.parquet(tmp).count()
        if os.path.exists(p):
            shutil.rmtree(p)
        os.replace(tmp, p)
        # Invalidate cached plans/file listings over the swapped path:
        # the SCD merge persists intermediates, and Spark's CacheManager
        # would otherwise match a later run's structurally-equal plan to
        # the now-stale cached data (FAILED_READ_FILE on old part files).
        self.spark.catalog.refreshByPath(p)
        return n

    def append(self, layer: str, table: str, df: DataFrame) -> int:
        n = df.count()
        df.write.mode("append").parquet(self.path(layer, table))
        return n

    def compact(self, layer: str, table: str, target_mb: int = 128) -> int:
        """Small-file compaction: rewrite the table into
        ceil(bytes / target_mb) files via the same swap-on-overwrite
        path. Daily appends (and per-batch streaming sinks) accrete
        small files that tax scan planning and the file-listing step at
        scale; periodic compaction to ~HDFS-block-sized files restores
        scan efficiency. Returns the new file count."""
        import math

        p = self.path(layer, table)
        total = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
        )
        n_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
        df = self.spark.read.parquet(p).coalesce(n_files)
        self.overwrite(layer, table, df)
        return sum(
            1
            for root, _, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
        )


def _rename_to_target(df: DataFrame, m: TableMapping) -> DataFrame:
    """P2 positional source→target rename (reference etl.py:286-295)."""
    cols = [F.col(s).alias(t) for s, t in zip(m.stg_columns, m.dwh_columns)]
    extra = [c for c in df.columns if c not in m.stg_columns]
    return df.select(*cols, *[F.col(c) for c in extra])


def _merge_to_dwh(
    wh: Warehouse,
    m: TableMapping,
    stg: DataFrame,
    src_keys: DataFrame | None,
    now=None,
    today=None,
) -> int:
    """SCD dispatch (reference etl.py:158-177): 1 → scd1, 2 → scd2
    (delete+update), both + insert — all inside one functional merge."""
    dwh = wh.read("dwh", m.dwh_table)
    cols = list(m.dwh_columns)
    keys = list(m.dwh_keys)
    if m.scd == 1:
        if dwh is None:
            dwh = wh.spark.createDataFrame(
                [], stg.select(*cols, "create_dt").schema
            ).select(
                "*",
                F.lit(None).cast("timestamp_ntz").alias("update_dt"),
                F.lit(None).cast("timestamp_ntz").alias("processed_dt"),
            )
        merged = scd1_merge(dwh, stg, keys, cols, now=now)
    elif m.scd == 2:
        if dwh is None:
            dwh = wh.spark.createDataFrame([], stg.select(*cols).schema).select(
                "*",
                F.lit(None).cast("timestamp_ntz").alias("effective_from"),
                F.lit(None).cast("timestamp_ntz").alias("effective_to"),
                F.lit(False).alias("deleted_flg"),
                F.lit(None).cast("timestamp_ntz").alias("processed_dt"),
            )
        merged = scd2_merge(dwh, stg, keys, cols, src_keys=src_keys, now=now, today=today)
    else:
        raise ValueError(f"unsupported scd mode {m.scd}")
    return wh.overwrite("dwh", m.dwh_table, merged)


def ingest_file(spark: SparkSession, wh: Warehouse, wm: WatermarkStore, log: RunLog,
                f: fsrc.SourceFile, run_id: int, now=None, today=None,
                do_archive: bool = False) -> bool:
    """One file batch: stage → guard → SCD merge → log (reference
    etl.py:132-180). Returns False when the watermark guard skipped it."""
    m = MAPPINGS[f.name]
    if not wm.should_load(f.name, f.dt):
        log.append(run_id, f.name, inserted=0)
        return False
    kw = {"decimal_comma_cols": list(m.decimal_comma_cols)} if f.ext in ("txt", "csv") else {}
    raw = fsrc.read_any(spark, f, **kw)
    for c, t in zip(m.stg_columns, m.stg_types):
        raw = raw.withColumn(c, F.col(c).cast(t))
    stg = _rename_to_target(fsrc.with_batch_date(raw, f), m)
    n_stg = wh.overwrite("stg", f.name, stg)  # S9 truncate-and-load
    stg = wh.read("stg", f.name)
    # File-fed SCD2 dims: the daily file IS the full snapshot, so it is
    # also the delete-detection key set (reference etl.py:165 passes the
    # stg table as stg_del).
    src_keys = stg.select(*m.dwh_keys) if m.scd == 2 else None
    n_dwh = _merge_to_dwh(wh, m, stg, src_keys, now=now, today=today)
    wm.advance(f.name, f.dt)
    log.append(run_id, f.name, inserted=n_stg)
    log.append(run_id, m.dwh_table, inserted=n_dwh)
    if do_archive:
        fsrc.archive(f)
    return True


def ingest_table_snapshot(spark: SparkSession, wh: Warehouse, wm: WatermarkStore,
                          log: RunLog, name: str, src: DataFrame, run_id: int,
                          now=None, today=None) -> None:
    """DB-source batch (reference etl.py:219-284): incremental rows via
    ``COALESCE(update_dt, create_dt) > watermark`` (S6 — the filter
    pushes into the source scan), plus the full key snapshot (S7) for
    delete detection."""
    m = MAPPINGS[name]
    last = wm.get(name)
    eff_dt = F.coalesce(F.col("update_dt"), F.col("create_dt"))
    delta = (
        src.where(eff_dt > F.lit(last.isoformat(sep=" ")).cast("timestamp_ntz"))
        .select(*m.stg_columns, eff_dt.alias("create_dt"))
    )
    stg = _rename_to_target(delta, m)
    wh.overwrite("stg", name, stg)
    stg = wh.read("stg", name)
    src_keys = src.selectExpr(
        *[f"{s} AS {t}" for s, t in zip(m.stg_keys, m.dwh_keys)]
    )
    n_dwh = _merge_to_dwh(wh, m, stg, src_keys if m.scd == 2 else None, now=now, today=today)
    new_wm = stg.agg(F.max("create_dt")).first()[0]
    if new_wm is not None:
        wm.advance(name, new_wm)
    log.append(run_id, name, inserted=stg.count())
    log.append(run_id, m.dwh_table, inserted=n_dwh)


def ingest_database(spark: SparkSession, wh: Warehouse, wm: WatermarkStore,
                    log: RunLog, name: str, url: str, table: str, run_id: int,
                    driver: str | None = None, ts_literal=None,
                    now=None, today=None, **jdbc_kw) -> None:
    """DB-source batch over a real JDBC connection (reference
    etl.py:190-209, database.py:49-68): the watermark predicate is part
    of the source-side SQL — the database evaluates
    ``COALESCE(update_dt, create_dt) > <watermark>`` and only the delta
    ever crosses the wire (S6) — plus the full key snapshot (S7, keys
    only) for delete detection. From staging on, identical to the
    snapshot path."""
    from .sources import jdbc as jsrc

    m = MAPPINGS[name]
    kw = dict(jdbc_kw)
    if ts_literal is not None:
        kw["ts_literal"] = ts_literal
    delta = jsrc.read_incremental(
        spark, url, table, m.stg_columns, wm.get(name), driver=driver, **kw
    )
    stg = _rename_to_target(delta, m)
    wh.overwrite("stg", name, stg)
    stg = wh.read("stg", name)
    if m.scd == 2:
        src_keys = jsrc.read_keys(spark, url, table, m.stg_keys, driver=driver).selectExpr(
            *[f"{s} AS {t}" for s, t in zip(m.stg_keys, m.dwh_keys)]
        )
    else:
        src_keys = None
    n_dwh = _merge_to_dwh(wh, m, stg, src_keys, now=now, today=today)
    new_wm = stg.agg(F.max("create_dt")).first()[0]
    if new_wm is not None:
        wm.advance(name, new_wm)
    log.append(run_id, name, inserted=stg.count())
    log.append(run_id, m.dwh_table, inserted=n_dwh)


def mart_update(spark: SparkSession, wh: Warehouse, log: RunLog, run_id: int, now=None) -> int:
    """DWH → accumulating fraud report (reference etl.py:409-414)."""
    now = now if now is not None else F.current_timestamp().cast("timestamp_ntz")
    report = wh.read("rep", "rep_fraud")
    if report is None:
        report = spark.createDataFrame([], schema="report_dt date")
    tables = {
        t: wh.read("dwh", t)
        for t in ("fact_transaction", "dim_cards_hist", "dim_accounts_hist",
                  "dim_clients_hist", "dim_terminals_hist", "fact_passport_blacklist")
    }
    missing = [t for t, df in tables.items() if df is None]
    if missing:
        raise RuntimeError(f"mart_update before tables exist: {missing}")
    inc = fraud_report(
        tables["fact_transaction"], tables["dim_cards_hist"],
        tables["dim_accounts_hist"], tables["dim_clients_hist"],
        tables["dim_terminals_hist"], tables["fact_passport_blacklist"],
        report, now,
    )
    n = wh.append("rep", "rep_fraud", inc)
    log.append(run_id, "rep_fraud", inserted=n)
    return n


def run_daily(spark: SparkSession, data_dir: str, warehouse_dir: str,
              db_tables: dict[str, DataFrame] | None = None,
              jdbc_tables: dict[str, dict] | None = None,
              now=None, today=None, do_archive: bool = False) -> int:
    """One scheduled run (reference main.py:14-18 order: files → db
    tables → mart). Returns the run_id.

    ``jdbc_tables`` maps mapping-name → kwargs for ingest_database
    (at least ``url`` and ``table``) for sources read over a live JDBC
    connection; ``db_tables`` remains the DataFrame-snapshot form."""
    wh = Warehouse(spark, warehouse_dir)
    wm = WatermarkStore(os.path.join(warehouse_dir, "meta", "watermarks.json"))
    log = RunLog(spark, os.path.join(warehouse_dir, "meta", "run_log"))
    run_id = log.next_run_id()
    for f in fsrc.discover(data_dir, FILE_TEMPLATES):
        ingest_file(spark, wh, wm, log, f, run_id, now=now, today=today, do_archive=do_archive)
    for name, src in (db_tables or {}).items():
        ingest_table_snapshot(spark, wh, wm, log, name, src, run_id, now=now, today=today)
    for name, kw in (jdbc_tables or {}).items():
        ingest_database(spark, wh, wm, log, name, run_id=run_id, now=now, today=today, **kw)
    mart_update(spark, wh, log, run_id, now=now)
    return run_id
