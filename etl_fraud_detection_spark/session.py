"""SparkSession factory.

Local test/bench sessions run on local[$SPARK_GRAFT_CPUS]; the driver may
also hand us a pre-built session (``__spark_entry__.entry``), in which case
:func:`tune` applies the runtime-settable confs we rely on (UTC session
timezone, nanos-parquet compat, AQE) without restarting the JVM.

Scale notes (100 TB target): everything here is runtime config only —
shuffle partitioning for a real cluster is sized per-query via AQE
(``spark.sql.adaptive.coalescePartitions``), broadcast joins are requested
explicitly at the plan level (plans/fraud.py), and nothing below pins a
driver-side collect into the hot path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe (and required) to set at runtime on ANY session,
# including one the driver built for us.
_RUNTIME_CONFS = {
    # Testdata events.parquet stores TIMESTAMP(NANOS) which Spark refuses
    # by default; read as long and convert in catalog.load_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic timestamp semantics vs the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Runtime re-planning: coalesce small shuffle partitions, split skewed
    # ones — the main lever that makes one plan work at sf0.001 and 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Cached frames otherwise pin their pre-AQE output partitioning, so
    # every stage downstream of a persist() (the iterative dedup loop,
    # the LSH verify, anything reading a persisted intermediate) inherits
    # the full shuffle-partition fan-out no matter how small the cached
    # data is. Letting AQE re-plan cached output partitioning sizes those
    # stages to the data (measured ~40% off near_dup_clusters at sf0.1);
    # at 100 TB the same flag keeps large caches large — it only removes
    # the "cache freezes partitioning" cliff.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (best effort)."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - static conf on odd builds
            pass
    return spark


def get_spark(
    app_name: str = "etl-fraud-detection-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession tuned for this engine.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all cores. Shuffle
    partitions default to the core count — at local scale more partitions
    are pure overhead; on a real cluster AQE coalescing makes the initial
    number a ceiling, not a constant.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # local[32] on a 128 GiB host: one JVM IS driver + all 32
        # executor threads, so this heap carries every shuffle, persist,
        # broadcast and checkpoint of the whole catalog. 8g survived but
        # aged across bench sweeps (old-gen pressure from the corpus
        # compositions made sweep 3 measurably slower than sweep 1 —
        # see SCALE.md "Bench comparability, round 7"); sized to the
        # host. Static conf: applies only when this builder actually
        # creates the JVM (driver-provided sessions keep theirs).
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.driver.bindAddress", "127.0.0.1")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.warehouse.dir", "/tmp/spark_graft_warehouse")
        # Whole-stage-codegen class cache (static conf, default 100
        # entries). The catalog runs 150+ distinct queries, each with
        # several codegen stages, so at the default size every query's
        # generated classes are evicted before it runs again and each
        # sweep recompiles the full catalog. Sized to hold the whole
        # workload's generated classes; on a long-lived cluster serving a
        # many-query workload the same sizing applies (classes are small
        # — this trades a few MB of metaspace for recompile latency).
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "4000"),
        )
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return tune(builder.getOrCreate())
