"""Skew-aware join helpers.

AQE's skew-join split handles most hot keys at runtime, but it only
kicks in for sort-merge joins and after a stage materializes. Salting
fixes the plan shape up front: the big side's rows scatter across
``n_salt`` sub-keys (deterministically, from a row-unique column — never
rand(), which would break retry/idempotence), the small side replicates
once per salt, and the hot key's partition splits n ways. Result set is
provably identical to the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    salt_source: Column,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``keys`` with an ``n_salt``-way salt.

    ``salt_source`` must be a deterministic expression over big-side
    columns that varies within a key (a row id), so a single hot key
    spreads over n_salt shuffle partitions. The small side explodes
    n_salt× (fine for dimension tables; that is the price of the skew
    fix). Output columns = the unsalted join's columns."""
    salt = F.pmod(F.xxhash64(salt_source), F.lit(n_salt)).cast("int")
    salted_big = big.withColumn("_salt", salt)
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return salted_big.join(salted_small, keys + ["_salt"], how).drop("_salt")


def range_join_binned(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_seconds: int = 3600,
) -> DataFrame:
    """Pure range join (no equi key): event rows matched to every
    interval with ``start <= ts < end``, by time-binning.

    A naive theta join is |E|x|I| — Catalyst can only nested-loop it.
    Binning makes it an equi-join: each interval explodes into the time
    bins it overlaps (intervals are short — a handful of bins), events
    map to exactly one bin, the join runs hash-partitioned on the bin,
    and the residual range predicate prunes within the bin. Each
    (event, interval) pair meets in exactly one bin (the event's), so no
    dedup pass is needed. Pick ``bin_seconds`` near the typical interval
    length: shorter bins = more interval copies, longer bins = more
    non-matching pairs passing to the residual filter."""
    ev_bin = F.floor(F.unix_timestamp(F.col(ts_col)) / bin_seconds)
    iv_bins = F.sequence(
        F.floor(F.unix_timestamp(F.col(start_col)) / bin_seconds),
        F.floor((F.unix_timestamp(F.col(end_col)) - 1) / bin_seconds),
    )
    e = events.withColumn("_bin", ev_bin)
    i = intervals.withColumn("_bin", F.explode(iv_bins))
    return (
        e.join(i, ["_bin"])
        .where((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_bin")
    )


def fuzzy_blocked_pairs(
    names: DataFrame,
    name_col: str,
    max_dist: int = 2,
    block: Column | None = None,
) -> DataFrame:
    """Fuzzy self-match: pairs of distinct ``name_col`` values within
    edit distance ``max_dist``, found via blocking — the standard record-
    linkage shape (entity resolution across vendor feeds, near-identical
    product names, typo'd identifiers).

    All-pairs levenshtein is |N|² and plans as a nested-loop join; the
    blocking key turns it into an equi-join so only candidates sharing a
    block ever meet, and the edit-distance filter runs on those pairs
    alone. Default block = the name's last whitespace token (the head
    noun in noun-phrase names); any deterministic expression over the
    name works — length buckets, first-k chars, soundex. Recall is bounded
    by the block (edits inside the blocked token can escape it — the
    documented blocking trade-off); precision is exact. ``a < b``
    canonicalizes pair order."""
    blk = block if block is not None else F.element_at(F.split(F.col("_n"), " "), -1)
    d = names.select(F.col(name_col).alias("_n")).distinct().withColumn("_blk", blk)
    a = d.select(F.col("_n").alias("name_a"), F.col("_blk").alias("blk_a"))
    b = d.select(F.col("_n").alias("name_b"), F.col("_blk").alias("blk_b"))
    return (
        a.join(b, (F.col("blk_a") == F.col("blk_b")) & (F.col("name_a") < F.col("name_b")))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist")
    )


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: list[str],
    num_buckets: int,
    path: str,
    reuse_token: str | None = None,
) -> None:
    """Materialize ``df`` as a bucketed+sorted external parquet table:
    rows hash-partitioned into ``num_buckets`` files per partition on
    ``keys`` and sorted within each bucket. Tables bucketed the same
    way join and aggregate on those keys with ZERO exchanges — the
    scan itself carries the hash distribution, which is the ingest-once
    / join-many-times lever for 100 TB fact tables (the write pays one
    shuffle; every later join/groupBy on the key pays none).

    The table is external (explicit ``path``); ``spark.table(name)``
    reads it back bucket-aware.

    ``reuse_token`` makes the write idempotent per SOURCE VERSION: pass
    a content-address of the input (e.g. source path + mtime + size +
    schema). If the table directory already carries a matching token
    marker the shuffle+write is SKIPPED — the existing files are
    re-registered in the catalog if needed (CREATE TABLE ... CLUSTERED
    BY, metadata only) — so repeated runs pay the bucketing once and
    then measure what the operator exists to demonstrate: the
    zero-exchange probe. Without a token the table is dropped and
    rewritten every call (the pre-round-5 behavior).

    The BUCKETING SPEC (keys, num_buckets, schema) is folded into the
    stored marker here, not trusted to the caller's token: re-registering
    existing files under a different declared spec would make Spark
    plan exchange-free merge joins over wrongly-hashed buckets — rows
    silently missing from the join output."""
    import os

    spark = df.sparkSession
    spec = (
        f"|keys={','.join(keys)}|buckets={num_buckets}"
        f"|schema={df.schema.simpleString()}"
    )
    if reuse_token is not None:
        reuse_token = reuse_token + spec
    marker = os.path.join(path, "._bucket_token")
    if reuse_token is not None and os.path.exists(marker):
        # a matching marker alone is not proof the data survived: under
        # /tmp reaping the parquet parts can vanish while the tiny marker
        # file's atime keeps it alive — re-registering an empty directory
        # would feed a silently row-less table into the join
        has_parts = any(
            f.endswith(".parquet") for f in os.listdir(path)
        )
        with open(marker) as fh:
            if has_parts and fh.read() == reuse_token:
                if not spark.catalog.tableExists(name):
                    cols = ", ".join(
                        f"`{f.name}` {f.dataType.simpleString()}"
                        for f in df.schema.fields
                    )
                    ks = ", ".join(f"`{k}`" for k in keys)
                    spark.sql(
                        f"CREATE TABLE {name} ({cols}) USING parquet "
                        f"CLUSTERED BY ({ks}) SORTED BY ({ks}) "
                        f"INTO {num_buckets} BUCKETS LOCATION '{path}'"
                    )
                return
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, *keys)
        .sortBy(*keys)
        .option("path", path)
        .saveAsTable(name)
    )
    if reuse_token is not None:
        with open(marker, "w") as fh:
            fh.write(reuse_token)
