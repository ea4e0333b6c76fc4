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
