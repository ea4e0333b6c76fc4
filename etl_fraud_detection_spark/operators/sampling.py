"""Deterministic sampling operators for training-data curation.

Random sampling is useless for a reproducible corpus build — resampling
must yield the same rows across engines, retries, and partitionings. So
every operator here derives its randomness from md5 of the row key:
uniform, engine-portable (the DuckDB oracle computes the identical
bytes), and stable under any shuffle or AQE re-plan.

Scale shape (100 TB): both samplers are a single scan — the stratified
one is a pure filter (no shuffle at all; rate lookup folds into codegen
via a CASE chain), and the hash-top-k is a TakeOrderedAndProject
(per-partition top-k then a k-row merge on the driver — no global sort
materialization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Stable uniform bucket in [0, buckets): first 15 hex digits of
    md5(key) as a bigint, mod buckets. 60 bits of hash keeps the modulo
    bias < 2^-50; identical to DuckDB's
    ``('0x' || substr(md5(x),1,15))::BIGINT % buckets``."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast("long")
        % buckets
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, int],
    stratum_col: str,
    key_col: str,
    default_rate: int = 10,
) -> DataFrame:
    """Per-stratum percentage sample: keep a row iff its hash bucket
    falls under the stratum's rate (percent). Deterministic — re-running
    selects the same rows — and exact-ish per stratum without counting
    passes or the sampleBy() two-job overhead."""
    rate = None
    for stratum, pct in rates.items():
        branch = F.when(F.col(stratum_col) == stratum, F.lit(pct))
        rate = branch if rate is None else rate.when(F.col(stratum_col) == stratum, F.lit(pct))
    rate = F.lit(default_rate) if rate is None else rate.otherwise(F.lit(default_rate))
    return df.where(hash_bucket(F.col(key_col)) < rate)


def epoch_shuffle(df: DataFrame, key_col: str) -> DataFrame:
    """Materialize one training epoch's global shuffle order:
    ``shuffle_pos`` = rank of md5(key) — a uniform permutation that is
    identical across engines, retries, and partitionings (what a data
    loader needs to resume mid-epoch deterministically).

    This is the one operator here that pays for a global sort
    (RangePartitioning by the hash). That is inherent: a materialized
    total order IS a sort. At 100 TB you run it once per epoch spec and
    write the result partitioned by `shuffle_pos` range, so consumers
    stream sequentially."""
    from pyspark.sql import Window

    key = F.md5(F.col(key_col).cast("string"))
    w = Window.orderBy(key.asc())
    return df.select(
        "*", F.row_number().over(w).cast("long").alias("shuffle_pos")
    )


def pack_sequences(
    df: DataFrame,
    size_col: str,
    key_col: str,
    capacity: int = 4096,
) -> DataFrame:
    """Assign documents to fixed-capacity context-window packs: stream
    the corpus in deterministic hash order, keep a running size offset,
    and place each doc in the pack where its start offset lands
    (``pack_id = floor(start_offset / capacity)``).

    This is the contiguous-fill packing a sequence-packing dataloader
    does, minus the intra-pack truncation/splitting (a tokenizer-side
    concern). One window cumsum = one sort; at scale, run per
    date-partition to bound the sort and keep packs append-friendly."""
    from pyspark.sql import Window

    key = F.md5(F.col(key_col).cast("string"))
    w = Window.orderBy(key.asc()).rowsBetween(Window.unboundedPreceding, 0)
    start = (F.sum(F.col(size_col)).over(w) - F.col(size_col)).cast("long")
    return df.select(
        "*",
        start.alias("start_offset"),
        F.floor(start / capacity).cast("long").alias("pack_id"),
    )


def domain_mix_sample(
    df: DataFrame,
    budgets: dict[str, int],
    domain_col: str,
    size_col: str,
    key_col: str,
    default_budget: int = 0,
) -> DataFrame:
    """Mix domains to a target token budget: within each domain, stream
    documents in deterministic md5(key) order and keep every document
    that STARTS before the domain's budget boundary (so the kept set
    slightly overshoots, never undershoots, and adding corpus never
    changes which earlier docs are kept — stable under incremental
    builds).

    This is the "sample domain X down to N tokens" step of assembling a
    training mix. One shuffle: a window partitioned by domain ordered by
    the hash — per-domain sort, no global order. Skew = largest single
    domain; at 100 TB, pre-split giant domains on a hash prefix."""
    from pyspark.sql import Window

    budget = None
    for domain, b in budgets.items():
        branch = F.when(F.col(domain_col) == domain, F.lit(b))
        budget = branch if budget is None else budget.when(F.col(domain_col) == domain, F.lit(b))
    budget = F.lit(default_budget) if budget is None else budget.otherwise(F.lit(default_budget))

    key = F.md5(F.col(key_col).cast("string"))
    w = (
        Window.partitionBy(domain_col)
        .orderBy(key.asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = (F.sum(F.col(size_col)).over(w) - F.col(size_col)).cast("long")
    return (
        df.select("*", start.alias("tokens_before"), budget.cast("long").alias("budget"))
        .where(F.col("tokens_before") < F.col("budget"))
    )


def weighted_topk_sample(
    df: DataFrame, k: int, key_col: str, weight_col: str
) -> DataFrame:
    """Fixed-size WEIGHTED sample without replacement (Efraimidis–
    Spirakis A-ES): each row draws a deterministic uniform u from
    md5(key) and ranks by ``ln(u)/w`` descending (equivalently
    u^(1/w)); the top-k is a weighted sample — a row's selection odds
    scale with its weight, yet the draw is reproducible across engines,
    retries, and partitionings.

    u comes from the first 13 hex digits of md5 (52 bits — every value
    exact in a double, u ∈ (0,1) after +1 to dodge ln(0)). The rank key
    ln(u)/w is quantized to micro-units: ln is the one non-IEEE-exact
    op (see corpus.py), and quantization plus the doc-id tie-break
    makes SELECTION identical in both engines even if a last-ulp ln
    divergence lands on a boundary. Executes as TakeOrderedAndProject —
    per-partition top-k, never a global sort."""
    u = (
        (F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 13), 16, 10)
         .cast("double") + 1.0)
        / F.lit(float(1 << 52))
    )
    es_micro = F.floor(
        F.log(u) / F.col(weight_col).cast("double") * 1_000_000 + 0.5
    ).cast("long")
    return (
        df.select("*", es_micro.alias("es_key_micro"))
        .orderBy(F.col("es_key_micro").desc(), F.col(key_col).asc())
        .limit(k)
    )


def hash_topk_sample(df: DataFrame, k: int, key_col: str) -> DataFrame:
    """Fixed-size uniform sample: order by md5(key) and take k. The hash
    order is a uniform random permutation independent of storage order,
    so the first k rows are a uniform k-sample — but reproducible.
    Catalyst executes orderBy+limit as per-partition top-k + k-row merge
    (TakeOrderedAndProject), never a full sort."""
    sort_key = F.md5(F.col(key_col).cast("string")).alias("sample_key")
    return df.select("*", sort_key).orderBy("sample_key").limit(k)
