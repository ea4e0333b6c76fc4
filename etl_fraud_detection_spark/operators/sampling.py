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

from pyspark.sql import Column, DataFrame, Window, functions as F


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Stable uniform bucket in [0, buckets): first 15 hex digits of
    md5(key) as a bigint, mod buckets. 60 bits of hash keeps the modulo
    bias < 2^-50; identical to DuckDB's
    ``('0x' || substr(md5(x),1,15))::BIGINT % buckets``."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast("long")
        % buckets
    )


# Ranged frames persisted by the global-order operators: the data
# branch and the per-partition-offsets branch BOTH consume the range
# exchange, and without a shared materialization they would be two
# independent exchanges — RangePartitioner's reservoir sampling depends
# on input order, so a nondeterministically-ordered upstream (any prior
# shuffle) could give the two branches different partition boundaries
# and corrupt the ranks. persist() makes Catalyst resolve both subtree
# instances to ONE InMemoryRelation (one exchange, one partitioner), and
# doubles as the single-scan fix. Same release contract as
# dedup._PERSISTED_SHINGLES: sweeps call release_ranked() after
# materializing results instead of relying on LRU eviction.
_PERSISTED_RANKED: list[DataFrame] = []


def release_ranked() -> None:
    """Unpersist ranged frames cached by the global-order operators."""
    while _PERSISTED_RANKED:
        try:
            _PERSISTED_RANKED.pop().unpersist()
        except Exception:
            pass


def _ranged_local(df: DataFrame, order_by: list[Column]):
    """Range-partition ``df`` on ``order_by`` and tag each row with its
    partition id. Building block for exact global rank/cumsum WITHOUT a
    single-partition window: the sort is distributed
    (RangePartitioning + per-partition sort), and global positions
    follow by adding per-partition offsets. Persisted — see
    _PERSISTED_RANKED above for why that is a correctness requirement,
    not a cache."""
    ranged = (
        df.repartitionByRange(*order_by)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    _PERSISTED_RANKED.append(ranged)
    return ranged


def _ranked(df: DataFrame, order_by: list[Column]):
    """Shared machinery for rank/ntile: (local frame with _pid + _lrn,
    broadcast offsets frame with _pid/_off/_total)."""
    ranged = _ranged_local(df, order_by)
    w_local = Window.partitionBy("_pid").orderBy(*order_by)
    local = ranged.withColumn("_lrn", F.row_number().over(w_local))
    return local, _partition_offsets(ranged)


def _partition_offsets(local: DataFrame, value_col: Column | None = None):
    """Per-partition exclusive prefix offsets (and grand total) from the
    `_ranged_local` output: one row per range partition, so the global
    cumsum window here runs over at most `spark.sql.shuffle.partitions`
    rows — driver-trivial at any data scale. Shares the range Exchange
    with the main branch via ReusedExchange."""
    val = value_col if value_col is not None else F.lit(1)
    counts = local.groupBy("_pid").agg(F.sum(val).cast("long").alias("_cnt"))
    w_prev = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return counts.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(w_prev), F.lit(0)).cast("long").alias("_off"),
        F.sum("_cnt").over(w_all).cast("long").alias("_total"),
    )


def with_global_rank(
    df: DataFrame, order_by: list[Column], out_col: str = "rn"
) -> DataFrame:
    """Exact global 1-based rank of each row under ``order_by`` (which
    must be tie-free), as a distributed two-pass plan: range-partitioned
    local sort + row_number, then a broadcast join of per-partition row
    counts. Equivalent to ``row_number() OVER (ORDER BY ...)`` but never
    funnels the data through one partition — the only global window runs
    over the per-partition count table (≤ shuffle-partitions rows)."""
    local, offsets = _ranked(df, order_by)
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_lrn") + F.col("_off")).cast("long"))
        .drop("_pid", "_lrn", "_off", "_total")
    )


def with_global_ntile(
    df: DataFrame, order_by: list[Column], n: int, out_col: str = "bucket"
) -> DataFrame:
    """Exact ``ntile(n) OVER (ORDER BY ...)`` without a single-partition
    window: global rank via `with_global_rank`'s machinery plus the
    closed-form ntile bucket. With N rows, q = N div n, r = N mod n,
    the first r tiles hold q+1 rows:
      rank <= r*(q+1)  ->  bucket = (rank-1) div (q+1) + 1
      otherwise        ->  bucket = r + (rank - r*(q+1) - 1) div q + 1
    """
    local, offsets = _ranked(df, order_by)
    def idiv(a: Column, b: Column) -> Column:
        # exact integer division: subtract the remainder first so the
        # double divide is of an exact multiple (no boundary off-by-one
        # from float rounding at large N)
        return ((a - a % b) / b).cast("long")

    rn = F.col("_lrn") + F.col("_off")
    big_n = F.col("_total")
    q, r = idiv(big_n, F.lit(n)), big_n % n
    pivot = r * (q + F.lit(1))
    bucket = (
        F.when(rn <= pivot, idiv(rn - 1, q + 1) + 1)
        .otherwise(r + idiv(rn - pivot - 1, q) + 1)
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, bucket.cast("int"))
        .drop("_pid", "_lrn", "_off", "_total")
    )


def with_global_cumsum(
    df: DataFrame, order_by: list[Column], value_col: Column, out_col: str
) -> DataFrame:
    """Exact inclusive running sum of ``value_col`` in global
    ``order_by`` order (tie-free keys), distributed the same way:
    within-partition cumsum + broadcast per-partition sum offsets."""
    ranged = _ranged_local(df, order_by)
    w_cum = (
        Window.partitionBy("_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.withColumn(
        "_lcum", F.sum(value_col).over(w_cum).cast("long")
    )
    offsets = _partition_offsets(ranged, value_col=value_col)
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_lcum") + F.col("_off")).cast("long"))
        .drop("_pid", "_lcum", "_off", "_total")
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

    A materialized total order IS a sort, but the sort stays
    distributed: `with_global_rank` range-partitions on the hash, ranks
    within each partition, and adds broadcast per-partition offsets —
    no single-partition WindowExec ever touches the corpus. At 100 TB
    you run it once per epoch spec and write the result partitioned by
    `shuffle_pos` range, so consumers stream sequentially.

    Caching contract: the rank machinery persists the range-partitioned
    frame (a correctness requirement — see _PERSISTED_RANKED), and the
    returned frame is lazy, so this function cannot drop it itself.
    Long-lived sessions call :func:`release_ranked` (or
    ``spark.catalog.clearCache()``) after materializing the result, or
    the cached corpus-sized frame stays in executor storage."""
    key = F.md5(F.col(key_col).cast("string"))
    return with_global_rank(df, [key.asc()], out_col="shuffle_pos")


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
    concern). The cumsum runs distributed via `with_global_cumsum`
    (range-partitioned local cumsum + broadcast partition offsets), so
    no single partition ever sees the whole corpus.

    Caching contract: same as :func:`epoch_shuffle` — the rank
    machinery persists a corpus-sized frame the lazy result depends on;
    call :func:`release_ranked` after materializing in a long-lived
    session."""
    key = F.md5(F.col(key_col).cast("string"))
    out = with_global_cumsum(
        df, [key.asc()], F.col(size_col), out_col="_cum"
    )
    start = (F.col("_cum") - F.col(size_col)).cast("long")
    return out.select(
        *df.columns,
        start.alias("start_offset"),
        F.floor(start / capacity).cast("long").alias("pack_id"),
    )


def pack_sequences_sharded(
    df: DataFrame,
    size_col: str,
    key_col: str,
    capacity: int = 4096,
    shards: int = 256,
) -> DataFrame:
    """Sharded contiguous-fill packing: documents hash into one of
    ``shards`` deterministic md5-prefix shards, and each shard packs
    independently in md5 order (``pack_id = shard * 2^32 + local
    pack``). Within a shard the semantics are exactly
    :func:`pack_sequences`; cross-shard contiguity is given up
    DELIBERATELY — a dataloader consumes shards independently anyway,
    and the payoff is the scale shape: the cumsum window is partitioned
    by shard, so this is ONE ordinary distributed shuffle with no
    global order and no second pass over the input. Use this inside
    composed pipelines (the input is consumed once); use
    `pack_sequences` when a strict corpus-wide total order is the
    deliverable."""
    key = F.md5(F.col(key_col).cast("string"))
    shard = (
        F.conv(F.substring(key, 1, 15), 16, 10).cast("long") % shards
    )
    tagged = df.select("*", key.alias("_mk"), shard.alias("shard"))
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("_mk").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = (F.sum(F.col(size_col)).over(w) - F.col(size_col)).cast("long")
    return tagged.select(
        *df.columns,
        "shard",
        start.alias("start_offset"),
        (F.col("shard") * F.lit(1 << 32)
         + F.floor(start / capacity).cast("long")).alias("pack_id"),
    )


def pack_sequences_ffd(
    df: DataFrame,
    size_col: str,
    key_col: str,
    capacity: int = 4096,
    shards: int = 64,
) -> DataFrame:
    """NO-SPLIT bin packing (first-fit-decreasing): documents hash into
    ``shards`` deterministic md5-prefix shards; within a shard, docs
    sort by size desc (md5 tiebreak) and each lands in the FIRST open
    pack with room, else opens a new pack. Every document stays WHOLE in
    exactly one pack — the packing a dataloader needs when documents
    must not straddle context windows — and FFD keeps the padding waste
    near-optimal (≤ 11/9·OPT + 1 packs, the classical bound). The
    contiguous-fill packers (:func:`pack_sequences`) are the zero-waste
    alternative when straddling/truncation is acceptable.

    Oversized docs (size > capacity) get a pack of their own (splitting
    is a tokenizer-side concern, parity with pack_sequences).

    Scale shape: ONE shuffle (hash by shard), then an Arrow-batched
    per-shard pass; the greedy is sequential ONLY within a shard, so
    the ``shards`` dial bounds both group memory and skew exactly like
    pack_sequences_sharded. ``pack_id = shard·2^32 + local``."""
    import pandas as pd

    key = F.md5(F.col(key_col).cast("string"))
    shard = F.conv(F.substring(key, 1, 15), 16, 10).cast("long") % shards
    tagged = df.select("*", key.alias("_mk"), shard.alias("shard"))
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in tagged.schema.fields
        if f.name != "_mk"
    ) + ", pack_id long"

    def ffd(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(
            [size_col, "_mk"], ascending=[False, True], kind="mergesort"
        )
        sh = int(pdf["shard"].iloc[0])
        room: list[int] = []  # remaining capacity per open pack
        packs = []
        for sz in pdf[size_col].astype("int64"):
            for i, r in enumerate(room):
                if sz <= r:
                    room[i] -= sz
                    packs.append(i)
                    break
            else:
                room.append(max(0, capacity - sz))
                packs.append(len(room) - 1)
        pdf = pdf.drop(columns=["_mk"])
        pdf["pack_id"] = [(sh << 32) + p for p in packs]
        return pdf

    return tagged.groupBy("shard").applyInPandas(ffd, out_schema)


def domain_mix_sample(
    df: DataFrame,
    budgets: dict[str, int],
    domain_col: str,
    size_col: str,
    key_col: str,
    default_budget: int = 0,
    checkpoint: bool = False,
) -> DataFrame:
    """Mix domains to a target token budget: within each domain, stream
    documents in deterministic md5(key) order and keep every document
    that STARTS before the domain's budget boundary (so the kept set
    slightly overshoots, never undershoots, and adding corpus never
    changes which earlier docs are kept — stable under incremental
    builds).

    This is the "sample domain X down to N tokens" step of assembling a
    training mix. Skew-safe per-domain running total (round 10): one
    domain can dominate a crawl, and a single window partitioned by
    domain would put that whole domain's sort on one reducer. Instead
    the md5 order is split on its OWN two-hex-digit prefix (256 salted
    buckets — ordering by (prefix, key) IS ordering by key): the local
    cumulative sum runs per (domain, prefix) bucket, per-bucket totals
    aggregate to a domains×256 table (the bounded-collect class), the
    per-domain exclusive prefix totals come from a window over THAT
    tiny table, and a broadcast join stitches global = offset + local.
    Max partition = largest domain / 256, and every stage over corpus
    rows is map-side-combinable or bucket-local.

    The salted shape reads the input TWICE (the per-bucket totals
    aggregate and the main cumsum are two consumers) where the old
    single window scanned once — the accepted price of the skew
    hardening when ``df`` is a parquet scan (a re-scan with pushdown
    is cheap). Pass ``checkpoint=True`` when ``df`` is an expensive
    derived frame, to materialize it once for both consumers
    (eager, executor-local storage — the multi-consumer discipline of
    dedup._first_occurrence_flag)."""
    from pyspark.sql import Window

    budget = None
    for domain, b in budgets.items():
        branch = F.when(F.col(domain_col) == domain, F.lit(b))
        budget = branch if budget is None else budget.when(F.col(domain_col) == domain, F.lit(b))
    budget = F.lit(default_budget) if budget is None else budget.otherwise(F.lit(default_budget))

    tagged = df.withColumn(
        "_key", F.md5(F.col(key_col).cast("string"))
    ).withColumn("_salt", F.substring(F.col("_key"), 1, 2))
    if checkpoint:
        tagged = tagged.localCheckpoint()
    w_local = (
        Window.partitionBy(domain_col, "_salt")
        .orderBy(F.col("_key").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local_before = (
        F.sum(F.col(size_col)).over(w_local) - F.col(size_col)
    ).cast("long")
    totals = tagged.groupBy(domain_col, "_salt").agg(
        F.sum(size_col).cast("long").alias("_bt")
    )
    w_dom = (
        Window.partitionBy(domain_col)
        .orderBy(F.col("_salt").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        domain_col, "_salt",
        F.coalesce(F.sum("_bt").over(w_dom), F.lit(0))
        .cast("long").alias("_off"),
    )
    return (
        tagged.withColumn("_lb", local_before)
        .join(F.broadcast(offsets), [domain_col, "_salt"])
        .select(
            *df.columns,
            (F.col("_off") + F.col("_lb")).alias("tokens_before"),
            budget.cast("long").alias("budget"),
        )
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


def holdout_split(
    df: DataFrame,
    key_col: str = "doc_id",
    splits: tuple[tuple[str, int], ...] = (("train", 90), ("val", 5), ("test", 5)),
    buckets: int = 100,
) -> DataFrame:
    """Deterministic train/val/test assignment: md5-bucket the row key
    and carve [0, buckets) into contiguous split ranges (default
    90/5/5). A pure filter-free projection — ZERO shuffle, stable under
    retries, engine-portable (the oracle computes identical buckets) —
    the standard hash-split used to freeze evaluation holdouts.

    Leakage note: run this AFTER dedup survivor selection
    (dedup.cluster_survivors) — hashing raw doc ids sends near-dup
    copies to different splits; hashing a deduplicated corpus can't.

    Appends ``bucket`` and ``split`` columns; fractions are binomially
    approximate per stratum (exactness belongs to the budget-fill
    operator, :func:`domain_mix_sample`)."""
    b = hash_bucket(F.col(key_col), buckets)
    total = sum(n for _, n in splits)
    if total != buckets:
        raise ValueError(f"split widths sum to {total}, expected {buckets}")
    expr = None
    lo = 0
    for name, width in splits[:-1]:
        lo += width
        cond = b < lo
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(splits[-1][0]) if expr is None else expr.otherwise(splits[-1][0])
    )
    return df.withColumn("bucket", b).withColumn("split", expr)


DSIR_BUCKETS = 4096
MICRO = 1_000_000  # log quantization: micro-nats (the corpus.py discipline)


def dsir_weights(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = DSIR_BUCKETS,
    keep_target: bool = False,
) -> DataFrame:
    """Data Selection via Importance Resampling (public method: Xie et
    al. 2023, "Data Selection for Language Models via Importance
    Resampling") — score every document by how target-like it is under
    two hashed bag-of-ngram models, the standard cheap pre-training
    data-selection step: fit categorical distributions over
    ``buckets`` hashed feature slots from the TARGET rows
    (``is_target``) and the RAW rows (the rest), then weight each doc
    by its summed log-likelihood ratio. Sampling ∝ weight then tilts
    raw data toward the target domain.

    Features: unigrams + bigrams of the whitespace tokens, hashed to a
    slot via the engine-portable md5-prefix integer (the
    q_doc_fingerprint idiom). Smoothing: add-one over the slot count.
    Weights are EXACT integers: each slot's two log-probabilities are
    floored to micro-nats independently (the corpus.bigram_lm_scores
    discipline), so the per-doc sum is order-independent and the
    DuckDB oracle matches bit-for-bit.

    Returns (doc_id, n_feats, dsir_logw_micro); zero-feature docs
    surface with n_feats = 0 and weight 0 — the empty log-ratio sum —
    via explode_outer (no trailing doc-sized join).

    Scale shape — ONE featurization pass, nothing corpus-sized twice
    (round-15 optimization; see OPTIMIZATION_r15.md): the explode +
    per-gram md5 is the dominant cost, and composing fit and score
    lazily made it evaluate up to THREE times per action (the model
    inside the lw broadcast subtree, the model again inside the totals
    broadcast, then the score pass). Now the explode aggregates ONCE
    into per-(doc, slot) occurrence counts, persisted for the duration
    of the query (released via release_ranked — bounded above by the
    gram count, usually far smaller): (1) FIT reads the cached counts
    — groupBy(slot) conditional sums → a ``buckets``-row model
    (bounded, broadcastable by construction); (2) SCORE reads them
    again — broadcast-join the model, one doc-keyed aggregation with
    ``cnt``-weighted sums (exact integers, so bit-identical to the
    per-occurrence sum). No content-keyed window, no corpus-sized join
    side; a mass-duplicated page only fattens COUNTS (map-side
    combined), never a single partition. At 100 TB the persisted
    counts frame is the standard materialize-the-featurization trade —
    strictly smaller than the gram stream it replaces, spillable, and
    the alternative (re-featurizing the corpus per pass) costs two
    more full passes."""
    # Tokenize ONCE into a BOUND column before the bigram lambda (the
    # dedup.shingles discipline): higher-order-function lambdas are
    # interpreted with NO common-subexpression elimination, so an
    # element_at(<filter(split(text))>, i) inside the lambda re-ran the
    # whole tokenize per ELEMENT — O(len²) per doc, measured 2.8s of
    # this query's 4.2s featurization pass at sf0.1 (OPTIMIZATION_r15:
    # bound column → 0.8s, bit-identical gram stream).
    arr = F.filter(
        F.split(F.col(text_col), " "), lambda x: x != F.lit("")
    )
    toks_df = docs.select(
        F.col(id_col).alias("doc_id"),
        is_target.alias("_t"),
        arr.alias("toks"),
    )
    toks = F.col("toks")
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.slice(toks, 1, 0))
    rows = toks_df.select(
        "doc_id",
        "_t",
        F.explode_outer(F.concat(toks, bigrams)).alias("gram"),
    ).withColumn(
        "slot",
        F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("long")
        % buckets,
    )
    # count("gram") ignores NULLs, so the explode_outer row of a
    # zero-feature doc survives with cnt = 0 (and a NULL slot that
    # never matches the model join) — n_feats = 0, weight = 0, exactly
    # the empty log-ratio sum the per-occurrence form produced
    counts = (
        rows.groupBy("doc_id", "_t", "slot")
        .agg(F.count("gram").alias("cnt"))
        .persist()
    )
    _PERSISTED_RANKED.append(counts)
    model = (
        counts.where(F.col("slot").isNotNull())
        .groupBy("slot")
        .agg(
            F.sum(F.when(F.col("_t"), F.col("cnt")).otherwise(F.lit(0)))
            .alias("cp"),
            F.sum(F.when(~F.col("_t"), F.col("cnt")).otherwise(F.lit(0)))
            .alias("cq"),
        )
    )
    tot = model.agg(
        F.sum("cp").alias("np"), F.sum("cq").alias("nq")
    )

    def lp_micro(cnt, total):
        return F.floor(
            F.log((cnt + 1).cast("double") / (total + F.lit(buckets)))
            * MICRO
            + 0.5
        ).cast("long")

    lw = (
        model.join(F.broadcast(tot))
        .select(
            "slot",
            (lp_micro(F.col("cp"), F.col("np"))
             - lp_micro(F.col("cq"), F.col("nq"))).alias("lw_micro"),
        )
    )
    aggs = [
        F.sum("cnt").cast("long").alias("n_feats"),
        F.coalesce(F.sum(F.col("cnt") * F.col("lw_micro")), F.lit(0))
        .cast("long")
        .alias("dsir_logw_micro"),
    ]
    if keep_target:
        # rides the same doc_id groupBy for free — lets dsir_select
        # filter to raw rows without a corpus-sized join back
        aggs.append(F.max("_t").alias("_is_target"))
    return (
        counts.join(F.broadcast(lw), ["slot"], "left")
        .groupBy("doc_id")
        .agg(*aggs)
    )


def dsir_select(
    docs: DataFrame,
    is_target: Column,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """The DSIR SELECTION step (Xie et al. 2023 §3): resample the RAW
    corpus with probability ∝ exp(importance weight) — the pipeline
    stage a user actually runs after :func:`dsir_weights` ("give me
    the k most target-like raw documents, stochastically").

    Sampling ∝ exp(logw) without replacement is the Gumbel-top-k
    trick (public: Kool et al. 2019, "Stochastic Beams and Where To
    Find Them"; equivalent to Efraimidis–Spirakis in log space): rank
    by ``logw + Gumbel(u)`` where ``Gumbel(u) = -ln(-ln u)`` and u is
    the deterministic md5-derived uniform of :func:`weighted_topk_
    sample` — so the draw replays identically across engines, retries
    and partitionings. The Gumbel term is micro-quantized (the one
    non-IEEE-exact op chain) and added to the already-integer
    ``dsir_logw_micro``, with the doc id as the total tie-break.

    Returns the k selected raw rows: (doc_id, n_feats,
    dsir_logw_micro, es_key_micro), highest key first by construction.

    Scale shape: dsir_weights' single featurization pass (cached
    counts; fit + score read the cache), then ONE key projection
    + TakeOrderedAndProject (per-partition top-k, never a global
    sort). No join — the weight frame carries the target flag through
    its own doc_id groupBy (``keep_target``), so filtering to raw rows
    is a plain predicate; callers wanting payload columns join the
    k-row result back (broadcast by construction)."""
    w = (
        dsir_weights(docs, is_target, text_col, id_col, buckets,
                     keep_target=True)
        .where(~F.col("_is_target"))
    )
    # u in (0, 1) STRICTLY: conv of 13 hex digits is [0, 2^52-1], so
    # (conv+1) / (2^52+1) never reaches either endpoint — at u = 1.0
    # exactly (prefix fffffffffffff, ~2^-52 per doc, i.e. expected once
    # per ~4.5e15 docs) Gumbel(-ln(-ln u)) is +inf, which floors to
    # Long.MaxValue on Spark and ERRORS the DuckDB oracle's BIGINT cast
    # — a rare determinism/crash divergence at real corpus scale. Both
    # numerator and denominator are exactly representable doubles
    # (< 2^53), so the IEEE quotient is bit-identical across engines.
    u = (
        (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10)
         .cast("double") + 1.0)
        / F.lit(float((1 << 52) + 1))
    )
    gumbel_micro = F.floor(-F.log(-F.log(u)) * MICRO + 0.5).cast("long")
    return (
        w.select(
            "doc_id", "n_feats", "dsir_logw_micro",
            (F.col("dsir_logw_micro") + gumbel_micro).alias("es_key_micro"),
        )
        .orderBy(F.col("es_key_micro").desc(), F.col("doc_id").asc())
        .limit(k)
    )
