"""Engine-portable sketches: deterministic, mergeable approximations
whose VALUES (not just semantics) are reproducible across engines.

Spark's built-in sketch aggregates (approx_count_distinct = HLL++,
percentile_approx = t-digest variants) are the right production tools
— q_sketch_distinct keeps them, rows-only — but their register layouts
and estimates are implementation-specific: a register file written by
one engine cannot be verified or merged by another. This module
implements classic HyperLogLog (Flajolet et al. 2007) from md5 so that
Spark and the DuckDB oracle compute BIT-IDENTICAL register files and
estimates:

- hash: first 15 hex digits of md5(key) as a 60-bit BIGINT (the same
  engine-portable hash discipline as sampling.hash_bucket);
- m = 2^p registers; register j = h mod m, payload w = h div m
  (B = 60 - p bits), rank rho = Q - bitlength(w) with Q = B + 1
  (bin() is minimal-width in both engines; w = 0 -> rho = Q);
- the harmonic sum is kept EXACT: each register contributes the
  integer 2^(Q - M_j) (M_j in [1, Q], so the term is in [1, 2^(Q-1)])
  and empty registers contribute 2^Q — a BIGINT sum, order-free,
  max m * 2^Q = 2^61 < 2^63 for every p;
- the only float ops are one alpha expression, one divide, and the
  small-range linear-counting ln, micro-quantized to 1e-6 (the repo's
  ln discipline — see corpus.py) so a last-ulp libm divergence cannot
  flip the stored value.

Scale shape: one shuffle on (group, register) then one on group —
map-side combinable MAX/SUM aggregates, state = m registers per group
regardless of input size. That mergeability (register files union by
MAX) is what replaces exact COUNT(DISTINCT) at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    p: int = 8,
) -> DataFrame:
    """Per-group register FILE: one (group cols, j, mj) row per
    non-empty register — the unit of cross-engine exchange. Two
    register files over disjoint or overlapping inputs MERGE with
    :func:`hll_merge` (union + MAX per register), which is exactly how
    per-shard / per-day sketches combine at 100 TB without rescanning.

    The file CARRIES its precision as a ``p`` column: registers built
    at one p are meaningless under another p's (m, q) geometry, so the
    precision travels with the data, ``hll_merge`` groups on it (files
    of different p can never silently MAX-merge into one register set),
    and ``hll_estimate_from_registers`` raises at execution time if the
    stored p disagrees with the requested one."""
    if not 4 <= p <= 9:
        raise ValueError("p must be in [4, 9] (register sum stays exact)")
    m = 1 << p
    q = 61 - p  # payload bits + 1: max rank, and the digest scale exponent
    h60 = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    hashed = df.select(*group_cols, h60.alias("_h"))
    w = F.expr(f"_h div {m}")
    rho = F.when(w == 0, F.lit(q)).otherwise(F.lit(q) - F.length(F.bin(w)))
    return (
        hashed.select(*group_cols, (F.col("_h") % m).alias("j"), rho.alias("_rho"))
        .groupBy(*group_cols, "j")
        .agg(F.max("_rho").cast("int").alias("mj"))
        .withColumn("p", F.lit(p).cast("int"))
    )


def hll_merge(*reg_files: DataFrame) -> DataFrame:
    """MAX-merge register files (same group cols + (j, mj) schema):
    the sketch union. Estimating the merged file counts the distinct
    union of all inputs — no rescan of any corpus. The ``p`` column is
    part of the grouping key, so register files built at different
    precisions stay separate groups instead of silently combining
    (estimating such a merge then raises on the foreign p)."""
    for r in reg_files:
        if "p" not in r.columns:
            raise ValueError(
                "register file lacks the 'p' precision column — build it "
                "with hll_registers (files without a precision cannot be "
                "safely merged)"
            )
    out = reg_files[0]
    for r in reg_files[1:]:
        out = out.unionByName(r)
    keys = [c for c in out.columns if c not in ("mj",)]
    merged = out.groupBy(*keys).agg(F.max("mj").cast("int").alias("mj"))
    # same column layout as the input register files
    return merged.select(*reg_files[0].columns)


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: list[str], p: int = 8
) -> DataFrame:
    """Digest + estimate from a register file (see hll_distinct for
    the output contract). Validates the precision contract: p must be
    in the exact-arithmetic range, and if the file carries its ``p``
    column (all files built by :func:`hll_registers` do), any stored
    row whose p differs from the requested one raises at execution
    time — a register file built at one p silently estimated at
    another is the one wrong-answer hazard of portable sketches."""
    if not 4 <= p <= 9:
        raise ValueError("p must be in [4, 9] (register sum stays exact)")
    m = 1 << p
    q = 61 - p
    mj = F.col("mj")
    if "p" in regs.columns:
        mj = F.when(
            F.col("p") != p,
            F.raise_error(
                F.concat(
                    F.lit(f"register file p mismatch: estimating at p={p}, file has p="),
                    F.col("p").cast("string"),
                )
            ).cast("int"),
        ).otherwise(F.col("mj"))
    term = F.pow(F.lit(2.0), F.lit(q) - mj).cast("long")
    sums = regs.groupBy(*group_cols).agg(
        F.count("*").alias("_n_regs"),
        F.sum(term).alias("_present_sum"),
    )
    zeros = (F.lit(m) - F.col("_n_regs")).cast("long")
    reg_sum = (
        F.col("_present_sum") + zeros * F.lit(1 << q).cast("long")
    ).cast("long")
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / m)
    raw = alpha * m * m * F.lit(float(1 << q)) / reg_sum.cast("double")
    lc = m * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((zeros > 0) & (raw <= 2.5 * m), lc).otherwise(raw)
    est_q = (F.floor(est * 1_000_000 + F.lit(0.5)) / 1_000_000).alias(
        "hll_estimate"
    )
    return sums.select(
        *group_cols,
        zeros.alias("n_zero_regs"),
        reg_sum.alias("reg_sum_scaled"),
        est_q,
    )


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    p: int = 8,
) -> DataFrame:
    """Per-group portable-HLL distinct estimate of ``key_col``.

    Output: group cols + n_zero_regs (empty registers),
    reg_sum_scaled (the exact integer harmonic sum, scaled by
    2^(61 - p) — the register digest), hll_estimate (bias-corrected:
    linear counting below the 2.5m small-range threshold, raw harmonic
    estimate above; micro-quantized). Composition of
    :func:`hll_registers` + :func:`hll_estimate_from_registers`."""
    return hll_estimate_from_registers(
        hll_registers(df, group_cols, key_col, p), group_cols, p
    )


def hll_oracle_sql(
    table: str, group_cols: list[str], key_col: str, p: int = 8
) -> str:
    """The DuckDB mirror of :func:`hll_distinct` — same hash, same
    integer register digest, same float expression tree."""
    m = 1 << p
    q = 61 - p
    g = ", ".join(group_cols)
    return f"""
    WITH h AS (
        SELECT {g},
               CAST(('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 15)) AS BIGINT) AS h60
        FROM {table}
    ),
    r AS (
        SELECT {g}, h60 % {m} AS j,
               CASE WHEN h60 // {m} = 0 THEN {q}
                    ELSE {q} - length(bin(h60 // {m})) END AS rho
        FROM h
    ),
    mx AS (SELECT {g}, j, MAX(rho) AS mj FROM r GROUP BY ALL),
    s AS (
        SELECT {g}, COUNT(*) AS n_regs,
               SUM(CAST(pow(2, {q} - mj) AS BIGINT)) AS present_sum
        FROM mx GROUP BY ALL
    ),
    e AS (
        SELECT {g},
               CAST({m} - n_regs AS BIGINT) AS n_zero_regs,
               CAST(present_sum + ({m} - n_regs) * CAST(pow(2, {q}) AS BIGINT) AS BIGINT) AS reg_sum_scaled
        FROM s
    )
    SELECT {g}, n_zero_regs, reg_sum_scaled,
           floor(
             CASE WHEN n_zero_regs > 0
                   AND (0.7213 / (1.0 + 1.079 / {m})) * {m} * {m} * CAST(pow(2, {q}) AS DOUBLE)
                       / CAST(reg_sum_scaled AS DOUBLE) <= 2.5 * {m}
                  THEN {m} * ln(CAST({m} AS DOUBLE) / CAST(n_zero_regs AS DOUBLE))
                  ELSE (0.7213 / (1.0 + 1.079 / {m})) * {m} * {m} * CAST(pow(2, {q}) AS DOUBLE)
                       / CAST(reg_sum_scaled AS DOUBLE)
             END * 1000000 + 0.5) / 1000000 AS hll_estimate
    FROM e
    """


def _bloom_h(key_col: str):
    """Two independent 60-bit hashes from one md5 (hex slices 1-15 and
    16-30) — the Kirsch-Mitzenmacher double-hash base: position_i =
    (h1 + i*h2) mod m simulates k independent hash functions with
    provably preserved false-positive behavior."""
    md5 = F.md5(F.col(key_col).cast("string"))
    h1 = F.conv(F.substring(md5, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(md5, 16, 15), 16, 10).cast("long")
    return h1, h2


def bloom_positions(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 3
) -> DataFrame:
    """Portable Bloom filter of a key set, materialized as its DISTINCT
    set bit positions (one bigint per set bit) — the exchange/merge
    unit: filters over two key sets union by DISTINCT-union of their
    position tables, and any engine that can compute md5 can build or
    probe the same filter (the DuckDB oracle does). Size is at most
    min(|keys|*k, m_bits) rows ≤ m_bits — broadcastable by
    construction."""
    h1, h2 = _bloom_h(key_col)
    poss = F.array(*[(h1 + F.lit(i) * h2) % m_bits for i in range(k)])
    return (
        keys.select(F.explode(poss).alias("pos"))
        .distinct()
    )


def bloom_might_contain(
    df: DataFrame,
    key_col: str,
    positions: DataFrame,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Keep the rows of ``df`` whose key MIGHT be in the Bloom filter:
    k broadcast LEFT SEMI joins, one per probe position — the big side
    never shuffles and never materializes its own hash table. This is
    the shuffle-avoidance pre-filter for a selective join at 100 TB:
    drop the (1 - fp-rate) of the fact table that provably cannot
    match BEFORE the real join pays any network. No false negatives;
    false-positive rate ~ (1 - e^(-kn/m))^k."""
    h1, h2 = _bloom_h(key_col)
    out = df
    for i in range(k):
        probe = ((h1 + F.lit(i) * h2) % m_bits).alias("_probe")
        out = (
            out.withColumn("_probe", probe)
            .join(F.broadcast(positions), F.col("_probe") == F.col("pos"), "left_semi")
            .drop("_probe")
        )
    return out


def bloom_oracle_sql(
    big_table: str,
    key_col: str,
    keys_sql: str,
    select_cols: str,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> str:
    """DuckDB mirror of bloom_positions + bloom_might_contain:
    ``keys_sql`` is a SELECT producing the filter's key column named
    ``key``; rows of ``big_table`` survive when every probe position
    exists in the position set."""
    def h(expr: str, i: int) -> str:
        return (
            f"(CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15)) AS BIGINT)"
            f" + {i} * CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 16, 15)) AS BIGINT))"
            f" % {m_bits}"
        )

    pos_union = "\n        UNION ".join(
        f"SELECT {h('key', i)} AS pos FROM keyset" for i in range(k)
    )
    probes = " AND ".join(
        f"EXISTS (SELECT 1 FROM pos WHERE pos = {h(f'b.{key_col}', i)})"
        for i in range(k)
    )
    return f"""
    WITH keyset AS ({keys_sql}),
    pos AS ({pos_union})
    SELECT {select_cols} FROM {big_table} b WHERE {probes}
    """


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1 << 10
) -> DataFrame:
    """Portable Count-Min sketch of a key stream: a (row, col, cnt)
    cell table — depth rows of width counters, cell (i, (h1 + i*h2)
    mod width) incremented per input row (same md5 double-hash family
    as the Bloom filter). Cells are exact BIGINT counts, so two
    sketches MERGE by cell-wise SUM (`cms_merge`) and any md5-capable
    engine builds the bit-identical table. At most depth*width cells
    regardless of input size — broadcastable by construction.

    Completes the portable sketch trio: HLL (how many distinct), Bloom
    (is it present), CMS (how often) — the three answers a 100 TB
    frequency/dedup pipeline needs without exact per-key state."""
    h1, h2 = _bloom_h(key_col)
    cells = F.array(*[
        F.struct(
            F.lit(i).alias("row"),
            ((h1 + F.lit(i) * h2) % width).alias("col"),
        )
        for i in range(depth)
    ])
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise SUM of CMS cell tables (same depth/width): the sketch
    of the concatenated streams, no rescan."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1 << 10,
) -> DataFrame:
    """Point-frequency estimates for a key set: each key probes its
    depth cells and takes the MIN counter — never an undercount,
    overcount bounded by collisions (~2n/width with prob 1-2^-depth).
    The probe is an explode of the (small) key set joined against the
    broadcast cell table: the sketch side is bounded by depth*width,
    the stream that built it is long gone."""
    h1, h2 = _bloom_h(key_col)
    probes = F.array(*[
        F.struct(
            F.lit(i).alias("row"),
            ((h1 + F.lit(i) * h2) % width).alias("col"),
        )
        for i in range(depth)
    ])
    exploded = keys.select(F.col(key_col), F.explode(probes).alias("c")).select(
        key_col, F.col("c.row").alias("row"), F.col("c.col").alias("col")
    )
    return (
        exploded.join(F.broadcast(cms), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count"))
    )


def cms_oracle_sql(
    stream_sql: str,
    keys_sql: str,
    key_out: str,
    depth: int = 4,
    width: int = 1 << 10,
) -> str:
    """DuckDB mirror of cms_build + cms_estimate. ``stream_sql``
    yields the counted stream with column ``key``; ``keys_sql`` the
    probe keys with column ``key``; output (``key_out``, cms_count)."""
    def h(i: int) -> str:
        return (
            f"(CAST(('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 15)) AS BIGINT)"
            f" + {i} * CAST(('0x' || substr(md5(CAST(key AS VARCHAR)), 16, 15)) AS BIGINT))"
            f" % {width}"
        )

    cell_union = "\n        UNION ALL ".join(
        f"SELECT {i} AS row, {h(i)} AS col FROM stream" for i in range(depth)
    )
    probe_union = "\n        UNION ALL ".join(
        f"SELECT key, {i} AS row, {h(i)} AS col FROM keyset" for i in range(depth)
    )
    return f"""
    WITH stream AS ({stream_sql}),
    keyset AS ({keys_sql}),
    cells AS (SELECT row, col, COUNT(*) AS cnt
              FROM ({cell_union}) GROUP BY 1, 2),
    probes AS ({probe_union})
    SELECT p.key AS {key_out},
           MIN(COALESCE(c.cnt, 0)) AS cms_count
    FROM probes p LEFT JOIN cells c USING (row, col)
    GROUP BY 1
    """


def value_histogram(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bins: int = 16,
) -> DataFrame:
    """Per-group equi-width histogram: two passes, both
    map-side-combinable aggregations — (1) per-group min/max broadcast
    back, (2) exact BIGINT counts per bin. bin = floor((v - mn) * bins
    / (mx - mn)) clamped to bins-1 (the max lands in the last bin);
    degenerate groups (mx == mn) collapse to bin 0. Histograms over
    shards with SHARED bounds merge by bin-wise count sum — the
    mergeable basis for approximate quantiles / optimizer stats when
    the exact per-group sort is off the table at 100 TB. All float ops
    are one shared expression tree, so the DuckDB oracle matches
    bin-for-bin."""
    stats = df.groupBy(group_col).agg(
        F.min(value_col).alias("_mn"), F.max(value_col).alias("_mx")
    )
    joined = df.join(F.broadcast(stats), [group_col])
    span = F.col("_mx") - F.col("_mn")
    bin_col = F.when(span == 0, F.lit(0)).otherwise(
        F.least(
            F.lit(bins - 1),
            F.floor((F.col(value_col) - F.col("_mn")) * bins / span),
        )
    ).cast("int")
    return (
        joined.select(group_col, bin_col.alias("bin"), "_mn", "_mx")
        .groupBy(group_col, "bin")
        .agg(
            F.count("*").alias("cnt"),
            F.first("_mn").alias("lo"),
            F.first("_mx").alias("hi"),
        )
    )


def value_histogram_oracle_sql(
    table: str, group_col: str, value_col: str, bins: int = 16
) -> str:
    """DuckDB mirror of :func:`value_histogram`."""
    return f"""
    WITH stats AS (
        SELECT {group_col}, MIN({value_col}) AS mn, MAX({value_col}) AS mx
        FROM {table} GROUP BY 1
    ),
    binned AS (
        SELECT t.{group_col},
               CASE WHEN s.mx = s.mn THEN 0
                    ELSE CAST(LEAST({bins - 1},
                         FLOOR((t.{value_col} - s.mn) * {bins} / (s.mx - s.mn)))
                         AS INTEGER) END AS bin,
               s.mn, s.mx
        FROM {table} t JOIN stats s USING ({group_col})
    )
    SELECT {group_col}, bin, COUNT(*) AS cnt,
           MIN(mn) AS lo, MIN(mx) AS hi
    FROM binned GROUP BY 1, 2
    """
