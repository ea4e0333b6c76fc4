"""Z-order data layout: multi-column locality for scan pruning.

At 100 TB the cheapest query is the one that never reads the file: a
parquet scan prunes row groups (and, with file-level stats, whole
files) by min/max metadata, but metadata only helps if rows that are
close in FILTER space are close in FILE space. Sorting by one column
buys locality for that column only; Z-ORDERING interleaves the bits
of several columns so a multi-dimensional box predicate touches a
handful of files instead of all of them — the standard layout lever
(public: Morton 1966; Delta Lake / Iceberg OPTIMIZE ZORDER expose the
same idea).

Everything here is pure column expressions + one range repartition:

- each column first maps onto a LONG axis value: integral columns
  cast, dates become days since epoch, timestamps micros since epoch,
  and low-cardinality strings their dictionary rank (distinct values
  ranked once, broadcast back);
- each axis is min/max-normalized onto a ``bits``-wide integer grid
  in EXACT integer math — decimal(38,0) multiply then integral ``div``
  (rel*2^bits never exceeds ~2^80, far inside decimal range, and rel
  >= 0 makes truncating div identical to floor) — so a value can
  never round across a cell boundary the way double division could
  for wide column ranges (bounds come from one tiny aggregate,
  broadcast back — no window, no second shuffle);
- grid cells interleave bit-by-bit into the Morton key (a fold over
  the bit positions, whole-stage codegen — no UDF);
- ``zorder_write`` range-partitions on the key and sorts within
  partitions before writing, so every output file covers a tight
  hyper-rectangle of the original columns and its parquet min/max
  stats actually exclude it from mismatched box queries.

The key itself is engine-portable integer math — the DuckDB oracle
recomputes it bit-for-bit (q_zorder_key, q_zorder_key_mixed).

Warehouse integration: ``Warehouse.overwrite(..., zorder_by=[...])``
lays the table out z-ordered (within partitions when the table is
partitioned), so a hypertable can combine partition pruning on its
date column with file-level multi-column stats inside each day.

Reference parity: extension (the reference has no storage layout
control); SURVEY.md §2 LLM-ops / warehouse family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

GRID_BITS = 16


def _axis_value(df: DataFrame, c: str) -> tuple[DataFrame, str]:
    """(df', axis_col): map column ``c`` onto a long axis column.
    Integral -> cast; date -> days since epoch; timestamp (incl. NTZ;
    session TZ is pinned UTC) -> micros since epoch; string ->
    dictionary rank over the DISTINCT values (low-cardinality
    precondition: the rank window runs over distinct values only, one
    row per value, broadcast back — never over the data)."""
    out = f"_zv_{c}"
    dt = df.schema[c].dataType
    if isinstance(dt, T.StringType):
        ranks = (
            df.select(c).where(F.col(c).isNotNull()).distinct()
            .select(
                F.col(c),
                (F.row_number().over(Window.orderBy(c)) - 1)
                .cast("long").alias(out),
            )
        )
        return df.join(F.broadcast(ranks), c, "left"), out
    if isinstance(dt, T.DateType):
        expr = F.datediff(F.col(c), F.lit("1970-01-01")).cast("long")
    elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        expr = F.unix_micros(F.col(c).cast("timestamp"))
    else:
        expr = F.col(c).cast("long")
    return df.withColumn(out, expr), out


def _cell_sql(axis: str, lo: str, hi: str, bits: int) -> str:
    """Exact-integer grid cell: (v - lo) * 2^bits div (hi - lo + 1),
    computed in decimal(38,0) so the multiply can't overflow long for
    any axis range, then integral div (v >= lo, so truncation is
    floor). Constant columns (hi == lo) land in cell 0."""
    d = "CAST({} AS DECIMAL(38,0))"
    return (
        f"CAST((({d.format(axis)} - {d.format(lo)}) * {1 << bits}) div "
        f"({d.format(hi)} - {d.format(lo)} + 1) AS BIGINT)"
    )


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = GRID_BITS,
    out_col: str = "z_key",
) -> DataFrame:
    """Append the Morton key over ``cols`` (integral, date, timestamp,
    or low-cardinality string columns). One pass: a single global
    min/max aggregate (one row) broadcast back, then pure codegen bit
    interleaving — no shuffle over the data (string columns add one
    broadcast dictionary-rank join over their distinct values)."""
    if not cols or len(cols) * bits > 63:
        raise ValueError(
            f"need 1..{63 // bits} columns at {bits} grid bits, got {cols}"
        )
    prepped = df
    axes: dict[str, str] = {}
    for c in cols:
        prepped, axes[c] = _axis_value(prepped, c)
    bounds = prepped.agg(
        *[F.min(axes[c]).alias(f"_lo_{c}") for c in cols],
        *[F.max(axes[c]).alias(f"_hi_{c}") for c in cols],
    )
    with_bounds = prepped.join(F.broadcast(bounds))
    cells = {
        c: F.expr(_cell_sql(axes[c], f"_lo_{c}", f"_hi_{c}", bits))
        for c in cols
    }
    n = len(cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for j, c in enumerate(cols):
            z = z + (
                F.shiftright(cells[c], b).bitwiseAND(F.lit(1))
                * F.lit(1 << (b * n + j))
            ).cast("long")
    return with_bounds.select(*df.columns, z.alias(out_col))


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_files: int = 16,
    bits: int = GRID_BITS,
    within: list[str] | None = None,
) -> DataFrame:
    """``df`` re-clustered for a z-ordered write: range partition on
    (``within`` columns, Morton key) and sort within partitions the
    same way, key dropped. ``within`` prefixes the clustering with the
    table's partition columns so a partitioned (hypertable) write gets
    contiguous partition directories AND z-locality inside each — the
    Delta/Iceberg OPTIMIZE ZORDER per-partition discipline."""
    keyed = with_zorder_key(df, cols, bits)
    keys = [*(within or []), "z_key"]
    return (
        keyed.repartitionByRange(n_files, *keys)
        .sortWithinPartitions(*keys)
        .drop("z_key")
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = GRID_BITS,
) -> None:
    """Write ``df`` as ``n_files`` z-ordered parquet files: range
    partition on the Morton key (contiguous z ranges per file) and
    sort within each partition, so every file's min/max stats for the
    z-ordered columns cover a tight box. The key is layout-only and
    not persisted."""
    zorder_layout(df, cols, n_files, bits).write.mode("overwrite").parquet(path)
