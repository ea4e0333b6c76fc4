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

- each column is min/max-normalized onto a ``bits``-wide integer grid
  (bounds come from one tiny aggregate, broadcast back — no window,
  no second shuffle);
- grid cells interleave bit-by-bit into the Morton key (a fold over
  the bit positions, whole-stage codegen — no UDF);
- ``zorder_write`` range-partitions on the key and sorts within
  partitions before writing, so every output file covers a tight
  hyper-rectangle of the original columns and its parquet min/max
  stats actually exclude it from mismatched box queries.

The key itself is engine-portable integer math — the DuckDB oracle
recomputes it bit-for-bit (q_zorder_key).

Reference parity: extension (the reference has no storage layout
control); SURVEY.md §2 LLM-ops / warehouse family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

GRID_BITS = 16


def _normalized(col, lo, hi, bits: int):
    """Value -> [0, 2^bits) grid cell: floor((v - lo) / (hi - lo + 1)
    * 2^bits) in exact integer math (works for any integral column;
    constant columns land in cell 0)."""
    span = (hi - lo + F.lit(1)).cast("long")
    rel = (col.cast("long") - lo.cast("long"))
    return F.floor(rel * F.lit(1 << bits) / span).cast("long")


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = GRID_BITS,
    out_col: str = "z_key",
) -> DataFrame:
    """Append the Morton key over ``cols`` (integral columns). One
    pass: a single global min/max aggregate (one row) broadcast back,
    then pure codegen bit interleaving — no window, no shuffle."""
    if not cols or len(cols) * bits > 63:
        raise ValueError(
            f"need 1..{63 // bits} columns at {bits} grid bits, got {cols}"
        )
    bounds = df.agg(
        *[F.min(c).cast("long").alias(f"_lo_{c}") for c in cols],
        *[F.max(c).cast("long").alias(f"_hi_{c}") for c in cols],
    )
    with_bounds = df.join(F.broadcast(bounds))
    cells = {
        c: _normalized(
            F.col(c), F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), bits
        )
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
    keyed = with_zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "z_key")
        .sortWithinPartitions("z_key")
        .drop("z_key")
        .write.mode("overwrite")
        .parquet(path)
    )
