"""The deliberate Python-surface demos: one vectorized grouped-agg
pandas UDAF and one Python UDTF.

Everything these compute is expressible with built-in functions (and
the engine's real operators do exactly that — see operators/similarity,
operators/ngrams); these two exist to pin the *surface*: Arrow-batched
grouped aggregation and lateral table-function expansion are the two
escape hatches a user of the engine reaches for when semantics genuinely
leave SQL, so their registration, batch shape, and exactness contract
are locked in here and in tests.

Exactness contract (same discipline as the rest of the repo):
- all float reductions are LEFT FOLDS (numpy's pairwise ``sum()`` is
  banned — it changes the addition order and therefore the bits vs the
  DuckDB oracle's ``list_reduce``);
- every emitted aggregate is quantized to integer micro-units before
  summation, so the cross-row sum is exact and order-independent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import LongType

MICRO = 1_000_000
CHUNK = 6


# LongType() instance, not the DDL string "long": string return types are
# parsed through the active SparkContext, which does not exist yet at
# module import.
@pandas_udf(LongType())
def sum_norm_micro(emb: pd.Series) -> int:
    """Grouped-agg pandas UDAF: Σ over the group of the vector L2 norm
    quantized to micro-units. Arrow hands the group's embedding column
    as a Series of float32 arrays; the squared-sum accumulates as a
    left fold over dimensions (vectorized across rows) to match the
    oracle's ``list_reduce`` addition order bit-for-bit."""
    arr = np.stack(emb.to_numpy()).astype(np.float64)
    acc = arr[:, 0] * arr[:, 0]
    for j in range(1, arr.shape[1]):
        acc = acc + arr[:, j] * arr[:, j]
    norms = np.sqrt(acc)
    return int(np.floor(norms * MICRO + 0.5).astype(np.int64).sum())


# A grouped-agg pandas UDF cannot share an agg() with JVM aggregates
# (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a pandas UDAF too.
@pandas_udf(LongType())
def count_rows(emb: pd.Series) -> int:
    return len(emb)


def label_norm_stats(embs: DataFrame) -> DataFrame:
    """Per-label count / mean L2 norm via the UDAF. One shuffle on the
    label; Arrow moves each group's vectors in columnar batches."""
    return (
        embs.groupBy("label")
        .agg(
            count_rows(F.col("embedding")).alias("n_vecs"),
            sum_norm_micro(F.col("embedding")).alias("sum_norm_micro"),
        )
        .select(
            "label",
            "n_vecs",
            "sum_norm_micro",
            (
                F.col("sum_norm_micro").cast("double") / MICRO / F.col("n_vecs")
            ).alias("avg_norm"),
        )
    )


@udtf(returnType="pos int, chunk string")
class ChunkSplitter:
    """Python UDTF: explode a document into fixed 6-token chunks (one
    output row per chunk, ≥1 even for empty text). Runs per-row in the
    executor's Python worker; used via LATERAL so upstream columns
    (doc_id) stay available without threading them through the UDTF."""

    def eval(self, text: str):
        toks = (text or "").split(" ")
        for p in range(0, max(len(toks), 1), CHUNK):
            yield (p // CHUNK, " ".join(toks[p : p + CHUNK]))


def chunk_with_udtf(spark, docs: DataFrame) -> DataFrame:
    """Register the UDTF and laterally expand ``docs`` through it."""
    spark.udtf.register("chunk6", ChunkSplitter)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.chunk "
        "FROM _udtf_docs d, LATERAL chunk6(d.text) t"
    )
