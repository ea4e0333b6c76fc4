"""MLlib classification — the north-star modeling step on top of the
ETL engine (BASELINE.json: "DataFrame ops + MLlib classification").

The reference stops at rule-based fraud flags (trsh_rep_fraud_sync.sql
rules 1-4); this module adds the learned counterpart: a logistic-
regression classifier over an embedding/feature column, plus a
feature-assembly helper for the fraud-report domain.

Everything stays in DataFrame land: ``array_to_vector`` converts the
parquet ``array<float>`` column JVM-side (no Python round-trip),
training is MLlib's distributed LBFGS, scoring is a model.transform.

Scale notes (100 TB): LogisticRegression with LBFGS does one tree-
aggregated gradient pass per iteration over the cached training frame —
linear in rows, no shuffle beyond the aggregation tree. Scoring is a
map-only transform, embarrassingly parallel. For wide sparse features
switch the assembler output to sparse vectors; the estimator handles
both.
"""

from __future__ import annotations

from pyspark.ml.classification import LogisticRegression
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, functions as F


def embedding_features(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """array<float> parquet column -> MLlib Vector column ``features``
    (JVM-side conversion, stays out of Python)."""
    return emb.withColumn(
        "features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )


def train_fraud_classifier(
    emb: DataFrame,
    label_col: str = "label",
    seed: int = 42,
    max_iter: int = 25,
    reg_param: float = 0.01,
):
    """Fit logistic regression on (features, label). Deterministic for a
    fixed input frame: LBFGS from a zero start with a fixed instance
    order gives a reproducible optimum."""
    train = embedding_features(emb).select(
        "features", F.col(label_col).cast("double").alias("label")
    )
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=True
    )
    return lr.fit(train)


def score(model, emb: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Map-only scoring: (id, label, prediction)."""
    scored = model.transform(embedding_features(emb))
    return scored.select(
        F.col(id_col),
        F.col("label").cast("int").alias("label"),
        F.col("prediction").cast("int").alias("prediction"),
    )


def confusion_matrix(scored: DataFrame) -> DataFrame:
    """(label, prediction, n) counts — the stable, order-insensitive
    summary of a classifier run."""
    return (
        scored.groupBy("label", "prediction")
        .agg(F.count("*").alias("n"))
        .orderBy("label", "prediction")
    )
