"""Corpus-level statistics for training-data curation: TF-IDF salient
terms and n-gram language-model fluency scoring.

Both are two-pass corpus operators: a model pass aggregates the whole
corpus (term document frequencies / bigram counts), then a scoring pass
joins the model back onto per-document rows. The model side is vocab-
bounded — a few MB even for a 100 TB natural-language corpus — so the
scoring join broadcasts and the big side never shuffles for it.

Exactness (the DuckDB-oracle contract):
- ``ln()`` is NOT bit-identical between the JVM and C libm (measured:
  ~2% of inputs differ in the last ulp), so no raw ``ln`` output is ever
  emitted or summed. TF-IDF uses a *linear* idf (N/df) — division and
  multiplication are IEEE-correctly-rounded, hence bit-identical.
  LM log-probabilities are quantized to integer micro-nats
  (``floor(ln(p)*1e6 + 0.5)``) before the per-document sum, making the
  sum exact-integer and order-independent; a last-ulp ln() divergence
  would need to land within ~1e-9 of a rounding boundary to flip a
  quantized value (verified clean on the test corpus).
- Per-document aggregation keys are doc-prefixed, so shuffle skew is
  bounded by the longest document, not corpus-wide term popularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .ngrams import ngram_rows, tokens

MICRO = 1_000_000  # log-prob quantization: micro-nats


def tf_idf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` salient terms per document by TF-IDF with linear idf.

    ``tfidf = tf * N / df`` where ``tf`` = occurrences of the term in
    the document, ``df`` = number of documents containing the term, and
    ``N`` = corpus document count. Linear idf is monotone in 1/df like
    the classic log idf, ranks identically for fixed tf, and keeps the
    score a pure IEEE div/mul chain the oracle reproduces bit-for-bit.

    Plan shape: one shuffle on (doc, term) for tf (doc-prefixed key, no
    popularity skew), one on term for df (count-only, map-side combine),
    then df broadcasts back onto tf (vocab-bounded), the corpus count
    joins as a 1-row broadcast (no driver collect), and the top-k window
    repartitions on the doc id. Ties break on the term string so the
    result is deterministic."""
    term = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term")
    )
    tf = term.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .withColumnRenamed("term", "df_term")
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), tf["term"] == df["df_term"])
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (F.col("tf").cast("double") * F.col("n_docs") / F.col("df")).alias(
                "tfidf"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 relevance of every matching document against a fixed query
    term set — the classic retrieval scorer (tf saturation + document
    length normalization).

    ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b + b·dl/avgdl))``
    with the standard ``idf = ln((N - df + ½)/(df + ½) + 1)``. Per-term
    scores are quantized to integer micro-units BEFORE the per-document
    sum (same discipline as the LM scores: the only non-IEEE-exact op
    is ln, and a last-ulp divergence must land within ~1e-9 of a
    rounding boundary to flip a quantized value).

    Plan shape: document length rides through the term explode (no
    docs⋈lengths join); tf is one shuffle on the doc-prefixed
    (doc, term) key restricted to the query terms — the corpus never
    shuffles unfiltered; df and avgdl are query-bounded/1-row
    broadcasts. Output: one row per document containing ≥1 query term."""
    toks = tokens(text_col)
    inst = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("dl"),
        F.explode(toks).alias("term"),
    ).where(F.col("term").isin(*query_terms))
    tf = inst.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df")).withColumnRenamed(
        "term", "df_term"
    )
    stats = docs.agg(
        F.count("*").alias("n_docs"),
        (
            F.sum(F.size(tokens(text_col))).cast("double") / F.count("*")
        ).alias("avgdl"),
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + k1 * (
        (1.0 - b) + b * F.col("dl").cast("double") / F.col("avgdl")
    )
    per_term_micro = F.floor(
        idf * (F.col("tf") * (k1 + 1.0)) / denom * MICRO + 0.5
    ).cast("long")
    return (
        tf.join(F.broadcast(df), F.col("term") == F.col("df_term"))
        .join(F.broadcast(stats))
        .select("doc_id", per_term_micro.alias("s_micro"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_matched_terms"),
            F.sum("s_micro").alias("score_micro"),
        )
        .select(
            "doc_id",
            "n_matched_terms",
            "score_micro",
            (F.col("score_micro").cast("double") / MICRO).alias("bm25"),
        )
    )


def chi2_discriminative_terms(
    docs: DataFrame,
    labels: DataFrame,
    k: int = 5,
    min_df: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """χ² feature selection: the top-``k`` terms most associated with
    each label (the classic supervised vocabulary pruning step before
    training a text classifier).

    For each observed (term, label) pair the 2×2 contingency table is
    derived from three aggregates — ``n11`` (docs with term & label),
    per-term document frequency, per-label doc counts — and
    ``χ² = N·(n11·n00 − n10·n01)² / ((n11+n10)(n01+n00)(n11+n01)(n10+n00))``.
    Only positively-observed pairs are scored (a term never seen with a
    label is not a candidate for that label's top-k). Terms with
    df < min_df or df > N − min_df are excluded (the χ² denominator
    degenerates at the extremes).

    Exactness: every count is exact BIGINT; the products stay < 2⁵³ at
    any realistic vocab scale, and the final float expression tree is
    identical in both engines (mul/div only, no ln/pow), so χ² is
    bit-identical. One (doc, term) distinct shuffle + one (term, label)
    aggregate; df derives from n11 (each (doc, term) has exactly one
    label), label totals and N broadcast, top-k is a label-partitioned
    window with a term tie-break."""
    pres = (
        docs.select(
            F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term")
        )
        .distinct()
        .join(labels.select(F.col(id_col).alias("doc_id"), "label"), "doc_id")
    )
    n11 = pres.groupBy("term", "label").agg(F.count("*").alias("n11"))
    df_t = n11.groupBy("term").agg(F.sum("n11").alias("df"))
    lab = labels.groupBy("label").agg(F.count("*").alias("n_label"))
    n = labels.agg(F.count("*").alias("n_docs"))
    diff = (
        F.col("n11") * (F.col("n_docs") - F.col("df") - F.col("n_label") + F.col("n11"))
        - (F.col("df") - F.col("n11")) * (F.col("n_label") - F.col("n11"))
    ).cast("double")
    denom = (
        F.col("df")
        * (F.col("n_docs") - F.col("df"))
        * F.col("n_label")
        * (F.col("n_docs") - F.col("n_label"))
    ).cast("double")
    scored = (
        n11.join(F.broadcast(df_t), "term")
        .join(F.broadcast(lab), "label")
        .join(F.broadcast(n))
        .where((F.col("df") >= min_df) & (F.col("df") <= F.col("n_docs") - min_df))
        .select(
            "label",
            "term",
            "n11",
            "df",
            (F.col("n_docs").cast("double") * diff * diff / denom).alias("chi2"),
        )
    )
    # two-level top-k: the candidate set per label is the (min_df-
    # filtered) VOCABULARY — content-derived and corpus-sized at scale,
    # exactly the single-reducer window class the similarity paths shed
    # in round 12
    from .similarity import topk_per_query

    return topk_per_query(
        scored, k, [F.desc("chi2"), F.asc("term")],
        part_col="label", rank_name="_rn",
    ).drop("_rn")


def bigram_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document fluency score from a corpus-trained add-one-smoothed
    bigram language model — the classic perplexity-style quality filter
    (documents whose word transitions are improbable under the corpus
    distribution are noise).

    Model: ``P(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)`` with ``V`` =
    unigram vocabulary size. Score: mean log-probability over the
    document's bigram instances, carried as exact integer micro-nats
    (see module docstring) so the sum is order-independent.

    Plan shape: bigram instances shuffle once on the gram string to
    build the model (map-side combine); prefix totals reduce the model
    again on w1. The model broadcasts back for scoring (holds to ~1e8
    distinct bigrams; past that drop the hint and AQE picks a
    gram-keyed shuffle join), so the corpus-side scoring pass is
    map-only + ONE doc-keyed aggregation — ``explode_outer`` keeps
    sub-bigram documents in the stream as a NULL gram, so no trailing
    docs⋈scores join is needed (that join would sort-merge two
    doc-count-sized frames). Documents with < 2 tokens surface with
    ``n_bigrams = 0`` and NULL score."""
    g = ngram_rows(docs, text_col, 2, id_col=id_col, outer=True)
    if id_col != "doc_id":
        g = g.withColumnRenamed(id_col, "doc_id")
    c12 = (
        g.where(F.col("gram").isNotNull())
        .groupBy("gram")
        .agg(F.count("*").alias("c12"))
    )
    c1 = (
        c12.groupBy(F.split(F.col("gram"), " ")[0].alias("w1"))
        .agg(F.sum("c12").alias("c1"))
    )
    vocab = docs.select(F.explode(tokens(text_col)).alias("tok")).agg(
        F.countDistinct("tok").alias("v")
    )
    model = (
        c12.join(F.broadcast(c1), F.split(F.col("gram"), " ")[0] == F.col("w1"))
        .join(F.broadcast(vocab))
        .select(
            "gram",
            F.floor(
                F.log(
                    (F.col("c12") + 1).cast("double") / (F.col("c1") + F.col("v"))
                )
                * MICRO
                + 0.5
            )
            .cast("long")
            .alias("lp_micro"),
        )
    )
    return (
        g.join(F.broadcast(model), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("gram").alias("n_bigrams"),
            F.sum("lp_micro").alias("sum_lp_micro"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "sum_lp_micro",
            (
                F.col("sum_lp_micro").cast("double") / MICRO / F.col("n_bigrams")
            ).alias("avg_logprob"),
        )
    )


def vocab_coverage(
    docs: DataFrame, k: int = 100, text_col: str = "text"
) -> DataFrame:
    """Vocabulary coverage curve — the tokenizer-design question "how
    much of the corpus do the top-k word types cover?" (the BPE vocab-
    size / OOV-rate trade-off is read straight off this curve). Emits
    one row per top-k token: (token, cnt, rank, cum_cnt, coverage_ppm)
    where coverage_ppm = floor(cum_cnt · 10⁶ / total) — integer
    division on exact BIGINT counts, so the oracle matches bit-for-bit
    (exact up to 9.2·10¹² total tokens before the ·10⁶ product would
    overflow a long; past that, consume cum_cnt/total directly).

    Scale shape: one explode + groupBy(token) with map-side partial
    counts (a hot word — "the" IS half the corpus — collapses per map
    task), top-k via orderBy+limit (TakeOrderedAndProject, never a
    global sort), total via one broadcast scalar, and the running sum's
    window runs over the k-row frame — the bounded-collect class, never
    corpus rows."""
    counts = (
        docs.select(F.explode(tokens(text_col)).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").cast("long").alias("_total"))
    topk = counts.orderBy(F.col("cnt").desc(), F.col("token")).limit(k)
    w = (
        Window.orderBy(F.col("cnt").desc(), F.col("token"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = topk.join(F.broadcast(total)).select(
        "token",
        F.col("cnt").cast("long").alias("cnt"),
        F.row_number().over(
            Window.orderBy(F.col("cnt").desc(), F.col("token"))
        ).alias("rank"),
        F.sum("cnt").over(w).cast("long").alias("cum_cnt"),
        "_total",
    )
    return cum.select(
        "token", "cnt", "rank", "cum_cnt",
        F.expr("cum_cnt * 1000000 div _total").alias("coverage_ppm"),
    )
