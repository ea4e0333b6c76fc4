"""Persisted inverted index with BM25 scoring — the lexical member of
the stored-index family (text near-dup: dedup_index; vectors:
ann_index; this: keyword retrieval).

A corpus-scale retrieval system cannot re-tokenize 100 TB per query;
it tokenizes ONCE per ingest batch into term postings and answers
queries by reading only the probed terms' postings. Four warehouse
tables under one atomic multi-table commit (pipeline.Warehouse — the
same versioning/rollback/time-travel contract as the other indexes):

- ``index/postings`` (bucket, term, doc_id, tf, dl), PARTITIONED BY
  the term's hash bucket: a query for k terms statically prunes to at
  most k of ``n_buckets`` partitions — the scan cost is postings of
  the probed terms, not the corpus. dl (doc length) is denormalized
  onto each posting so scoring needs no doc-table join.
- ``index/term_stats`` (term, df) — vocab-bounded (a few MB at any
  corpus size; natural-language vocabulary grows ~log with corpus).
- ``index/corpus_stats`` (n_docs, sum_dl) — 1 row. sum_dl (not avgdl)
  so incremental merges stay exact-integer.
- ``index/doc_lens`` (doc_id, dl) — the admission ledger: replayed
  doc ids are anti-joined out, making ingest exactly-once per doc.

Exactness: tf/df/dl/n_docs/sum_dl are all integers, so an index built
incrementally is BYTE-IDENTICAL to one built in a single pass, and
query() reproduces operators/corpus.bm25_scores (same ln-then-quantize
micro-unit discipline) bit-for-bit — pinned by tests/test_text_index.py.

Scale shape (100 TB): build/ingest is one (doc,term) shuffle (doc-
prefixed key — skew bounded by the longest doc, not term popularity)
plus a vocab-bounded df aggregate; query reads pruned partitions,
broadcasts the k-term stats and the 1-row corpus stats, and shuffles
only matching postings for the per-doc sum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from . import text as _text

MICRO = 1_000_000
N_BUCKETS = 32

LAYER = "index"


def tokens(text_col: str = "text") -> Column:
    """THE analyzer: NFC normalization (text.nfc, the engine-wide
    contract) then whitespace split — used identically by build/ingest
    (document side) and query_terms (query side), so an analyzer drift
    between the two is structurally impossible and a non-ASCII query
    in any Unicode encoding matches documents indexed from any other
    (previously this was ngrams.tokens, i.e. raw-byte split)."""
    return F.split(_text.nfc(F.col(text_col)), " ")


def _bucket(term_col: Column) -> Column:
    # pruning-only hash: never surfaces in results, so it needs no
    # cross-engine portability (unlike the md5 minhash contract)
    return F.pmod(F.xxhash64(term_col), F.lit(N_BUCKETS)).cast("int")


def _postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = tokens(text_col)
    inst = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("dl"),
        F.explode(toks).alias("term"),
    )
    return (
        inst.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
        .select(_bucket(F.col("term")).alias("bucket"), "term", "doc_id", "tf", "dl")
    )


def _doc_lens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"), F.size(tokens(text_col)).alias("dl")
    )


def build(wh, docs: DataFrame, run_id: int, id_col: str = "doc_id",
          text_col: str = "text") -> None:
    """Tokenize the corpus into the four index tables under one atomic
    commit. Rebuild-by-replacement: calling build again overwrites all
    four as a unit (the ann_index rebuild discipline)."""
    # postings feed two writes (postings + term_stats) and lens two
    # more — persist so the corpus tokenizes ONCE, not four times
    post = _postings(docs, id_col, text_col).persist()
    lens = _doc_lens(docs, id_col, text_col).persist()
    try:
        wh.begin_run(run_id)
        wh.overwrite(LAYER, "postings", post, partition_by=["bucket"])
        wh.overwrite(
            LAYER, "term_stats",
            post.groupBy("term").agg(F.count("*").alias("df")),
        )
        wh.overwrite(
            LAYER, "corpus_stats",
            lens.agg(F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")),
        )
        wh.overwrite(LAYER, "doc_lens", lens)
        wh.commit_run(run_id)
    finally:
        post.unpersist()
        lens.unpersist()


def ingest(wh, new_docs: DataFrame, run_id: int, id_col: str = "doc_id",
           text_col: str = "text") -> None:
    """Admit a batch: postings/doc_lens APPEND only the batch's rows
    (work is O(batch), the stored corpus is never re-tokenized);
    term_stats and corpus_stats merge exact-integer increments. Doc ids
    already admitted — and duplicates within the batch — are dropped
    first (doc_lens is the ledger), so a replayed batch is a no-op and
    the whole admission is exactly-once per doc id."""
    batch = new_docs.dropDuplicates([id_col])
    ledger = wh.read(LAYER, "doc_lens")
    if ledger is not None:
        batch = batch.join(
            ledger.select(F.col("doc_id").alias(id_col)), [id_col], "left_anti"
        )
    post = _postings(batch, id_col, text_col)
    lens = _doc_lens(batch, id_col, text_col)
    old_ts = wh.read(LAYER, "term_stats")
    new_ts = post.groupBy("term").agg(F.count("*").alias("df"))
    merged_ts = (
        new_ts if old_ts is None
        else old_ts.unionByName(new_ts).groupBy("term").agg(F.sum("df").alias("df"))
    )
    old_cs = wh.read(LAYER, "corpus_stats")
    new_cs = lens.agg(F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl"))
    merged_cs = (
        new_cs if old_cs is None
        else old_cs.unionByName(new_cs).agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum(F.coalesce(F.col("sum_dl"), F.lit(0))).alias("sum_dl"),
        )
    )
    # merged stats read the tables being replaced — materialize the
    # small frames before the overwrite swaps versions under them
    merged_ts = merged_ts.localCheckpoint()
    merged_cs = merged_cs.localCheckpoint()
    wh.begin_run(run_id)
    wh.append(LAYER, "postings", post)
    wh.overwrite(LAYER, "term_stats", merged_ts)
    wh.overwrite(LAYER, "corpus_stats", merged_cs)
    wh.append(LAYER, "doc_lens", lens)
    wh.commit_run(run_id)


def _pruned_postings(wh, terms: list[str]):
    """(postings, term_stats, corpus_stats) pruned to the query terms.
    Buckets of the (bounded, user-supplied) terms come via one tiny
    local-relation query — no hand-rolled Python xxhash64 that could
    drift from the JVM's implementation. Bounded collect: |terms| rows."""
    spark = wh.spark
    buckets = sorted({
        r["b"]
        for r in spark.createDataFrame([(t,) for t in terms], "term string")
        .select(_bucket(F.col("term")).alias("b"))
        .collect()
    })
    post = (
        wh.read(LAYER, "postings")
        .where(F.col("bucket").isin(buckets))  # partition pruning
        .where(F.col("term").isin(*terms))
    )
    ts = wh.read(LAYER, "term_stats").where(F.col("term").isin(*terms))
    cs = wh.read(LAYER, "corpus_stats")
    return post, ts, cs


def _per_term_micro(k1: float, b: float) -> Column:
    """The quantized per-(doc, term) BM25 contribution, over columns
    (tf, dl, df, n_docs, sum_dl) — identical between the single-query
    and batch paths so both reproduce corpus.bm25_scores bit-for-bit."""
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    denom = F.col("tf") + k1 * ((1.0 - b) + b * F.col("dl").cast("double") / avgdl)
    return F.floor(
        idf * (F.col("tf") * (k1 + 1.0)) / denom * MICRO + 0.5
    ).cast("long")


def query(
    wh,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    k: int | None = None,
) -> DataFrame:
    """BM25 over the STORED index: reads only the probed terms'
    partitions (static partition pruning on the bucket column), never
    re-tokenizes a document, and reproduces corpus.bm25_scores
    bit-for-bit — (doc_id, n_matched_terms, score_micro, bm25).

    ``k`` is the retrieval form: top-k docs by (score desc, doc_id) —
    compiled by Catalyst to TakeOrderedAndProject (per-partition heaps
    + one bounded driver merge, the q_sample_weighted precedent), so
    there is NO global sort exchange no matter the corpus size."""
    post, ts, cs = _pruned_postings(wh, terms)
    scored = (
        post.join(F.broadcast(ts.withColumnRenamed("term", "ts_term")),
                  F.col("term") == F.col("ts_term"))
        .join(F.broadcast(cs))
        .select("doc_id", _per_term_micro(k1, b).alias("s_micro"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_matched_terms"),
            F.sum("s_micro").alias("score_micro"),
        )
        .select(
            "doc_id", "n_matched_terms", "score_micro",
            (F.col("score_micro").cast("double") / MICRO).alias("bm25"),
        )
    )
    if k is not None:
        scored = scored.orderBy(
            F.col("score_micro").desc(), F.col("doc_id")
        ).limit(k)
    return scored


def query_terms(wh, text: str) -> list[str]:
    """Tokenize a RAW query string through the SAME chain the index
    side applies to documents (ngrams.tokens, evaluated by the engine
    itself over a one-row local relation — never a Python reimplementation
    that could drift from the JVM's split semantics). Returns the
    sorted distinct terms. Bounded collect: the query's own tokens."""
    rows = (
        wh.spark.createDataFrame([(text,)], "text string")
        .select(F.explode(tokens("text")).alias("term"))
        .distinct()
        .collect()
    )
    return sorted(r["term"] for r in rows)


def query_text(
    wh,
    text: str,
    k1: float = 1.2,
    b: float = 0.75,
    k: int | None = None,
) -> DataFrame:
    """BM25 retrieval from a RAW query string — the user-facing form.
    The first bug every retrieval user hits is an ANALYZER MISMATCH:
    the index tokenized documents one way and the query was tokenized
    by hand another way (casing, punctuation, whitespace). This
    routes the query through the IDENTICAL tokenize chain as
    :func:`build`/:func:`ingest` (one contract, both sides — the
    reference's single schema shared by file ingest and staging,
    SURVEY §1.2, applied to the query side), then delegates to
    :func:`query`; equality with a hand-tokenized call is pinned in
    tests/test_text_index.py and oracle-paired as q_bm25_query_text."""
    terms = query_terms(wh, text)
    # a blank query tokenizes to only empty-string terms (split("")
    # is [""]): raise rather than scan for the empty posting. A mixed
    # query KEEPS any empty term — parity with the index side, which
    # also emits one for a double space.
    if not any(terms):
        raise ValueError("query text tokenized to no terms")
    return query(wh, terms, k1=k1, b=b, k=k)


def query_many(
    wh,
    queries: dict[str, list[str]],
    k1: float = 1.2,
    b: float = 0.75,
    k: int | None = None,
) -> DataFrame:
    """Batch retrieval: N query term-sets answered in ONE pass over
    the probed postings — (query_id, doc_id, n_matched_terms,
    score_micro, bm25). The (query_id, term) set broadcasts (bounded
    by the query batch), postings are read once pruned to the UNION
    of all terms, and scoring shuffles once on (query_id, doc_id).
    With ``k``, top-k per query is the two-level similarity.
    topk_per_query (round 12): local top-k salted by partition id,
    then a k·P-row per-query merge — never a global sort, and never a
    single reducer sorting one query's whole candidate set (a
    stopword-ish term matches a corpus-sized posting slice). Per-query
    scores are bit-identical to :func:`query` (pinned in
    tests/test_text_index.py)."""
    spark = wh.spark
    pairs = [
        (qid, t) for qid, ts in queries.items() for t in sorted(set(ts))
    ]
    qt = spark.createDataFrame(pairs, "query_id string, term string")
    all_terms = sorted({t for _, t in pairs})
    post, ts, cs = _pruned_postings(wh, all_terms)
    scored = (
        post.join(F.broadcast(qt), "term")
        .join(F.broadcast(ts.withColumnRenamed("term", "ts_term")),
              F.col("term") == F.col("ts_term"))
        .join(F.broadcast(cs))
        .select("query_id", "doc_id", _per_term_micro(k1, b).alias("s_micro"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.count("*").alias("n_matched_terms"),
            F.sum("s_micro").alias("score_micro"),
        )
        .select(
            "query_id", "doc_id", "n_matched_terms", "score_micro",
            (F.col("score_micro").cast("double") / MICRO).alias("bm25"),
        )
    )
    if k is not None:
        # two-level top-k (round 12): a stopword-ish query term matches
        # a corpus-sized posting slice, and a plain per-query window
        # would sort all of it on one reducer
        from .similarity import topk_per_query

        scored = topk_per_query(
            scored, k, [F.col("score_micro").desc(), F.col("doc_id")],
            rank_name="_rk",
        ).drop("_rk")
    return scored


