"""Text-analysis operators for large-scale training-data pipelines:
language ID (marker-token heuristic), quality scoring, token counting,
document fingerprinting.

All column-expression based (whole-stage codegen; no UDFs): at 100 TB
these run as a single scan-project over the documents table — no
shuffle at all. Every ratio is exact integer arithmetic cast to double
at the end so the DuckDB oracle matches bitwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

# Marker tokens per language for the n-gram/stopword language heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "is", "of"),
    "de": ("der", "und", "die", "das"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "los", "y", "que"),
    "zh": ("de", "shi", "le", "zai"),
}


def tokens(text_col: str = "text") -> Column:
    return F.split(F.col(text_col), " ")


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count — the cheap proxy for BPE-token budgeting."""
    return F.size(tokens(text_col))


def _count_in(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda x: x.isin(*words)))


def with_text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: length, token count, punctuation ratio,
    stopword ratio, mean token length."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), "[.,;:!?]", ""))
    n_stop = _count_in(toks, STOPWORDS)
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        n_chars.cast("long").alias("n_chars_calc"),
        n_punct.cast("long").alias("n_punct"),
        (n_punct.cast("double") / n_chars).alias("punct_ratio"),
        (n_stop.cast("double") / n_tok).alias("stopword_ratio"),
        ((n_chars - (n_tok - F.lit(1))).cast("double") / n_tok).alias("mean_tok_len"),
    )


def with_lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token language heuristic with a deterministic argmax chain
    (first language in LANG_MARKERS order wins ties)."""
    toks = tokens(text_col)
    scores = {lang: _count_in(toks, m) for lang, m in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    pred = None
    # CASE WHEN s_l >= all later scores THEN l — mirrors the oracle chain
    for i, lang in enumerate(langs[:-1]):
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        branch = F.when(cond, F.lit(lang))
        pred = branch if pred is None else pred.when(cond, F.lit(lang))
    pred = pred.otherwise(F.lit(langs[-1]))
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang"),
        pred.alias("pred_lang"),
        *[scores[lang].cast("long").alias(f"score_{lang}") for lang in langs],
    )


def with_fingerprint(docs: DataFrame, text_col: str = "text", buckets: int = 1024) -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase
    text, plus a stable integer bucket (the first 15 hex digits as a
    bigint mod buckets) for shuffle-free grouping of exact dups."""
    norm = F.lower(F.regexp_replace(F.col(text_col), "\\s+", " "))
    fp = F.md5(norm)
    bucket = F.conv(F.substring(fp, 1, 15), 16, 10).cast("long") % buckets
    return docs.select("doc_id", fp.alias("fp"), bucket.alias("fp_bucket"))
