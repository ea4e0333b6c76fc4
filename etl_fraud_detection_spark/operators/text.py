"""Text-analysis operators for large-scale training-data pipelines:
language ID (marker-token heuristic), quality scoring, token counting,
document fingerprinting.

All column-expression based (whole-stage codegen; no UDFs) with ONE
documented exception — :func:`nfc`, the Arrow-vectorized Unicode
normalization contract (Spark has no built-in NFC): at 100 TB these
run as a single scan-project over the documents table — no shuffle at
all. Every ratio is exact integer arithmetic cast to double at the end
so the DuckDB oracle matches bitwise.
"""

from __future__ import annotations

import pandas as pd
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


def nfc(col: Column, casefold: bool = False) -> Column:
    """Unicode NFC normalization of a string column — THE engine-wide
    normalization contract ahead of fingerprinting (round-9 verdict
    task 5). Crawl data carries NFC/NFKC variants of visually identical
    text (an NFD 'café' is byte-different from the NFC one), which
    defeats exact AND near-dup detection if fingerprints hash raw
    bytes. One normalization, applied at the ADMISSION/INDEX boundary:

    - corpus admission (corpus_build._admission) normalizes the
      extracted body once, so the exact md5 fingerprint, the PII/
      quality stages, the shingle minhash ledger and the stored
      survivor text all see the same bytes;
    - dedup_index._fps normalizes before shingling (direct build/
      ingest callers get the same ledger bytes as admission);
    - text_index normalizes in its shared tokenize helper, so BM25
      indexing and query_text are identical by construction (the
      analyzer-mismatch discipline, one stage earlier).

    Ad-hoc catalog operators (dedup.py / this module over caller
    frames) deliberately fingerprint the bytes they are given — the
    contract is that admitted corpora are already NFC.

    Spark has no built-in NFC, so this is the documented Arrow escape
    hatch: a vectorized pandas_udf with a per-row str.isascii() fast
    path (C-speed; ASCII batches never touch unicodedata). NFC is
    idempotent, so double application along composed paths is safe.
    ``casefold=True`` additionally applies str.casefold() AFTER the
    NFC pass — the optional case-insensitive variant of the contract
    for pipelines whose dedup policy treats case variants as dups
    (NOT the default: the ledger/BM25 chain is case-sensitive and its
    oracles must match lower()-free SQL)."""
    if casefold:
        return _nfc_casefold_udf(col)
    return _nfc_udf(col)


def _nfc_series(s: "pd.Series") -> "pd.Series":
    import unicodedata

    return pd.Series(
        [
            t if t is None or t.isascii()
            else unicodedata.normalize("NFC", t)
            for t in s
        ],
        dtype=object,
    )


def _nfc_casefold_series(s: "pd.Series") -> "pd.Series":
    import unicodedata

    return pd.Series(
        [
            t if t is None
            else (t.casefold() if t.isascii()
                  else unicodedata.normalize("NFC", t).casefold())
            for t in s
        ],
        dtype=object,
    )


# built lazily: pandas_udf resolves its return type through the active
# SparkSession, which doesn't exist at import time
_NFC_UDF = None
_NFC_CF_UDF = None


def _nfc_udf(col: Column) -> Column:
    global _NFC_UDF
    if _NFC_UDF is None:
        from pyspark.sql.types import StringType

        _NFC_UDF = F.pandas_udf(_nfc_series, StringType())
    return _NFC_UDF(col)


def _nfc_casefold_udf(col: Column) -> Column:
    global _NFC_CF_UDF
    if _NFC_CF_UDF is None:
        from pyspark.sql.types import StringType

        _NFC_CF_UDF = F.pandas_udf(_nfc_casefold_series, StringType())
    return _NFC_CF_UDF(col)


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


# BPE-ish pre-tokenizer: letter runs, single digits, single punctuation —
# the shape GPT-style byte-pair pre-splitting produces, as one regex.
BPE_ISH_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"


def bpe_ish_token_count(text_col: str = "text") -> Column:
    """Sub-word-ish token budget estimate via regexp_extract_all — far
    closer to a real BPE count than whitespace splitting (digits and
    punctuation tokenize separately), still pure codegen."""
    return F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_RE), 0))


def with_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token budgeting: whitespace count (the cheap proxy) next to the
    BPE-ish regex count (the billing-grade proxy)."""
    return docs.select(
        "doc_id",
        token_count(text_col).cast("long").alias("n_ws_tokens"),
        bpe_ish_token_count(text_col).cast("long").alias("n_bpe_tokens"),
    )


def rolling_hash(text_col: str = "text", base: int = 131, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash over the character codepoints (left fold
    ``acc*base + code (mod m)`` seeded with the first code) — the
    classic Rabin-Karp document fingerprint, entirely in codegen.
    Intermediate values stay < mod*base + 255 << 2^63, so bigint-safe."""
    codes = F.transform(F.split(F.col(text_col), ""), lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        F.slice(codes, 2, F.greatest(F.size(codes) - 1, F.lit(0))),
        F.element_at(codes, 1).cast("long"),
        lambda acc, x: (acc * base + x) % mod,
    )


# PII redaction: (label, pattern) in application order. Patterns stick to
# the Java-regex ∩ RE2 common subset so the DuckDB oracle is literal; the
# credit-card pattern runs before phone so a card's tail is never re-matched
# as a phone number.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("EMAIL", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"),
    ("CC", "[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}"),
    ("PHONE", "[0-9]{3}-[0-9]{3}-[0-9]{4}"),
    ("IP", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"),
)


def with_pii_redaction(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub PII before a corpus reaches training: replace each match
    with a typed placeholder token and report per-kind match counts
    (counted on the pre-redaction text). Pure regexp codegen — one scan,
    no shuffle, safe to fuse with the rest of the cleaning pipeline."""
    counts = []
    redacted = F.col(text_col)
    for label, pat in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(redacted, F.lit(pat), 0))
            .cast("long")
            .alias(f"n_{label.lower()}")
        )
        redacted = F.regexp_replace(redacted, pat, f"<{label}>")
    return docs.select("doc_id", *counts, redacted.alias("redacted"))


# Quality gate thresholds: (reason, flag builder over a stats row).
QUALITY_RULES: tuple[tuple[str, "Callable[[], Column]"], ...] = (
    ("too_short", lambda: F.col("n_tokens") < 5),
    ("too_long", lambda: F.col("n_tokens") > 500),
    ("punct_heavy", lambda: F.col("punct_ratio") > 0.10),
    ("low_stopword", lambda: F.col("stopword_ratio") < 0.01),
    ("tok_len_outlier", lambda: (F.col("mean_tok_len") < 2.0) | (F.col("mean_tok_len") > 12.0)),
)


def quality_keep(text_col: str = "text") -> Column:
    """The keep/drop decision as ONE inline column expression — no
    separate stats pass, no self-join: lets a pipeline fuse the quality
    gate into the same scan as its downstream stages (same thresholds
    as QUALITY_RULES)."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), "[.,;:!?]", ""))
    punct_ratio = n_punct.cast("double") / n_chars
    stop_ratio = _count_in(toks, STOPWORDS).cast("double") / n_tok
    mtl = (n_chars - (n_tok - F.lit(1))).cast("double") / n_tok
    return ~(
        (n_tok < 5) | (n_tok > 500) | (punct_ratio > 0.10)
        | (stop_ratio < 0.01) | (mtl < 2.0) | (mtl > 12.0)
    )


def with_quality_filter(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep/drop decision composed from the text-stats features, with an
    auditable reasons string (CASE-per-rule folded through concat_ws, so
    NULL = rule passed drops out). Same single-scan shape as the stats."""
    stats = with_text_stats(docs, text_col)
    flags = {reason: build() for reason, build in QUALITY_RULES}
    reasons = F.concat_ws(
        ",", *[F.when(flag, F.lit(reason)) for reason, flag in flags.items()]
    )
    keep = None
    for flag in flags.values():
        keep = ~flag if keep is None else (keep & ~flag)
    return stats.select(
        "doc_id", "n_tokens", "punct_ratio", "stopword_ratio", "mean_tok_len",
        keep.alias("keep"), reasons.alias("drop_reasons"),
    )


def with_fingerprint(docs: DataFrame, text_col: str = "text", buckets: int = 1024) -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase
    text, plus a stable integer bucket (the first 15 hex digits as a
    bigint mod buckets) for shuffle-free grouping of exact dups."""
    norm = F.lower(F.regexp_replace(F.col(text_col), "\\s+", " "))
    fp = F.md5(norm)
    bucket = F.conv(F.substring(fp, 1, 15), 16, 10).cast("long") % buckets
    return docs.select("doc_id", fp.alias("fp"), bucket.alias("fp_bucket"))


def with_repetition_removal(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition REMOVAL (the cleanup twin of with_repetition_stats'
    diagnosis): collapse runs of consecutive duplicate tokens — the
    classic degenerate-generation / boilerplate artifact ("batch batch
    batch") that inflates token budgets and teaches models to loop.
    Emits the cleaned text plus before/after token counts so a pipeline
    can gate on the shrink ratio.

    Shape: pure higher-order functions over one split — map-only,
    zero shuffles, fuses into any cleaning pipeline scan. The token
    array and the filtered array are each projected into a column
    before reuse (no CSE inside or across lambdas — see shingles()).
    F.get (0-based, NULL out-of-bounds) avoids element_at's index-0
    error on the first token."""
    base = docs.select(
        "doc_id", F.split(F.col(text_col), " ").alias("_toks")
    )
    kept = F.filter(
        F.col("_toks"),
        lambda x, i: (i == F.lit(0)) | (x != F.get(F.col("_toks"), i - 1)),
    )
    step = base.select("doc_id", "_toks", kept.alias("_kept"))
    return step.select(
        "doc_id",
        F.array_join("_kept", " ").alias("clean_text"),
        F.size("_toks").cast("long").alias("n_tokens_before"),
        F.size("_kept").cast("long").alias("n_tokens_after"),
    )
