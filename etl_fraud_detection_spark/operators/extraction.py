"""Raw-document extraction: crawled markup -> clean training text,
distributed via Arrow-batched ``mapInPandas``.

This is stage 0 of the corpus pipeline — the repo already had every
stage downstream of it (quality gate, PII redaction, dedup, packing:
operators/corpus.py, operators/sampling.py); this operator produces
their input from raw HTML. Pure-stdlib parse (functions/htmltext.py),
so executors need no extra dependencies.

Quarantine contract mirrors the file sources (S1b, sources/files.py):
``on_error="quarantine"`` keeps malformed documents in the SAME output
frame with NULL extraction columns and the parse error in ``_error`` —
one truncated crawl among billions must never fail the batch, and the
quarantined rows are the audit trail. ``on_error="fail"`` raises on
the first malformed document (strict ingest).

Scale shape (100 TB of crawl): map-only — no shuffle, no driver
collect; memory bounded by the Arrow batch size, not partition size.
Parallelism = input splits; co-locate by storage block, never
repartition raw markup. The stats columns exist so the next stage can
filter (e.g. markup_ratio too high = boilerplate page) with a plain
predicate that Catalyst pushes into the scan of the materialized
output.

Reference parity: extension (reference etl.py has no document
surface); SURVEY.md §2 LLM-ops raw-extraction stage.
"""

from __future__ import annotations

import unicodedata
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from ..functions.htmltext import extract_html

_EXTRACT_COLS = (
    "title string, clean_text string, n_tags int, n_text_chars long, "
    "markup_ratio double, _error string"
)


def html_extract(
    df: DataFrame,
    html_col: str = "html",
    id_cols: tuple[str, ...] = ("doc_id",),
    on_error: str = "quarantine",
) -> DataFrame:
    """Extract clean text from ``html_col``. Output: ``id_cols`` +
    (title, clean_text, n_tags, n_text_chars, markup_ratio, _error).
    Malformed markup (unbalanced/truncated — see functions/htmltext.py
    for the contract) routes to quarantine rows (NULL extraction
    columns, error in ``_error``) or raises, per ``on_error``."""
    if on_error not in ("fail", "quarantine"):
        raise ValueError(f"on_error must be fail|quarantine, got {on_error!r}")
    id_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in id_cols
    )
    out_schema = f"{id_schema}, {_EXTRACT_COLS}"
    strict = on_error == "fail"
    ids = list(id_cols)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for tup in pdf[ids + [html_col]].itertuples(index=False):
                *keys, markup = tup
                ex = extract_html(markup)
                if ex.error is not None:
                    if strict:
                        raise ValueError(
                            f"malformed markup at {dict(zip(ids, keys))}: "
                            f"{ex.error}"
                        )
                    rows.append((*keys, None, None, None, None, None, ex.error))
                else:
                    # NFC-normalize INSIDE this (already-Arrow) stage —
                    # the engine-wide contract (text.nfc docstring):
                    # every downstream fingerprint sees NFC bytes, and
                    # folding it here costs zero extra Python hops (a
                    # separate nfc stage on the extraction output
                    # measured ~+3s per admission batch: the column
                    # re-evaluates per verdict branch). isascii() is
                    # the C-speed fast path; n_text_chars is the
                    # length of the NORMALIZED text (the text we keep).
                    title, body = ex.title, ex.text
                    if not title.isascii():
                        title = unicodedata.normalize("NFC", title)
                    if not body.isascii():
                        body = unicodedata.normalize("NFC", body)
                    n_chars = len(body)
                    ratio = (
                        1.0 - n_chars / len(markup) if markup else None
                    )
                    rows.append(
                        (*keys, title, body, ex.n_tags, n_chars,
                         ratio, None)
                    )
            yield pd.DataFrame(
                rows,
                columns=ids + [
                    "title", "clean_text", "n_tags", "n_text_chars",
                    "markup_ratio", "_error",
                ],
            )

    return df.select(*ids, html_col).mapInPandas(batches, out_schema)
