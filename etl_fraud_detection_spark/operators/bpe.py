"""Byte-pair-encoding tokenizer: the real subword step between corpus
hygiene and training, replacing the BPE-ish regex *estimate* in
operators/text.py with an actual learned merge table.

Split of labor at 100 TB (the standard production shape):
- TRAINING runs on a bounded deterministic sample (hash_topk_sample →
  driver): tokenizer vocabularies are built from samples, not the full
  corpus, so the iterative merge loop is a driver-side concern — never
  a per-round distributed job over 100 TB.
- ENCODING runs distributed: the learned merge table broadcasts with
  the closure and every document encodes independently inside an
  Arrow-batched ``mapInPandas`` — map-only, no shuffle, linear in
  corpus size. Python-side by necessity (iterative per-word merging is
  not expressible in codegen), which is exactly the documented
  Pandas-UDF escape hatch.

Algorithm: classic word-level BPE (Sennrich et al. 2016, public):
words split to characters + terminal marker; repeatedly merge the
most frequent adjacent symbol pair (count ties broken lexicographically
for determinism); encoding replays merges in learned order.
"""

from __future__ import annotations

import heapq
from collections import Counter
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

WORD_END = "</w>"

# Java-regex equivalent of Python str.split()'s whitespace class, so
# the distributed word counter tokenizes EXACTLY like the driver-side
# trainer and encoder (which use str.split()): ASCII \s plus the
# file/group/record/unit separators and the Unicode space separators
# CPython treats as whitespace. html_extract emits newline-joined
# block text, so a plain single-space split would count
# 'wordA\nwordB' as one word and learn merges the encoder can never
# reproduce.
PY_WHITESPACE_RE = (
    "[\\s\\x1c-\\x1f\\x85\\xa0\\u1680\\u2000-\\u200a"
    "\\u2028\\u2029\\u202f\\u205f\\u3000]+"
)


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (WORD_END,)


def _merge_loop_naive(vocab: Counter, n_merges: int) -> list[tuple[str, str]]:
    """Reference merge selection: recount EVERY pair over the whole
    vocabulary each round. O(n_merges × Σ|word|) — simple and obviously
    correct, kept as the oracle the incremental loop is property-pinned
    against (tests/test_bpe.py), never called on real corpora."""
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        # highest count first, ties to the lexicographically smallest pair
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        merges.append(best)
        vocab = Counter(
            {_apply_merge(syms, best): cnt for syms, cnt in vocab.items()}
        )
    return merges


def _merge_loop(vocab: Counter, n_merges: int) -> list[tuple[str, str]]:
    """Iterative merge selection over a word-frequency table — shared
    by the sampled (train_bpe) and full-corpus
    (train_merges_distributed) entry points so both produce identical
    rules for identical statistics. Deterministic: pair-count ties
    break lexicographically (pinned equal to :func:`_merge_loop_naive`
    on random vocabularies in tests/test_bpe.py).

    Incremental (the classic trainer shape): pair counts are built
    once, then each merge touches ONLY the words that contain the
    merged pair (an inverted pair→words index), decrementing the
    word's old pairs and incrementing its new ones. Selection is a
    lazy-deletion min-heap keyed (-count, pair) — heap order IS the
    selection order (highest count, then lexicographically smallest) —
    with stale entries discarded on pop by checking against the live
    count. Per merge: O(affected words × |word|) updates +
    O(log #pairs) amortized selection, vs the naive loop's full
    vocabulary recount; at production scale (10⁶ words × 32k merges)
    that is the difference between minutes and days."""
    # words as a mutable list so the pair→word index stays valid
    words: list[tuple[tuple[str, ...], int]] = list(vocab.items())
    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set] = {}
    for idx, (syms, cnt) in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + cnt
            where.setdefault(p, set()).add(idx)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        best = None
        while heap:
            negc, p = heap[0]
            if pair_counts.get(p) == -negc:
                best = p
                break
            heapq.heappop(heap)  # stale: count changed since push
        if best is None:
            break
        merges.append(best)
        pair_counts.pop(best, None)
        heapq.heappop(heap)
        for idx in where.pop(best, ()):  # only words containing the pair
            syms, cnt = words[idx]
            new_syms = _apply_merge(syms, best)
            if new_syms == syms:  # stale index entry — pair already gone
                continue
            changed = Counter(zip(new_syms, new_syms[1:]))
            changed.subtract(Counter(zip(syms, syms[1:])))
            for p, d in changed.items():
                if d == 0 or p == best:
                    continue
                c = pair_counts.get(p, 0) + d * cnt
                if c > 0:
                    pair_counts[p] = c
                    heapq.heappush(heap, (-c, p))
                    if d > 0:
                        where.setdefault(p, set()).add(idx)
                else:
                    pair_counts.pop(p, None)
            words[idx] = (new_syms, cnt)
    return merges


def train_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from whitespace-split words of a
    driver-side text sample (the bounded-sample path)."""
    vocab = Counter()
    for t in texts:
        for w in t.split():
            if w:
                vocab[_word_symbols(w)] += 1
    return _merge_loop(vocab, n_merges)


def train_merges_distributed(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Learn merge rules from the FULL corpus's exact word statistics:
    the corpus-sized work — word counting — is ONE distributed
    explode + groupBy whose output is the VOCABULARY-bounded word-
    frequency table (natural-language vocab grows ~log with corpus
    size: a few MB at any scale, the same bounded-collect class as
    text_index's term stats); the iterative merge loop then runs on
    that table driver-side, identically to :func:`train_bpe`
    (pinned equal in tests/test_bpe.py). Trains on exact full-corpus
    counts where the sampled path trains on a subset — same
    determinism contract, zero per-merge distributed jobs.

    Tokenization contract: words are split on WHITESPACE RUNS with the
    same character class as Python ``str.split()`` (PY_WHITESPACE_RE),
    because that is what train_bpe and encode_documents use —
    html_extract emits newline-joined text, and a single-space split
    would learn newline-bearing symbols the encoder can never
    produce."""
    from pyspark.sql import functions as F

    rows = (
        docs.select(
            F.explode(F.split(F.col(text_col), PY_WHITESPACE_RE)).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .collect()
    )
    vocab = Counter({_word_symbols(r["w"]): r["freq"] for r in rows})
    return _merge_loop(vocab, n_merges)


def _apply_merge(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Replay the merge list in learned order over one word."""
    syms = _word_symbols(word)
    for pair in merges:
        if len(syms) < 2:
            break
        syms = _apply_merge(syms, pair)
    return list(syms)


def encode_text(text: str, merges: list[tuple[str, str]]) -> list[str]:
    toks: list[str] = []
    for w in text.split():
        if w:
            toks += encode_word(w, merges)
    return toks


def encode_documents(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    strict: bool = False,
) -> DataFrame:
    """Distributed BPE encode: merge table broadcast via closure, each
    Arrow batch encoded independently (map-only). Emits the token array
    and the billing-grade token count.

    Precondition, enforced per-document: the terminal marker must not
    occur IN the text, or decode_tokens' marker replacement would
    corrupt the round trip — a word containing ``</w>`` splits into
    chars whose concatenation reproduces the marker mid-stream. Corpus
    text reaching this operator is whitespace/markup-normalized
    upstream (html_extract strips tags), so real corpora never trip
    this. Default mode QUARANTINES the offending doc (``bpe_tokens``
    and ``n_bpe_tokens`` NULL) so one adversarial/unnormalized doc
    cannot abort a corpus-wide encode job; ``strict=True`` restores
    the hard ValueError for callers that require all-or-nothing."""
    # per-word memoization: corpus words repeat heavily, so encoding
    # each distinct word once per batch beats re-merging every copy
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def enc(text: str) -> list[str] | None:
            if WORD_END in text:
                if strict:
                    raise ValueError(
                        f"BPE input contains the literal terminal marker "
                        f"{WORD_END!r}; decode would not round-trip — "
                        f"strip or escape markup before encoding"
                    )
                return None
            out: list[str] = []
            for w in text.split():
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w, merges)
                out += got
            return out

        for pdf in it:
            toks = [enc(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "bpe_tokens": toks,
                    "n_bpe_tokens": pd.array(
                        [None if t is None else len(t) for t in toks],
                        dtype="Int64",
                    ),
                }
            )

    return docs.mapInPandas(
        batches, schema="doc_id long, bpe_tokens array<string>, n_bpe_tokens long"
    )


def decode_tokens(tokens_col: str = "bpe_tokens"):
    """DECODE a BPE token array back to text — entirely JVM codegen
    (no Python): concatenate the subword symbols and turn each
    terminal ``</w>`` marker back into a word boundary. Exact inverse
    of encode for whitespace-normalized, MARKER-FREE input (encoding
    splits on whitespace runs, so the round trip yields words joined
    by single spaces; text containing the literal ``</w>`` characters
    is quarantined to NULL by encode_documents — the marker
    replacement here cannot distinguish it from a word boundary, and
    NULL tokens decode to NULL, never wrong text) — the property
    q_bpe_roundtrip pins for EVERY merge table, since merges only
    re-segment within a word and never cross the marker. Encode is
    the documented Arrow escape hatch; decode stays in whole-stage
    codegen."""
    from pyspark.sql import functions as F

    return F.trim(
        F.replace(
            F.array_join(F.col(tokens_col), ""),
            F.lit(WORD_END), F.lit(" "),
        )
    )
