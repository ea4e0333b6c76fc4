"""Boilerplate-stripping HTML -> clean text, pure stdlib.

The stage-0 operator of a pretraining corpus pipeline: crawled markup
in, clean training text + extraction stats out. Same dependency-free
discipline as the PNG/JPEG/WAV codecs (functions/png.py): only
``html.parser`` from the standard library, so the hot path needs no
container dependencies and the behavior is pinned by our own tests,
not a third-party library's version.

Reference parity: extension — the reference engine (a psycopg2 batch
job over bank CSVs, etl.py) has no document surface; SURVEY.md §2
LLM-ops calls for the raw-document extraction stage ahead of the
quality/PII/dedup/packing stages already in the repo.

Extraction contract (what the tests pin):

- **Suppressed subtrees** (``script style noscript template nav aside
  iframe svg head``) contribute no text — boilerplate never reaches
  the corpus. ``<title>`` is the one excavation from ``<head>``: its
  text is captured into a separate ``title`` field, not the body.
- **Block elements** (``p div h1-h6 li ul ol table tr td section
  article header footer blockquote pre figure main body form``) emit a
  newline boundary at both edges; consecutive boundaries collapse to
  one, so however deeply blocks nest the clean text carries single
  ``\\n`` separators. ``<br>`` and ``<hr>`` are boundaries too.
- **Inline elements** (``b i em strong a span code …`` — anything not
  listed above) are transparent: their text flows through untouched.
- **Text nodes are verbatim**: character/entity references decode
  (``&amp;`` -> ``&``), but no whitespace normalization is applied
  INSIDE a text node — segments that are entirely whitespace (inter-tag
  indentation) are dropped, everything else passes through unchanged,
  so extraction round-trips the author's actual prose.
- **Malformed markup is detected, not repaired**: a closing tag that
  was never opened, or structural/suppressed/block tags still open at
  EOF (the signature of truncated crawls), mark the document malformed.
  The DataFrame operator (operators/extraction.py) routes such rows to
  quarantine in-plan; this module only reports.
"""

from __future__ import annotations

from dataclasses import dataclass
from html.parser import HTMLParser

SUPPRESS = {
    "script", "style", "noscript", "template", "nav", "aside",
    "iframe", "svg", "head",
}
BLOCK = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "tr", "td", "th", "section", "article", "header", "footer",
    "blockquote", "pre", "figure", "main", "form", "body",
}
VOID = {
    "br", "hr", "img", "meta", "link", "input", "area", "base", "col",
    "embed", "source", "track", "wbr",
}
# tags whose non-closure at EOF marks the document malformed (truncated
# crawl); unclosed INLINE tags are tolerated, as real-world HTML omits
# them routinely and they cannot change the extracted text
_MUST_CLOSE = SUPPRESS | BLOCK | {"html", "title"}

_BOUNDARY = object()  # sentinel: block edge, collapses


@dataclass
class Extracted:
    title: str
    text: str
    n_tags: int
    error: str | None


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.segments: list = []
        self.title_parts: list[str] = []
        self.n_tags = 0
        self.error: str | None = None
        self._suppress = 0
        self._in_title = False
        self._stack: list[str] = []

    def handle_starttag(self, tag, attrs):
        self.n_tags += 1
        if tag in VOID:
            if tag in ("br", "hr"):
                self.segments.append(_BOUNDARY)
            return
        self._stack.append(tag)
        if tag == "title":
            self._in_title = True
        if tag in SUPPRESS:
            self._suppress += 1
        elif tag in BLOCK:
            self.segments.append(_BOUNDARY)

    def handle_startendtag(self, tag, attrs):  # <br/>-style
        self.n_tags += 1
        if tag in ("br", "hr"):
            self.segments.append(_BOUNDARY)

    def handle_endtag(self, tag):
        if tag in VOID:
            return
        if tag not in self._stack:
            if self.error is None:
                self.error = f"closing </{tag}> without matching open"
            return
        # implicit-close anything the author left open above it
        # (HTML5 tree-builder behavior, e.g. <li> runs)
        while self._stack and self._stack[-1] != tag:
            closed = self._stack.pop()
            if closed in SUPPRESS:
                self._suppress -= 1
            if closed == "title":
                self._in_title = False
        self._stack.pop()
        if tag == "title":
            self._in_title = False
        if tag in SUPPRESS:
            self._suppress -= 1
        elif tag in BLOCK:
            self.segments.append(_BOUNDARY)

    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)
        elif self._suppress == 0 and data:
            self.segments.append(data)

    def finish(self) -> None:
        self.close()
        if self.error is None:
            unclosed = [t for t in self._stack if t in _MUST_CLOSE]
            if unclosed:
                self.error = "unclosed at EOF: " + ",".join(unclosed)


def extract_html(markup: str) -> Extracted:
    """Parse ``markup`` and return (title, clean text, tag count,
    error). ``error`` is non-None for malformed documents; title/text
    are still best-effort populated so a caller choosing to keep
    malformed rows loses nothing."""
    p = _Extractor()
    try:
        p.feed(markup)
        p.finish()
    except Exception as exc:  # parser blew up outright
        if p.error is None:
            p.error = f"parse error: {exc}"
    parts: list[str] = []
    for seg in p.segments:
        if seg is _BOUNDARY:
            if parts and parts[-1] != "\n":
                parts.append("\n")
        elif seg.strip():
            parts.append(seg)
    return Extracted(
        title="".join(p.title_parts).strip(),
        text="".join(parts).strip("\n"),
        n_tags=p.n_tags,
        error=p.error,
    )
