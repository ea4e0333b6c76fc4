"""Raw-document extraction (functions/htmltext.py +
operators/extraction.py): the boilerplate-stripping contract, the
quarantine routing, and the map-only plan shape."""

import pytest

from etl_fraud_detection_spark.functions.htmltext import extract_html
from etl_fraud_detection_spark.operators import extraction


# -- pure extractor contract ------------------------------------------------


def test_suppressed_subtrees_drop_and_title_excavates():
    m = (
        "<html><head><title>T &amp; t</title><style>b{}</style>"
        "<meta charset='utf-8'></head><body>"
        "<nav><ul><li>home</li></ul><script>x()</script></nav>"
        "<p>keep</p><aside>skip</aside></body></html>"
    )
    r = extract_html(m)
    assert r.error is None
    assert r.title == "T & t"  # entities decode in the title too
    assert r.text == "keep"  # nav (even its nested script), aside, style gone


def test_inline_transparent_blocks_bound_entities_decode():
    m = (
        "<body><h1>A <b>bold</b> title</h1>"
        "<p>x &lt;tag&gt; &amp; y</p><p>second</p></body>"
    )
    r = extract_html(m)
    assert r.text == "A bold title\nx <tag> & y\nsecond"


def test_text_nodes_verbatim_no_whitespace_mangling():
    m = "<body><p>two  spaces and\ta tab</p></body>"
    assert extract_html(m).text == "two  spaces and\ta tab"


def test_br_and_implicit_li_close():
    assert extract_html("<ul><li>a<li>b</ul>c<br>d<br/>e").text == "a\nb\nc\nd\ne"


def test_malformed_truncated_and_stray_close():
    torn = extract_html("<html><body><p>cut off here")
    assert torn.error is not None and "unclosed" in torn.error
    stray = extract_html("<p>x</p></div>")
    assert stray.error is not None and "</div>" in stray.error
    # unclosed INLINE tags are tolerated (routine in real HTML)
    assert extract_html("<body><p>a <b>bold</p></body>").error is None


def test_tag_count_includes_void_tags():
    r = extract_html("<body><p>a<br>b</p><img src='x'></body>")
    assert r.n_tags == 4  # body, p, br, img


# -- DataFrame operator -----------------------------------------------------


def _pages(spark):
    return spark.createDataFrame(
        [
            (1, "<html><head><title>ok</title></head><body><p>good</p></body></html>"),
            (2, "<html><body><p>torn"),
        ],
        "doc_id long, html string",
    )


def test_quarantine_routes_malformed_in_plan(spark):
    out = {r.doc_id: r for r in extraction.html_extract(_pages(spark)).collect()}
    assert out[1]._error is None
    assert out[1].clean_text == "good" and out[1].title == "ok"
    assert out[1].n_text_chars == 4 and out[1].n_tags == 5
    assert out[2]._error is not None and "unclosed" in out[2]._error
    assert out[2].clean_text is None and out[2].n_text_chars is None


def test_strict_mode_raises_on_first_malformed(spark):
    with pytest.raises(Exception, match="malformed markup"):
        extraction.html_extract(_pages(spark), on_error="fail").collect()


def test_markup_ratio_measures_boilerplate(spark):
    df = spark.createDataFrame(
        [(1, "<body><nav>lots of chrome here</nav><p>hi</p></body>")],
        "doc_id long, html string",
    )
    row = extraction.html_extract(df).collect()[0]
    assert row.markup_ratio == pytest.approx(1.0 - 2 / 52)


def test_extract_plan_is_map_only(spark):
    """Stage 0 over 100 TB of crawl must not shuffle: one Arrow map
    pass, memory bounded by batch size."""
    from tests.test_plans import plan_of, q

    p = plan_of(q(spark, "q_html_extract"))
    assert "Exchange" not in p
    assert "ArrowEvalPython" in p or "MapInPandas" in p
