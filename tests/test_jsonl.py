"""JSONL source: nested types + the S1b quarantine contract."""

from etl_fraud_detection_spark.sources.files import read_jsonl_validated


def test_jsonl_good_rows_have_nested_types(spark, tmp_path):
    p = tmp_path / "d.jsonl"
    p.write_text(
        '{"i": 1, "m": {"s": "x"}, "a": [1, 2]}\n'
        '{"i": 2, "m": {"s": "y"}, "a": []}\n'
    )
    good, bad = read_jsonl_validated(
        spark, str(p), "i int, m struct<s: string>, a array<int>"
    )
    rows = {r["i"]: r for r in good.collect()}
    assert rows[1]["m"]["s"] == "x" and rows[1]["a"] == [1, 2]
    assert bad.count() == 0


def test_jsonl_quarantines_bad_lines_verbatim(spark, tmp_path):
    p = tmp_path / "d.jsonl"
    lines = [
        '{"i": 1}',
        "garbage",                # not JSON
        '{"i": "NaNint"}',        # type mismatch vs declared int
        '{"i": 3',                # truncated object
    ]
    p.write_text("\n".join(lines) + "\n")
    good, bad = read_jsonl_validated(spark, str(p), "i int")
    assert [r["i"] for r in good.collect()] == [1]
    quarantined = {r["raw_line"] for r in bad.collect()}
    assert quarantined == {"garbage", '{"i": "NaNint"}', '{"i": 3'}
