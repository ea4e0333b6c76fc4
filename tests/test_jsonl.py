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


def test_jsonl_schema_widening_reads_old_files(spark, tmp_path):
    """Governed schema evolution: files written before a column existed
    read cleanly under the widened schema (missing fields -> NULL, not
    quarantine) — the contract that lets a 100 TB corpus add metadata
    without rewriting history."""
    old = tmp_path / "old.jsonl"
    old.write_text('{"i": 1}\n{"i": 2}\n')
    new = tmp_path / "new.jsonl"
    new.write_text('{"i": 3, "split": "train"}\n')
    good, bad = read_jsonl_validated(
        spark, str(tmp_path / "*.jsonl"), "i int, split string"
    )
    assert bad.count() == 0
    rows = {r["i"]: r["split"] for r in good.collect()}
    assert rows == {1: None, 2: None, 3: "train"}
