"""Stdlib XLSX reader/writer round-trip + format-corner tests."""

import os
import zipfile

from etl_fraud_detection_spark.sources.files import read_xlsx, write_xlsx

NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"


def test_xlsx_round_trip(spark, tmp_path):
    p = str(tmp_path / "t.xlsx")
    write_xlsx(
        p,
        ["id", "name", "amt"],
        [[1, "a & b <c>", 12.5], [2, "plain", 3]],
    )
    out = sorted(read_xlsx(spark, p).collect(), key=lambda r: r.id)
    assert [r.asDict() for r in out] == [
        {"id": "1", "name": "a & b <c>", "amt": "12.5"},
        {"id": "2", "name": "plain", "amt": "3"},
    ]


def _write_raw_sheet(path, sheet_xml, shared_xml=None):
    """Handcraft an xlsx with an arbitrary sheet (and optional shared
    strings) to exercise reader paths our writer doesn't emit."""
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/></Types>',
        )
        z.writestr(
            "_rels/.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            f'<Relationship Id="rId1" Type="{rns}/officeDocument" Target="xl/workbook.xml"/></Relationships>',
        )
        z.writestr(
            "xl/workbook.xml",
            f'<?xml version="1.0"?><workbook xmlns="{NS}"><sheets/></workbook>',
        )
        if shared_xml is not None:
            z.writestr("xl/sharedStrings.xml", shared_xml)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)


def test_xlsx_shared_strings_and_sparse_cells(spark, tmp_path):
    p = str(tmp_path / "s.xlsx")
    shared = (
        f'<?xml version="1.0"?><sst xmlns="{NS}">'
        "<si><t>id</t></si><si><t>city</t></si>"
        "<si><r><t>St.</t></r><r><t>Petersburg</t></r></si></sst>"
    )  # run-fragmented shared string must concatenate
    sheet = (
        f'<?xml version="1.0"?><worksheet xmlns="{NS}"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2"><v>7</v></c><c r="C2" t="s"><v>2</v></c></row>'
        "</sheetData></worksheet>"
    )  # column B absent entirely -> filler name, NULL value
    _write_raw_sheet(p, sheet, shared)
    df = read_xlsx(spark, p)
    assert df.columns == ["id", "_c1", "city"]
    row = df.collect()[0]
    assert (row.id, row._c1, row.city) == ("7", None, "St.Petersburg")


def test_xlsx_dispatch_and_discovery(spark, tmp_path):
    from etl_fraud_detection_spark.sources import files as src

    p = str(tmp_path / "dims_01022024.xlsx")
    write_xlsx(p, ["k"], [["v"]])
    (f,) = src.discover(str(tmp_path), ["dims_*.xlsx"])
    assert f.ext == "xlsx" and f.dt.isoformat()[:10] == "2024-02-01"
    assert src.read_any(spark, f).collect()[0].k == "v"
    assert os.path.basename(src.archive(f)).endswith(".backup")


def test_xlsx_dist_parses_on_executors(spark, tmp_path):
    """A multi-file XLSX batch must ingest through binaryFile +
    mapInPandas — parse on executors, no driver materialization of any
    workbook — aligning drifted column orders by header name."""
    from etl_fraud_detection_spark.sources.files import read_xlsx_dist

    write_xlsx(str(tmp_path / "a.xlsx"), ["id", "city"], [[1, "x"], [2, "y"]])
    # second file: columns reordered + an extra one -> align by name
    write_xlsx(
        str(tmp_path / "b.xlsx"), ["city", "junk", "id"], [["z", "?", 3]]
    )
    df = read_xlsx_dist(spark, str(tmp_path), columns=["id", "city"])
    got = sorted(
        (r.id, r.city, os.path.basename(r._src_file).split("?")[0][:6])
        for r in df.collect()
    )
    assert got == [
        ("1", "x", "a.xlsx"), ("2", "y", "a.xlsx"), ("3", "z", "b.xlsx")
    ]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # executor-side Arrow parse
    assert "binaryFile" in plan or "BinaryFile" in plan


def test_xlsx_dist_infers_columns_from_one_file(spark, tmp_path):
    from etl_fraud_detection_spark.sources.files import read_xlsx_dist

    write_xlsx(str(tmp_path / "only.xlsx"), ["k", "v"], [["a", "1"]])
    df = read_xlsx_dist(spark, str(tmp_path))
    assert df.columns == ["k", "v", "_src_file", "_error"]
    assert df.count() == 1


def test_xlsx_driver_guard_redirects_big_files(spark, tmp_path, monkeypatch):
    """read_xlsx must refuse a workbook past the driver-size guard with
    a pointer at the distributed path."""
    import pytest

    from etl_fraud_detection_spark.sources import files as src

    p = str(tmp_path / "big.xlsx")
    write_xlsx(p, ["k"], [["v"]])
    monkeypatch.setattr(src, "XLSX_DRIVER_MAX_BYTES", 10)
    with pytest.raises(ValueError, match="read_xlsx_dist"):
        src.read_xlsx(spark, p)


def test_xlsx_dist_quarantines_corrupt_workbook(spark, tmp_path):
    """on_error='quarantine': a corrupt workbook among clean ones must
    produce one NULL-data audit row, never fail the batch; the default
    'fail' mode must abort."""
    import pytest

    from etl_fraud_detection_spark.sources.files import read_xlsx_dist

    write_xlsx(str(tmp_path / "good.xlsx"), ["k"], [["v1"], ["v2"]])
    (tmp_path / "bad.xlsx").write_bytes(b"this is not a zip archive")

    df = read_xlsx_dist(spark, str(tmp_path), columns=["k"], on_error="quarantine")
    rows = df.collect()
    good = sorted(r.k for r in rows if r._error is None)
    bad = [r for r in rows if r._error is not None]
    assert good == ["v1", "v2"]
    assert len(bad) == 1 and bad[0].k is None
    assert "bad.xlsx" in bad[0]._src_file and "BadZipFile" in bad[0]._error

    with pytest.raises(Exception):
        read_xlsx_dist(spark, str(tmp_path), columns=["k"]).collect()
