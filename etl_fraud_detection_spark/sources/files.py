"""File ingestion sources (reference file.py / finder.py, SURVEY §2.1).

S1  delimited text scan: ``;``-separated, UTF-8 BOM, header row,
    decimal-comma amounts (reference file.py:29-34)
S2  XLSX scan (reference file.py:37-42) — stdlib SpreadsheetML parse
    (zipfile + ElementTree), no openpyxl needed; plus a minimal writer
S3  extension dispatch (file.py:44-45)
S4  filename metadata: embedded %d%m%Y date -> the batch create_dt
    (file.py:14-26)
S5  glob discovery over filename templates (finder.py:14-26)
S11 archive sink: rename to archive/<name>.backup after load
    (file.py:47-55) — done explicitly post-commit, not in __del__
    (a reference fragility SURVEY §7 says not to copy)

Scale notes: S1 is a plain distributed CSV scan — Spark parallelizes by
file split; the decimal-comma fix is a column expression
(regexp_replace + cast), not a per-row Python pass like the reference's
``line.replace``, so it stays inside whole-stage codegen.
"""

from __future__ import annotations

import glob as _glob
import os
import re
import shutil
from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession, functions as F

_FNAME_DATE_RE = re.compile(r"_(\d{8})\.")


@dataclass(frozen=True)
class SourceFile:
    """Parsed file metadata (reference file.py:14-26)."""

    path: str
    name: str  # logical table name, e.g. 'transactions'
    dt: datetime  # batch date embedded in the filename (%d%m%Y)
    ext: str

    @classmethod
    def parse(cls, path: str) -> "SourceFile":
        base = os.path.basename(path)
        stem, ext = os.path.splitext(base)
        m = _FNAME_DATE_RE.search(base)
        if not m:
            raise ValueError(f"no _DDMMYYYY date in filename: {base}")
        dt = datetime.strptime(m.group(1), "%d%m%Y")
        name = stem[: stem.rfind("_")]
        return cls(path=path, name=name, dt=dt, ext=ext.lstrip(".").lower())


def discover(directory: str, templates: list[str]) -> list[SourceFile]:
    """S5: multi-template glob discovery, sorted by batch date so daily
    files replay in order (reference finder.py:14-26, main.py:9)."""
    found = []
    for tpl in templates:
        for p in _glob.glob(os.path.join(directory, tpl)):
            found.append(SourceFile.parse(p))
    return sorted(found, key=lambda f: (f.dt, f.name))


def read_delimited(
    spark: SparkSession,
    path: str,
    decimal_comma_cols: list[str] = (),
    sep: str = ";",
) -> DataFrame:
    """S1: header'd ``;``-separated text with UTF-8 BOM and decimal-comma
    numerics. The reference rewrites ',' -> '.' across the whole raw line
    (file.py:32), which would corrupt text fields containing commas — we
    normalize only the declared numeric columns (F8), then cast to
    DECIMAL(18,2) per the DDL (main.ddl:87)."""
    df = (
        spark.read.option("sep", sep)
        .option("header", True)
        .option("encoding", "UTF-8")
        .csv(path)
    )
    for c in decimal_comma_cols:
        df = df.withColumn(
            c, F.regexp_replace(F.col(c), ",", ".").cast("decimal(18,2)")
        )
    return df


def read_delimited_validated(
    spark: SparkSession,
    path: str,
    schema: str,
    sep: str = ";",
) -> tuple[DataFrame, DataFrame]:
    """S1 robustness: schema-enforced PERMISSIVE scan that ROUTES
    malformed rows (bad tokens, too few/many fields) to a quarantine
    side output instead of failing the batch — the operational contract
    a daily ingest needs: good rows land, bad rows stay auditable with
    their raw line. Returns (good, quarantine); both derive from ONE
    scan (the corrupt-record column is populated by the parser, so no
    second pass over the file)."""
    df = (
        spark.read.option("sep", sep)
        .option("header", True)
        .option("encoding", "UTF-8")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .schema(schema + ", _corrupt string")
        .csv(path)
    )
    # Spark disallows plans whose scan references ONLY the corrupt
    # column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN);
    # caching the parsed batch is the documented contract — and the
    # right call anyway, since both branches share the single scan.
    df = df.cache()
    good = df.where(F.col("_corrupt").isNull()).drop("_corrupt")
    bad = df.where(F.col("_corrupt").isNotNull()).select(
        F.col("_corrupt").alias("raw_line")
    )
    return good, bad


def read_jsonl_validated(
    spark: SparkSession,
    path: str,
    schema: str,
) -> tuple[DataFrame, DataFrame]:
    """JSON-Lines scan with the S1b quarantine contract: one PERMISSIVE
    scan routes lines that are not valid JSON, or whose fields cannot
    parse to the declared schema, to a quarantine side output carrying
    the verbatim raw line. JSONL is the lingua franca of LLM training
    corpora (one document per line, nested metadata objects), so the
    engine treats it as a first-class source next to delimited text and
    XLSX — same dispatch, same quarantine discipline, and nested fields
    (structs, arrays) come back as real Spark types, not strings.

    Returns (good, quarantine); both derive from ONE cached scan (the
    corrupt-record column is populated by the parser — no second pass).
    Scale: a plain distributed json scan, split by file/line exactly
    like CSV; schema is explicit so there is no inference pass over
    100 TB of text."""
    df = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .schema(schema + ", _corrupt string")
        .json(path)
    )
    # Same contract as read_delimited_validated: a plan touching only
    # the corrupt column is rejected by Spark — cache the parsed batch.
    df = df.cache()
    good = df.where(F.col("_corrupt").isNull()).drop("_corrupt")
    bad = df.where(F.col("_corrupt").isNotNull()).select(
        F.col("_corrupt").alias("raw_line")
    )
    return good, bad


_XLSX_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_index(ref: str) -> int:
    """Cell ref column letters -> 0-based index ('A1'->0, 'BC12'->54)."""
    idx = 0
    for ch in ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - 64)
    return idx - 1


def _parse_xlsx_bytes(data: bytes) -> tuple[list[str], list[list[str | None]]]:
    """Parse one XLSX workbook (bytes) into (header, rows) — the pure
    core shared by the driver-side and executor-side readers. An .xlsx
    is a zip of SpreadsheetML; stdlib zipfile + ElementTree cover the
    features dimension snapshots use (shared and inline strings, sparse
    cells, first sheet). All values surface as strings — casts are the
    caller's schema contract, exactly like the CSV scan."""
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(io.BytesIO(data)) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_XLSX_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_XLSX_NS}t")))
        sheet = sorted(
            n for n in z.namelist()
            if n.startswith("xl/worksheets/sheet") and n.endswith(".xml")
        )[0]
        rows: list[dict[int, str | None]] = []
        for row in ET.fromstring(z.read(sheet)).iter(f"{_XLSX_NS}row"):
            cells: dict[int, str | None] = {}
            next_col = 0
            for c in row.findall(f"{_XLSX_NS}c"):
                col = _col_index(c.get("r")) if c.get("r") else next_col
                next_col = col + 1
                t = c.get("t")
                if t == "s":
                    v: str | None = shared[int(c.find(f"{_XLSX_NS}v").text)]
                elif t == "inlineStr":
                    v = "".join(tt.text or "" for tt in c.iter(f"{_XLSX_NS}t"))
                else:
                    ve = c.find(f"{_XLSX_NS}v")
                    v = ve.text if ve is not None else None
                cells[col] = v
            rows.append(cells)
    if not rows:
        raise ValueError("empty worksheet")
    width = max(max(r.keys(), default=-1) for r in rows) + 1
    header = [rows[0].get(i) or f"_c{i}" for i in range(width)]
    data_rows = [[r.get(i) for i in range(width)] for r in rows[1:]]
    return header, data_rows


def read_xlsx(spark: SparkSession, path: str, **_kw) -> DataFrame:
    """S2: XLSX scan (reference file.py:37-42) with no third-party
    dependency. Header row = row 1, all values strings. Driver-side
    parse is the right trade-off for the reference's daily dim lists
    (matching its pandas.read_excel); a deliberate size guard redirects
    anything executor-sized to :func:`read_xlsx_dist` — one workbook's
    zip container isn't splittable, but MANY workbooks parallelize
    per-file there."""
    size = os.path.getsize(path)
    if size > XLSX_DRIVER_MAX_BYTES:
        raise ValueError(
            f"{path} is {size} bytes (> {XLSX_DRIVER_MAX_BYTES}); "
            "driver-side XLSX parse is for small dimension snapshots — "
            "use read_xlsx_dist(spark, glob) for executor-scale batches"
        )
    with open(path, "rb") as fh:
        header, data = _parse_xlsx_bytes(fh.read())
    return spark.createDataFrame(
        data, schema=", ".join(f"`{h}` string" for h in header)
    )


# Above this, a workbook is not a "small dimension snapshot" anymore and
# the driver refuses to materialize it (read_xlsx_dist parses on
# executors instead). 64 MiB ≈ millions of cells, far beyond any daily
# terminal list, yet small enough to never brown-out the driver heap.
XLSX_DRIVER_MAX_BYTES = 64 * 1024 * 1024


def read_xlsx_dist(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    on_error: str = "fail",
) -> DataFrame:
    """Executor-scale XLSX ingest: a batch of workbooks (glob / dir /
    single path) parsed IN PARALLEL, one file per task, no driver
    materialization. `binaryFile` ships each workbook's bytes to an
    executor; `mapInPandas` (Arrow) runs the same pure stdlib parse as
    `read_xlsx` and aligns cells to the output schema BY HEADER NAME,
    so files with reordered or extra columns still land correctly
    (missing cells -> NULL). Adds `_src_file` for lineage and
    `_error` (NULL for clean files).

    ``on_error`` mirrors the CSV quarantine contract (S1b): ``"fail"``
    aborts the batch on the first corrupt workbook; ``"quarantine"``
    emits one row per corrupt FILE with NULL data columns and the parse
    error in ``_error`` — one dirty snapshot among 10k dailies must
    never fail the load, and the quarantine rows are the audit trail.

    ``columns`` is the output contract; when omitted it is inferred
    from one file (bounded driver read of a single workbook — the same
    class of peek as CSV schema inference). In quarantine mode the
    inference tries a few smallest candidates, so one corrupt snapshot
    cannot fail the load that quarantine promises to survive — but if
    EVERY sampled candidate is corrupt the call still raises: pass
    ``columns=`` explicitly for guaranteed robustness against
    arbitrarily dirty batches. The non-splittable zip container makes
    per-FILE parallelism the correct distribution atom: 10k daily
    snapshots = 10k independent tasks."""
    import pandas as pd

    if on_error not in ("fail", "quarantine"):
        raise ValueError(f"on_error must be fail|quarantine, got {on_error!r}")
    bf = spark.read.format("binaryFile").load(path)
    if columns is None:
        # infer from the SMALLEST files (binaryFile lists largest-first,
        # so a naive limit(1) would pull the biggest workbook's bytes
        # onto the driver) and hold each to the same driver-size guard
        # as read_xlsx. In quarantine mode a corrupt candidate falls
        # through to the next-smallest (bounded sample) instead of
        # failing the batch.
        n_candidates = 4 if on_error == "quarantine" else 1
        # size-guard ON the length column, BEFORE any bytes move: the
        # guard must bound the driver memory pull itself, not merely
        # refuse to parse after the blob already landed on the driver
        first = (
            bf.where(F.col("length") <= XLSX_DRIVER_MAX_BYTES)
            .select("content")
            .orderBy("length")
            .limit(n_candidates)
            .collect()
        )
        if not first:
            if bf.limit(1).count() == 0:
                raise FileNotFoundError(f"no files match {path}")
            raise ValueError(
                f"cannot infer columns: every workbook under {path} "
                f"exceeds the driver inference guard "
                f"({XLSX_DRIVER_MAX_BYTES} bytes); pass columns= "
                f"explicitly"
            )
        last_exc: Exception | None = None
        for idx, cand in enumerate(first):
            blob = bytes(cand["content"])
            try:
                columns, _ = _parse_xlsx_bytes(blob)
                break
            except Exception as exc:  # corrupt candidate
                last_exc = exc
        if columns is None:
            raise ValueError(
                f"cannot infer columns: the {len(first)} smallest "
                f"workbook(s) under {path} failed to parse (last error: "
                f"{last_exc}); pass columns= explicitly"
            ) from last_exc
    out_cols = list(columns)
    quarantine = on_error == "quarantine"

    def parse(batches):
        for pdf in batches:
            for src, content in zip(pdf["path"], pdf["content"]):
                try:
                    header, rows = _parse_xlsx_bytes(bytes(content))
                except Exception as exc:
                    if not quarantine:
                        raise ValueError(f"corrupt workbook {src}: {exc}") from exc
                    yield pd.DataFrame(
                        {**{c: [None] for c in out_cols},
                         "_src_file": [src],
                         "_error": [f"{type(exc).__name__}: {exc}"]},
                        columns=out_cols + ["_src_file", "_error"],
                    )
                    continue
                idx = {h: i for i, h in enumerate(header)}
                cols = {
                    c: [
                        row[idx[c]] if c in idx and idx[c] < len(row) else None
                        for row in rows
                    ]
                    for c in out_cols
                }
                cols["_src_file"] = [src] * len(rows)
                cols["_error"] = [None] * len(rows)
                yield pd.DataFrame(cols, columns=out_cols + ["_src_file", "_error"])

    schema = ", ".join(
        f"`{c}` string" for c in out_cols + ["_src_file", "_error"]
    )
    return bf.select("path", "content").mapInPandas(parse, schema)


def write_xlsx(path: str, header: list[str], rows: list[list]) -> str:
    """Minimal single-sheet XLSX writer (inline strings; numbers as
    numeric cells) — enough to round-trip read_xlsx and to fabricate the
    dimension-snapshot fixtures the reference ingests. Stdlib only."""
    import zipfile
    from xml.sax.saxutils import escape

    def cell(v) -> str:
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return f"<c><v>{v}</v></c>"
        return f'<c t="inlineStr"><is><t>{escape(str(v))}</t></is></c>'

    sheet_rows = "".join(
        "<row>" + "".join(cell(v) for v in r) + "</row>"
        for r in [list(header)] + [list(r) for r in rows]
    )
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    pkg = {
        "[Content_Types].xml": (
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            "</Types>"
        ),
        "_rels/.rels": (
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            f'<Relationship Id="rId1" Type="{rns}/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>"
        ),
        "xl/workbook.xml": (
            f'<?xml version="1.0"?><workbook xmlns="{ns}" xmlns:r="{rns}">'
            '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
        ),
        "xl/_rels/workbook.xml.rels": (
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            f'<Relationship Id="rId1" Type="{rns}/worksheet" Target="worksheets/sheet1.xml"/>'
            "</Relationships>"
        ),
        "xl/worksheets/sheet1.xml": (
            f'<?xml version="1.0"?><worksheet xmlns="{ns}">'
            f"<sheetData>{sheet_rows}</sheetData></worksheet>"
        ),
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for name, content in pkg.items():
            z.writestr(name, content)
    return path


def read_any(spark: SparkSession, f: SourceFile, **kw) -> DataFrame:
    """S3: extension -> reader dispatch (reference file.py:44-45)."""
    readers = {"txt": read_delimited, "csv": read_delimited, "xlsx": read_xlsx}
    if f.ext not in readers:
        raise ValueError(f"unsupported source extension: {f.ext}")
    return readers[f.ext](spark, f.path, **kw)


def with_batch_date(df: DataFrame, f: SourceFile) -> DataFrame:
    """S4: stamp the filename-embedded batch date as create_dt
    (reference etl.py:92 binds file.dt into the stage insert)."""
    return df.withColumn(
        "create_dt", F.lit(f.dt.isoformat(sep=" ")).cast("timestamp_ntz")
    )


def archive(f: SourceFile) -> str:
    """S11: move the consumed file to archive/<name>.backup — explicit
    exactly-once consumption, called after the batch commits."""
    arch_dir = os.path.join(os.path.dirname(f.path), "archive")
    os.makedirs(arch_dir, exist_ok=True)
    dest = os.path.join(arch_dir, os.path.basename(f.path) + ".backup")
    shutil.move(f.path, dest)
    return dest
