"""File ingestion sources (reference file.py / finder.py, SURVEY §2.1).

S1  delimited text scan: ``;``-separated, UTF-8 BOM, header row,
    decimal-comma amounts (reference file.py:29-34)
S2  XLSX scan (reference file.py:37-42) — gated on openpyxl presence
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


def read_xlsx(spark: SparkSession, path: str) -> DataFrame:
    """S2: XLSX via pandas on the driver (these files are small daily
    dim snapshots — hundreds of rows in the reference domain). Gated:
    openpyxl is not baked into every runtime."""
    try:
        import pandas as pd

        pdf = pd.read_excel(path)  # needs openpyxl
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "XLSX ingestion requires openpyxl; stage these files as "
            "csv/parquet or install openpyxl"
        ) from e
    return spark.createDataFrame(pdf)


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
