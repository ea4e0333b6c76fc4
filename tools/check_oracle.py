"""Local mimic of the driver's correctness gate.

Runs every query in the catalog through Spark AND its DuckDB oracle on
the same parquet, then compares them two ways:

1. value-exact (collect/fetchall, order-insensitive) — catches wrong
   results;
2. pandas-level (toPandas vs fetchdf, columns sorted by name, dtype
   *kind* + canonical value repr) — mimics the driver's type-aware
   hash, catching int64-vs-float64 drift (DuckDB SUM(int) -> HUGEINT ->
   float64), Decimal-object-vs-float drift, and pandas
   OutOfBoundsDatetime conversion errors that the exact check is
   blind to (round-1 lesson: 4 hash fails + 1 harness error that all
   passed check 1).

Usage: python tools/check_oracle.py [query ...] [--sf DIR]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402


def canon(v):
    """Canonicalize one value so Spark/DuckDB results compare exactly."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # bit-exact doubles only
    if isinstance(v, Decimal):
        return str(v.normalize())
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def _kind_class(kind: str) -> str:
    # int-vs-float is the drift the driver's hash is known to punish
    # (DuckDB SUM(int)->HUGEINT->float64, DECIMAL->float64); date-vs-
    # timestamp-midnight and ns-vs-us resolution are known-tolerated
    # (driver passed q_fraud1's DATE outputs in round 1).
    if kind in ("i", "u"):
        return "int"
    if kind == "f":
        return "float"
    return "*"


def _canon_pandas(v):
    import datetime as _dt

    import pandas as pd

    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_pandas(x) for x in v) + "]"
    if v is None or pd.isna(v):
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (pd.Timestamp, _dt.datetime, _dt.date)):
        return pd.Timestamp(v).isoformat()
    return str(v)


def pandas_signature(pdf):
    """Column-name-sorted (dtype-kind-class, sorted value reprs)
    signature — the closest observable mimic of the driver's type-aware
    hash."""
    pdf = pdf[sorted(pdf.columns)]
    sig = {}
    for c in pdf.columns:
        s = pdf[c]
        vals = sorted(_canon_pandas(v) for v in s.tolist())
        sig[c] = (_kind_class(s.dtype.kind), vals)
    return sig


def pandas_compare(sdf, ores_df):
    """Return a list of per-column mismatch descriptions (empty = ok)."""
    spdf = sdf.toPandas()
    errs = []
    if sorted(spdf.columns) != sorted(ores_df.columns):
        return [f"pandas columns spark={sorted(spdf.columns)} oracle={sorted(ores_df.columns)}"]
    ss, os_ = pandas_signature(spdf), pandas_signature(ores_df)
    for c in ss:
        sk, sv = ss[c]
        ok, ov = os_[c]
        if sk != ok:
            errs.append(f"dtype-kind[{c}] spark={sk} oracle={ok}")
        elif sv != ov:
            errs.append(f"pandas-values[{c}] differ (e.g. {sv[:1]} vs {ov[:1]})")
    return errs


import pandas as pd  # noqa: E402


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(canon(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from etl_fraud_detection_spark.catalog import TABLES
    from etl_fraud_detection_spark.plans.queries import QUERIES
    from etl_fraud_detection_spark.session import get_spark

    spark = get_spark("check-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    from etl_fraud_detection_spark.operators.dedup import release_shingles
    from etl_fraud_detection_spark.operators.sampling import release_ranked

    names = args.names or list(QUERIES)
    n_pass = n_fail = n_skip = 0
    for name in names:
        release_shingles()
        release_ranked()
        spark.catalog.clearCache()
        t0 = time.monotonic()
        spec = QUERIES[name]
        sdf = spec.fn(spark, args.sf)
        srows = sdf.collect()
        scols = sdf.columns
        if spec.oracle is None:
            print(f"SKIP (no oracle) {name}: {len(srows)} rows [{time.monotonic() - t0:.1f}s]")
            n_skip += 1
            continue
        ores = con.execute(spec.oracle)
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()

        errs = []
        if sorted(scols) != sorted(ocols):
            errs.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            errs.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not errs:
            sm = rows_to_multiset(scols, [tuple(r) for r in srows])
            om = rows_to_multiset(ocols, orows)
            if sm != om:
                only_s = [k for k in sm if sm[k] != om.get(k, 0)][:3]
                only_o = [k for k in om if om[k] != sm.get(k, 0)][:3]
                errs.append(f"values differ; spark-only={only_s} oracle-only={only_o}")
        if not errs:
            # driver-mimic pandas gate (type-aware; may raise on values
            # pandas cannot represent — that is itself a driver failure)
            try:
                errs.extend(pandas_compare(sdf, con.execute(spec.oracle).fetchdf()))
            except Exception as e:  # noqa: BLE001
                errs.append(f"pandas conversion raised {type(e).__name__}: {e}")
        if errs:
            print(f"FAIL {name}: " + " | ".join(errs))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows [{time.monotonic() - t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} skip (rows-only)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
