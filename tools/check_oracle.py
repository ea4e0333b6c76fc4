"""Local mimic of the driver's correctness gate.

Runs every query in the catalog through Spark AND its DuckDB oracle on
the same parquet, then compares row count, column names, and values
(order-insensitive, exact). Stricter than the driver's hash compare —
if this passes, the driver's should too.

Usage: python tools/check_oracle.py [query ...] [--sf DIR]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
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

    names = args.names or list(QUERIES)
    n_pass = n_fail = n_skip = 0
    for name in names:
        spec = QUERIES[name]
        sdf = spec.fn(spark, args.sf)
        srows = sdf.collect()
        scols = sdf.columns
        if spec.oracle is None:
            print(f"SKIP (no oracle) {name}: {len(srows)} rows")
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
        if errs:
            print(f"FAIL {name}: " + " | ".join(errs))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} skip (rows-only)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
