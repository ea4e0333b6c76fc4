"""Property tests (hypothesis) for the SCD2 merge invariants over random
small staged histories — the checks SURVEY §5.2 calls for beyond the
golden fixtures:

P1  exactly one open version (effective_to = sentinel) per live key
P2  no overlapping effective ranges within a key
P3  idempotence: re-merging the same stage batch changes nothing
P4  key conservation: output keys = dwh keys ∪ stg keys
"""

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_fraud_detection_spark.operators.scd import scd2_merge

COLS = ["k", "v"]
KEYS = ["k"]
SENT = datetime(9999, 12, 31)
T0 = datetime(2025, 1, 1)
BATCH = datetime(2025, 1, 8)
TODAY = datetime(2025, 1, 10)
NOW = datetime(2025, 1, 15, 12, 0, 0)

DWH_SCHEMA = (
    "k int, v string, effective_from timestamp_ntz, effective_to timestamp_ntz, "
    "deleted_flg boolean, processed_dt timestamp_ntz"
)
STG_SCHEMA = "k int, v string, create_dt timestamp_ntz"

# a key's prior state: absent, live with value, or tombstoned
prior = st.sampled_from(["absent", "live", "deleted"])
values = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))

keyspace = st.dictionaries(
    st.integers(min_value=1, max_value=6),
    st.tuples(prior, values, st.booleans(), values),
    min_size=1,
    max_size=6,
)
# per key: (prior_state, prior_value, in_stage?, stage_value)


def build_frames(spark, spec):
    dwh_rows, stg_rows, src_keys = [], [], []
    for k, (state, pv, staged, sv) in spec.items():
        if state == "live":
            # one closed historical version + the open one
            dwh_rows.append((k, "old", T0, BATCH - timedelta(days=3, seconds=1), False, T0))
            dwh_rows.append((k, pv, BATCH - timedelta(days=3), SENT, False, T0))
        elif state == "deleted":
            dwh_rows.append((k, pv, T0, BATCH - timedelta(days=3, seconds=1), False, T0))
            dwh_rows.append((k, pv, BATCH - timedelta(days=3), SENT, True, T0))
        if staged:
            stg_rows.append((k, sv, BATCH))
            src_keys.append((k,))
    dwh = spark.createDataFrame(dwh_rows, DWH_SCHEMA)
    stg = spark.createDataFrame(stg_rows, STG_SCHEMA)
    srck = spark.createDataFrame(src_keys, "k int") if src_keys else spark.createDataFrame([], "k int")
    return dwh, stg, srck


def merge(spark, spec):
    dwh, stg, srck = build_frames(spark, spec)
    out = scd2_merge(
        dwh, stg, KEYS, COLS,
        src_keys=srck,
        now=F.lit(NOW).cast("timestamp_ntz"),
        today=F.lit(TODAY).cast("timestamp_ntz"),
    )
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(spec=keyspace)
def test_scd2_invariants(spark, spec):
    out = merge(spark, spec).collect()

    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)

    # P4: key conservation
    expected_keys = {k for k, (state, *_rest) in spec.items() if state != "absent"}
    expected_keys |= {k for k, (_s, _pv, staged, _sv) in spec.items() if staged}
    assert set(by_key) == expected_keys

    for k, rows in by_key.items():
        opens = [r for r in rows if r.effective_to == SENT]
        # P1: exactly one open version per present key
        assert len(opens) == 1, f"key {k}: {len(opens)} open versions"
        # P2: no overlapping ranges (sorted by start, each ends before next starts)
        rows = sorted(rows, key=lambda r: r.effective_from)
        for a, b in zip(rows, rows[1:]):
            assert a.effective_to < b.effective_from, f"key {k} overlap"


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(spec=keyspace)
def test_scd2_idempotent_remerge(spark, spec):
    first = merge(spark, spec)
    dwh2 = first
    _, stg, srck = build_frames(spark, spec)
    again = scd2_merge(
        dwh2, stg, KEYS, COLS,
        src_keys=srck,
        now=F.lit(NOW).cast("timestamp_ntz"),
        today=F.lit(TODAY).cast("timestamp_ntz"),
    )
    canon = lambda df: sorted(tuple(map(repr, r)) for r in df.collect())
    assert canon(first) == canon(again)  # P3: same batch twice = no change
