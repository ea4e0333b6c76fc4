"""Round-16 measurement probes.

Modes:
  admit   — per-eager-action breakdown of the corpus admission
            composites (q_corpus_admit / q_corpus_admit_intra): every
            DataFrame.localCheckpoint / .count / .collect inside the
            query is timed and attributed to its call site via the
            Python stack, separating the probe/checkpoint fixed costs
            (guide §1: measure where the time goes before touching the
            eagerness discipline) from the final plan execution.
  media   — same breakdown for q_multimodal_band_index.
  stream  — streaming drain floor receipt (r15 verdict task 4): drains
            each streaming catalog query once warm, recording wall,
            micro-batch count and per-batch durations from
            StreamingQuery.recentProgress, plus state-store commit
            time, to decide whether the ~1.6 s/query floor is batch
            count or state-store machinery.

Usage: python tools/probe_r16.py admit|media|stream [--sf DIR] [-n N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:  # Spark 4: the concrete class overrides the unified-API base
    from pyspark.sql.classic.dataframe import DataFrame
except ImportError:  # pragma: no cover - Spark 3
    from pyspark.sql import DataFrame

from etl_fraud_detection_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class _trace:
    """Monkeypatch the eager DataFrame actions with call-site timing."""

    def __init__(self):
        self.rows: list[tuple[str, str, float]] = []

    def _site(self) -> str:
        # stack ends [..., caller, timed, _site] — drop the last two
        frames = traceback.extract_stack()[:-2]
        sites = [
            f"{os.path.relpath(fr.filename, REPO)}:{fr.lineno}"
            for fr in frames
            if "etl_fraud_detection_spark" in fr.filename
        ]
        return " <- ".join(reversed(sites[-3:])) if sites else "<caller>"

    def __enter__(self):
        self.saved = {}
        for name in ("localCheckpoint", "count", "collect"):
            orig = getattr(DataFrame, name)
            self.saved[name] = orig

            def timed(df, *a, _orig=orig, _name=name, **k):
                t0 = time.perf_counter()
                r = _orig(df, *a, **k)
                self.rows.append(
                    (_name, self._site(), time.perf_counter() - t0)
                )
                return r

            setattr(DataFrame, name, timed)
        return self

    def __exit__(self, *exc):
        for name, orig in self.saved.items():
            setattr(DataFrame, name, orig)

    def report(self) -> float:
        tot = 0.0
        for name, site, dt in self.rows:
            print(f"    {dt:7.3f}s  {name:<16} {site}")
            tot += dt
        print(f"    {tot:7.3f}s  TOTAL eager actions ({len(self.rows)})")
        return tot


def _run_traced(spark, sf: str, qname: str, n: int) -> None:
    from etl_fraud_detection_spark.operators.dedup import release_shingles
    from etl_fraud_detection_spark.operators.sampling import release_ranked
    from etl_fraud_detection_spark.plans.queries import QUERIES

    # warm (also builds the _built_once warehouse fixture)
    QUERIES[qname].fn(spark, sf).count()
    for i in range(n):
        release_shingles()
        release_ranked()
        spark.catalog.clearCache()
        print(f"# {qname} sample {i + 1}/{n}")
        t0 = time.perf_counter()
        with _trace() as tr:
            df = QUERIES[qname].fn(spark, sf)
            t_build = time.perf_counter() - t0
            t1 = time.perf_counter()
            nrows = df.count()
            t_final = time.perf_counter() - t1
        eager = tr.report()
        print(
            f"  build(incl eager)={t_build:.3f}s final_count={t_final:.3f}s "
            f"total={t_build + t_final:.3f}s rows={nrows} "
            f"(eager actions inside build: {eager:.3f}s)"
        )


def mode_admit(spark, sf: str, n: int) -> None:
    for q in ("q_corpus_admit", "q_corpus_admit_intra"):
        _run_traced(spark, sf, q, n)


def mode_media(spark, sf: str, n: int) -> None:
    _run_traced(spark, sf, "q_multimodal_band_index", n)


def mode_stream(spark, sf: str, n: int) -> None:
    from pyspark.sql.streaming import StreamingQuery

    from etl_fraud_detection_spark.plans.queries import QUERIES

    stream_qs = [q for q in QUERIES if q.startswith("q_stream_")]
    progress: list = []

    orig_await = StreamingQuery.awaitTermination

    def timed_await(q, *a, **k):
        r = orig_await(q, *a, **k)
        progress.append((q.name, [p for p in q.recentProgress]))
        return r

    StreamingQuery.awaitTermination = timed_await
    try:
        # warm the streaming machinery (state store + codegen init)
        QUERIES["q_stream_join"].fn(spark, sf).count()
        for view in (
            "stream_win_agg", "stream_sliding_agg", "stream_rule3",
            "stream_rule4", "stream_dedup", "stream_sessions",
            "stream_asof", "stream_join", "stream_join_outer",
            "stream_fraud1",
        ):
            try:
                spark.catalog.dropTempView(view)
            except Exception:
                pass
        for qname in stream_qs:
            best = None
            for _ in range(n):
                progress.clear()
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                QUERIES[qname].fn(spark, sf).count()
                took = time.perf_counter() - t0
                snap = [
                    (name, list(plist)) for name, plist in progress
                ]
                if best is None or took < best[0]:
                    best = (took, snap)
            took, snap = best
            print(f"\n# {qname}: wall={took:.3f}s (min of {n})")
            import json as _json

            for name, plist in snap:
                print(f"  stream {name}: {len(plist)} progress events")
                for p in plist:
                    d = _json.loads(p)
                    dur = d.get("durationMs", {})
                    ss = [
                        (so.get("commitTimeMs"), so.get("numRowsTotal"))
                        for so in d.get("stateOperators", [])
                    ]
                    print(
                        f"    batch {d.get('batchId')}: "
                        f"triggerExecution={dur.get('triggerExecution')}ms "
                        f"addBatch={dur.get('addBatch')}ms "
                        f"getBatch={dur.get('getBatch')}ms "
                        f"latestOffset={dur.get('latestOffset')}ms "
                        f"commitOffsets={dur.get('commitOffsets')}ms "
                        f"walCommit={dur.get('walCommit')}ms "
                        f"stateOps(commitMs,rows)={ss} "
                        f"rows={d.get('numInputRows')}"
                    )
    finally:
        StreamingQuery.awaitTermination = orig_await


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["admit", "media", "stream"])
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("-n", type=int, default=3)
    args = ap.parse_args()
    spark = get_spark(f"probe_r16_{args.mode}")
    spark.sparkContext.setLogLevel("ERROR")
    {"admit": mode_admit, "media": mode_media, "stream": mode_stream}[
        args.mode
    ](spark, args.sf, args.n)
    spark.stop()


if __name__ == "__main__":
    main()
