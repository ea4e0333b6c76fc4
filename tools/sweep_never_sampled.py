"""Independent-process oracle sweep of every catalog query the DRIVER
has never sampled (round-12 verdict task 3).

The driver's per-round CORRECTNESS_r{N}.json samples ~50 of the catalog;
across rounds a tail of names never gets an independent-process row —
and the ones that build warehouse fixtures (q_corpus_admit,
q_export_shards, q_layout_hypertable, q_dedup_band_index) are exactly
where environment coupling could hide from the gate's same-process run.
This tool derives the never-sampled set from the CORRECTNESS_r*.json
records actually in the repo, runs tools/check_oracle.py over it in a
FRESH process (the strict value-compare, not the hash), and appends a
judge-visible ``never_sampled_sweep`` record to PROGRESS.jsonl with the
full name list and per-name outcome.

Usage: python tools/sweep_never_sampled.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def never_sampled() -> list[str]:
    sampled: set[str] = set()
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(f) as fh:
            sampled |= set(json.load(fh))
    names: set[str] = set()
    for src in (
        "etl_fraud_detection_spark/plans/queries.py",
        "etl_fraud_detection_spark/plans/queries_ext.py",
    ):
        with open(os.path.join(REPO, src)) as fh:
            names |= set(re.findall(r'@query\(\s*"(q_[a-z0-9_]+)"', fh.read()))
    return sorted(names - sampled)


def run_sweep(sf: str) -> dict:
    """Run the sweep and return its PROGRESS record (also used by
    tools/round_gate.py, which embeds the sweep in the round-exit gate
    so a late catalog add can't reach round exit without an
    independent-process row — round-12 verdict task 5)."""
    names = never_sampled()
    print(f"{len(names)} never-driver-sampled queries:")
    print(" ".join(names))
    t0 = time.time()
    if not names:
        # check_oracle.py with ZERO positional names falls back to the
        # whole catalog (args.names or list(QUERIES)) — once every name
        # has a driver sample, that silent ~195-query full re-run would
        # ride inside every round_gate invocation and its failures
        # would alias into the sweep record. Nothing to sweep = done.
        return {
            "ts": time.time(),
            "gate": "never_sampled_sweep",
            "sf": sf,
            "n_names": 0,
            "pass": 0,
            "fail": 0,
            "rows_only": 0,
            "missing": [],
            "failed_names": [],
            "names": [],
            "check_oracle_rc": 0,
            "wall_s": 0.0,
        }
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"),
         *names, "--sf", sf],
        capture_output=True, text=True, cwd=REPO,
    )
    out = proc.stdout
    sys.stdout.write(out)
    sys.stderr.write(proc.stderr[-2000:])
    results = {}
    for line in out.splitlines():
        m = re.match(
            r"(PASS|FAIL|SKIP)(?:\s*\(no oracle\))? (q_[a-z0-9_]+):", line
        )
        if m:
            results[m.group(2)] = m.group(1)
    return {
        "ts": time.time(),
        "gate": "never_sampled_sweep",
        "sf": sf,
        "n_names": len(names),
        "pass": sum(1 for v in results.values() if v == "PASS"),
        "fail": sum(1 for v in results.values() if v == "FAIL"),
        "rows_only": sum(1 for v in results.values() if v == "SKIP"),
        "missing": sorted(set(names) - set(results)),
        "failed_names": sorted(n for n, v in results.items() if v == "FAIL"),
        "names": names,
        "check_oracle_rc": proc.returncode,
        "wall_s": round(time.time() - t0, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    record = run_sweep(args.sf)
    with open(os.path.join(REPO, "PROGRESS.jsonl"), "a") as fh:
        fh.write(json.dumps(record) + "\n")
    print(json.dumps({k: v for k, v in record.items() if k != "names"}))
    return 0 if not record["fail"] and not record["missing"] else 1


if __name__ == "__main__":
    main()
