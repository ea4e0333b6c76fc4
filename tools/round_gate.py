"""Round-exit gate: run the FULL catalog oracle sweep (every query) plus the whole
pytest suite and append one summary line to PROGRESS.jsonl.

The driver's per-round CORRECTNESS file samples ~50 of the catalog's
queries, so a green driver record can hide red queries (round 2's
streaming family failed for two rounds without the sample ever touching
it). This gate is the local, exhaustive complement: nothing ships
unless every catalog query passes the DuckDB oracle and every test
passes.

Usage:  python tools/round_gate.py [--sf /root/testdata/sf0.01]
Exit code 0 only if both gates are fully green.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--no-plans-regen", action="store_true",
                    help="skip the PLANS.md regeneration (quick re-check)")
    args = ap.parse_args()

    t0 = time.time()
    # PLANS.md REGENERATION inside the gate (round-13 verdict task 4:
    # coverage-by-name let a catalog commit AFTER a manual regen ship
    # an unaudited plan row — exactly what happened at r13's 16:40
    # q_ann_opq change). The gate now regenerates the audit itself, so
    # every row describes the plan shape of the code being gated.
    # --no-plans-regen keeps the old behavior for quick re-checks.
    plans_regen_rc = None
    if not args.no_plans_regen:
        regen = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "plan_report.py")],
            capture_output=True, text=True, cwd=REPO,
        )
        plans_regen_rc = regen.returncode
        print(f"plans regen: rc={regen.returncode}")
        if regen.returncode != 0:
            sys.stderr.write(regen.stdout[-1000:] + regen.stderr[-2000:])
    # Coverage gate stays (round-9 verdict: q_bpe_train slipped in two
    # commits after the last regen and nothing noticed): every
    # non-streaming catalog query must have an audit row.
    sys.path.insert(0, REPO)
    from etl_fraud_detection_spark.plans.queries import QUERIES
    from tools.plan_report import SKIP as PLAN_SKIP

    with open(os.path.join(REPO, "PLANS.md")) as fh:
        plans = fh.read()
    plan_rows = set(re.findall(r"^\| (q_\w+) \|", plans, re.MULTILINE))
    plans_missing = sorted(set(QUERIES) - PLAN_SKIP - plan_rows)
    print(f"plans: {len(plan_rows)} rows, {len(plans_missing)} missing"
          + (f" ({' '.join(plans_missing)})" if plans_missing else ""))

    oracle = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"),
         "--sf", args.sf],
        capture_output=True, text=True, cwd=REPO,
    )
    m = re.search(
        r"(\d+) pass, (\d+) fail, (\d+) skip", oracle.stdout + oracle.stderr
    )
    o_pass, o_fail, o_skip = (int(x) for x in m.groups()) if m else (0, -1, 0)
    # record WHICH queries failed — the round-10 gate lost a failing
    # name to the captured-subprocess summary and had to re-hunt it
    o_failed_names = re.findall(
        r"^FAIL (\S+?):", oracle.stdout + oracle.stderr, re.MULTILINE
    )
    print(f"oracle: {o_pass} pass, {o_fail} fail, {o_skip} rows-only")
    if o_failed_names:
        print("oracle failed:", " ".join(o_failed_names))

    # Never-sampled sweep INSIDE the gate (round-12 verdict task 5):
    # the round-12 sweep ran before the last two commits added queries,
    # so the newest names reached round exit with no independent-
    # process row. Running it here — after the catalog is final — makes
    # that structurally impossible: the gate is red if any name is
    # missing from the sweep's results or fails it.
    from tools.sweep_never_sampled import run_sweep

    sweep = run_sweep(args.sf)
    print(
        f"never-sampled sweep: {sweep['pass']} pass, {sweep['fail']} fail, "
        f"{sweep['rows_only']} rows-only, {len(sweep['missing'])} missing"
    )
    # full record (incl. the name list) stays judge-visible on its own
    # PROGRESS line, exactly as the standalone tool writes it
    with open(os.path.join(REPO, "PROGRESS.jsonl"), "a") as fh:
        fh.write(json.dumps(sweep) + "\n")

    pytest = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q"],
        capture_output=True, text=True, cwd=REPO,
    )
    combined = (pytest.stdout + pytest.stderr).strip()
    tail = combined.splitlines()[-1] if combined else ""
    t_pass = int(m2.group(1)) if (m2 := re.search(r"(\d+) passed", combined)) else 0
    t_fail = int(m3.group(1)) if (m3 := re.search(r"(\d+) failed", combined)) else 0
    # record WHICH tests failed — a transient flake inside a 25-minute
    # full-suite run is unattributable otherwise (round 9: one gate run
    # recorded 1 failed with no name; both targeted reruns were green)
    failed_names = re.findall(r"^FAILED (\S+)", combined, re.MULTILINE)
    print(f"pytest: {tail} (rc={pytest.returncode})")
    if failed_names:
        print("failed:", " ".join(failed_names))

    # Bench-canary visibility (round-10 verdict task 6): the gate used
    # to exit green on a round whose only bench record was ambient-
    # flagged; surface the flag (and the retry count that tried to
    # clear it) in the gate line so a polluted record is visible in
    # PROGRESS.jsonl without opening BENCH_DETAIL.json. Informational,
    # not a gate condition — host noise is not a code regression.
    bench_canary_flagged = None
    bench_canary_retries = None
    try:
        with open(os.path.join(REPO, "BENCH_DETAIL.json")) as fh:
            c = json.load(fh).get("canary", {})
        bench_canary_flagged = c.get("flagged")
        bench_canary_retries = c.get("retries")
    except (OSError, ValueError):
        pass
    print(f"bench canary: flagged={bench_canary_flagged} "
          f"retries={bench_canary_retries}")

    record = {
        "ts": time.time(),
        "gate": "round_exit",
        "sf": args.sf,
        "bench_canary_flagged": bench_canary_flagged,
        "bench_canary_retries": bench_canary_retries,
        "oracle_pass": o_pass,
        "oracle_fail": o_fail,
        "oracle_rows_only": o_skip,
        "oracle_failed_names": o_failed_names,
        "sweep_n_names": sweep["n_names"],
        "sweep_pass": sweep["pass"],
        "sweep_fail": sweep["fail"],
        "sweep_rows_only": sweep["rows_only"],
        "sweep_missing": sweep["missing"],
        "sweep_failed_names": sweep["failed_names"],
        "plans_rows": len(plan_rows),
        "plans_missing": plans_missing,
        "plans_regen_rc": plans_regen_rc,
        "pytest_passed": t_pass,
        "pytest_failed": t_fail,
        "pytest_failed_names": failed_names,
        "pytest_rc": pytest.returncode,
        "gate_wall_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(REPO, "PROGRESS.jsonl"), "a") as fh:
        fh.write(json.dumps(record) + "\n")
    print(json.dumps(record))
    ok = (o_fail == 0 and t_fail == 0 and pytest.returncode == 0
          and not plans_missing
          and plans_regen_rc in (None, 0)
          and sweep["fail"] == 0 and not sweep["missing"])
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
