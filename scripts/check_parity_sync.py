"""Fast (no-Spark) staleness guard for ORACLE_PARITY.json.

The round-3 and round-4 verdicts both flagged the same failure mode:
a query lands in the registry without its row in the self-reported
parity artifact, turning the suite red via
tests/test_oracle_parity.py::test_oracle_parity_artifact_in_sync.
This script is the pre-commit form of that test — it imports the
registry (no SparkSession is started) and compares names/counts, so a
commit touching the plans package cannot ship a stale artifact.

Wire-up (done by scripts/install_hooks.sh):
    .git/hooks/pre-commit runs this when plans/ or __spark_entry__.py
    is staged.  On failure: run `python parity_report.py`, commit the
    regenerated ORACLE_PARITY.json alongside the plan change.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from oxford_data_pipeline_spark.plans import ORACLES, QUERIES

    path = os.path.join(repo, "ORACLE_PARITY.json")
    if not os.path.exists(path):
        print("ORACLE_PARITY.json missing — run: python parity_report.py")
        return 1
    report = json.load(open(path))
    problems = []
    if report["summary"]["queries"] != len(QUERIES):
        problems.append(
            f"artifact has {report['summary']['queries']} queries, "
            f"registry has {len(QUERIES)}"
        )
    if report["summary"]["with_oracle"] != len(ORACLES):
        problems.append(
            f"artifact has {report['summary']['with_oracle']} oracles, "
            f"registry has {len(ORACLES)}"
        )
    if report["summary"]["failures"]:
        problems.append(f"artifact records {report['summary']['failures']} failures")
    for sf, entries in report.get("sfs", {}).items():
        missing = sorted(set(QUERIES) - set(entries))
        extra = sorted(set(entries) - set(QUERIES))
        if missing:
            problems.append(f"{sf}: missing {missing}")
        if extra:
            problems.append(f"{sf}: stale entries {extra}")
    if problems:
        print("ORACLE_PARITY.json is stale:")
        for p in problems:
            print(" -", p)
        print("regenerate with: python parity_report.py   (then git add it)")
        return 1
    print(f"parity artifact in sync: {len(QUERIES)} queries / {len(ORACLES)} oracles")
    return 0


if __name__ == "__main__":
    sys.exit(main())
