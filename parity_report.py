"""Self-reported oracle-parity artifact.

Runs EVERY registered query against its DuckDB oracle at sf0.001 and
sf0.01 and writes ``ORACLE_PARITY.json`` — a complete machine-readable
correctness record that does not depend on the external driver's
correctness-snapshot size.  Queries without an oracle get a rows-only
entry (row count at each SF) so the artifact still enumerates the full
contract.

Usage::

    python parity_report.py            # sf0.001 + sf0.01
    python parity_report.py sf0.001    # single SF (faster)
    python parity_report.py --only q1,q2   # run just q1,q2 and MERGE
                                           # their rows into the artifact

`--only` is the incremental path for adding queries mid-round: the
named queries are executed for real at every SF already present in the
artifact and their entries merged in (summary recomputed against the
live registry).  The full sweep remains the round-end gate.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
DEFAULT_SFS = ["sf0.001", "sf0.01"]


def _norm(v):
    if v is None:
        return None
    if hasattr(v, "item"):  # numpy scalar -> native (stable repr sort key)
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9) + 0.0
    return v


def _connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def compare_one(spark, con, fn, sql) -> dict:
    """Driver-like compare: row count, column-name set, order-insensitive
    multiset of rows with floats rounded to 9 places."""
    out: dict = {"rows_match": False, "schema_match": False,
                 "hash_match": False, "err": None}
    try:
        sdf = fn(spark)
        scols = sorted(sdf.columns)
        srows = sdf.collect()
        odf = con.execute(sql).fetchdf()
        ocols = sorted(odf.columns)
        orows = odf.where(odf.notna(), None).to_dict("records")
        out["spark_rows"] = len(srows)
        out["oracle_rows"] = len(orows)
        out["rows_match"] = len(srows) == len(orows)
        out["schema_match"] = scols == ocols
        if out["rows_match"] and out["schema_match"]:
            # key=repr: tuples mixing None with values aren't orderable
            skey = sorted(
                (tuple(_norm(r[c]) for c in scols) for r in srows), key=repr
            )
            okey = sorted(
                (tuple(_norm(None if isinstance(r[c], float) and math.isnan(r[c]) else r[c])
                       for c in ocols)
                 for r in orows),
                key=repr,
            )
            out["hash_match"] = skey == okey
    except Exception as e:  # record, don't abort the sweep
        out["err"] = f"{type(e).__name__}: {e}"[:500]
    return out


def main(sfs: list[str], only: list[str] | None = None) -> int:
    repo = os.path.dirname(os.path.abspath(__file__))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    from oxford_data_pipeline_spark.plans import ORACLES, QUERIES
    from oxford_data_pipeline_spark.session import get_spark

    spark = get_spark("parity-report")
    artifact_path = os.path.join(repo, "ORACLE_PARITY.json")
    if only is not None:
        prior = json.load(open(artifact_path))
        sfs = list(prior["sfs"])
        missing = [n for n in only if n not in QUERIES]
        assert not missing, f"--only names unknown queries: {missing}"
    report: dict = {"generated_unix": int(time.time()), "sfs": {}}
    failures = 0
    for sf in sfs:
        sf_dir = os.path.join(TESTDATA, sf)
        con = _connect(sf_dir)
        entries: dict = {}
        todo = (
            QUERIES.items()
            if only is None
            else [(n, QUERIES[n]) for n in only]
        )
        for name, fn in todo:
            t0 = time.time()
            if name in ORACLES:
                res = compare_one(spark, con, lambda s, f=fn: f(s, sf_dir),
                                  ORACLES[name])
                ok = res["rows_match"] and res["schema_match"] and res["hash_match"]
            else:
                try:
                    res = {"spark_rows": fn(spark, sf_dir).count(),
                           "rows_only": True, "err": None}
                    ok = True
                except Exception as e:
                    res = {"rows_only": True, "err": f"{type(e).__name__}: {e}"[:500]}
                    ok = False
            res["sec"] = round(time.time() - t0, 2)
            entries[name] = res
            failures += 0 if ok else 1
            print(f"[{sf}] {name}: {'ok' if ok else 'FAIL'} ({res['sec']}s)",
                  flush=True)
        con.close()
        report["sfs"][sf] = entries
    if only is not None:
        # merge the fresh rows into the prior artifact; recount failures
        # over the merged record so a stale green can't mask one
        for sf in sfs:
            prior["sfs"][sf].update(report["sfs"][sf])
            # drop rows for queries no longer in the registry
            for gone in [n for n in prior["sfs"][sf] if n not in QUERIES]:
                del prior["sfs"][sf][gone]
        prior["generated_unix"] = report["generated_unix"]
        report = prior
        failures = sum(
            0 if (e.get("rows_only") and e.get("err") is None)
            or (e.get("rows_match") and e.get("schema_match")
                and e.get("hash_match"))
            else 1
            for sf in report["sfs"]
            for e in report["sfs"][sf].values()
        )
    n_oracle = len([n for n in QUERIES if n in ORACLES])
    report["summary"] = {
        "queries": len(QUERIES), "with_oracle": n_oracle, "failures": failures,
    }
    with open(artifact_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote ORACLE_PARITY.json: {report['summary']['queries']} queries "
          f"× {len(sfs)} SFs, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "--only":
        sys.exit(main([], only=args[1].split(",")))
    sys.exit(main(args or DEFAULT_SFS))
