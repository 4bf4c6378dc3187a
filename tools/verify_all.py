"""Full driver-style verification sweep: every registered query vs its
DuckDB oracle at the driver's correctness SF, from THIS process.

This is the same comparison the round driver runs (row count + schema +
order-insensitive canonical values, tests/_diff.py), but over ALL
queries instead of the driver's 50-entry window — run it before ending
a round to know the whole registry is green, not just the window:

    python tools/verify_all.py                 # sf0.01, hostile tz
    python tools/verify_all.py --sf-dir /root/testdata/sf0.001

The session is deliberately HOSTILE (non-UTC timezone, small
parallelism): query builders must not rely on session state —
`apply_runtime_conf` inside each registered wrapper has to do the work,
exactly as under the driver's session.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

_REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tests"))


def classify(name: str, spdf, oracle_pdf, compare) -> tuple[str, bool, bool]:
    """Classify one executed query result the way the sweep reports it:
    returns (line, counts_as_bad, is_vacuous). Pure — extracted from the
    sweep loop so the VACUOUS gate that caught round 7's
    join_bloom_prefilter bug is itself regression-tested
    (tests/test_tools.py, VERDICT r8 task 7). ``oracle_pdf`` is None
    for rows-only queries."""
    if oracle_pdf is not None:
        problems = compare(name, spdf, oracle_pdf)
        if problems:
            return (f"MISMATCH  {name}: {problems}", True, False)
        if len(spdf) == 0:
            # A 0=0 hash match gates nothing — the query could be
            # arbitrarily wrong and still "pass" (this is how the
            # round-7 join_bloom_prefilter GERMANY bug hid). Counted
            # as bad: an oracle-gated query must be non-empty at the
            # sweep SF or its oracle is theater.
            return (f"VACUOUS   {name}: oracle gate matches on 0 rows", True, True)
        return (f"OK        {name}", False, False)
    if len(spdf) == 0:
        # same vacuity rule for rows-only queries: an empty result
        # proves nothing ran — and the rows-only check is already
        # the weak form, so an empty one is no check at all
        return (f"VACUOUS   {name}: rows-only check returned 0 rows", True, True)
    return (f"ROWS-ONLY {name} ({len(spdf)} rows)", False, False)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", help="comma-separated subset of query names")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from _diff import compare, run_oracle  # tests/_diff.py
    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    smoke = entrymod.entry(spark)
    assert smoke.count() >= 0, "entry() smoke failed"

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = sorted(args.only.split(",")) if args.only else sorted(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        # Clean failure up front (mirrors tools/explain_query.py) instead
        # of a bare KeyError mid-sweep (ADVICE r5).
        print(f"unknown queries: {', '.join(unknown)}", file=sys.stderr)
        return 2
    bad = 0
    vacuous = 0
    for name in names:
        try:
            spdf = qs[name](spark, args.sf_dir).toPandas()
        except Exception as exc:  # sweep survives individual failures
            print(f"ERROR     {name}: {str(exc)[:160]}")
            bad += 1
            continue
        oracle_pdf = None
        if name in oracles:
            try:
                oracle_pdf = run_oracle(oracles[name], args.sf_dir)
            except Exception as exc:  # a broken oracle must not kill the sweep
                print(f"ORACLE-ERROR {name}: {str(exc)[:160]}")
                bad += 1
                continue
        line, is_bad, is_vacuous = classify(name, spdf, oracle_pdf, compare)
        print(line)
        bad += is_bad
        vacuous += is_vacuous
    print(f"DONE bad={bad} (vacuous={vacuous}) total={len(names)}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
