"""Dump the formatted physical plan of one or more registered queries.

The plan audits in SCALE.md/VERDICT reviews are reproducible with:

    python tools/explain_query.py q13_customer_distribution
    python tools/explain_query.py --all --grep Exchange
    python tools/explain_query.py join_bucketed_colocated --no-broadcast

``--no-broadcast`` disables autoBroadcastJoinThreshold first — the
"what does this plan look like when both sides are too big to
broadcast" view, which is the 100 TB-relevant shape for fact-fact
joins (AQE broadcasts small sides at fixture scale).

``--grep PATTERN`` prints only queries whose plan matches PATTERN and,
for each, only the matching lines plus the node-tree header — a quick
registry-wide audit ("which plans contain a CartesianProduct / a
rangepartitioning exchange / a Python worker?").
"""

from __future__ import annotations

import argparse
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SF_DIR_DEFAULT = "/root/testdata/sf0.001"


def _formatted_plan(spark, fn, sf_dir: str) -> str:
    df = fn(spark, sf_dir)
    jvm = spark._jvm  # noqa: SLF001
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)  # noqa: SLF001


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="registered query names")
    ap.add_argument("--all", action="store_true", help="every registered query")
    ap.add_argument("--sf-dir", default=SF_DIR_DEFAULT)
    ap.add_argument("--grep", help="only show plans matching this regex")
    ap.add_argument(
        "--no-broadcast",
        action="store_true",
        help="disable autoBroadcastJoinThreshold before planning",
    )
    args = ap.parse_args()

    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry
    from new_kafka_consumer_to_hadoop_hdfs_spark.session import get_spark

    queries, _ = merged_registry()
    names = list(queries) if args.all else args.names
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown} (see QUERIES.md)")
    if not names:
        raise SystemExit("pass query names or --all")

    spark = get_spark()
    if args.no_broadcast:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    rx = re.compile(args.grep) if args.grep else None
    for name in names:
        try:
            plan = _formatted_plan(spark, queries[name], args.sf_dir)
        except Exception as exc:  # keep sweeping under --all
            print(f"== {name}: PLAN FAILED: {exc}")
            continue
        if rx is None:
            print(f"== {name}\n{plan}")
        elif rx.search(plan):
            tree = plan.split("\n\n", 1)[0]
            hits = "\n".join(ln for ln in plan.splitlines() if rx.search(ln))
            print(f"== {name} (matches {args.grep!r})\n{tree}\n--\n{hits}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
