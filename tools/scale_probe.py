"""Empirical scaling probe: run headline queries at several scale
factors and fit the log-log growth slope.

The 100 TB argument in SCALE.md is structural (shuffle inventories,
broadcast bounds); this tool adds the measured counterpart on the SFs
available locally: a query whose wall time grows with decade slope
~1.0 over sf0.001 -> sf0.01 -> sf0.1 is doing work linear in the data
(what a scan/bucket/partial-agg plan should do); slope well below 1
means fixed overhead still dominates at these sizes (the query is
cheaper than the harness); slope well above 1 flags superlinear work
that 100 TB would punish.

Usage:
    python tools/scale_probe.py [--queries q1,q2,...|all] [--runs 2]

Prints a markdown table and writes SCALING.json next to this repo's
bench records. The slope reported is log10(t_sf0.1 / t_sf0.01) — the
largest decade, where fixed overhead distorts least.

Round 11 on, the default probe set is ALL registered queries (VERDICT
r10 task 2: the curated list had grown family-by-family to 56 while
the event/sink/outer-join/pipeline families stayed invisible; at ~6-8
min for the full sweep there is no reason to sample). --queries still
takes an explicit comma list for cheap re-probes of noisy entries.
"""

from __future__ import annotations

import argparse
import json
import math
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]



def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--queries", default="all",
        help="comma list, or 'all' for every registered query (default)",
    )
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    if args.runs < 1:
        raise SystemExit("--runs must be >= 1")

    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry
    from new_kafka_consumer_to_hadoop_hdfs_spark.session import get_spark

    spark = get_spark(app_name="nkch-scale-probe", cpus=32, shuffle_partitions=32)
    queries, _ = merged_registry()
    if args.queries == "all":
        names = sorted(queries)
    else:
        names = [q for q in args.queries.split(",") if q]
    if not names:
        raise SystemExit("--queries resolved to an empty list")
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    def run_once(name: str, sf_dir: str) -> float:
        t0 = time.monotonic()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    # warm-up: JIT, codegen caches, parquet footers for every SF
    for sf in SF_DIRS:
        run_once(names[0], sf)

    results: dict[str, dict[str, float]] = {}
    for name in names:
        per_sf = {}
        for sf in SF_DIRS:
            per_sf[sf.rsplit("/", 1)[-1]] = min(
                run_once(name, sf) for _ in range(args.runs)
            )
        results[name] = per_sf
        print(f"probe {name}: {per_sf}", file=sys.stderr)

    rows = []
    for name, per_sf in results.items():
        t_small, t_mid, t_big = (
            per_sf["sf0.001"], per_sf["sf0.01"], per_sf["sf0.1"]
        )
        slope = math.log10(t_big / t_mid) if t_mid > 0 else float("nan")
        rows.append((name, t_small, t_mid, t_big, slope))

    # NaN slopes (degenerate zero timing) sort to the bottom,
    # deterministically
    rows.sort(key=lambda r: (math.isnan(r[4]), -(r[4] if not math.isnan(r[4]) else 0.0)))
    print("| query | sf0.001 s | sf0.01 s | sf0.1 s | decade slope |")
    print("|---|---|---|---|---|")
    for name, a, b, c, s in rows:
        print(f"| `{name}` | {a:.2f} | {b:.2f} | {c:.2f} | {s:+.2f} |")

    # MERGE into the existing record: a partial --queries re-probe
    # (e.g. re-measuring one noisy entry) must not discard the rest.
    out = pathlib.Path(__file__).resolve().parent.parent / "SCALING.json"
    merged_results: dict = {}
    merged_slopes: dict = {}
    merged_runs: dict = {}
    if out.exists():
        try:
            prev = json.loads(out.read_text())
            merged_results = prev.get("results", {})
            merged_slopes = prev.get("decade_slope_sf0.01_to_sf0.1", {})
            prev_runs = prev.get("runs", {})
            # legacy records carried one global runs int — attribute it
            # to the entries it actually measured
            merged_runs = (
                prev_runs
                if isinstance(prev_runs, dict)
                else {n: prev_runs for n in merged_results}
            )
        except (json.JSONDecodeError, OSError):
            pass
    merged_results.update(results)
    merged_slopes.update({r[0]: round(r[4], 3) for r in rows})
    merged_runs.update({n: args.runs for n in results})
    out.write_text(json.dumps(
        {"runs": merged_runs, "results": merged_results,
         "decade_slope_sf0.01_to_sf0.1": merged_slopes},
        indent=1, sort_keys=True,
    ))
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
