"""Physical-plan fingerprint gate: hash every registered query's plan
and diff against the committed snapshot.

    python tools/plan_fingerprints.py            # check vs committed file
    python tools/plan_fingerprints.py --write    # regenerate the snapshot

Bench TOTALS on this host move ~1.3x between VM boots with zero source
change (memory: bench-noise-host-variance), so "is this a regression or
noise?" used to need manual git archaeology over the query's plan code
(round 6 adjudicated pii_scrub/outlier_filter that way). This tool
turns the "diff plans, not totals" policy into an automated signal: the
NORMALIZED `explain(formatted)` text of each registered query is
hashed into `tools/plan_fingerprints.json`; preflight fails when a
query's plan hash moves without the snapshot being regenerated (i.e. an
unexplained plan change), and bench deltas on queries whose plan hash
is UNCHANGED can be attributed to host noise without archaeology.

Normalization strips the session-dependent parts of the explain text —
expression/plan ids, checkpointed-RDD names, scan paths, in-memory
relation serializer noise — keeping operator tree shape, join
strategies, pushed filters, and partitioning, which is exactly the
plan surface the round reviews audit.

Plan construction is NOT free for every query: index-building queries
(IVF/PQ/curriculum offsets) run their bounded driver-side collects
while the DataFrame is being built. That is still ~100x cheaper than
executing the queries; the whole check runs in about a minute.

The session recipe is pinned (local[16], shuffle=16, hostile timezone —
verify_all's recipe) because plan shape legitimately depends on session
conf; fingerprints are only comparable under the same recipe.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import pathlib
import re
import sys

_REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

SNAPSHOT = _REPO / "tools" / "plan_fingerprints.json"

_NORMALIZERS = [
    (re.compile(r"#\d+"), "#"),                      # expression ids
    (re.compile(r"plan_id=\d+"), "plan_id="),        # adaptive plan ids
    (re.compile(r"\[id=#?\d+\]"), "[id=]"),          # exchange/subquery ids
    (re.compile(r"cachedrdd-\d+", re.I), "cachedrdd-"),
    (re.compile(r"RDD\[\d+\]"), "RDD[]"),            # checkpointed RDD ids
    (re.compile(r"Scan ExistingRDD\[[^\]]*\]"), "Scan ExistingRDD[]"),
    (re.compile(r"file:[^\s,\])]*"), "<path>"),      # scan locations
    (re.compile(r"/root/testdata/[^\s,\])]*"), "<sf>"),
    (re.compile(r"/tmp/[^\s,\])]*"), "<tmp>"),       # sink roundtrip dirs
    (re.compile(r"Statistics\([^)]*\)"), "Statistics()"),
    (re.compile(r"python_udf_\d+"), "python_udf_"),
    (re.compile(r"<lambda>[A-Za-z0-9_]*"), "<lambda>"),
]


def _normalize(plan: str) -> str:
    for rx, repl in _NORMALIZERS:
        plan = rx.sub(repl, plan)
    keep = []
    for ln in plan.splitlines():
        # drop purely informational lines that churn across sessions
        if re.match(r"\s*(Location:|CollectLimit )", ln):
            continue
        # Catalyst's RewriteDistinctAggregates (multi count-distinct →
        # Expand, marked by the gid column) orders the distinct groups
        # from a hash collection — column order in those lines varies
        # per JVM with identical semantics, so canonicalize them as a
        # sorted token multiset instead of text.
        if "gid#" in ln:
            ln = " ".join(sorted(re.split(r"[\s,\[\]()]+", ln)))
        keep.append(ln)
    return "\n".join(keep)


def current_fingerprints(sf_dir: str) -> dict[str, str]:
    from pyspark.sql import SparkSession

    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = merged_registry()
    prints: dict[str, str] = {}
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(  # noqa: SLF001
        "formatted"
    )
    # SETTLE PASS: constructing a query can rebuild on-disk artifacts
    # (bucketed warehouse tables, .bench_cache materializations) whose
    # freshness changes LATER queries' plans via cache/catalog state —
    # a run started right after bench/sweep activity would otherwise
    # fingerprint the mid-rebuild state and flap against a run started
    # from settled state. Build everything once, discard the plans,
    # then fingerprint the second pass.
    for name in sorted(queries):
        try:
            queries[name](spark, sf_dir)
        except Exception:  # noqa: BLE001,S110 — pass 2 reports it
            pass
    for name in sorted(queries):
        try:
            df = queries[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)  # noqa: SLF001
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            prints[name] = f"ERROR:{type(exc).__name__}"
            print(f"fingerprint: {name} ERROR {exc}", file=sys.stderr)
            continue
        norm = _normalize(plan)
        # FP_DUMP=<query>: write that query's normalized text to /tmp
        # so two runs can be diffed when a fingerprint flaps (this is
        # how the gid# nondeterminism above was diagnosed)
        if os.environ.get("FP_DUMP") == name:
            pathlib.Path(f"/tmp/fp_{os.getpid()}.txt").write_text(norm)
        prints[name] = hashlib.sha256(norm.encode("utf-8")).hexdigest()[:16]
    spark.stop()
    return prints


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--write", action="store_true",
                    help="regenerate the committed snapshot")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    now = current_fingerprints(args.sf_dir)
    if args.write:
        SNAPSHOT.write_text(json.dumps(now, indent=1, sort_keys=True) + "\n")
        print(f"fingerprints: wrote {len(now)} to {SNAPSHOT}")
        return 0

    if not SNAPSHOT.exists():
        print(f"fingerprints: no snapshot at {SNAPSHOT} — run with --write")
        return 1
    old = json.loads(SNAPSHOT.read_text())
    changed = sorted(n for n in now if n in old and now[n] != old[n])
    added = sorted(n for n in now if n not in old)
    removed = sorted(n for n in old if n not in now)
    for n in changed:
        print(f"fingerprints: CHANGED {n}")
    for n in added:
        print(f"fingerprints: NEW {n} (not in snapshot)")
    for n in removed:
        print(f"fingerprints: REMOVED {n} (still in snapshot)")
    if changed or added or removed:
        print(
            f"fingerprints: {len(changed)} changed / {len(added)} new / "
            f"{len(removed)} removed — if intentional, rerun with --write "
            "and commit the snapshot; if not, the plan regressed."
        )
        return 1
    print(f"fingerprints: all {len(now)} plans match the snapshot")
    return 0


if __name__ == "__main__":
    sys.exit(main())
