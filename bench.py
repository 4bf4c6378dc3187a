"""Benchmark harness: EVERY registered query at $SPARK_GRAFT_SF_DIR.

Prints exactly TWO JSON lines on stdout:

1. the FULL record —
       {"metric": "total_wall_sec", "value": N, "unit": "sec",
        "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1,
        "repeat": 3}
2. a COMPACT summary (guaranteed < 2000 chars, same top-level schema —
   "metric"/"value"/"unit"/"sf"/"repeat" — with "queries" holding only
   the top-20 slowest, plus "n_queries", "n_errors", and a
   "full_record" pointer to BENCH_local_latest.json) —
   printed LAST because the round driver records only the final ~2000
   chars of stdout: a 131-query full line is ~4 KB, so its head is
   lost to tail truncation (BENCH_r04/r05 "parsed": null). With the
   compact line last, the recorded tail always ENDS with one complete
   parseable JSON object. `tools/bench_compare.py` accepts both
   shapes and prefers the full record when present.

Everything else (Spark logs, progress) goes to stderr so the driver's
stdout parse stays clean.

Methodology:
- one shared SparkSession on local[$SPARK_GRAFT_CPUS];
- each query materializes fully through the JVM-side "noop" writer
  (no driver collect — measures the distributed plan, not Arrow
  transfer to pandas);
- a warm-up query runs first (JIT/codegen/parquet footer caches) and
  is excluded from timings;
- per-query wall time is the MIN OF THREE timed runs (``--repeat`` /
  $SPARK_GRAFT_BENCH_REPEAT to override). Round 5 adjudicated bench
  noise manually: single-run timings on this co-tenant host
  over-report 3-5 queries per sweep by 2-4x, and every apparent >2x
  regression vanished under min-of-three — so min-of-three IS the
  round protocol now, recorded in the output as "repeat". NOTE:
  rounds benched before round 4 used single-run timing and rounds
  4-5 min-of-two, so cross-round deltas at each changeover include
  the methodology shift, not only plan changes.
- round 12 on, the repeats are INTERLEAVED (VERDICT r11 task 3): pass
  1 runs every query once, then pass 2, then pass 3, and the per-query
  min is taken ACROSS passes. Back-to-back repeats let a multi-minute
  host slow phase swallow all three runs of the queries it overlapped
  (r11's three slow-phase adjudications shared exactly that cause); a
  phase shorter than one full pass (~1-2 min at sf0.1) now inflates at
  most one of a query's three samples, so the min survives it. The
  per-pass wall totals are recorded as "pass_totals" — a loaded pass
  shows up as one outlier total, quiet/loaded A/B evidence inside the
  record itself.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import re
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Round 4 on: bench EVERY registered query, unconditionally (r3 covered
# only 46 of 103, leaving half the surface without regression-visible
# timing — VERDICT r3 item 2). Sorted by name so per-query rows are
# comparable across rounds regardless of registry iteration order
# (which is tuned for the driver's correctness window, see
# plans/__init__.py).

# The driver's artifact keeps the last ~2000 stdout chars; leave margin
# for the trailing newline and any stray control chars.
_COMPACT_BUDGET = 1900
_COMPACT_TOP_N = 20


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def _host_snapshot() -> dict:
    """Host-load marker (VERDICT r10 task 3): this co-tenant rig's
    whole-run rate moves ~1.3x with machine load, and the r10 driver
    record could only be adjudicated against the same-code preflight
    via git archeology. Recording /proc/loadavg and memory-in-use at
    both ends of the run makes every BENCH record carry its own
    context. Linux-only; degrades to {} elsewhere."""
    snap: dict = {}
    try:
        with open("/proc/loadavg") as fh:
            snap["loadavg"] = [float(x) for x in fh.read().split()[:3]]
    except (OSError, ValueError):
        pass
    try:
        mem = {}
        with open("/proc/meminfo") as fh:
            for line in fh:
                key, _, rest = line.partition(":")
                mem[key] = int(rest.split()[0])  # kB
        snap["mem_used_gib"] = round(
            (mem["MemTotal"] - mem["MemAvailable"]) / 1048576, 2
        )
    except (OSError, KeyError, ValueError, IndexError):
        pass
    return snap


def _canary_names(timings: dict[str, float]) -> list[str]:
    """Pick 3 deterministic canaries spanning the cost range (p10 /
    p50 / p90 by main-loop time, preferring queries above the 0.5 s
    noise floor) for the end-of-run drift re-time."""
    eligible = sorted(
        (t, n) for n, t in timings.items() if t >= 0.5
    ) or sorted((t, n) for n, t in timings.items())
    if not eligible:
        return []
    picks = {
        eligible[int(p * (len(eligible) - 1))][1] for p in (0.1, 0.5, 0.9)
    }
    return sorted(picks)


def _compact_summary(result: dict) -> dict:
    """Derive the < 2000-char trailing summary from the full record.

    Same top-level schema as the full record (a consumer parsing either
    line finds "metric"/"value"/"queries"/"sf"), but "queries" holds
    only the TOP-N SLOWEST — the diagnostic end of the distribution —
    and "n_queries" says how many the full record (committed to
    BENCH_local_latest.json) actually holds. Top-N is shrunk further in
    the unlikely event the line would still exceed the budget.
    """
    slowest = sorted(result["queries"].items(), key=lambda kv: (-kv[1], kv[0]))
    top_n = _COMPACT_TOP_N
    while True:
        compact = {
            "metric": result["metric"],
            "value": result["value"],
            "unit": result["unit"],
            "sf": result["sf"],
            "repeat": result["repeat"],
            "n_queries": len(result["queries"]),
            "n_errors": len(result.get("errors", {})),
            # the drift marker and end-of-run load must survive driver
            # tail truncation — they ride the compact line too
            "canary_drift": result.get("canary", {}).get("drift"),
            "load1_end": (
                result.get("host", {}).get("end", {}).get("loadavg") or [None]
            )[0],
            "queries": dict(slowest[:top_n]),
            "full_record": "BENCH_local_latest.json",
        }
        if (
            len(json.dumps(compact, separators=(",", ":"))) <= _COMPACT_BUDGET
            or top_n == 0  # queries-free floor: nothing left to shrink
        ):
            return compact
        top_n = max(0, top_n - 1)  # pragma: no cover — 20 sit far under budget


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--repeat",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3")),
        help="timed runs per query; the MIN is reported (default 3)",
    )
    args = ap.parse_args()
    repeat = max(1, args.repeat)

    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry
    from new_kafka_consumer_to_hadoop_hdfs_spark.session import get_spark

    spark = get_spark(app_name="nkch-bench", cpus=CPUS, shuffle_partitions=CPUS)
    queries, _ = merged_registry()
    names = sorted(queries)
    print(
        f"bench: {len(names)} queries at {SF_DIR}, min of {repeat} runs",
        file=sys.stderr,
    )

    def materialize(name: str) -> float:
        # time plan construction + execution: iterative queries (e.g.
        # connected components) run Spark jobs during construction
        t0 = time.perf_counter()
        df = queries[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Warm-up: run the first query once, discard the timing.
    if names:
        try:
            materialize(names[0])
        except Exception as exc:  # noqa: BLE001 — the timed loop reports it
            print(f"bench: warm-up failed: {exc}", file=sys.stderr)

    # ``repeat`` timed runs per query with the min reported —
    # steady-state timing that damps JIT/page-cache/GC noise so
    # cross-round comparisons reflect plan changes, not scheduler
    # jitter. The runs are INTERLEAVED as full passes over the whole
    # query list (pass 1 of everything, then pass 2, …): a host slow
    # phase shorter than one pass can inflate at most ONE of a query's
    # samples, so the cross-pass min survives it — back-to-back
    # repeats handed all three samples to the same phase. A query that
    # errors is recorded under "errors" instead of killing the whole
    # bench (round 2 lost its entire bench to one load failure).
    host_start = _host_snapshot()
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    pass_totals: list[float] = []
    for pass_i in range(repeat):
        pass_t0 = time.perf_counter()
        for name in names:
            if name in errors:
                continue
            try:
                sec = materialize(name)
            except Exception as exc:  # noqa: BLE001 — survive to report
                errors[name] = f"{type(exc).__name__}: {exc}"[:200]
                timings.pop(name, None)  # a partial timing proves nothing
                print(f"bench: {name} ERROR {errors[name]}", file=sys.stderr)
                continue
            if name not in timings or sec < timings[name]:
                timings[name] = round(sec, 4)
        pass_totals.append(round(time.perf_counter() - pass_t0, 3))
        print(
            f"bench: pass {pass_i + 1}/{repeat} wall {pass_totals[-1]:.1f}s",
            file=sys.stderr,
        )
    for name, sec in sorted(timings.items()):
        print(f"bench: {name} {sec:.3f}s", file=sys.stderr)

    # End-of-run CANARY (VERDICT r10 task 3): re-time 3 queries that
    # already ran in the main loop. drift = Σend / Σmain. A sustained
    # load arriving MID-run inflates the tail relative to the head and
    # shows as drift > 1; a genuine code regression re-times the same
    # (drift ≈ 1) — so bench_compare can tell "the host slowed during
    # this run" apart from "the code got slower" without git archeology.
    canary: dict[str, dict[str, float]] = {}
    for name in _canary_names(timings):
        try:
            sec = min(materialize(name) for _ in range(repeat))
        except Exception as exc:  # noqa: BLE001 — the marker is best-effort
            print(f"bench: canary {name} ERROR {exc}", file=sys.stderr)
            continue
        canary[name] = {"main": timings[name], "end": round(sec, 3)}
        print(f"bench: canary {name} {timings[name]:.3f}s -> {sec:.3f}s",
              file=sys.stderr)
    canary_drift = (
        round(
            sum(c["end"] for c in canary.values())
            / max(sum(c["main"] for c in canary.values()), 1e-9),
            3,
        )
        if canary
        else None
    )
    host_end = _host_snapshot()

    # Per-query entries ordered FASTEST-FIRST so if a consumer tails the
    # FULL line, the slowest — most diagnostic — queries still land at
    # the end; the full result is also persisted to a committed file
    # (BENCH_local_latest.json) as the canonical record, and the compact
    # line below is the driver-tail-proof contract.
    timings = {n: round(t, 3) for n, t in sorted(timings.items(), key=lambda kv: (kv[1], kv[0]))}
    result = {
        "metric": "total_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
        "repeat": repeat,
        "interleaved": True,
        "pass_totals": pass_totals,
        "host": {"start": host_start, "end": host_end},
        "canary": {"queries": canary, "drift": canary_drift},
    }
    if errors:
        result["errors"] = errors
    local_record = pathlib.Path(__file__).resolve().parent / "BENCH_local_latest.json"
    try:
        local_record.write_text(json.dumps(result, indent=1, sort_keys=True) + "\n")
    except OSError as exc:  # stdout lines are still the contract
        print(f"bench: could not write {local_record}: {exc}", file=sys.stderr)
    print(json.dumps(result, separators=(",", ":")), flush=True)
    # Compact summary LAST: the driver's 2000-char stdout tail must end
    # with one complete parseable JSON object (VERDICT r5 item 1).
    print(json.dumps(_compact_summary(result), separators=(",", ":")), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
