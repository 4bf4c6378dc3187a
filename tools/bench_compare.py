"""Compare two bench result files query-by-query.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--threshold 1.25]

Accepts any of: bench.py's full-record JSON ({"metric": ...,
"queries": {...}} — the committed BENCH_local_*.json shape), bench.py's
raw stdout (full line + trailing compact summary line, round 6 on), or
the driver's BENCH_r{N}.json wrapper (timings are then recovered from
its truncated "tail" field: the complete full line if it survived,
else the trailing compact summary merged with the surviving pairs of
the truncated full line). Prints regressions (new/old ≥ threshold),
improvements (old/new ≥ threshold), and coverage changes, then exits 1
if any regression crossed the threshold — usable as a cheap per-round
perf gate.
"""

from __future__ import annotations

import argparse
import json
import re
import sys


# Keys that appear as "name": number in the bench JSON but are not
# query timings; excluded when reconstructing from a truncated tail.
# (main/end/drift/mem_used_gib/canary_drift/load1_end: the round-11
# host-load + canary self-adjudication fields.)
_NON_QUERY_KEYS = {
    "value", "sf", "repeat", "n_queries", "n_errors",
    "main", "end", "drift", "mem_used_gib", "canary_drift", "load1_end",
}


def _timings_from_tail(tail: str, path: str) -> tuple[dict[str, float], dict]:
    """Recover per-query timings (+ canary/host meta) from a (possibly
    truncated) stdout tail."""
    full: dict[str, float] = {}
    compact: dict[str, float] = {}
    meta: dict = {}
    for line in tail.splitlines():
        at = line.find('{"metric"')
        if at < 0:
            continue
        try:
            obj = json.loads(line[at:])
        except ValueError:  # head-truncated line; pairs pass picks it up
            continue
        q = {k: float(v) for k, v in obj.get("queries", {}).items()}
        meta.update(_meta_from_record(obj))
        if "n_queries" in obj:  # the trailing compact summary (round 6 on)
            compact = q
        else:
            full = q
    if full:
        return full, meta
    # The driver keeps only the last ~2000 chars of stdout, so a
    # 131-query full line loses its head. Reconstruct the surviving
    # "name": seconds pairs from the fragment, overlaying the compact
    # summary's (complete, authoritative) slowest-N — partial but
    # honest; report how partial.
    pairs = re.findall(r'"([A-Za-z0-9_]+)":\s*([0-9]+(?:\.[0-9]+)?)', tail)
    timings = {k: float(v) for k, v in pairs if k not in _NON_QUERY_KEYS}
    timings.update(compact)
    if not timings:
        raise SystemExit(f"{path}: no bench JSON found (empty/crashed run?)")
    print(
        f"note: {path} is a truncated driver tail — reconstructed "
        f"{len(timings)} per-query timings from the fragment"
        + (f" + compact summary ({len(compact)})" if compact else ""),
        file=sys.stderr,
    )
    return timings, meta


def _meta_from_record(obj: dict) -> dict:
    """Pull the canary drift + host-load markers out of a full or
    compact bench record (round 11 on; absent from older records)."""
    meta: dict = {}
    drift = obj.get("canary", {}).get("drift", obj.get("canary_drift"))
    if isinstance(drift, (int, float)):
        meta["canary_drift"] = float(drift)
    host = obj.get("host")
    if isinstance(host, dict):
        meta["host"] = host
    elif isinstance(obj.get("load1_end"), (int, float)):
        meta["host"] = {"end": {"loadavg": [obj["load1_end"]]}}
    return meta


def load_record(path: str) -> tuple[dict[str, float], dict]:
    """Return (per-query timings, meta) — meta carries "canary_drift"
    and "host" when the record has them (round 11 on)."""
    with open(path) as fh:
        text = fh.read()
    try:
        data = json.loads(text)
    except ValueError:
        # raw bench stdout: full line + compact summary line
        return _timings_from_tail(text, path)
    if "queries" in data:
        return data["queries"], _meta_from_record(data)
    # driver wrapper: bench stdout lives (truncated) in "tail"
    return _timings_from_tail(data.get("tail", ""), path)


def load_timings(path: str) -> dict[str, float]:
    return load_record(path)[0]


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("old")
    p.add_argument("new")
    p.add_argument(
        "--threshold",
        type=float,
        default=1.25,
        help="ratio that counts as a regression/improvement (default 1.25)",
    )
    p.add_argument(
        "--min-sec",
        type=float,
        default=0.5,
        help="ignore ratio noise below this absolute time (default 0.5s)",
    )
    # Why 0.5: this rig's FIXED-LATENCY FLOOR for a trivial query
    # (single-file parquet scan + filter, zero shuffle) is itself
    # host-phase-dependent — measured round 9: pipeline_weighted_sample
    # at 0.11-0.13 s in one phase and 0.25-0.45 s hours later on the
    # SAME boot, identical plan fingerprint, reproduced standalone in
    # fresh sessions and immune to in-session interference (A/B'd).
    # Sub-floor timings are therefore ratio noise by construction: a
    # 0.2 s min-sec let a 0.13→0.40 s floor move present as a
    # "reproduced 3x regression" and fail a preflight whose whole-run
    # ratio was 0.91x. Real per-query protection below 0.5 s comes
    # from the plan-fingerprint gate (exact, not statistical); broad
    # regressions still trip the whole-run threshold above.
    args = p.parse_args(argv)

    (old, meta_old), (new, meta_new) = load_record(args.old), load_record(args.new)
    common = sorted(set(old) & set(new))
    t_old = sum(old[n] for n in common)
    t_new = sum(new[n] for n in common)
    total_ratio = (t_new / t_old) if common and t_old > 0 else 1.0
    print(
        f"common {len(common)} queries: {t_old:.1f}s -> {t_new:.1f}s "
        f"({total_ratio:.2f}x)" if common else "no common queries"
    )
    for label, meta in (("old", meta_old), ("new", meta_new)):
        if meta:
            load1 = (meta.get("host", {}).get("end", {}).get("loadavg") or [None])[0]
            print(
                f"  {label}: canary_drift={meta.get('canary_drift')}"
                + (f" load1_end={load1}" if load1 is not None else "")
            )

    # Canary-drift allowance (round 11): the NEW record's end-of-run
    # canary re-time measures how much the host slowed DURING that run
    # (a code regression re-times the same, drift ≈ 1 — see bench.py).
    # A measured drift > 1 widens both the whole-run gate and the
    # per-query normalizer cap: that inflation is adjudicated host
    # movement, not code. Capped at 2.0 so a pathological canary can't
    # excuse everything; drift < 1 (host sped up late) grants nothing.
    drift_allow = min(max(meta_new.get("canary_drift", 1.0), 1.0), 2.0)

    # Host-rate normalization: identical code measures 1.0-1.3x apart
    # across VM boots, and the inflation is UNIFORM across queries
    # (memory/SCALE.md "noise floor moves WHOLE-RUN"). Dividing each
    # per-query ratio by the whole-run ratio isolates the IDIOSYNCRATIC
    # movement — what a plan change actually looks like — so a slow
    # boot doesn't spray false 2x flags over sub-second queries.
    # Bounded at the OBSERVED 1.3x boot-to-boot band either way (ADVICE
    # r8: a 1.5 cap would excuse raw per-query regressions up to 3x
    # behind a 1.5x whole-run drift this host has never shown; at 1.3
    # the worst excusable raw ratio is threshold·1.3 ≈ 2.6x). A BROAD
    # real regression still can't hide behind its own normalizer: a
    # whole-run ratio at/over the threshold fails outright.
    norm = min(max(total_ratio, 1 / 1.3), max(1.3, drift_allow))

    regressions = []
    if common and total_ratio / drift_allow >= args.threshold:
        regressions.append("__total__")
        print(
            f"  REGRESS  whole-run: {t_old:.1f}s -> {t_new:.1f}s "
            f"({total_ratio:.2f}x raw, {total_ratio / drift_allow:.2f}x after "
            f"canary drift {drift_allow:.2f} >= {args.threshold}x) — broad "
            "regression, not host drift"
        )
    for n in common:
        raw_slow = new[n] / max(old[n], 1e-9)
        raw_fast = old[n] / max(new[n], 1e-9)
        slow = new[n] >= args.min_sec and raw_slow / norm >= args.threshold
        fast = old[n] >= args.min_sec and raw_fast * norm >= args.threshold
        if slow:
            regressions.append(n)
            print(
                f"  REGRESS  {n}: {old[n]:.2f}s -> {new[n]:.2f}s "
                f"({raw_slow:.2f}x raw, {raw_slow / norm:.2f}x vs host rate)"
            )
        elif fast:
            print(f"  improve  {n}: {old[n]:.2f}s -> {new[n]:.2f}s")

    added, removed = sorted(set(new) - set(old)), sorted(set(old) - set(new))
    if added:
        print(f"newly benched ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"no longer benched ({len(removed)}): {', '.join(removed)}")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
