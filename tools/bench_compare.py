"""Compare two bench result files query-by-query.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--threshold 1.25]

Accepts either bench.py's raw one-line JSON ({"metric": ..., "queries":
{...}}) or the driver's BENCH_r{N}.json wrapper (the JSON line is then
extracted from its "tail" field). Prints regressions (new/old ≥
threshold), improvements (old/new ≥ threshold), and coverage changes,
then exits 1 if any regression crossed the threshold — usable as a
cheap per-round perf gate.
"""

from __future__ import annotations

import argparse
import json
import re
import sys


# Keys that appear as "name": number in the bench JSON but are not
# query timings; excluded when reconstructing from a truncated tail.
_NON_QUERY_KEYS = {"value", "sf"}


def load_timings(path: str) -> dict[str, float]:
    with open(path) as fh:
        data = json.load(fh)
    if "queries" in data:
        return data["queries"]
    # driver wrapper: the bench's single JSON line lives in "tail"
    tail = data.get("tail", "")
    m = re.search(r'\{"metric".*\}', tail)
    if m:
        return json.loads(m.group(0))["queries"]
    # The driver keeps only the last ~2000 chars of stdout, so a
    # 105-query line loses its head (BENCH_r04.json). Reconstruct the
    # surviving "name": seconds pairs from the fragment — partial but
    # honest; report how partial.
    pairs = re.findall(r'"([A-Za-z0-9_]+)":\s*([0-9]+(?:\.[0-9]+)?)', tail)
    timings = {k: float(v) for k, v in pairs if k not in _NON_QUERY_KEYS}
    if not timings:
        raise SystemExit(f"{path}: no bench JSON found (empty/crashed run?)")
    print(
        f"note: {path} is a truncated driver tail — reconstructed "
        f"{len(timings)} per-query timings from the fragment",
        file=sys.stderr,
    )
    return timings


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
        default=0.2,
        help="ignore ratio noise below this absolute time (default 0.2s)",
    )
    args = p.parse_args(argv)

    old, new = load_timings(args.old), load_timings(args.new)
    common = sorted(set(old) & set(new))
    t_old = sum(old[n] for n in common)
    t_new = sum(new[n] for n in common)
    print(
        f"common {len(common)} queries: {t_old:.1f}s -> {t_new:.1f}s "
        f"({t_new / t_old:.2f}x)" if common else "no common queries"
    )

    regressions = []
    for n in common:
        slow = new[n] >= args.min_sec and new[n] / max(old[n], 1e-9) >= args.threshold
        fast = old[n] >= args.min_sec and old[n] / max(new[n], 1e-9) >= args.threshold
        if slow:
            regressions.append(n)
            print(f"  REGRESS  {n}: {old[n]:.2f}s -> {new[n]:.2f}s")
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
