"""Streaming session-funnel detection: the event-time composition of
`event_path_regex` (plans/analytics.py).

A continuously-ingesting pipeline wants funnel sessions AS THEY CLOSE,
not in a nightly batch: "which sessions completed view→…→purchase"
becomes an alert/metric stream. The same split as
`streaming/trending.py` applies — Structured Streaming supports the
STATEFUL part (watermarked session windows + per-session aggregation)
natively, and the post-aggregation pattern match is a plain batch
transformation applied to CLOSED sessions:

1. :func:`sessionized_paths` — ``session_window(ts, gap)`` grouped
   with the user key; per-session state is one count plus the
   collected (ts, event_id, type) structs, bounded by session length
   (watermark evicts state once a session can no longer grow). The
   path string is folded from ``sort_array`` over the collected
   structs, so cross-micro-batch arrival order cannot perturb it —
   the same (ts, event_id) total order as the batch query. Append
   mode emits each session exactly once, when the watermark passes
   its close.
2. :func:`funnel_matches` — the delimited-path regex filter, run
   inside ``foreachBatch`` on the closed-session relation (tiny:
   sessions, not events).

Sessionization semantics note: ``session_window`` merges an event
while ts < previous close (strict), so an event landing EXACTLY gap
after its predecessor opens a new session — whereas the batch
`event_path_regex` lag formulation keeps it (is_new on strict >).
The boundary event differs; the stream-equals-batch test therefore
compares against the session_window batch twin, which is
expression-identical by construction.

At 100 TB/day: state is per-OPEN-session (bounded by gap × arrival
rate per user), the shuffle is the same single user-key exchange as
the batch plan, and the regex runs once per closed session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FUNNEL_PATTERN = ">view>(.*>)?purchase>"


def sessionized_paths(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked per-session ordered event paths (streaming or batch
    input — batch callers get identical expressions minus the
    watermark's effect, the trending-tokens twin convention).

    Output: (user_id, session_start, session_end, n_events, path)
    where path is the '>'-joined event_type sequence in
    (ts, event_id) order.
    """
    grouped = (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming
        else events
    )
    return (
        grouped.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(ts_col, "event_id", "event_type")
                        )
                    ),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("path"),
        )
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "path",
        )
    )


def funnel_matches(
    paths: DataFrame, pattern: str = FUNNEL_PATTERN
) -> DataFrame:
    """Sessions whose delimited path matches the funnel regex — a plain
    narrow filter, applied in ``foreachBatch`` over closed sessions."""
    return paths.filter(
        F.concat(F.lit(">"), F.col("path"), F.lit(">")).rlike(pattern)
    )
