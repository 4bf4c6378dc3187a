"""Event-time windowing surface (SURVEY.md §2.5 streaming row, M3).

The reference has no event-time semantics — its only temporal notion
is Kafka offset order (KafkaContext.java:59, seekToBeginning; README
"last write wins" = highest offset). This module adds the event-time
layer over ``events.ts``: tumbling, sliding, and session windows.

Batch-mode first: the exact same ``window()`` / ``session_window()``
expressions run under Structured Streaming (streaming/dedup.py wires
them with watermarks); running them in batch makes them
oracle-checkable in DuckDB (`time_bucket` / gaps-and-islands), which
is the strongest correctness signal available. Alignment contract:
window widths divide 24 h and use zero offset, so Spark's epoch-based
origin (1970-01-01) and DuckDB's time_bucket origin (2000-01-03) land
on identical boundaries; the session gap comparison is ``>= gap`` in
both engines (Spark merges while next_ts < prev_ts + gap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.files import load_table
from ._registry import dsum
from ._registry import make_register

QUERIES = {}
ORACLES = {}
_register = make_register(QUERIES, ORACLES)


def _dsum(col: Column) -> Column:
    """Event values carry 6 decimal places — scale must match oracles."""
    return dsum(col, 6)


_TUMBLING_ORACLE = """
SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
       time_bucket(INTERVAL '6 hours', ts) + INTERVAL '6 hours' AS window_end,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2, 3
"""


@_register("event_tumbling_window", _TUMBLING_ORACLE)
def event_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6-hour event-time windows per event type.

    ``window(ts, '6 hours')`` is a plain grouping expression: partial
    agg map-side, one shuffle on (window, event_type). Identical code
    runs under readStream with ``withWatermark`` — state per open
    window, closed windows emitted and dropped. 6h divides 24h → same
    boundaries as DuckDB's time_bucket.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            _dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_SLIDING_ORACLE = """
WITH buckets AS (
  SELECT time_bucket(INTERVAL '12 hours', ts) AS window_start, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '12 hours', ts) - INTERVAL '12 hours' AS window_start, value
  FROM events
)
SELECT window_start,
       window_start + INTERVAL '24 hours' AS window_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM buckets
GROUP BY 1, 2
"""


@_register("event_sliding_window", _SLIDING_ORACLE)
def event_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 24-hour windows advancing every 12 hours (each event
    lands in exactly 2 windows).

    Spark expands each row into width/slide window copies before the
    aggregation — so a sliding window costs (width/slide)× the rows of
    a tumbling one; keep the ratio small at scale or pre-aggregate into
    tumbling panes first (the DuckDB oracle does exactly that pane
    trick: one 12h bucket per copy, union of the two shifts).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "24 hours", "12 hours").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            _dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


_SESSION_ORACLE = """
WITH seq AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL '8 hours'
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
ids AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM seq
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '8 hours' AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM ids
GROUP BY user_id, session_id
"""


@_register("event_session_window", _SESSION_ORACLE)
def event_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with an 8-hour inactivity gap.

    ``session_window(ts, gap)`` merges an event into the open session
    while ts < previous_ts + gap, and reports end = last_ts + gap —
    mirrored in the oracle by the gaps-and-islands LAG construction.
    One shuffle on user_id; in streaming the same expression runs with
    a watermark bounding session state. At scale session keys are
    users — high cardinality, no skew concern; AQE splits stragglers.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "8 hours").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            _dsum(F.col("value")).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


_TIME_ROLLUP_ORACLE = """
SELECT EXTRACT(year FROM ts) AS y,
       EXTRACT(month FROM ts) AS m,
       EXTRACT(day FROM ts) AS d,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY ROLLUP (y, m, d)
"""


@_register("event_time_rollup", _TIME_ROLLUP_ORACLE)
def event_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: one pass emitting
    the day, month, year, and grand-total aggregation levels of the
    event stream (`ROLLUP(y, m, d)`), the materialized hierarchy a
    time-series store keeps per hypertable.

    Scale shape: Spark plans rollup as a single Expand + one shuffled
    aggregation — levels × rows expanded map-side with partial
    aggregation, so the shuffle carries near-|groups| rows, not
    levels × |input|. At 100 TB this one query replaces three
    sequential re-aggregations of the same scan.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.year("ts").cast("long").alias("y"),
            F.month("ts").cast("long").alias("m"),
            F.dayofmonth("ts").cast("long").alias("d"),
            "value",
        )
        .rollup("y", "m", "d")
        .agg(
            F.count("*").alias("n_events"),
            _dsum(F.col("value")).alias("total_value"),
        )
    )
