"""Stream-stream joins with watermark-bounded state.

The last streaming operator family: correlating two live streams
(click→purchase attribution, request→response matching). Spark buffers
both sides in the state store; WITHOUT time bounds that state grows
forever, so correctness-at-scale means (a) watermarks on both sides
and (b) an event-time interval in the join condition — together they
let Spark evict a buffered row as soon as no future match can exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "1 hour",
    delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join right-side events to left-side events of the same ``key``
    occurring within ``(left_ts, left_ts + within]``.

    Both inputs get ``withWatermark(ts, delay)``; the interval bound in
    the join condition is what makes the state store evictable: a left
    row is dropped once the right watermark passes left_ts + within,
    and vice versa. ``how`` may be 'inner' or the outer variants
    ('leftOuter' etc. — outer rows emit once eviction proves no match
    can arrive).

    Works identically in batch mode (watermarks become no-ops), which
    is how the semantics are unit-tested against a plain join.
    """
    lw = left.withWatermark(left_ts, delay)
    rw = right.withWatermark(right_ts, delay)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] > lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, how)
