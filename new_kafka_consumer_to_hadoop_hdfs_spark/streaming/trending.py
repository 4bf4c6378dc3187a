"""Trending tokens over an event-time document stream.

The streaming composition of `text_heavy_hitters` (plans/corpus.py):
per event-time window, the top-k most frequent tokens — the "what is
the corpus suddenly full of" monitor a continuously-ingesting
training-data pipeline runs to catch scraper loops, spam floods, and
vocabulary drift between snapshots.

Design: Structured Streaming forbids chaining a rank aggregation onto
a streaming aggregate, so the operator splits at the supported
boundary —

1. :func:`windowed_token_counts` — explode (narrow) + watermarked
   window count. State per (window, token) is one count; append mode
   emits a window's counts exactly once, when the watermark passes
   its end. This is the only corpus-sized stage and it is the
   standard bounded-state shape.
2. :func:`topk_per_window` — a plain BATCH transformation applied
   inside ``foreachBatch`` to the closed windows (a vocabulary-sized
   relation), ranking and truncating to k. foreachBatch receives only
   finalized windows in append mode, so the top-k per window is
   computed exactly once over complete counts.

The batch twin used for equivalence testing is
:func:`batch_trending_tokens` — identical expressions minus the
watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.text import whitespace_tokens


def windowed_token_counts(
    docs: DataFrame,
    *,
    ts_col: str = "ts",
    text_col: str = "text",
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked per-window token counts (streaming or batch input).

    Output: (window_start, window_end, token, cnt). In streaming
    append mode a window's rows emit once, after the watermark passes
    window end + allowed lateness.
    """
    toks = docs.withWatermark(ts_col, watermark).select(
        F.col(ts_col),
        F.explode(whitespace_tokens(F.col(text_col))).alias("token"),
    )
    return (
        toks.groupBy(F.window(ts_col, window).alias("w"), "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "token",
            "cnt",
        )
    )


def topk_per_window(counts: DataFrame, k: int) -> DataFrame:
    """Rank a (window_start, window_end, token, cnt) relation to the
    top-k tokens per window, deterministic tie-break on token text.
    Batch-only (used inside foreachBatch on closed windows)."""
    w = Window.partitionBy("window_start").orderBy(
        F.desc("cnt"), F.asc("token")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("window_start", "window_end", "token", "cnt", "rnk")
    )


def batch_trending_tokens(
    docs: DataFrame,
    *,
    ts_col: str = "ts",
    text_col: str = "text",
    window: str = "1 hour",
    k: int = 10,
) -> DataFrame:
    """Batch twin: the SAME expressions as the streaming path —
    ``withWatermark`` is a no-op on a batch frame, so the twin
    literally reuses :func:`windowed_token_counts`; there is exactly
    one place the window/count expressions live."""
    return topk_per_window(
        windowed_token_counts(
            docs, ts_col=ts_col, text_col=text_col, window=window
        ),
        k,
    )
