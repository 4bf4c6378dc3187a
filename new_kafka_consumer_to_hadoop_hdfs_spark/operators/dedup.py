"""Exact deduplication operators.

The reference's one true "query" is a per-Kafka-partition
last-write-wins dedup: group messages by ``id`` within each partition,
keep the message carrying the highest offset; on equal offsets the
first-seen message wins because the comparison is strict ``>``
(HadoopKafkaConsumer.java:47-103, dedup loop 55-90, overwrite-if-newer
69-78). Dedup scope is per partition — the same id in two partitions
yields two survivors (key construction at KafkaContext.java:103).

Spark-first design notes (100 TB):
- The window/row_number form gives Catalyst a single hash-partitioned
  shuffle on the dedup keys followed by a per-partition sort — the same
  shape as the reference's MR shuffle+reduce, but with Tungsten
  spill-safe aggregation instead of an in-heap HashMap
  (HadoopKafkaConsumer.java:55 OOMs on hot partitions; this doesn't).
- ``max_by``/``groupBy`` would also work but breaks ties arbitrarily;
  ``row_number`` over an explicit ordering is deterministic, which the
  oracle comparison (and any replayed production run) needs.
- AQE skew-join/partition-coalescing handles hot partitions; for a
  known-skewed id space, pass ``salt_buckets`` to pre-split groups.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_last_write_wins(
    df: DataFrame,
    keys: Sequence[str | Column],
    order_by: Sequence[Column],
    *,
    tie_break: Sequence[Column] = (),
) -> DataFrame:
    """Keep exactly one row per ``keys`` group: the first under ``order_by``.

    For reference semantics pass ``keys=["partition", "id"]`` and
    ``order_by=[F.col("offset").desc()]``. ``order_by`` must be total
    within a group (add ``tie_break`` columns otherwise) so results are
    deterministic — the reference's strict-``>`` keeps the first-seen
    row on ties, which in offset order is the lowest offset; Kafka
    offsets are unique per partition so ties cannot arise there.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by, *tie_break)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_exact(
    df: DataFrame,
    keys: Sequence[str | Column],
    *,
    keep_order: Sequence[Column] | None = None,
) -> DataFrame:
    """Generalized exact dedup on arbitrary key columns.

    With ``keep_order`` the survivor is deterministic (first row under
    that ordering); without it, one arbitrary row per group survives via
    a single hash aggregate (cheapest plan — one shuffle, map-side
    partial aggregation, no sort).
    """
    if keep_order is not None:
        return dedup_last_write_wins(df, keys, keep_order)
    cols = [c for c in df.columns]
    # resolve Column keys to their output names via a public API
    # (select().columns), not private JVM pokes — survives Spark Connect
    key_names = set()
    for c in keys:
        key_names.add(c if isinstance(c, str) else df.select(c).columns[0])
    value_cols = [c for c in cols if c not in key_names]
    if not value_cols:
        return df.dropDuplicates([c for c in keys if isinstance(c, str)])
    agg = [F.first(c).alias(c) for c in value_cols]
    return df.groupBy(*keys).agg(*agg).select(*cols)


def cdc_compact(
    df: DataFrame,
    key_col: str,
    *,
    ts_col: str,
    seq_col: str,
    is_delete: Column,
    value_col: str,
) -> DataFrame:
    """Batch changelog compaction (MERGE semantics): each key's final
    state is decided solely by its LAST change in (ts, seq) order — a
    delete marker last removes the key; any other op last survives
    with its value. Host query: pipeline_cdc_merge; streaming twin:
    streaming/cdc.stateful_cdc_merge.

    ONE hash shuffle on the key; the winner is a map-side-combinable
    ``max(struct(ts, seq, is_delete, value))`` argmax (no window, no
    per-key sort). (ts, seq) must be a total order per key.

    Columns: (key_col, last_ts, last_value rounded to 6, n_ops,
    n_deletes).
    """
    marked = df.withColumn("__is_del", is_delete.cast("int"))
    merged = marked.groupBy(key_col).agg(
        F.max(
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(seq_col).alias("seq"),
                F.col("__is_del"),
                F.col(value_col).alias("value"),
            )
        ).alias("__last"),
        F.count(F.lit(1)).alias("n_ops"),
        F.sum("__is_del").cast("long").alias("n_deletes"),
    )
    return merged.filter(F.col("__last.__is_del") == 0).select(
        key_col,
        F.col("__last.ts").alias("last_ts"),
        F.round(F.col("__last.value"), 6).alias("last_value"),
        "n_ops",
        "n_deletes",
    )
