"""Bucketed table layout: shuffle-free co-located joins and aggs.

The single most expensive thing a 100 TB query does is shuffle a fact
table. Bucketing amortizes that shuffle into the WRITE: persist the
table hash-partitioned by its join/agg key into N buckets
(``DataFrameWriter.bucketBy``), and every subsequent equi-join or
groupBy on that key reads the co-located layout directly — Catalyst
plans a SortMergeJoin with NO Exchange on the bucketed side(s).
A fact table written once and joined daily pays the shuffle once,
not daily.

Reference parity note: the reference's only layout decision is "one
output file per reducer" (HadoopKafkaConsumer.java:55-76); it has no
persisted keyed layout. This module is part of the §2.5 scale mandate.

Rules of thumb encoded here:
- bucket count should be sized so one bucket ≈ 100-200 MB at the
  target scale (buckets are the read parallelism floor: too few
  starves the cluster, too many makes small files);
- both join sides must be bucketed by the SAME key into the SAME
  bucket count for the exchange-free plan (Spark does not yet do
  bucket-count coalescing by default — set
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` when counts
  are power-of-two multiples);
- ``sortBy`` within buckets additionally removes the per-task Sort
  under SortMergeJoin.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    name: str,
    keys: Sequence[str],
    *,
    num_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally
    sorted) by ``keys``. The bucket metadata lives in the session
    catalog; reads via ``spark.table(name)`` expose the layout to the
    planner."""
    keys = list(keys)
    writer = df.write.format("parquet").mode("overwrite").bucketBy(
        num_buckets, keys[0], *keys[1:]
    )
    if sort:
        writer = writer.sortBy(keys[0], *keys[1:])
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str]
) -> DataFrame:
    """Equi-join two same-key/same-count bucketed tables. With both
    layouts aligned the physical plan has ZERO Exchange operators —
    the join cost is a co-partitioned merge, independent of cluster
    shuffle capacity."""
    return spark.table(left_table).join(spark.table(right_table), list(on))
