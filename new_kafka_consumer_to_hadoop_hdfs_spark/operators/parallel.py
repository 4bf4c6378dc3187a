"""Scale-adaptive input-parallelism floor for compute-heavy map stages.

Spark's scan parallelism is byte-driven: one task per
``maxPartitionBytes``-aligned, row-group-aligned file split. That is
the right sizing when per-row work is cheap (columnar scan + codegen
expressions), but CPU-heavy narrow operators — winnowing/shingling a
text corpus, per-token md5, image/audio decoding, Arrow-batched Python
stages — do orders of magnitude more work per byte, so a "small" input
(few splits) serializes the most expensive stage of the query onto a
handful of cores while the rest of the cluster idles. The optimization
guide frames the same floor as ``spark.sql.files.minPartitionNum``
(§6); that conf cannot help here because single-row-group parquet
files never split below one file per task.

``parallelism_floor`` round-robin repartitions the input up to the
session's default parallelism — but ONLY when the physical plan is
already starved (fewer partitions than cores). The guard makes the
cost self-limiting at scale: at 100 TB a corpus scan has thousands of
splits, the guard sees ``current >= target`` and returns the input
untouched, so no corpus-sized shuffle is ever added; the repartition
fires precisely in the regime where the whole input is at most
``cores × maxPartitionBytes`` — i.e. when the shuffle is cheap by
construction and the CPU win is largest.

Apply it to the NARROW PROJECTION feeding the heavy operator (id +
payload columns only), never to a wide table: the shuffle then moves
only the bytes the operator actually consumes (guide §2.3 "project
before the exchange").
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def parallelism_floor(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``target`` (default: the session's
    ``sparkContext.defaultParallelism``) when — and only when — its
    physical partitioning has fewer partitions than that. Returns the
    input unchanged otherwise, so at production scale this is a no-op.

    Partition count is read from the planned (not executed) RDD: for
    file scans that is the split count, computed without running a job.
    Any failure to introspect degrades to "no floor" — the operator
    still runs, just without the extra parallelism.
    """
    if target is None:
        target = df.sparkSession.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover — introspection is best-effort
        return df
    if current >= target:
        return df
    return df.repartition(target)
