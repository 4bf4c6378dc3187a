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

# Planned-partition-count memo (r15, VERDICT r14 item 7): reading the
# count via ``df.rdd`` forces a full plan→RDD conversion — measured
# 60-85 ms per call warm (1.4 s cold) — on exactly the hot-construct
# queries this operator serves, and the bench re-constructs each query
# every pass. The analyzed plan's ``semanticHash`` costs ~2 ms and is
# stable for semantically equal plans, so within one session (same
# files, same conf → same splits) it keys the count exactly. A hash
# collision could only mis-decide the FLOOR (a perf heuristic), never
# results. Keyed per SparkContext id so a new session never reuses
# counts, and bounded so the memo cannot grow with query count.
_PLAN_PARTITIONS_MEMO: dict[tuple[int, int], int] = {}
_MEMO_MAX = 512


def _planned_partitions(df: DataFrame) -> int:
    try:
        key = (
            id(df.sparkSession.sparkContext),
            df._jdf.queryExecution().analyzed().semanticHash(),  # noqa: SLF001
        )
    except Exception:  # pragma: no cover — fall back to the direct read
        return df.rdd.getNumPartitions()
    hit = _PLAN_PARTITIONS_MEMO.get(key)
    if hit is not None:
        return hit
    current = df.rdd.getNumPartitions()
    if len(_PLAN_PARTITIONS_MEMO) >= _MEMO_MAX:
        _PLAN_PARTITIONS_MEMO.clear()
    _PLAN_PARTITIONS_MEMO[key] = current
    return current


def parallelism_floor(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``target`` (default: the session's
    ``sparkContext.defaultParallelism``) when — and only when — its
    physical partitioning has fewer partitions than that. Returns the
    input unchanged otherwise, so at production scale this is a no-op.

    Partition count is read from the planned (not executed) RDD: for
    file scans that is the split count, computed without running a job
    — and memoized per (session, analyzed-plan hash) so repeated
    constructions of the same query skip the plan→RDD conversion. Any
    failure to introspect degrades to "no floor" — the operator still
    runs, just without the extra parallelism.
    """
    if target is None:
        target = df.sparkSession.sparkContext.defaultParallelism
    try:
        current = _planned_partitions(df)
    except Exception:  # pragma: no cover — introspection is best-effort
        return df
    if current >= target:
        return df
    return df.repartition(target)
