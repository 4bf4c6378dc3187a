"""Skew mitigation: salted two-phase aggregation.

AQE handles skewed JOINS automatically (skewJoin.enabled splits
oversized partitions), but a groupBy whose key distribution is
pathological (one key holding 10% of a 100 TB table) still funnels
that key's rows into a single reduce task. Salting splits each key
into ``salt_buckets`` sub-groups, aggregates partially per sub-group
(parallel), then merges the partials in a second, tiny aggregation —
the standard two-phase decomposition, valid for any algebraic
aggregate (sum/count/min/max, and avg via sum+count).

The reference has no aggregation beyond its dedup HashMap
(HadoopKafkaConsumer.java:55) and would simply OOM on a hot key; this
operator is the 100 TB answer. Use when key skew is KNOWN; for
uniform keys the extra shuffle is pure overhead — Spark's map-side
partial aggregation already handles moderate skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial_agg, merge_agg) pairs per supported algebraic aggregate.
_MERGES = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, Column | str, str]],
    *,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted groupBy.

    ``aggs``: (fn_name, column, alias) triples with fn_name in
    {sum, count, min, max}. Phase 1 groups on (keys + salt) —
    ``salt_buckets`` parallel partials per hot key; phase 2 merges on
    the true keys (sum of counts, min of mins, ...). The phase-2 input
    is |keys| × salt_buckets rows — trivially small.

    The salt is ``pmod(hash(rand-free row fingerprint), buckets)`` —
    derived from all columns rather than rand() so retried tasks
    salt identically (deterministic under speculative re-execution,
    which rand() is not).
    """
    unsupported = [fn for fn, _, _ in aggs if fn not in _MERGES]
    if unsupported:
        raise ValueError(f"non-algebraic aggregate(s) {unsupported}; supported: {sorted(_MERGES)}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    salted = df.withColumn("__salt", salt)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            _MERGES[fn][0](col).alias(f"__p_{alias}")
            for fn, col, alias in aggs
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGES[fn][1](F.col(f"__p_{alias}")).alias(alias)
            for fn, _, alias in aggs
        ]
    )
