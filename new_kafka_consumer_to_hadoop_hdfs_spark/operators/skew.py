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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    *,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the BIG side, replicate the SMALL side.

    A shuffle join on a hot key funnels that key's rows into one reduce
    task regardless of cluster size (one event_type holding 20% of a
    100 TB fact table = one task processing 20 TB). The classic fix
    when the small side is too big to broadcast outright but small
    enough to replicate ``salt_buckets``-fold: the big side gets a
    deterministic salt in [0, salt_buckets), the small side is exploded
    once per salt value, and the join runs on (keys + salt) — every hot
    key is now spread across ``salt_buckets`` tasks. Join semantics for
    inner/left are unchanged (each big row matches exactly the salt
    replica it carries; small-side multiplicity per key is preserved
    within each replica). ``right``/``full`` are rejected: an unmatched
    SMALL row would surface once per replica.

    The salt is derived from ``xxhash64`` of the big side's columns,
    not ``rand()``, so speculative task re-execution salts identically.
    AQE's skew-join split handles moderate skew on its own; use this
    when one key's payload exceeds what a single split can hold, and
    prefer ``F.broadcast(small)`` whenever the small side simply fits.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, got {how!r}: an unmatched "
            "small-side row would appear once per salt replica"
        )
    keys = list(keys)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    big_salted = big.withColumn("__salt", salt)
    replicas = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>")),
    )
    return big_salted.join(replicas, [*keys, "__salt"], how).drop("__salt")
