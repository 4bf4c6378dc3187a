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
    salt_cols: Sequence[str] | None = None,
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

    The salt is derived from ``xxhash64`` over ``salt_cols`` (default:
    every big-side column), not ``rand()``, so speculative task
    re-execution salts identically. Two caveats of row-content hashing
    (ADVICE r6): (a) fully-IDENTICAL duplicate rows of a hot key all
    hash to one salt bucket, so on duplicate-heavy streams — the exact
    shape Kafka replays produce — pass ``salt_cols`` naming a column
    that varies across duplicates (an offset, an ingest timestamp, a
    monotonic id); (b) ``xxhash64`` raises on map-typed columns, so
    exclude them via ``salt_cols`` when the big side carries maps.
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
    salt_src = list(salt_cols) if salt_cols is not None else list(big.columns)
    missing = [c for c in salt_src if c not in big.columns]
    if missing:
        raise ValueError(f"salt_cols not on the big side: {missing}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(salt_buckets))
    big_salted = big.withColumn("__salt", salt)
    replicas = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>")),
    )
    return big_salted.join(replicas, [*keys, "__salt"], how).drop("__salt")


def bloom_prefilter(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    *,
    n_bits: int | None = None,
    n_hashes: int = 3,
    max_bits: int = 1 << 25,
) -> DataFrame:
    """Filter ``big`` down to rows whose key MIGHT appear in ``small``,
    using a Bloom filter built from the small side — the runtime-filter
    technique (Spark's own `spark.sql.optimizer.runtime.bloomFilter.*`
    injects the same shape; `bloom_filter_agg` is not exposed to the
    public function registry, so this builds the filter explicitly
    from deterministic ``xxhash64`` probes).

    Why not just semi-join? At 100 TB the semi-join itself shuffles the
    big side; the Bloom filter instead rides into the big side's SCAN
    stage as a plain projection filter — rows of keys that cannot
    match are dropped BEFORE the exchange, turning a
    shuffle-everything join into a shuffle-what-matches join. The
    filter is a ``n_bits``-bit bitmap packed into ``n_bits/64`` longs
    and embedded as an array literal (8 KB at the 2^16-bit floor —
    broadcast-by-closure scale, the same class as the IVF centroid
    table). False positives only ever ADD candidate rows, so
    correctness comes from the exact join that follows; this operator
    must be composed with one, never used as a membership oracle.

    ``n_bits`` is AUTO-SIZED by default (ADVICE r7): one bounded
    distinct-count of the small side's keys (a relation this operator
    already requires to be bounded) picks ``max(2^16, 13·n_keys)``
    bits — at the fixed 3 hashes, ~13 bits/key keeps the
    false-positive rate (1-e^{-kn/m})^k under ~1%, so the filter keeps
    EARNING its scan cost instead of silently degrading toward
    pass-everything when a caller feeds a million-key "small" side.
    Either path raises past ``max_bits`` (default 2^25 = 4 MB bitmap):
    beyond that the plan-embedded literal is the wrong transport and
    the key count has outgrown the design load — use a semi-join (or
    Spark's own runtime rowgroup filters) instead.

    The build is ONE scan of the small side (all ``n_hashes`` probe
    positions computed per row and exploded — not one scan per seed)
    into a per-word bit_or, plus one driver collect of ≤ n_bits/64
    rows. Deterministic end to end: xxhash64 is seed-stable, so
    speculative re-execution and the DuckDB oracle (plain join) agree.
    """
    if n_bits is not None and n_bits > max_bits:
        raise ValueError(
            f"bloom_prefilter sized to {n_bits} bits "
            f"({n_bits >> 23} MB bitmap) exceeds max_bits={max_bits}: the "
            "small side's key count has outgrown a plan-embedded bitmap — "
            "use a semi-join or raise max_bits deliberately"
        )
    if n_bits is not None and n_bits % 64 != 0:
        raise ValueError(f"n_bits must be a multiple of 64, got {n_bits}")
    big_t = big.schema[big_key].dataType
    small_t = small.schema[small_key].dataType
    if big_t != small_t:
        # xxhash64 hashes INT 5 and BIGINT 5 to DIFFERENT values, so a
        # type mismatch a plain equi-join would coerce away silently
        # drops EVERY matching row here — fail loudly instead (a false
        # NEGATIVE breaks the operator's one contract).
        raise TypeError(
            f"bloom_prefilter key types must match exactly: "
            f"{big_key}:{big_t.simpleString()} vs "
            f"{small_key}:{small_t.simpleString()} — cast one side first "
            "(xxhash64 is type-sensitive, a mismatch never matches)"
        )
    seeds = list(range(n_hashes))
    key = F.col(small_key)
    # all n_hashes positions from ONE scan of the small side (an
    # earlier draft unioned one filtered scan per seed — n_hashes
    # passes over the dim table for no reason, ADVICE r7). When
    # auto-sizing, the key count that picks n_bits is computed INSIDE
    # the same job as the bitmap (a broadcast 1-row aggregate the
    # positions cross-join against, with the `div`-exact SQL twin of
    # the Python sizing formula) and rides the collected word rows —
    # one Spark job for count + build instead of two (r14; the count
    # job alone was half the query's plan-construction time).
    keyed = small.filter(key.isNotNull())
    if n_bits is None:
        cnt = keyed.agg(F.count_distinct(key).alias("__n"))
        nbits_expr = F.greatest(
            F.lit(1 << 16),
            F.expr("((13 * greatest(__n, 1) + 63) div 64) * 64"),
        )
        src = keyed.crossJoin(F.broadcast(cnt))
        carry = [F.first("__n").alias("__n")]
    else:
        src, nbits_expr, carry = keyed, F.lit(n_bits), []
    positions = src.select(
        *(["__n"] if carry else []),
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(key, F.lit(s)), nbits_expr)
                    for s in seeds
                ]
            )
        ).alias("__pos"),
    )
    # bounded collect: ≤ n_words rows of (word, 64-bit mask)
    word_rows = (
        positions.select(
            *(["__n"] if carry else []),
            (F.col("__pos") / 64).cast("int").alias("__word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))"
            ).alias("__bit"),
        )
        .groupBy("__word")
        .agg(F.expr("bit_or(__bit)").alias("__mask"), *carry)
        .collect()
    )
    if n_bits is None:
        # re-derive the size the in-query expression used (identical
        # integer arithmetic); an empty small side collects no rows →
        # the 2^16-bit floor with an all-zero bitmap, which correctly
        # rejects (almost) every probe key.
        n_keys = word_rows[0]["__n"] if word_rows else 0
        n_bits = max(1 << 16, ((13 * max(n_keys, 1) + 63) // 64) * 64)
        if n_bits > max_bits:
            raise ValueError(
                f"bloom_prefilter sized to {n_bits} bits "
                f"({n_bits >> 23} MB bitmap) exceeds max_bits={max_bits}: "
                "the small side's key count has outgrown a plan-embedded "
                "bitmap — use a semi-join or raise max_bits deliberately"
            )
    n_words = n_bits // 64
    words = [0] * n_words
    for r in word_rows:
        words[r["__word"]] = r["__mask"]
    bitmap = F.lit(words)
    out = big
    cond = F.col(big_key).isNotNull()
    tmp_cols = []
    for i, s in enumerate(seeds):
        pos_col = f"__bloom_pos_{i}"
        out = out.withColumn(
            pos_col,
            F.pmod(F.xxhash64(F.col(big_key), F.lit(s)), F.lit(n_bits)),
        )
        word = F.element_at(bitmap, (F.col(pos_col) / 64).cast("int") + 1)
        bit = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST({pos_col} % 64 AS INT))"
        )
        cond = cond & (word.bitwiseAND(bit) != 0)
        tmp_cols.append(pos_col)
    return out.filter(cond).drop(*tmp_cols)
