"""Robust-statistics operator cores (corpus-hygiene gates).

The reference repo has no statistics surface (650-line Kafka→HDFS
relay, HadoopKafkaConsumer.java); this module extends SURVEY.md §2.5's
pipeline family with the distribution-shaped gates a training-data
pipeline runs before shipping a corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mad_outliers(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    k: float = 3.0,
    score_col: str = "mad_score",
) -> DataFrame:
    """Rows whose |value − group median| exceeds ``k`` MADs (median
    absolute deviations) for their group — the robust alternative to
    mean/stddev z-scores (one pathological 100 MB document drags a
    mean arbitrarily far; it moves a median by one rank).

    Output: the input columns plus ``score_col`` = signed deviation in
    MAD units, NULL when the group's MAD is 0 (degenerate: over half
    the group at the exact median — every deviation is "infinitely
    many" MADs out, so rows are still flagged but carry no finite
    score; guarded division, never a divide-by-zero).

    Scale shape: two aggregation passes that each collapse to |groups|
    rows (group median, then group MAD) — both BROADCAST back, so the
    input itself is only ever scanned narrowly. No window over the
    full table, no sort. ``percentile`` (exact, linearly interpolated)
    matches DuckDB's ``median`` on both odd and even counts, which is
    what keeps the oracle hash-comparable.
    """
    med = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(0.5)).alias("__med")
    )
    dev = df.join(F.broadcast(med), group_col).withColumn(
        "__adev", F.abs(F.col(value_col) - F.col("__med"))
    )
    mad = dev.groupBy(group_col).agg(
        F.percentile("__adev", F.lit(0.5)).alias("__mad")
    )
    return (
        dev.join(F.broadcast(mad), group_col)
        .filter(F.col("__adev") > F.lit(k) * F.col("__mad"))
        .withColumn(
            score_col,
            F.round(
                (F.col(value_col) - F.col("__med"))
                / F.nullif(F.col("__mad"), F.lit(0.0)),
                6,
            ),
        )
        .drop("__med", "__adev", "__mad")
    )


def ewma_segmented(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
    alpha: float = 0.3,
    segment=None,
):
    """Per-key EWMA (s₀ = x₀, sₜ = (1−α)·sₜ₋₁ + α·xₜ) via a TWO-LEVEL
    affine segment fold — the mega-key-skew escape hatch for the
    sequential form (`event_ewma_smoothing`, plans/analytics.py),
    which collects each key's ENTIRE value history into one array and
    so puts a 10⁸-event bot user's history in a single task.

    The algebra: an EWMA segment of n values is the affine map
    ``s_out = (1−α)ⁿ·s_in + o`` where ``o`` is the same left fold run
    from 0 — so segments compose associatively and a key's history
    never has to meet in one array. Level 1 groups by (key, segment)
    and folds each segment to a constant-size (n, decay, offset,
    standalone) tuple — task memory is bounded by SEGMENT size, which
    the caller controls via ``segment`` granularity; level 2 groups by
    key over the |segments|-sized tuple relation and composes in
    segment order (the first segment contributes its standalone value,
    honoring the s₀ = x₀ init). Both levels are JVM expression folds —
    no UDF, no window, no global sort.

    ``segment`` must be a Column that is MONOTONE NON-DECREASING in the
    (ts, tiebreak) event order and constant across rows with equal ts
    (otherwise segment boundaries would split the order); default =
    calendar day of ``ts_col``. Rows with NULL ``value_col`` are
    dropped, like the sequential form.

    Float caveat — why this is an OPTION, not the registered query's
    default: ``(1−α)ⁿ`` via ``pow`` and the single multiply-add per
    segment reorder the rounding of the sequential fold, so results
    agree to ~1e-12 relative, not bit-exactly; the hash oracle needs
    the oracle-exact sequential fold. Property-tested against it to
    1e-9 relative tolerance on random splits
    (tests/test_analytics_queries.py).

    Output schema matches the sequential form: (key_col, n_events,
    ewma_last), ewma_last unrounded.
    """
    a = F.lit(float(alpha))
    keep = F.lit(1.0 - float(alpha))
    seg = segment if segment is not None else F.date_trunc("day", F.col(ts_col))
    ev = df.filter(F.col(value_col).isNotNull())
    vals = F.transform(
        F.array_sort(F.collect_list(F.struct(ts_col, tiebreak_col, value_col))),
        lambda x: x[value_col].cast("double"),
    )
    per_seg = ev.groupBy(F.col(key_col).alias("__k"), seg.alias("__seg")).agg(
        F.count(F.lit(1)).alias("__n"), vals.alias("__vals")
    )
    tail = F.slice(
        F.col("__vals"), F.lit(2), F.greatest(F.size("__vals") - 1, F.lit(0))
    )
    folded = per_seg.select(
        "__k",
        "__seg",
        "__n",
        F.pow(keep, F.col("__n")).alias("__decay"),
        F.aggregate(
            F.col("__vals"), F.lit(0.0), lambda acc, x: acc * keep + x * a
        ).alias("__offset"),
        F.aggregate(
            tail,
            F.element_at(F.col("__vals"), 1),
            lambda acc, x: acc * keep + x * a,
        ).alias("__alone"),
    )
    segs = F.array_sort(
        F.collect_list(F.struct("__seg", "__n", "__decay", "__offset", "__alone"))
    )
    per_key = folded.groupBy(F.col("__k").alias(key_col)).agg(
        F.sum("__n").alias("n_events"), segs.alias("__segs")
    )
    rest = F.slice(
        F.col("__segs"), F.lit(2), F.greatest(F.size("__segs") - 1, F.lit(0))
    )
    ewma = F.aggregate(
        rest,
        F.element_at(F.col("__segs"), 1)["__alone"],
        lambda acc, s: acc * s["__decay"] + s["__offset"],
    )
    return per_key.select(key_col, "n_events", ewma.alias("ewma_last"))
