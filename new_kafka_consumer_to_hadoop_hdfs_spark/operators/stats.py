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
