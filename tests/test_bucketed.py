"""Bucketed-layout tests: the write-once-shuffle-never join contract.

Asserts the actual PLAN property bucketing exists for — an equi-join
of two tables bucketed by the same key into the same bucket count
contains no Exchange at all — plus value equivalence with the
shuffled join.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from new_kafka_consumer_to_hadoop_hdfs_spark.sources.bucketed import (
    bucketed_join,
    write_bucketed_table,
)
from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import load_table

from .conftest import SF_DIR as SF


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("warehouse")
    o = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed_table(
        o, "orders_b", ["o_orderkey"], num_buckets=8, path=str(base / "orders_b")
    )
    write_bucketed_table(
        li, "lineitem_b", ["o_orderkey"], num_buckets=8, path=str(base / "lineitem_b")
    )
    yield "orders_b", "lineitem_b"
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_zero_exchanges(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast so the plan must rely on the layout, as it
    # would with two 10-TB fact tables at the real scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_join(spark, left, right, ["o_orderkey"])
        plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_shuffled_join(spark, bucketed_tables):
    left, right = bucketed_tables
    o = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    expected = o.join(li, o.o_orderkey == li.l_orderkey).count()
    assert bucketed_join(spark, left, right, ["o_orderkey"]).count() == expected


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    """Aggregation on the bucket key also reuses the layout: the
    partial/final agg collapses into one stage with no shuffle."""
    _, right = bucketed_tables
    df = (
        spark.table(right)
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "Exchange" not in plan, plan


def test_partitioned_write_prunes_at_scan(spark, tmp_path):
    """Hive-partitioned layout: writing facts partitioned by a
    low-cardinality column and filtering on it must prune partitions
    at the scan (PartitionFilters), not read-then-filter — at 100 TB
    this is the difference between touching one day and the full
    table."""
    out = str(tmp_path / "events_by_type")
    ev = load_table(spark, SF, "events")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(out)

    back = spark.read.parquet(out)
    one_type = back.select("event_id", "value").filter(
        back.event_type == ev.select("event_type").first()[0]
    )
    plan = one_type._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "PartitionFilters: [" in plan
    # the partition predicate must appear inside PartitionFilters (scan
    # prune), not as a post-scan Filter over all partitions
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_type" in pf


def test_write_bounds_file_count_and_size(spark, tmp_path):
    """Sink-side small-files control: repartition before write bounds
    the file COUNT (one per partition), maxRecordsPerFile bounds each
    file's row count. At 100 TB unbounded tiny files destroy scan
    planning; unbounded huge files destroy parallelism — both knobs
    must actually take effect."""
    out = str(tmp_path / "events_compact")
    ev = load_table(spark, SF, "events")
    n = ev.count()
    (
        ev.repartition(4)
        .write.option("maxRecordsPerFile", 200)
        .mode("overwrite")
        .parquet(out)
    )
    import glob

    files = glob.glob(f"{out}/part-*.parquet")
    # 4 partitions, each split into ceil(rows_in_partition / 200) files
    assert len(files) >= 4
    assert len(files) <= 4 * (n // 200 + 2)
    back = spark.read.parquet(out)
    assert back.count() == n
    # no file may exceed the record cap
    for f in files:
        assert spark.read.parquet(f).count() <= 200


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """Lakehouse schema evolution: two parquet batches with different
    (compatible) schemas read back as ONE table under mergeSchema,
    with the missing column null-filled — the append-only column-add
    migration every long-lived 100 TB dataset eventually needs."""
    out = str(tmp_path / "evolving")
    ev = load_table(spark, SF, "events").select("event_id", "user_id")
    ev.write.mode("overwrite").parquet(out + "/batch=1")
    ev2 = load_table(spark, SF, "events").select(
        "event_id", "user_id", F.col("value").alias("quality_score")
    )
    ev2.write.mode("overwrite").parquet(out + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"event_id", "user_id", "quality_score", "batch"}
    n = ev.count()
    assert merged.count() == 2 * n
    # old batch rows surface the new column as NULL, not garbage
    assert merged.filter(
        (F.col("batch") == 1) & F.col("quality_score").isNotNull()
    ).count() == 0
    assert merged.filter(
        (F.col("batch") == 2) & F.col("quality_score").isNull()
    ).count() == 0
