"""Live-Kafka integration test — S1-S4 execution evidence.

The sandbox has neither the spark-sql-kafka connector jar nor a
broker, so the Kafka path is otherwise capability-gated and exercised
through file-stream twins (tests/test_streaming.py). This test is the
execution-evidence slot for when an environment DOES provide both:

    NKCH_KAFKA_BOOTSTRAP=host:9092 \
    PYSPARK_SUBMIT_ARGS="--packages \
        org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-ver> pyspark-shell" \
        python -m pytest tests/test_kafka_integration.py

(PYSPARK_SUBMIT_ARGS puts the connector on the session's classpath;
spark-submit itself cannot launch pytest — it takes an application
file, not Python's -m flag.)

It skips cleanly (reported, not silently passed) everywhere else.
"""

from __future__ import annotations

import os
import uuid

import pytest

BOOTSTRAP = os.environ.get("NKCH_KAFKA_BOOTSTRAP")


def _kafka_ready(spark) -> str | None:
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.kafka import kafka_available

    if not BOOTSTRAP:
        return "NKCH_KAFKA_BOOTSTRAP not set (no broker in this environment)"
    if not kafka_available(spark):
        return "spark-sql-kafka connector not on classpath"
    return None


def test_kafka_roundtrip_lww_dedup(spark):
    """Produce duplicate-id JSON messages through the Kafka sink, read
    them back bounded (S1/S3), and check per-partition LWW dedup (A1):
    the full reference pipeline against a real broker."""
    reason = _kafka_ready(spark)
    if reason:
        pytest.skip(reason)

    from pyspark.sql import functions as F

    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.dedup import (
        dedup_last_write_wins,
    )
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.kafka import (
        KafkaSourceConfig,
        read_kafka_batch,
    )

    topic = f"nkch_it_{uuid.uuid4().hex[:8]}"
    # id=1 appears twice — the later offset must win; id=2 once.
    msgs = [
        '{"id": 1, "msg": "old"}',
        '{"id": 2, "msg": "only"}',
        '{"id": 1, "msg": "new"}',
    ]
    (
        spark.createDataFrame([(m,) for m in msgs], "value string")
        .coalesce(1)  # one producer partition → deterministic offsets
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )

    raw = read_kafka_batch(
        spark, KafkaSourceConfig(brokers=BOOTSTRAP, topic=topic)
    )
    parsed = raw.select(
        F.col("partition").cast("long").alias("partition"),
        F.col("offset").cast("long").alias("offset"),
        F.get_json_object(F.col("value").cast("string"), "$.id")
        .cast("long")
        .alias("id"),
        F.get_json_object(F.col("value").cast("string"), "$.msg").alias("msg"),
    )
    out = {
        r.id: r.msg
        for r in dedup_last_write_wins(
            parsed, keys=["partition", "id"], order_by=[F.col("offset").desc()]
        ).collect()
    }
    assert out == {1: "new", 2: "only"}
