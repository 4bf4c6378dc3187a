"""Kafka source — the Spark-native replacement for the reference's
custom InputFormat stack (KafkaInputFormat.java, KafkaContext.java).

Everything the reference hand-built is a built-in of Spark's Kafka
source (SURVEY.md §2.1 S1-S4):

- one split per partition (KafkaInputFormat.java:40-44) → the source
  plans one Spark partition per topic-partition (``minPartitions`` to
  oversplit hot partitions — something the reference cannot do);
- bounded "read whole topic" (KafkaContext.java:59 seekToBeginning,
  145-150 stop-on-empty-poll) → ``startingOffsets=earliest`` +
  ``endingOffsets=latest`` (batch) or ``Trigger.AvailableNow``;
- background fetch thread + bounded queue (KafkaContext.java:61-63,
  124-156) → the source's consumer pool and prefetch, with real
  backpressure (``maxOffsetsPerTrigger``) instead of the reference's
  silent drop on a full queue (KafkaContext.java:152);
- offset auto-commit progress (KafkaContext.java:44-45, at-least-once
  at best) → checkpointed offsets, exactly-once to a file sink.

The spark-sql-kafka connector jar is not bundled with the test
environment's pyspark, so construction is capability-gated: callers get
a clear error naming the missing package instead of a ClassNotFound
stack. The plan-building code itself is complete and cluster-ready.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

KAFKA_FORMAT = "kafka"
KAFKA_PACKAGE = "org.apache.spark:spark-sql-kafka-0-10_2.13"

# Columns every Kafka-source DataFrame carries; the reference's
# KafkaMessageWithOffset envelope is the (value, offset) subset.
SOURCE_COLUMNS = ("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")


@dataclass(frozen=True)
class KafkaSourceConfig:
    """Mirrors the reference CLI surface (HadoopKafkaConsumer.java:162-196).

    ``group_id`` is accepted for parity but unused — exactly like the
    reference, which reads -g into config and never applies it
    (SURVEY.md §1.3 dead config; group is irrelevant to Spark's source,
    which manages offsets itself).
    """

    brokers: str = "localhost:9092"  # -b default, HadoopKafkaConsumer.java:113
    topic: str = "my_test_kafka_topic"  # -t default, HadoopKafkaConsumer.java:112
    group_id: str | None = None  # -g, dead config
    limit: int = -1  # kafka.limit, -1 = unlimited (HadoopKafkaConsumer.java:115)
    min_partitions: int | None = None  # oversplit knob for hot partitions
    max_fetch_bytes: int = 1024 * 1024  # max.partition.fetch.bytes (KafkaContext.java:49)
    # Number of topic partitions, used to push the per-partition row cap
    # into endingOffsets (the reference's --partitions flag,
    # HadoopKafkaConsumer.java:116). None → cap applied post-read.
    partitions: int | None = None


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the classpath."""
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
        return True
    except Exception:
        return False


def _require_kafka(spark: SparkSession) -> None:
    if not kafka_available(spark):
        raise RuntimeError(
            f"Kafka source requires the {KAFKA_PACKAGE} connector on the "
            "classpath (submit with --packages). The pipeline logic can be "
            "exercised without a broker via any DataFrame carrying "
            "(partition, offset, value) columns — see pipeline.dedup_pipeline."
        )


def limit_ending_offsets(cfg: KafkaSourceConfig) -> str | None:
    """Push the per-partition row cap into the source as endingOffsets.

    Returns the JSON for ``endingOffsets`` — ``{"topic": {"0": limit,
    ...}}`` — when both the cap and the partition count are known.
    The source then stops READING each partition at the cap (zero
    shuffle, zero discarded fetch), instead of reading the whole topic
    and dropping rows. Matches the reference's semantics, which counts
    records from the log start (seekToBeginning, KafkaContext.java:59):
    offsets are absolute, so this assumes the log begins at offset 0 —
    true unless retention already truncated the head, the same
    situation where the reference's "first N records" is equally
    ill-defined. Pass ``partitions=None`` to fall back to the exact
    post-read cap.
    """
    if cfg.limit and cfg.limit > 0 and cfg.partitions:
        per_part = {str(p): cfg.limit for p in range(cfg.partitions)}
        import json

        return json.dumps({cfg.topic: per_part})
    return None


def read_kafka_batch(spark: SparkSession, cfg: KafkaSourceConfig) -> DataFrame:
    """Bounded whole-topic read: the reference's consume-until-empty-poll.

    The per-partition ``limit`` (reference kafka.limit,
    KafkaInputFormat.java:188) is pushed into ``endingOffsets`` when
    the partition count is known — the scan stops at the cap. Only
    when the partition count is unknown does the cap fall back to a
    post-read ``row_number`` filter, which shuffles once on the
    partition id (N reducers for N topic partitions).
    """
    _require_kafka(spark)
    reader = (
        spark.read.format(KAFKA_FORMAT)
        .option("kafka.bootstrap.servers", cfg.brokers)
        .option("subscribe", cfg.topic)
        .option("startingOffsets", "earliest")
        .option("kafka.max.partition.fetch.bytes", str(cfg.max_fetch_bytes))
    )
    ending = limit_ending_offsets(cfg)
    reader = reader.option("endingOffsets", ending if ending else "latest")
    if cfg.min_partitions:
        reader = reader.option("minPartitions", str(cfg.min_partitions))
    df = reader.load()
    if cfg.limit and cfg.limit > 0 and not ending:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.partitionBy("partition").orderBy("offset")
        df = (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= cfg.limit)
            .drop("__rn")
        )
    return df


def read_kafka_stream(spark: SparkSession, cfg: KafkaSourceConfig) -> DataFrame:
    """Streaming twin; pair with Trigger.AvailableNow for bounded runs.

    NOTE: in streaming mode ``limit`` maps to ``maxOffsetsPerTrigger``,
    a per-trigger RATE limit split across partitions — with
    AvailableNow the whole topic is still consumed, just in capped
    micro-batches. The reference's hard per-partition cap exists only
    on the batch path (read_kafka_batch pushes it into endingOffsets);
    a streaming hard cap would need the cap re-checked inside
    foreachBatch.
    """
    _require_kafka(spark)
    reader = (
        spark.readStream.format(KAFKA_FORMAT)
        .option("kafka.bootstrap.servers", cfg.brokers)
        .option("subscribe", cfg.topic)
        .option("startingOffsets", "earliest")
        .option("kafka.max.partition.fetch.bytes", str(cfg.max_fetch_bytes))
    )
    if cfg.min_partitions:
        reader = reader.option("minPartitions", str(cfg.min_partitions))
    if cfg.limit and cfg.limit > 0:
        reader = reader.option("maxOffsetsPerTrigger", str(cfg.limit))
    return reader.load()
