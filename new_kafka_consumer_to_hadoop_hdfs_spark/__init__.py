"""PySpark-native analytics engine with the capabilities of
binglliu/new-Kafka-consumer-to-hadoop-hdfs, rebuilt Spark-first.

The reference (see /root/reference, SURVEY.md) is a Hadoop MapReduce job
that reads JSON messages from Kafka, deduplicates them per Kafka
partition by message ``id`` with last-write-wins (highest offset)
semantics, and writes JSON lines to HDFS. This package re-expresses
that pipeline — and the wider analytics surface mandated by the north
star (relational operators, streaming windows, LLM-data-pipeline
dedup/similarity/text/multimodal ops) — as Catalyst-optimized DataFrame
plans designed for 100 TB scale.

Layout:
    session       SparkSession builder with scale-aware defaults
    functions/    column-level building blocks (message JSON, text, vectors)
    operators/    dedup, similarity, multimodal operators
    sources/      Kafka + file sources, JSON-lines sink
    plans/        named relational query builders over the star schema
    streaming/    event-time windows, watermarking, stateful dedup
    pipeline      the faithful reference pipeline (CLI entry)
"""

__version__ = "0.1.0"
