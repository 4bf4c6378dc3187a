"""SparkSession construction with scale-aware defaults.

The reference wires a Hadoop ``Job`` by hand (HadoopKafkaConsumer.java:106-159);
here the equivalent "job setup" is a SparkSession whose configs let
Catalyst/AQE do the physical planning. Tuned for local[N] testing but
chosen so the same settings are sane on a 1000-executor cluster:

- AQE on (runtime coalescing, skew-join splitting) — replaces any
  hand-tuning of reducer counts.
- shuffle.partitions sized to cores locally; on a real cluster AQE
  coalesces from a high initial number, so the exact value matters less.
- Arrow enabled for the (rare) Pandas-UDF paths.
- UTC session timezone so event-time semantics are deterministic and
  oracle-comparable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def apply_runtime_conf(spark: SparkSession) -> SparkSession:
    """Set runtime-settable confs on an externally provided session.

    The driver harness hands us its own SparkSession; these confs are
    all runtime-mutable so query semantics (timezone, AQE, Arrow) stay
    deterministic regardless of how the session was built.
    """
    conf = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Testdata generations have shipped events.ts as TIMESTAMP(NANOS),
        # which Spark's parquet reader only accepts surfaced as raw int64
        # via this flag (sources/files.py then converts to timestamp).
        # Harmless for MICROS-encoded data; lives here, not in the table
        # loader, so loading a table never mutates session state.
        "spark.sql.legacy.parquet.nanosAsLong": "true",
    }
    for k, v in conf.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - static conf on some builds
            pass
    return spark


def get_spark(
    app_name: str = "new-kafka-consumer-to-hadoop-hdfs-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return apply_runtime_conf(spark)
