"""Queries exercising the reference's own operator surface (SURVEY.md §2.1-2.3).

No Kafka broker exists in the test environment, so a deterministic
Kafka-message stream is synthesized from the ``events`` table with pure
relational expressions — identically in Spark and in the DuckDB oracle
SQL — covering every dedup edge case from FIXTURES.md §11: duplicate
ids within a partition, same id across partitions, malformed JSON,
missing id / missing msg fields.

The flagship ``kafka_dedup_lww`` is the reference's whole pipeline
(SURVEY.md §3): parse JSON value → drop invalid → per-partition
last-write-wins dedup by id (HadoopKafkaConsumer.java:47-103).

Scale notes: synth is a narrow projection (no shuffle); parse is
codegen'd from_json; the dedup is one hash-partitioned shuffle on
(partition, id) + per-group sort via row_number — the minimal plan for
LWW semantics, spill-safe, AQE-coalesced. At 100 TB the shuffle keys
are the natural dedup keys, so no better partitioning exists without
pre-bucketed input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.message import parse_messages, serialize_message
from ..operators.dedup import dedup_last_write_wins
from ..session import apply_runtime_conf
from ..sources.files import load_table

N_PARTITIONS = 3  # reference default --partitions (HadoopKafkaConsumer.java:116)

# CASE branches shared (in spirit) between Spark + DuckDB synth: ~1% malformed,
# ~4% missing id, ~5% missing msg, rest complete. id space folded to 50 values
# so every partition sees duplicate ids.
_SYNTH_SQL = """
SELECT
  event_id % 3 AS part_id,
  event_id AS off,
  CASE WHEN event_id % 97 = 0 THEN '{{not json'
       WHEN event_id % 23 = 0 THEN '{{"msg":"' || event_type || '"}}'
       WHEN event_id % 19 = 0 THEN '{{"id":' || CAST(user_id % 50 AS VARCHAR) || '}}'
       ELSE '{{"id":' || CAST(user_id % 50 AS VARCHAR) || ',"msg":"' || event_type || '"}}'
  END AS value
FROM events
"""


def synth_kafka_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic kafka_messages fixture (partition, offset, value) from events."""
    ev = load_table(spark, sf_dir, "events")
    id_str = (F.col("user_id") % 50).cast("string")
    value = (
        F.when(F.col("event_id") % 97 == 0, F.lit("{not json"))
        .when(
            F.col("event_id") % 23 == 0,
            F.concat(F.lit('{"msg":"'), F.col("event_type"), F.lit('"}')),
        )
        .when(F.col("event_id") % 19 == 0, F.concat(F.lit('{"id":'), id_str, F.lit("}")))
        .otherwise(
            F.concat(
                F.lit('{"id":'),
                id_str,
                F.lit(',"msg":"'),
                F.col("event_type"),
                F.lit('"}'),
            )
        )
    )
    return ev.select(
        (F.col("event_id") % N_PARTITIONS).alias("partition"),
        F.col("event_id").alias("offset"),
        value.alias("value"),
    )


def q_kafka_dedup_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference pipeline as one Catalyst plan.

    parse (from_json, Gson defaults) → invalid filter → per-partition
    LWW dedup by id (highest offset wins) → (partition, id, msg).
    """
    apply_runtime_conf(spark)
    msgs = synth_kafka_messages(spark, sf_dir)
    parsed = parse_messages(msgs, "value")
    deduped = dedup_last_write_wins(
        parsed, keys=["partition", "id"], order_by=[F.col("offset").desc()]
    )
    return deduped.select("partition", "id", "msg")


def q_kafka_dedup_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension: global dedup scope (one survivor per id across partitions).

    The natural generalization flagged in SURVEY.md §2.3 A2 — order by
    (offset, partition) for a total, deterministic order.
    """
    apply_runtime_conf(spark)
    msgs = synth_kafka_messages(spark, sf_dir)
    parsed = parse_messages(msgs, "value")
    deduped = dedup_last_write_wins(
        parsed,
        keys=["id"],
        order_by=[F.col("offset").desc()],
        tie_break=[F.col("partition")],
    )
    return deduped.select("id", "msg", F.col("partition").alias("src_partition"))


def q_kafka_parse_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level surface P1-P3: parse, defaults, invalid filter, re-serialize.

    Output includes the round-tripped JSON line exactly as the text sink
    would write it (HadoopKafkaConsumer.java:96-97).
    """
    apply_runtime_conf(spark)
    msgs = synth_kafka_messages(spark, sf_dir)
    parsed = parse_messages(msgs, "value")
    return parsed.select(
        "partition",
        "offset",
        "id",
        "msg",
        serialize_message(F.col("id"), F.col("msg")).alias("json_line"),
    )


_ORACLE_DEDUP_LWW = f"""
WITH msgs AS ({_SYNTH_SQL.format()}),
parsed AS (
  SELECT part_id, off,
         COALESCE(TRY_CAST(json_extract(value, '$.id') AS BIGINT), 0) AS id,
         COALESCE(json_extract_string(value, '$.msg'), '') AS msg
  FROM msgs
  WHERE json_valid(value) AND json_type(value) = 'OBJECT'
)
SELECT part_id AS "partition", id, msg FROM (
  SELECT part_id, id, msg,
         ROW_NUMBER() OVER (PARTITION BY part_id, id ORDER BY off DESC) AS rn
  FROM parsed
) WHERE rn = 1
"""

_ORACLE_DEDUP_GLOBAL = f"""
WITH msgs AS ({_SYNTH_SQL.format()}),
parsed AS (
  SELECT part_id, off,
         COALESCE(TRY_CAST(json_extract(value, '$.id') AS BIGINT), 0) AS id,
         COALESCE(json_extract_string(value, '$.msg'), '') AS msg
  FROM msgs
  WHERE json_valid(value) AND json_type(value) = 'OBJECT'
)
SELECT id, msg, part_id AS src_partition FROM (
  SELECT part_id, id, msg,
         ROW_NUMBER() OVER (PARTITION BY id ORDER BY off DESC, part_id) AS rn
  FROM parsed
) WHERE rn = 1
"""

_ORACLE_PARSE_PROJECT = f"""
WITH msgs AS ({_SYNTH_SQL.format()})
SELECT part_id AS "partition", off AS "offset",
       COALESCE(TRY_CAST(json_extract(value, '$.id') AS BIGINT), 0) AS id,
       COALESCE(json_extract_string(value, '$.msg'), '') AS msg,
       '{{"id":' || CAST(COALESCE(TRY_CAST(json_extract(value, '$.id') AS BIGINT), 0) AS VARCHAR)
         || ',"msg":"' || COALESCE(json_extract_string(value, '$.msg'), '') || '"}}' AS json_line
FROM msgs
WHERE json_valid(value) AND json_type(value) = 'OBJECT'
"""

QUERIES = {
    "kafka_dedup_lww": q_kafka_dedup_lww,
    "kafka_dedup_global": q_kafka_dedup_global,
    "kafka_parse_project": q_kafka_parse_project,
}

ORACLES = {
    "kafka_dedup_lww": _ORACLE_DEDUP_LWW,
    "kafka_dedup_global": _ORACLE_DEDUP_GLOBAL,
    "kafka_parse_project": _ORACLE_PARSE_PROJECT,
}
