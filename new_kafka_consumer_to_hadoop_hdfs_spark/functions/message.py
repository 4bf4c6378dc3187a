"""Message (de)serialization with the reference's Gson semantics.

Reference behavior (see SURVEY.md §1.1):
- payload schema ``{id: Long, msg: String}`` (MyKafkaMessage.java:5-8)
- tolerant parse: unknown JSON fields ignored, missing fields take the
  no-arg-constructor defaults ``id=0, msg=""`` (MyKafkaMessage.java:9-12)
- malformed JSON / non-object JSON / JSON ``null`` are dropped: Gson
  throws (or returns null) and the reducer skips the record
  (HadoopKafkaConsumer.java:84-89, null checks 58-61)
- serialization is compact JSON via Gson toJson
  (HadoopKafkaConsumer.java:96, MyKafkaMessage.java:37)

Spark mapping, verified against Spark 4.1.2 behavior:
``from_json`` with a ``columnNameOfCorruptRecord`` field marks exactly
the inputs Gson rejects — malformed text, JSON ``null``, scalars,
arrays, and type-mismatched fields (e.g. a float where a Long is
declared) — while missing fields simply come back NULL (→ coalesce to
the ctor defaults). All JVM-side and codegen-friendly: no Python UDF in
this hot path, so the parse scales to 100 TB of Kafka payloads without
serde overhead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# MyKafkaMessage.java:5-8 {Long id; String msg;} + corrupt-record marker
CORRUPT_COL = "_corrupt_message"
MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("msg", T.StringType(), True),
        T.StructField(CORRUPT_COL, T.StringType(), True),
    ]
)

DEFAULT_ID = 0  # MyKafkaMessage.java:10
DEFAULT_MSG = ""  # MyKafkaMessage.java:11


def parse_message(value: Column) -> Column:
    """Parse a JSON message string to struct<id,msg,_corrupt_message>.

    ``_corrupt_message`` is non-null exactly when the reference would
    drop the record; callers filter on :func:`is_valid_message`.
    Missing fields become the Gson ctor defaults (id=0, msg='').
    """
    parsed = F.from_json(value, MESSAGE_SCHEMA, {"columnNameOfCorruptRecord": CORRUPT_COL})
    return F.struct(
        F.coalesce(parsed["id"], F.lit(DEFAULT_ID).cast("long")).alias("id"),
        F.coalesce(parsed["msg"], F.lit(DEFAULT_MSG)).alias("msg"),
        parsed[CORRUPT_COL].alias(CORRUPT_COL),
    )


def is_valid_message(value: Column, parsed: Column) -> Column:
    """The reference's drop conditions (HadoopKafkaConsumer.java:58-61,84-89)."""
    return value.isNotNull() & parsed[CORRUPT_COL].isNull()


def parse_messages(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse + filter a message DataFrame, keeping all other columns.

    Input: any DataFrame with a JSON-string ``value_col``. Output: same
    columns minus ``value_col``, plus ``id`` and ``msg`` with defaults
    applied; rows the reference would drop are filtered out.
    """
    parsed = parse_message(F.col(value_col))
    keep = [c for c in df.columns if c != value_col]
    return (
        df.withColumn("__parsed", parsed)
        .filter(is_valid_message(F.col(value_col), F.col("__parsed")))
        .select(*keep, F.col("__parsed.id").alias("id"), F.col("__parsed.msg").alias("msg"))
    )


def serialize_message(id_col: Column, msg_col: Column) -> Column:
    """Compact JSON rendering, mirroring Gson toJson (HadoopKafkaConsumer.java:96)."""
    return F.to_json(F.struct(id_col.alias("id"), msg_col.alias("msg")))
