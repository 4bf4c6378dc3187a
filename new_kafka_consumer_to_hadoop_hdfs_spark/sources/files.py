"""Parquet table loading for the star schema + extension tables.

At 100 TB the same call works unchanged: ``spark.read.parquet`` plans
one task per row-group-aligned split, pushes filters/column pruning to
the scan, and prunes partitions if the layout is hive-partitioned.
Nothing here collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor:
# region (5 rows) and nation (25 rows) are constant-size in the schema.
# supplier (10k rows/SF) and part (200k rows/SF) grow linearly and are
# multi-GB at the 100 TB target, so they are deliberately NOT listed —
# their join strategy is left to Catalyst/AQE, which broadcasts while
# the build side fits under autoBroadcastJoinThreshold and falls back
# to shuffle joins beyond that.
BROADCASTABLE = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts encoding varies across testdata generations:
        # TIMESTAMP(NANOS) (which Spark's vectorized reader only accepts
        # as raw int64 via the nanosAsLong conf — set session-wide in
        # session.apply_runtime_conf/get_spark, NOT here: a loader must
        # not mutate global session state) or native TIMESTAMP(MICROS).
        # Branch on the observed type so both read to identical
        # microsecond-precision timestamps, matching what DuckDB sees —
        # and fail LOUDLY on any encoding this branch doesn't know,
        # instead of letting a new testdata generation flow silently
        # wrong timestamps into every event-time query.
        try:
            df = spark.read.parquet(path)
        except Exception as exc:
            if "NANOS" in str(exc):
                # Registered queries are protected (their wrapper runs
                # apply_runtime_conf first); this path is a bare session
                # calling load_table directly on NANOS-encoded data.
                raise RuntimeError(
                    "events.parquet carries TIMESTAMP(NANOS), which Spark "
                    "only reads with spark.sql.legacy.parquet.nanosAsLong="
                    "true. Apply session.apply_runtime_conf(spark) (or use "
                    "session.get_spark) before loading tables."
                ) from exc
            raise
        ts_type = df.schema["ts"].dataType.simpleString()
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) surfaced as raw int64 via nanosAsLong
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type not in ("timestamp", "timestamp_ntz"):
            raise TypeError(
                f"events.ts read as {ts_type!r}; expected bigint "
                "(TIMESTAMP(NANOS) via spark.sql.legacy.parquet.nanosAsLong"
                " — is session.apply_runtime_conf applied?), timestamp, or "
                "timestamp_ntz. A new testdata ts encoding must be handled "
                "here explicitly, not passed through."
            )
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register tables as temp views for the SQL API."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
