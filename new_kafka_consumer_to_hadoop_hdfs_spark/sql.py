"""Ad-hoc SQL entry point over the engine's tables.

A user of the reference gets exactly one hardwired job; a user of this
engine also gets the full Spark SQL surface over the same data:
``run_sql`` registers every testdata table as a temp view and executes
an arbitrary query through Catalyst (predicate pushdown, AQE, the
works). Usable as a library call or a one-shot CLI::

    python -m new_kafka_consumer_to_hadoop_hdfs_spark.sql \
        --sf-dir /root/testdata/sf0.01 \
        "SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1"
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession

from .sources.files import register_views


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register every AVAILABLE table as a view and run ``query``.

    Tables whose parquet is absent from ``sf_dir`` are skipped (with a
    stderr note) instead of failing the whole session — a star-schema-
    only directory can still serve star-schema queries; referencing a
    skipped table surfaces the normal TABLE_OR_VIEW_NOT_FOUND error.
    """
    import os
    import sys

    from .session import apply_runtime_conf
    from .sources.files import TABLE_NAMES

    apply_runtime_conf(spark)
    available = [
        n
        for n in TABLE_NAMES
        if os.path.exists(os.path.join(sf_dir, f"{n}.parquet"))
    ]
    missing = sorted(set(TABLE_NAMES) - set(available))
    if missing:
        print(f"run_sql: skipping absent tables {missing}", file=sys.stderr)
    register_views(spark, sf_dir, *available)
    return spark.sql(query)


def main(argv: list[str] | None = None) -> int:
    from .session import get_spark

    p = argparse.ArgumentParser(description="Run SQL over the engine's tables")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--limit", type=int, default=20, help="rows to display")
    p.add_argument("query")
    args = p.parse_args(argv)
    spark = get_spark(app_name="nkch-sql")
    run_sql(spark, args.sf_dir, args.query).show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
