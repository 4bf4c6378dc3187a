"""Differential test: every registered query vs its DuckDB oracle.

This mirrors the driver's CORRECTNESS gate (row-count + schema +
order-insensitive value comparison) at sf0.001 so regressions are
caught locally and fast. Queries without an oracle get a rows-only
sanity check, like the driver's weaker path.
"""

from __future__ import annotations

import pytest

from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry

from ._diff import compare, run_oracle

QUERIES, ORACLES = merged_registry()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    spark_pdf = df.toPandas()
    if name not in ORACLES:
        assert spark_pdf is not None  # rows-only path: just must execute
        return
    oracle_pdf = run_oracle(ORACLES[name], sf_dir)
    problems = compare(name, spark_pdf, oracle_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)
