"""Reference dedup edge-case semantics (SURVEY.md §5 item 2, FIXTURES.md §11).

Hand-built kafka_messages rows covering every documented behavior of
HadoopKafkaConsumer.java:47-103 + MyKafkaMessage.java:9-12.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from new_kafka_consumer_to_hadoop_hdfs_spark.functions.message import parse_messages
from new_kafka_consumer_to_hadoop_hdfs_spark.operators.dedup import (
    dedup_exact,
    dedup_last_write_wins,
)

ROWS = [
    # (partition, offset, value)
    # 1. duplicate id within one partition — highest offset wins
    (0, 1, '{"id":1,"msg":"old"}'),
    (0, 2, '{"id":1,"msg":"new"}'),
    # 2. same id in two partitions — one survivor per partition
    (0, 3, '{"id":2,"msg":"p0"}'),
    (1, 4, '{"id":2,"msg":"p1"}'),
    # 3. malformed JSON — dropped
    (0, 5, "{not json"),
    # 4. missing fields — Gson ctor defaults id=0 / msg=""
    (1, 6, '{"msg":"only-msg"}'),
    (1, 7, '{"id":7}'),
    # 5. unknown extra fields ignored
    (2, 8, '{"id":8,"msg":"extra","junk":true}'),
    # 6. null value / JSON literal null — dropped
    (2, 9, None),
    (2, 10, "null"),
    # 7. explicit null id groups with missing-id (both → 0)
    (1, 11, '{"id":null,"msg":"null-id"}'),
    # non-object JSON — Gson throws → dropped
    (2, 12, "[1,2]"),
    (2, 13, "123"),
]


@pytest.fixture(scope="module")
def deduped(spark):
    df = spark.createDataFrame(ROWS, "partition int, offset long, value string")
    parsed = parse_messages(df, "value")
    out = dedup_last_write_wins(
        parsed, keys=["partition", "id"], order_by=[F.col("offset").desc()]
    )
    return {(r.partition, r.id): r for r in out.collect()}


def test_last_write_wins_within_partition(deduped):
    assert deduped[(0, 1)].msg == "new"


def test_per_partition_scope(deduped):
    assert deduped[(0, 2)].msg == "p0"
    assert deduped[(1, 2)].msg == "p1"


def test_malformed_and_null_dropped(deduped):
    assert not any(p == 2 and r.offset in (5, 9, 10, 12, 13) for (p, _), r in deduped.items())
    survivors_p2 = [r for (p, _), r in deduped.items() if p == 2]
    assert len(survivors_p2) == 1 and survivors_p2[0].id == 8


def test_missing_field_defaults(deduped):
    assert deduped[(1, 7)].msg == ""
    # missing-id and null-id group under id=0; highest offset (11) wins
    assert deduped[(1, 0)].msg == "null-id"


def test_unknown_fields_ignored(deduped):
    assert deduped[(2, 8)].msg == "extra"


def test_idempotent(spark, deduped):
    df = spark.createDataFrame(ROWS, "partition int, offset long, value string")
    parsed = parse_messages(df, "value")
    once = dedup_last_write_wins(parsed, ["partition", "id"], [F.col("offset").desc()])
    twice = dedup_last_write_wins(once, ["partition", "id"], [F.col("offset").desc()])
    assert sorted(once.collect()) == sorted(twice.collect())


def test_output_subset_of_valid_input(spark, deduped):
    df = spark.createDataFrame(ROWS, "partition int, offset long, value string")
    parsed = parse_messages(df, "value")
    assert {(r.partition, r.offset) for r in deduped.values()} <= {
        (r.partition, r.offset) for r in parsed.collect()
    }


def test_dedup_exact_arbitrary_keys(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (1, "a", 20), (2, "b", 30)], "k int, s string, v int"
    )
    out = dedup_exact(df, ["k", "s"], keep_order=[F.col("v").desc()])
    assert sorted((r.k, r.s, r.v) for r in out.collect()) == [(1, "a", 20), (2, "b", 30)]


def test_pagerank_ranks_sum_to_one_and_hubs_rank_high(spark):
    """On a symmetric graph PageRank conserves mass (sum = 1), and a
    star center (the boilerplate-hub case the host query exists for)
    must outrank its leaves."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.graph import (
        pagerank_fixed_iterations,
    )

    # star: 0 at the center of 1..4, plus an isolated pair 5-6
    pairs = [(0, i) for i in range(1, 5)] + [(5, 6)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    got = {
        r.node: r.rank
        for r in pagerank_fixed_iterations(edges, iterations=5).collect()
    }
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got[0] > got[1] > 0
    assert abs(got[5] - got[6]) < 1e-12  # symmetric pair ties exactly


def test_pagerank_reliable_checkpoint_matches_local(spark, tmp_path):
    """The cluster mode: ``checkpoint_dir`` switches the three up-front
    materializations (edges / nodes / edge⋈degree) from executor-local
    blocks to reliable ``DataFrame.checkpoint`` files — durability
    parity with ``connected_components_min_label``. Ranks must be
    IDENTICAL to the local mode (same fixed-iteration linear algebra,
    only the lineage-truncation storage differs), the directory must
    actually receive checkpoint data, and the session-global checkpoint
    dir must be restored, not clobbered."""
    import pathlib

    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.graph import (
        pagerank_fixed_iterations,
    )

    ckpt = str(tmp_path / "pr_ckpt")
    caller_ckpt = str(tmp_path / "caller_ckpt")
    sc = spark.sparkContext
    sc.setCheckpointDir(caller_ckpt)
    pairs = [(0, i) for i in range(1, 5)] + [(5, 6)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    local = {
        r.node: r.rank
        for r in pagerank_fixed_iterations(edges, iterations=5).collect()
    }
    reliable = {
        r.node: r.rank
        for r in pagerank_fixed_iterations(
            edges, iterations=5, checkpoint_dir=ckpt
        ).collect()
    }
    assert reliable == local
    written = list(pathlib.Path(ckpt).rglob("*"))
    assert any(p.is_file() for p in written), "no reliable checkpoint files"
    after = sc._jsc.sc().getCheckpointDir()  # noqa: SLF001
    assert after.isDefined() and pathlib.Path(caller_ckpt).name in pathlib.Path(
        after.get()
    ).parts, f"checkpoint dir clobbered: {after}"
