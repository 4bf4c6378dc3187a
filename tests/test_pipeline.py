"""End-to-end pipeline tests without a broker (SURVEY.md §5 items 3-4).

The transform core runs on fixture DataFrames shaped like the Kafka
source output; the sink writes real files; the streaming twin runs the
same plan through a file-based stream with AvailableNow + checkpoint.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from new_kafka_consumer_to_hadoop_hdfs_spark.pipeline import (
    build_arg_parser,
    dedup_pipeline,
    serialize_output,
)
from new_kafka_consumer_to_hadoop_hdfs_spark.sources.kafka import (
    KafkaSourceConfig,
    kafka_available,
    read_kafka_batch,
)
from new_kafka_consumer_to_hadoop_hdfs_spark.sources.sinks import (
    stream_json_lines,
    write_json_lines,
)

ROWS = [
    (0, 1, b'{"id":1,"msg":"old"}'),
    (0, 2, b'{"id":1,"msg":"new"}'),
    (1, 3, b'{"id":1,"msg":"other-partition"}'),
    (0, 4, b"{not json"),
    (0, 5, b'{"msg":"no-id"}'),
]


def _messages(spark):
    return spark.createDataFrame(ROWS, "partition int, offset long, value binary")


def test_dedup_pipeline_binary_values(spark):
    out = dedup_pipeline(_messages(spark))
    got = {(r.partition, r.id): r.msg for r in out.collect()}
    assert got == {(0, 1): "new", (1, 1): "other-partition", (0, 0): "no-id"}


def test_serialize_output_json_lines(spark, tmp_path):
    out = serialize_output(dedup_pipeline(_messages(spark)))
    path = str(tmp_path / "out")
    write_json_lines(out, path, line=F.col("value"))
    lines = [json.loads(l) for f in (tmp_path / "out").glob("part-*") for l in f.read_text().splitlines()]
    assert sorted(lines, key=lambda d: (d["id"], d["msg"])) == [
        {"id": 0, "msg": "no-id"},
        {"id": 1, "msg": "new"},
        {"id": 1, "msg": "other-partition"},
    ]


def test_sink_overwrite_idempotent(spark, tmp_path):
    out = serialize_output(dedup_pipeline(_messages(spark)))
    path = str(tmp_path / "out")
    write_json_lines(out, path, line=F.col("value"))
    write_json_lines(out, path, line=F.col("value"))  # re-run: overwrite, no error
    lines = [l for f in (tmp_path / "out").glob("part-*") for l in f.read_text().splitlines()]
    assert len(lines) == 3


def test_streaming_twin_file_source(spark, tmp_path):
    """Same dedup logic driven through a real streaming query."""
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    _messages(spark).write.parquet(str(src_dir / "batch0"))
    stream = (
        spark.readStream.schema("partition int, offset long, value binary")
        .parquet(str(src_dir / "*"))
    )

    epochs = []

    def do_batch(batch_df, epoch_id):
        out = serialize_output(dedup_pipeline(batch_df))
        write_json_lines(out, str(tmp_path / f"out/epoch={epoch_id}"), line=F.col("value"))
        epochs.append(epoch_id)

    q = (
        stream.writeStream.foreachBatch(do_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert epochs, "no micro-batch ran"
    lines = [
        json.loads(l)
        for f in (tmp_path / "out").rglob("part-*")
        for l in f.read_text().splitlines()
    ]
    assert len(lines) == 3

    # exactly-once: re-running from the same checkpoint reprocesses nothing
    rerun_rows: list[int] = []

    def count_batch(batch_df, epoch_id):
        rerun_rows.append(batch_df.count())

    q2 = (
        stream.writeStream.foreachBatch(count_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert sum(rerun_rows) == 0, f"checkpoint replayed rows: {rerun_rows}"
    lines2 = [
        json.loads(l)
        for f in (tmp_path / "out").rglob("part-*")
        for l in f.read_text().splitlines()
    ]
    assert len(lines2) == 3


def test_stream_json_lines_sink(spark, tmp_path):
    src_dir = tmp_path / "ssrc"
    src_dir.mkdir()
    _messages(spark).write.parquet(str(src_dir / "b0"))
    stream = (
        spark.readStream.schema("partition int, offset long, value binary")
        .parquet(str(src_dir / "*"))
        .select(F.col("value").cast("string").alias("value"))
    )
    q = stream_json_lines(stream, str(tmp_path / "sout"), str(tmp_path / "sckpt"))
    q.awaitTermination(120)
    lines = [l for f in (tmp_path / "sout").rglob("part-*") for l in f.read_text().splitlines()]
    assert len(lines) == len(ROWS)


def test_kafka_gated_with_clear_error(spark):
    assert not kafka_available(spark)
    try:
        read_kafka_batch(spark, KafkaSourceConfig())
        raise AssertionError("expected RuntimeError")
    except RuntimeError as e:
        assert "spark-sql-kafka" in str(e)


def test_limit_pushed_into_ending_offsets():
    """kafka.limit with a known partition count becomes endingOffsets —
    the source stops reading at the cap, no shuffle, no discarded rows."""
    import json

    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.kafka import (
        limit_ending_offsets,
    )

    cfg = KafkaSourceConfig(topic="t", limit=100, partitions=3)
    assert json.loads(limit_ending_offsets(cfg)) == {
        "t": {"0": 100, "1": 100, "2": 100}
    }
    # unknown partition count or no limit → no pushdown (exact fallback)
    assert limit_ending_offsets(KafkaSourceConfig(topic="t", limit=100)) is None
    assert limit_ending_offsets(KafkaSourceConfig(topic="t", partitions=3)) is None


def test_run_sql_over_views(spark, sf_dir):
    from new_kafka_consumer_to_hadoop_hdfs_spark.sql import run_sql

    df = run_sql(
        spark,
        sf_dir,
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1",
    )
    rows = {r.l_returnflag: r.n for r in df.collect()}
    assert set(rows) == {"A", "N", "R"} and all(n > 0 for n in rows.values())


def test_cli_flags_reference_parity():
    p = build_arg_parser()
    a = p.parse_args(["-o", "/out", "-t", "topic", "-g", "grp", "-b", "h:9092", "-p", "5"])
    assert (a.output, a.topic, a.consumer_group, a.brokers, a.partitions) == (
        "/out",
        "topic",
        "grp",
        "h:9092",
        5,
    )
    d = p.parse_args(["-o", "/out"])
    assert d.topic == "my_test_kafka_topic" and d.brokers == "localhost:9092" and d.partitions == 3


def test_weighted_sample_partition_layout_independent(spark, sf_dir):
    """Membership must be a pure function of doc_id — identical under
    any repartitioning (the property rand(seed)/F.sample break)."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.plans.llm import (
        pipeline_weighted_sample,
    )

    base = {r.doc_id for r in pipeline_weighted_sample(spark, sf_dir).collect()}
    assert base, "sample came back empty"
    shuffled = pipeline_weighted_sample(spark, sf_dir)
    shuffled = shuffled.repartition(13).cache()
    try:
        assert {r.doc_id for r in shuffled.collect()} == base
    finally:
        shuffled.unpersist()


def test_pii_scrub_counts_and_redacted_bytes(spark):
    """Planted markers are found, counted, and byte-identically
    redacted; text without PII passes through with zero counts."""
    from pyspark.sql import functions as F

    from new_kafka_consumer_to_hadoop_hdfs_spark.plans.llm import (
        _PII_EMAIL,
        _PII_IPV4,
    )

    df = spark.createDataFrame(
        [
            (1, "reach me at a.b-c_d@sub.example.org or 192.168.0.1 ok"),
            (2, "no pii here"),
            (3, "two mails x@y.io z@w.ai one ip 10.0.0.7"),
        ],
        "doc_id long, t string",
    )
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            F.regexp_count("t", F.lit(_PII_EMAIL)).alias("n_emails"),
            F.regexp_count("t", F.lit(_PII_IPV4)).alias("n_ips"),
            F.regexp_replace(
                F.regexp_replace("t", _PII_EMAIL, "[EMAIL]"), _PII_IPV4, "[IP]"
            ).alias("red"),
        ).collect()
    }
    assert (out[1].n_emails, out[1].n_ips) == (1, 1)
    assert out[1].red == "reach me at [EMAIL] or [IP] ok"
    assert (out[2].n_emails, out[2].n_ips) == (0, 0) and out[2].red == "no pii here"
    assert (out[3].n_emails, out[3].n_ips) == (2, 1)
    assert out[3].red == "two mails [EMAIL] [EMAIL] one ip [IP]"


def test_outlier_filter_mad_zero_degenerate(spark):
    """When >half a group sits at the exact median, MAD=0: nothing can
    be scored (every deviation is 'infinitely' many MADs out) — the
    gate must flag rows but emit NULL scores, not divide-by-zero, and
    flag nothing when ALL rows are identical."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.stats import mad_outliers

    docs = spark.createDataFrame(
        [(i, "en", 100) for i in range(5)] + [(9, "en", 900)],
        "doc_id long, lang string, n_chars int",
    )
    out = mad_outliers(
        docs, group_col="lang", value_col="n_chars", k=2.0
    ).collect()
    assert [r.doc_id for r in out] == [9]
    assert out[0].mad_score is None

    uniform = spark.createDataFrame(
        [(i, "en", 100) for i in range(4)], "doc_id long, lang string, n_chars int"
    )
    assert (
        mad_outliers(uniform, group_col="lang", value_col="n_chars", k=2.0).count()
        == 0
    )


def test_mad_outliers_scored_path(spark):
    """Non-degenerate groups get finite signed MAD scores."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.stats import mad_outliers

    docs = spark.createDataFrame(
        [(1, "en", 10), (2, "en", 20), (3, "en", 30), (4, "en", 200), (5, "en", -100)],
        "doc_id long, lang string, n_chars int",
    )
    # median=20, adevs=[10,0,10,180,120] -> MAD=10 (odd count, middle)
    out = {r.doc_id: r.mad_score for r in mad_outliers(
        docs, group_col="lang", value_col="n_chars", k=3.0
    ).collect()}
    assert out == {4: 18.0, 5: -12.0}


def test_token_budget_threshold_is_subset_of_exact_greedy(spark, sf_dir):
    """The binned threshold twin must keep a SUBSET of the exact
    greedy selection (whole bins that fit are, by rank order, the
    first documents the exact form also takes) and undershoot the
    budget by at most one boundary bin — never overshoot."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.plans.llm import (
        pipeline_token_budget_select,
        pipeline_token_budget_threshold,
    )

    exact = {r.doc_id for r in pipeline_token_budget_select(spark, sf_dir).collect()}
    binned = {
        r.doc_id for r in pipeline_token_budget_threshold(spark, sf_dir).collect()
    }
    assert binned, "threshold selection came back empty"
    assert binned <= exact, f"threshold kept docs the exact greedy drops: {sorted(binned - exact)[:5]}"


def test_dedup_keep_best_same_clusters_longer_survivors(spark, sf_dir):
    """keep-best must partition the corpus into the SAME duplicate
    clusters as pipeline_corpus_dedup (cluster_id = the min-label
    component id = exactly the doc corpus_dedup keeps) and its
    survivor can only be the min-id doc or a strictly longer one."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.plans.llm import (
        pipeline_corpus_dedup,
        pipeline_dedup_keep_best,
    )
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import load_table

    min_ids = {r.doc_id for r in pipeline_corpus_dedup(spark, sf_dir).collect()}
    best = pipeline_dedup_keep_best(spark, sf_dir).collect()
    assert {r.cluster_id for r in best} == min_ids
    assert len(best) == len(min_ids)
    n_chars = {
        r.doc_id: r.n_chars
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    for r in best:
        assert r.n_chars == n_chars[r.doc_id]
        assert r.n_chars >= n_chars[r.cluster_id], (
            f"cluster {r.cluster_id}: survivor {r.doc_id} shorter than min-id doc"
        )


def test_quality_buckets_ordered_and_balanced(spark, sf_dir):
    """Within each language, head/middle/tail must be score-ordered at
    bin granularity (every head doc's centinat bin strictly below every
    middle doc's, etc.) and roughly tercile-sized (whole-bin assignment
    may shift a boundary by one bin's docs)."""
    import collections
    import math

    from new_kafka_consumer_to_hadoop_hdfs_spark.plans.llm import (
        pipeline_quality_buckets,
    )

    rows = pipeline_quality_buckets(spark, sf_dir).collect()
    assert rows
    by_lang = collections.defaultdict(lambda: collections.defaultdict(list))
    for r in rows:
        by_lang[r.lang][r.bucket].append(math.floor(r.avg_surprisal * 100))
    for lang, buckets in by_lang.items():
        assert set(buckets) <= {"head", "middle", "tail"}
        if "head" in buckets and "middle" in buckets:
            assert max(buckets["head"]) < min(buckets["middle"]), lang
        if "middle" in buckets and "tail" in buckets:
            assert max(buckets["middle"]) < min(buckets["tail"]), lang
        n = sum(len(v) for v in buckets.values())
        if n >= 30 and len(buckets) == 3:
            # no bucket should be wildly off a tercile
            for name, v in buckets.items():
                assert len(v) / n < 0.75, (lang, name, len(v), n)


def test_corpus_diff_statuses_partition_correctly(spark, sf_dir):
    """Diff statuses must match the deterministic snapshot derivation:
    added = in current only (doc_id%10==0 and %9!=0), removed = in base
    only (%9==0 and %10!=0), changed = in both with the simulated edit
    (%7==0, text non-empty, edit actually alters the fingerprint)."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.plans.llm import (
        pipeline_corpus_diff,
    )
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import load_table

    got = {r.doc_id: r.status for r in pipeline_corpus_diff(spark, sf_dir).collect()}
    ids = {
        r.doc_id: r.n
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.length("text").alias("n"))
        .collect()
    }
    for doc_id, n in ids.items():
        in_base = doc_id % 10 != 0
        in_cur = doc_id % 9 != 0
        edited = in_base and doc_id % 7 == 0 and n > 0
        if in_cur and not in_base:
            assert got.get(doc_id) == "added", doc_id
        elif in_base and not in_cur:
            assert got.get(doc_id) == "removed", doc_id
        elif in_base and in_cur and edited:
            assert got.get(doc_id) == "changed", doc_id
        elif in_base and in_cur:
            assert doc_id not in got, doc_id  # unchanged rows excluded


def test_corpus_diff_null_text_classifies_by_presence(spark, tmp_path, sf_dir):
    """A NULL-text document must classify by row PRESENCE, not by its
    NULL fingerprint: present in both snapshots and unedited -> absent
    from the diff; present only in base -> 'removed'. Also re-checks
    the oracle contract on the null-bearing corpus."""
    import shutil

    from new_kafka_consumer_to_hadoop_hdfs_spark.plans.llm import (
        _CORPUS_DIFF_ORACLE,
        pipeline_corpus_diff,
    )

    from ._diff import compare, run_oracle

    custom = tmp_path / "sfnull"
    custom.mkdir()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        shutil.copy(f"{sf_dir}/{t}.parquet", custom / f"{t}.parquet")
    # doc 11: null text, in base (%10!=0) and cur (%9!=0), not edited
    #   (%7!=0) -> both fps NULL -> unchanged, must NOT appear
    # doc 7: null text, %7==0 so base side is "edited" (edit of NULL
    #   is NULL) -> fps both NULL -> unchanged, must NOT appear
    # doc 27: null text, %9==0 so in base only -> 'removed'
    # doc 40: null text, %10==0 so in cur only -> 'added'
    # doc 13: real text, unedited, in both -> absent
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        (11, None, "en", "web", 0),
        (7, None, "en", "web", 0),
        (27, None, "en", "web", 0),
        (40, None, "en", "web", 0),
        (13, "plain stable text", "en", "web", 17),
    ]
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, str(custom / "documents.parquet"))

    got = {
        r.doc_id: r.status
        for r in pipeline_corpus_diff(spark, str(custom)).collect()
    }
    assert got == {27: "removed", 40: "added"}
    oracle = run_oracle(_CORPUS_DIFF_ORACLE, str(custom))
    probs = compare(
        "pipeline_corpus_diff",
        pipeline_corpus_diff(spark, str(custom)).toPandas(),
        oracle,
    )
    assert not probs, probs


def test_compaction_reduces_files_and_preserves_bytes(spark):
    """`sink_compacted_roundtrip` mechanics: the installed index must
    hold strictly fewer compact part-files than fragmented ones (the
    build refuses to install otherwise — pin that the gate is real),
    and the compacted relation must be row-for-row identical to the
    fragmented one (compaction is byte-invisible to readers)."""
    import pathlib

    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry
    from new_kafka_consumer_to_hadoop_hdfs_spark.plans.corpus import _DOC_SCHEMA

    sf = "/root/testdata/sf0.001"
    queries, _ = merged_registry()
    assert queries["sink_compacted_roundtrip"](spark, sf).count() > 0

    cache_root = pathlib.Path(__file__).resolve().parents[1] / ".bench_cache"
    dests = list(cache_root.glob("documents_compacted_*"))
    assert dests, "compaction cache not installed"
    dest = max(dests, key=lambda p: p.stat().st_mtime)

    def parts(sub: str) -> list[pathlib.Path]:
        return [
            p for p in (dest / sub).iterdir()
            if p.name.startswith("part-") and p.suffix == ".parquet"
        ]

    n_frag, n_compact = len(parts("frag")), len(parts("compact"))
    assert n_compact < n_frag, (n_compact, n_frag)
    frag = spark.read.schema(_DOC_SCHEMA).parquet(str(dest / "frag"))
    compact = spark.read.schema(_DOC_SCHEMA).parquet(str(dest / "compact"))
    assert frag.exceptAll(compact).count() == 0
    assert compact.exceptAll(frag).count() == 0
