"""Streaming-semantics tests via broker-free file-stream harnesses.

Covers SURVEY.md §5 item 4: watermarked dedup, cross-batch stateful
LWW (the reference's argmax semantics over a real stream), and
event-time windows under streaming execution, each compared against
the equivalent batch computation.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from new_kafka_consumer_to_hadoop_hdfs_spark.streaming.dedup import (
    dedup_within_watermark,
    stateful_lww_dedup,
    windowed_event_counts,
)

EVENT_SCHEMA = "partition long, id long, offset long, msg string, ts timestamp"


def _rows(spark, rows):
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def test_stateful_lww_across_micro_batches(spark, tmp_path):
    """A higher offset arriving in a LATER micro-batch must override the
    winner from an earlier batch — the cross-batch case the per-batch
    foreachBatch dedup cannot handle."""
    src = tmp_path / "src"
    src.mkdir()
    # batch 0: two ids on partition 0
    _rows(
        spark,
        [
            (0, 1, 10, "b0-id1", dt.datetime.fromisoformat("2024-01-01 00:00:00")),
            (0, 2, 11, "b0-id2", dt.datetime.fromisoformat("2024-01-01 00:01:00")),
        ],
    ).write.parquet(str(src / "batch0"))
    # batch 1: override id1 with a higher offset, stale update for id2
    _rows(
        spark,
        [
            (0, 1, 99, "b1-id1-new", dt.datetime.fromisoformat("2024-01-01 00:02:00")),
            (0, 2, 5, "b1-id2-stale", dt.datetime.fromisoformat("2024-01-01 00:03:00")),
        ],
    ).write.parquet(str(src / "batch1"))

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    updates: list[tuple] = []

    def collect(batch_df, epoch_id):
        updates.extend(
            (r.partition, r.id, r.offset, r.msg) for r in batch_df.collect()
        )

    q = (
        stateful_lww_dedup(stream)
        .writeStream.foreachBatch(collect)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    final = {}
    for partition, id_, offset, msg in updates:
        final[(partition, id_)] = (offset, msg)
    # id1 overridden by offset 99; id2's stale offset 5 ignored (strict >)
    assert final == {(0, 1): (99, "b1-id1-new"), (0, 2): (11, "b0-id2")}
    # the stale id2 update must not have been emitted at all
    assert (0, 2, 5, "b1-id2-stale") not in updates


import pytest


@pytest.mark.parametrize("provider", ["default", "rocksdb"])
def test_stateful_lww_state_store_providers(spark, tmp_path, provider):
    """The applyInPandasWithState LWW path must be green under BOTH
    state-store providers (VERDICT r8 task 5): the default HDFS-backed
    store AND RocksDB (`rocksdb_state_conf`, shipped since r5 but never
    executed by a test). At 100 TB key cardinality the RocksDB provider
    is the difference between bounded memory and executor OOM — so the
    conf set this repo tells operators to apply has to actually run.
    Same cross-batch override scenario as
    test_stateful_lww_across_micro_batches; same expected winners."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.streaming.dedup import (
        rocksdb_state_conf,
    )

    confs = rocksdb_state_conf() if provider == "rocksdb" else {}
    saved: dict[str, str | None] = {}
    for k in confs:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        src = tmp_path / f"src_{provider}"
        src.mkdir()
        _rows(
            spark,
            [
                (0, 1, 10, "b0-id1", dt.datetime.fromisoformat("2024-01-01 00:00:00")),
                (0, 2, 11, "b0-id2", dt.datetime.fromisoformat("2024-01-01 00:01:00")),
            ],
        ).write.parquet(str(src / "batch0"))
        _rows(
            spark,
            [
                (0, 1, 99, "b1-id1-new", dt.datetime.fromisoformat("2024-01-01 00:02:00")),
                (0, 2, 5, "b1-id2-stale", dt.datetime.fromisoformat("2024-01-01 00:03:00")),
            ],
        ).write.parquet(str(src / "batch1"))
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        updates: list[tuple] = []

        def collect(batch_df, epoch_id):
            updates.extend(
                (r.partition, r.id, r.offset, r.msg) for r in batch_df.collect()
            )

        q = (
            stateful_lww_dedup(stream)
            .writeStream.foreachBatch(collect)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{provider}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        final = {}
        for partition, id_, offset, msg in updates:
            final[(partition, id_)] = (offset, msg)
        assert final == {(0, 1): (99, "b1-id1-new"), (0, 2): (11, "b0-id2")}
        if provider == "rocksdb":
            # the provider conf must actually have been in force — a
            # typo'd class name fails the START, but make the intent
            # explicit for future refactors
            assert "RocksDB" in spark.conf.get(
                "spark.sql.streaming.stateStore.providerClass"
            )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dedup_within_watermark_stream(spark, tmp_path):
    """Duplicate keys within the watermark horizon are dropped; state is
    keyed, so the first arrival wins (keep-first semantics)."""
    src = tmp_path / "wsrc"
    src.mkdir()
    _rows(
        spark,
        [
            (0, 1, 1, "first", dt.datetime.fromisoformat("2024-01-01 00:00:00")),
            (0, 1, 2, "dup-same-key", dt.datetime.fromisoformat("2024-01-01 00:02:00")),
            (0, 7, 3, "other-key", dt.datetime.fromisoformat("2024-01-01 00:03:00")),
        ],
    ).write.parquet(str(src / "b0"))
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(str(src / "*"))
    out = dedup_within_watermark(
        stream, ["partition", "id"], event_time_col="ts", delay="10 minutes"
    )
    got: list[tuple] = []

    def collect(batch_df, epoch_id):
        got.extend((r.partition, r.id, r.msg) for r in batch_df.collect())

    q = (
        out.writeStream.foreachBatch(collect)
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # exactly one survivor per key; which duplicate wins within a single
    # micro-batch is arrival order (not event time) and not guaranteed
    keys = sorted((p, i) for p, i, _ in got)
    assert keys == [(0, 1), (0, 7)]
    assert ("other-key") in {m for _, i, m in got if i == 7}
    assert {m for _, i, m in got if i == 1} <= {"first", "dup-same-key"}


def test_stream_stream_interval_join(spark, tmp_path):
    """Click→purchase attribution across two real streams: purchases
    join their user's click within the preceding hour; out-of-window
    purchases drop."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.streaming.joins import (
        interval_join,
    )

    clicks_dir = tmp_path / "clicks"
    buys_dir = tmp_path / "buys"
    clicks_dir.mkdir()
    buys_dir.mkdir()
    spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 10, 0), "c1"),
            (2, dt.datetime(2024, 1, 1, 11, 0), "c2"),
        ],
        "user long, click_ts timestamp, click_id string",
    ).write.parquet(str(clicks_dir / "b0"))
    spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 10, 30), "p-in-window"),
            (2, dt.datetime(2024, 1, 1, 12, 30), "p-too-late"),
            (3, dt.datetime(2024, 1, 1, 10, 15), "p-no-click"),
        ],
        "user long, buy_ts timestamp, buy_id string",
    ).write.parquet(str(buys_dir / "b0"))

    clicks = spark.readStream.schema(
        "user long, click_ts timestamp, click_id string"
    ).parquet(str(clicks_dir / "*"))
    buys = spark.readStream.schema(
        "user long, buy_ts timestamp, buy_id string"
    ).parquet(str(buys_dir / "*"))

    joined = interval_join(
        clicks, buys, key="user", left_ts="click_ts", right_ts="buy_ts",
        within="1 hour",
    ).select("click_id", "buy_id")
    got: list[tuple] = []

    def collect(batch_df, epoch_id):
        got.extend((r.click_id, r.buy_id) for r in batch_df.collect())

    q = (
        joined.writeStream.foreachBatch(collect)
        .option("checkpointLocation", str(tmp_path / "jckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert sorted(got) == [("c1", "p-in-window")]


def test_per_partition_cap_across_batches(spark, tmp_path):
    """The streaming hard cap must be cumulative: once a partition hits
    the limit, rows from LATER micro-batches are dropped — the behavior
    maxOffsetsPerTrigger (a rate limit) cannot provide."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.streaming.dedup import (
        per_partition_cap,
    )

    src = tmp_path / "capsrc"
    src.mkdir()
    # two batches; partition 0 has 3+2 rows, partition 1 has 1+1
    _rows(
        spark,
        [
            (0, 1, 1, "a", dt.datetime(2024, 1, 1)),
            (0, 2, 2, "b", dt.datetime(2024, 1, 1)),
            (0, 3, 3, "c", dt.datetime(2024, 1, 1)),
            (1, 4, 1, "d", dt.datetime(2024, 1, 1)),
        ],
    ).write.parquet(str(src / "b0"))
    _rows(
        spark,
        [
            (0, 5, 4, "e", dt.datetime(2024, 1, 1)),
            (0, 6, 5, "f", dt.datetime(2024, 1, 1)),
            (1, 7, 2, "g", dt.datetime(2024, 1, 1)),
        ],
    ).write.parquet(str(src / "b1"))

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    cap = per_partition_cap(4)
    got: list[tuple] = []

    def collect(batch_df, epoch_id):
        got.extend((r.partition, r.offset) for r in cap(batch_df).collect())

    q = (
        stream.writeStream.foreachBatch(collect)
        .option("checkpointLocation", str(tmp_path / "capckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    p0 = sorted(o for p, o in got if p == 0)
    p1 = sorted(o for p, o in got if p == 1)
    # file→batch order isn't guaranteed, but the cumulative cap is:
    # partition 0 (5 rows available) emits exactly 4, partition 1 (2
    # rows) stays under the cap and emits everything
    assert len(p0) == 4 and set(p0) <= {1, 2, 3, 4, 5}
    assert p1 == [1, 2]


def test_per_partition_cap_survives_restart(spark, tmp_path):
    """With state_path, a recreated cap (simulating a driver restart)
    resumes the cumulative quota and skips already-applied epochs."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.streaming.dedup import (
        per_partition_cap,
    )

    state = str(tmp_path / "cap_state.json")
    b0 = _rows(
        spark,
        [(0, i, i, f"m{i}", dt.datetime(2024, 1, 1)) for i in range(1, 4)],
    )
    b1 = _rows(
        spark,
        [(0, i, i, f"m{i}", dt.datetime(2024, 1, 1)) for i in range(4, 7)],
    )

    cap1 = per_partition_cap(4, state_path=state)
    assert cap1(b0, epoch_id=0).count() == 3  # 3 of quota 4 spent

    # "restart": fresh cap instance from the same state file
    cap2 = per_partition_cap(4, state_path=state)
    assert cap2(b0, epoch_id=0).count() == 0  # replayed epoch: nothing
    assert cap2(b1, epoch_id=1).count() == 1  # only 1 left of the quota
    # and the emitted row is the lowest offset of the new batch
    cap3 = per_partition_cap(4, state_path=state)
    assert cap3(b1, epoch_id=1).count() == 0  # epoch 1 now applied too


def test_per_partition_cap_mid_epoch_crash_replay(spark, tmp_path):
    """A crash AFTER the sink wrote an epoch but BEFORE the cap's state
    save (the mid-epoch window: state file present, epoch NOT in
    applied_epochs) must neither double-spend the quota nor stall.

    The quota and the applied-epoch set are saved atomically TOGETHER
    after the epoch, so the crash leaves the state exactly as of the
    last completed epoch; the replayed epoch then re-runs as if for the
    first time, re-emitting the identical deterministic row set (the
    trim orders by offset) for the sink's per-epoch overwrite to
    absorb, and is counted exactly once."""
    import json

    from new_kafka_consumer_to_hadoop_hdfs_spark.streaming.dedup import (
        per_partition_cap,
    )

    state = str(tmp_path / "cap_state.json")
    b0 = _rows(
        spark,
        [(0, i, i, f"m{i}", dt.datetime(2024, 1, 1)) for i in range(1, 4)],
    )
    b1 = _rows(
        spark,
        [(0, i, i, f"m{i}", dt.datetime(2024, 1, 1)) for i in range(4, 9)],
    )

    cap1 = per_partition_cap(4, state_path=state)
    assert cap1(b0, epoch_id=0).count() == 3
    pre_epoch1 = open(state).read()  # snapshot: epoch 0 saved, epoch 1 not

    first = sorted(r.offset for r in cap1(b1, epoch_id=1).collect())
    assert first == [4]  # 1 left of the quota, lowest offset wins
    # crash before _save would have persisted epoch 1: restore snapshot
    with open(state, "w") as fh:
        fh.write(pre_epoch1)

    cap2 = per_partition_cap(4, state_path=state)  # driver replacement
    replay = sorted(r.offset for r in cap2(b1, epoch_id=1).collect())
    assert replay == first, "replayed epoch must re-emit the identical rows"
    saved = json.loads(open(state).read())
    assert saved["consumed"] == {"0": 4}, "quota counted once, not twice"
    assert saved["epochs"] == [0, 1]
    # quota exhausted: a later epoch contributes nothing but doesn't stall
    b2 = _rows(spark, [(0, 9, 9, "m9", dt.datetime(2024, 1, 1))])
    assert cap2(b2, epoch_id=2).count() == 0


def test_session_window_stream_equals_batch(spark, tmp_path, sf_dir):
    """Streaming session windows (watermarked, update mode) must settle
    to exactly the batch session result once the source drains."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import load_table

    events = load_table(spark, sf_dir, "events").select("ts", "user_id")
    src = tmp_path / "ssrc2"
    events.write.parquet(str(src))
    stream = spark.readStream.schema("ts timestamp, user_id long").parquet(str(src))

    out = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "8 hours").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    got: list[tuple] = []

    def collect(batch_df, epoch_id):
        got.extend(
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in batch_df.collect()
        )

    # session windows support append mode only: a session is emitted
    # once, when the watermark passes its close (AvailableNow runs the
    # extra no-data batch that advances the watermark and flushes)
    q = (
        out.writeStream.foreachBatch(collect)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    final = {(uid, ss): (se, n) for uid, ss, se, n in got}
    expected = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in (
            events.groupBy(F.session_window("ts", "8 hours").alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events",
            )
        ).collect()
    }
    # append emits a session only once the watermark passes its close;
    # sessions still open at end-of-stream (close > max_ts - delay)
    # correctly remain in state and never appear
    import datetime as _dt

    max_ts = events.agg(F.max("ts")).first()[0]
    watermark = max_ts - _dt.timedelta(hours=1)
    closed = {k: v for k, v in expected.items() if v[0] <= watermark}
    still_open = {k: v for k, v in expected.items() if v[0] > watermark}
    assert final == closed
    assert all(k not in final for k in still_open)


def test_windowed_counts_stream_equals_batch(spark, tmp_path, sf_dir):
    """The streaming windowed aggregation must produce exactly the
    batch result once the AvailableNow run drains the source."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import load_table

    events = load_table(spark, sf_dir, "events").select("ts", "event_type")
    src = tmp_path / "esrc"
    events.write.parquet(str(src))

    stream = spark.readStream.schema("ts timestamp, event_type string").parquet(
        str(src)
    )
    got: list[tuple] = []

    def collect(batch_df, epoch_id):
        got.extend(
            (r.window_start, r.window_end, r.event_type, r.n_events)
            for r in batch_df.collect()
        )

    q = (
        windowed_event_counts(stream)
        .writeStream.foreachBatch(collect)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "eckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    expected = sorted(
        (r.window_start, r.window_end, r.event_type, r.n_events)
        for r in (
            events.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"))
            .select(
                F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type",
                "n_events",
            )
        ).collect()
    )
    # update-mode may emit a window more than once; the LAST emit per
    # (window, type) is the final count
    final = {}
    for ws, we, et, n in got:
        final[(ws, we, et)] = n
    assert sorted((k[0], k[1], k[2], v) for k, v in final.items()) == expected


def test_streaming_decontaminate_equals_batch(spark, tmp_path, sf_dir):
    """Incremental decontamination over micro-batches must settle to
    exactly the batch sweep: per-doc gram hits don't cross documents,
    so the union of per-batch probe results is the batch result."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.text import (
        contamination_hits,
    )
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import load_table
    from new_kafka_consumer_to_hadoop_hdfs_spark.streaming.hygiene import (
        decontaminate_batch_fn,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)

    src = tmp_path / "docsrc"
    # several files so AvailableNow + maxFilesPerTrigger yields several
    # micro-batches, exercising index reuse across triggers
    corpus.repartition(4).write.parquet(str(src))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)  # source option: real multi-batch run
        .parquet(str(src))
    )

    got: list[tuple] = []

    epochs: set[int] = set()

    def sink(hits_df, epoch_id):
        epochs.add(epoch_id)
        got.extend((r.doc_id, r.n_benchmark_grams) for r in hits_df.collect())

    q = (
        stream.writeStream.foreachBatch(decontaminate_batch_fn(bench, sink))
        .option("checkpointLocation", str(tmp_path / "dckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    expected = {
        (r.doc_id, r.n_benchmark_grams)
        for r in contamination_hits(corpus, bench, "doc_id", "text", n=4).collect()
    }
    assert len(epochs) >= 2  # the run really was incremental
    assert set(got) == expected
    assert len(got) == len(expected)  # no doc reported twice across batches


def test_streaming_quality_score_equals_batch(spark, tmp_path, sf_dir):
    """Micro-batch surprisal scoring against a FIXED reference LM must
    settle to exactly the batch sweep (scores never cross documents),
    and the reference/probe split must actually exercise the OOV
    escape path."""
    from pyspark.sql import functions as F

    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.text import (
        bigram_count_index,
        score_against_bigram_index,
    )
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import load_table
    from new_kafka_consumer_to_hadoop_hdfs_spark.streaming.hygiene import (
        quality_score_batch_fn,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    reference = docs.filter(F.col("doc_id") % 3 == 0)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)

    src = tmp_path / "qsrc"
    corpus.repartition(4).write.parquet(str(src))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )

    got: list[tuple] = []
    epochs: set[int] = set()

    def sink(scores_df, epoch_id):
        epochs.add(epoch_id)
        got.extend(
            (r.doc_id, r.n_bigrams, r.n_oov, r.avg_surprisal, r.max_surprisal)
            for r in scores_df.collect()
        )

    fn = quality_score_batch_fn(reference, sink)
    q = (
        stream.writeStream.foreachBatch(fn)
        .option("checkpointLocation", str(tmp_path / "qckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    fn.lm_index.unpersist()

    index = bigram_count_index(reference, "text")
    n_total = int(index.agg(F.sum("__c2")).first()[0])
    expected = {
        (r.doc_id, r.n_bigrams, r.n_oov, r.avg_surprisal, r.max_surprisal)
        for r in score_against_bigram_index(
            corpus, "doc_id", "text", index, n_index_bigrams=n_total
        ).collect()
    }
    assert len(epochs) >= 2  # genuinely incremental
    assert set(got) == expected
    assert len(got) == len(expected)  # no doc scored twice across batches
    assert any(t[2] > 0 for t in got)  # OOV escape actually exercised


def test_cdc_merge_tombstone_and_no_resurrection(spark, tmp_path):
    """A delete marker must emit a tombstone, and an upsert OLDER than
    the delete (same or earlier batch) must stay suppressed — dropping
    state on delete would resurrect the key."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.streaming.cdc import (
        CDC_INPUT_SCHEMA,
        stateful_cdc_merge,
    )

    src = tmp_path / "cdc_src"
    src.mkdir()
    # one FILE per logical batch + maxFilesPerTrigger=1 below: without
    # this, availableNow ingests every file in a single epoch and the
    # cross-batch state path (state.exists) is never exercised
    spark.createDataFrame(
        [(1, 100, 1, "U", 10.0), (2, 100, 2, "U", 20.0),
         (3, 100, 9, "U", None)],  # NULL upsert value must STAY null
        CDC_INPUT_SCHEMA,
    ).coalesce(1).write.parquet(str(src / "batch0"))
    spark.createDataFrame(
        [
            (1, 300, 3, "D", 0.0),   # delete wins for key 1
            (1, 200, 4, "U", 11.0),  # older than the delete: suppressed
            (2, 50, 5, "U", 21.0),   # stale for key 2: no emission
        ],
        CDC_INPUT_SCHEMA,
    ).coalesce(1).write.parquet(str(src / "batch1"))

    stream = (
        spark.readStream.schema(CDC_INPUT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = stateful_cdc_merge(stream)
    captured: list = []

    def sink(df, epoch_id):
        pdf = df.toPandas()
        pdf["epoch"] = epoch_id
        captured.append(pdf)

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    import pandas as pd

    all_rows = pd.concat(captured, ignore_index=True)
    # the invariant is CROSS-batch: the run must really have had >1 epoch
    assert all_rows["epoch"].nunique() >= 2, all_rows
    # final state per key = its row in the highest epoch that emitted it
    final = (
        all_rows.sort_values("epoch").groupby("key").tail(1).set_index("key")
    )
    assert bool(final.loc[1, "is_tombstone"]) is True
    assert final.loc[1, "seq"] == 3
    assert pd.isna(final.loc[1, "value"])
    assert bool(final.loc[2, "is_tombstone"]) is False
    assert final.loc[2, "value"] == 20.0  # the stale 21.0 never won
    # key 2 must not have emitted anything in the second epoch
    k2 = all_rows[all_rows["key"] == 2]
    assert len(k2) == 1
    # NULL upsert value preserved as NULL (not NaN-coerced-to-float),
    # matching the batch twin's struct-max NULL semantics
    assert bool(final.loc[3, "is_tombstone"]) is False
    assert pd.isna(final.loc[3, "value"])


def test_cdc_merge_stream_equals_batch(spark, tmp_path, sf_dir):
    """Streaming the events changelog through stateful_cdc_merge in two
    micro-batches must converge to the batch pipeline_cdc_merge state:
    same survivor keys and values, tombstones exactly for the keys the
    batch query drops."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.plans.corpus import (
        pipeline_cdc_merge,
    )
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import load_table
    from new_kafka_consumer_to_hadoop_hdfs_spark.streaming.cdc import (
        CDC_INPUT_SCHEMA,
        stateful_cdc_merge,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("key"),
        # ts is TIMESTAMP_NTZ; session tz is UTC in tests, so the cast
        # gives the same epoch the pandas .value comparison below uses
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        F.col("value").cast("double").alias("value"),
    )
    src = tmp_path / "cdc_events"
    src.mkdir()
    # one file per half + maxFilesPerTrigger=1 → two real epochs, so
    # convergence is tested across state carried between micro-batches
    ev.filter(F.col("seq") % 2 == 0).coalesce(1).write.parquet(str(src / "b0"))
    ev.filter(F.col("seq") % 2 == 1).coalesce(1).write.parquet(str(src / "b1"))

    stream = (
        spark.readStream.schema(CDC_INPUT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    captured: list = []

    def sink(df, epoch_id):
        pdf = df.toPandas()
        pdf["epoch"] = epoch_id
        captured.append(pdf)

    q = (
        stateful_cdc_merge(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    import pandas as pd

    all_rows = pd.concat(captured, ignore_index=True)
    assert all_rows["epoch"].nunique() >= 2, "convergence must span epochs"
    final = all_rows.sort_values("epoch").groupby("key").tail(1)
    stream_live = {
        int(r.key): (int(r.ts_us), round(float(r.value), 6))
        for r in final.itertuples()
        if not r.is_tombstone
    }
    batch = pipeline_cdc_merge(spark, sf_dir).toPandas()
    batch_live = {
        int(r.user_id): (
            int(pd.Timestamp(r.last_ts).value // 1000),
            round(float(r.last_value), 6),
        )
        for r in batch.itertuples()
    }
    assert stream_live == batch_live
    # every key must appear in the stream output; tombstoned keys are
    # exactly the all-keys minus batch survivors
    all_keys = {int(k) for k in final["key"]}
    tombstoned = all_keys - set(stream_live)
    batch_all = {
        int(r[0])
        for r in load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .collect()
    }
    assert all_keys == batch_all
    assert tombstoned == batch_all - set(batch_live)


def test_trending_tokens_stream_equals_batch(spark, tmp_path):
    """Streaming windowed token counts (append mode, watermark-closed
    windows) + foreachBatch top-k must equal the batch twin on the
    same documents. A sentinel doc far in the future advances the
    watermark so both content windows close under availableNow."""
    import datetime as dt

    import pandas as pd

    from new_kafka_consumer_to_hadoop_hdfs_spark.streaming.trending import (
        batch_trending_tokens,
        topk_per_window,
        windowed_token_counts,
    )

    t0 = dt.datetime.fromisoformat("2024-03-01 00:10:00")
    t1 = dt.datetime.fromisoformat("2024-03-01 01:10:00")
    far = dt.datetime.fromisoformat("2024-03-02 00:00:00")
    rows = [
        (t0, "a a a b c"),
        (t0, "b b c"),
        (t1, "x y y"),
        (t1, "y x x x"),
        (far, "zzz"),  # watermark pusher; its own window never closes
    ]
    schema = "ts timestamp, text string"
    src = tmp_path / "docs"
    src.mkdir()
    spark.createDataFrame(rows[:3], schema).coalesce(1).write.parquet(
        str(src / "b0")
    )
    spark.createDataFrame(rows[3:], schema).coalesce(1).write.parquet(
        str(src / "b1")
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    counts = windowed_token_counts(
        stream, window="1 hour", watermark="10 minutes"
    )
    captured: list = []
    epochs: list = []

    def sink(df, epoch_id):
        epochs.append(epoch_id)
        captured.append(topk_per_window(df, 2).toPandas())

    q = (
        counts.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # the cross-micro-batch claim needs real epochs (SCALE.md rule)
    assert len(set(epochs)) >= 2, epochs
    got = pd.concat(captured, ignore_index=True)
    # append mode emits each closed window exactly once, so per-window
    # top-k inside foreachBatch is computed over complete counts
    batch = batch_trending_tokens(
        spark.createDataFrame(rows[:4], schema), window="1 hour", k=2
    ).toPandas()
    key = ["window_start", "token"]
    got_s = got.sort_values(key).reset_index(drop=True)
    batch_s = batch.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_s[["window_start", "token", "cnt", "rnk"]],
        batch_s[["window_start", "token", "cnt", "rnk"]],
    )


def test_stateful_lww_state_survives_query_restart(spark, tmp_path):
    """State-store recovery: stop the query after batch 0, then start a
    NEW query from the same checkpoint with more files present. The
    recovered state must still suppress a stale (lower-offset) update
    and accept a higher-offset override — cross-RESTART, not just
    cross-micro-batch."""
    src = tmp_path / "rsrc"
    src.mkdir()
    ckpt = str(tmp_path / "rckpt")
    _rows(
        spark,
        [
            (0, 1, 50, "gen1-id1", dt.datetime(2024, 1, 1, 0, 0)),
            (0, 2, 60, "gen1-id2", dt.datetime(2024, 1, 1, 0, 1)),
        ],
    ).coalesce(1).write.parquet(str(src / "b0"))

    emitted: list[tuple] = []

    def collect(batch_df, epoch_id):
        emitted.extend(
            (r.partition, r.id, r.offset, r.msg) for r in batch_df.collect()
        )

    def run_once():
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = (
            stateful_lww_dedup(stream)
            .writeStream.foreachBatch(collect)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()  # generation 1: only b0
    assert {(p, i): (o, m) for p, i, o, m in emitted} == {
        (0, 1): (50, "gen1-id1"),
        (0, 2): (60, "gen1-id2"),
    }

    # new files arrive while the query is DOWN
    _rows(
        spark,
        [
            (0, 1, 99, "gen2-id1-wins", dt.datetime(2024, 1, 1, 0, 2)),
            (0, 2, 10, "gen2-id2-stale", dt.datetime(2024, 1, 1, 0, 3)),
        ],
    ).coalesce(1).write.parquet(str(src / "b1"))

    emitted.clear()
    run_once()  # generation 2: must resume from recovered state

    # only the genuine override is emitted; the stale update is
    # suppressed BY RECOVERED STATE (this generation never saw b0)
    assert emitted == [(0, 1, 99, "gen2-id1-wins")]


def test_session_funnel_stream_equals_batch(spark, tmp_path, sf_dir):
    """Streaming session-funnel detection (watermarked session_window +
    per-session path fold + foreachBatch regex) must emit exactly the
    batch twin's CLOSED matching sessions, each exactly once — and the
    cross-micro-batch path order must be (ts, event_id), not arrival
    order."""
    import datetime as _dt

    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import load_table
    from new_kafka_consumer_to_hadoop_hdfs_spark.streaming.funnel import (
        funnel_matches,
        sessionized_paths,
    )

    events = load_table(spark, sf_dir, "events").select(
        "ts", "user_id", "event_id", "event_type"
    )
    src = tmp_path / "fsrc"
    events.write.parquet(str(src))
    stream = spark.readStream.schema(
        "ts timestamp, user_id long, event_id long, event_type string"
    ).parquet(str(src))

    got: list[tuple] = []

    def collect(batch_df, epoch_id):
        got.extend(
            (r.user_id, r.session_start, r.n_events, r.path)
            for r in funnel_matches(batch_df).collect()
        )

    q = (
        sessionized_paths(stream)
        .writeStream.foreachBatch(collect)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "fckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    batch_rows = funnel_matches(sessionized_paths(events)).collect()
    batch = {
        (r.user_id, r.session_start): (r.n_events, r.path)
        for r in batch_rows
    }
    max_ts = events.agg(F.max("ts")).first()[0]
    watermark = max_ts - _dt.timedelta(hours=1)
    # append emits a session exactly when the watermark passed its
    # close (session_end = last event + gap — the batch twin carries
    # it); later sessions correctly remain in state, unemitted
    closed = {
        (r.user_id, r.session_start): (r.n_events, r.path)
        for r in batch_rows
        if r.session_end <= watermark
    }
    final = {(uid, ss): (n, p) for uid, ss, n, p in got}
    assert len(final) == len(got), "a session was emitted more than once"
    assert final == closed, (
        set(final) ^ set(closed),
    )
    assert final, "no funnel sessions closed — vacuous test"


def test_stateful_ewma_stream_equals_batch(spark, tmp_path, sf_dir):
    """Incrementally-maintained EWMA (applyInPandasWithState, one
    (ewma, n) pair per user) must converge to EXACTLY the batch
    ordered-fold result when events arrive time-ordered across
    micro-batches — the sequential in-batch fold keeps it bit-exact,
    so the comparison is equality on the rounded values, no
    tolerance."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import load_table
    from new_kafka_consumer_to_hadoop_hdfs_spark.streaming.smoothing import (
        stateful_ewma,
    )

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    # split into three time-ordered files so state must carry across
    # micro-batches (maxFilesPerTrigger=1)
    lo, hi = events.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / 3
    src = tmp_path / "esrc"
    for i in range(3):
        part = events.filter(
            (F.col("ts") >= lo + i * span)
            & (F.col("ts") < (lo + (i + 1) * span if i < 2 else hi + span))
        )
        part.coalesce(1).write.parquet(str(src / f"b{i}"))

    stream = (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_id long, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    latest: dict[int, tuple] = {}

    def collect(batch_df, epoch_id):
        for r in batch_df.collect():
            latest[r.user_id] = (r.n_events, round(r.ewma_last, 6))

    q = (
        stateful_ewma(stream)
        .writeStream.foreachBatch(collect)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "eckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    queries, _ = merged_registry()
    batch = {
        r.user_id: (r.n_events, r.ewma_last)
        for r in queries["event_ewma_smoothing"](spark, sf_dir).collect()
    }
    assert latest == batch
    assert len(latest) > 3, "too few users — vacuous equivalence"


def test_stateful_ewma_multichunk_group_sorted_once(spark, tmp_path):
    """A key whose micro-batch spans MULTIPLE Arrow chunks (rows split
    at arrow.maxRecordsPerBatch) must still fold in (ts, event_id)
    order — per-chunk sorting would fold shuffle-arrival order and
    silently diverge (review r7). Rows are written REVERSE-time so the
    un-concatenated fold is guaranteed wrong."""
    import datetime as _dt

    from new_kafka_consumer_to_hadoop_hdfs_spark.streaming.smoothing import (
        stateful_ewma,
    )

    t0 = _dt.datetime(2024, 1, 1)
    n = 100
    rows = [
        (0, t0 + _dt.timedelta(minutes=i), i, float(i % 7))
        for i in reversed(range(n))  # arrival order = reverse time
    ]
    src = tmp_path / "mcsrc"
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    ).coalesce(1).write.parquet(str(src / "b0"))

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        stream = spark.readStream.schema(
            "user_id long, ts timestamp, event_id long, value double"
        ).parquet(str(src / "*"))
        got: list[tuple] = []

        def collect(batch_df, epoch_id):
            got.extend(
                (r.user_id, r.n_events, r.ewma_last) for r in batch_df.collect()
            )

        q = (
            stateful_ewma(stream)
            .writeStream.foreachBatch(collect)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "mcckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

    s = None
    for i in range(n):  # chronological fold
        v = float(i % 7)
        s = v if s is None else s * 0.7 + v * 0.3
    assert got == [(0, n, s)]


@pytest.mark.parametrize("provider", ["default", "rocksdb"])
def test_streaming_bmp_decode_equals_batch(spark, tmp_path, sf_dir, provider):
    """The REAL-codec multimodal path must work inside micro-batches
    (VERDICT r9 task 4: the codec seam was batch-only, but the
    reference's whole identity is a streaming ingest —
    KafkaContext.java:124-156 consume→transform→store): stream the
    documents table file-by-file, encode genuine 24-bit BMPs and
    decode them with the stdlib codec INSIDE each micro-batch
    (chained mapInPandas on an unbounded DF), roll the channel stats
    up into a stateful per-(width, height) aggregate, and require the
    settled result to equal the batch twin — under BOTH state-store
    providers, like the LWW path above."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.multimodal import (
        decode_bmp_stats,
        documents_as_bmp_assets,
    )
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import load_table
    from new_kafka_consumer_to_hadoop_hdfs_spark.streaming.dedup import (
        rocksdb_state_conf,
    )

    confs = rocksdb_state_conf() if provider == "rocksdb" else {}
    saved: dict[str, str | None] = {}
    for k in confs:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        src = tmp_path / f"bmpsrc_{provider}"
        # 3 files → 3 micro-batches under maxFilesPerTrigger=1: the
        # rollup must MERGE decoded stats across batches, so the state
        # store is genuinely engaged (a single batch would pass with a
        # stateless agg)
        docs.repartition(3).write.parquet(str(src))

        def rollup(stats):
            return stats.groupBy("width", "height").agg(
                F.count("*").alias("n_assets"),
                F.sum("sum_r").alias("total_r"),
                F.sum("pos_weighted_r").alias("total_pwr"),
            )

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        decoded = decode_bmp_stats(documents_as_bmp_assets(stream))
        updates: list[tuple] = []

        def collect(batch_df, epoch_id):
            updates.extend(
                (r.width, r.height, r.n_assets, r.total_r, r.total_pwr)
                for r in batch_df.collect()
            )

        q = (
            rollup(decoded)
            .writeStream.foreachBatch(collect)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / f"bmpckpt_{provider}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

        # update-mode re-emits a key per batch; the LAST emit is final
        final = {}
        for w, h, n, tr, tpwr in updates:
            final[(w, h)] = (n, tr, tpwr)
        expected = {
            (r.width, r.height): (r.n_assets, r.total_r, r.total_pwr)
            for r in rollup(
                decode_bmp_stats(
                    documents_as_bmp_assets(spark.read.parquet(str(src)))
                )
            ).collect()
        }
        assert final == expected
        assert len(expected) > 1  # the fixture yields several (w, h) shapes
        if provider == "rocksdb":
            assert "RocksDB" in spark.conf.get(
                "spark.sql.streaming.stateStore.providerClass"
            )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.mark.parametrize("provider", ["default", "rocksdb"])
def test_streaming_wav_decode_equals_batch(spark, tmp_path, sf_dir, provider):
    """The WAV codec gets the streaming treatment BMP got (VERDICT r10
    task 4): stream the documents table file-by-file, encode genuine
    RIFF/WAVE PCM containers and chunk-walk-decode them INSIDE each
    micro-batch (chained mapInPandas on an unbounded DF), roll the
    amplitude stats into a stateful per-(channels, sample_rate)
    aggregate, and require the settled result to equal the batch twin —
    under BOTH state-store providers. The position-weighted amplitude
    sum means a decoder that mis-walks chunks across the batch boundary
    cannot cancel out."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.multimodal import (
        decode_wav_stats,
        documents_as_wav_assets,
    )
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import load_table
    from new_kafka_consumer_to_hadoop_hdfs_spark.streaming.dedup import (
        rocksdb_state_conf,
    )

    confs = rocksdb_state_conf() if provider == "rocksdb" else {}
    saved: dict[str, str | None] = {}
    for k in confs:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        src = tmp_path / f"wavsrc_{provider}"
        # 3 files → 3 micro-batches under maxFilesPerTrigger=1: the
        # rollup must MERGE decoded stats across batches, so the state
        # store is genuinely engaged
        docs.repartition(3).write.parquet(str(src))

        def rollup(stats):
            return stats.groupBy("channels", "sample_rate").agg(
                F.count("*").alias("n_assets"),
                F.sum("n_frames").alias("total_frames"),
                F.sum("sum_amp").alias("total_amp"),
                F.sum("pos_weighted_amp").alias("total_pwa"),
            )

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        decoded = decode_wav_stats(documents_as_wav_assets(stream))
        updates: list[tuple] = []

        def collect(batch_df, epoch_id):
            updates.extend(
                (r.channels, r.sample_rate, r.n_assets, r.total_frames,
                 r.total_amp, r.total_pwa)
                for r in batch_df.collect()
            )

        q = (
            rollup(decoded)
            .writeStream.foreachBatch(collect)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / f"wavckpt_{provider}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

        # update-mode re-emits a key per batch; the LAST emit is final
        final = {}
        for ch, sr, n, tf, ta, tpwa in updates:
            final[(ch, sr)] = (n, tf, ta, tpwa)
        expected = {
            (r.channels, r.sample_rate):
                (r.n_assets, r.total_frames, r.total_amp, r.total_pwa)
            for r in rollup(
                decode_wav_stats(
                    documents_as_wav_assets(spark.read.parquet(str(src)))
                )
            ).collect()
        }
        assert final == expected
        # the fixture rule spreads docs over up to 2×3 (ch, rate) shapes
        assert len(expected) > 1
        if provider == "rocksdb":
            assert "RocksDB" in spark.conf.get(
                "spark.sql.streaming.stateStore.providerClass"
            )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.mark.parametrize("clustered", [False, True])
def test_streaming_append_online_compaction(spark, tmp_path, sf_dir, clustered):
    """Compaction behind a REAL streaming ingest (VERDICT r10 task 5):
    `sink_compacted_roundtrip` fragments with a batch repartition; here
    the fragmented state is produced the way production produces it —
    a file stream appending one micro-batch at a time through
    `append_batch` — with `compact` running BETWEEN micro-batches, and
    the reader invariant asserted at every step: a read through the
    manifest pointer sees EVERY committed row, at every moment, with
    no partial-file window (the pointer flip is an atomic rename), and
    a reader that resolved the pointer BEFORE a compaction still reads
    its full snapshot afterwards (superseded files survive until
    vacuum). The ``clustered`` variant runs the SAME ingest with the
    range-clustered rewrite (the production compactor shape) and
    additionally asserts every online compaction leaves the live set
    fully stats-covered — data skipping survives each rewrite."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import load_table
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        append_batch,
        compact,
        read_manifest,
        read_snapshot,
        read_table,
        vacuum,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    schema = "doc_id long, text string"
    src = tmp_path / "compsrc"
    docs.repartition(6).write.parquet(str(src))
    all_ids = {r.doc_id for r in docs.collect()}

    root = str(tmp_path / "table")
    committed: set[int] = set()
    checks: list[str] = []

    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        manifest_stats,
    )

    def ingest(batch_df, epoch_id):
        append_batch(batch_df, root, epoch_id,
                     stats_col="doc_id" if clustered else None)
        committed.update(r.doc_id for r in batch_df.collect())
        seen = {r.doc_id for r in read_table(spark, root, schema).collect()}
        assert seen == committed, f"epoch {epoch_id}: append not fully visible"
        pre_name, pre_files = read_manifest(root)
        if epoch_id % 2 == 1:
            # online compaction between micro-batches: tiny target so
            # the fixture's KB-scale files genuinely compact
            reduced = compact(
                spark, root, schema, target_bytes=1 << 20,
                cluster=clustered,
                stats_col="doc_id" if clustered else None,
            )
            assert reduced > 0, f"epoch {epoch_id}: compaction was a no-op"
            if clustered:
                name, live_now = read_manifest(root)
                stats = manifest_stats(root, name)
                assert all(
                    "doc_id" in stats.get(f, {}) for f in live_now
                ), f"epoch {epoch_id}: clustered rewrite lost stats coverage"
            # (a) the CURRENT reader still sees every committed row
            seen = {r.doc_id for r in read_table(spark, root, schema).collect()}
            assert seen == committed, f"epoch {epoch_id}: rows lost in compaction"
            # (b) an in-flight reader holding the PRE-compaction
            # manifest still resolves its full snapshot
            old = {
                r.doc_id
                for r in read_snapshot(spark, root, pre_name, schema).collect()
            }
            assert old == committed, f"epoch {epoch_id}: old snapshot broken"
            checks.append(f"compacted@{epoch_id}")

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "compckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    assert len(checks) >= 2, "stream must have compacted at least twice"
    assert committed == all_ids
    # final state: compaction bounded the live file count below the
    # six appends' worth of fragments, and the full content round-trips
    _, live = read_manifest(root)
    final = read_table(spark, root, schema)
    got = {(r.doc_id, r.text) for r in final.collect()}
    assert got == {(r.doc_id, r.text) for r in docs.collect()}
    # vacuum drops the superseded files; the CURRENT reader is unmoved
    removed = vacuum(root)
    assert removed > 0, "compactions must have superseded some files"
    after = {r.doc_id for r in read_table(spark, root, schema).collect()}
    assert after == all_ids
    import pathlib as _pl

    on_disk = {
        p.name
        for p in _pl.Path(root, "data").iterdir()
        if not p.name.startswith(".")
    }
    assert on_disk == set(live), "vacuum must keep exactly the live set"


def test_versioned_append_retry_is_idempotent(spark, tmp_path):
    """foreachBatch replays an epoch after a mid-commit failure; the
    versioned table must converge, not double-count: re-appending the
    same batch_id re-adopts the same deterministic file names and the
    manifest set-unions them, so a retry AFTER a successful flip leaves
    the row set unchanged (and a retry after adopt-but-before-flip
    simply completes the commit)."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        append_batch,
        read_manifest,
        read_table,
    )

    schema = "doc_id long, text string"
    df0 = spark.createDataFrame([(1, "a"), (2, "b")], schema)
    df1 = spark.createDataFrame([(3, "c")], schema)
    root = str(tmp_path / "vt")

    append_batch(df0, root, 0)
    append_batch(df1, root, 1)
    _, live_before = read_manifest(root)
    # the replay: epoch 1 runs again with the same data
    append_batch(df1, root, 1)
    _, live_after = read_manifest(root)
    assert live_after == live_before, "retry must not grow the live set"
    rows = sorted(
        (r.doc_id, r.text) for r in read_table(spark, root, schema).collect()
    )
    assert rows == [(1, "a"), (2, "b"), (3, "c")]


def test_streaming_partitioned_ingest_with_mor_delete(spark, tmp_path):
    """Round-13 features under a REAL micro-batch stream: each epoch
    appends hive-PARTITIONED files (partition tuples recorded per
    file), a merge-on-read DELETE lands mid-stream between epochs —
    auto-rebasing across the concurrent appends if it loses the race —
    and after every epoch a partition-pruned read must (a) actually
    prune files and (b) return exactly the committed rows of that
    partition minus the mask. This is the production corpus-table
    loop: ingest by (source, language, date), retention deletes
    running beside it, readers never blocked."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        append_batch,
        delete_where_merge_on_read,
        partition_pruned_files,
        read_manifest,
        read_table,
    )

    schema = "doc_id long, lang string, text string"
    rows = [
        (i, ["en", "de", "fr"][i % 3], f"r{i}") for i in range(60)
    ]
    src = tmp_path / "psrc"
    spark.createDataFrame(rows, schema).repartition(4).write.parquet(
        str(src)
    )
    root = str(tmp_path / "ptable")
    committed: set[int] = set()
    deleted: set[int] = set()
    state = {"deleted": False, "epochs": 0}

    def ingest(batch_df, epoch_id):
        append_batch(batch_df, root, epoch_id, partition_by=("lang",),
                     stats_col="doc_id")
        committed.update(r.doc_id for r in batch_df.collect())
        state["epochs"] += 1
        if state["epochs"] == 2 and not state["deleted"]:
            # retention delete beside the ingest (merge-on-read: no
            # data file rewritten under the stream's feet)
            _, n = delete_where_merge_on_read(
                spark, root, schema, "doc_id", 6, 11, stats_col="doc_id"
            )
            deleted.update(
                i for i in committed if 6 <= i <= 11
            )
            assert n == len(deleted)
            state["deleted"] = True
        # partition-pruned read per epoch: prunes AND is exact
        name, live = read_manifest(root)
        kept, total = partition_pruned_files(root, name, {"lang": "de"})
        assert 0 < len(kept) < total, (
            f"epoch {epoch_id}: partition pruning did not drop files"
        )
        seen = {
            r.doc_id
            for r in read_table(
                spark, root, schema, where_partition={"lang": "de"}
            ).collect()
        }
        expect = {
            i for i in committed - deleted if i % 3 == 1
        }
        assert seen == expect, f"epoch {epoch_id}: partition read drifted"

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "pckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert state["epochs"] >= 3 and state["deleted"]
    assert committed == {i for i in range(60)}
    got = {
        (r.doc_id, r.lang)
        for r in read_table(spark, root, schema).collect()
    }
    assert got == {
        (i, ["en", "de", "fr"][i % 3])
        for i in range(60)
        if i not in deleted
    }


def test_versioned_table_stats_pruning_semantics(spark, tmp_path):
    """Manifest data skipping contract: (a) a range read keeps exactly
    the overlapping files, boundary-inclusive on both ends; (b) a file
    committed WITHOUT stats is conservatively kept by every range;
    (c) compaction re-records stats for its replacement files (ranges
    widen to the union — exact, never narrower than the data); and in
    all cases the ROW predicate applies on top, so results match a
    full-scan filter regardless of pruning."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        append_batch,
        compact,
        manifest_stats,
        pruned_files,
        read_manifest,
        read_table,
    )

    schema = "doc_id long, text string"
    root = str(tmp_path / "rt")
    for i, ids in enumerate(([0, 5, 9], [10, 15, 19], [20, 25, 29])):
        df = spark.createDataFrame(
            [(j, f"d{j}") for j in ids], schema
        ).coalesce(1)
        append_batch(df, root, i, stats_col="doc_id")

    name, live = read_manifest(root)
    assert len(live) == 3

    # (a) interior range hits exactly the middle file; boundaries are
    # inclusive (hi == a file's min keeps it; lo == a file's max keeps it)
    kept, total = pruned_files(root, name, "doc_id", 12, 17)
    assert total == 3 and len(kept) == 1
    assert len(pruned_files(root, name, "doc_id", 0, 10)[0]) == 2
    assert len(pruned_files(root, name, "doc_id", 19, 20)[0]) == 2
    rows = sorted(
        r.doc_id
        for r in read_table(
            spark, root, schema, where_between=("doc_id", 12, 17)
        ).collect()
    )
    assert rows == [15]  # file-level prune + row predicate

    # (b) a stats-less commit is never pruned
    append_batch(
        spark.createDataFrame([(100, "x")], schema).coalesce(1), root, 3
    )
    name, live = read_manifest(root)
    kept, total = pruned_files(root, name, "doc_id", 12, 17)
    assert total == 4 and len(kept) == 2  # middle file + the no-stats file
    rows = sorted(
        r.doc_id
        for r in read_table(
            spark, root, schema, where_between=("doc_id", 12, 17)
        ).collect()
    )
    assert rows == [15]  # the row predicate still excludes doc 100

    # (c) compaction re-records stats; the merged range is the union
    assert compact(
        spark, root, schema, target_bytes=1 << 30, stats_col="doc_id"
    ) > 0
    name, live = read_manifest(root)
    stats = manifest_stats(root, name)
    assert set(stats) == set(live)
    lo = min(s["doc_id"][0] for s in stats.values())
    hi = max(s["doc_id"][1] for s in stats.values())
    assert lo == 0 and hi == 100
    rows = sorted(
        r.doc_id
        for r in read_table(
            spark, root, schema, where_between=("doc_id", 12, 17)
        ).collect()
    )
    assert rows == [15]

    # (d) CLUSTERED compaction preserves pruning where coalesce (c)
    # widened every range: same three batches, range-partitioned
    # rewrite into 2 files → an interior range still skips a file
    root2 = str(tmp_path / "rt2")
    for i, ids in enumerate(([0, 5, 9], [10, 15, 19], [20, 25, 29])):
        df = spark.createDataFrame(
            [(j, f"d{j}") for j in ids], schema
        ).coalesce(1)
        append_batch(df, root2, i, stats_col="doc_id")
    assert compact(
        spark, root2, schema,
        target_files=2, stats_col="doc_id", cluster=True,
    ) > 0
    name2, live2 = read_manifest(root2)
    assert len(live2) == 2
    stats2 = manifest_stats(root2, name2)
    ranges = sorted(stats2[f]["doc_id"] for f in live2)
    assert ranges[0][1] < ranges[1][0], "clustered files must be disjoint"
    kept2, total2 = pruned_files(root2, name2, "doc_id", 0, 9)
    assert total2 == 2 and len(kept2) == 1
    rows = sorted(
        r.doc_id
        for r in read_table(
            spark, root2, schema, where_between=("doc_id", 0, 9)
        ).collect()
    )
    assert rows == [0, 5, 9]


def test_versioned_multicol_stats_and_zorder(spark, tmp_path):
    """Column-keyed stats contract: (a) pruning on a column the
    manifest has NO stats for keeps every file (column A's range must
    never prune on column B — the footgun the keyed format removes);
    (b) a multi-column stats commit prunes independently on each
    recorded column; (c) zorder32 is monotone on the grid and
    interleaves correctly on hand-checkable corners."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        append_batch,
        compact,
        manifest_stats,
        pruned_files,
        read_manifest,
        zorder32,
    )
    from pyspark.sql import functions as F

    schema = "a long, b long"
    root = str(tmp_path / "zt")
    # a ascending while b DESCENDS: single-column clustering on a
    # would give b perfectly inverted ranges
    rows = [(i, 99 - i) for i in range(100)]
    df = spark.createDataFrame(rows, schema)
    append_batch(df.repartition(8), root, 0)

    # (a) no stats recorded at all: nothing prunes, on either column
    name, live = read_manifest(root)
    kept, total = pruned_files(root, name, "a", 0, 5)
    assert len(kept) == total == len(live)

    # (b) z-order compact with BOTH columns recorded: a range on a
    # AND a range on b each prune, against the same physical layout
    assert compact(
        spark, root, schema, target_files=4, cluster=True,
        cluster_expr=zorder32(F.col("a"), F.col("b"), (0, 99), (0, 99)),
        stats_col=("a", "b"),
    ) > 0
    name, live = read_manifest(root)
    stats = manifest_stats(root, name)
    assert all(set(s) == {"a", "b"} for s in stats.values())
    kept_a, total = pruned_files(root, name, "a", 0, 20)
    kept_b, _ = pruned_files(root, name, "b", 0, 20)
    assert len(kept_a) < total and len(kept_b) < total
    # a column with no recorded stats is conservatively unpruned
    kept_c, _ = pruned_files(root, name, "c", 0, 20)
    assert len(kept_c) == total

    # (c) corners of the 16-bit grid: (0,0)→0, (max,max)→2^32-1;
    # x occupies the ODD bits (x=max,y=0 → 0b10 repeated)
    corners = spark.createDataFrame(
        [(0, 0), (99, 99), (99, 0), (0, 99)], schema
    ).select(zorder32(F.col("a"), F.col("b"), (0, 99), (0, 99)).alias("z"))
    zs = [r.z for r in corners.collect()]
    assert zs[0] == 0
    assert zs[1] == (1 << 32) - 1
    assert zs[2] == sum(1 << (2 * i + 1) for i in range(16))  # 0xAAAAAAAA
    assert zs[3] == sum(1 << (2 * i) for i in range(16))      # 0x55555555


def test_versioned_schema_evolution_across_commits(spark, tmp_path):
    """Column-add evolution on the versioned table: files committed
    before the column existed are read back null-filled when the
    reader passes the evolved schema (the append-only migration
    `sink_parquet_schema_evolution` pins for plain directories, here
    through the manifest read path), and time travel to a pre-
    evolution manifest still reads the ORIGINAL schema."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        append_batch,
        read_manifest,
        read_snapshot,
        read_table,
    )

    v1 = "doc_id long, text string"
    v2 = "doc_id long, text string, lang string"
    root = str(tmp_path / "se")
    append_batch(
        spark.createDataFrame([(1, "a"), (2, "b")], v1).coalesce(1), root, 0
    )
    pre_name, _ = read_manifest(root)
    append_batch(
        spark.createDataFrame([(3, "c", "en")], v2).coalesce(1), root, 1
    )

    rows = sorted(
        (r.doc_id, r.text, r.lang)
        for r in read_table(spark, root, v2).collect()
    )
    assert rows == [(1, "a", None), (2, "b", None), (3, "c", "en")]
    old = sorted(
        tuple(r) for r in read_snapshot(spark, root, pre_name, v1).collect()
    )
    assert old == [(1, "a"), (2, "b")]


def test_versioned_merge_upsert_semantics(spark, tmp_path):
    """Copy-on-write MERGE contract: matched keys are replaced,
    unmatched keys are inserted, and ONLY files whose stats range can
    contain an update key are rewritten — a file disjoint from the
    update band survives untouched (same physical file in the new
    manifest). Pre-merge snapshots keep reading the original rows
    until vacuum; empty updates are a no-op commit-wise; a merge into
    an empty table degenerates to an append."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        append_batch,
        merge_upsert,
        read_manifest,
        read_snapshot,
        read_table,
    )

    schema = "doc_id long, text string"
    root = str(tmp_path / "mt")
    append_batch(
        spark.createDataFrame(
            [(j, f"d{j}") for j in (0, 5, 9)], schema
        ).coalesce(1),
        root, 0, stats_col="doc_id",
    )
    append_batch(
        spark.createDataFrame(
            [(j, f"d{j}") for j in (20, 25, 29)], schema
        ).coalesce(1),
        root, 1, stats_col="doc_id",
    )
    pre_name, pre_live = read_manifest(root)

    # update key 5 (matched), insert key 15 (unmatched): bounds [5, 15]
    # overlap only the first file — the [20, 29] file must not rewrite
    updates = spark.createDataFrame([(5, "X5"), (15, "X15")], schema)
    _, rewrote, live = merge_upsert(
        spark, root, schema, updates, "doc_id", stats_col="doc_id"
    )
    assert (rewrote, live) == (1, 2)
    name, now_live = read_manifest(root)
    survivors = set(pre_live) & set(now_live)
    assert len(survivors) == 1, "the disjoint file must survive physically"
    rows = sorted(
        (r.doc_id, r.text) for r in read_table(spark, root, schema).collect()
    )
    assert rows == [
        (0, "d0"), (5, "X5"), (9, "d9"), (15, "X15"),
        (20, "d20"), (25, "d25"), (29, "d29"),
    ]
    # snapshot isolation: the pre-merge manifest still reads the
    # original content (no vacuum has run)
    old = sorted(
        (r.doc_id, r.text)
        for r in read_snapshot(spark, root, pre_name, schema).collect()
    )
    assert old == [(0, "d0"), (5, "d5"), (9, "d9"),
                   (20, "d20"), (25, "d25"), (29, "d29")]

    # empty updates: no-op (same manifest, nothing rewritten)
    empty = spark.createDataFrame([], schema)
    same, rewrote, _ = merge_upsert(
        spark, root, schema, empty, "doc_id", stats_col="doc_id"
    )
    assert same == name and rewrote == 0

    # merge into an empty table: degenerates to an append
    root2 = str(tmp_path / "mt2")
    merge_upsert(spark, root2, schema, updates, "doc_id", stats_col="doc_id")
    rows2 = sorted(
        (r.doc_id, r.text) for r in read_table(spark, root2, schema).collect()
    )
    assert rows2 == [(5, "X5"), (15, "X15")]


def test_versioned_delete_where_semantics(spark, tmp_path):
    """Copy-on-write DELETE contract: only files whose stats range can
    contain a victim row are rewritten (a disjoint file survives as
    the same physical file); rows with a NULL delete column never
    match BETWEEN and are kept; a range overlapping no file is a no-op
    commit-wise; pre-delete snapshots keep reading the victims."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        append_batch,
        delete_where,
        read_manifest,
        read_snapshot,
        read_table,
    )

    schema = "doc_id long, text string"
    root = str(tmp_path / "dt")
    append_batch(
        spark.createDataFrame(
            [(0, "d0"), (5, "d5"), (None, "dnull")], schema
        ).coalesce(1),
        root, 0, stats_col="doc_id",
    )
    append_batch(
        spark.createDataFrame([(20, "d20"), (25, "d25")], schema).coalesce(1),
        root, 1, stats_col="doc_id",
    )
    pre_name, pre_live = read_manifest(root)

    # range [3, 7] hits only the first file; the NULL-id row shares
    # that file but must survive the rewrite
    _, rewrote, live = delete_where(
        spark, root, schema, "doc_id", 3, 7, stats_col="doc_id"
    )
    assert (rewrote, live) == (1, 2)
    name, now_live = read_manifest(root)
    assert len(set(pre_live) & set(now_live)) == 1, "disjoint file survives"
    rows = sorted(
        (r.doc_id if r.doc_id is not None else -1, r.text)
        for r in read_table(spark, root, schema).collect()
    )
    assert rows == [(-1, "dnull"), (0, "d0"), (20, "d20"), (25, "d25")]

    # snapshot isolation: the pre-delete manifest still reads doc 5
    old = sorted(
        r.text for r in read_snapshot(spark, root, pre_name, schema).collect()
    )
    assert old == ["d0", "d20", "d25", "d5", "dnull"]

    # a range no file can contain: no-op (same manifest, 0 rewritten)
    same, rewrote, _ = delete_where(
        spark, root, schema, "doc_id", 1000, 2000, stats_col="doc_id"
    )
    assert same == name and rewrote == 0


def test_versioned_changes_semantics(spark, tmp_path):
    """Change-data-feed contract: (a) inserts/updates/deletes classify
    by manifest diff + key reconciliation and carried-over rows are
    dropped; (b) a pure-compaction window yields an EMPTY feed (files
    churned, no rows changed); (c) an append-only window is all
    inserts; (d) from == to is empty; (e) vacuum beating a CDF reader
    raises loudly (the retention horizon)."""
    import pytest

    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        append_batch,
        changes,
        compact,
        delete_where,
        merge_upsert,
        read_manifest,
        vacuum,
    )

    schema = "doc_id long, text string"
    root = str(tmp_path / "ct")
    append_batch(
        spark.createDataFrame(
            [(0, "d0"), (1, "d1"), (2, "d2")], schema
        ).coalesce(1),
        root, 0, stats_col="doc_id",
    )
    v0, _ = read_manifest(root)

    # (d) from == to
    assert changes(spark, root, schema, "doc_id", v0, v0).count() == 0

    # (c) append-only window
    append_batch(
        spark.createDataFrame([(3, "d3")], schema).coalesce(1),
        root, 1, stats_col="doc_id",
    )
    v1, _ = read_manifest(root)
    feed = changes(spark, root, schema, "doc_id", v0, v1).collect()
    assert [(r.doc_id, r.text, r._change) for r in feed] == [
        (3, "d3", "insert")
    ]

    # (b) pure-compaction window: every row carried over → empty feed
    assert compact(
        spark, root, schema, target_bytes=1 << 30, stats_col="doc_id"
    ) > 0
    v2, _ = read_manifest(root)
    assert changes(spark, root, schema, "doc_id", v1, v2).count() == 0

    # (a) mixed window: update key 1, insert key 9, delete key 2 —
    # key 0/3 are same-file neighbors the feed must drop as ballast
    merge_upsert(
        spark, root, schema,
        spark.createDataFrame([(1, "X1"), (9, "d9")], schema),
        "doc_id", stats_col="doc_id",
    )
    delete_where(spark, root, schema, "doc_id", 2, 2, stats_col="doc_id")
    feed = sorted(
        (r.doc_id, r.text, r._change)
        for r in changes(spark, root, schema, "doc_id", v2).collect()
    )
    assert feed == [
        (1, "X1", "update_post"),
        (2, "d2", "delete"),
        (9, "d9", "insert"),
    ]
    # update_preimages adds the old image of each updated key (and
    # ONLY those — insert/delete rows are not doubled)
    feed_pre = sorted(
        (r.doc_id, r.text, r._change)
        for r in changes(
            spark, root, schema, "doc_id", v2, update_preimages=True
        ).collect()
    )
    assert feed_pre == [
        (1, "X1", "update_post"),
        (1, "d1", "update_pre"),
        (2, "d2", "delete"),
        (9, "d9", "insert"),
    ]

    # (e) retention: a vacuum whose keep_last horizon covers v2 removes
    # nothing the feed needs — the same window still answers; then the
    # default vacuum (CURRENT only) removes v2's superseded files and
    # the CDF reader that still holds v2 must fail loudly, not
    # silently miss changes
    n_manifests = 6  # v0, append, compact, merge, delete... count live
    assert vacuum(root, keep_last=n_manifests) == 0
    assert sorted(
        (r.doc_id, r.text, r._change)
        for r in changes(spark, root, schema, "doc_id", v2).collect()
    ) == feed
    assert vacuum(root) > 0
    with pytest.raises(RuntimeError, match="retention"):
        changes(spark, root, schema, "doc_id", v2)


def test_streaming_cdc_merge_equals_batch(spark, tmp_path, sf_dir):
    """CDC ingest through the versioned table: a change stream applied
    as one copy-on-write merge PER MICRO-BATCH (foreachBatch →
    merge_upsert) must settle to the same table as applying the fully
    deduplicated changes in one batch — last-writer-wins across
    batches falls out of replace-by-key because micro-batches arrive
    in order. Readers resolve a complete committed version at every
    epoch (the append test's invariant, now under rewrites)."""
    from pyspark.sql import functions as F

    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import load_table
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        append_batch,
        merge_upsert,
        read_table,
    )

    schema = "doc_id long, text string"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = str(tmp_path / "cdc")
    append_batch(docs, root, 0, stats_col="doc_id")

    # the change stream: 3 files = 3 micro-batches; epoch e updates the
    # doc_id % 3 == e slice (suffix marks the epoch, so a later change
    # to the same key would win — and keys overlap across epochs for
    # e touching %3==0 twice below)
    src = tmp_path / "cdcsrc"
    changes = []
    for e in range(3):
        changes.append(
            docs.filter(F.col("doc_id") % 3 == e)
            .withColumn("text", F.concat(F.col("text"), F.lit(f"#{e}")))
        )
    # epoch 2 ALSO re-updates the %3==0 slice: cross-batch LWW
    changes[2] = changes[2].unionByName(
        docs.filter(F.col("doc_id") % 3 == 0)
        .withColumn("text", F.concat(F.col("text"), F.lit("#2b")))
    )
    for e, ch in enumerate(changes):
        ch.coalesce(1).write.parquet(str(src / f"batch{e}"))

    order = {str(src / f"batch{e}"): e for e in range(3)}

    def apply_changes(batch_df, epoch_id):
        merge_upsert(
            spark, root, schema, batch_df, "doc_id", stats_col="doc_id"
        )
        n = read_table(spark, root, schema).count()
        assert n == docs.count(), "merge must never change the key count here"

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "batch*"))
        .writeStream.foreachBatch(apply_changes)
        .option("checkpointLocation", str(tmp_path / "cdcckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {(r.doc_id, r.text) for r in read_table(spark, root, schema).collect()}
    expected = {
        (r.doc_id,
         r.text + ("#2b" if r.doc_id % 3 == 0
                   else f"#{r.doc_id % 3}"))
        for r in docs.collect()
    }
    assert got == expected


def test_streaming_cdf_incremental_view_equals_recompute(spark, tmp_path, sf_dir):
    """Streaming INCREMENTAL VIEW MAINTENANCE: a CDC stream lands as
    one copy-on-write merge per micro-batch, and after EACH epoch the
    change feed between the pre- and post-merge manifests (with update
    pre-images) is folded into a materialized per-group view — count
    via ±1, length-sum via ±len, text fingerprint via unsigned md5-xor
    (xor retracts its own pre-image). When the stream drains, the
    maintained view must equal a from-scratch recompute of the final
    table: the feed is EXACTLY sufficient per epoch, nothing double-
    counted across epochs even when later batches re-update earlier
    keys."""
    from pyspark.sql import functions as F

    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import load_table
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        append_batch,
        changes,
        merge_upsert,
        read_manifest,
        read_table,
    )

    schema = "doc_id long, text string"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = str(tmp_path / "ivm")
    append_batch(docs, root, 0, stats_col="doc_id")

    grp = (F.col("doc_id") % 4).alias("grp")
    xorfp = F.expr(
        "bit_xor(cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint))"
    )

    def view_of(df):
        return {
            r.grp: (r.n, r.tl, r.fp)
            for r in df.groupBy(grp).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.length("text")).alias("tl"),
                xorfp.alias("fp"),
            ).collect()
        }

    view = view_of(read_table(spark, root, schema))  # materialize once

    src = tmp_path / "ivmsrc"
    for e in range(3):
        ch = docs.filter(F.col("doc_id") % 3 == e).withColumn(
            "text", F.concat(F.col("text"), F.lit(f"#{e}"))
        )
        if e == 2:  # re-update an earlier slice: cross-epoch retraction
            ch = ch.unionByName(
                docs.filter(F.col("doc_id") % 3 == 0).withColumn(
                    "text", F.concat(F.col("text"), F.lit("#2b"))
                )
            )
        ch.coalesce(1).write.parquet(str(src / f"batch{e}"))

    def apply_and_maintain(batch_df, epoch_id):
        pre, _ = read_manifest(root)
        post, _, _ = merge_upsert(
            spark, root, schema, batch_df, "doc_id", stats_col="doc_id"
        )
        sign = F.when(
            F.col("_change").isin("insert", "update_post"), F.lit(1)
        ).otherwise(F.lit(-1))
        deltas = (
            changes(spark, root, schema, "doc_id", pre, post,
                    update_preimages=True)
            .groupBy(grp)
            .agg(
                F.sum(sign).alias("dn"),
                F.sum(sign * F.length("text")).alias("dtl"),
                xorfp.alias("dfp"),
            )
            .collect()
        )
        for r in deltas:
            n, tl, fp = view.get(r.grp, (0, 0, 0))
            view[r.grp] = (n + r.dn, tl + r.dtl, fp ^ r.dfp)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "batch*"))
        .writeStream.foreachBatch(apply_and_maintain)
        .option("checkpointLocation", str(tmp_path / "ivmckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    assert view == view_of(read_table(spark, root, schema)), (
        "incrementally maintained view diverged from recompute"
    )


def test_streaming_ivfpq_index_add_equals_batch(spark, tmp_path, sf_dir):
    """Streaming INDEX MAINTENANCE for the IVF-PQ composite: FAISS's
    train-once/add-incrementally contract run through Structured
    Streaming — quantizers train once on the corpus (index geometry is
    frozen at train time), then micro-batches of vectors are encoded
    with the SAME one-pass encode_ivfpq used at batch ingest and
    appended to the parquet index; after the stream drains, a masked-
    ADC search over the accumulated index must return exactly the
    ranking of a single batch build. This is the ingest path a 100 TB
    vector store actually runs (new embeddings arrive forever; the
    index grows by appending cell-partitioned code files)."""
    from pyspark.sql import functions as F

    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.similarity import (
        encode_ivfpq,
        ivfpq_adc_topk,
        to_double,
        train_ivf_centroids,
        train_pq_codebooks,
    )
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double(F.col("embedding")).alias("embedding")
    )
    cent = train_ivf_centroids(e, n_cells=16, refine_iterations=0)
    books = train_pq_codebooks(e)
    q = e.filter(F.col("vec_id") % 100 == 0)

    src = tmp_path / "vsrc"
    e.repartition(3).write.parquet(str(src))
    idx = str(tmp_path / "ivfpq_index")

    def add_batch(batch_df, epoch_id):
        # the add() step: encode cells+codes and APPEND to the index
        encode_ivfpq(batch_df, books, cent).write.mode("append").parquet(idx)

    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    query = (
        stream.writeStream.foreachBatch(add_batch)
        .option("checkpointLocation", str(tmp_path / "vckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(300)

    def rows(df):
        return sorted(
            (r.query_id, r.rank, r.neighbor_id, r.cos_sim) for r in df.collect()
        )

    got = rows(
        ivfpq_adc_topk(spark.read.parquet(idx), books, cent, q, k=10, n_probe=6)
    )
    want = rows(
        ivfpq_adc_topk(encode_ivfpq(e, books, cent), books, cent, q, k=10, n_probe=6)
    )
    assert got == want
    assert len(got) > 0


def test_streaming_ivf_index_versioned_commits(spark, tmp_path, sf_dir):
    """Streaming ANN index maintenance THROUGH THE TABLE FORMAT
    (VERDICT r11 task 4, composing the r11 families): micro-batches of
    new embeddings flow through `ivf_assign` into the stored inverted
    file as VERSIONED-TABLE commits, so — unlike the plain
    parquet-append of `test_streaming_ivfpq_index_add_equals_batch`,
    which has a partial-file read window while a writer is mid-append —
    the index is QUERYABLE MID-INGEST with snapshot isolation: at every
    epoch a reader resolving the manifest sees exactly the committed
    vectors, never a torn batch. After the stream drains, `ivf_search`
    over the accumulated index must return exactly the ranking of a
    single batch build (stream-equals-batch), and the mid-stream
    invariant is asserted per epoch (the same per-epoch discipline as
    test_streaming_append_online_compaction)."""
    from pyspark.sql import functions as F

    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.similarity import (
        ivf_assign,
        ivf_search,
        to_double,
        train_ivf_centroids,
    )
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import load_table
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        append_batch,
        read_table,
    )

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double(F.col("embedding")).alias("embedding")
    )
    # train ONCE on the corpus — index geometry frozen before ingest
    cent = train_ivf_centroids(e, n_cells=8, refine_iterations=1)
    assert cent is not None
    queries = e.filter(F.col("vec_id") % 50 == 0)

    INV_SCHEMA = "neighbor_id long, vec array<double>, nrm double, cell int"

    def inv_rows(df):
        # the add() step: single-assignment inverted-file rows
        return ivf_assign(
            df, cent, id_col="vec_id", vec_col="embedding",
            out_id="neighbor_id", keep_vec="__cv", top_cells=1,
        ).select(
            "neighbor_id",
            F.col("__cv").alias("vec"),
            F.col("__cv_n").alias("nrm"),
            F.col("__cell").alias("cell"),
        )

    def search(inv_plain):
        inv = inv_plain.select(
            "neighbor_id",
            F.col("vec").alias("__cv"),
            F.col("nrm").alias("__cv_n"),
            F.col("cell").alias("__cell"),
        )
        return sorted(
            (r.query_id, r.rank, r.neighbor_id, r.cos_sim)
            for r in ivf_search(
                inv, cent, queries, id_col="vec_id", vec_col="embedding",
                k=5, n_probe=3,
            ).collect()
        )

    expected = search(inv_rows(e))  # one-shot batch build
    assert len(expected) > 0

    src = tmp_path / "ivfsrc"
    e.repartition(5).write.parquet(str(src))
    root = str(tmp_path / "ivf_table")
    committed: set[int] = set()
    epochs: list[int] = []

    def ingest(batch_df, epoch_id):
        rows = inv_rows(batch_df)
        append_batch(rows, root, epoch_id, stats_col="cell")
        committed.update(
            r.neighbor_id for r in rows.select("neighbor_id").collect()
        )
        # mid-ingest invariant: a reader through the manifest sees
        # EXACTLY the committed vectors — queryable, never torn
        inv_now = read_table(spark, root, INV_SCHEMA)
        ids_now = {
            r.neighbor_id
            for r in inv_now.select("neighbor_id").collect()
        }
        assert ids_now == committed, f"epoch {epoch_id}: torn index read"
        mid = search(inv_now)
        assert all(nid in committed for _, _, nid, _ in mid), (
            f"epoch {epoch_id}: search surfaced an uncommitted vector"
        )
        epochs.append(epoch_id)

    q = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ivfckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    assert len(epochs) >= 2, "ingest must have spanned multiple epochs"
    got = search(read_table(spark, root, INV_SCHEMA))
    assert got == expected


def test_streaming_upsert_equality_foreachbatch(spark, tmp_path):
    """Streaming CDC upsert through equality deletes (VERDICT r13 task
    3): a readStream of keyed micro-batches applied with
    merge_upsert_equality in foreachBatch — every epoch's commit is
    adds + one equality-delete file with NO base-table reads — and the
    settled table equals the last-writer-wins recompute over the event
    stream. This is the Flink→Iceberg upsert-sink shape: O(batch)
    commit cost regardless of table size."""
    import json
    import pathlib

    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        compact,
        merge_upsert_equality,
        read_manifest,
        read_table,
        table_state,
    )

    SCHEMA = "doc_id long, text string, seq long"
    batches = [
        [(1, "a0", 0), (2, "b0", 0), (3, "c0", 0)],
        [(2, "b1", 1), (4, "d1", 1)],
        [(1, "a2", 2), (4, "d2", 2), (5, "e2", 2)],
        [(3, "c3", 3), (5, "e3", 3)],
    ]
    src = tmp_path / "upsrc"
    src.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(src / f"batch{i}")
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    root = str(tmp_path / "uptable")
    epochs: list[int] = []

    # the first-class helper: per-key last event by the stream's own
    # seq column, then the zero-base-read keyed commit
    from new_kafka_consumer_to_hadoop_hdfs_spark.streaming.cdc import (
        upsert_equality_batch_fn,
    )

    apply_fn = upsert_equality_batch_fn(
        root, SCHEMA, "doc_id", order_col="seq"
    )

    def upsert(batch_df, epoch_id):
        apply_fn(batch_df, epoch_id)
        epochs.append(epoch_id)

    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", str(tmp_path / "upckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert len(epochs) >= 2  # genuinely incremental

    # every post-bootstrap commit: adds + equality delete, zero
    # base-file reads (no removes, no position-delete files)
    mdir = pathlib.Path(root, "manifests")
    docs = [
        json.loads((mdir / n).read_text())
        for n in sorted(p.name for p in mdir.iterdir())
    ]
    for doc in docs[1:]:
        assert "removes" not in doc and "delete_adds" not in doc
        assert doc.get("adds")
    assert any(doc.get("eq_delete_adds") for doc in docs[1:])

    lww: dict[int, tuple] = {}
    for rows in batches:
        for k, v, s in rows:
            lww[k] = (v, s)
    expected = {(k, v, s) for k, (v, s) in lww.items()}
    got = {
        (r.doc_id, r.text, r.seq)
        for r in read_table(spark, root, SCHEMA).collect()
    }
    assert got == expected
    # compaction folds every mask and preserves the settled state
    compact(spark, root, SCHEMA, target_files=1)
    st = table_state(root)
    assert st["eq_deletes"] == {} and st["deletes"] == []
    assert {
        (r.doc_id, r.text, r.seq)
        for r in read_table(spark, root, SCHEMA).collect()
    } == expected
