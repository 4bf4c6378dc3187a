"""Unit tests for the round-6 analytics operators and queries
(triangles, salted join, SCD2 islands, centroid, curriculum) on
synthetic micro-fixtures with hand-computable answers — the oracle
gate proves engine agreement, these prove the SEMANTICS."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def test_triangle_counts_k4_square_and_noise(spark):
    """K4 holds C(4,3)=4 triangles with every node in 3; a 4-cycle
    without diagonals holds none; duplicate, reversed, and self-loop
    edges must not inflate counts."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.graph import (
        triangle_counts,
    )

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    square = [(10, 11), (11, 12), (12, 13), (13, 10)]
    noise = [(1, 0), (0, 1), (2, 2)]  # reversed dup, dup, self-loop
    edges = spark.createDataFrame(k4 + square + noise, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    # per-node counts sum to 3x the triangle count
    assert sum(got.values()) == 3 * 4


def test_triangle_counts_checkpoint_modes_agree(spark, tmp_path):
    """localCheckpoint (default) and reliable checkpoint_dir modes
    must produce identical counts — the durability knob cannot change
    semantics (same parity contract as CC/PageRank)."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.graph import (
        triangle_counts,
    )

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    extra = [(3, 7), (7, 9), (9, 3)]  # second triangle sharing node 3
    edges = spark.createDataFrame(k4 + extra, "src long, dst long")
    local = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    reliable = {
        r.node: r.n_triangles
        for r in triangle_counts(
            edges, checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert local == reliable == {0: 3, 1: 3, 2: 3, 3: 4, 7: 1, 9: 1}


def test_triangle_star_hub_wedge_volume(spark):
    """Hub-skew bound: a 1000-leaf star generates ZERO wedges under
    degree orientation (every edge points leaf → hub, hub out-degree
    0) where middle-id wedge closure would enumerate 500·500 = 250k —
    the O(m^1.5) vs O(Σd²) difference that decides whether a 100 TB
    boilerplate hub is survivable. A single closing edge must still
    be found as exactly one triangle."""
    from pyspark.sql import functions as F

    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.graph import (
        _oriented_wedges,
        triangle_counts,
    )

    hub = 500
    star = [(x, hub) for x in range(500)] + [(hub, y) for y in range(501, 1001)]
    edges = spark.createDataFrame(star, "src long, dst long")
    _, wedges = _oriented_wedges(edges)
    assert wedges.count() == 0
    # the naive middle-id wedge join this replaced would emit 250k rows
    canon = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    naive = canon.alias("e1").join(
        canon.alias("e2"), F.col("e1.b") == F.col("e2.a")
    )
    assert naive.count() == 500 * 500
    assert triangle_counts(edges).count() == 0
    # close one leaf-leaf edge: exactly one triangle, found through the hub
    closed = spark.createDataFrame(
        star + [(0, 1000)], "src long, dst long"
    )
    got = {r.node: r.n_triangles for r in triangle_counts(closed).collect()}
    assert got == {0: 1, hub: 1, 1000: 1}


def test_salted_join_matches_plain_join(spark):
    """Inner and left salted joins must equal the unsalted joins row
    for row — including small-side multiplicity and left-side rows
    with no match."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.skew import (
        salted_join,
    )

    big = spark.createDataFrame(
        [(k, i) for k in ("a", "b", "c") for i in range(7)], "k string, v int"
    )
    small = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "k string, w int"  # a matches TWICE
    )

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    for how in ("inner", "left"):
        got = rows(salted_join(big, small, ["k"], salt_buckets=4, how=how))
        want = rows(big.join(small, ["k"], how))
        assert got == want, how

    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, ["k"], how="full")


def test_salted_join_salt_cols_spread_duplicate_rows(spark):
    """Row-content salting degenerates on fully-identical duplicate
    rows (they all hash to one bucket — the Kafka-replay shape);
    salt_cols naming a varying column must spread them, results must
    stay identical to the plain join either way, and unknown salt_cols
    must fail loudly."""
    import pytest
    from pyspark.sql import functions as F

    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.skew import (
        salted_join,
    )

    # hot key "h": 64 duplicate payloads distinguished only by offset
    big = spark.createDataFrame(
        [("h", "same-payload", i) for i in range(64)],
        "k string, payload string, offset long",
    )
    small = spark.createDataFrame([("h", 1)], "k string, w int")

    def n_buckets(cols):
        salted = big.withColumn(
            "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(8))
        )
        return salted.select("__salt").distinct().count()

    assert n_buckets(["k", "payload"]) == 1  # the degenerate shape
    assert n_buckets(["offset"]) > 4  # varying column actually spreads

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    want = rows(big.join(small, ["k"], "inner"))
    got = rows(
        salted_join(big, small, ["k"], salt_buckets=8, salt_cols=["offset"])
    )
    assert got == want

    with pytest.raises(ValueError, match="salt_cols not on the big side"):
        salted_join(big, small, ["k"], salt_cols=["nope"])


def test_scd2_islands_collapse_and_current_flag(spark):
    """Consecutive same-state runs collapse into one interval; a state
    REVISITED later opens a new interval; the last interval per user is
    open-ended and flagged current."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.plans.analytics import (
        pipeline_scd2_intervals,
    )
    import datetime as dt

    rows = [
        # user 1: A A B A  -> intervals A(2), B(1), A(1)
        (1, dt.datetime(2024, 1, 1, 0), 1, "A", 0.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 1), 1, "A", 0.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 2), 1, "B", 0.0, "{}"),
        (4, dt.datetime(2024, 1, 1, 3), 1, "A", 0.0, "{}"),
        # user 2: single event -> one current interval
        (5, dt.datetime(2024, 1, 2, 0), 2, "C", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    ev.createOrReplaceTempView("__scd2_fixture")

    import new_kafka_consumer_to_hadoop_hdfs_spark.plans.analytics as mod

    orig = mod.load_table
    mod.load_table = lambda spark, sf_dir, name: spark.table("__scd2_fixture")
    try:
        out = sorted(
            (r.user_id, r.event_type, r.n_events, r.is_current)
            for r in pipeline_scd2_intervals(spark, SF).collect()
        )
    finally:
        mod.load_table = orig
    # the revisited A is a NEW interval (currently open), not merged
    # into the first A run
    assert out == sorted(
        [(1, "A", 2, 0), (1, "B", 1, 0), (1, "A", 1, 1), (2, "C", 1, 1)]
    )


def test_centroid_matches_numpy_mean(spark):
    """The decimal-sum centroid equals the numpy float64 mean to 1e-6
    (the output rounding) on a small fixture."""
    import numpy as np

    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry

    queries, _ = merged_registry()
    out = queries["embedding_centroid_per_label"](spark, SF).toPandas()
    import pandas as pd

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    for label, grp in emb.groupby("label"):
        want = np.mean(np.stack(grp["embedding"].to_numpy()).astype("float64"), axis=0)
        got = (
            out[out.label == label]
            .sort_values("dim")["centroid_val"]
            .to_numpy()
        )
        assert np.allclose(got, want, atol=1.5e-6), label


def test_curriculum_positions_are_a_stage_ordered_permutation(spark):
    """curriculum_pos must be a permutation of 0..n-1 and
    non-decreasing in stage (all stage-0 docs before all stage-1 docs,
    etc.) — the contract a sequential trainer consumes."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry

    queries, _ = merged_registry()
    pdf = (
        queries["pipeline_curriculum_order"](spark, SF)
        .toPandas()
        .sort_values("curriculum_pos")
    )
    n = len(pdf)
    assert list(pdf["curriculum_pos"]) == list(range(n))
    assert list(pdf["stage"]) == sorted(pdf["stage"]), "stages interleaved"
    # within a stage, positions are hash-shuffled, not doc_id-ordered
    s0 = pdf[pdf.stage == pdf.stage.min()]["doc_id"].tolist()
    assert s0 != sorted(s0), "within-stage order suspiciously sorted"


def test_pq_recall_against_exact(spark):
    """PQ/ADC top-10 must stay close to the exact top-10: quantization
    error may reorder near-ties but not destroy the neighborhood.
    recall@10 ≥ 0.5 on the fixture (8 subspaces × 16 codes is a coarse
    32× compression; LSH/IVF twins are held to the same anchor
    pattern), and every returned pair's TRUE cosine must be within
    0.25 of the true k-th best — no wildly-wrong neighbors."""
    import numpy as np
    import pandas as pd

    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry

    queries, _ = merged_registry()
    approx = queries["sim_topk_pq"](spark, SF).toPandas()
    assert (approx.groupby("query_id")["rank"].max() <= 10).all()

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    V = np.stack(emb["embedding"].to_numpy()).astype("float64")
    ids = emb["vec_id"].to_numpy()
    Vu = V / np.linalg.norm(V, axis=1, keepdims=True)
    hits = tot = 0
    for qid in sorted(set(approx["query_id"])):
        qv = Vu[ids == qid][0]
        cos = Vu @ qv
        cos[ids == qid] = -np.inf
        order = np.lexsort((ids, -np.round(cos, 9)))
        exact10 = set(ids[order[:10]].tolist())
        got = approx[approx.query_id == qid]
        got10 = set(got["neighbor_id"].tolist())
        hits += len(exact10 & got10)
        tot += len(exact10)
        kth_true = np.sort(cos)[::-1][9]
        for nid in got10:
            true_cos = cos[ids == nid][0]
            assert true_cos >= kth_true - 0.25, (qid, nid, true_cos, kth_true)
    assert hits / tot >= 0.5, f"PQ recall@10 collapsed: {hits / tot:.2f}"


def test_hll_sliding_tracks_exact(spark):
    """The HLL sliding twin must cover the same window starts as the
    exact query and estimate within HLL's documented error envelope
    (lgConfigK default 12 → ~1.6% rse; allow 10% on small counts)."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry

    queries, _ = merged_registry()
    exact = {
        r.window_start: r.n_users
        for r in queries["event_distinct_sliding"](spark, SF).collect()
    }
    approx = {
        r.window_start: r.n_users_approx
        for r in queries["event_distinct_sliding_hll"](spark, SF).collect()
    }
    assert set(exact) == set(approx)
    for ws, n in exact.items():
        assert abs(approx[ws] - n) <= max(2, 0.1 * n), (ws, n, approx[ws])


def test_bloom_prefilter_superset_and_exact_join(spark):
    """The Bloom prefilter must pass EVERY matching key (no false
    negatives), actually filter (false-positive rate far below 1 at
    2^16 bits for 3 keys), and compose with the exact join to the
    plain-join result. n_bits must be 64-aligned."""
    from pyspark.sql import functions as F

    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.skew import (
        bloom_prefilter,
    )

    big = spark.createDataFrame(
        [(i, f"p{i}") for i in range(1000)], "k long, payload string"
    )
    small = spark.createDataFrame([(5, "x"), (250, "y"), (777, "z")],
                                  "k2 long, w string")
    pre = bloom_prefilter(big, small, "k", "k2")
    kept = {r.k for r in pre.select("k").collect()}
    assert {5, 250, 777} <= kept          # never drops a real match
    assert len(kept) < 100                # and actually filters
    got = sorted(
        tuple(r)
        for r in pre.join(small, pre.k == small.k2).select(
            "k", "payload", "w"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in big.join(small, big.k == small.k2).select(
            "k", "payload", "w"
        ).collect()
    )
    assert got == want
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_prefilter(big, small, "k", "k2", n_bits=100)
    # xxhash64 hashes INT 5 and BIGINT 5 differently — a key-type
    # mismatch would silently drop every match, so it must raise
    small_int = small.withColumn("k2", small.k2.cast("int"))
    with pytest.raises(TypeError, match="key types must match"):
        bloom_prefilter(big, small_int, "k", "k2")


def test_char_entropy_hand_computed(spark, tmp_path):
    """ln-based entropy on hand-checkable strings: 'aab' →
    ln3 − (2ln2)/3 ≈ 0.636514; 'abcd' → ln4 with ratio 1."""
    import math

    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry

    docs = spark.createDataFrame(
        [(1, "aab", "en", "s", 3), (2, "abcd", "en", "s", 4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    queries, _ = merged_registry()
    got = {
        r.doc_id: (r.char_entropy_nats, r.distinct_char_ratio, r.n_chars_counted)
        for r in queries["text_char_entropy"](spark, str(tmp_path)).collect()
    }
    assert got[1] == (
        round(math.log(3) - 2 * math.log(2) / 3, 6),
        round(2 / 3, 6),
        3,
    )
    assert got[2] == (round(math.log(4), 6), 1.0, 4)


def test_path_regex_session_and_order_semantics(spark, tmp_path):
    """The funnel must match only when view precedes purchase WITHIN a
    30-minute-gap session: reversed order and across-session splits
    must not match; interleaved noise must."""
    import datetime as dt

    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, uid, minutes, typ):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, typ, 1.0, "{}")

    rows = [
        ev(1, 1, 0, "view"), ev(2, 1, 5, "error"), ev(3, 1, 10, "purchase"),
        ev(4, 2, 0, "purchase"), ev(5, 2, 5, "view"),      # wrong order
        ev(6, 3, 0, "view"), ev(7, 3, 45, "purchase"),     # 45-min gap splits
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    queries, _ = merged_registry()
    got = queries["event_path_regex"](spark, str(tmp_path)).collect()
    assert [(r.user_id, r.n_events, r.path) for r in got] == [
        (1, 3, "view>error>purchase")
    ]


def test_interval_overlap_boundary_semantics(spark, tmp_path):
    """Closed-session vs half-open-hour overlap: a session ENDING
    exactly at an incident hour's start overlaps (end >= h); one
    ending just before does not; one starting exactly at h+1h does
    not (start < h+1h is strict). The bin rewrite must agree with the
    predicate on all three boundaries."""
    import datetime as dt

    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry

    h = dt.datetime(2024, 1, 1, 12, 0, 0)  # incident hour [12:00, 13:00)

    def ev(eid, uid, t, typ):
        return (eid, t, uid, typ, 1.0, "{}")

    rows = [
        # three errors inside hour 12 → an incident
        ev(1, 90, h + dt.timedelta(minutes=1), "error"),
        ev(2, 91, h + dt.timedelta(minutes=2), "error"),
        ev(3, 92, h + dt.timedelta(minutes=3), "error"),
        # user 1: session [11:50, 12:00] — end == h → overlaps
        ev(10, 1, h - dt.timedelta(minutes=10), "view"),
        ev(11, 1, h, "click"),
        # user 2: session [11:30, 11:59] — ends before h → no overlap
        ev(20, 2, h - dt.timedelta(minutes=30), "view"),
        ev(21, 2, h - dt.timedelta(minutes=1), "click"),
        # user 3: session [13:00, 13:05] — starts at h+1h → no overlap
        ev(30, 3, h + dt.timedelta(hours=1), "view"),
        ev(31, 3, h + dt.timedelta(hours=1, minutes=5), "click"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    queries, _ = merged_registry()
    got = queries["join_interval_overlap"](spark, str(tmp_path)).collect()
    # the error users' own 1-event sessions also overlap the incident
    by_user = {r.user_id for r in got}
    assert 1 in by_user and 2 not in by_user and 3 not in by_user
    assert all(r.incident_hour == h and r.n_errors == 3 for r in got)


def test_ewma_hand_computed(spark, tmp_path):
    """EWMA fold semantics on a hand-checkable sequence: values
    [1, 2, 10] in (ts, event_id) order → s = 1 → 1.3 → 3.91; a
    single-event user keeps their value; and chronological order must
    come from (ts, event_id), not insertion order."""
    import datetime as dt

    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1 deliberately inserted OUT of chronological order
        (3, t0 + dt.timedelta(minutes=2), 1, "view", 10.0, "{}"),
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 1, "view", 2.0, "{}"),
        (4, t0, 2, "view", 7.5, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    queries, _ = merged_registry()
    got = {
        r.user_id: (r.n_events, r.ewma_last)
        for r in queries["event_ewma_smoothing"](spark, str(tmp_path)).collect()
    }
    assert got == {1: (3, round((1.0 * 0.7 + 2.0 * 0.3) * 0.7 + 10.0 * 0.3, 6)),
                   2: (1, 7.5)}
