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


@pytest.mark.parametrize("query_name", ["sim_topk_pq", "sim_topk_pq_stored"])
def test_pq_recall_against_exact(spark, query_name):
    """PQ/ADC top-10 must stay close to the exact top-10: quantization
    error may reorder near-ties but not destroy the neighborhood.
    recall@10 ≥ 0.5 on the fixture (8 subspaces × 16 codes is a coarse
    32× compression; LSH/IVF twins are held to the same anchor
    pattern), and every returned pair's TRUE cosine must be within
    0.25 of the true k-th best — no wildly-wrong neighbors. The
    STORED-index twin is held to the same band (VERDICT r7 item 6): the
    oracle pins its row identity, this pins that the persisted
    codes+codebooks can't silently drift from the vectors they were
    trained on."""
    import numpy as np
    import pandas as pd

    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry

    queries, _ = merged_registry()
    approx = queries[query_name](spark, SF).toPandas()
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


def test_ewma_segmented_matches_sequential(spark, tmp_path):
    """The two-level affine segment fold (`operators/stats.ewma_segmented`
    — the documented mega-key escape hatch for `event_ewma_smoothing`,
    VERDICT r7 item 3) must agree with the oracle-exact sequential fold
    to 1e-9 RELATIVE tolerance at every segmentation granularity, on
    random data with a mega-user whose history spans many segments.

    Granularities exercised: calendar day (the default), hour (finer
    splits → more affine compositions), a single all-history segment
    (degenerate: the composition reduces to the standalone fold, so the
    result is BIT-equal to sequential), and per-event segments (the
    other extreme: every step is one affine compose).
    """
    import datetime as dt

    import numpy as np
    from pyspark.sql import functions as F

    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.stats import ewma_segmented
    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry

    rng = np.random.default_rng(8)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # mega-user 1: 3000 events over ~40 days; users 2-9: short histories
    for uid, n in [(1, 3000)] + [(u, int(rng.integers(1, 40))) for u in range(2, 10)]:
        # strictly increasing ts per user; cross-user collisions are fine
        offs = np.cumsum(rng.integers(1, 2000, size=n))
        vals = rng.normal(0.0, 50.0, size=n) * rng.choice([1.0, 100.0], size=n)
        for o, v in zip(offs, vals):
            eid += 1
            rows.append((eid, t0 + dt.timedelta(seconds=int(o)), uid,
                         "view", float(v), "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    queries, _ = merged_registry()
    seq_rounded = {
        r.user_id: (r.n_events, r.ewma_last)
        for r in queries["event_ewma_smoothing"](spark, str(tmp_path)).collect()
    }
    # UNROUNDED reference: the exact per-step fold in Python over the
    # same (ts, event_id)-ordered values — the registered query rounds
    # to 6, which would swamp a 1e-9 band
    by_user: dict[int, list[tuple]] = {}
    for eid_, ts_, uid_, _et, v_, _p in rows:
        by_user.setdefault(uid_, []).append((ts_, eid_, v_))
    seq_exact = {}
    for uid_, evs in by_user.items():
        vs = [v for _, _, v in sorted(evs)]
        s = vs[0]
        for x in vs[1:]:
            s = s * 0.7 + x * 0.3
        seq_exact[uid_] = (len(vs), s)
    for uid_, (n, s) in seq_exact.items():
        assert seq_rounded[uid_] == (n, round(s, 6))  # reference sanity

    ev = spark.read.parquet(str(tmp_path / "events.parquet"))

    def check(segment, bit_exact=False):
        got = {
            r.user_id: (r.n_events, r.ewma_last)
            for r in ewma_segmented(ev, segment=segment).collect()
        }
        assert set(got) == set(seq_exact)
        for uid_, (n_seq, s_seq) in seq_exact.items():
            n_got, s_got = got[uid_]
            assert n_got == n_seq, (uid_, n_got, n_seq)
            if bit_exact:
                assert s_got == s_seq, (uid_, s_got, s_seq)
            else:
                tol = 1e-9 * max(1.0, abs(s_seq), abs(s_got))
                assert abs(s_got - s_seq) <= tol, (uid_, s_got, s_seq)

    check(None)                                        # calendar day
    check(F.date_trunc("hour", F.col("ts")))           # finer splits
    check(F.lit(0), bit_exact=True)                    # one segment
    check(F.col("ts"))                                 # per-event segments


def test_bloom_prefilter_autosizes_for_large_key_sets(spark):
    """Auto-sized bitmap keeps the false-positive rate bounded on a
    100k-key small side (VERDICT r7 item 4): before auto-sizing, a
    2^16-bit bitmap at 100k keys held ~1 set bit per slot and passed
    ~100% of non-members — a silent no-op. With ~13 bits/key and 3
    hashes the measured FPP on 200k disjoint probes must stay ~1%
    (asserted < 3%), and past max_bits the operator must raise rather
    than degrade."""
    import pytest
    from pyspark.sql import functions as F

    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.skew import (
        bloom_prefilter,
    )

    n_keys = 100_000
    small = spark.range(n_keys).select(F.col("id").alias("k2"))
    # probes all DISJOINT from the member set: any survivor is a false
    # positive
    probes = spark.range(n_keys, n_keys + 200_000).select(F.col("id").alias("k"))
    kept = bloom_prefilter(probes, small, "k", "k2").count()
    fpp = kept / 200_000
    assert fpp < 0.03, f"false-positive rate {fpp:.4f} — auto-sizing failed"
    # members always pass (no false negatives at any size)
    members = spark.range(0, n_keys, 1000).select(F.col("id").alias("k"))
    assert bloom_prefilter(members, small, "k", "k2").count() == members.count()
    # design-load ceiling: a key set that would need a >max_bits bitmap
    # raises loudly instead of silently degrading to pass-everything
    with pytest.raises(ValueError, match="outgrown"):
        bloom_prefilter(probes, small, "k", "k2", max_bits=1 << 16)


def test_interval_join_bin_width_knob(spark):
    """The interval-join skew knob (VERDICT r7 item 5): a 3-day
    session's explode volume must equal span/bin_width + 1 bins at each
    width (73 hourly bins vs 4 daily ones — the replication-factor
    arithmetic the docstring claims), the join result must be IDENTICAL
    at every width, and both must equal the naive O(n·m) reference."""
    import datetime as dt

    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.temporal import (
        binned_interval_join,
        interval_bins,
    )

    t0 = dt.datetime(2024, 3, 1, 0, 30)  # deliberately off the hour
    intervals = spark.createDataFrame(
        [
            (1, t0, t0 + dt.timedelta(hours=72)),           # the mega-session
            (2, t0 + dt.timedelta(hours=5), t0 + dt.timedelta(hours=6, minutes=30)),
        ],
        "user_id long, session_start timestamp, session_end timestamp",
    )
    # hourly incident points: inside, at the edges, and outside
    pts = [
        dt.datetime(2024, 3, 1, 0),    # session starts 00:30 < 01:00 → overlap
        dt.datetime(2024, 3, 1, 5),
        dt.datetime(2024, 3, 2, 12),
        dt.datetime(2024, 3, 4, 0),    # session ends 00:30 ≥ 00:00 → overlap
        dt.datetime(2024, 3, 4, 1),    # ends 00:30 < 01:00... end >= point? no
        dt.datetime(2024, 2, 28, 23),  # before everything
    ]
    points = spark.createDataFrame(
        [(h, i) for i, h in enumerate(pts)], "incident_hour timestamp, pid long"
    )

    # replication arithmetic: bins touched = floor-grid span + 1
    assert interval_bins(
        intervals.filter("user_id = 1"), "session_start", "session_end", 3600
    ).count() == 73
    assert interval_bins(
        intervals.filter("user_id = 1"), "session_start", "session_end", 24 * 3600
    ).count() == 4

    def run(width):
        return sorted(
            (r.user_id, r.pid)
            for r in binned_interval_join(
                intervals, points,
                start_col="session_start", end_col="session_end",
                point_col="incident_hour", bin_width_hours=width,
            ).collect()
        )

    # naive reference: closed interval vs half-open hour bucket
    rows_i = intervals.collect()
    rows_p = points.collect()
    want = sorted(
        (ri.user_id, rp.pid)
        for ri in rows_i
        for rp in rows_p
        if ri.session_start < rp.incident_hour + dt.timedelta(hours=1)
        and ri.session_end >= rp.incident_hour
    )
    assert (1, 4) not in want and (1, 0) in want and (1, 3) in want
    for width in (1, 5, 24):
        assert run(width) == want, f"bin_width_hours={width}"

    import pytest

    with pytest.raises(ValueError, match=">= 1"):
        binned_interval_join(
            intervals, points,
            start_col="session_start", end_col="session_end",
            point_col="incident_hour", bin_width_hours=0,
        )


def test_interval_join_rejects_bin_crossing_points(spark):
    """ADVICE r8: a point whose bucket straddles a bin boundary (00:30
    with 1h bins and a 1h bucket) would silently MISS intervals that
    only touch the bucket's tail bin — e.g. one starting 01:15, which
    overlaps [00:30, 01:30) but shares no bin with the point. The
    in-plan assert_true must fail the query loudly instead; null
    points keep their no-join behavior."""
    import datetime as dt

    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.temporal import (
        binned_interval_join,
    )

    intervals = spark.createDataFrame(
        [
            (
                1,
                dt.datetime(2024, 3, 1, 1, 15),
                dt.datetime(2024, 3, 1, 2, 0),
            )
        ],
        "user_id long, session_start timestamp, session_end timestamp",
    )
    misaligned = spark.createDataFrame(
        [(dt.datetime(2024, 3, 1, 0, 30), 0)],
        "incident_hour timestamp, pid long",
    )
    joined = binned_interval_join(
        intervals, misaligned,
        start_col="session_start", end_col="session_end",
        point_col="incident_hour", bin_width_hours=1,
    )
    with pytest.raises(SparkRuntimeException, match="crosses a 3600s bin"):
        joined.collect()
    # the same misaligned point is FINE under a wide-enough bin (the
    # whole [00:30, 01:30) bucket fits in one 24h bin) and finds the
    # overlapping interval the 1h plan would have missed
    wide = binned_interval_join(
        intervals, misaligned,
        start_col="session_start", end_col="session_end",
        point_col="incident_hour", bin_width_hours=24,
    )
    assert [(r.user_id, r.pid) for r in wide.collect()] == [(1, 0)]
    # null points: dropped, never a raise
    nulls = spark.createDataFrame(
        [(None, 1)], "incident_hour timestamp, pid long"
    )
    assert (
        binned_interval_join(
            intervals, nulls,
            start_col="session_start", end_col="session_end",
            point_col="incident_hour", bin_width_hours=1,
        ).count()
        == 0
    )


@pytest.mark.parametrize("n_probe", [4, 6])
def test_ivfpq_equals_numpy_reference(spark, n_probe):
    """Independent semantics check for the IVF-PQ composite (the
    oracle gate proves engine agreement; this proves the COMPOSITION
    rule with a from-scratch numpy reimplementation): collect the
    sf0.001 corpus, recompute cells (round-9 affinity argmax, ties →
    lowest cell), probe sets (stable argsort, top ``n_probe`` — 6 is
    the registered width, 4 exercises the narrower dial), ADC scores
    from the trained codebooks, mask unprobed/self pairs, rank with
    the (−score, neighbor_id) tie rule — and require the operator's
    full ranked output to match exactly."""
    import numpy as np

    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.similarity import (
        ivfpq_topk,
        to_double,
        train_ivf_centroids,
        train_pq_codebooks,
    )
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    got = [
        (r.query_id, r.rank, r.neighbor_id, r.cos_sim)
        for r in ivfpq_topk(
            e, q, id_col="vec_id", vec_col="embedding", k=10,
            n_cells=16, n_probe=n_probe,
        ).orderBy("query_id", "rank").collect()
    ]

    # --- numpy reference ---
    cent = train_ivf_centroids(e, n_cells=16, refine_iterations=0)
    books = train_pq_codebooks(e)
    rows = (
        e.select("vec_id", to_double(F.col("embedding")).alias("v"))
        .filter(F.col("v").isNotNull())
        .collect()
    )
    rows = [(r.vec_id, np.asarray(r.v, dtype=np.float64)) for r in rows
            if len(r.v) == 64]
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    V = np.stack([r[1] for r in rows])
    nrm = np.linalg.norm(V, axis=1, keepdims=True)
    Vu = V / np.where(nrm == 0.0, 1.0, nrm)
    aff = np.round(Vu @ cent.T, 9)
    cells = aff.argmax(axis=1)  # 0-based; argmax = lowest cell on ties
    n_subspaces, n_codes, sub_dim = books.shape
    codes = np.empty((len(ids), n_subspaces), dtype=np.int64)
    for s in range(n_subspaces):
        sub = Vu[:, s * sub_dim : (s + 1) * sub_dim]
        d2 = np.round(
            (sub**2).sum(1)[:, None] - 2.0 * (sub @ books[s].T)
            + (books[s] ** 2).sum(1)[None, :], 9,
        )
        codes[:, s] = np.argmin(d2, axis=1)
    expected = []
    is_q = ids % 100 == 0
    order_cells = np.argsort(-aff, axis=1, kind="stable")
    for qi in np.nonzero(is_q)[0]:
        probe = set(order_cells[qi, :n_probe].tolist())
        lut = np.stack(
            [Vu[qi, s * sub_dim : (s + 1) * sub_dim] @ books[s].T
             for s in range(n_subspaces)]
        )  # (n_subspaces, n_codes)
        cand = [
            (float(np.round(lut[np.arange(n_subspaces), codes[ci]].sum(), 9)),
             int(ids[ci]))
            for ci in range(len(ids))
            if int(cells[ci]) in probe and ids[ci] != ids[qi]
        ]
        cand.sort(key=lambda t: (-t[0], t[1]))
        for rank, (score, nid) in enumerate(cand[:10], start=1):
            expected.append((int(ids[qi]), rank, nid, round(score, 6)))
    expected.sort()
    assert got == expected
    assert len(expected) > 0


def test_ivfpq_recall_against_exact(spark):
    """The composite's recall anchor (same pattern as the PQ/LSH/IVF
    siblings): two compounding error sources mean the registered probe
    width is 6 (see `_IVFPQ_PROBE` in plans/llm.py — probe 4 measured
    0.42 here, the siblings' 0.5 anchor would have been a lie).
    recall@10 ≥ 0.4 on the fixture (measured 0.50 at probe 6), every
    rank ≤ 10, and every returned neighbor's TRUE cosine within 0.25
    of the true 10th-best — no wildly-wrong neighbors."""
    import numpy as np
    import pandas as pd

    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry

    queries, _ = merged_registry()
    approx = queries["sim_topk_ivfpq"](spark, SF).toPandas()
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
        got10 = set(approx[approx.query_id == qid]["neighbor_id"].tolist())
        hits += len(exact10 & got10)
        tot += len(exact10)
        kth_true = np.sort(cos)[::-1][9]
        for nid in got10:
            true_cos = cos[ids == nid][0]
            assert true_cos >= kth_true - 0.25, (qid, nid, true_cos, kth_true)
    assert hits / tot >= 0.4, f"IVF-PQ recall@10 collapsed: {hits / tot:.2f}"


def test_ivfpq_edge_vectors_and_empty_inputs(spark):
    """Degenerate-input contracts for the IVF-PQ pieces, mirroring the
    parent operators': null / wrong-width vectors are DROPPED by the
    joint encode (never a task crash), an all-invalid corpus yields the
    empty contract schema from the composite, and an empty query set
    yields the empty contract schema from the masked-ADC scorer."""
    import numpy as np

    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.similarity import (
        encode_ivfpq,
        ivfpq_adc_topk,
        ivfpq_topk,
        train_ivf_centroids,
        train_pq_codebooks,
    )
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, SF, "embeddings")
    cent = train_ivf_centroids(e, n_cells=16, refine_iterations=0)
    books = train_pq_codebooks(e)

    # null + ragged + zero-norm rows: only the valid-width rows survive
    # the encode (zero-norm IS valid — it gets the unit-division guard)
    bad = spark.createDataFrame(
        [
            (900001, None),
            (900002, [1.0, 2.0]),          # ragged: wrong width
            (900003, [0.0] * 64),          # zero-norm: valid, guarded
            (900004, [1.0] * 64),          # plain valid
        ],
        "vec_id long, embedding array<double>",
    )
    enc = encode_ivfpq(bad, books, cent).collect()
    assert sorted(r["__nid"] for r in enc) == [900003, 900004]
    for r in enc:
        assert len(r["__codes"]) == books.shape[0]
        assert 1 <= r["__cell"] <= 16

    # all-invalid corpus → composite returns the empty contract schema
    empty_corpus = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<double>"
    )
    out = ivfpq_topk(empty_corpus, empty_corpus, k=10)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "neighbor_id", "cos_sim", "rank",
    ]

    # empty query side → empty contract schema from the scorer
    index = encode_ivfpq(e, books, cent)
    no_q = e.filter(F.col("vec_id") < 0)
    out2 = ivfpq_adc_topk(index, books, cent, no_q, k=10, n_probe=6)
    assert out2.count() == 0
    assert [f.name for f in out2.schema.fields] == [
        "query_id", "neighbor_id", "cos_sim", "rank",
    ]


def test_pq_training_sample_exact_when_ragged_rows_displace(spark):
    """`train_pq_codebooks` fuses its dim probe into the sample collect
    (one TakeOrdered job) and filters wrong-width rows driver-side —
    but the sample contract is still "first train_sample VALID vectors
    by id" (the oracle's `WHERE len(v)=dim ... LIMIT`, ADVICE r7). When
    ragged rows displace sample candidates inside the collected prefix,
    the fallback re-collect must kick in: books trained on a corpus
    with ragged rows interleaved must equal books trained on the same
    corpus pre-filtered to the valid rows (which takes the fast path)."""
    import numpy as np
    from pyspark.sql import functions as F

    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.similarity import (
        train_pq_codebooks,
    )

    rows = []
    for i in range(1, 9):
        if i == 2:
            rows.append((i, [1.0, 2.0]))          # ragged: wrong width
        elif i == 6:
            rows.append((i, None))                # null: never sampled
        else:
            rows.append((i, [float(i), float(i) + 0.5,
                             float(i) * 2.0, 1.0]))
    ragged = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    clean = ragged.filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == 4)
    )

    # train_sample=4 < valid rows: the ragged id 2 sits inside the
    # collected prefix (ids 1,2,3,4), so the valid prefix is short and
    # the exact fallback must sample ids 1,3,4,5 — exactly what the
    # clean corpus's fast path samples.
    kw = dict(n_subspaces=2, n_codes=4, refine_iterations=2, train_sample=4)
    books_ragged = train_pq_codebooks(ragged, **kw)
    books_clean = train_pq_codebooks(clean, **kw)
    assert np.array_equal(books_ragged, books_clean)

    # fast path sanity: a whole-corpus sample (limit not hit) trains
    # identically whether or not ragged rows are present
    kw_all = dict(n_subspaces=2, n_codes=4, refine_iterations=2,
                  train_sample=100)
    assert np.array_equal(
        train_pq_codebooks(ragged, **kw_all),
        train_pq_codebooks(clean, **kw_all),
    )


def test_ivf_invalid_vector_contract(spark):
    """ADVICE r10 contracts: (a) `train_ivf_centroids(dim=...)` pushes
    the width predicate BEFORE the seed LIMIT — a ragged vector among
    (or at the head of) the first ids can never make the driver train
    different seeds than the oracle's `WHERE len(v)=dim ... LIMIT`;
    (b) `ivf_assign` DROPS null/ragged vectors, the same
    invalid-vector contract as `encode_ivfpq` and the oracles'
    valid-only inv/probes CTEs — no default-cell NULL-norm rows may
    reach a persisted inverted file."""
    import numpy as np

    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.similarity import (
        ivf_assign,
        train_ivf_centroids,
    )

    corpus = spark.createDataFrame(
        [
            (1, [3.0, 4.0]),              # ragged HEAD row (dim 2, not 3)
            (2, [1.0, 0.0, 0.0]),
            (3, None),                    # null
            (4, [0.0, 2.0, 0.0]),
            (5, [0.0, 0.0, 5.0]),
            (6, [1.0, 1.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    cent = train_ivf_centroids(corpus, n_cells=2, dim=3)
    # seeds = first 2 VALID-WIDTH vectors by id: ids 2 and 4, unit-norm
    expected = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    assert cent.shape == (2, 3)
    assert np.allclose(cent, expected)

    assigned = ivf_assign(
        corpus, cent, id_col="vec_id", vec_col="embedding",
        out_id="neighbor_id", keep_vec="__cv", top_cells=1,
    ).collect()
    # ragged id 1 and null id 3 are dropped; every surviving row has a
    # real norm and a real cell (never the default-order fallback)
    assert sorted(r["neighbor_id"] for r in assigned) == [2, 4, 5, 6]
    for r in assigned:
        assert r["__cv_n"] is not None
        assert r["__cell"] in (1, 2)


def test_two_level_rollup_cube_empty_source(spark, tmp_path):
    """ADVICE r10 investigated: the two-level rollup/cube rewrite did
    NOT change empty-source semantics, because Spark's SINGLE-level
    rollup/cube already emit zero rows over an empty input (no ()
    grand-total row) — verified here directly. The two-level form must
    match that native behavior exactly. DuckDB emits one
    (NULL, NULL, 0, NULL) row on this edge; that is a pre-existing
    Spark-vs-DuckDB engine difference, documented out of contract in
    `agg_rollup` (the testdata tables are never empty)."""
    from pyspark.sql import functions as F

    from new_kafka_consumer_to_hadoop_hdfs_spark.plans.relational import (
        agg_cube,
        agg_rollup,
    )
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import load_table

    sf = str(tmp_path)
    for name in ("orders", "lineitem"):
        load_table(spark, SF, name).limit(0).write.parquet(
            f"{sf}/{name}.parquet"
        )

    # native single-level baseline: empty input → zero rows
    empty_orders = load_table(spark, sf, "orders")
    single = (
        empty_orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*"), F.sum("o_totalprice"))
        .collect()
    )
    assert single == []

    # the registered two-level queries match it on the same edge
    assert agg_rollup(spark, sf).collect() == []
    assert agg_cube(spark, sf).collect() == []


def test_bfs_distances_semantics(spark, tmp_path):
    """BFS contract on a hand-built graph: min distance wins when two
    paths reach a node (diamond), the hop cap truncates a long chain,
    unreachable components are absent, duplicate seeds collapse, and
    both checkpoint modes agree. Graph (directed edges as given,
    symmetrized by the caller in the registered query; here directed
    on purpose to pin direction-following):

        0→1→2→3→4→5→6   chain
        0→10→11, 0→20→11 diamond: 11 at dist 2 both ways
        90→91            unreachable from seed 0
    """
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.graph import (
        bfs_distances,
    )

    chain = [(i, i + 1) for i in range(6)]
    diamond = [(0, 10), (10, 11), (0, 20), (20, 11)]
    island = [(90, 91)]
    edges = spark.createDataFrame(
        chain + diamond + island, "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,), (0,)], "node long")  # dup seed

    got = {
        r.node: r.dist
        for r in bfs_distances(edges, seeds, max_hops=4).collect()
    }
    assert got == {
        0: 0, 1: 1, 2: 2, 3: 3, 4: 4,  # chain cut at the 4-hop cap
        10: 1, 20: 1, 11: 2,           # diamond: min of two 2-paths
    }
    # early exit: a cap far beyond the eccentricity adds only the
    # chain's tail, never loops
    full = {
        r.node: r.dist
        for r in bfs_distances(edges, seeds, max_hops=100).collect()
    }
    assert full[6] == 6 and len(full) == len(got) + 2
    # reliable checkpoint mode agrees
    reliable = {
        r.node: r.dist
        for r in bfs_distances(
            edges, seeds, max_hops=4, checkpoint_dir=str(tmp_path / "ck")
        ).collect()
    }
    assert reliable == got


def test_mmr_rerank_diversifies():
    """MMR semantics on hand-built 2-D vectors: pure relevance would
    pick the two near-duplicates of the best match first; MMR's
    penalty forces the second pick to the off-axis candidate. Also
    pins the tie rule (min vec_id) and the pool-exhaustion stop."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.similarity import (
        mmr_rerank,
    )

    vecs = {
        0: [1.0, 0.0, 0.0],        # query
        1: [0.9, 0.435, 0.0],      # best match (rel ≈ 0.90)
        2: [0.9, 0.436, 0.0],      # near-duplicate of 1 (cos≈0.99999)
        3: [0.89, -0.435, 0.0],    # slightly less relevant, cos to 1 ≈ 0.62
    }
    picks = mmr_rerank(vecs, 0, [1, 2, 3], lam=0.7, k=3)
    assert [p[1] for p in picks] == [1, 3, 2], (
        "MMR must promote the diverse candidate over the near-duplicate"
    )
    assert [p[0] for p in picks] == [1, 2, 3]
    # pure relevance would have ordered 2 ahead of 3
    rel = {p[1]: p[2] for p in picks}
    assert rel[2] > rel[3]

    # exact tie between identical candidates: smallest vec_id wins
    tie = {0: [1.0, 0.0], 7: [1.0, 0.5], 5: [1.0, 0.5]}
    first = mmr_rerank(tie, 0, [7, 5], lam=0.7, k=1)
    assert first[0][1] == 5

    # k beyond the pool: stops at pool exhaustion, ranks stay dense
    short = mmr_rerank(vecs, 0, [1, 3], lam=0.7, k=10)
    assert [p[0] for p in short] == [1, 2] and len(short) == 2
