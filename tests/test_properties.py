"""Property-based checks (SURVEY.md §5 item 5) with hypothesis.

Spark-session-per-example is too slow for classic hypothesis loops, so
each property generates a batch of randomized fixtures ONCE per run
(seeded by hypothesis for shrinkability) and asserts the invariant over
the whole batch inside a single Spark job.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from new_kafka_consumer_to_hadoop_hdfs_spark.operators.dedup import (
    dedup_last_write_wins,
)
from new_kafka_consumer_to_hadoop_hdfs_spark.operators.text import (
    jaccard,
    jaccard_verify_pairs,
    word_shingles,
)

_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),  # partition
        st.integers(0, 5),  # id
        st.integers(0, 50),  # offset
        st.text(alphabet="abc ", min_size=0, max_size=12),
    ),
    min_size=1,
    max_size=40,
)


@given(rows=rows_strategy)
@_SETTINGS
def test_dedup_is_idempotent_and_unique(spark, rows):
    df = spark.createDataFrame(
        rows, "partition int, id int, offset int, msg string"
    )
    keys = ["partition", "id"]
    order = [F.col("offset").desc(), F.col("msg").asc()]
    once = dedup_last_write_wins(df, keys, order)
    twice = dedup_last_write_wins(once, keys, order)

    got_once = sorted(map(tuple, once.collect()))
    got_twice = sorted(map(tuple, twice.collect()))
    assert got_once == got_twice  # idempotence
    # uniqueness per key
    key_set = [(r[0], r[1]) for r in got_once]
    assert len(key_set) == len(set(key_set))
    # output ⊆ input
    input_set = set(map(tuple, rows))
    assert set(got_once) <= input_set
    # survivor is the argmax by (offset desc, msg asc) — recompute in python
    best = {}
    for p, i, o, m in rows:
        cur = best.get((p, i))
        if cur is None or (-o, m) < (-cur[2], cur[3]):
            best[(p, i)] = (p, i, o, m)
    assert set(got_once) == set(best.values())


texts_strategy = st.lists(
    st.lists(
        st.sampled_from(["row", "scan", "agg", "key", "the", "fast"]),
        min_size=3,
        max_size=12,
    ).map(" ".join),
    min_size=2,
    max_size=12,
)


@given(texts=texts_strategy)
@_SETTINGS
def test_relational_jaccard_equals_array_jaccard(spark, texts):
    """jaccard_verify_pairs (explode/join/count path) must agree with
    the direct array-expression Jaccard for every candidate pair."""
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    sh = docs.select(
        "doc_id", word_shingles(F.split("text", " "), 3).alias("sh")
    ).filter(F.size("sh") > 0)
    ids = [r.doc_id for r in sh.select("doc_id").collect()]
    if len(ids) < 2:
        return
    pairs = [(a, b) for a in ids for b in ids if a < b]
    cands = spark.createDataFrame(pairs, "doc_id_a long, doc_id_b long")

    rel = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in jaccard_verify_pairs(cands, sh, "doc_id", threshold=0.0).collect()
    }
    a = sh.select(F.col("doc_id").alias("doc_id_a"), F.col("sh").alias("sa"))
    b = sh.select(F.col("doc_id").alias("doc_id_b"), F.col("sh").alias("sb"))
    direct = {
        (r.doc_id_a, r.doc_id_b): r.j
        for r in cands.join(a, "doc_id_a")
        .join(b, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            F.round(jaccard(F.col("sa"), F.col("sb")), 6).alias("j"),
        )
        .collect()
        if r.j > 0
    }
    assert rel == direct


def test_approx_percentiles_track_exact(spark, sf_dir):
    """The sketch twin must stay within t-digest-style error of the
    exact per-group percentiles it mirrors (anchor for the rows-only
    agg_approx_percentiles query)."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry

    qs = merged_registry()[0]
    from pyspark.sql import functions as SF

    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import load_table

    exact = {r.event_type: r for r in qs["agg_percentiles"](spark, sf_dir).collect()}
    approx = {r.event_type: r for r in qs["agg_approx_percentiles"](spark, sf_dir).collect()}
    assert set(exact) == set(approx)
    # approx_percentile returns a TRUE data value near the target rank
    # (never interpolates), so bound each estimate by the exact
    # interpolated percentiles one rank-percent either side — the
    # correct acceptance window for a rank-error sketch.
    ev = load_table(spark, sf_dir, "events")
    bounds = {
        r.event_type: r
        for r in ev.groupBy("event_type").agg(
            *[
                SF.expr(f"percentile(value, {q})").alias(f"b{i}")
                for i, q in enumerate((0.49, 0.51, 0.89, 0.91, 0.98, 1.0))
            ]
        ).collect()
    }
    for et, e in exact.items():
        a = approx[et]
        assert a.n == e.n
        b = bounds[et]
        for p, (lo, hi) in (("p50", (b.b0, b.b1)), ("p90", (b.b2, b.b3)), ("p99", (b.b4, b.b5))):
            assert lo - 1e-6 <= getattr(a, p) <= hi + 1e-6, (
                f"{et}.{p}: approx {getattr(a, p)} outside exact rank window [{lo}, {hi}]"
            )


def test_hll_union_rollup_exact_at_low_cardinality(spark, sf_dir):
    """20 distinct sources is far below HLL's error regime, so every
    per-lang estimate and the unioned total must equal the exact
    distinct counts (anchor for the rows-only agg_hll_union_rollup)."""
    from pyspark.sql import functions as SF

    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import load_table

    qs = merged_registry()[0]
    got = {r.lang: r for r in qs["agg_hll_union_rollup"](spark, sf_dir).collect()}
    d = load_table(spark, sf_dir, "documents")
    exact = {
        r.lang: r.n
        for r in d.groupBy("lang").agg(SF.countDistinct("source").alias("n")).collect()
    }
    exact["__all__"] = d.select("source").distinct().count()
    assert {k: int(v.approx_sources) for k, v in got.items()} == exact
    assert got["__all__"].n_docs == d.count()


def test_pack_sequences_layout_invariants(spark, sf_dir):
    """The packing layout must be a valid concatenation stream per
    shard: offsets start at 0, are contiguous (each doc begins where
    the previous ended), never overlap, and chunk ids are consistent
    with the 128-token budget."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry

    qs = merged_registry()[0]
    rows = qs["pipeline_pack_sequences"](spark, sf_dir).collect()
    by_shard: dict[tuple, list] = {}
    for r in rows:
        by_shard.setdefault((r.source, r.shard), []).append(r)
    assert len(by_shard) > 1  # sharding actually splits sources
    for (_, _), docs in by_shard.items():
        docs.sort(key=lambda r: r.doc_id)
        expected_offset = 0
        for r in docs:
            assert r.start_offset == expected_offset  # contiguous, no gaps
            assert r.chunk_id == r.start_offset // 128
            last_token = r.start_offset + max(r.n_tokens, 1) - 1
            assert r.spans_boundary == (last_token // 128 != r.chunk_id)
            expected_offset += r.n_tokens


texts_for_lm = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=16),
    min_size=1,
    max_size=25,
)


@given(texts=texts_for_lm)
@_SETTINGS
def test_self_surprisal_invariants(spark, texts):
    """For ANY corpus: self-scored surprisal is non-negative, max ≥ avg,
    n_bigrams = n_tokens − 1, and docs with < 2 tokens are omitted —
    and external scoring against the corpus's own index reports zero
    OOV with identical values (the self/external twin contract)."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.text import (
        bigram_count_index,
        bigram_surprisal_scores,
        score_against_bigram_index,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    n_tokens = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id",
            F.size(F.filter(F.split("text", " "), lambda t: t != F.lit(""))).alias("n"),
        ).collect()
    }
    got = {r.doc_id: r for r in bigram_surprisal_scores(df, "doc_id", "text").collect()}
    for doc_id, n in n_tokens.items():
        if n < 2:
            assert doc_id not in got
        else:
            r = got[doc_id]
            assert r.n_bigrams == n - 1
            assert 0.0 <= r.avg_surprisal <= r.max_surprisal

    index = bigram_count_index(df, "text")
    total = index.agg(F.sum("__c2")).first()[0]
    if total:
        ext = {
            r.doc_id: r
            for r in score_against_bigram_index(
                df, "doc_id", "text", index, n_index_bigrams=int(total)
            ).collect()
        }
        assert set(ext) == set(got)
        for doc_id, r in ext.items():
            assert r.n_oov == 0
            assert r.avg_surprisal == got[doc_id].avg_surprisal
            assert r.max_surprisal == got[doc_id].max_surprisal


# ---------------------------------------------------------------------------
# Round-5 corpus operators: sliding chunker and CDC compaction
# ---------------------------------------------------------------------------

_CHUNK_TEXTS = st.lists(
    st.text(
        # BMP chars incl. multibyte CJK — exercises char-vs-byte indexing
        alphabet=st.sampled_from(list("ab c.€中文ß\t")),
        min_size=0,
        max_size=40,
    ),
    min_size=1,
    max_size=15,
)


@given(texts=_CHUNK_TEXTS, width=st.integers(2, 12), stride=st.integers(1, 10))
@_SETTINGS
def test_sliding_chunks_match_python_slicing(spark, texts, width, stride):
    """Every chunk must equal the Python slice text[start-1:start-1+width]
    (code-point semantics), starts must be 1, 1+stride, ..., and the
    chunk set must cover the full text when stride <= width."""
    import hashlib

    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.text import (
        sliding_chunks,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = sliding_chunks(df, "doc_id", "text", width=width, stride=stride)
    by_doc: dict[int, list] = {}
    for r in got.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in rows:
        chunks = sorted(by_doc.get(doc_id, []), key=lambda r: r.chunk_idx)
        expected_starts = list(range(1, max(len(text), 1) + 1, stride))
        assert [c.chunk_start for c in chunks] == expected_starts, (
            doc_id, text
        )
        for c in chunks:
            py = text[c.chunk_start - 1 : c.chunk_start - 1 + width]
            assert c.chunk_len == len(py)
            assert c.chunk_md5 == hashlib.md5(py.encode("utf-8")).hexdigest()
        if stride <= width and text:
            covered = len(text) >= 1 and (
                chunks[-1].chunk_start - 1 + width >= len(text)
            )
            assert covered, "chunks must reach the end of the text"


_CDC_OPS = st.lists(
    st.tuples(
        st.integers(0, 4),           # key
        st.integers(0, 20),          # ts
        st.booleans(),               # is delete
        st.floats(0, 100, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=40,
)


@given(ops=_CDC_OPS)
@_SETTINGS
def test_cdc_compact_matches_python_fold(spark, ops):
    """cdc_compact == a trivial per-key python fold over (ts, seq)
    order: last op wins, delete removes the key, counts are exact."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.dedup import (
        cdc_compact,
    )

    rows = [
        (k, ts, seq, "D" if d else "U", float(v))
        for seq, (k, ts, d, v) in enumerate(ops)
    ]
    df = spark.createDataFrame(rows, "key int, ts int, seq int, op string, value double")
    got = {
        r.key: (r.last_ts, round(r.last_value, 6), r.n_ops, r.n_deletes)
        for r in cdc_compact(
            df,
            "key",
            ts_col="ts",
            seq_col="seq",
            is_delete=F.col("op") == "D",
            value_col="value",
        ).collect()
    }
    expected = {}
    for k in {r[0] for r in rows}:
        key_rows = sorted((r for r in rows if r[0] == k), key=lambda r: (r[1], r[2]))
        last = key_rows[-1]
        n_ops = len(key_rows)
        n_del = sum(1 for r in key_rows if r[3] == "D")
        if last[3] != "D":
            expected[k] = (last[1], round(last[4], 6), n_ops, n_del)
    assert got == expected


_interval_rows = st.lists(
    st.tuples(
        st.integers(0, 3),        # user_id
        st.integers(0, 3000),     # minutes offset from base
        st.sampled_from(["error", "view"]),
    ),
    min_size=1,
    max_size=60,
)


@given(rows=_interval_rows)
@_SETTINGS
def test_interval_overlap_matches_python_brute_force(spark, tmp_path, rows):
    """The binned interval-overlap rewrite must equal the O(n·m)
    definition — sessionize (30-min strict gap), incident hours
    (≥ 3 errors), every (session, hour) pair satisfying
    start < h+1h AND end >= h — on randomized event layouts, including
    duplicate timestamps and sessions spanning many hour bins."""
    import datetime as dt
    import itertools
    from collections import Counter, defaultdict

    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry

    base = dt.datetime(2024, 1, 1)
    fixture = [
        (eid, base + dt.timedelta(minutes=m), uid, et, 1.0, "{}")
        for eid, (uid, m, et) in enumerate(rows)
    ]
    d = tmp_path / f"io_{next(_interval_overlap_counter)}"
    spark.createDataFrame(
        fixture,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(d / "events.parquet"))
    queries, _ = merged_registry()
    got = {
        (r.user_id, r.session_start, r.session_end, r.incident_hour, r.n_errors)
        for r in queries["join_interval_overlap"](spark, str(d)).collect()
    }

    by_user = defaultdict(list)
    for eid, ts, uid, _et, _v, _p in fixture:
        by_user[uid].append((ts, eid))
    sessions = []
    for uid, evs in by_user.items():
        evs.sort()
        cur = [evs[0]]
        for prev, nxt in zip(evs, evs[1:]):
            if nxt[0] - prev[0] > dt.timedelta(minutes=30):
                sessions.append((uid, cur[0][0], cur[-1][0]))
                cur = [nxt]
            else:
                cur.append(nxt)
        sessions.append((uid, cur[0][0], cur[-1][0]))
    hours = Counter(
        ts.replace(minute=0, second=0, microsecond=0)
        for _eid, ts, _uid, et, _v, _p in fixture
        if et == "error"
    )
    want = {
        (uid, s, e, h, n)
        for (uid, s, e) in sessions
        for h, n in hours.items()
        if n >= 3 and s < h + dt.timedelta(hours=1) and e >= h
    }
    assert got == want


_interval_overlap_counter = iter(range(10**6))


_ewma_rows = st.lists(
    st.tuples(
        st.integers(0, 3),      # user_id
        st.integers(0, 500),    # minutes offset
        st.integers(-10**6, 10**6),  # value scaled /8 → dyadic double
    ),
    min_size=1,
    max_size=50,
)


@given(rows=_ewma_rows)
@_SETTINGS
def test_ewma_matches_python_fold(spark, tmp_path, rows):
    """The JVM `aggregate` fold must equal a plain Python fold to
    within HALF a rounding-grid step (5e-7): the unrounded folds are
    bit-identical (same IEEE ops in the same order — pinned exactly by
    test_ewma_hand_computed and the driver oracle), but the final
    6-decimal rounding can differ by one grid unit on exact-boundary
    values: Spark's F.round goes through BigDecimal.valueOf(double)
    (rounds the SHORTEST-STRING decimal repr) while any Python
    replication rounds either the exact binary expansion or the repr —
    hypothesis finds dyadic inputs landing exactly on x.xxxxxx5.
    Duplicate timestamps fall back to event_id order on both sides."""
    import datetime as dt
    from collections import defaultdict

    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry

    base = dt.datetime(2024, 1, 1)
    fixture = [
        (eid, base + dt.timedelta(minutes=m), uid, "view", v / 8.0, "{}")
        for eid, (uid, m, v) in enumerate(rows)
    ]
    d = tmp_path / f"ew_{next(_ewma_counter)}"
    spark.createDataFrame(
        fixture,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(d / "events.parquet"))
    queries, _ = merged_registry()
    got = {
        r.user_id: (r.n_events, r.ewma_last)
        for r in queries["event_ewma_smoothing"](spark, str(d)).collect()
    }

    by_user = defaultdict(list)
    for eid, ts, uid, _et, v, _p in fixture:
        by_user[uid].append((ts, eid, v))
    for uid, evs in by_user.items():
        evs.sort()
        s = evs[0][2]
        for _ts, _eid, v in evs[1:]:
            s = s * 0.7 + v * 0.3
        n_got, ewma_got = got.pop(uid)
        assert n_got == len(evs)
        # half a rounding-grid step PLUS the representation error of
        # the rounded double itself, which scales with |s| (at
        # |s|≈1500 it is ~1.7e-13 — hypothesis found a boundary case
        # where a fixed 1e-13 cushion was one ulp too tight); still
        # far below the 1e-6 grid, so a real off-by-one-grid rounding
        # bug keeps failing loudly.
        assert abs(ewma_got - s) <= 5e-7 + abs(s) * 1e-12, (uid, ewma_got, s)
    assert not got, f"unexpected users: {got}"


_ewma_counter = iter(range(10**6))


# ---------------------------------------------------------------------------
# Sketch tracking-error gates (VERDICT r9 task 6)
#
# The 4 rows-only queries (agg_approx_count_distinct,
# agg_approx_percentiles, agg_hll_union_rollup,
# event_distinct_sliding_hll) are structurally un-oracle-able — Spark's
# HLL++/t-digest/Datasketches state is not restatable in DuckDB — so
# their correctness evidence is these gates: at BOTH driver SFs, every
# estimate must track its exact twin within the CONFIGURED error bound
# (3× the rsd ≈ the 99.7th percentile of the sketch's error model),
# and the bound itself must scale when the configuration changes
# (three independent sketch configurations play the role of seeds —
# Spark's sketch aggregates are not seedable).
# ---------------------------------------------------------------------------

import pytest as _pytest

_SKETCH_SFS = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")


@_pytest.mark.parametrize("sf", _SKETCH_SFS)
def test_sketch_queries_track_exact_twins(spark, sf):
    """Each rows-only sketch query's estimates vs its exact twin at
    both driver SFs: HLL relative error <= 3x configured rsd,
    approx_percentile inside the exact +-1-rank-percent value window."""
    from pyspark.sql import functions as SF

    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import load_table

    qs = merged_registry()[0]

    # agg_approx_count_distinct: rsd=0.02 per query definition
    li = load_table(spark, sf, "lineitem")
    exact_cd = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(SF.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    got_cd = {
        r.l_returnflag: r for r in qs["agg_approx_count_distinct"](spark, sf).collect()
    }
    assert set(got_cd) == set(exact_cd)
    for flag, n in exact_cd.items():
        err = abs(got_cd[flag].approx_parts - n) / n
        assert err <= 3 * 0.02, (sf, flag, got_cd[flag].approx_parts, n)

    # agg_hll_union_rollup: hll_sketch_agg default lgConfigK=12 →
    # rsd ≈ 1.04/sqrt(4096) ≈ 0.016; per-lang AND the unioned __all__
    d = load_table(spark, sf, "documents")
    exact_src = {
        r.lang: r.n
        for r in d.groupBy("lang").agg(SF.countDistinct("source").alias("n")).collect()
    }
    exact_src["__all__"] = d.select("source").distinct().count()
    got_src = {r.lang: r for r in qs["agg_hll_union_rollup"](spark, sf).collect()}
    assert set(got_src) == set(exact_src)
    for lang, n in exact_src.items():
        err = abs(got_src[lang].approx_sources - n) / n
        assert err <= 3 * 0.0163, (sf, lang, got_src[lang].approx_sources, n)

    # event_distinct_sliding_hll vs the exact sliding twin, per window
    exact_w = {
        r.window_start: r.n_users
        for r in qs["event_distinct_sliding"](spark, sf).collect()
    }
    got_w = {
        r.window_start: r.n_users_approx
        for r in qs["event_distinct_sliding_hll"](spark, sf).collect()
    }
    assert set(exact_w) == set(got_w)
    for ws, n in exact_w.items():
        assert abs(got_w[ws] - n) <= max(2, 3 * 0.0163 * n), (sf, ws, got_w[ws], n)

    # agg_approx_percentiles: accuracy=10000 → rank error <= 1e-4; gate
    # with the (generous, still meaningful) +-1-rank-percent value
    # window of the exact distribution, the same acceptance rule the
    # sf0.001 anchor test uses
    ev = load_table(spark, sf, "events")
    bounds = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            *[
                SF.expr(f"percentile(value, {q})").alias(f"b{i}")
                for i, q in enumerate((0.49, 0.51, 0.89, 0.91, 0.98, 1.0))
            ]
        )
        .collect()
    }
    got_p = {r.event_type: r for r in qs["agg_approx_percentiles"](spark, sf).collect()}
    assert set(got_p) == set(bounds)
    for et, b in bounds.items():
        a = got_p[et]
        for p, (lo, hi) in (
            ("p50", (b.b0, b.b1)), ("p90", (b.b2, b.b3)), ("p99", (b.b4, b.b5)),
        ):
            assert lo - 1e-6 <= getattr(a, p) <= hi + 1e-6, (sf, et, p, getattr(a, p))


def test_sketch_error_scales_with_configuration(spark):
    """The error bound must be a property of the CONFIGURATION, not a
    lucky constant: three rsd settings of approx_count_distinct and
    three accuracies of approx_percentile (the seed axis — Spark
    sketches are deterministic per config) each track the exact value
    within 3x their own bound on the same sf0.01 data."""
    from pyspark.sql import functions as SF

    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import load_table

    sf = "/root/testdata/sf0.01"
    li = load_table(spark, sf, "lineitem")
    exact = li.select(SF.countDistinct("l_partkey")).collect()[0][0]
    for rsd in (0.01, 0.02, 0.05):
        approx = li.select(
            SF.approx_count_distinct("l_partkey", rsd)
        ).collect()[0][0]
        assert abs(approx - exact) / exact <= 3 * rsd, (rsd, approx, exact)

    ev = load_table(spark, sf, "events")
    exact_p50 = ev.select(SF.expr("percentile(value, 0.5)")).collect()[0][0]
    n_rows = ev.count()
    vals_sorted = None
    for accuracy in (100, 1000, 10000):
        approx_p50 = ev.select(
            SF.expr(f"approx_percentile(value, 0.5, {accuracy})")
        ).collect()[0][0]
        # rank-error contract: the estimate's RANK is within n/accuracy
        # of the true median rank
        if vals_sorted is None:
            vals_sorted = sorted(
                r.value for r in ev.select("value").collect()
            )
        import bisect

        rank = bisect.bisect_left(vals_sorted, approx_p50)
        assert abs(rank - n_rows / 2) <= max(1, n_rows / accuracy) + 1, (
            accuracy, approx_p50, exact_p50, rank, n_rows,
        )


# ---------------------------------------------------------------------------
# Change-feed reconstruction property (versioned table)
# ---------------------------------------------------------------------------

# a short random mutation script: each step is ("merge", slice, tag)
# or ("delete", lo, hi) over keys 0..19
_ops_strategy = st.lists(
    st.one_of(
        st.tuples(
            st.just("merge"),
            st.integers(0, 3),        # key slice: doc_id % 4 == s
            st.integers(0, 9),        # payload tag
        ),
        st.tuples(
            st.just("delete"),
            st.integers(0, 19),       # lo
            st.integers(0, 19),       # hi (swapped if needed)
        ),
    ),
    min_size=1,
    max_size=4,
)


@given(ops=_ops_strategy)
@_SETTINGS
def test_changes_reconstructs_state(spark, tmp_path_factory, ops):
    """CDF soundness+completeness as an algebraic property: for ANY
    mutation sequence, applying the window's change feed to the old
    snapshot's row set must yield exactly the new snapshot's row set —
    old − delete − update_pre + update_post + insert == new. Exercises
    multi-commit windows, overlapping slices, empty-effect commits,
    and copy-on-write ballast at once; a feed that dropped, doubled,
    or misclassified any row cannot pass."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        append_batch,
        changes,
        delete_where,
        merge_upsert,
        read_manifest,
        read_snapshot,
        read_table,
    )

    schema = "doc_id long, text string"
    root = str(tmp_path_factory.mktemp("cdfprop") / "t")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], schema
    )
    append_batch(base.repartition(3), root, 0, stats_col="doc_id")
    from_name, _ = read_manifest(root)

    for op in ops:
        if op[0] == "merge":
            _, s, tag = op
            upd = base.filter(F.col("doc_id") % 4 == s).withColumn(
                "text", F.concat(F.col("text"), F.lit(f"#{tag}"))
            )
            merge_upsert(spark, root, schema, upd, "doc_id",
                         stats_col="doc_id")
        else:
            _, lo, hi = op
            lo, hi = min(lo, hi), max(lo, hi)
            delete_where(spark, root, schema, "doc_id", lo, hi,
                         stats_col="doc_id")

    old_rows = {
        (r.doc_id, r.text)
        for r in read_snapshot(spark, root, from_name, schema).collect()
    }
    new_rows = {
        (r.doc_id, r.text)
        for r in read_table(spark, root, schema).collect()
    }
    feed = changes(
        spark, root, schema, "doc_id", from_name, update_preimages=True
    ).collect()

    reconstructed = set(old_rows)
    for r in feed:
        item = (r.doc_id, r.text)
        if r._change in ("delete", "update_pre"):
            assert item in reconstructed, f"retracting absent row {item}"
            reconstructed.discard(item)
        else:  # insert / update_post
            assert item not in reconstructed, f"double-adding {item}"
            reconstructed.add(item)
    assert reconstructed == new_rows


# --- BPE tokenizer properties (round 13, VERDICT r12 task 7) ----------


def _py_symbolize(word: str) -> str:
    return " " + "  ".join(word) + " "


def _py_merge(sym: str, left: str, right: str) -> str:
    # Python str.replace is non-overlapping left-to-right — the same
    # semantics as Spark's `replace` and DuckDB's `replace`, which is
    # the cross-engine contract the space-wrapped encoding relies on
    return sym.replace(f" {left}  {right} ", f" {left}{right} ")


@given(
    st.lists(
        st.text(
            st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
        unique=True,
    ),
    st.integers(min_value=0, max_value=4),
)
@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bpe_encode_decode_identity(spark, words, n_merges):
    """encode∘decode is the identity on any word for ANY merge chain:
    merging only ever fuses adjacent symbols, so stripping the wrap
    and separators always reconstructs the original word — the
    round-trip property that makes a BPE vocabulary lossless."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.bpe import (
        decode_sym,
        merge_expr,
        symbolize,
        token_count,
    )

    # learn plausible merges from the words themselves (first n pairs)
    pairs = []
    for w in words:
        for a, b in zip(w, w[1:]):
            if (a, b) not in pairs:
                pairs.append((a, b))
    merges = pairs[:n_merges]

    df = spark.createDataFrame([(w,) for w in words], "w string")
    sym = symbolize(F.col("w"))
    for left, right in merges:
        sym = merge_expr(sym, left, right)
    got = df.select("w", sym.alias("sym"),
                    token_count(sym).alias("n")).collect()
    for r in got:
        assert decode_sym(r.sym) == r.w, (r.sym, r.w)
        # Spark's replace chain must equal the Python mirror exactly
        expect = _py_symbolize(r.w)
        for left, right in merges:
            expect = _py_merge(expect, left, right)
        assert r.sym == expect
        assert r.n == len(expect.strip().split("  "))


def test_bpe_merge_is_greedy_left_to_right(spark):
    """The classic overlap case: merging (a, a) in 'aaa' must produce
    ['aa', 'a'] — greedy non-overlapping left-to-right, NOT ['a','aa']
    and not a double merge. The space-wrapped encoding guarantees it
    because the first match consumes the shared wrap spaces."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.bpe import (
        merge_expr,
        symbolize,
    )

    df = spark.createDataFrame(
        [("aaa",), ("aaaa",), ("baaab",)], "w string"
    )
    got = {
        r.w: r.sym
        for r in df.select(
            "w", merge_expr(symbolize(F.col("w")), "a", "a").alias("sym")
        ).collect()
    }
    assert got["aaa"] == " aa  a "
    assert got["aaaa"] == " aa  aa "
    assert got["baaab"] == " b  aa  a  b "


def test_bpe_training_matches_sequential_reference(spark):
    """train_bpe's distributed rounds must equal a straightforward
    sequential Python BPE (pair counting over a freq dict, same
    tie-break) on a fixture corpus — the cross-implementation check
    that the Spark aggregation + argmax + replace chain IS the
    textbook procedure."""
    from collections import Counter

    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.bpe import (
        train_bpe,
        word_frequencies,
    )

    texts = [
        "the cat sat on the mat",
        "the bat and the cat",
        "a mat and a hat",
        "that cat, that hat!",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = train_bpe(word_frequencies(docs), 5)

    # sequential reference
    freq = Counter(w for t in texts for w in t.split() if w)
    vocab = {w: _py_symbolize(w) for w in freq}
    expect = []
    for _ in range(5):
        counts: Counter = Counter()
        for w, f in freq.items():
            syms = vocab[w].strip().split("  ")
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        vocab = {w: _py_merge(s, left, right) for w, s in vocab.items()}
        toks = sum(
            f * len(vocab[w].strip().split("  ")) for w, f in freq.items()
        )
        expect.append((left, right, cnt, toks))
    assert got == expect


def _py_train_bpe(texts, rounds):
    """Sequential reference BPE trainer (same tie-break as train_bpe);
    returns a training-order merge list the greedy-rank encoder's
    equivalence argument requires."""
    from collections import Counter

    freq = Counter(w for t in texts for w in t.split() if w)
    vocab = {w: _py_symbolize(w) for w in freq}
    merges = []
    for _ in range(rounds):
        counts: Counter = Counter()
        for w, f in freq.items():
            syms = vocab[w].strip().split("  ")
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (left, right), _cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        vocab = {w: _py_merge(s, left, right) for w, s in vocab.items()}
        merges.append((left, right))
    return merges


@given(
    st.lists(
        st.text(
            st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1,
            max_size=14,
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=12),
)
@settings(max_examples=200, deadline=None)
def test_bpe_greedy_rank_equals_sequential_chain(words, rounds):
    """The Arrow encoder's core loop (rank-greedy apply) must equal
    applying the merges SEQUENTIALLY in training order (the
    chained-replace form) on every word — the equivalence that makes
    encode_tokens_arrow a drop-in twin of encode_tokens. Merge lists
    come from a reference trainer, so they satisfy the training-order
    property the equivalence proof relies on."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.bpe import (
        _greedy_token_count,
    )

    merges = _py_train_bpe(words, rounds)
    ranks = {m: i for i, m in enumerate(merges)}
    for w in set(w for t in words for w in t.split() if w):
        sym = _py_symbolize(w)
        for left, right in merges:
            sym = _py_merge(sym, left, right)
        expect = len(sym.strip().split("  "))
        assert _greedy_token_count(w, ranks) == expect, (w, merges)


def test_bpe_arrow_encoder_matches_chained_on_trained_vocab(spark):
    """Differential gate (VERDICT r13 item 2): encode_tokens (chained
    JVM replaces) and encode_tokens_arrow (pandas_udf greedy) must
    produce IDENTICAL token counts for every word of the corpus they
    were trained on."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.bpe import (
        encode_tokens,
        encode_tokens_arrow,
        train_bpe,
        word_frequencies,
    )

    texts = [
        "the cat sat on the mat and the hat",
        "that bat and that cat chat",
        "mats hats bats cats that the an and",
        "a hat on a mat, a cat on a bat!",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    wf = word_frequencies(docs)
    merges = train_bpe(wf, 8)
    got = wf.select(
        "w",
        encode_tokens(F.col("w"), merges).alias("chained"),
        encode_tokens_arrow(F.col("w"), merges).alias("arrow"),
    ).collect()
    assert got, "fixture vocabulary is non-empty"
    for r in got:
        assert r.chained == r.arrow, (r.w, r.chained, r.arrow)


def test_bpe_auto_dispatch_and_codegen(spark):
    """The plan-size/codegen assertion: at a test-sized vocabulary the
    auto dispatcher keeps the chained whole-stage-codegen projection
    (zero Python), and past CODEGEN_MERGE_LIMIT it switches to the
    Arrow encoder (ArrowEvalPython) instead of growing the expression
    tree past the codegen-friendly size."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.bpe import (
        CODEGEN_MERGE_LIMIT,
        encode_tokens_auto,
    )

    df = spark.createDataFrame([("abcdef",), ("aabbcc",)], "w string")
    small = [("a", "b"), ("c", "d")]
    # a large VALID-ORDER merge list: single-char pairs over a wide
    # alphabet (single-char pairs can never create occurrences of one
    # another, so any order is training-consistent)
    import itertools

    alphabet = [chr(c) for c in range(0x21, 0x7F)]
    big = list(itertools.islice(
        ((a, b) for a, b in itertools.product(alphabet, alphabet) if a != b),
        CODEGEN_MERGE_LIMIT + 40,
    ))

    plan_small = df.select(
        encode_tokens_auto(F.col("w"), small).alias("n")
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan_small
    # the `*(n)` prefix marks a whole-stage-codegen'd span
    assert "*(1) Project" in plan_small, plan_small
    assert "replace(" in plan_small

    plan_big = df.select(
        encode_tokens_auto(F.col("w"), big).alias("n")
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan_big, plan_big
    assert "replace(" not in plan_big, "big vocab must not chain replaces"

    # both dispatch targets agree on the small vocabulary
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.bpe import (
        encode_tokens,
        encode_tokens_arrow,
    )

    got = df.select(
        encode_tokens(F.col("w"), small).alias("chained"),
        encode_tokens_arrow(F.col("w"), small).alias("arrow"),
    ).collect()
    for r in got:
        assert r.chained == r.arrow
