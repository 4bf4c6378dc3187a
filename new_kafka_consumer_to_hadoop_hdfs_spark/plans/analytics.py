"""Round-6 capability extensions: storage, warehouse-history, graph,
vector, skew-join, and curriculum queries.

Each adds a FAMILY the registry did not previously cover, not another
shape variant of an existing one:

- ``sink_orc_roundtrip``         — ORC write→read under the same
  checksum gate as the JSON-lines / CSV sinks (the columnar
  interchange format Hive/Trino shops still run on).
- ``pipeline_scd2_intervals``    — slowly-changing-dimension type-2
  history construction via gaps-and-islands (collapse consecutive
  equal states into [valid_from, valid_to) intervals).
- ``pipeline_graph_triangles``   — per-node triangle counts over the
  exact near-dup graph (clique-density audit; third graph primitive
  next to connected components and PageRank).
- ``embedding_centroid_per_label`` — element-wise mean embedding per
  label (the vector-aggregation primitive behind IVF seeding,
  cluster drift monitoring, and class prototypes).
- ``join_salted_skew``           — the salted-join skew technique
  under the oracle gate (hot-key fact⋈dim where the dim is
  replicated per salt instead of broadcast).
- ``pipeline_curriculum_order``  — deterministic global curriculum
  position (easy→hard stages, hash-shuffled within stage) assigned
  WITHOUT a global sort.

Scale contract (100 TB): the sink roundtrip is embarrassingly
parallel; SCD2 shuffles the event stream once on user_id (both
windows and the island aggregation share that partitioning); the
triangle count joins only the pair-graph-sized edge relation; the
centroid is a single map-side-combinable aggregation whose output is
|labels|·dim rows; the salted join exists precisely to split hot-key
reduce tasks; and the curriculum assigns a total order through
(stage, shard)-local windows plus a 64-row driver offset table — the
corpus is never globally sorted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.files import load_table
from ._registry import make_register, persist_bounded

QUERIES = {}
ORACLES = {}
_register = make_register(QUERIES, ORACLES)


# ---------------------------------------------------------------------------
# ORC sink roundtrip
# ---------------------------------------------------------------------------


def _orc_roundtrip_oracle() -> str:
    from .corpus import _ROUNDTRIP_ORACLE

    return _ROUNDTRIP_ORACLE


@_register("sink_orc_roundtrip", _orc_roundtrip_oracle())
def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write→read roundtrip under the same per-(lang, source)
    checksum gate as `sink_jsonl_roundtrip` / `sink_csv_roundtrip` —
    the second columnar format (Hive/Trino interchange) next to
    parquet, exercising Spark's built-in ORC reader/writer end to end.

    Unlike the text sinks there is no quoting/null-sentinel surface to
    pin: ORC is typed and nullable by construction, so the checksum
    gate is purely about the codec path. Schema is passed explicitly
    on read anyway — same discipline as the text sinks — because
    relying on file-embedded schemas silently widens/narrows types
    when a mixed-writer directory drifts. At 100 TB both sides are
    embarrassingly parallel (one file per partition out, split-per-
    stripe in); ORC stripe statistics give the same scan-pruning class
    parquet row groups do.
    """
    import pathlib

    from .corpus import _DOC_COLS, _DOC_SCHEMA, _roundtrip_checksums
    from ..sources.cache import cached_materialization

    docs = load_table(spark, sf_dir, "documents").select(*_DOC_COLS)

    def build(tmp: str) -> None:
        docs.write.mode("overwrite").orc(tmp)

    dest = cached_materialization(
        pathlib.Path(sf_dir) / "documents.parquet", "documents_orc", build
    )
    back = spark.read.schema(_DOC_SCHEMA).orc(dest)
    return _roundtrip_checksums(back)


# ---------------------------------------------------------------------------
# SCD type-2 interval construction (gaps and islands)
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type IS DISTINCT FROM
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
              THEN 1 ELSE 0 END AS chg
  FROM events
),
islands AS (
  SELECT user_id, ts, event_type,
         SUM(chg) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
),
intervals AS (
  SELECT user_id, island, event_type,
         MIN(ts) AS valid_from, COUNT(*) AS n_events
  FROM islands GROUP BY user_id, island, event_type
)
SELECT user_id, event_type, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id
                              ORDER BY island) AS valid_to,
       n_events,
       CASE WHEN LEAD(valid_from) OVER (PARTITION BY user_id
                                        ORDER BY island) IS NULL
            THEN 1 ELSE 0 END AS is_current
FROM intervals
"""


@_register("pipeline_scd2_intervals", _SCD2_ORACLE)
def pipeline_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history from an event stream:
    collapse each user's CONSECUTIVE runs of the same state
    (event_type as the tracked attribute) into
    ``[valid_from, valid_to)`` intervals with an ``is_current`` flag —
    the warehouse-history construction every dimension pipeline runs,
    and the classic gaps-and-islands idiom (change flag → running sum
    → island id → interval bounds) the registry's plain lag/lead
    windows don't exercise.

    Plan: ONE shuffle of the event stream on user_id; the change-flag
    lag window, the running-sum island window, the island aggregation,
    and the valid_to lead window all share that partitioning (island
    count ≤ event count, per-user sort bounded by per-user history).
    At 100 TB this is the same single-shuffle contract as
    `event_user_paths`; skew only from a pathological single user —
    same mitigation (pre-split by day) documented there.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.when(
            ~F.col("event_type").eqNullSafe(F.lag("event_type").over(w)), 1
        )
        .otherwise(0)
        .alias("chg"),
        F.sum(
            F.when(
                ~F.col("event_type").eqNullSafe(F.lag("event_type").over(w)),
                1,
            ).otherwise(0)
        )
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    intervals = flagged.groupBy("user_id", "island", "event_type").agg(
        F.min("ts").alias("valid_from"), F.count(F.lit(1)).alias("n_events")
    )
    lead_w = Window.partitionBy("user_id").orderBy("island")
    valid_to = F.lead("valid_from").over(lead_w)
    return intervals.select(
        "user_id",
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        "n_events",
        F.when(valid_to.isNull(), 1).otherwise(0).alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Triangle counts over the exact near-dup graph
# ---------------------------------------------------------------------------


def _triangles_oracle() -> str:
    from .llm import _SQL_JACCARD, _SQL_TOKENS, _SQL_WORD_SHINGLES

    return f"""
WITH s AS (
  SELECT doc_id, {_SQL_WORD_SHINGLES} AS sh
  FROM (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents)
  WHERE len(t) >= 3
),
pairs AS (
  SELECT a.doc_id AS da, b.doc_id AS db
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE {_SQL_JACCARD} >= 0.6
),
tri AS (
  SELECT e1.da AS a, e1.db AS b, e2.db AS c
  FROM pairs e1
  JOIN pairs e2 ON e1.db = e2.da
  WHERE EXISTS (SELECT 1 FROM pairs e3
                WHERE e3.da = e1.da AND e3.db = e2.db)
)
SELECT node, COUNT(*)::BIGINT AS n_triangles
FROM (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
GROUP BY node
"""


@_register("pipeline_graph_triangles", _triangles_oracle())
def pipeline_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document triangle counts over the EXACT near-dup graph
    (word-3-gram Jaccard ≥ 0.6 — the same edge set as
    `pipeline_graph_pagerank`): documents inside triangles sit in
    dense template CLUSTERS (everything similar to everything), while
    triangle-free near-dup members chain through pairwise drift — the
    clique-density audit that decides cluster-level vs pair-level
    dedup treatment. Third graph primitive next to connected
    components (`pipeline_corpus_dedup`) and PageRank.

    Plan: edge generation is the bucketed prefix-filter join (no
    cartesian — `dedup_ngram_jaccard`'s machinery); the shingle
    relation is persisted across the candidate/verify branches, and
    the closure joins touch only the pair-graph-sized canonical edge
    relation (see `operators.graph.triangle_counts` for the wedge
    ordering and hub-skew notes).
    """
    from ..operators.graph import triangle_counts
    from ..operators.text import (
        jaccard_verify_elements,
        prefix_filter_candidate_pairs,
        shingle_elements,
    )

    d = load_table(spark, sf_dir, "documents")
    ex = persist_bounded(shingle_elements(d, "doc_id", "text", n=3))
    cands = prefix_filter_candidate_pairs(ex, "doc_id", threshold=0.6)
    pairs = jaccard_verify_elements(cands, ex, "doc_id", threshold=0.6)
    edges = pairs.select(
        F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst")
    )
    return triangle_counts(edges).select(
        F.col("node").alias("node"), "n_triangles"
    )


# ---------------------------------------------------------------------------
# Element-wise mean embedding per label
# ---------------------------------------------------------------------------

_CENTROID_ORACLE = """
SELECT label, dim,
       ROUND(SUM(CAST(val AS DECIMAL(18,9)))::DOUBLE / COUNT(*), 6)
         AS centroid_val
FROM (
  SELECT label, unnest(embedding) AS val,
         unnest(range(0, len(embedding))) AS dim
  FROM embeddings
)
GROUP BY label, dim
"""


@_register("embedding_centroid_per_label", _CENTROID_ORACLE)
def embedding_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise mean embedding per label — the vector-aggregation
    primitive behind IVF centroid seeding (`sim_topk_ivf` collects
    exactly these), embedding-drift monitors (today's centroid vs
    yesterday's), and class prototypes for nearest-centroid
    classification. Output is long form (label, dim, centroid_val);
    pivoting back to an array is a cheap |labels|-row reshape.

    Plan: posexplode to (label, dim, val) rows, then ONE
    map-side-combinable aggregation — partials collapse to
    |labels|·dim rows per task before the (label, dim)-keyed exchange,
    so the shuffle carries kilobytes regardless of corpus size. The
    mean is computed as an ORDER-INDEPENDENT decimal(18,9) sum (exact
    integer arithmetic — float32 values carry ~7 significant digits,
    so scale 9 loses nothing) divided by the count in doubles: both
    engines produce bit-identical results under any partitioning,
    unlike a naive double sum (see the `_registry.dsum` contract).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("dim", "val")
    )
    return exploded.groupBy("label", "dim").agg(
        F.round(
            F.sum(F.col("val").cast("decimal(18,9)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("centroid_val")
    )


# ---------------------------------------------------------------------------
# Salted skew join
# ---------------------------------------------------------------------------

_SALTED_JOIN_ORACLE = """
WITH dim AS (
  SELECT event_type, MIN(ts) AS first_seen FROM events GROUP BY event_type
)
SELECT e.event_type,
       COUNT(*)::BIGINT AS n_events,
       SUM(CASE WHEN e.ts < dim.first_seen + INTERVAL 7 DAY
                THEN 1 ELSE 0 END)::BIGINT AS n_first_week
FROM events e JOIN dim USING (event_type)
GROUP BY e.event_type
"""


@_register("join_salted_skew", _SALTED_JOIN_ORACLE)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key fact⋈dim through the SALTED-JOIN technique, verified
    against the plain-join oracle: events join a per-type dimension on
    event_type — a 5-value key, i.e. each key holds ~20% of the fact
    table, the exact shape that funnels into 5 reduce tasks on a
    1000-executor cluster no matter how large the cluster is.
    `operators.skew.salted_join` spreads each key across 8 salt
    buckets by salting the fact side and replicating the dim side —
    the companion to `agg_salted_skew` on the join axis.

    At fixture scale AQE may still elect a broadcast for the tiny
    replicated dim (equally correct; zero fact shuffle); the salted
    key's effect on the SHUFFLE layout is locked by a plan-shape test
    with broadcast disabled, mirroring `join_bucketed_colocated`'s
    approach. Honest caveat: a 5-row dim should simply be broadcast —
    this query exists to put the both-sides-too-big-for-broadcast
    technique under the oracle gate.
    """
    from ..operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("event_type").agg(F.min("ts").alias("first_seen"))
    joined = salted_join(ev, dim, ["event_type"], salt_buckets=8)
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(
                F.col("ts") < F.col("first_seen") + F.expr("INTERVAL 7 DAYS"),
                1,
            ).otherwise(0)
        ).alias("n_first_week"),
    )


# ---------------------------------------------------------------------------
# Curriculum ordering without a global sort
# ---------------------------------------------------------------------------

_CURRICULUM_ORACLE = """
WITH keyed AS (
  SELECT doc_id,
         LEAST((n_chars // 150)::BIGINT, 3) AS stage,
         substr(md5(doc_id::VARCHAR), 1, 1) AS shard,
         md5(doc_id::VARCHAR) AS k
  FROM documents
)
SELECT doc_id, stage,
       ROW_NUMBER() OVER (ORDER BY stage, shard, k, doc_id) - 1
         AS curriculum_pos
FROM keyed
"""


@_register("pipeline_curriculum_order", _CURRICULUM_ORACLE)
def pipeline_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic curriculum position for every document — easy
    (short) documents first in 4 length stages, hash-shuffled within
    each stage — assigned WITHOUT a global sort: the total-order
    primitive curriculum-learning samplers and reproducible
    shard-writers need at corpus scale.

    Plan: each doc gets (stage, shard=first md5 hex char, key=md5);
    a 64-row (stage, shard) count relation is collected driver-side
    (index-build-style, like PageRank's |V|) and turned into
    cumulative base offsets that are broadcast-joined back; the final
    position is base + (row_number within the (stage, shard) window).
    The window partitions the corpus into 4×16 independent sorted
    groups — at 100 TB that is 64-way parallel local sorts of ~1/64 of
    the corpus each, vs a single-partition ROW_NUMBER() OVER (ORDER BY
    ...) which serializes the entire corpus through one task (the
    oracle runs exactly that shape; DuckDB can afford it at sf0.01).
    Determinism: md5 of doc_id is engine-portable (the
    `pipeline_train_val_split` idiom), so positions are reproducible
    across engines, runs, and partitionings.
    """
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        # FLOOR division explicitly on BOTH sides: DuckDB's ::BIGINT
        # cast ROUNDS while Spark's truncates, so a plain cast of the
        # quotient silently shifts stage boundaries between engines.
        F.least(F.floor(F.col("n_chars") / 150).cast("bigint"), F.lit(3)).alias(
            "stage"
        ),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias(
            "shard"
        ),
        F.md5(F.col("doc_id").cast("string")).alias("k"),
    )
    # 64-row offset table: collect is index-build-scale (bounded by
    # stages × 16 shards, never by corpus size).
    counts = sorted(
        (r["stage"], r["shard"], r["n"])
        for r in keyed.groupBy("stage", "shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    bases, running = [], 0
    for stage, shard, n in counts:
        bases.append((stage, shard, running))
        running += n
    base_df = keyed.sparkSession.createDataFrame(
        bases, "stage bigint, shard string, base bigint"
    )
    w = Window.partitionBy("stage", "shard").orderBy("k", "doc_id")
    return (
        keyed.join(F.broadcast(base_df), ["stage", "shard"])
        .select(
            "doc_id",
            "stage",
            (F.col("base") + F.row_number().over(w) - 1).alias(
                "curriculum_pos"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Inter-arrival time statistics
# ---------------------------------------------------------------------------

_INTERARRIVAL_ORACLE = """
WITH gaps AS (
  SELECT event_type,
         date_diff('microsecond',
                   LAG(ts) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id),
                   ts) AS gap_us
  FROM events
)
SELECT event_type,
       COUNT(gap_us)::BIGINT AS n_gaps,
       ROUND(SUM(gap_us)::DOUBLE / (COUNT(gap_us) * 1000000.0), 6)
         AS avg_gap_sec,
       ROUND(quantile_cont(gap_us / 1000000.0, 0.5), 6) AS p50_gap_sec,
       ROUND(quantile_cont(gap_us / 1000000.0, 0.95), 6) AS p95_gap_sec
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY event_type
"""


@_register("event_interarrival_stats", _INTERARRIVAL_ORACLE)
def event_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap distribution per event type — the cadence
    profile behind rate-limit tuning, bot detection (sub-second
    machine cadence vs human cadence), and session-gap calibration
    (the 8-hour gap `event_session_window` hard-codes should come FROM
    this query's p95).

    Plan: the lag window partitions by (user_id, event_type) — per-user
    sequences, so partition skew is bounded by a single user's history,
    never by a hot event type (a window partitioned by event_type alone
    would funnel ~20% of a 100 TB stream through one task). The gap
    relation then feeds one partial-agg-friendly aggregation over the
    5-value type domain; exact percentiles over a 5-group domain are
    fine at any scale because percentile is evaluated per GROUP
    (`agg_approx_percentiles` is the sketch twin when the group count
    itself explodes). Spark's `percentile` and DuckDB's
    `quantile_cont` share the (n-1)·p interpolation contract
    (`agg_percentiles` pins this).

    Float determinism: gaps are computed as INTEGER microseconds in
    both engines (`unix_micros` diff vs `date_diff('microsecond')`);
    the average is an exact integer SUM (order-independent) divided
    once, and the percentile inputs are the identical single division
    `gap_us / 1e6` — no order-dependent double accumulation anywhere,
    so ROUND(·, 6) is hash-stable (unlike the residual-risk queries
    noted on `event_anomaly_zscore`).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    # unix_micros needs TIMESTAMP (not _NTZ, which the loader may
    # surface depending on the parquet encoding); the cast is
    # offset-safe because gaps are DIFFERENCES — any session-timezone
    # shift cancels (and apply_runtime_conf pins UTC regardless).
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.unix_micros(F.lag(F.col("ts")).over(w).cast("timestamp"))
    gaps = ev.select(
        "event_type", (ts_us - prev_us).alias("__gap_us")
    ).filter(F.col("__gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(
            F.sum("__gap_us").cast("double")
            / (F.count(F.lit(1)) * F.lit(1000000.0)),
            6,
        ).alias("avg_gap_sec"),
        F.round(F.expr("percentile(__gap_us / 1000000.0, 0.5)"), 6).alias(
            "p50_gap_sec"
        ),
        F.round(F.expr("percentile(__gap_us / 1000000.0, 0.95)"), 6).alias(
            "p95_gap_sec"
        ),
    )


# ---------------------------------------------------------------------------
# Sliding-window distinct users: exact + mergeable-sketch twin
# ---------------------------------------------------------------------------

_SLIDING_DISTINCT_ORACLE = """
WITH days AS (
  SELECT DISTINCT date_trunc('day', ts) AS day FROM events
)
SELECT d.day AS window_start,
       COUNT(DISTINCT e.user_id)::BIGINT AS n_users
FROM days d
JOIN events e
  ON e.ts >= d.day AND e.ts < d.day + INTERVAL 7 DAY
GROUP BY d.day
"""


@_register("event_distinct_sliding", _SLIDING_DISTINCT_ORACLE)
def event_distinct_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 7-day rolling distinct users per day — the trailing-MAU
    gold standard, and the exact twin anchoring
    `event_distinct_sliding_hll`. Distinct is NOT algebraic: a rolling
    window cannot reuse daily distinct counts (users active on several
    days would double-count), so the exact form first reduces the
    stream to distinct (day, user) pairs — ONE corpus-sized shuffle,
    typically orders of magnitude smaller output — then explodes each
    pair into the ≤ 7 windows it serves (bounded fan-out over the
    reduced relation, the `event_sliding_window` idiom) and
    count-distincts per window over that day×user-bounded relation.
    Window starts come from observed days (matching the oracle's days
    CTE), so empty windows don't appear.
    """
    ev = load_table(spark, sf_dir, "events")
    day_us = 24 * 3600 * 1000000
    pairs = (
        ev.select(
            F.date_trunc("day", F.col("ts")).alias("__day"), "user_id"
        ).distinct()
    )
    # each (day, user) pair serves the 7 windows starting day-6 .. day;
    # keep only window starts that are themselves observed days so the
    # output domain matches the oracle's days CTE
    days = pairs.select("__day").distinct()
    exploded = pairs.select(
        "user_id",
        F.explode(
            F.sequence(
                F.unix_micros(F.col("__day")) - F.lit(6 * day_us),
                F.unix_micros(F.col("__day")),
                F.lit(day_us),
            )
        ).alias("__start_us"),
    ).select("user_id", F.timestamp_micros(F.col("__start_us")).alias("window_start"))
    return (
        exploded.join(
            days.select(F.col("__day").alias("window_start")), "window_start", "left_semi"
        )
        .groupBy("window_start")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@_register("event_distinct_sliding_hll")
def event_distinct_sliding_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`event_distinct_sliding`'s mergeable-sketch twin: ONE HLL sketch
    per (day), merged across each 7-day window — the pre-aggregated
    form that scales when windows are long or many. The daily sketch
    relation is calendar-bounded (days × ~1.5 KB), so the rolling merge
    touches kilobytes per window regardless of corpus size; the exact
    twin re-shuffles (day, user) pairs into every window it serves.
    Rows-only by design (Spark's HLL binary has no DuckDB oracle, and
    estimates differ from exact counts); anchored by the exact twin
    above plus `tests/test_analytics_queries.py`'s relative-error
    property test — the same evidence pattern as
    `agg_hll_union_rollup`.
    """
    ev = load_table(spark, sf_dir, "events")
    day_us = 24 * 3600 * 1000000
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("__day")).agg(
        F.hll_sketch_agg("user_id").alias("__sk")
    )
    days = daily.select("__day")
    exploded = daily.select(
        "__sk",
        F.explode(
            F.sequence(
                F.unix_micros(F.col("__day")) - F.lit(6 * day_us),
                F.unix_micros(F.col("__day")),
                F.lit(day_us),
            )
        ).alias("__start_us"),
    ).select("__sk", F.timestamp_micros(F.col("__start_us")).alias("window_start"))
    return (
        exploded.join(
            days.select(F.col("__day").alias("window_start")),
            "window_start",
            "left_semi",
        )
        .groupBy("window_start")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias(
                "n_users_approx"
            )
        )
    )
