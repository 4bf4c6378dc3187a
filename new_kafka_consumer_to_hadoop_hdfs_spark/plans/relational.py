"""Relational operator surface over the star schema (SURVEY.md §2.5, M2).

The reference has no relational operators beyond its dedup reduce
(SURVEY.md §2.4) — this module is the north-star extension that makes
the rebuild an analytics engine. Every query is a declarative DataFrame
plan (Catalyst does pushdown/pruning/join selection) with a DuckDB
oracle string whose column names and value representations match
exactly.

Float determinism contract (critical for the driver's value hash):
money aggregates are computed over values cast to DECIMAL first —
sums become exact and engine-order-independent — then the final result
is cast back to DOUBLE, which is a deterministic conversion. Plain
SUM(double) would differ between Spark (parallel partial aggregation)
and DuckDB (sequential) in the low bits and break the hash.

Scale notes per query are inline; common choices:
- dimension joins broadcast (region/nation/supplier/part stay tiny
  relative to facts at every SF);
- aggregations rely on partial (map-side) aggregation — no distinct
  unless semantically required;
- top-k = window rank + filter (per group) or orderBy+limit (global,
  with a deterministic tie-break so results are stable under retries);
- AQE handles skew/coalescing (enabled in session config).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.files import load_table
from ._registry import dsum as _dsum
from ._registry import make_register

QUERIES = {}
ORACLES = {}
_register = make_register(QUERIES, ORACLES)


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@_register("q1_pricing_summary", _Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate, the canonical fact-table agg.

    Plan: parquet scan with l_shipdate pushed filter + 7-column pruned
    read → partial hash agg → single shuffle on 2 low-cardinality keys
    → final agg. At 100 TB this is scan-bound; no other shape exists.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price, 4).alias("sum_disc_price"),
            _dsum(charge, 6).alias("sum_charge"),
            (_dsum(F.col("l_quantity")) / F.count("*")).alias("avg_qty"),
            (_dsum(F.col("l_extendedprice")) / F.count("*")).alias("avg_price"),
            (_dsum(F.col("l_discount")) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_Q6_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


@_register("q6_forecast_revenue", _Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective scan → global agg (no group keys).

    All three predicates push to the parquet scan; the aggregate is a
    single partial+final reduction — the cheapest possible plan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


_COUNT_DISTINCT_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


@_register("agg_count_distinct", _COUNT_DISTINCT_ORACLE)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column distinct aggregation (expand + two-phase agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


@_register("agg_approx_count_distinct")  # no oracle: approximate by design
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct — the 100 TB substitute for exact
    distinct (no expand, mergeable sketches, bounded memory)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.count("*").alias("n_rows"),
    )


_ROLLUP_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@_register("agg_rollup", _ROLLUP_ORACLE)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status → status+priority → grand total)
    as a TWO-LEVEL aggregate: pre-aggregate per (status, priority),
    rollup the ~|status|×|priority|-row result — Expand multiplies a
    handful of rows, not the scan (`agg_cube`'s treatment; count and
    decimal-sum re-aggregate exactly, so output and oracle are
    unchanged)."""
    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("__n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("__t"),
    )
    return base.rollup("o_orderstatus", "o_orderpriority").agg(
        # Empty-source edge (ADVICE r10, investigated r11): Spark's
        # rollup emits NO rows over an empty input — including the ()
        # grouping set — in the SINGLE-level form too, so this
        # two-level form is exactly equivalent on every input
        # (pinned by test_two_level_rollup_cube_empty_source). DuckDB
        # emits one (NULL, NULL, 0, NULL) grand-total row there; that
        # is a pre-existing engine-semantics difference, out of
        # contract (the testdata tables are never empty), NOT a
        # two-level artifact. SUM(__n) is never NULL on any emitted
        # row (each grouping-set row covers ≥1 pre-agg row).
        F.sum("__n").alias("n_orders"),
        F.sum("__t").cast("double").alias("total"),
    )


_CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@_register("agg_cube", _CUBE_ORACLE)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping combinations) — as a
    TWO-LEVEL aggregate: count and decimal-sum are algebraic, so the
    cube runs over the pre-aggregated (flag, status) relation (at most
    |flags|×|statuses| rows) instead of letting Expand multiply the
    full scan 4× before the shuffle (the naive `.cube` plan — measured
    decade slope +0.67 at sf0.1, the round-10 probe's only >+0.6 row).
    One corpus-sized map-side-combined shuffle remains (the base
    group-by); the Expand then touches a handful of rows. At 100 TB
    the difference is shuffling 4× the table vs shuffling its distinct
    group keys. Decimal sums re-aggregate exactly (order-independent),
    so the output is bit-identical to the single-level cube — same
    oracle, unchanged contract.
    """
    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("__n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("__q"),
    )
    return base.cube("l_returnflag", "l_linestatus").agg(
        # empty-source edge: identical to single-level Spark cube (0
        # rows) — see agg_rollup's note; SUM(__n) never NULL otherwise
        F.sum("__n").alias("n_items"),
        F.sum("__q").cast("double").alias("sum_qty"),
    )


_PERCENTILES_ORACLE = """
SELECT event_type, COUNT(*) AS n,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.9), 6) AS p90,
       ROUND(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
"""


@_register("agg_percentiles", _PERCENTILES_ORACLE)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ≡
    DuckDB `quantile_cont`: (n-1)·p rank with linear interpolation).

    Exact percentiles sort each group's values — fine per group here
    (groups are value-sized); at 100 TB switch to
    `approx_percentile` (t-digest sketch, mergeable map-side) when the
    per-group data no longer fits a task, the same trade documented on
    agg_approx_count_distinct.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


_ARGMAX_ORACLE = """
SELECT o_orderpriority,
       arg_max(o_orderkey,
               CAST(o_totalprice * 100 AS BIGINT) * 10000000000 - o_orderkey)
         AS biggest_order,
       MAX(o_totalprice) AS max_price,
       arg_min(o_orderkey,
               CAST(o_totalprice * 100 AS BIGINT) * 10000000000 + o_orderkey)
         AS smallest_order,
       MIN(o_totalprice) AS min_price
FROM orders
GROUP BY o_orderpriority
"""


@_register("agg_argmax", _ARGMAX_ORACLE)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARGMAX/ARGMIN aggregates (`max_by`/`min_by` ≡ DuckDB
    `arg_max`/`arg_min`): which order carries each priority class's
    extreme price — the single-pass alternative to the window-rank
    idiom when only the extremum's companion value is wanted (one
    partial-aggregating shuffle; no sort, no rank, no self-join).

    Tied extreme prices DO occur in the fixtures (61 duplicated prices
    within a priority group at sf0.1), and bare max_by/arg_max break
    ties arbitrarily — so the ordering key packs (price, orderkey)
    into ONE exact BIGINT (DuckDB's arg_max accepts only scalar keys):
    cents·10¹⁰ ∓ orderkey, tie-broken toward the SMALLEST orderkey on
    both sides. All values stay exact int64 (max cents ~6·10⁷, so the
    product tops out ~6·10¹⁷ ≪ 2⁶³; orderkey < 10¹⁰ holds through
    sf ~1000 and the fixture gate's SFs by orders of magnitude).
    """
    o = load_table(spark, sf_dir, "orders")
    packed = (
        (F.col("o_totalprice") * 100).cast("bigint") * F.lit(10_000_000_000)
    )
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", packed - F.col("o_orderkey")).alias(
            "biggest_order"
        ),
        F.max("o_totalprice").alias("max_price"),
        F.min_by("o_orderkey", packed + F.col("o_orderkey")).alias(
            "smallest_order"
        ),
        F.min("o_totalprice").alias("min_price"),
    )


@_register("agg_approx_percentiles")  # no oracle: t-digest-style sketch,
# engine-specific estimates; anchored by the exact twin agg_percentiles
# and the in-query error assertion in tests/test_properties.py
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`agg_percentiles`' sketch twin: `approx_percentile` with
    accuracy 10000 — the 100 TB form the exact query's docstring
    promises. Exact percentiles sort every group's values in one task;
    the sketch is MERGEABLE: each partition builds a bounded summary,
    partials combine associatively map-side, and no single task ever
    holds a group's full value set. Same shape as
    `agg_approx_count_distinct`'s HLL trade, applied to quantiles.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.expr("approx_percentile(value, 0.5, 10000)"), 6).alias("p50"),
        F.round(F.expr("approx_percentile(value, 0.9, 10000)"), 6).alias("p90"),
        F.round(F.expr("approx_percentile(value, 0.99, 10000)"), 6).alias("p99"),
    )


@_register("agg_hll_union_rollup")  # no oracle: Datasketches HLL binary
# sketches are Spark-specific; anchored by exactness assertion in
# tests/test_properties.py (20 distinct sources ≪ HLL error regime)
def agg_hll_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-language HLL sketches of distinct
    `source`, UNIONED into a corpus-wide estimate WITHOUT rescanning —
    `hll_union_agg` over the per-group sketches, the property plain
    `approx_count_distinct` doesn't expose.

    This is the 100 TB pattern for layered distinct-count reporting
    (per-partition sketches materialized once; any ad-hoc grouping of
    them answered by merging kilobyte summaries): count-distinct is
    not algebraic, but sketches make it behave like one.
    """
    d = load_table(spark, sf_dir, "documents")
    per_lang = d.groupBy("lang").agg(
        F.expr("hll_sketch_agg(source)").alias("__sk"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    lang_rows = per_lang.select(
        "lang", "n_docs",
        F.expr("hll_sketch_estimate(__sk)").alias("approx_sources"),
    )
    total_row = per_lang.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(__sk))").alias("approx_sources"),
        F.sum("n_docs").alias("n_docs"),
    ).select(F.lit("__all__").alias("lang"), "n_docs", "approx_sources")
    return lang_rows.unionByName(total_row)


_GROUPING_SETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
"""


@_register("agg_grouping_sets", _GROUPING_SETS_ORACLE)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (disjoint dimension summaries in one
    pass), TWO-LEVEL like `agg_cube`/`agg_rollup`: the sets expand
    over the pre-aggregated (status, priority) relation, so Expand's
    2× multiplication hits ~15 rows instead of the scan. SUM of the
    partial counts ≡ COUNT(*) — output and oracle unchanged."""
    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("__n")
    )
    base.createOrReplaceTempView("__orders_gs_pre")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, SUM(__n) AS n_orders
        FROM __orders_gs_pre
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@_register("q3_shipping_priority", _Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact joins → top-k.

    customer-after-filter is small at test SFs but grows linearly with
    scale (150k rows/SF), so no forced broadcast hint — AQE broadcasts
    while it fits and falls back to a shuffle join beyond that.
    orders⋈lineitem shuffles on orderkey (the natural co-location key).
    Global top-10 by (revenue desc, orderkey) is a TakeOrdered — no
    full sort materialization.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


_Q5_ORACLE = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


@_register("q5_local_supplier_volume", _Q5_ORACLE)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join with local-supplier correlation.

    nation/region broadcast unconditionally (25/5 rows at every SF).
    supplier grows linearly with SF (10k rows/SF — multi-GB at ~100 TB),
    so its join strategy is left to Catalyst/AQE: broadcast while it
    fits under autoBroadcastJoinThreshold, shuffle-hash/sort-merge once
    it doesn't. The only guaranteed big shuffles are orders⋈customer
    (custkey) and lineitem⋈orders (orderkey). The
    c_nationkey = s_nationkey correlation rides the supplier join as a
    post-condition.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue")
        )
    )


_BROADCAST_DIM_ORACLE = """
SELECT r_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


@_register("join_broadcast_dims", _BROADCAST_DIM_ORACLE)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake dim chain: fact ⋈ broadcast(nation) ⋈ broadcast(region).

    Zero shuffles until the final 5-group aggregate — the plan shape to
    demand for any dim join at scale.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            _dsum(F.col("c_acctbal")).alias("total_acctbal"),
        )
    )


_SEMI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
"""


@_register("join_semi", _SEMI_ORACLE)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join = EXISTS; no row multiplication, build side pruned
    to the join key."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


_ANTI_ORACLE = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 350000)
"""


@_register("join_anti", _ANTI_ORACLE)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join = NOT EXISTS (customers with no HIGH-VALUE order).

    The filter on the probe side matters for the gate, not just the
    semantics: the fixture gives every customer at least one order, so
    an unfiltered NOT EXISTS returns ZERO rows at every SF — a 0=0
    oracle hash that would prove nothing (the vacuous-gate rule that
    caught `join_bloom_prefilter` in round 7's ADVICE). With the
    o_totalprice > 350000 restriction the result is non-empty at every
    fixture SF (8 / 68 / 762 rows at sf 0.001/0.01/0.1), so the hash
    actually pins the anti-join semantics. `tools/verify_all.py`
    now flags any oracle-gated query that comes back empty.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


_LEFT_JOIN_ORACLE = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


@_register("join_left_outer", _LEFT_JOIN_ORACLE)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers with zero orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), F.lit(0))
            .cast("double")
            .alias("total_spent"),
        )
    )


_RIGHT_JOIN_ORACLE = """
SELECT n_name, COUNT(c_custkey) AS n_customers
FROM customer RIGHT OUTER JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


@_register("join_right_outer", _RIGHT_JOIN_ORACLE)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join preserving nations with zero customers (all 25
    nations appear; COUNT over a nullable key counts only matches).
    Catalyst plans right-outer as the mirrored left-outer, broadcasting
    the 25-row preserved side — completes the inner/left/right/full
    equi-join surface row."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
    )


_FULL_JOIN_ORACLE = """
WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1)
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       COALESCE(n_customers, 0) AS n_customers,
       COALESCE(n_suppliers, 0) AS n_suppliers
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
"""


@_register("join_full_outer", _FULL_JOIN_ORACLE)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two pre-aggregated sides."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return (
        c.join(s, "nationkey", "full_outer")
        .select(
            F.col("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


_Q17_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
    SELECT 0.2 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


@_register("q17_small_quantity_revenue", _Q17_ORACLE)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average)
    decorrelated into an aggregate + join — the plan Catalyst produces
    for correlated scalars anyway, written explicitly so the
    aggregation reuses the lineitem scan.

    Per-part averages shuffle once on partkey (map-side partial avg);
    the filtered fact join shares that key. At scale both sides of the
    self-join co-locate on l_partkey — no extra exchange under AQE.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cap")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            (_dsum(F.col("l_extendedprice")) / 7.0).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey AS ok, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice, total_qty
FROM big
JOIN orders   ON o_orderkey = ok
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@_register("q18_large_volume_customer", _Q18_ORACLE)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on a fact aggregation, then dim joins
    and global top-k.

    The heavy aggregation runs FIRST (one shuffle on orderkey,
    map-side combine), and only qualifying orders — a tiny fraction —
    reach the joins, which AQE then broadcasts. Aggregate-then-join
    ordering is the difference between shuffling the fact table once
    and shuffling it per join at scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(_dsum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(o, F.col("ok") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


@_register("q4_order_priority", _Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: date-filtered orders, EXISTS against a
    lineitem predicate (returned items — the fixture schema carries no
    commit/receipt dates), count by priority. The EXISTS is a LEFT
    SEMI join — no row multiplication, and the lineitem side prunes to
    orderkey + returnflag at the scan.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    late = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                JOIN orders   ON o_orderkey = l_orderkey
                JOIN customer ON c_custkey = o_custkey
                JOIN nation n1 ON s_nationkey = n1.n_nationkey
                JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_3'))
    AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@_register("q7_volume_shipping", _Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral nation-pair trade volume — two
    broadcast joins against the SAME tiny dim under different aliases,
    with a disjunctive cross-side predicate evaluated after both.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1995-01-01").cast("timestamp"),
            F.lit("1996-12-31").cast("timestamp"),
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    # the NATION_3/NATION_2 pair is non-empty at EVERY fixture SF
    # (5+4 rows even at sf0.001); the original NATION_1/NATION_2 pair
    # returned zero rows at sf0.001, where the cross-SF sweep's
    # vacuity check flagged it (the driver-SF 0.01 evidence was always
    # real — this widens the non-vacuous range to all three SFs)
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_dsum(F.col("volume"), 4).alias("revenue"))
    )


_Q10_ORACLE = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
FROM customer JOIN orders   ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@_register("q10_returned_items", _Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20.
    Both fact filters push to the scans; the group-by runs BEFORE the
    TakeOrdered so only |customers-with-returns| rows rank."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


_Q12_ORACLE = """
SELECT l_linestatus,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= o_orderdate + INTERVAL '60 days'
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
"""


@_register("q12_shiplag_priority", _Q12_ORACLE)
def q12_shiplag_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (recast for the fixture schema, which carries no
    shipmode/commit/receipt columns): slow shipments — ship date ≥ 60
    days after order date, a CROSS-TABLE comparison that can only run
    post-join — split into high/low priority counts per line status.
    The single-table range predicates still push to the lineitem scan.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


_Q14_ORACLE = """
SELECT CAST(100.00 * SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
       AS promo_revenue_pct,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
"""


@_register("q14_promo_effect", _Q14_ORACLE)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — conditional aggregate
    ratio over a month of shipments joined to part."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            (F.lit(100.0) * _dsum(promo, 4) / _dsum(rev, 4)).alias(
                "promo_revenue_pct"
            ),
            F.count("*").alias("n_items"),
        )
    )


_Q19_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
"""


@_register("q19_disjunctive_predicates", _Q19_ORACLE)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: a 3-way disjunction mixing columns from BOTH
    join sides — the optimizer stress case. Catalyst extracts the
    common per-side filters implied by the OR (brand ∈ {...},
    quantity ≤ 30, size ≤ 15) and pushes them below the join while the
    full disjunction evaluates after it.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 15)
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


_Q22_ORACLE = """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS a FROM customer
  WHERE c_acctbal > 0.00 AND c_nationkey IN (13, 3, 23, 9, 20, 18, 17)
)
SELECT c_nationkey AS cntrycode,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, avg_bal
WHERE c_nationkey IN (13, 3, 23, 9, 20, 18, 17)
  AND c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
GROUP BY cntrycode
"""


@_register("q22_global_sales_opportunity", _Q22_ORACLE)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar aggregate subquery (global average
    balance, computed once and cross-joined — one row broadcast) +
    anti join against orders (customers with no LARGE order — every
    fixture customer has some order, so the plain NOT EXISTS would be
    empty), grouped by country (c_nationkey stands in for the phone
    country code the fixture schema lacks)."""
    c = load_table(spark, sf_dir, "customer")
    codes = (13, 3, 23, 9, 20, 18, 17)
    in_codes = F.col("c_nationkey").isin(*codes)
    # decimal-accumulated average: the threshold feeds a FILTER, so it
    # must be bit-identical across engines/partitionings (the module's
    # float-determinism contract applies doubly to comparison inputs)
    avg_bal = (
        c.filter((F.col("c_acctbal") > 0.0) & in_codes)
        .agg((_dsum(F.col("c_acctbal")) / F.count("*")).alias("a"))
    )
    o = load_table(spark, sf_dir, "orders")
    return (
        c.filter(in_codes)
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(
            o.filter(F.col("o_totalprice") > 400000),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            _dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


_RANGE_JOIN_ORACLE = """
SELECT a.event_id,
       a.user_id,
       COUNT(b.event_id) AS n_prior_events_1h,
       CAST(COALESCE(SUM(CAST(b.value AS DECIMAL(18,6))), 0) AS DOUBLE) AS prior_value_1h
FROM events a
LEFT JOIN events b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts - INTERVAL '1 hour'
 AND b.ts < a.ts
GROUP BY a.event_id, a.user_id
"""


@_register("join_range_events", _RANGE_JOIN_ORACLE)
def join_range_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) self-join: for each event, aggregate the same
    user's events in the preceding hour — the sessionization/feature
    -engineering join shape.

    Plan (r14): ONE shuffle — a RANGE-frame window over
    (user_id, µs timestamp), frame [-1 h, -1 µs]. The timestamp column
    is microsecond-resolution in BOTH engines (parquet ns truncated to
    µs on load), so "strictly before me, within the preceding hour" is
    exactly the µs range [ts−3 600 000 000, ts−1]: the same rows the
    pre-r14 formulation matched with an equi-join on user_id plus a
    time residual and then re-grouped per event. That join shuffled
    the event relation twice (join exchange + per-event re-aggregation
    exchange) and MATERIALIZED every in-window pair as a join row —
    Σ per-user pairs of exchange traffic; the window form sorts each
    user partition once and slides the frame, so nothing pair-shaped
    ever crosses the network. Decimal-exact sums make the two forms
    hash-identical. At 100 TB, AQE skew handling doesn't cover window
    partitions, so a hot user costs one task either way — but the join
    form paid that same skew in BOTH of its exchanges plus the pair
    blow-up; a bucketed-by-user layout makes the remaining single
    exchange free.
    """
    ev = load_table(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ: unix_micros() rejects it and an NTZ→TZ cast
    # would be session-timezone (and DST-fold) dependent; timestampdiff
    # against an NTZ epoch is the tz-independent µs ordering key.
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, -1)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_prior_events_1h"),
        F.coalesce(
            F.sum(F.col("value").cast("decimal(18,6)")).over(w), F.lit(0)
        )
        .cast("double")
        .alias("prior_value_1h"),
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

_TOPK_GROUP_ORACLE = """
SELECT c_mktsegment, o_orderkey, o_totalprice, rnk FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rnk <= 3
"""


@_register("window_topk_per_group", _TOPK_GROUP_ORACLE)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: the scalable 'greatest n per group' idiom.

    One shuffle on the group key; AQE handles group skew. Deterministic
    tie-break on o_orderkey.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rnk")
    )


_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
       ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders
"""


@_register("window_running_sum", _RUNNING_ORACLE)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total with an explicit ROWS frame (order fully determined)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(frame)
        .cast("double")
        .alias("running_total"),
        F.row_number().over(w).alias("order_seq"),
    )


_RANGE_FRAME_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice,
       COUNT(*) OVER (
         PARTITION BY o_custkey ORDER BY o_totalprice
         RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING
       ) AS n_similar_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_totalprice
         RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS sum_upto_band
FROM orders
"""


@_register("window_range_frame", _RANGE_FRAME_ORACLE)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-based (RANGE) window frames — the frame-spec variant the
    ROWS queries don't cover: each row aggregates over the rows whose
    ORDER-BY VALUE lies within ±1000 of its own, independent of row
    position (peer rows with equal values share one frame, which is
    exactly where RANGE and ROWS semantics diverge). Same single
    shuffle on the partition key as any window; the frame bound just
    changes the in-partition scan."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.count(F.lit(1))
        .over(w.rangeBetween(-1000, 1000))
        .alias("n_similar_price"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w.rangeBetween(-1000, Window.currentRow))
        .cast("double")
        .alias("sum_upto_band"),
    )


_LAG_LEAD_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice,
       LAG(o_totalprice)  OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       RANK()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS price_rank,
       DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority)   AS prio_rank
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@_register("window_lag_lead_rank", _LAG_LEAD_ORACLE)
def window_lag_lead_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/rank/dense_rank over per-customer order history."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    wr = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.rank().over(wp).alias("price_rank"),
        F.dense_rank().over(wr).alias("prio_rank"),
    )


_ASOF_ORACLE = """
SELECT event_id, user_id, ts, event_type,
       MAX(CASE WHEN event_type = 'signup' THEN ts END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_ts
FROM events
"""


@_register("window_asof_last_event", _ASOF_ORACLE)
def window_asof_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of lookup expressed as a running conditional max — the
    shuffle-free way to do per-key as-of joins when both sides share a
    partition key (vs. pd.merge_asof, which would pull data to Python)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.max(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w).alias(
            "last_signup_ts"
        ),
    )


_PIVOT_ORACLE = """
SELECT o_orderpriority,
       SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS F,
       SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS O,
       SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS P,
       CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END AS DECIMAL(18,2))) AS DOUBLE) AS total_F
FROM orders
GROUP BY o_orderpriority
"""


@_register("agg_pivot", _PIVOT_ORACLE)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per priority spread across status columns
    (explicit value list → no extra distinct-discovery job, stable
    output schema — the form to use at scale), plus one pivoted money
    sum. Spark rewrites pivot into exactly the conditional aggregation
    the oracle spells out: one shuffle, no transpose materialization.
    """
    o = load_table(spark, sf_dir, "orders")
    counts = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    total_f = (
        o.groupBy("o_orderpriority")
        .agg(
            _dsum(
                F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(
                    0
                )
            ).alias("total_F")
        )
    )
    return counts.join(total_f, "o_orderpriority")


_UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT o_orderpriority,
         SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS F,
         SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS O,
         SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS P
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, 'F' AS status, F AS n FROM wide
UNION ALL SELECT o_orderpriority, 'O', O FROM wide
UNION ALL SELECT o_orderpriority, 'P', P FROM wide
"""


@_register("agg_unpivot", _UNPIVOT_ORACLE)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the wide per-status counts back to long form via
    ``DataFrame.unpivot`` — the inverse transform, a narrow per-row
    expansion (no shuffle beyond the feeding aggregation)."""
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    return wide.unpivot(
        ["o_orderpriority"], ["F", "O", "P"], "status", "n"
    )


_DATE_ADV_ORACLE = """
SELECT o_orderkey,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
       strftime(o_orderdate - INTERVAL 90 DAY, '%Y-%m-%d') AS minus90d,
       quarter(o_orderdate) AS qtr,
       isodow(o_orderdate) - 1 AS weekday_mon0,
       EXTRACT(doy FROM o_orderdate) AS day_of_year,
       datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_95
FROM orders
"""


@_register("scalar_date_advanced", _DATE_ADV_ORACLE)
def scalar_date_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second date battery: month-end, month/day arithmetic, quarter,
    Monday-based weekday (Spark ``weekday`` == DuckDB ``isodow - 1`` —
    conventions pinned by the oracle), day-of-year, day difference."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias("plus3m"),
        F.date_format(F.date_sub("o_orderdate", 90), "yyyy-MM-dd").alias("minus90d"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.weekday("o_orderdate").cast("long").alias("weekday_mon0"),
        F.dayofyear("o_orderdate").cast("long").alias("day_of_year"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).cast("long").alias("days_since_95"),
    )


_WINDOW_DIST_ORACLE = """
SELECT o_orderkey, o_custkey,
       NTILE(4) OVER w AS price_quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume,
       FIRST_VALUE(o_orderkey) OVER w AS cheapest_order,
       LAST_VALUE(o_orderkey)
         OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS priciest_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
"""


@_register("window_distribution_functions", _WINDOW_DIST_ORACLE)
def window_distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile / percent_rank / cume_dist /
    first_value / last_value-with-full-frame) over per-customer price
    order. One shuffle on the high-cardinality partition key; the
    last_value frame is explicitly unbounded-both-ways (the default
    frame would return the CURRENT row)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).alias("price_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_orderkey").over(w).alias("cheapest_order"),
        F.last("o_orderkey").over(wfull).alias("priciest_order"),
    )


_STRING_ADV_ORACLE = """
SELECT p_partkey,
       split_part(p_type, ' ', 1) AS type_first_word,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       reverse(p_brand) AS brand_rev,
       repeat('*', p_size % 5) AS stars,
       left(p_name, 8) AS name_head,
       right(p_name, 4) AS name_tail,
       strpos(p_name, 'a') AS first_a,
       levenshtein(p_brand, 'Brand#00') AS brand_dist
FROM part
"""


@_register("scalar_string_advanced", _STRING_ADV_ORACLE)
def scalar_string_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string battery: split_part / pad / reverse / repeat /
    left-right slicing / position / levenshtein — still all codegen'd
    JVM builtins with DuckDB-identical semantics."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first_word"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.lit("*"), (F.col("p_size") % 5).cast("int")).alias("stars"),
        F.substring("p_name", 1, 8).alias("name_head"),
        F.substring(F.col("p_name"), -4, 4).alias("name_tail"),
        F.instr(F.col("p_name"), "a").cast("long").alias("first_a"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#00")).cast("long").alias(
            "brand_dist"
        ),
    )


_NULL_SEMANTICS_ORACLE = """
WITH c AS (
  SELECT c_custkey,
         NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
         CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_or_null
  FROM customer
)
SELECT seg_or_null,
       COUNT(*) AS n_rows,
       COUNT(seg_or_null) AS n_nonnull_seg,
       COUNT(bal_or_null) AS n_nonnull_bal,
       SUM(CASE WHEN seg_or_null IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END)::BIGINT AS n_null_safe_eq_null,
       CAST(SUM(CAST(COALESCE(bal_or_null, 0) AS DECIMAL(18,2))) AS DOUBLE) AS bal_total
FROM c GROUP BY seg_or_null
"""


@_register("scalar_null_semantics", _NULL_SEMANTICS_ORACLE)
def scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling battery: NULLIF-manufactured nulls, COUNT(col) vs
    COUNT(*), null-safe equality (<=> / IS NOT DISTINCT FROM), COALESCE
    in aggregation — the semantics corner where engines differ most,
    pinned by the oracle."""
    c = load_table(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    bal = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal"))
    return (
        c.select(
            seg.alias("seg_or_null"),
            bal.alias("bal_or_null"),
        )
        .groupBy("seg_or_null")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("seg_or_null").alias("n_nonnull_seg"),
            F.count("bal_or_null").alias("n_nonnull_bal"),
            F.sum(
                F.when(F.col("seg_or_null").eqNullSafe(F.lit(None)), 1).otherwise(0)
            ).alias("n_null_safe_eq_null"),
            F.sum(F.coalesce(F.col("bal_or_null"), F.lit(0)).cast("decimal(18,2)"))
            .cast("double")
            .alias("bal_total"),
        )
    )


# ---------------------------------------------------------------------------
# Sort / limit / set ops
# ---------------------------------------------------------------------------

_TOPK_GLOBAL_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


@_register("sort_topk_global", _TOPK_GLOBAL_ORACLE)
def sort_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit plans as TakeOrderedAndProject —
    per-partition heaps, no global sort materialization."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


_SETOPS_ORACLE = """
WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'),
     y96 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
SELECT 'both_years' AS cohort, o_custkey FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
UNION ALL
SELECT 'only_1995' AS cohort, o_custkey FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
UNION ALL
SELECT 'any_year' AS cohort, o_custkey FROM (SELECT * FROM y95 UNION SELECT * FROM y96)
"""


@_register("set_operations", _SETOPS_ORACLE)
def set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT cohort analysis in one result."""
    o = load_table(spark, sf_dir, "orders")

    def year(y: int) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    y95, y96 = year(1995), year(1996)
    both = y95.intersect(y96).select(F.lit("both_years").alias("cohort"), "o_custkey")
    only95 = y95.subtract(y96).select(F.lit("only_1995").alias("cohort"), "o_custkey")
    any_year = (
        y95.union(y96).distinct().select(F.lit("any_year").alias("cohort"), "o_custkey")
    )
    return both.unionByName(only95).unionByName(any_year)


# ---------------------------------------------------------------------------
# Scalar functions
# ---------------------------------------------------------------------------

_STRING_ORACLE = """
SELECT p_partkey,
       LOWER(p_name) AS name_lower,
       UPPER(p_brand) AS brand_upper,
       SUBSTRING(p_type, 1, 5) AS type_prefix,
       LENGTH(p_name) AS name_len,
       REPLACE(p_name, ' ', '_') AS name_snake,
       CONCAT(p_brand, ':', p_type) AS brand_type,
       CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END AS is_green,
       REGEXP_EXTRACT(p_type, '([A-Z]+)$', 1) AS type_last_word,
       TRIM(p_name) AS name_trim
FROM part
"""


@_register("scalar_string_functions", _STRING_ORACLE)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery — all codegen'd JVM builtins, zero UDFs."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.when(F.col("p_name").like("%green%"), 1).otherwise(0).alias("is_green"),
        F.regexp_extract("p_type", r"([A-Z]+)$", 1).alias("type_last_word"),
        F.trim("p_name").alias("name_trim"),
    )


_DATE_ORACLE = """
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
       EXTRACT(year FROM o_orderdate) AS order_year,
       EXTRACT(month FROM o_orderdate) AS order_mm,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY 1, 2, 3
"""


@_register("scalar_date_functions", _DATE_ORACLE)
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc/extract grouping — the partition-pruning-friendly shape."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "order_month"
            ),
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_mm"),
            "o_totalprice",
        )
        .groupBy("order_month", "order_year", "order_mm")
        .agg(
            F.count("*").alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("revenue"),
        )
    )


_MATH_ORACLE = """
SELECT p_partkey,
       ABS(p_retailprice - 1000) AS abs_diff,
       FLOOR(p_retailprice) AS price_floor,
       CEIL(p_retailprice) AS price_ceil,
       ROUND(p_retailprice, 1) AS price_round1,
       SQRT(p_size) AS size_sqrt,
       p_size % 7 AS size_mod,
       CAST(SIGN(p_retailprice - 1500.0) AS DOUBLE) AS above_1500
FROM part
"""


@_register("scalar_math_functions", _MATH_ORACLE)
def scalar_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math builtins chosen for IEEE-exact cross-engine determinism
    (sqrt/abs/floor/ceil/round — no libm-divergent pow/log in hashed
    output)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000).alias("abs_diff"),
        F.floor("p_retailprice").cast("double").alias("price_floor"),
        F.ceil("p_retailprice").cast("double").alias("price_ceil"),
        F.round("p_retailprice", 1).alias("price_round1"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.signum(F.col("p_retailprice") - 1500.0).alias("above_1500"),
    )


_JSON_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(TRY_CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(TRY_CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       MAX(TRY_CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


@_register("scalar_json_functions", _JSON_ORACLE)
def scalar_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: get_json_object on the events.props JSON
    column, aggregated — stays entirely in codegen."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


_JSON_STRUCT_ORACLE = """
SELECT event_id,
       TRY_CAST(json_extract(props, '$.k') AS BIGINT) AS k_struct,
       TRY_CAST(json_extract(props, '$.k') AS BIGINT) AS k_map,
       len(json_keys(props)) AS n_keys,
       json_keys(props)[1] AS first_key
FROM events
"""


@_register("scalar_json_struct_map", _JSON_STRUCT_ORACLE)
def scalar_json_struct_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON access beyond string extraction: ``from_json`` into a
    STRUCT (schema-on-read with codegen'd field access — the fast path
    when the shape is known) and into a MAP (schema-free key/value
    introspection via map_keys/element_at). Both stay entirely JVM-side;
    at scale the struct parse happens once per row regardless of how
    many fields downstream expressions touch.
    """
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k BIGINT")
    as_map = F.from_json(F.col("props"), "map<string,bigint>")
    # size() guard: on NULL/unparseable props the map is NULL and the
    # oracle emits NULL — never let legacy size-of-null (-1) leak in.
    n_keys = F.when(as_map.isNull(), F.lit(None).cast("int")).otherwise(
        F.size(F.map_keys(as_map))
    )
    return ev.select(
        "event_id",
        parsed["k"].alias("k_struct"),
        F.element_at(as_map, "k").alias("k_map"),
        n_keys.alias("n_keys"),
        F.element_at(F.map_keys(as_map), 1).alias("first_key"),
    )


_CASE_NULL_ORACLE = """
SELECT
  CASE WHEN c_acctbal < 0 THEN 'negative'
       WHEN c_acctbal < 5000 THEN 'low'
       ELSE 'high' END AS balance_band,
  COUNT(*) AS n,
  COUNT(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 END) AS n_building,
  CAST(SUM(CAST(CASE WHEN c_acctbal > 0 THEN c_acctbal ELSE 0 END AS DECIMAL(18,2))) AS DOUBLE) AS positive_total
FROM customer
GROUP BY 1
"""


@_register("scalar_case_null_handling", _CASE_NULL_ORACLE)
def scalar_case_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/conditional aggregation + null-safe counting."""
    c = load_table(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
    )
    return (
        c.select(band.alias("balance_band"), "c_mktsegment", "c_acctbal")
        .groupBy("balance_band")
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("c_mktsegment") == "BUILDING", 1)).alias("n_building"),
            F.sum(
                F.when(F.col("c_acctbal") > 0, F.col("c_acctbal"))
                .otherwise(0)
                .cast("decimal(18,2)")
            )
            .cast("double")
            .alias("positive_total"),
        )
    )


_SALTED_SKEW_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
       CAST(MIN(value) AS DOUBLE) AS min_value,
       CAST(MAX(value) AS DOUBLE) AS max_value
FROM events
GROUP BY event_type
"""


@_register("agg_salted_skew", _SALTED_SKEW_ORACLE)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof aggregation as a first-class query: the same
    GROUP BY event_type any engine runs, executed through the salted
    two-phase decomposition (operators/skew.py) — phase 1 aggregates
    (key, salt) partials in parallel, phase 2 merges |keys|×buckets
    rows. `event_type` has single-digit cardinality: the exact shape
    where a hot key would otherwise pin one reducer at 100 TB. The
    oracle is the PLAIN SQL aggregate, proving the decomposition is
    value-identical (decimal partial sums keep it order-independent).
    """
    from ..operators.skew import salted_aggregate

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("decimal(18,6)").alias("__dec_value"), "value"
    )
    out = salted_aggregate(
        ev,
        ["event_type"],
        [
            # count a literal so NULL values still count — oracle is COUNT(*)
            ("count", F.lit(1), "n_events"),
            ("sum", "__dec_value", "total_value"),
            ("min", "value", "min_value"),
            ("max", "value", "max_value"),
        ],
        salt_buckets=16,
    )
    return out.select(
        "event_type",
        "n_events",
        F.col("total_value").cast("double").alias("total_value"),
        F.col("min_value").cast("double").alias("min_value"),
        F.col("max_value").cast("double").alias("max_value"),
    )


# One SQL text, two engines: this exact string runs through Spark SQL
# (run_sql → Catalyst) AND through DuckDB as its own oracle — the
# strongest statement the gate can make about the ad-hoc SQL surface.
_SQL_ADHOC_TEXT = """
SELECT r_name,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, o_year
"""


@_register("sql_adhoc_star_join", _SQL_ADHOC_TEXT)
def sql_adhoc_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ad-hoc SQL entry point (sql.run_sql) under the correctness
    gate: a 5-table star join + yearly revenue rollup written ONCE in
    dialect-portable ANSI SQL and executed verbatim by BOTH engines
    (the oracle IS the query text). Catalyst plans it like any
    DataFrame query — pushdown, AQE, broadcast dims — because the SQL
    and DataFrame APIs share the same logical plan layer.
    """
    from ..sql import run_sql

    return run_sql(spark, sf_dir, _SQL_ADHOC_TEXT)


# ---------------------------------------------------------------------------
# Per-group OLS regression from exact sufficient statistics
# ---------------------------------------------------------------------------

_REGRESSION_ORACLE = """
WITH b AS (
  SELECT o_orderpriority AS priority,
         (CAST(o_orderdate AS DATE) - DATE '1970-01-01')::BIGINT AS x,
         CAST(o_totalprice AS DECIMAL(18,2)) AS y
  FROM orders
),
s AS (
  SELECT priority,
         COUNT(*) AS n_orders,
         COUNT(*)::DOUBLE AS n,
         SUM(x)::DOUBLE AS sx,
         SUM(y)::DOUBLE AS sy,
         SUM(x * x)::DOUBLE AS sxx,
         SUM(x * y)::DOUBLE AS sxy,
         SUM(y * y)::DOUBLE AS syy
  FROM b GROUP BY priority
)
SELECT priority, n_orders,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n,
             6) AS intercept,
       ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM s
WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
"""


@_register("agg_regression_trend", _REGRESSION_ORACLE)
def agg_regression_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares trend (slope / intercept / R²
    of order value over order date, per priority class) — the grouped
    closed-form regression every monitoring pipeline runs ("is this
    segment's spend drifting?"), and the embarrassingly-parallel ML
    primitive: OLS needs only the five SUFFICIENT STATISTICS
    (Σx, Σy, Σx², Σxy, Σy²), so the whole fit is ONE map-side-
    combinable aggregation — no iteration, no solver, partials merge
    associatively, output is |groups| rows.

    Determinism contract (the float-oracle discipline): the sums are
    computed EXACTLY — x is integer epoch-days, y a DECIMAL(18,2) — so
    partial-agg merge order cannot perturb them; both engines then
    cast the identical exact sums to double and evaluate the SAME
    closed-form expression tree, making slope/intercept/R² equal to
    the last bit before the defensive ROUND(…, 6) (the one residual
    ulp risk is each engine's decimal→double cast on the large Σxy /
    Σy² values — same caveat `pipeline_graph_pagerank` documents).
    Degenerate groups (zero x- or y-variance, where OLS is undefined)
    are filtered identically on both sides.

    At 100 TB: identical shape to any GROUP BY — one shuffle of
    5-number partials per group, skew-immune (the stats are algebraic,
    so a salted two-phase split composes if a group is hot).
    """
    o = load_table(spark, sf_dir, "orders")
    b = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01")
        ).cast("bigint").alias("x"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
    )
    s = b.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    cov_n = n * sxy - sx * sy      # n²·cov(x,y)
    varx_n = n * sxx - sx * sx     # n²·var(x)
    vary_n = n * syy - sy * sy     # n²·var(y)
    slope = cov_n / varx_n
    return (
        s.filter((varx_n > 0) & (vary_n > 0))
        .select(
            "priority",
            "n_orders",
            F.round(slope, 6).alias("slope"),
            F.round((sy - slope * sx) / n, 6).alias("intercept"),
            F.round((cov_n * cov_n) / (varx_n * vary_n), 6).alias("r2"),
        )
    )


# ---------------------------------------------------------------------------
# Arrow grouped-aggregate UDAF under the oracle gate: weighted median
# ---------------------------------------------------------------------------

_WMEDIAN_ORACLE = """
WITH g AS (
  SELECT l_returnflag AS flag, l_extendedprice AS v,
         SUM(CAST(l_quantity AS BIGINT)) AS w
  FROM lineitem GROUP BY flag, v
),
c AS (
  SELECT flag, v, w,
         SUM(w) OVER (PARTITION BY flag ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(w) OVER (PARTITION BY flag) AS tw
  FROM g
)
SELECT flag,
       MIN(v) AS weighted_median,
       CAST(MIN(tw) AS BIGINT) AS total_qty
FROM c WHERE cw * 2 >= tw GROUP BY flag
"""


@_register("agg_weighted_median_arrow", _WMEDIAN_ORACLE)
def agg_weighted_median_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag, computed through
    a GROUPED-AGGREGATE Arrow UDAF — the one aggregation seam this
    engine sanctions when an aggregate genuinely can't be expressed in
    built-ins (custom sketch merges, exact loss sweeps): the group's
    columns arrive as ONE Arrow batch per group, vectorized numpy does
    the work, no row-at-a-time Python anywhere. Weighted median itself
    IS SQL-expressible (the oracle's collapse → cumulative-weight
    window is the production form); this query runs both forms against
    each other, so the Arrow seam carries a hash-checked determinism
    contract instead of being a tested-by-vibes escape hatch.

    Determinism: the rule is "smallest v whose cumulative weight
    reaches half the total" — ties in v collapse to the same answer
    regardless of sort stability, weights are exact int64, and the
    returned v is byte-identical in both engines (2-decimal prices are
    exactly representable doubles; no arithmetic touches them).

    At 100 TB: Spark plans GROUPED_AGG with partial-less hash
    aggregation (one shuffle of (flag, v, w) triples after the
    map-side value collapse); a hot flag is a bounded Arrow batch
    (|distinct prices| rows after the collapse, not |lineitem|).
    """
    import numpy as np

    def _wm(v, w):
        a = v.to_numpy(np.float64)
        b = w.to_numpy(np.int64)
        o = np.argsort(a, kind="stable")
        cw = np.cumsum(b[o])
        idx = int(np.searchsorted(2 * cw, cw[-1], side="left"))
        return float(a[o][idx])

    def _wt(w):
        return int(w.to_numpy(np.int64).sum())

    # explicit GROUPED_AGG (this module's future-annotations make the
    # decorator's signature inference see strings, not pd.Series)
    _wmedian = F.pandas_udf(_wm, "double", F.PandasUDFType.GROUPED_AGG)
    _wtotal = F.pandas_udf(_wt, "long", F.PandasUDFType.GROUPED_AGG)

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    # map-side collapse to (flag, v, Σw): the Arrow batch per group is
    # bounded by distinct prices, not row count — the same reduction
    # the oracle's g CTE performs
    g = li.groupBy("flag", "v").agg(F.sum("w").alias("w"))
    # Spark refuses to mix a GROUPED_AGG pandas UDF with BUILT-IN
    # aggregates in one agg() — but two pandas UDAFs compose fine, so
    # the total rides the SAME grouped-agg pass as the median (exact
    # int64 sum in numpy). An earlier form persisted the collapsed
    # relation and ran a second totals aggregate joined back: one
    # extra cache-fill barrier, aggregation and broadcast join for a
    # sum the median's Arrow batch already holds (r14 — 0.97→0.39 s
    # at sf0.1; plan 9→5 nodes, join and InMemoryRelation gone).
    return g.groupBy("flag").agg(
        _wmedian("v", "w").alias("weighted_median"),
        _wtotal("w").alias("total_qty"),
    )
