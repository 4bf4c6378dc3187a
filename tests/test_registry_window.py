"""Registry iteration-order contract.

The driver's correctness harness oracle-checks only the FIRST 50
entries of ``merged_registry()`` per round, so iteration order decides
which queries earn hard driver evidence. Round 6 on, ordering is a pure
STALENESS rotation: never-driver-checked (newly added) queries first,
then ascending by the round of each query's most recent driver
CORRECTNESS row (r3-era before r4 before r5). These tests lock that
ordering so a refactor can't silently rotate coverage back, and force
every newly added oracle query to be registered in ``NEW_IN_R6`` below
(it claims a window slot from the r4 cohort's tail — keep new queries
per round ≤ the number of r4-cohort slots in the window, or the stalest
cohort starts spilling out).
"""

from __future__ import annotations

WINDOW = 50

# Oracle-backed queries ADDED in round 6 — no banked evidence exists,
# so they lead the window.
NEW_IN_R6: set[str] = {
    "sink_orc_roundtrip",
    "pipeline_scd2_intervals",
    "pipeline_graph_triangles",
    "embedding_centroid_per_label",
    "join_salted_skew",
    "pipeline_curriculum_order",
    "event_interarrival_stats",
    "event_distinct_sliding",
    "event_distinct_sliding_hll",  # rows-only: sketch twin of the above
    "sim_topk_pq",  # rows-only: PQ/ADC ANN, recall property-tested
}


def _registry():
    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import (
        DRIVER_CHECKED_R2_R3,
        DRIVER_CHECKED_R4,
        DRIVER_CHECKED_R5,
        merged_registry,
    )

    queries, oracles = merged_registry()
    return (
        list(queries),
        oracles,
        DRIVER_CHECKED_R2_R3,
        DRIVER_CHECKED_R4,
        DRIVER_CHECKED_R5,
    )


def test_banked_names_exist():
    names, _, r23, r4, r5 = _registry()
    for label, banked in (("R2_R3", r23), ("R4", r4), ("R5", r5)):
        missing = banked - set(names)
        assert not missing, f"DRIVER_CHECKED_{label} names not in registry: {missing}"
    assert not (r23 & r4), "a query can't be banked in both r2/r3 and r4"
    assert not (r4 & r5), "round 5's window re-checked no r4-banked query"
    # r5 re-checked 19 r2/r3-era queries plus round 5's 31 new/never set
    assert len(r5) == 50 and len(r5 & r23) == 19


def test_every_query_has_banked_or_new_status():
    names, _, r23, r4, r5 = _registry()
    never = set(names) - r23 - r4 - r5
    assert never == NEW_IN_R6, (
        f"never-driver-checked set drifted: {never ^ NEW_IN_R6} — newly "
        "added oracle queries must be registered in NEW_IN_R6"
    )


def test_window_is_staleness_ordered():
    names, _, r23, r4, r5 = _registry()
    stale_r3 = r23 - r5  # latest driver row is r3-era
    assert len(stale_r3) == 31
    # new queries lead
    assert set(names[: len(NEW_IN_R6)]) == NEW_IN_R6
    # then every r3-era query, before any r4- or r5-banked one
    assert set(names[len(NEW_IN_R6) : len(NEW_IN_R6) + len(stale_r3)]) == stale_r3
    # the window's remaining slots go to the r4 cohort's head
    window = names[:WINDOW]
    n_r4_slots = WINDOW - len(NEW_IN_R6) - len(stale_r3)
    assert n_r4_slots > 0, "new-query additions overflowed the window"
    expected = (
        NEW_IN_R6
        | stale_r3
        | set([n for n in names if n in r4][:n_r4_slots])
    )
    assert set(window) == expected, (
        f"round-6 window drifted: unexpected={set(window) - expected} "
        f"missing={expected - set(window)}"
    )
    # freshest evidence (r5-checked) rides at the very back
    tail = names[-len(r5):]
    assert set(tail) == r5, "r5-banked queries must occupy the registry tail"
