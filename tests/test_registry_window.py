"""Registry iteration-order contract.

The driver's correctness harness oracle-checks only the FIRST 50
entries of ``merged_registry()`` per round, so iteration order decides
which queries earn hard driver evidence. Round 6 on, ordering is a pure
STALENESS rotation: never-driver-checked (newly added) queries first,
then ascending by the round of each query's most recent driver
CORRECTNESS row (r3-era before r4 before r5 before r6 before r7). These
tests lock that ordering so a refactor can't silently rotate coverage
back, and force every newly added oracle query to be registered in
``NEW_IN_R8`` below (it claims a window slot from the stale cohort's
tail — keep new queries per round ≤ the number of fresh-cohort slots
in the window, or the stalest cohort starts spilling out).
"""

from __future__ import annotations

WINDOW = 50

# Oracle-backed queries ADDED in round 8 — no banked evidence exists,
# so they lead the window. Round 8's window budget is already 51
# candidates for 50 slots (the 50-query r5-stale cohort plus the
# oracle-upgraded sim_topk_pq), so every name added here pushes one
# more r5-era query out to round 9 — prefer zero new names this round.
NEW_IN_R8: set[str] = set()

# Round 7's additions, all driver-checked in CORRECTNESS_r07.json.
NEW_IN_R7: set[str] = {
    "join_bloom_prefilter",
    "event_path_regex",
    "pipeline_expectations_report",
    "sink_parquet_hive_partitioned",
    "text_char_entropy",
    "join_interval_overlap",
    "sink_parquet_schema_evolution",
    "sim_topk_pq_stored",  # stored-index ADC, same oracle as sim_topk_pq
    "event_ewma_smoothing",
}

# Round 6's additions, all driver-checked in CORRECTNESS_r06.json.
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
    "sim_topk_pq",  # rows-only in r6; oracled since r7 (deterministic ADC)
}


def _registry():
    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import (
        DRIVER_CHECKED_R2_R3,
        DRIVER_CHECKED_R4,
        DRIVER_CHECKED_R5,
        DRIVER_CHECKED_R6,
        DRIVER_CHECKED_R7,
        ORACLE_UPGRADED_SINCE_LAST_CHECK,
        merged_registry,
    )

    queries, oracles = merged_registry()
    return (
        list(queries),
        oracles,
        DRIVER_CHECKED_R2_R3,
        DRIVER_CHECKED_R4,
        DRIVER_CHECKED_R5,
        DRIVER_CHECKED_R6,
        DRIVER_CHECKED_R7,
        ORACLE_UPGRADED_SINCE_LAST_CHECK,
    )


def test_banked_names_exist():
    names, _, r23, r4, r5, r6, r7, upgraded = _registry()
    for label, banked in (
        ("R2_R3", r23), ("R4", r4), ("R5", r5), ("R6", r6), ("R7", r7)
    ):
        missing = banked - set(names)
        assert not missing, f"DRIVER_CHECKED_{label} names not in registry: {missing}"
    assert not (r23 & r4), "a query can't be banked in both r2/r3 and r4"
    assert not (r4 & r5), "round 5's window re-checked no r4-banked query"
    # r5 re-checked 19 r2/r3-era queries plus round 5's 31 new/never set
    assert len(r5) == 50 and len(r5 & r23) == 19
    # r6's window: round 6's 10 new queries, the 31 r3-era stale, and
    # the r4 cohort's 9-query head
    assert len(r6) == 50 and len(r6 & r23) == 31 and len(r6 & r4) == 9
    assert len(r6 & NEW_IN_R6) == 10
    assert not (r5 & r6), "round 6's window re-checked no r5-banked query"
    # r7's window: round 7's 9 new queries (incl. rows-only dedup_simhash
    # sibling set), the 41 r4-era stale — no r5/r6-banked re-checks
    assert len(r7) == 50 and len(r7 & (r4 - r6)) == 41
    assert len(r7 & NEW_IN_R7) == 9
    assert not (r5 & r7) and not (r6 & r7), (
        "round 7's window re-checked no r5/r6-banked query"
    )
    # the oracle-upgraded override only makes sense for names with a
    # stale banked row — a never-checked name is already priority 0
    assert upgraded <= (r23 | r4 | r5 | r6 | r7)


def test_every_query_has_banked_or_new_status():
    names, _, r23, r4, r5, r6, r7, _u = _registry()
    never = set(names) - r23 - r4 - r5 - r6 - r7
    assert never == NEW_IN_R8, (
        f"never-driver-checked set drifted: {never ^ NEW_IN_R8} — newly "
        "added oracle queries must be registered in NEW_IN_R8"
    )


def test_window_is_staleness_ordered():
    names, _, r23, r4, r5, r6, r7, upgraded = _registry()
    stale_r5 = r5 - r6 - r7  # latest driver row is r5-era — now the stalest
    assert len(stale_r5) == 50
    assert not (r23 - r5 - r6 - r7), "every r3-era query was re-checked"
    assert not (r4 - r5 - r6 - r7), "every r4-era query was re-checked"
    # new + oracle-upgraded queries lead
    head = NEW_IN_R8 | upgraded
    assert set(names[: len(head)]) == head
    # the window's remaining slots go to the r5-stale cohort's head in
    # module order
    window = names[:WINDOW]
    n_r5_slots = WINDOW - len(head)
    assert n_r5_slots >= 0, "new-query additions overflowed the window"
    expected = head | set([n for n in names if n in stale_r5][:n_r5_slots])
    assert set(window) == expected, (
        f"round-8 window drifted: unexpected={set(window) - expected} "
        f"missing={expected - set(window)}"
    )
    # with 51 candidates for 50 slots exactly one r5-era query rides
    # just outside the window (head of the r9 rotation)
    spilled = stale_r5 - set(window)
    assert spilled == {"event_anomaly_zscore"}, (
        f"unexpected window spill: {spilled}"
    )
    # freshest evidence (r7-checked) rides at the very back
    tail = names[-len(r7):]
    assert set(tail) == r7, "r7-banked queries must occupy the registry tail"
