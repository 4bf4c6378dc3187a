"""Registry iteration-order contract.

The driver's correctness harness oracle-checks only the FIRST 50
entries of ``merged_registry()`` per round, so iteration order decides
which queries earn hard driver evidence. Round 6 on, ordering is a pure
STALENESS rotation: never-driver-checked (newly added) queries first,
then ascending by the round of each query's most recent driver
CORRECTNESS row (r3-era before r4 … before r10). One priority-0
override beyond "new": ``ORACLE_UPGRADED_SINCE_LAST_CHECK`` (banked
evidence predates a contract change); one-shot pin sets (r9's seeded
contracts, r10's q11) are retired once their driver rows land. These
tests lock that ordering so a refactor can't silently rotate coverage
back, and force every newly added oracle query to be registered in
``NEW_IN_R14`` below (it claims a window slot from the stale cohort's
tail — keep new queries per round small or the stalest cohort spills).
"""

from __future__ import annotations

WINDOW = 50

# Oracle-backed queries ADDED in round 15: none — an optimization round
# adds no query surface. The r15 window is therefore the r15
# plan-changed set (priority 0), the twin-pair slip from the r14 window
# (the last r10-stale members), and the r11-stale cohort's head.
NEW_IN_R15: set[str] = set()

# Round 14's plan-changed set, all driver-checked in
# CORRECTNESS_r14.json (kept for the window-history assertions).
PLAN_CHANGED_IN_R14: set[str] = {
    "agg_weighted_median_arrow", "dedup_containment",
    "dedup_near_minhash", "dedup_ngram_jaccard", "dedup_simhash",
    "dedup_span_duplication", "join_bucketed_colocated",
    "join_range_events", "pipeline_incremental_dedup",
    "pipeline_quality_buckets", "pipeline_span_dedup",
    "q16_supplier_part_count", "text_bigram_surprisal",
    "text_repetition_stats", "text_tfidf_keywords",
    "text_winnow_fingerprint",
}

# Oracle-backed queries ADDED in round 14 — driver-checked in
# CORRECTNESS_r14.json.
NEW_IN_R14: set[str] = {
    # equality deletes (VERDICT r13 task 3 — Iceberg v2 equality
    # delete files): a keyed delete commits the key VALUES with zero
    # base-file reads; applicability by data sequence number
    # (strictly-older files only), made load-bearing in the hash by a
    # post-delete re-insert of a third of the band
    "sink_versioned_delete_equality",
    # zero-copy hive-layout release bundle (VERDICT r13 task 5): every
    # live file hardlinked into lang=<value>/ dirs from its manifest
    # tuple; re-read by PLAIN Spark hive discovery under the
    # whole-table checksum oracle; flat export still refuses
    "sink_versioned_export_hive",
    # per-file Bloom sketches in the manifest stats (VERDICT r13 task
    # 7): a round-robin layout defeats min/max entirely; the point
    # read refuses unless ranges kept everything AND the bloom pruned
    "sink_versioned_point_read_bloom",
    # substring-dedup span REMOVAL (VERDICT r13 task 8): chars covered
    # by winnow windows shared across docs are excised; the full
    # cleaned text is hash-gated (relational char-coverage oracle);
    # idempotence pinned in tests
    "pipeline_span_dedup",
    # Avro sink/source (closes the environment-blocked spark-avro row
    # the way the image codecs closed PIL): stdlib spec-built Object
    # Container codec + mapInPandas/binaryFile plumbing, under the
    # same roundtrip checksum oracle as the jsonl/csv/orc sinks
    "sink_avro_roundtrip",
}

# Round 13's additions, all driver-checked in CORRECTNESS_r13.json.
NEW_IN_R13: set[str] = {
    # merge-on-read position deletes (VERDICT r12 task 2): a delete
    # commits a (file, row position) parquet instead of rewriting data
    # files; reads anti-join it, compaction materializes it
    "sink_versioned_delete_vectors",
    # hive partition columns (VERDICT r12 task 5): field-id-keyed
    # partition tuples in the manifest, literal re-attachment at read,
    # pruning-or-refuse gate
    "sink_versioned_partitioned_read",
    # zero-copy shallow clone (VERDICT r12 task 6): metadata-only
    # snapshot referencing the source's immutable files; divergence on
    # the clone must not touch the source (build-guarded)
    "sink_versioned_clone_read",
    # checkpoint-relation data skipping (VERDICT r12 task 1): O(delta)
    # manifests + parquet checkpoint; pruning as a Spark filter that
    # must agree file-for-file with the Python loop
    "sink_versioned_checkpoint_read",
    # distributed BPE tokenizer training (VERDICT r12 task 7): fixed
    # deterministic merge rounds, every merge + post-merge corpus
    # token total hash-checked against DuckDB replaying the procedure
    "text_bpe_token_stats",
    # per-language word/token/char totals under the learned BPE
    # vocabulary (encode = chained literal replaces, codegen-only)
    "text_bpe_lang_tokens",
    # merge-on-read UPSERT (Iceberg v2 delete-file MERGE): mask via
    # position delete + append post-images, zero rewrites, SAME oracle
    # as the copy-on-write form — two strategies, one contract
    "sink_versioned_upsert_mor",
    # real GIF87a codec behind the decode_stub seam: LZW (a second,
    # disjoint compression family next to PNG's DEFLATE), global color
    # table, skippable extensions; pixel-rule-only oracle
    "multimodal_decode_gif",
}

# Round 12's additions, both driver-checked in CORRECTNESS_r12.json.
NEW_IN_R12: set[str] = {
    # real truecolor PNG codec behind the decode_stub seam (VERDICT
    # r11 task 5): stdlib-zlib chunk walk + per-row filter
    # reconstruction, pixel-rule-only oracle
    "multimodal_decode_png",
    # schema evolution on the versioned table (VERDICT r11 task 6):
    # widen/rename/add as metadata-only commits, field-id-resolved
    # evolved read, final-state checksum oracle off the raw parquet
    "sink_versioned_schema_widen",
}

# Round 11's additions, all driver-checked in CORRECTNESS_r11.json.
NEW_IN_R11: set[str] = {
    # snapshot-isolated append + online compaction through the
    # manifest-pointer versioned table (sources/maintenance.py) — the
    # commit protocol behind `sink_compacted_roundtrip` (VERDICT r10
    # task 5; per-epoch reader invariant pinned in
    # test_streaming_append_online_compaction)
    "sink_versioned_compaction",
    # VERSION AS OF on the same table: a historical post-compaction
    # manifest read back under the checksum oracle (membership is the
    # deterministic doc_id % 8 <= 6 predicate)
    "sink_versioned_time_travel",
    # file-level data skipping via manifest min/max stats: a range read
    # must refuse to answer unless the manifest actually pruned, and
    # the checksum oracle proves the pruned scan equals the full scan
    "sink_versioned_pruned_read",
    # copy-on-write MERGE: stats-pruned file rewrite (only the update
    # band's files), post-merge table checksummed vs DuckDB's
    # restatement of the merged state
    "sink_versioned_upsert",
    # change data feed: manifest-diff incremental read across an
    # update-merge + insert-merge + range-delete window; all three
    # change classes restated by deterministic id-band predicates
    "sink_versioned_changes",
    # multi-source BFS min-hop distances over the shared near-dup
    # graph (4th graph primitive; unrolled min-monotone oracle)
    "pipeline_graph_bfs_reach",
    # per-group OLS slope/intercept/R² from exact decimal sufficient
    # statistics (one map-side-combinable aggregation)
    "agg_regression_trend",
    # bigram PMI collocations (vocabulary-sized shuffles, rounded-pmi
    # top-k with a unique tiebreak both engines cut identically)
    "text_collocations_pmi",
    # z-order clustered compaction + column-keyed manifest stats:
    # one physical layout prunes on BOTH clustered dimensions
    "sink_versioned_zorder_read",
    # incremental view maintenance: old aggregate + CDF deltas (with
    # update pre-images) must hash-equal the recompute oracle
    "sink_versioned_incremental_agg",
    # GROUPED_AGG Arrow UDAF seam under the hash gate (weighted median
    # vs the oracle's cumulative-weight window form)
    "agg_weighted_median_arrow",
    # additive seasonal decomposition (trend/season/residual) from
    # exact integer window sums — single-division determinism
    "event_seasonal_decompose",
    # in-session first-order Markov transition matrix (LEAD within the
    # shared sessionize partitioning; never crosses sessions)
    "event_transition_matrix",
    # population stability index between corpus halves (drift gate;
    # integer decile grid + smoothed single-division terms)
    "pipeline_drift_psi",
    # first/last-touch revenue attribution (session-bounded categorical
    # IGNORE-NULLS carry-forward windows)
    "event_attribution",
    # MMR diversified top-k: distributed kNN pool, bounded driver-side
    # greedy, oracle walks the same unrolled 8 picks (materialized CTEs)
    "sim_topk_mmr",
    # one-sided CUSUM change-point statistic (pair-state sequential
    # fold, Spark aggregate == DuckDB list_reduce with prepended init)
    "event_changepoint_cusum",
}

# Round 10's additions, all driver-checked in CORRECTNESS_r10.json.
NEW_IN_R10: set[str] = {
    # stored-index IVF: persisted centroids + cell-partitioned inverted
    # file, same oracle as sim_topk_ivf_kmeans (VERDICT r9 task 3)
    "sim_topk_ivf_stored",
    # IVF-PQ composite (FAISS IndexIVFPQ): cell prune × code compaction,
    # jointly-encoded index, fully oracle-checked composition
    "sim_topk_ivfpq",
    # small-file compaction under the sink checksum gate (the storage
    # maintenance op streaming appends require)
    "sink_compacted_roundtrip",
}

# r10's priority-0 overrides, now banked inside DRIVER_CHECKED_R10:
# sim_recall_report's oracle gained the ivfpq method row after its r9
# driver row, and q11_important_value rode a one-round pin for an
# unambiguous row on its scale-free threshold (VERDICT r9 task 1).
R10_UPGRADED: set[str] = {"sim_recall_report"}
R10_PINNED: set[str] = {"q11_important_value"}

# Round 9's additions, all driver-checked in CORRECTNESS_r09.json.
NEW_IN_R9: set[str] = {
    "multimodal_decode_real",  # stdlib BMP decode (VERDICT r8 task 2)
    "multimodal_decode_wav",   # stdlib RIFF/WAVE PCM decode (audio sibling)
}

# r9's priority-0 overrides, now banked inside DRIVER_CHECKED_R9:
# three r7-banked queries whose registered output changed late in r8
# (ADVICE r8 item 1) and the four late-r8 seeded LSH/IVF contracts
# that rode a second consecutive window (VERDICT r8 task 1).
R9_UPGRADED: set[str] = {
    "dedup_simhash", "sim_recall_report", "join_bloom_prefilter",
}
R9_PINNED: set[str] = {
    "sim_topk_lsh", "dedup_embedding_lsh", "sim_topk_ivf",
    "sim_topk_ivf_kmeans",
}

# Round 8's additions (none — r8 spent its budget on oracle upgrades).
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
        DRIVER_CHECKED_R8,
        DRIVER_CHECKED_R9,
        DRIVER_CHECKED_R10,
        DRIVER_CHECKED_R11,
        DRIVER_CHECKED_R12,
        DRIVER_CHECKED_R13,
        DRIVER_CHECKED_R14,
        PLAN_OR_ORACLE_CHANGED_SINCE_LAST_CHECK,
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
        DRIVER_CHECKED_R8,
        DRIVER_CHECKED_R9,
        DRIVER_CHECKED_R10,
        DRIVER_CHECKED_R11,
        DRIVER_CHECKED_R12,
        DRIVER_CHECKED_R13,
        DRIVER_CHECKED_R14,
        PLAN_OR_ORACLE_CHANGED_SINCE_LAST_CHECK,
    )


def test_banked_names_exist():
    (names, _, r23, r4, r5, r6, r7, r8, r9, r10, r11, r12, r13, r14,
     changed) = _registry()
    for label, banked in (
        ("R2_R3", r23), ("R4", r4), ("R5", r5), ("R6", r6), ("R7", r7),
        ("R8", r8), ("R9", r9), ("R10", r10), ("R11", r11), ("R12", r12),
        ("R13", r13), ("R14", r14),
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
    # r8's window: the 49-query r5-stale cohort plus the
    # oracle-upgraded sim_topk_pq (r6-banked; its r6 row predated the
    # r7 hash oracle) — no r7-banked re-checks
    assert len(r8) == 50 and len(r8 & (r5 - r6 - r7)) == 49
    assert r8 & r6 == {"sim_topk_pq"}
    assert not (r7 & r8), "round 8's window re-checked no r7-banked query"
    # r9's window: 2 new codec queries, 3 oracle-upgraded r7 re-rides,
    # 4 pinned r8 re-rides, the lone r5-era spill, and 40 of the
    # r6-stale cohort
    assert len(r9) == 50
    assert NEW_IN_R9 <= r9
    assert r9 & r8 == R9_PINNED
    assert r9 & r7 == R9_UPGRADED
    assert r9 & (r5 - r6 - r7 - r8) == {"event_anomaly_zscore"}
    assert len(r9 & (r6 - r7 - r8)) == 40
    # r10's window: the 3 new queries, the oracle-upgraded report and
    # pinned q11 re-rides (both r9-banked), the 9-query r6-stale
    # cohort, and 36 of the r7-stale cohort
    assert len(r10) == 50
    assert NEW_IN_R10 <= r10
    assert r10 & r9 == R10_UPGRADED | R10_PINNED
    assert len(r10 & (r6 - r7 - r8 - r9)) == 9
    assert len(r10 & (r7 - r8 - r9)) == 36
    assert not (r8 & r10), "round 10's window re-checked no r8-banked query"
    # r11's window: the 17 new r11 queries, the full 11-query r7-stale
    # leftover cohort (VERDICT r10 task 1 executed), and 22 of the
    # r8-stale cohort's head
    assert len(r11) == 50
    assert NEW_IN_R11 <= r11 and len(NEW_IN_R11) == 17
    assert len(r11 & (r7 - r8 - r9 - r10)) == 11
    assert len(r11 & (r8 - r9 - r10)) == 22
    assert not (r9 & r11) and not (r10 & r11), (
        "round 11's window re-checked no r9/r10-banked query"
    )
    # r12's window: round 12's 2 new queries, the full 24-query
    # r8-stale leftover cohort (VERDICT r11 task 2 executed), and 24 of
    # the r9-stale cohort's head
    assert len(r12) == 50
    assert NEW_IN_R12 <= r12 and len(NEW_IN_R12) == 2
    assert len(r12 & (r8 - r9 - r10 - r11)) == 24
    assert len(r12 & (r9 - r10 - r11)) == 24
    assert not (r10 & r12) and not (r11 & r12), (
        "round 12's window re-checked no r10/r11-banked query"
    )
    # r13's window: round 13's 8 new queries, the 3 plan-changed r11
    # re-rides (the r12 `<=>` CDF rewrite and the Decimal(repr) MMR
    # rounding change landed after their r11 rows), the full 24-query
    # r9-stale leftover cohort (VERDICT r12 task 3 executed), and 15 of
    # the r10-stale cohort's head
    assert len(r13) == 50
    assert NEW_IN_R13 <= r13 and len(NEW_IN_R13) == 8
    assert r13 & r11 == {
        "sink_versioned_changes", "sink_versioned_incremental_agg",
        "sim_topk_mmr",
    }
    assert len(r13 & (r9 - r10 - r11 - r12)) == 24
    assert len(r13 & (r10 - r11 - r12)) == 15
    assert not (r12 & r13), "round 13's window re-checked no r12-banked query"
    # r14's window: the 5 new r14 queries, the 16-member r14
    # optimization plan-changed set (pipeline_span_dedup in both), and
    # all of the r10-stale cohort except the pinned twin-pair slip
    assert len(r14) == 50
    assert NEW_IN_R14 <= r14 and PLAN_CHANGED_IN_R14 <= r14
    assert len(r14 & (r10 - r11 - r12 - r13)) == 33
    assert (r10 - r11 - r12 - r13) - r14 == {
        "event_distinct_sliding", "event_distinct_sliding_hll",
    }
    # Round-15 plan-changed set: the second optimization round's
    # plan-shape commits — the exact tools/plan_fingerprints.json diff
    # between the tree the r14 driver graded (f341712) and HEAD — plus
    # the two graph hosts whose checkpoint-truncated fingerprints hid
    # the r14 pipeline change from their banked rows (ADVICE r14).
    assert changed == {
        "dedup_containment",
        "event_interarrival_stats",
        "pipeline_corpus_dedup",
        "pipeline_curriculum_order",
        "pipeline_dedup_keep_best",
        "pipeline_graph_bfs_reach",
        "pipeline_graph_pagerank",
        "pipeline_span_dedup",
    }
    # plan-changed names must be real, registered queries
    assert changed <= set(names)


def test_every_query_has_banked_or_new_status():
    (names, _, r23, r4, r5, r6, r7, r8, r9, r10, r11, r12, r13, r14,
     _c) = _registry()
    never = (set(names) - r23 - r4 - r5 - r6 - r7 - r8 - r9 - r10 - r11
             - r12 - r13 - r14)
    assert never == NEW_IN_R15, (
        f"never-driver-checked set drifted: {never ^ NEW_IN_R15} — newly "
        "added oracle queries must be registered in NEW_IN_R15"
    )


def test_window_is_staleness_ordered():
    (names, _, r23, r4, r5, r6, r7, r8, r9, r10, r11, r12, r13, r14,
     changed) = _registry()
    later = r5 | r6 | r7 | r8 | r9 | r10 | r11 | r12 | r13 | r14
    assert not (r23 - later), "every r3-era query re-checked"
    assert not (r4 - later), "every r4-era query re-checked"
    assert not (r5 - r6 - r7 - r8 - r9 - r10 - r11 - r12), (
        "every r5-era query was re-checked (event_anomaly_zscore rode in r9)"
    )
    assert not (r6 - r7 - r8 - r9 - r10 - r11 - r12), (
        "every r6-era query was re-checked (the 9-query cohort rode in r10)"
    )
    assert not (r7 - r8 - r9 - r10 - r11 - r12), (
        "every r7-era query was re-checked (the 11-query cohort rode in r11)"
    )
    assert not (r8 - r9 - r10 - r11 - r12 - r13), (
        "every r8-era query was re-checked (the 24-query cohort rode in r12)"
    )
    assert not (r9 - r10 - r11 - r12 - r13), (
        "every r9-era query was re-checked (the 24-query cohort rode in r13)"
    )
    # r15 window: plan-changed queries lead (no new queries this
    # round), then the r10-stale twin-pair slip from the r14 window —
    # the sliding-distinct twins travel TOGETHER, landing whole inside
    # this window as pinned in r14 — then the r11-stale cohort, then
    # the r12-stale cohort's module-order head in whatever slots
    # remain.
    head = NEW_IN_R15 | changed
    assert set(names[: len(head)]) == head
    window = names[:WINDOW]
    stale_r10 = r10 - r11 - r12 - r13 - r14
    assert sorted(stale_r10) == [
        "event_distinct_sliding", "event_distinct_sliding_hll",
    ], "the r14 twin-pair slip drifted"
    assert names[len(head): len(head) + 2] == [
        "event_distinct_sliding", "event_distinct_sliding_hll",
    ], "the slipped twins must lead the stale segment of the r15 window"
    stale_r11 = r11 - r12 - r13 - r14
    assert len(stale_r11) == 44
    # pipeline_graph_bfs_reach is r11-banked but rides the head as
    # plan-changed, so the stale segment holds one fewer
    rest_r11 = [n for n in names if n in stale_r11 - head]
    assert len(rest_r11) == len(stale_r11 - head) == 43
    # head (8 plan-changed) + twins (2) + the 43-query r11-stale
    # remainder = 53 > 50: THREE cohort members slip past the window.
    # Plan-changed beats stale per the documented priority, and the
    # slipped members are pinned to the cohort's module-order tail —
    # pipeline_drift_psi, event_attribution, event_changepoint_cusum.
    overflow = len(head) + 2 + len(rest_r11) - WINDOW
    assert overflow == 3 and rest_r11[-3:] == [
        "pipeline_drift_psi", "event_attribution", "event_changepoint_cusum",
    ], "window overflow drifted: re-derive which cohort members slip"
    assert names[len(head) + 2: WINDOW] == rest_r11[:-3]
    assert set(window) == head | stale_r10 | set(rest_r11[:-3]), (
        f"round-15 window drifted: window={sorted(set(window))}"
    )
    # freshest evidence (r14-checked) rides at the very back — except
    # members whose plan changed this round, which lead the window
    r14_tail = r14 - changed
    tail = names[-len(r14_tail):]
    assert set(tail) == r14_tail, (
        "unchanged r14-banked queries must occupy the registry tail"
    )
