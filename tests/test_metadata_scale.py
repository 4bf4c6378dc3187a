"""Versioned-table metadata at scale (VERDICT r12 tasks 1-2).

Round 12's layout re-serialized the FULL file list + stats + colmap
into every commit's JSON — O(files) bytes per commit, O(files²) over a
table's lifetime, and pruning walked it in a driver-side Python loop.
These tests pin the round-13 replacement: each manifest is an
O(delta) document, parquet CHECKPOINTS bound the replay window, data
skipping runs as a Spark filter over the checkpoint relation, and
merge-on-read position deletes commit without rewriting data files.
"""

from __future__ import annotations

import json
import pathlib

import pytest

from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
    CHECKPOINT_EVERY,
    _commit_delta,
    _checkpoint_path,
    _table_state,
    append_batch,
    changes,
    compact,
    delete_where_merge_on_read,
    list_manifests,
    manifest_files,
    manifest_stats,
    pruned_files,
    pruned_files_spark,
    read_manifest,
    read_snapshot,
    read_table,
    rename_column,
    table_state,
    vacuum,
    write_checkpoint,
)

SCHEMA = "doc_id long, text string"


def _manifest_bytes(root: str, name: str) -> int:
    return pathlib.Path(root, "manifests", name).stat().st_size


def test_manifest_is_o_delta_not_o_files(tmp_path):
    """The scale property itself: after N commits of K files each, the
    LAST manifest must not mention (or pay for) the first commit's
    files — its byte size is bounded by its own churn, so lifetime
    metadata is O(total churn), not O(files²)."""
    root = str(tmp_path / "t")
    base = None
    for i in range(40):
        adds = [f"b{i:04d}-{j}.parquet" for j in range(5)]
        base = _commit_delta(
            root, base, f"append {i}",
            adds=adds,
            stats_adds={f: {"doc_id": [10 * i, 10 * i + 9]} for f in adds},
        )
    name, files = read_manifest(root)
    assert len(files) == 200
    doc = json.loads(pathlib.Path(root, "manifests", name).read_text())
    assert "files" not in doc, "delta manifests never carry the full list"
    assert "b0000-0.parquet" not in json.dumps(doc)
    sizes = [
        _manifest_bytes(root, n) for n, _ in list_manifests(root)
    ]
    # every commit has the same churn, so manifest sizes must be flat —
    # the v1 layout grew linearly (last ≈ 40× first)
    assert max(sizes) < 2 * min(sizes), (
        f"per-commit metadata grew with table size: {sizes[:3]}..{sizes[-3:]}"
    )
    # stats accumulate through replay
    stats = manifest_stats(root, name)
    assert stats["b0000-0.parquet"]["doc_id"] == [0, 9]
    assert stats["b0039-4.parquet"]["doc_id"] == [390, 399]


def test_checkpoint_is_a_restart_point(tmp_path):
    """State reconstructed THROUGH a checkpoint must equal the state
    replayed from scratch, and a reader holding a checkpoint must not
    need any manifest older than it (deleting them is how we prove
    the replay window is bounded)."""
    root = str(tmp_path / "t")
    base = None
    for i in range(11):
        base = _commit_delta(
            root, base, f"append {i}",
            adds=[f"b{i:04d}.parquet"],
            stats_adds={f"b{i:04d}.parquet": {"doc_id": [i, i]}},
            removes=[f"b{i-2:04d}.parquet"] if i >= 2 else (),
        )
    name, files = read_manifest(root)
    from_scratch = table_state(root, name)

    ck = write_checkpoint(root, name)
    assert pathlib.Path(ck).exists()
    # drop the cache and every manifest BEFORE the checkpoint: replay
    # must restart at the checkpoint, not walk the full history
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources import (
        maintenance as m,
    )

    m._STATE_CACHE.clear()
    for n, _ in list_manifests(root)[:-1]:
        pathlib.Path(root, "manifests", n).unlink()
    via_ckpt = table_state(root, name)
    assert via_ckpt == from_scratch
    assert via_ckpt["files"] == ["b0009.parquet", "b0010.parquet"]
    assert via_ckpt["stats"]["b0010.parquet"]["doc_id"] == [10, 10]


def test_auto_checkpoint_cadence(spark, tmp_path):
    """Commits write a checkpoint every CHECKPOINT_EVERY sequences
    (best-effort, atomic), so a real table's replay window stays
    bounded without anyone calling write_checkpoint."""
    root = str(tmp_path / "t")
    for i in range(CHECKPOINT_EVERY + 2):
        df = spark.createDataFrame([(i, f"r{i}")], SCHEMA).coalesce(1)
        append_batch(df, root, i, stats_col="doc_id")
    assert _checkpoint_path(root, CHECKPOINT_EVERY).exists()
    rows = {(r.doc_id, r.text) for r in read_table(spark, root, SCHEMA).collect()}
    assert rows == {(i, f"r{i}") for i in range(CHECKPOINT_EVERY + 2)}


def test_pruned_files_spark_matches_python(spark, tmp_path):
    """Data skipping through the checkpoint relation (a columnar Spark
    filter + O(delta) tail replay) must select exactly the files the
    driver-side Python loop selects — including files appended AFTER
    the checkpoint, which only the tail replay can know about."""
    root = str(tmp_path / "t")
    n = CHECKPOINT_EVERY + 3  # checkpoint exists + a live tail
    for i in range(n):
        df = spark.createDataFrame(
            [(10 * i + j, f"r{i}") for j in range(3)], SCHEMA
        ).coalesce(1)
        append_batch(df, root, i, stats_col="doc_id")
    name, live = read_manifest(root)
    assert len(live) == n

    py_kept, py_total = pruned_files(root, name, "doc_id", 25, 47)
    sp = pruned_files_spark(spark, root, name, "doc_id", 25, 47)
    assert sp is not None, "a checkpoint exists: the Spark path must run"
    assert sp == (py_kept, py_total)
    assert 0 < len(py_kept) < py_total, "the range must actually prune"
    # a range covering only the POST-checkpoint tail
    tail_lo = 10 * (CHECKPOINT_EVERY + 1)
    sp2 = pruned_files_spark(
        spark, root, name, "doc_id", tail_lo, tail_lo + 2
    )
    assert sp2 == pruned_files(root, name, "doc_id", tail_lo, tail_lo + 2)
    assert len(sp2[0]) == 1
    # and the read path gives the same rows either way
    got = {
        r.doc_id
        for r in read_table(
            spark, root, SCHEMA, where_between=("doc_id", 25, 47)
        ).collect()
    }
    assert got == {30, 31, 32, 40, 41, 42}


def test_pruned_files_spark_declines_after_rekey(spark, tmp_path):
    """A rename between the checkpoint and the head re-keys what the
    checkpoint's typed stat columns mean: the Spark path must DECLINE
    (fall back to the Python loop) rather than prune the renamed
    column with stale keys."""
    root = str(tmp_path / "t")
    for i in range(CHECKPOINT_EVERY + 1):
        df = spark.createDataFrame(
            [(10 * i, f"r{i}")], SCHEMA
        ).coalesce(1)
        append_batch(df, root, i, stats_col="doc_id", track_schema=(i == 0))
    rename_column(root, "doc_id", "id")
    name, _ = read_manifest(root)
    assert pruned_files_spark(spark, root, name, "id", 0, 15) is None
    kept, total = pruned_files(root, name, "id", 0, 15, spark=spark)
    assert len(kept) == 2 and total == CHECKPOINT_EVERY + 1
    # the next checkpoint heals the fast path
    write_checkpoint(root, name)
    assert pruned_files_spark(spark, root, name, "id", 0, 15) == (
        kept, total
    )


def test_v1_full_manifest_backward_compat(spark, tmp_path):
    """Tables committed under the round-11/12 layout (full-snapshot
    manifests) must stay readable: a v1 doc is a restart point, and
    new delta commits stack on top of it."""
    root = str(tmp_path / "t")
    data = pathlib.Path(root, "data")
    data.mkdir(parents=True)
    df = spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA).coalesce(1)
    df.write.mode("overwrite").parquet(str(tmp_path / "stage"))
    part = next(
        p for p in (tmp_path / "stage").iterdir()
        if p.name.startswith("part-") and p.suffix == ".parquet"
    )
    part.rename(data / "legacy-0.parquet")
    mdir = pathlib.Path(root, "manifests")
    mdir.mkdir()
    (mdir / "m-00000000.json").write_text(json.dumps({
        "files": ["legacy-0.parquet"],
        "stats": {"legacy-0.parquet": {"doc_id": [1, 2]}},
        "note": "v1 legacy commit",
        "ts": 1.0,
    }))
    pathlib.Path(root, "CURRENT").write_text("m-00000000.json")

    assert manifest_files(root, "m-00000000.json") == ["legacy-0.parquet"]
    rows = {(r.doc_id, r.text) for r in read_table(spark, root, SCHEMA).collect()}
    assert rows == {(1, "a"), (2, "b")}

    df2 = spark.createDataFrame([(3, "c")], SCHEMA).coalesce(1)
    append_batch(df2, root, 1, stats_col="doc_id")
    name, files = read_manifest(root)
    assert len(files) == 2
    assert manifest_stats(root, name)["legacy-0.parquet"] == {
        "doc_id": [1, 2]
    }
    kept, total = pruned_files(root, name, "doc_id", 3, 3)
    assert total == 2 and kept == [f for f in files if f != "legacy-0.parquet"]


# --- Merge-on-read position deletes (VERDICT r12 task 2) -------------


def _build_small(spark, tmp_path, *, files=4):
    root = str(tmp_path / "t")
    for i in range(files):
        df = spark.createDataFrame(
            [(10 * i + j, f"r{10 * i + j}") for j in range(10)], SCHEMA
        ).coalesce(1)
        append_batch(df, root, i, stats_col="doc_id")
    return root


def test_mor_delete_rewrites_zero_data_files(spark, tmp_path):
    """The merge-on-read contract: the delete commit adds ONE
    position-delete file and touches no data file — the manifest's
    adds/removes are empty — while reads subtract the positions."""
    root = _build_small(spark, tmp_path)
    _, live_before = read_manifest(root)

    name, n = delete_where_merge_on_read(
        spark, root, SCHEMA, "doc_id", 13, 27, stats_col="doc_id"
    )
    assert n == 15
    doc = json.loads(pathlib.Path(root, "manifests", name).read_text())
    assert "adds" not in doc and "removes" not in doc, (
        "a merge-on-read delete must rewrite zero data files"
    )
    assert len(doc["delete_adds"]) == 1
    _, live_after = read_manifest(root)
    assert live_after == live_before, "data file set unchanged"

    got = {r.doc_id for r in read_table(spark, root, SCHEMA).collect()}
    assert got == {i for i in range(40) if not 13 <= i <= 27}
    # stats-pruned victim scan: only the 2 overlapping files were read
    st = table_state(root)
    assert len(st["deletes"]) == 1


def test_mor_delete_time_travel_and_stacking(spark, tmp_path):
    """Snapshot isolation composes: the pre-delete version still sees
    every row; a SECOND merge-on-read delete stacks (both delete files
    apply); vacuum protects referenced delete files."""
    root = _build_small(spark, tmp_path)
    pre, _ = read_manifest(root)
    delete_where_merge_on_read(spark, root, SCHEMA, "doc_id", 5, 8)
    delete_where_merge_on_read(spark, root, SCHEMA, "doc_id", 30, 33)

    assert {
        r.doc_id for r in read_snapshot(spark, root, pre, SCHEMA).collect()
    } == set(range(40))
    got = {r.doc_id for r in read_table(spark, root, SCHEMA).collect()}
    assert got == {
        i for i in range(40) if not (5 <= i <= 8 or 30 <= i <= 33)
    }
    st = table_state(root)
    assert len(st["deletes"]) == 2
    # vacuum at the head keeps both delete files (they are referenced)
    vacuum(root)
    got2 = {r.doc_id for r in read_table(spark, root, SCHEMA).collect()}
    assert got2 == got


def test_compact_materializes_mor_deletes(spark, tmp_path):
    """Compaction is the materialization point: the rewrite applies
    pending position deletes, and the replacement version carries NO
    delete files — reads afterwards need no anti-join."""
    root = _build_small(spark, tmp_path)
    delete_where_merge_on_read(spark, root, SCHEMA, "doc_id", 13, 27)
    reduced = compact(spark, root, SCHEMA, target_files=1)
    assert reduced > 0
    st = table_state(root)
    assert st["deletes"] == [], "compact must consume applied deletes"
    got = {r.doc_id for r in read_table(spark, root, SCHEMA).collect()}
    assert got == {i for i in range(40) if not 13 <= i <= 27}
    # after vacuum the superseded files AND the consumed delete file go
    removed = vacuum(root)
    assert removed >= 5  # 4 data files + 1 delete file
    got2 = {r.doc_id for r in read_table(spark, root, SCHEMA).collect()}
    assert got2 == got


def test_changes_sees_mor_deletes(spark, tmp_path):
    """The change feed must emit position-deleted rows as `delete`
    rows — a CDF consumer cannot tell (and must not care) whether a
    delete was copy-on-write or merge-on-read."""
    root = _build_small(spark, tmp_path, files=2)
    from_name, _ = read_manifest(root)
    delete_where_merge_on_read(
        spark, root, SCHEMA, "doc_id", 3, 5, stats_col="doc_id"
    )
    feed = changes(spark, root, SCHEMA, "doc_id", from_name).collect()
    got = {(r.doc_id, r._change) for r in feed}
    assert got == {(3, "delete"), (4, "delete"), (5, "delete")}


def test_mor_delete_no_victims_is_a_noop(spark, tmp_path):
    root = _build_small(spark, tmp_path, files=2)
    before, _ = read_manifest(root)
    name, n = delete_where_merge_on_read(
        spark, root, SCHEMA, "doc_id", 500, 600
    )
    assert n == 0 and name == before
    assert table_state(root)["deletes"] == []


def test_mor_upsert_masks_and_inserts_without_rewrites(spark, tmp_path):
    """The merge-on-read MERGE: matched keys are masked by a position
    delete + re-inserted as new files, unmatched keys are plain
    inserts, and the commit removes NO data file. CDF must report the
    same update/insert classes as the copy-on-write form would."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        merge_upsert_merge_on_read,
    )

    root = _build_small(spark, tmp_path, files=2)  # ids 0..19
    _, live_before = read_manifest(root)
    from_name = read_manifest(root)[0]
    updates = spark.createDataFrame(
        [(5, "FIVE"), (17, "SEVENTEEN"), (100, "HUNDRED")], SCHEMA
    ).coalesce(1)
    name, masked = merge_upsert_merge_on_read(
        spark, root, SCHEMA, updates, "doc_id", stats_col="doc_id"
    )
    assert masked == 2  # 5 and 17 existed; 100 is an insert
    doc = json.loads(pathlib.Path(root, "manifests", name).read_text())
    assert "removes" not in doc and len(doc["delete_adds"]) == 1
    _, live_after = read_manifest(root)
    assert set(live_before) <= set(live_after), "no data file removed"

    got = {
        (r.doc_id, r.text)
        for r in read_table(spark, root, SCHEMA).collect()
    }
    expect = {(i, f"r{i}") for i in range(20) if i not in (5, 17)}
    expect |= {(5, "FIVE"), (17, "SEVENTEEN"), (100, "HUNDRED")}
    assert got == expect
    # the change feed reports updates and the insert, never the masked
    # old images as bare deletes
    feed = changes(spark, root, SCHEMA, "doc_id", from_name).collect()
    classes = {(r.doc_id, r._change) for r in feed}
    assert classes == {
        (5, "update_post"), (17, "update_post"), (100, "insert")
    }
    # compaction materializes the mask; state carries no deletes after
    assert compact(spark, root, SCHEMA, target_files=1) > 0
    assert table_state(root)["deletes"] == []
    assert {
        (r.doc_id, r.text)
        for r in read_table(spark, root, SCHEMA).collect()
    } == expect


def test_mor_upsert_on_empty_or_no_matches(spark, tmp_path):
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        merge_upsert_merge_on_read,
    )

    root = _build_small(spark, tmp_path, files=1)  # ids 0..9
    updates = spark.createDataFrame([(50, "fifty")], SCHEMA).coalesce(1)
    name, masked = merge_upsert_merge_on_read(
        spark, root, SCHEMA, updates, "doc_id", stats_col="doc_id"
    )
    assert masked == 0
    assert table_state(root)["deletes"] == [], (
        "a no-match upsert must not commit an empty delete file"
    )
    got = {r.doc_id for r in read_table(spark, root, SCHEMA).collect()}
    assert got == set(range(10)) | {50}


def test_cow_rewrite_does_not_resurrect_mor_deleted_rows(spark, tmp_path):
    """Review-found (r13): a copy-on-write DELETE (or MERGE) rewriting
    files that carry a pending merge-on-read mask must APPLY the mask
    — scanning the files raw would write the masked rows into the
    replacement files and then consume the mask: silent resurrection."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        delete_where,
    )

    root = _build_small(spark, tmp_path)  # 4 files, ids 0..39
    delete_where_merge_on_read(spark, root, SCHEMA, "doc_id", 5, 8)
    # CoW delete with NO stats pruning: touches (and rewrites) all files
    delete_where(spark, root, SCHEMA, "doc_id", 30, 33)
    assert table_state(root)["deletes"] == []  # mask consumed...
    got = {r.doc_id for r in read_table(spark, root, SCHEMA).collect()}
    assert got == {
        i for i in range(40) if not (5 <= i <= 8 or 30 <= i <= 33)
    }, "the copy-on-write rewrite resurrected merge-on-read-deleted rows"


def test_cow_merge_does_not_duplicate_mor_upserted_keys(spark, tmp_path):
    """The MERGE flavor of the same review bug: a MoR upsert's masked
    old images must not re-surface (as duplicate keys) when a later
    copy-on-write merge rewrites the masked files."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        merge_upsert,
        merge_upsert_merge_on_read,
    )

    root = _build_small(spark, tmp_path, files=2)  # ids 0..19
    up1 = spark.createDataFrame([(5, "FIVE-mor")], SCHEMA).coalesce(1)
    merge_upsert_merge_on_read(spark, root, SCHEMA, up1, "doc_id")
    up2 = spark.createDataFrame([(17, "SEVENTEEN-cow")], SCHEMA).coalesce(1)
    merge_upsert(spark, root, SCHEMA, up2, "doc_id")  # rewrites all files
    rows = read_table(spark, root, SCHEMA).collect()
    by_id: dict = {}
    for r in rows:
        assert r.doc_id not in by_id, f"duplicate key {r.doc_id}"
        by_id[r.doc_id] = r.text
    assert by_id[5] == "FIVE-mor" and by_id[17] == "SEVENTEEN-cow"
    assert len(by_id) == 20


def test_late_schema_tracking_on_partitioned_table(spark, tmp_path):
    """Review-found (r13): initializing schema tracking on a table
    that already holds hive-partitioned files must exclude the
    physically-absent partition columns from those files' pinned
    mappings (or the column reads NULL) and re-key their name-keyed
    tuples to the new field ids (or pruning dies)."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        partition_pruned_files,
        read_evolved,
        rename_column,
    )

    root = str(tmp_path / "t")
    df = spark.createDataFrame(PROWS, PSCHEMA).coalesce(1)
    append_batch(df, root, 0, partition_by=("lang",))  # untracked
    df2 = spark.createDataFrame(
        [(100, "it", "late")], PSCHEMA
    ).coalesce(1)
    append_batch(df2, root, 1, track_schema=True)  # tracking starts NOW

    got = {
        (r.doc_id, r.lang)
        for r in read_evolved(spark, root).collect()
    }
    assert got == {(i, lang) for i, lang, _ in PROWS} | {(100, "it")}, (
        "pre-tracking partitioned files lost their partition values"
    )
    name, _ = read_manifest(root)
    kept, total = partition_pruned_files(root, name, {"lang": "en"})
    # 2 kept: the en partition file + batch 1's UNpartitioned file
    # (no tuple -> conservatively kept, correctly)
    assert total == 5 and len(kept) == 2
    # and the tuples are id-keyed now: a rename keeps pruning alive
    rename_column(root, "lang", "language")
    name, _ = read_manifest(root)
    kept, _ = partition_pruned_files(root, name, {"language": "en"})
    assert len(kept) == 2


def test_compact_materializes_masks_even_at_file_target(spark, tmp_path):
    """Review-found (r13): compact is the documented mask
    materialization point, so it must rewrite mask-referenced groups
    even when every group already meets its file target — otherwise a
    single-file table's mask is stranded forever and export_manifest's
    'compact first' remedy is a dead end."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        export_manifest,
    )

    root = _build_small(spark, tmp_path, files=1)  # ONE file, ids 0..9
    delete_where_merge_on_read(spark, root, SCHEMA, "doc_id", 3, 5)
    reduced = compact(spark, root, SCHEMA, target_files=1)
    assert reduced == 0  # no file-count change...
    assert table_state(root)["deletes"] == [], (
        "...but the mask must be materialized and consumed"
    )
    got = {r.doc_id for r in read_table(spark, root, SCHEMA).collect()}
    assert got == {i for i in range(10) if not 3 <= i <= 5}
    assert len(export_manifest(root)) == 1  # the remedy works now


def test_mor_delete_rebases_over_blind_append(spark, tmp_path):
    """Logical conflict detection (Delta's write-serializable rule):
    a merge-on-read delete racing a BLIND APPEND auto-rebases — its
    position entries reference files nobody rewrote — and both commits
    survive; the appended rows, being after the delete's snapshot, are
    NOT subject to its predicate (snapshot semantics)."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources import (
        maintenance as m,
    )

    root = _build_small(spark, tmp_path, files=2)  # ids 0..19
    appended = spark.createDataFrame(
        [(13, "appended-13-after-snapshot")], SCHEMA
    ).coalesce(1)

    # interleave an append between the victim scan and the commit by
    # hooking the commit primitive's first attempt
    real = m._commit_delta
    state = {"fired": False}

    def hooked(root_, base, note, **kw):
        if not state["fired"] and note.startswith("merge-on-read delete"):
            state["fired"] = True
            append_batch(appended, root_, 99)
        return real(root_, base, note, **kw)

    m._commit_delta = hooked
    try:
        name, n = m.delete_where_merge_on_read(
            spark, root, SCHEMA, "doc_id", 10, 15, stats_col="doc_id"
        )
    finally:
        m._commit_delta = real
    assert state["fired"] and n == 6
    got = {
        (r.doc_id, r.text)
        for r in read_table(spark, root, SCHEMA).collect()
    }
    expect = {(i, f"r{i}") for i in range(20) if not 10 <= i <= 15}
    expect.add((13, "appended-13-after-snapshot"))  # post-snapshot row
    assert got == expect


def test_mor_delete_conflicts_against_interleaved_rewrite(spark, tmp_path):
    """A rewrite in the interleave (compact) invalidates the mask's
    position entries — the conflict must SURFACE, never silently
    commit a mask referencing removed files."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources import (
        maintenance as m,
    )
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        CommitConflict,
    )

    root = _build_small(spark, tmp_path, files=3)
    real = m._commit_delta
    state = {"fired": False}

    def hooked(root_, base, note, **kw):
        if not state["fired"] and note.startswith("merge-on-read delete"):
            state["fired"] = True
            compact(spark, root_, SCHEMA, target_files=1)
        return real(root_, base, note, **kw)

    m._commit_delta = hooked
    try:
        with pytest.raises(CommitConflict):
            m.delete_where_merge_on_read(
                spark, root, SCHEMA, "doc_id", 5, 8, stats_col="doc_id"
            )
    finally:
        m._commit_delta = real
    assert state["fired"]
    # the table is intact: the compact won, no mask was committed
    assert table_state(root)["deletes"] == []
    got = {r.doc_id for r in read_table(spark, root, SCHEMA).collect()}
    assert got == set(range(30))


def test_mor_delete_on_partitioned_table_composes(spark, tmp_path):
    """The round's features compose: a hive-partitioned table takes a
    merge-on-read delete (the victim scan must re-attach partition
    literals to evaluate the predicate AND carry row positions), the
    partition-pruned read applies the mask, and a later compact both
    materializes the mask and keeps per-partition tuples."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        delete_where_merge_on_read,
        partition_pruned_files,
    )

    root = str(tmp_path / "t")
    schema = "doc_id long, lang string, text string"
    rows = [
        (i, ["en", "de", "fr"][i % 3], f"r{i}") for i in range(30)
    ]
    for b in (0, 1):  # two appends -> 2 files per partition
        df = spark.createDataFrame(
            [r for r in rows if (r[0] // 15) == b], schema
        ).coalesce(1)
        append_batch(df, root, b, partition_by=("lang",),
                     stats_col="doc_id")

    _, n = delete_where_merge_on_read(spark, root, schema, "doc_id", 9, 14)
    assert n == 6
    name, live = read_manifest(root)
    assert len(live) == 6  # 3 partitions x 2 appends
    kept, total = partition_pruned_files(root, name, {"lang": "de"})
    assert total == 6 and len(kept) == 2

    got = {
        r.doc_id
        for r in read_table(
            spark, root, schema, where_partition={"lang": "de"}
        ).collect()
    }
    assert got == {i for i in range(30) if i % 3 == 1 and not 9 <= i <= 14}
    # compact materializes the mask per partition group (2 -> 1 each)
    assert compact(spark, root, schema, target_files=1) == 3
    st = table_state(root)
    assert st["deletes"] == []
    got2 = {
        (r.doc_id, r.lang)
        for r in read_table(spark, root, schema).collect()
    }
    assert got2 == {
        (i, ["en", "de", "fr"][i % 3])
        for i in range(30)
        if not 9 <= i <= 14
    }


# --- Shallow clone / snapshot export (VERDICT r12 task 6) ------------


def test_shallow_clone_reads_equal_and_is_independent(spark, tmp_path):
    """A clone at a version reads byte-identically to that snapshot
    WITHOUT copying data; appends to the clone never touch the source,
    and the source keeps evolving without affecting the clone."""
    import os

    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        clone_table,
        export_manifest,
    )

    src = _build_small(spark, tmp_path)
    dst = str(tmp_path / "clone")
    clone_table(src, dst)
    src_rows = {r.doc_id for r in read_table(spark, src, SCHEMA).collect()}
    assert {
        r.doc_id for r in read_table(spark, dst, SCHEMA).collect()
    } == src_rows
    # zero-copy: the clone's data dir holds nothing yet
    assert not pathlib.Path(dst, "data").exists()
    src_files_before = {
        p.name: p.stat().st_mtime_ns
        for p in pathlib.Path(src, "data").iterdir()
    }

    # divergence: clone gains rows, source gains different rows
    df = spark.createDataFrame([(100, "clone-only")], SCHEMA).coalesce(1)
    append_batch(df, dst, 99)
    df2 = spark.createDataFrame([(200, "src-only")], SCHEMA).coalesce(1)
    append_batch(df2, src, 99)
    assert {
        r.doc_id for r in read_table(spark, dst, SCHEMA).collect()
    } == src_rows | {100}
    assert {
        r.doc_id for r in read_table(spark, src, SCHEMA).collect()
    } == src_rows | {200}
    # the source's original files are untouched by the clone's write
    src_files_after = {
        p.name: p.stat().st_mtime_ns
        for p in pathlib.Path(src, "data").iterdir()
        if not p.name.startswith("b00000099")
    }
    assert src_files_after == src_files_before
    # export: absolute paths, resolvable, spanning both tables' data
    paths = export_manifest(dst)
    assert all(os.path.isabs(p) and pathlib.Path(p).exists() for p in paths)
    roots = {pathlib.Path(p).parent for p in paths}
    assert pathlib.Path(src, "data") in roots
    assert pathlib.Path(dst, "data") in roots


def test_clone_compact_self_contains_and_survives_source_vacuum(
    spark, tmp_path
):
    """compact on a clone replaces every external reference with local
    files — the documented escape from the source-retention coupling:
    afterwards the SOURCE can be vacuumed away entirely and the clone
    still reads."""
    import shutil

    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        clone_table,
        table_state,
    )

    src = _build_small(spark, tmp_path)
    dst = str(tmp_path / "clone")
    clone_table(src, dst)
    reduced = compact(spark, dst, SCHEMA, target_files=1)
    assert reduced > 0
    st = table_state(dst)
    assert st["external"] == {}, "compact must self-contain the clone"
    shutil.rmtree(src)  # the source disappears wholesale
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources import (
        maintenance as m,
    )

    m._STATE_CACHE.clear()
    assert {
        r.doc_id for r in read_table(spark, dst, SCHEMA).collect()
    } == set(range(40))


def test_clone_carries_pending_mor_deletes(spark, tmp_path):
    """A clone of a version with pending position deletes must apply
    them (the delete files ride as external references), and a flat
    export must REFUSE (it would resurrect the deleted rows)."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        clone_table,
        export_manifest,
    )

    src = _build_small(spark, tmp_path)
    delete_where_merge_on_read(spark, src, SCHEMA, "doc_id", 13, 27)
    dst = str(tmp_path / "clone")
    clone_table(src, dst)
    got = {r.doc_id for r in read_table(spark, dst, SCHEMA).collect()}
    assert got == {i for i in range(40) if not 13 <= i <= 27}
    with pytest.raises(ValueError, match="resurrect"):
        export_manifest(dst)
    # compact materializes, then export works
    compact(spark, dst, SCHEMA, target_files=1)
    assert len(export_manifest(dst)) == 1


def test_relative_clone_survives_bundle_relocation(spark, tmp_path):
    """paths='relative' stores references relative to the clone's
    root: a directory holding BOTH tables stays readable after being
    moved wholesale (the release-bundle shape; absolute refs would
    dangle)."""
    import shutil

    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        clone_table,
    )

    bundle = tmp_path / "bundle"
    src = str(bundle / "src")
    for i in range(2):
        df = spark.createDataFrame(
            [(10 * i + j, f"r{10 * i + j}") for j in range(5)], SCHEMA
        ).coalesce(1)
        append_batch(df, src, i)
    clone_table(src, str(bundle / "clone"), paths="relative")

    moved = tmp_path / "released"
    shutil.move(str(bundle), str(moved))
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources import (
        maintenance as m,
    )

    m._STATE_CACHE.clear()
    got = {
        r.doc_id
        for r in read_table(spark, str(moved / "clone"), SCHEMA).collect()
    }
    assert got == set(range(5)) | set(range(10, 15))


# --- Hive partition columns (VERDICT r12 task 5) ----------------------

PSCHEMA = "doc_id long, lang string, text string"
PROWS = [
    (i, lang, f"r{i}")
    for i, lang in enumerate(["en", "en", "de", "de", "fr", None])
]


def _build_partitioned(spark, tmp_path, *, track=False):
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        partition_pruned_files,
    )

    root = str(tmp_path / "t")
    df = spark.createDataFrame(PROWS, PSCHEMA).coalesce(1)
    append_batch(
        df, root, 0, partition_by=("lang",), stats_col="doc_id",
        track_schema=track,
    )
    name, live = read_manifest(root)
    # one file per partition value (en/de/fr/NULL)
    assert len(live) == 4
    return root, name, partition_pruned_files


def test_partitioned_append_prunes_and_reads(spark, tmp_path):
    """Partition tuples land in the manifest and prune files BEFORE
    the scan plans; the re-attached literal column makes the read
    complete (hive layout strips partition columns from the files)."""
    root, name, ppf = _build_partitioned(spark, tmp_path)

    kept, total = ppf(root, name, {"lang": "en"})
    assert total == 4 and len(kept) == 1
    got = {
        (r.doc_id, r.lang, r.text)
        for r in read_table(
            spark, root, PSCHEMA, where_partition={"lang": "en"}
        ).collect()
    }
    assert got == {(0, "en", "r0"), (1, "en", "r1")}
    # NULL partition: hive's default-partition token round-trips
    kept_null, _ = ppf(root, name, {"lang": None})
    assert len(kept_null) == 1
    got_null = {
        (r.doc_id, r.lang)
        for r in read_table(
            spark, root, PSCHEMA, where_partition={"lang": None}
        ).collect()
    }
    assert got_null == {(5, None)}
    # composition with a stats range read: both prunings apply
    got2 = {
        r.doc_id
        for r in read_table(
            spark, root, PSCHEMA,
            where_partition={"lang": "de"},
            where_between=("doc_id", 0, 2),
        ).collect()
    }
    assert got2 == {2}
    # and the unpruned read returns everything, literals included
    all_rows = {
        (r.doc_id, r.lang)
        for r in read_table(spark, root, PSCHEMA).collect()
    }
    assert all_rows == {(i, lang) for i, lang, _ in PROWS}


def test_partition_column_rename_keeps_pruning(spark, tmp_path):
    """The spicy case partition specs exist for: on a schema-tracked
    table the tuple is FIELD-ID-keyed, so renaming the partition
    column is metadata-only and pruning under the NEW name still
    drops files."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        read_evolved,
    )

    root, name, ppf = _build_partitioned(spark, tmp_path, track=True)
    rename_column(root, "lang", "language")
    name, _ = read_manifest(root)

    kept, total = ppf(root, name, {"language": "fr"})
    assert total == 4 and len(kept) == 1
    got = {
        (r.doc_id, r.language, r.text)
        for r in read_evolved(
            spark, root, where_partition={"language": "fr"}
        ).collect()
    }
    assert got == {(4, "fr", "r4")}
    # the old name resolves to nothing: no file carries a `lang` key
    # anymore under the current schema, so pruning keeps all 4
    # conservatively and the row filter would then fail on a missing
    # column — exactly a user error, not silent wrong data
    kept_old, _ = ppf(root, name, {"lang": "fr"})
    assert len(kept_old) == 4


def test_export_refuses_partitioned_tables(spark, tmp_path):
    """Review-found (r13): hive-adopted files do not physically repeat
    the partition columns — a flat path export would silently DROP
    those columns for an external consumer. Refuse loudly, like the
    pending-deletes case."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        export_manifest,
    )

    root, _, _ = _build_partitioned(spark, tmp_path)
    with pytest.raises(ValueError, match="partition"):
        export_manifest(root)


def test_clone_of_partitioned_table_keeps_tuples(spark, tmp_path):
    """A shallow clone of a partitioned table carries the partition
    tuples in its full-snapshot manifest: pruned reads on the clone
    keep working and literals re-attach."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        clone_table,
        partition_pruned_files,
    )

    root, _, _ = _build_partitioned(spark, tmp_path)
    dst = str(tmp_path / "clone")
    clone_table(root, dst)
    name, _ = read_manifest(dst)
    kept, total = partition_pruned_files(dst, name, {"lang": "en"})
    assert total == 4 and len(kept) == 1
    got = {
        (r.doc_id, r.lang)
        for r in read_table(
            spark, dst, PSCHEMA, where_partition={"lang": "en"}
        ).collect()
    }
    assert got == {(0, "en"), (1, "en")}


def test_partitioned_compact_preserves_pruning(spark, tmp_path):
    """Compaction rewrites PER PARTITION GROUP and re-records each
    group's tuple, so partition pruning survives it (a naive rewrite
    across partitions would merge tuples and kill pruning)."""
    root = str(tmp_path / "t")
    for b in range(3):  # 3 appends × 3 langs = 9 files
        df = spark.createDataFrame(
            [(10 * b + i, lang, f"r{10 * b + i}")
             for i, lang in enumerate(["en", "de", "fr"])],
            PSCHEMA,
        ).coalesce(1)
        append_batch(df, root, b, partition_by=("lang",))
    _, live = read_manifest(root)
    assert len(live) == 9
    reduced = compact(spark, root, PSCHEMA, target_files=1)
    assert reduced == 6, "3 per-partition rewrites of 3 files -> 1 each"
    name, live = read_manifest(root)
    assert len(live) == 3
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        partition_pruned_files,
    )

    kept, total = partition_pruned_files(root, name, {"lang": "de"})
    assert total == 3 and len(kept) == 1
    got = {
        r.doc_id
        for r in read_table(
            spark, root, PSCHEMA, where_partition={"lang": "de"}
        ).collect()
    }
    assert got == {1, 11, 21}
    vacuum(root)
    assert {
        r.doc_id
        for r in read_table(spark, root, PSCHEMA).collect()
    } == {10 * b + i for b in range(3) for i in range(3)}


def test_partially_consumed_mask_is_not_stranded(spark, tmp_path):
    """ADVICE r13 (medium): a mask spanning files A and B survives a
    stats-pruned rewrite of A alone (B's entries still apply) but
    keeps a DEAD ref to A. The subset test must run on live refs only
    — otherwise a later rewrite of B can never satisfy
    refs <= rewritten (A is gone from every future commit's removes)
    and the mask is stranded forever: every read pays the anti-join
    and export_manifest permanently refuses."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        delete_where,
    )

    root = _build_small(spark, tmp_path)  # 4 files: 0-9/10-19/20-29/30-39
    # mask spans files 0 and 1
    delete_where_merge_on_read(
        spark, root, SCHEMA, "doc_id", 5, 15, stats_col="doc_id"
    )
    assert len(table_state(root)["deletes"]) == 1
    # stats-pruned CoW rewrite of file 0 only: mask survives (its file-1
    # entries still apply) but its file-0 ref is now dead
    delete_where(spark, root, SCHEMA, "doc_id", 0, 2, stats_col="doc_id")
    assert len(table_state(root)["deletes"]) == 1
    # stats-pruned CoW rewrite of file 1: every LIVE ref of the mask is
    # now rewritten — the mask must be consumed despite the dead ref
    delete_where(spark, root, SCHEMA, "doc_id", 17, 19, stats_col="doc_id")
    assert table_state(root)["deletes"] == [], (
        "mask with a dead ref was stranded after its last live ref "
        "was rewritten"
    )
    got = {r.doc_id for r in read_table(spark, root, SCHEMA).collect()}
    assert got == {3, 4, 16} | set(range(20, 40))
    # the consumed delete file is vacuumable and reads stay correct
    vacuum(root)
    assert {
        r.doc_id for r in read_table(spark, root, SCHEMA).collect()
    } == got


def test_compact_clears_all_dead_masks(spark, tmp_path):
    """A mask whose EVERY ref is dead (legacy stranding, or a raw
    delta that removed its files without consuming it) is pure dead
    weight: compact must clear it with a metadata-only commit even
    when no rewrite group needs work, so export_manifest's
    'compact first' prescription actually terminates."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        _adopt,
        export_manifest,
    )

    root = _build_small(spark, tmp_path, files=2)  # 0-9 / 10-19
    delete_where_merge_on_read(
        spark, root, SCHEMA, "doc_id", 5, 15, stats_col="doc_id"
    )
    cur, live = read_manifest(root)
    # simulate the pre-fix stranded state: a raw rewrite commit that
    # replaces BOTH masked files but does not consume the mask
    staging = pathlib.Path(root, ".legacy-rewrite")
    spark.createDataFrame(
        [(i, f"r{i}") for i in list(range(5)) + list(range(16, 20))],
        SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(str(staging))
    adopted = _adopt(staging, pathlib.Path(root, "data"), "legacy")
    cur = _commit_delta(
        root, cur, "legacy rewrite that strands the mask",
        adds=adopted, removes=list(live),
    )
    st = table_state(root)
    assert len(st["deletes"]) == 1 and len(st["files"]) == 1
    # single live file, mask refs all dead: compact has no rewrite to
    # do but must still clear the dead mask
    assert compact(spark, root, SCHEMA, target_files=1) == 0
    assert table_state(root)["deletes"] == [], (
        "compact left an all-dead mask in the manifest"
    )
    got = {r.doc_id for r in read_table(spark, root, SCHEMA).collect()}
    assert got == set(range(5)) | set(range(16, 20))
    # the prescription now terminates: export works post-compact
    assert export_manifest(root)


def test_compact_clears_dead_masks_multifile_noop(spark, tmp_path):
    """Same dead-mask clearing when several live files exist but no
    group is below its file target (the adopted_all-empty path)."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        _adopt,
    )

    root = _build_small(spark, tmp_path, files=3)  # 0-9 / 10-19 / 20-29
    delete_where_merge_on_read(
        spark, root, SCHEMA, "doc_id", 5, 15, stats_col="doc_id"
    )
    cur, live = read_manifest(root)
    masked_two = [f for f in live][:2]
    staging = pathlib.Path(root, ".legacy-rewrite")
    spark.createDataFrame(
        [(i, f"r{i}") for i in list(range(5)) + list(range(16, 20))],
        SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(str(staging))
    adopted = _adopt(staging, pathlib.Path(root, "data"), "legacy")
    _commit_delta(
        root, cur, "legacy rewrite that strands the mask",
        adds=adopted, removes=masked_two,
    )
    st = table_state(root)
    assert len(st["deletes"]) == 1 and len(st["files"]) == 2
    # both live files already meet target_files=2: nothing to rewrite,
    # but the dead mask must still be cleared
    assert compact(spark, root, SCHEMA, target_files=2) == 0
    assert table_state(root)["deletes"] == []
    got = {r.doc_id for r in read_table(spark, root, SCHEMA).collect()}
    assert got == set(range(5)) | set(range(16, 30))


def test_mor_rebase_refuses_schema_evolution_interleave(spark, tmp_path):
    """ADVICE r13: schema-evolution commits carry only columns /
    next_field_id deltas, so the additive-interleave check used to
    auto-rebase a merge-on-read commit across a concurrent widen —
    pinning the post-widen identity colmap onto pre-widen data files.
    An interleaved evolution must surface CommitConflict instead."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        _additive_interleave,
        _commit_mor,
        CommitConflict,
        widen_column,
    )

    root = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 2, "en"), (2, 3, "de")],
                               "doc_id bigint, n int, lang string")
    append_batch(df.coalesce(1), root, 0, track_schema=True)
    base, _ = read_manifest(root)

    # blind append: still additive, rebase allowed
    append_batch(df.coalesce(1), root, 1, track_schema=True)
    head, _ = read_manifest(root)
    assert _additive_interleave(root, base, head) is True

    # widen interleaves: NOT additive
    widen_column(root, "n", "bigint")
    head2, _ = read_manifest(root)
    assert _additive_interleave(root, base, head2) is False
    with pytest.raises(CommitConflict):
        _commit_mor(root, base, "mor across widen",
                    delete_adds=["pd-phantom.parquet"])


# --- Equality deletes (Iceberg v2, round 14) --------------------------


def test_eq_delete_scans_zero_files_and_masks(spark, tmp_path):
    """The equality-delete contract: the commit carries ONLY an
    eq_delete_adds entry — no data-file adds/removes, no position
    file, no victim scan — while reads subtract matching keys from
    files older than the delete."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        delete_by_key,
    )

    root = _build_small(spark, tmp_path)  # 4 files: 0-9/.../30-39
    keys = spark.createDataFrame([(5,), (17,), (33,)], "doc_id long")
    name, n = delete_by_key(spark, root, SCHEMA, "doc_id", keys)
    assert n == 3
    doc = json.loads(pathlib.Path(root, "manifests", name).read_text())
    assert "adds" not in doc and "removes" not in doc
    assert "delete_adds" not in doc
    assert len(doc["eq_delete_adds"]) == 1
    got = {r.doc_id for r in read_table(spark, root, SCHEMA).collect()}
    assert got == set(range(40)) - {5, 17, 33}
    st = table_state(root)
    assert len(st["eq_deletes"]) == 1 and st["deletes"] == []


def test_eq_delete_sequence_rule_reinsert_visible(spark, tmp_path):
    """The data-sequence-number rule: an equality delete masks rows
    ONLY in files strictly older than it — a key re-appended after
    the delete is visible, and stacked deletes each apply to their
    own past."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        delete_by_key,
    )

    root = _build_small(spark, tmp_path, files=2)  # 0-9 / 10-19
    keys = spark.createDataFrame([(5,), (15,)], "doc_id long")
    delete_by_key(spark, root, SCHEMA, "doc_id", keys)
    # re-insert key 5 AFTER the delete: must be visible
    append_batch(
        spark.createDataFrame([(5, "reborn")], SCHEMA).coalesce(1),
        root, 50,
    )
    got = {
        (r.doc_id, r.text)
        for r in read_table(spark, root, SCHEMA).collect()
        if r.doc_id in (5, 15)
    }
    assert got == {(5, "reborn")}
    # a SECOND delete of key 5 masks the re-insert too (it is older
    # than the new delete)
    delete_by_key(
        spark, root, SCHEMA, "doc_id",
        spark.createDataFrame([(5,)], "doc_id long"),
    )
    got2 = {r.doc_id for r in read_table(spark, root, SCHEMA).collect()}
    assert 5 not in got2 and 15 not in got2
    assert len(got2) == 18


def test_eq_upsert_matches_cow_merge_contract(spark, tmp_path):
    """Two strategies, one contract: merge_upsert_equality (zero base
    reads) must produce the same visible table as copy-on-write
    merge_upsert applying the identical update batch — post-images
    visible in the SAME commit, old images masked."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        merge_upsert,
        merge_upsert_equality,
    )

    updates = [(7, "u7"), (13, "u13"), (99, "new99")]
    roots = []
    for sub, verb in (("cow", merge_upsert), ("eq", merge_upsert_equality)):
        root = _build_small(spark, tmp_path / sub)
        udf_ = spark.createDataFrame(updates, SCHEMA)
        verb(spark, root, SCHEMA, udf_, "doc_id", stats_col="doc_id")
        roots.append(root)
    got = [
        {(r.doc_id, r.text)
         for r in read_table(spark, r_, SCHEMA).collect()}
        for r_ in roots
    ]
    assert got[0] == got[1]
    assert (99, "new99") in got[0] and (7, "u7") in got[0]
    # the equality form's commit touched no data file and scanned no
    # victim positions
    name, _ = read_manifest(roots[1])
    doc = json.loads(
        pathlib.Path(roots[1], "manifests", name).read_text()
    )
    assert "removes" not in doc and "delete_adds" not in doc
    assert doc.get("eq_delete_adds") and doc.get("adds")


def test_eq_delete_compact_materializes_and_consumes(spark, tmp_path):
    """Compaction applies and consumes equality deletes like position
    deletes: the replacement version carries none, reads stay stable,
    vacuum collects the consumed delete file."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        delete_by_key,
        export_manifest,
    )

    root = _build_small(spark, tmp_path)
    delete_by_key(
        spark, root, SCHEMA, "doc_id",
        spark.createDataFrame([(i,) for i in range(13, 28)], "doc_id long"),
    )
    with pytest.raises(ValueError, match="pending merge-on-read"):
        export_manifest(root)
    assert compact(spark, root, SCHEMA, target_files=1) > 0
    st = table_state(root)
    assert st["eq_deletes"] == {} and st["deletes"] == []
    got = {r.doc_id for r in read_table(spark, root, SCHEMA).collect()}
    assert got == {i for i in range(40) if not 13 <= i <= 27}
    removed = vacuum(root)
    assert removed >= 5  # 4 data files + 1 eq-delete file
    assert {
        r.doc_id for r in read_table(spark, root, SCHEMA).collect()
    } == got
    assert export_manifest(root)


def test_eq_delete_partial_rewrite_consumption(spark, tmp_path):
    """A band rewrite consumes an equality delete only when every
    live file OLDER than it was rewritten; until then the delete
    stays (its keys may still mask surviving older files)."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        delete_by_key,
        delete_where,
    )

    root = _build_small(spark, tmp_path, files=3)  # 0-9/10-19/20-29
    delete_by_key(
        spark, root, SCHEMA, "doc_id",
        spark.createDataFrame([(5,), (25,)], "doc_id long"),
    )
    # rewrite file 0 only: the delete must survive (files 1, 2 older)
    delete_where(spark, root, SCHEMA, "doc_id", 0, 2, stats_col="doc_id")
    assert len(table_state(root)["eq_deletes"]) == 1
    # rewrite files 1 and 2: every older live file rewritten → consumed
    delete_where(spark, root, SCHEMA, "doc_id", 11, 28, stats_col="doc_id")
    assert table_state(root)["eq_deletes"] == {}
    got = {r.doc_id for r in read_table(spark, root, SCHEMA).collect()}
    assert got == set(range(30)) - {0, 1, 2, 5} - set(range(11, 29))


def test_eq_delete_checkpoint_roundtrip(spark, tmp_path):
    """seq_added and eq-delete metadata survive the parquet
    checkpoint: a reader restarting from the checkpoint applies the
    same masks (including the strictly-older rule) as a full replay."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        delete_by_key,
    )

    root = _build_small(spark, tmp_path, files=2)
    delete_by_key(
        spark, root, SCHEMA, "doc_id",
        spark.createDataFrame([(3,), (12,)], "doc_id long"),
    )
    append_batch(
        spark.createDataFrame([(3, "reborn")], SCHEMA).coalesce(1),
        root, 60,
    )
    name, _ = read_manifest(root)
    write_checkpoint(root, name)
    # drop the state cache so the next read resolves via the checkpoint
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources import (
        maintenance as M,
    )

    with M._STATE_LOCK:
        M._STATE_CACHE.clear()
    st = table_state(root)
    assert len(st["eq_deletes"]) == 1
    assert set(st["seq_added"]) == set(st["files"])
    got = {
        (r.doc_id, r.text)
        for r in read_table(spark, root, SCHEMA).collect()
        if r.doc_id in (3, 12)
    }
    assert got == {(3, "reborn")}


def test_eq_delete_clone_preserves_sequence(spark, tmp_path):
    """A shallow clone preserves the RELATIVE order of carried files
    and equality deletes (shifted below the clone's own sequences):
    the clone reads identically, and rows the clone itself appends
    are never masked by a carried delete."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        clone_table,
        delete_by_key,
    )

    src = _build_small(spark, tmp_path / "src", files=2)
    delete_by_key(
        spark, src, SCHEMA, "doc_id",
        spark.createDataFrame([(4,), (14,)], "doc_id long"),
    )
    append_batch(
        spark.createDataFrame([(4, "late")], SCHEMA).coalesce(1), src, 70,
    )
    dst = str(tmp_path / "dst")
    clone_table(src, dst)
    src_rows = {
        (r.doc_id, r.text)
        for r in read_table(spark, src, SCHEMA).collect()
    }
    dst_rows = {
        (r.doc_id, r.text)
        for r in read_table(spark, dst, SCHEMA).collect()
    }
    assert dst_rows == src_rows
    # reusing a batch id the SOURCE already used would shadow the new
    # data behind the carried external reference: refused loudly
    with pytest.raises(ValueError, match="external"):
        append_batch(
            spark.createDataFrame([(14, "x")], SCHEMA).coalesce(1), dst, 0,
        )
    # the clone's own append of a deleted key must be visible
    append_batch(
        spark.createDataFrame([(14, "clone-side")], SCHEMA).coalesce(1),
        dst, 90,
    )
    got = {
        (r.doc_id, r.text)
        for r in read_table(spark, dst, SCHEMA).collect()
        if r.doc_id == 14
    }
    assert got == {(14, "clone-side")}
    # ...and the source is untouched
    assert {
        (r.doc_id, r.text)
        for r in read_table(spark, src, SCHEMA).collect()
    } == src_rows


def test_eq_delete_null_keys_never_match(spark, tmp_path):
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        delete_by_key,
    )

    root = str(tmp_path / "t")
    append_batch(
        spark.createDataFrame(
            [(None, "nullkey"), (1, "one"), (2, "two")], SCHEMA
        ).coalesce(1),
        root, 0,
    )
    # NULL values in the keys frame are dropped before the commit
    name, n = delete_by_key(
        spark, root, SCHEMA, "doc_id",
        spark.createDataFrame([(None,), (1,)], "doc_id long"),
    )
    assert n == 1
    got = {r.text for r in read_table(spark, root, SCHEMA).collect()}
    assert got == {"nullkey", "two"}


def test_eq_delete_changes_feed(spark, tmp_path):
    """The change feed reports equality-deleted rows as deletes and
    the same-commit post-images of an equality upsert as
    updates/inserts — indistinguishable from the other strategies."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        merge_upsert_equality,
    )

    root = _build_small(spark, tmp_path, files=2)
    from_name, _ = read_manifest(root)
    merge_upsert_equality(
        spark, root, SCHEMA,
        spark.createDataFrame([(7, "u7"), (99, "new")], SCHEMA),
        "doc_id",
    )
    feed = changes(spark, root, SCHEMA, "doc_id", from_name).collect()
    got = {(r.doc_id, r._change) for r in feed}
    assert got == {(7, "update_post"), (99, "insert")}


def test_rename_refuses_pending_eq_key(spark, tmp_path):
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        delete_by_key,
    )

    root = str(tmp_path / "t")
    append_batch(
        spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA).coalesce(1),
        root, 0, track_schema=True,
    )
    delete_by_key(
        spark, root, SCHEMA, "doc_id",
        spark.createDataFrame([(1,)], "doc_id long"),
    )
    with pytest.raises(ValueError, match="pending equality deletes"):
        rename_column(root, "doc_id", "id")
    # compact clears the mask, then the rename goes through
    compact(spark, root, SCHEMA, target_files=1)
    rename_column(root, "doc_id", "id")


def test_streaming_upsert_equality_never_scans_base(spark, tmp_path):
    """The streaming CDC shape VERDICT r13 task 3 asks for: a sequence
    of keyed upsert batches applied with merge_upsert_equality — every
    commit is adds + one equality-delete file, NO base-file reads —
    and the final table equals the last-writer-wins recompute."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        merge_upsert_equality,
    )

    root = str(tmp_path / "t")
    batches = [
        [(1, "a0"), (2, "b0"), (3, "c0")],
        [(2, "b1"), (4, "d1")],
        [(1, "a2"), (4, "d2"), (5, "e2")],
        [(3, "c3"), (5, "e3")],
    ]
    for i, rows in enumerate(batches):
        merge_upsert_equality(
            spark, root,
            SCHEMA, spark.createDataFrame(rows, SCHEMA), "doc_id",
        )
        if i > 0:  # every post-bootstrap commit: adds + eq delete only
            name, _ = read_manifest(root)
            doc = json.loads(
                pathlib.Path(root, "manifests", name).read_text()
            )
            assert "removes" not in doc and "delete_adds" not in doc
            assert doc.get("eq_delete_adds") and doc.get("adds")
    # last-writer-wins recompute
    lww: dict[int, str] = {}
    for rows in batches:
        for k, v in rows:
            lww[k] = v
    got = {
        (r.doc_id, r.text)
        for r in read_table(spark, root, SCHEMA).collect()
    }
    assert got == set(lww.items())
    # compaction folds all masks; the table stays LWW-correct
    compact(spark, root, SCHEMA, target_files=1)
    st = table_state(root)
    assert st["eq_deletes"] == {} and st["deletes"] == []
    assert {
        (r.doc_id, r.text)
        for r in read_table(spark, root, SCHEMA).collect()
    } == set(lww.items())


# --- Disjoint-rewrite concurrency (round 14) --------------------------


def _build_partitioned_langs(spark, tmp_path, files_per_lang=3):
    root = str(tmp_path / "pt")
    schema = "doc_id long, lang string, text string"
    n = 0
    for i in range(files_per_lang):
        rows = []
        for lang in ("en", "de"):
            rows += [(n + j, lang, f"{lang}{n + j}") for j in range(4)]
            n += 4
        append_batch(
            spark.createDataFrame(rows, schema).coalesce(1),
            root, i, partition_by=("lang",),
        )
    return root, schema, n


def test_disjoint_partition_compactions_both_commit(spark, tmp_path):
    """VERDICT r13 task 4: two compactions of DISJOINT partition
    groups are serializable — the loser's inputs were untouched by the
    winner, so it auto-rebases and both commits land (no retry storm
    between per-partition compaction jobs)."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources import (
        maintenance as m,
    )

    root, schema, n = _build_partitioned_langs(spark, tmp_path)
    before = {
        (r.doc_id, r.lang, r.text)
        for r in read_table(spark, root, schema).collect()
    }
    real = m._commit_delta
    state = {"fired": False}

    def hooked(root_, base, note, **kw):
        if not state["fired"] and note.startswith("compact"):
            state["fired"] = True
            # the de-compaction lands first, between the en-compaction's
            # rewrite and its commit
            compact(spark, root_, schema, target_files=1,
                    partition={"lang": "de"})
        return real(root_, base, note, **kw)

    m._commit_delta = hooked
    try:
        reduced = compact(spark, root, schema, target_files=1,
                          partition={"lang": "en"})
    finally:
        m._commit_delta = real
    assert state["fired"] and reduced > 0
    # both compactions' outputs are live: one file per lang
    st = table_state(root)
    langs = {}
    for f in st["files"]:
        langs.setdefault(st["parts"][f]["lang"], []).append(f)
    assert {k: len(v) for k, v in langs.items()} == {"en": 1, "de": 1}
    assert {
        (r.doc_id, r.lang, r.text)
        for r in read_table(spark, root, schema).collect()
    } == before


def test_overlapping_compactions_still_conflict(spark, tmp_path):
    """Two rewrites sharing an input file must NOT both commit: the
    loser's output would re-add rows the winner already rewrote."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources import (
        maintenance as m,
    )

    root, schema, n = _build_partitioned_langs(spark, tmp_path)
    before = {
        (r.doc_id, r.lang, r.text)
        for r in read_table(spark, root, schema).collect()
    }
    real = m._commit_delta
    state = {"fired": False}

    def hooked(root_, base, note, **kw):
        if not state["fired"] and note.startswith("compact"):
            state["fired"] = True
            compact(spark, root_, schema, target_files=1,
                    partition={"lang": "en"})  # SAME partition
        return real(root_, base, note, **kw)

    m._commit_delta = hooked
    try:
        with pytest.raises(m.CommitConflict):
            compact(spark, root, schema, target_files=1,
                    partition={"lang": "en"})
    finally:
        m._commit_delta = real
    assert state["fired"]
    # the winner's compaction stands; no row lost or duplicated
    assert {
        (r.doc_id, r.lang, r.text)
        for r in read_table(spark, root, schema).collect()
    } == before


def test_compact_rebases_over_blind_append(spark, tmp_path):
    """A compaction racing a blind append composes: the appended files
    are not in the rewrite's input set, so the loser re-commits and
    the appended rows survive uncompacted."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources import (
        maintenance as m,
    )

    root = _build_small(spark, tmp_path, files=3)
    real = m._commit_delta
    state = {"fired": False}

    def hooked(root_, base, note, **kw):
        if not state["fired"] and note.startswith("compact"):
            state["fired"] = True
            append_batch(
                spark.createDataFrame([(100, "late")], SCHEMA).coalesce(1),
                root_, 77,
            )
        return real(root_, base, note, **kw)

    m._commit_delta = hooked
    try:
        reduced = compact(spark, root, SCHEMA, target_files=1)
    finally:
        m._commit_delta = real
    assert state["fired"] and reduced > 0
    got = {r.doc_id for r in read_table(spark, root, SCHEMA).collect()}
    assert got == set(range(30)) | {100}


def test_compact_conflicts_against_interleaved_eq_delete(spark, tmp_path):
    """An equality delete in the interleave invalidates the rewrite:
    the replacement files would carry a newer sequence and escape the
    mask. The conflict must surface; the caller's re-run then applies
    the mask correctly."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources import (
        maintenance as m,
    )

    root = _build_small(spark, tmp_path, files=2)
    real = m._commit_delta
    state = {"fired": False}

    def hooked(root_, base, note, **kw):
        if not state["fired"] and note.startswith("compact"):
            state["fired"] = True
            m.delete_by_key(
                spark, root_, SCHEMA, "doc_id",
                spark.createDataFrame([(5,)], "doc_id long"),
            )
        return real(root_, base, note, **kw)

    m._commit_delta = hooked
    try:
        with pytest.raises(m.CommitConflict):
            compact(spark, root, SCHEMA, target_files=1)
    finally:
        m._commit_delta = real
    assert state["fired"]
    # the re-run compacts with the mask applied and consumed
    assert compact(spark, root, SCHEMA, target_files=1) > 0
    st = table_state(root)
    assert st["eq_deletes"] == {}
    got = {r.doc_id for r in read_table(spark, root, SCHEMA).collect()}
    assert got == set(range(20)) - {5}


def test_export_hive_bundle_roundtrip(spark, tmp_path):
    """The partitioned release path (VERDICT r13 task 5): every live
    file links into its hive directory, a plain hive-discovery read
    recovers the partition column (including the NULL token), and the
    flat export still refuses the same table."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        export_hive_bundle,
        export_manifest,
    )

    root = str(tmp_path / "t")
    schema = "doc_id long, lang string, text string"
    rows = [
        (1, "en", "a"), (2, "en", "b"), (3, "de", "c"),
        (4, None, "d"),  # hive default-partition token
    ]
    append_batch(
        spark.createDataFrame(rows, schema).coalesce(1),
        root, 0, partition_by=("lang",),
    )
    with pytest.raises(ValueError, match="export_hive_bundle"):
        export_manifest(root)
    dest = str(tmp_path / "bundle")
    made = export_hive_bundle(root, dest)
    assert len(made) == 3  # one file per partition dir
    assert any("lang=en" in p for p in made)
    assert any("__HIVE_DEFAULT_PARTITION__" in p for p in made)
    back = spark.read.option("basePath", dest).parquet(dest)
    got = {
        (r.doc_id, r.lang, r.text)
        for r in back.select("doc_id", "lang", "text").collect()
    }
    assert got == {
        (1, "en", "a"), (2, "en", "b"), (3, "de", "c"), (4, None, "d"),
    }
    # a MIXED layout (a physically-complete unpartitioned append next
    # to hive-adopted files) has no uniform bundle structure: refuse
    append_batch(
        spark.createDataFrame([(9, "fr", "flat")], schema).coalesce(1),
        root, 1,
    )
    with pytest.raises(ValueError, match="mixes"):
        export_hive_bundle(root, str(tmp_path / "b2"))
    # zero-copy: same inode where linking is possible
    import os

    src_dir = pathlib.Path(root, "data")
    linked = [p for p in made if "lang=en" in p]
    assert any(
        os.stat(p).st_ino in {os.stat(s).st_ino for s in src_dir.iterdir()}
        for p in linked
    )


def test_export_hive_bundle_refusals(spark, tmp_path):
    """Pending masks and pre-evolution files refuse with the compact
    prescription; compact clears both refusals."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        delete_where_merge_on_read,
        export_hive_bundle,
        rename_column,
    )

    root = str(tmp_path / "t")
    schema = "doc_id long, lang string, text string"
    append_batch(
        spark.createDataFrame(
            [(1, "en", "a"), (2, "de", "b")], schema
        ).coalesce(1),
        root, 0, partition_by=("lang",), track_schema=True,
    )
    delete_where_merge_on_read(spark, root, schema, "doc_id", 2, 2)
    with pytest.raises(ValueError, match="compact"):
        export_hive_bundle(root, str(tmp_path / "b1"))
    compact(spark, root, schema, target_files=1)
    # rename a NON-partition column: the surviving file was written
    # pre-rename, so a raw link would expose the old physical name
    rename_column(root, "text", "body")
    with pytest.raises(ValueError, match="pre-evolution"):
        export_hive_bundle(root, str(tmp_path / "b2"))
    compact(spark, root, "doc_id long, lang string, body string",
            target_files=1, force=True)
    # the second compact rewrote everything physically COMPLETE (the
    # partition literal is materialized back into the file), so the
    # bundle is uniformly flat — columns in the parquet, no hive dirs
    made = export_hive_bundle(root, str(tmp_path / "b3"))
    assert made and all("lang=" not in p for p in made)
    back = spark.read.parquet(str(tmp_path / "b3"))
    assert {tuple(r) for r in back.select("doc_id", "lang", "body").collect()} \
        == {(1, "en", "a")}


# --- Bloom file skipping (round 14) -----------------------------------


def test_bloom_point_pruning_no_false_negatives(spark, tmp_path):
    """Round-robin layout: ranges keep every file; the bloom keeps the
    containing file for EVERY present key (no false negative — the
    exactness that makes dropping a file safe) and prunes most files
    for most probes."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        point_pruned_files,
        read_point,
    )

    root = str(tmp_path / "t")
    n = 200
    for i in range(4):
        rows = [(j, f"r{j}") for j in range(n) if j % 4 == i]
        append_batch(
            spark.createDataFrame(rows, SCHEMA).coalesce(1),
            root, i, stats_col="doc_id", bloom_col="doc_id",
        )
    name, _ = read_manifest(root)
    total_kept = 0
    # interior probes: every file's round-robin range contains them
    # (edge ids CAN be range-pruned — min/max still composes first)
    for probe in range(4, n - 4, 7):
        kept, mm_kept, total = point_pruned_files(
            root, name, "doc_id", probe
        )
        assert mm_kept == total == 4  # ranges can never prune here
        # no false negative: the containing file always survives
        got = {r.doc_id for r in read_point(
            spark, root, SCHEMA, "doc_id", probe
        ).collect()}
        assert got == {probe}
        total_kept += len(kept)
    # the sketch actually prunes: on average nearly one file per probe
    assert total_kept < 2 * len(range(0, n, 7))
    # an absent key prunes to nothing almost surely (and the read is
    # empty regardless)
    kept, _, _ = point_pruned_files(root, name, "doc_id", 10**9)
    assert read_point(
        spark, root, SCHEMA, "doc_id", 10**9
    ).count() == 0


def test_bloom_rides_checkpoint_and_rename(spark, tmp_path):
    """The sketch lives in the stats relation: it survives the parquet
    checkpoint and FOLLOWS its column through a rename; files without
    a sketch are conservatively kept."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources import (
        maintenance as M,
    )
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        point_pruned_files,
    )

    root = str(tmp_path / "t")
    for i in range(3):
        rows = [(j, f"r{j}") for j in range(90) if j % 3 == i]
        append_batch(
            spark.createDataFrame(rows, SCHEMA).coalesce(1),
            root, i, stats_col="doc_id", bloom_col="doc_id",
            track_schema=(i == 0),
        )
    # one sketchless append: conservatively kept by every probe
    append_batch(
        spark.createDataFrame([(1000, "x")], SCHEMA).coalesce(1), root, 9,
    )
    name, _ = read_manifest(root)
    write_checkpoint(root, name)
    with M._STATE_LOCK:
        M._STATE_CACHE.clear()
    kept, mm, total = point_pruned_files(root, name, "doc_id", 42)
    # the sketchless file carries NO stats: conservatively kept by
    # both stages (pruning never drops what it cannot judge)
    assert total == 4 and mm == 4
    assert "b00000009-00000.snappy.parquet" in kept
    assert len(kept) <= 3
    rename_column(root, "doc_id", "id")
    name2, _ = read_manifest(root)
    kept2, _, _ = point_pruned_files(root, name2, "id", 42)
    assert set(kept2) == set(kept), "bloom must follow the rename"


def test_bloom_is_type_insensitive(spark, tmp_path):
    """SQL-equal probes of different Python types must never be bloom
    false negatives (review-found r14): an int column probed with a
    float (or a numpy scalar) keeps the containing file."""
    import numpy as np

    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        _bloom_build,
        _bloom_contains,
        point_pruned_files,
        read_point,
    )

    b = _bloom_build([1, 2, 3, 100])
    assert _bloom_contains(b, 2.0)
    assert _bloom_contains(b, np.int64(2))
    assert _bloom_contains(b, np.float64(100.0))
    assert not _bloom_contains(b, 4)

    root = str(tmp_path / "t")
    append_batch(
        spark.createDataFrame(
            [(j, f"r{j}") for j in range(10)], SCHEMA
        ).coalesce(1),
        root, 0, stats_col="doc_id", bloom_col="doc_id",
    )
    name, _ = read_manifest(root)
    kept, _, _ = point_pruned_files(root, name, "doc_id", 7.0)
    assert kept, "float probe of a long column must keep the file"
    got = {r.doc_id for r in read_point(
        spark, root, SCHEMA, "doc_id", 7.0
    ).collect()}
    assert got == {7}


def test_export_hive_refuses_type_only_evolution(spark, tmp_path):
    """A widen_column changes only the TYPE: pre-widen files pass the
    name check but must still refuse a raw link (a bundle mixing
    int32/int64 physical encodings of one column breaks the plain
    hive reader; review-found r14)."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        export_hive_bundle,
        widen_column,
    )

    root = str(tmp_path / "t")
    schema = "doc_id bigint, n int, lang string"
    append_batch(
        spark.createDataFrame([(1, 2, "en")], schema).coalesce(1),
        root, 0, partition_by=("lang",), track_schema=True,
    )
    widen_column(root, "n", "bigint")
    with pytest.raises(ValueError, match="pre-evolution"):
        export_hive_bundle(root, str(tmp_path / "b"))
    compact(spark, root, "doc_id bigint, n bigint, lang string",
            target_files=1, force=True)
    made = export_hive_bundle(root, str(tmp_path / "b"))
    assert made


def test_clone_shadow_refusal_leaves_no_orphans(spark, tmp_path):
    """The batch-id collision refusal must unwind its adopt: the local
    bytes would otherwise be unreadable (external wins resolution) and
    unvacuumable (the name is protected) forever."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        clone_table,
    )

    src = _build_small(spark, tmp_path / "src", files=1)
    dst = str(tmp_path / "dst")
    clone_table(src, dst)
    before = set()
    data = pathlib.Path(dst, "data")
    if data.is_dir():
        before = {p.name for p in data.iterdir()}
    with pytest.raises(ValueError, match="external"):
        append_batch(
            spark.createDataFrame([(99, "x")], SCHEMA).coalesce(1), dst, 0,
        )
    after = {p.name for p in data.iterdir()} if data.is_dir() else set()
    assert after == before, f"refusal leaked orphans: {after - before}"


def test_cow_delete_rebases_over_blind_append(spark, tmp_path):
    """Retention deletes and ingest appends run concurrently in
    production: a copy-on-write delete racing a blind append
    auto-rebases (write-serializable — rows appended after the
    snapshot are NOT subject to the predicate), and both commits
    survive."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources import (
        maintenance as m,
    )

    root = _build_small(spark, tmp_path, files=2)  # ids 0..19
    real = m._commit_delta
    state = {"fired": False}

    def hooked(root_, base, note, **kw):
        if not state["fired"] and note.startswith("delete "):
            state["fired"] = True
            append_batch(
                spark.createDataFrame(
                    [(12, "appended-after-snapshot")], SCHEMA
                ).coalesce(1),
                root_, 88,
            )
        return real(root_, base, note, **kw)

    m._commit_delta = hooked
    try:
        _, rewrote, _ = m.delete_where(
            spark, root, SCHEMA, "doc_id", 10, 15, stats_col="doc_id"
        )
    finally:
        m._commit_delta = real
    assert state["fired"] and rewrote == 1
    got = {
        (r.doc_id, r.text)
        for r in read_table(spark, root, SCHEMA).collect()
    }
    expect = {(i, f"r{i}") for i in range(20) if not 10 <= i <= 15}
    expect.add((12, "appended-after-snapshot"))  # post-snapshot row
    assert got == expect


def test_cow_merge_conflicts_against_overlapping_rewrite(spark, tmp_path):
    """A rewrite sharing an input file with a concurrent copy-on-write
    merge must still surface CommitConflict — the loser's output would
    re-add rows the winner rewrote."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources import (
        maintenance as m,
    )

    root = _build_small(spark, tmp_path, files=2)
    before = {
        (r.doc_id, r.text)
        for r in read_table(spark, root, SCHEMA).collect()
    }
    real = m._commit_delta
    state = {"fired": False}

    def hooked(root_, base, note, **kw):
        if not state["fired"] and note.startswith("merge upsert"):
            state["fired"] = True
            compact(spark, root_, SCHEMA, target_files=1)  # overlaps
        return real(root_, base, note, **kw)

    m._commit_delta = hooked
    try:
        with pytest.raises(m.CommitConflict):
            m.merge_upsert(
                spark, root, SCHEMA,
                spark.createDataFrame([(5, "u5")], SCHEMA),
                "doc_id", stats_col="doc_id",
            )
    finally:
        m._commit_delta = real
    assert state["fired"]
    # the compaction won; no row lost or duplicated
    assert {
        (r.doc_id, r.text)
        for r in read_table(spark, root, SCHEMA).collect()
    } == before
