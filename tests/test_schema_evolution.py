"""Schema evolution on the versioned table (VERDICT r11 task 6):
type widening, rename, drop, add as METADATA-ONLY commits with
Iceberg's stable-field-id resolution — files pin their physical
mapping at commit; the logical schema evolves above them.
"""

from __future__ import annotations

import pytest

from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
    add_column,
    append_batch,
    drop_column,
    list_manifests,
    read_evolved,
    read_manifest,
    rename_column,
    table_columns,
    widen_column,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _build(spark, tmp_path):
    """v0: tracked table (doc_id bigint, n int, lang string), 2 rows."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 10, "en"), (2, 20, "de")], "doc_id long, n int, lang string"
    ).coalesce(1)
    append_batch(df, root, 0, track_schema=True)
    return root


def test_widen_rename_add_lifecycle(spark, tmp_path):
    root = _build(spark, tmp_path)
    v0, _ = read_manifest(root)

    widen_column(root, "n", "bigint")
    rename_column(root, "lang", "language")
    add_column(root, "flag", "string")
    new = spark.createDataFrame(
        [(3, 30, "fr", "b")],
        "doc_id long, n bigint, language string, flag string",
    ).coalesce(1)
    append_batch(new, root, 1)

    cur = read_evolved(spark, root)
    # logical schema: widened type, renamed column, appended field
    assert [(f.name, f.dataType.simpleString()) for f in cur.schema.fields] == [
        ("doc_id", "bigint"), ("n", "bigint"),
        ("language", "string"), ("flag", "string"),
    ]
    # old int32 files read through their pinned mapping: values intact,
    # renamed column carries its data, missing field NULL-fills
    assert _rows(cur) == [
        (1, 10, "en", None), (2, 20, "de", None), (3, 30, "fr", "b"),
    ]
    # time travel: v0 still reads under ITS schema — original name and
    # narrow type
    old = read_evolved(spark, root, v0)
    assert [(f.name, f.dataType.simpleString()) for f in old.schema.fields] == [
        ("doc_id", "bigint"), ("n", "int"), ("lang", "string"),
    ]
    assert _rows(old) == [(1, 10, "en"), (2, 20, "de")]
    # every evolution verb committed a version of its own
    assert len(list_manifests(root)) == 5


def test_drop_hides_now_but_survives_time_travel(spark, tmp_path):
    root = _build(spark, tmp_path)
    pre_drop, _ = read_manifest(root)
    drop_column(root, "lang")

    cur = read_evolved(spark, root)
    assert [f.name for f in cur.schema.fields] == ["doc_id", "n"]
    assert _rows(cur) == [(1, 10), (2, 20)]
    # the bytes stayed: the pre-drop snapshot still reads the column
    snap = read_evolved(spark, root, pre_drop)
    assert _rows(snap) == [(1, 10, "en"), (2, 20, "de")]


def test_readded_name_is_a_fresh_field(spark, tmp_path):
    """Ids are never reused: dropping ``lang`` and adding a NEW column
    named ``lang`` must NOT resurrect the dropped bytes — old files
    read NULL for the re-added field (the Iceberg id-freshness rule)."""
    root = _build(spark, tmp_path)
    drop_column(root, "lang")
    add_column(root, "lang", "string")
    cur = read_evolved(spark, root)
    assert _rows(cur) == [(1, 10, None), (2, 20, None)]
    cols = table_columns(root)
    assert [c["name"] for c in cols] == ["doc_id", "n", "lang"]
    assert cols[-1]["id"] == 3  # fresh id, not the dropped field's 2


def test_append_validates_against_current_schema(spark, tmp_path):
    root = _build(spark, tmp_path)
    widen_column(root, "n", "bigint")
    # stale writer still emitting the narrow type: loud, not silent
    stale = spark.createDataFrame(
        [(9, 90, "xx")], "doc_id long, n int, lang string"
    ).coalesce(1)
    with pytest.raises(ValueError, match="does not match"):
        append_batch(stale, root, 7)
    # wrong column name after a rename: same contract
    rename_column(root, "lang", "language")
    misnamed = spark.createDataFrame(
        [(9, 90, "xx")], "doc_id long, n bigint, lang string"
    ).coalesce(1)
    with pytest.raises(ValueError, match="does not match"):
        append_batch(misnamed, root, 8)


def test_evolution_verb_contracts(spark, tmp_path):
    root = _build(spark, tmp_path)
    with pytest.raises(ValueError, match="lossless widenings"):
        widen_column(root, "doc_id", "int")  # narrowing
    with pytest.raises(ValueError, match="no column"):
        widen_column(root, "nope", "bigint")
    with pytest.raises(ValueError, match="already exists"):
        rename_column(root, "lang", "n")
    with pytest.raises(ValueError, match="already exists"):
        add_column(root, "n", "bigint")
    with pytest.raises(ValueError, match="no column"):
        drop_column(root, "nope")
    drop_column(root, "lang")
    drop_column(root, "n")
    with pytest.raises(ValueError, match="last column"):
        drop_column(root, "doc_id")
    # untracked tables refuse the verbs with a pointer to the fix
    untracked = str(tmp_path / "u")
    append_batch(
        spark.createDataFrame([(1, "a")], "k long, v string").coalesce(1),
        untracked, 0,
    )
    with pytest.raises(ValueError, match="track_schema"):
        widen_column(untracked, "k", "bigint")
    with pytest.raises(ValueError, match="use read_table"):
        read_evolved(spark, untracked)


def test_rewrite_verbs_compose_with_evolution(spark, tmp_path):
    """The rewrite verbs are evolution-aware: on a schema-tracked
    table, compact/merge/delete resolve each touched file through its
    pinned field-id mapping instead of a flat caller schema — so they
    keep working AFTER a widen+rename, and compaction doubles as
    physical schema migration (replacement files are written under the
    current logical schema, coalescing historical schema groups)."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        compact,
        delete_where,
        merge_upsert,
        read_manifest,
        table_state,
    )

    root = _build(spark, tmp_path)  # v0: (doc_id, n int, lang), 2 rows
    widen_column(root, "n", "bigint")
    rename_column(root, "lang", "language")
    more = spark.createDataFrame(
        [(3, 30, "fr"), (4, 40, "it")],
        "doc_id long, n bigint, language string",
    ).coalesce(1)
    append_batch(more, root, 1)

    import json as _json

    def _groups(doc, live):
        return {
            _json.dumps(doc["colmap"][f], sort_keys=True) for f in live
        }

    # two historical schema groups before the rewrite, one after
    cur, live = read_manifest(root)
    doc = table_state(root, cur)
    assert len(_groups(doc, live)) == 2
    reduced = compact(spark, root, schema=None, target_files=1)
    assert reduced > 0
    cur, live = read_manifest(root)
    doc = table_state(root, cur)
    groups_after = _groups(doc, live)
    assert len(groups_after) == 1, "compaction must migrate the old group"
    assert _rows(read_evolved(spark, root)) == [
        (1, 10, "en"), (2, 20, "de"), (3, 30, "fr"), (4, 40, "it"),
    ]

    # merge and delete on the evolved table
    upd = spark.createDataFrame(
        [(2, 200, "de2")], "doc_id long, n bigint, language string"
    ).coalesce(1)
    merge_upsert(spark, root, None, upd, "doc_id")
    delete_where(spark, root, None, "doc_id", 4, 4)
    assert _rows(read_evolved(spark, root)) == [
        (1, 10, "en"), (2, 200, "de2"), (3, 30, "fr"),
    ]


# --- Property: any evolution/append sequence reconstructs exactly ---

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# op encodings: ("append", salt) | ("widen",) | ("rename", suffix) |
# ("add", type_code) | ("drop",). The model interprets them against
# its own current schema, so every generated sequence is valid by
# construction.
_evo_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 99)),
        st.tuples(st.just("widen")),
        st.tuples(st.just("rename"), st.integers(0, 9)),
        st.tuples(st.just("add"), st.sampled_from(["int", "bigint", "string"])),
        st.tuples(st.just("drop")),
    ),
    min_size=1,
    max_size=6,
)


@given(ops=_evo_ops)
@_SETTINGS
def test_evolution_reconstructs_model(spark, tmp_path_factory, ops):
    """Field-id resolution as an algebraic property: for ANY sequence
    of appends and evolution verbs, `read_evolved` must equal a pure
    Python model that stores row values BY FIELD ID — so renames
    carry data, widens keep values, drops hide ids, re-adds NULL-fill
    — both at HEAD and at a mid-sequence snapshot (time travel)."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        read_manifest,
    )

    root = str(tmp_path_factory.mktemp("evoprop") / "t")
    # model state: columns as [id, name, type]; rows as {id: value}
    cols = [[0, "k", "bigint"], [1, "a", "int"], [2, "b", "string"]]
    next_id = 3
    rows: list[dict[int, object]] = []
    key = [0]  # unique key counter for appended rows

    def do_append(salt: int) -> None:
        batch = []
        for _ in range(2):
            r = {}
            for cid, name, typ in cols:
                if typ == "string":
                    r[cid] = f"s{(key[0] + salt) % 7}"
                else:
                    r[cid] = key[0] if name == "k" else (key[0] * 3 + salt)
            batch.append(r)
            key[0] += 1
        ddl = ", ".join(f"`{n}` {t}" for _, n, t in cols)
        df = spark.createDataFrame(
            [tuple(r[cid] for cid, _, _ in cols) for r in batch], ddl
        ).coalesce(1)
        append_batch(df, root, key[0], track_schema=True)
        rows.extend(batch)

    do_append(0)  # the table always starts with one tracked commit
    snapshots = []  # (manifest, frozen cols, frozen rows)

    for op in ops:
        if op[0] == "append":
            do_append(op[1])
        elif op[0] == "widen":
            target = next((c for c in cols if c[2] == "int"), None)
            if target is None:
                continue
            widen_column(root, target[1], "bigint")
            target[2] = "bigint"
        elif op[0] == "rename":
            target = cols[op[1] % len(cols)]
            new_name = f"{target[1]}_r{op[1]}"
            if any(c[1] == new_name for c in cols):
                continue
            rename_column(root, target[1], new_name)
            target[1] = new_name
        elif op[0] == "add":
            name = f"c{next_id}"
            add_column(root, name, op[1])
            cols.append([next_id, name, op[1]])
            next_id += 1
        elif op[0] == "drop":
            if len(cols) <= 1:
                continue
            target = cols[-1] if cols[-1][1] != "k" else cols[0]
            drop_column(root, target[1])
            cols.remove(target)
        name, _ = read_manifest(root)
        snapshots.append(
            (name, [list(c) for c in cols], [dict(r) for r in rows])
        )

    def model_rows(mcols, mrows):
        return sorted(
            tuple(r.get(cid) for cid, _, _ in mcols) for r in mrows
        )

    def spark_rows(manifest):
        return sorted(
            tuple(r) for r in read_evolved(spark, root, manifest).collect()
        )

    # HEAD must match the model exactly — names, order, and values
    head = read_evolved(spark, root)
    assert [(f.name, f.dataType.simpleString()) for f in head.schema.fields] \
        == [(n, t) for _, n, t in cols]
    assert sorted(tuple(r) for r in head.collect()) == model_rows(cols, rows)
    # and a mid-sequence snapshot reads under ITS schema (time travel)
    mid = snapshots[len(snapshots) // 2]
    assert spark_rows(mid[0]) == model_rows(mid[1], mid[2])


def test_data_skipping_survives_rename(spark, tmp_path):
    """Manifest stats are name-keyed, so a rename must REKEY each
    file's [min, max] entry to the new name or every later range read
    silently degrades to a full scan — correctness would survive (the
    row predicate still applies) but the pruning contract would not."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        pruned_files,
    )

    root = str(tmp_path / "t")
    for i, ids in enumerate(([0, 5, 9], [10, 15, 19], [20, 25, 29])):
        df = spark.createDataFrame(
            [(j, f"d{j}") for j in ids], "doc_id long, text string"
        ).coalesce(1)
        append_batch(df, root, i, stats_col="doc_id", track_schema=True)

    rename_column(root, "doc_id", "id")
    name, live = read_manifest(root)
    kept, total = pruned_files(root, name, "id", 12, 17)
    assert total == 3 and len(kept) == 1, (
        "rename lost the stats entries — range reads stopped pruning"
    )
    # and the old name no longer prunes anything (entries moved, not
    # duplicated): a query still using it keeps all files conservatively
    kept_old, _ = pruned_files(root, name, "doc_id", 12, 17)
    assert len(kept_old) == 3
    # end-to-end: the evolved range read prunes AND filters correctly
    got = _rows(read_evolved(spark, root, where_between=("id", 12, 17)))
    assert got == [(15, "d15")]


def test_rename_does_not_inherit_dead_column_stats(spark, tmp_path):
    """Review-found (r12): renaming a column ONTO a previously dropped
    column's name must not inherit the dead column's [min, max] — the
    collision would prune the renamed column's range reads with the
    dead column's numbers and silently LOSE rows. drop purges its
    stats entries; rename discards any stale entry under the target
    name before moving its own."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        pruned_files,
    )

    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 150, 2), (2, 160, 3)], "k long, a long, b long"
    ).coalesce(1)
    append_batch(df, root, 0, stats_col=("a", "b"), track_schema=True)
    drop_column(root, "b")
    rename_column(root, "a", "b")

    # the renamed column's range read must see its own data — with the
    # stale [2, 3] entry this pruned the only file and returned NOTHING
    got = _rows(read_evolved(spark, root, where_between=("b", 140, 170)))
    assert got == [(1, 150), (2, 160)]
    name, _ = read_manifest(root)
    kept, total = pruned_files(root, name, "b", 140, 170)
    assert (len(kept), total) == (1, 1)
    # and a disjoint range still prunes (the rekeyed entry is a's)
    kept, _ = pruned_files(root, name, "b", 0, 10)
    assert kept == []


def test_file_with_all_columns_dropped_still_contributes_rows(spark, tmp_path):
    """Review-found (r12): a file sharing NO live field ids with the
    current schema (every column it carried was dropped) must
    NULL-fill its rows, not crash the evolved read with an empty-DDL
    ParseException."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10), (2, 20)], "k long, a long").coalesce(1)
    append_batch(df, root, 0, track_schema=True)
    add_column(root, "c", "string")
    drop_column(root, "k")
    drop_column(root, "a")

    cur = read_evolved(spark, root)
    assert [f.name for f in cur.schema.fields] == ["c"]
    assert _rows(cur) == [(None,), (None,)]
