"""Optimistic-concurrency commit protocol of the versioned table
(`sources/maintenance.py`) — VERDICT r11 task 1.

The reference job is a single MapReduce writer
(HadoopKafkaConsumer.java:138-147 overwrites one output directory);
a table format behind a streaming ingest has CONCURRENT committers
(ingest + compactor + backfill), and the lost-update race — two
writers read version N, both commit N+1, the second silently discards
the first's files — is the failure optimistic concurrency exists to
prevent. These tests pin the protocol: O_EXCL manifest creation is
the commit point, blind appends retry, rewrites surface
CommitConflict, and the CURRENT cache is probe-past-able.
"""

from __future__ import annotations

import json
import pathlib
import threading

import pytest

from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
    CommitConflict,
    _flip,
    append_batch,
    changes,
    delete_where,
    list_manifests,
    read_manifest,
    read_table,
    resolve_as_of,
)

SCHEMA = "doc_id long, text string"


def test_two_writers_same_base_exactly_one_wins(tmp_path):
    """The lost-update race itself: two committers derive the same
    base version and race their commits through a barrier. Exactly one
    O_EXCL manifest creation succeeds; the loser gets CommitConflict
    and the winner's committed file list is intact (never clobbered by
    the loser's write_text, which is what the old protocol did)."""
    root = str(tmp_path / "t")
    _flip(root, ["seed-0.parquet"], "seed", base=None)
    base, _ = read_manifest(root)

    barrier = threading.Barrier(2)
    outcomes: dict[str, object] = {}

    def commit(tag: str) -> None:
        barrier.wait()
        try:
            outcomes[tag] = _flip(
                root, [f"{tag}.parquet", "seed-0.parquet"], tag, base=base
            )
        except CommitConflict as e:
            outcomes[tag] = e

    threads = [
        threading.Thread(target=commit, args=(t,)) for t in ("a", "b")
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    winners = [t for t, o in outcomes.items() if isinstance(o, str)]
    losers = [t for t, o in outcomes.items() if isinstance(o, CommitConflict)]
    assert len(winners) == 1 and len(losers) == 1
    # the committed manifest is the WINNER's, byte-for-byte intact
    name, files = read_manifest(root)
    assert name == outcomes[winners[0]]
    assert f"{winners[0]}.parquet" in files
    assert f"{losers[0]}.parquet" not in files


def test_concurrent_appends_lose_no_committed_batch(spark, tmp_path):
    """Two append writers interleave against one table (each with its
    own batch-id namespace, the multi-writer precondition for staging
    names). Blind appends retry through CommitConflict internally, so
    EVERY batch both writers committed must be present in the final
    version — no lost update at any interleaving."""
    root = str(tmp_path / "t")
    per_writer = 4
    errors: list[BaseException] = []
    start = threading.Barrier(2)

    def writer(wid: int) -> None:
        try:
            start.wait()
            for i in range(per_writer):
                batch_id = wid + 2 * i  # disjoint id namespaces
                df = spark.createDataFrame(
                    [(100 * wid + i, f"w{wid}b{i}")], SCHEMA
                ).coalesce(1)
                append_batch(df, root, batch_id)
        except BaseException as e:  # surfaced below, not swallowed
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    rows = {
        (r.doc_id, r.text)
        for r in read_table(spark, root, SCHEMA).collect()
    }
    expect = {
        (100 * w + i, f"w{w}b{i}") for w in (0, 1) for i in range(per_writer)
    }
    assert rows == expect, "a committed append was lost"
    # every commit landed as its own version: seed-less table, 8 appends
    assert len(list_manifests(root)) == 2 * per_writer


def test_rewrite_against_stale_base_conflicts(tmp_path):
    """A rewrite commit (compact/merge/delete all pass base=) computed
    against a base that another writer has since advanced must raise
    CommitConflict — its output file set omits the interleaved commit,
    so silently winning would drop that commit's rows."""
    root = str(tmp_path / "t")
    _flip(root, ["a.parquet"], "seed", base=None)
    stale_base, _ = read_manifest(root)
    # an interleaved append advances the table
    _flip(root, ["a.parquet", "b.parquet"], "append", base=stale_base)
    with pytest.raises(CommitConflict):
        _flip(root, ["compacted.parquet"], "compact", base=stale_base)
    # and the interleaved commit is still current
    _, files = read_manifest(root)
    assert files == ["a.parquet", "b.parquet"]


def test_current_cache_probe_heals_crash_window(spark, tmp_path):
    """A writer that created its manifest (= committed) but crashed
    before refreshing CURRENT loses nothing: readers probe forward
    from the cache. Simulated by regressing CURRENT to version 0 by
    hand — resolution must still find the latest manifest, and the
    next commit must build on it (not fork the history)."""
    root = str(tmp_path / "t")
    df0 = spark.createDataFrame([(1, "a")], SCHEMA).coalesce(1)
    df1 = spark.createDataFrame([(2, "b")], SCHEMA).coalesce(1)
    append_batch(df0, root, 0)
    append_batch(df1, root, 1)
    latest, files = read_manifest(root)

    # the crash window: cache regressed behind the committed manifest
    pathlib.Path(root, "CURRENT").write_text("m-00000000.json")
    name, got = read_manifest(root)
    assert (name, got) == (latest, files)
    rows = {(r.doc_id, r.text) for r in read_table(spark, root, SCHEMA).collect()}
    assert rows == {(1, "a"), (2, "b")}

    # the next commit extends the probed head, not the stale cache
    df2 = spark.createDataFrame([(3, "c")], SCHEMA).coalesce(1)
    append_batch(df2, root, 2)
    name2, _ = read_manifest(root)
    assert name2 == "m-00000002.json"
    rows = {(r.doc_id, r.text) for r in read_table(spark, root, SCHEMA).collect()}
    assert rows == {(1, "a"), (2, "b"), (3, "c")}


def test_timestamp_as_of_resolution(spark, tmp_path):
    """TIMESTAMP AS OF (VERDICT r11 task 7): each manifest records its
    commit wall-time; a timestamp between commits N and N+1 resolves
    to N, at-or-after the last commit resolves to it, and before the
    first commit raises (Delta/Iceberg timestamp-travel semantics)."""
    root = str(tmp_path / "t")
    for i in range(3):
        df = spark.createDataFrame([(i, f"v{i}")], SCHEMA).coalesce(1)
        append_batch(df, root, i)
    mdir = pathlib.Path(root, "manifests")
    ts = [
        json.loads((mdir / name).read_text())["ts"]
        for name, _ in list_manifests(root)
    ]
    assert ts == sorted(ts)
    # guard: fixture commits are wall-clock-ordered with real gaps
    assert ts[0] < ts[1] < ts[2], "commits landed within timer resolution"

    assert resolve_as_of(root, (ts[0] + ts[1]) / 2) == "m-00000000.json"
    assert resolve_as_of(root, ts[1]) == "m-00000001.json"  # inclusive
    assert resolve_as_of(root, ts[2] + 60.0) == "m-00000002.json"
    with pytest.raises(ValueError):
        resolve_as_of(root, ts[0] - 60.0)


def test_timestamp_as_of_clamps_clock_skew_monotone(tmp_path):
    """ADVICE r12: a committer whose wall clock lags the previous
    writer's must not publish a smaller commit ts — TIMESTAMP AS OF
    would then resolve to a version inconsistent with commit order.
    _flip clamps ts to max(now, base_ts + epsilon) (Delta's in-commit
    timestamp rule). Simulated by doctoring version 0's ts a minute
    into the future: version 1's ts must still land strictly after."""
    import time

    root = str(tmp_path / "t")
    _flip(root, ["a.parquet"], "seed", base=None)
    m0 = pathlib.Path(root, "manifests", "m-00000000.json")
    doc = json.loads(m0.read_text())
    doc["ts"] = time.time() + 60.0  # a fast-clock predecessor
    m0.write_text(json.dumps(doc))
    base, _ = read_manifest(root)
    _flip(root, ["a.parquet", "b.parquet"], "append", base=base)
    ts = [
        json.loads(
            pathlib.Path(root, "manifests", n).read_text()
        )["ts"]
        for n, _ in list_manifests(root)
    ]
    assert ts[1] > ts[0], "commit ts regressed against sequence order"
    # and AS OF at the (future) doctored instant resolves to version 0,
    # never skipping forward past an unreached commit
    assert resolve_as_of(root, ts[0]) == "m-00000000.json"
    assert resolve_as_of(root, ts[1]) == "m-00000001.json"


def test_vacuum_grace_period_spares_inflight_files(spark, tmp_path):
    """ADVICE r12: vacuum races the commit protocol — a concurrent
    writer between adopt and flip has files on disk no manifest
    references yet; a zero-grace vacuum deletes them and the writer's
    later commit publishes a manifest pointing at missing files.
    grace_seconds is the protection: unreferenced files YOUNGER than
    the grace survive, old superseded files still go."""
    import os
    import time

    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        vacuum,
    )

    root = str(tmp_path / "t")
    df0 = spark.createDataFrame([(1, "a")], SCHEMA).coalesce(1)
    df1 = spark.createDataFrame([(2, "b")], SCHEMA).coalesce(1)
    append_batch(df0, root, 0)
    append_batch(df1, root, 1)
    data = pathlib.Path(root, "data")
    # supersede version 1's files entirely (a compaction-shaped flip)
    base, live = read_manifest(root)
    (data / "rewritten.parquet").write_bytes(b"x")
    _flip(root, ["rewritten.parquet"], "compact", base=base)
    # age the superseded files past the grace horizon; an in-flight
    # writer's just-adopted (unreferenced) file stays young
    old = time.time() - 3600
    for f in live:
        os.utime(data / f, (old, old))
    inflight = data / "b00000099-00000.parquet"
    inflight.write_bytes(b"not yet committed")

    removed = vacuum(root, grace_seconds=600)
    assert removed == len(live), "aged superseded files must be vacuumed"
    assert inflight.exists(), (
        "vacuum deleted an in-flight writer's adopted-but-uncommitted "
        "file inside the grace period"
    )
    # zero grace (the documented single-writer mode) removes it
    assert vacuum(root, grace_seconds=0) == 1
    assert not inflight.exists()


def test_changes_null_key_rewrite_is_ballast_not_phantom(spark, tmp_path):
    """ADVICE r11: a NULL-key row carried verbatim through a
    copy-on-write rewrite must reconcile with itself (null-safe join)
    and be dropped as ballast — not emitted as a phantom delete+insert
    pair. delete_where deliberately preserves NULL-key rows, so this
    state is reachable in one step."""
    root = str(tmp_path / "t")
    rows = [(1, "a"), (2, "b"), (4, "x"), (5, "y"), (None, "nullkey")]
    df = spark.createDataFrame(rows, SCHEMA).coalesce(1)
    append_batch(df, root, 0, stats_col="doc_id")
    from_name, _ = read_manifest(root)

    # rewrites the single file; the NULL-key row rides along verbatim
    delete_where(spark, root, SCHEMA, "doc_id", 4, 5, stats_col="doc_id")

    feed = changes(spark, root, SCHEMA, "doc_id", from_name).collect()
    got = {(r.doc_id, r.text, r._change) for r in feed}
    assert got == {(4, "x", "delete"), (5, "y", "delete")}


def test_ingest_races_compactor_no_commit_lost(spark, tmp_path):
    """The production two-writer deployment: an INGEST thread appending
    micro-batches races a COMPACTOR thread looping compact() — the
    rewrite verb whose stale-base commits must conflict, not silently
    drop interleaved appends. The compactor retries through
    CommitConflict like a real table service; afterwards EVERY appended
    row must be present and a final quiesced compaction must succeed
    and bound the file count."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        compact,
    )

    root = str(tmp_path / "t")
    n_batches = 6
    errors: list[BaseException] = []
    done = threading.Event()
    compactions = {"ok": 0, "conflict": 0}

    def ingest() -> None:
        try:
            for i in range(n_batches):
                df = spark.createDataFrame(
                    [(i, f"row{i}")], SCHEMA
                ).coalesce(1)
                append_batch(df, root, i)
        except BaseException as e:
            errors.append(e)
        finally:
            done.set()

    def compactor() -> None:
        try:
            while not done.is_set():
                try:
                    if compact(spark, root, SCHEMA, target_files=1) > 0:
                        compactions["ok"] += 1
                except CommitConflict:
                    compactions["conflict"] += 1  # stale base: retry
        except BaseException as e:
            errors.append(e)

    t_i = threading.Thread(target=ingest)
    t_c = threading.Thread(target=compactor)
    t_i.start(); t_c.start()
    t_i.join(); t_c.join()
    assert not errors, errors

    rows = {
        (r.doc_id, r.text)
        for r in read_table(spark, root, SCHEMA).collect()
    }
    assert rows == {(i, f"row{i}") for i in range(n_batches)}, (
        f"lost a committed append (compactions={compactions})"
    )
    # quiesced: one final compaction settles the table to one file
    compact(spark, root, SCHEMA, target_files=1)
    _, live = read_manifest(root)
    assert len(live) == 1
    final = {
        (r.doc_id, r.text)
        for r in read_table(spark, root, SCHEMA).collect()
    }
    assert final == rows


def test_cross_process_commit_race_loses_nothing(tmp_path):
    """The thread tests share a GIL; real deployments are separate
    PROCESSES (ingest job + compactor service), where the only thing
    serializing commits is the filesystem's create-exclusive guarantee
    itself. Four processes each drive 8 blind-append-style commits
    (read → union own marker file → _flip(base), retry on conflict)
    against one table; afterwards the table must hold all 32 markers
    across exactly 32 committed versions — no lost update under true
    OS-level concurrency."""
    import multiprocessing as mp

    root = str(tmp_path / "t")
    n_workers, n_commits = 4, 8

    ctx = mp.get_context("spawn")
    errors = ctx.Queue()
    procs = [
        ctx.Process(
            target=_commit_worker, args=(root, wid, n_commits, errors)
        )
        for wid in range(n_workers)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(120)
    assert all(p.exitcode == 0 for p in procs), [p.exitcode for p in procs]
    assert errors.empty(), errors.get()

    _, files = read_manifest(root)
    expect = {
        f"w{w}c{i}.parquet" for w in range(n_workers) for i in range(n_commits)
    }
    assert set(files) == expect, "a committed file was lost cross-process"
    assert len(list_manifests(root)) == n_workers * n_commits


def _commit_worker(root: str, wid: int, n_commits: int, errors) -> None:
    """Module-level so the spawn context can pickle it."""
    try:
        from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
            CommitConflict as CC,
        )
        from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
            _flip,
            read_manifest as rm,
        )

        for i in range(n_commits):
            marker = f"w{wid}c{i}.parquet"
            for _ in range(512):
                cur, live = rm(root)
                try:
                    _flip(
                        root, sorted(set(live) | {marker}),
                        f"w{wid} commit {i}", base=cur,
                    )
                    break
                except CC:
                    continue
            else:
                raise RuntimeError(f"w{wid}c{i} starved after 512 races")
    except BaseException as e:  # surfaced by the parent
        errors.put(f"worker {wid}: {type(e).__name__}: {e}")
        raise SystemExit(1)


def test_rewrite_staging_and_names_are_writer_unique(spark, tmp_path):
    """Review-found (r12): two same-verb rewriters at the same base
    must never share a staging dir or adopted file names — a
    deterministic name lets the conflict LOSER overwrite the winner's
    already-committed immutable bytes before its flip raises. Pins the
    nonce in the rewritten names, and races 1 ingester against 2
    compactors with a full content check at the end."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.maintenance import (
        compact,
    )

    root = str(tmp_path / "t")
    for i in range(3):
        df = spark.createDataFrame([(i, f"r{i}")], SCHEMA).coalesce(1)
        append_batch(df, root, i)
    assert compact(spark, root, SCHEMA, target_files=1) > 0
    _, live = read_manifest(root)
    # c{seq}-{8-hex-nonce}-... : unique per writer invocation
    import re

    assert all(re.match(r"c\d{8}-[0-9a-f]{8}-", f) for f in live), live

    # the live race: 2 compactors + 1 ingester; any clobbering of a
    # committed file surfaces as missing/duplicated rows here
    n_more = 5
    errors: list[BaseException] = []
    done = threading.Event()

    def ingest() -> None:
        try:
            for i in range(3, 3 + n_more):
                df = spark.createDataFrame([(i, f"r{i}")], SCHEMA).coalesce(1)
                append_batch(df, root, i)
        except BaseException as e:
            errors.append(e)
        finally:
            done.set()

    def compactor() -> None:
        try:
            while not done.is_set():
                try:
                    compact(spark, root, SCHEMA, target_files=1)
                except CommitConflict:
                    pass
        except BaseException as e:
            errors.append(e)

    threads = [threading.Thread(target=ingest)] + [
        threading.Thread(target=compactor) for _ in range(2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    rows = {
        (r.doc_id, r.text)
        for r in read_table(spark, root, SCHEMA).collect()
    }
    assert rows == {(i, f"r{i}") for i in range(3 + n_more)}
