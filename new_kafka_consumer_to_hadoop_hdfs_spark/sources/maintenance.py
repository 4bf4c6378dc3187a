"""Versioned parquet table: manifest-pointer snapshot isolation for
streaming appends with ONLINE compaction.

The reference's sink is a plain HDFS directory the job overwrites
(HadoopKafkaConsumer.java:96-97,138-147); a *streaming* ingest instead
appends a few small files per micro-batch, and the compaction that
keeps file counts bounded must not create a window where a reader sees
half-rewritten data. Plain parquet directories can't do that —
``mode("overwrite")`` deletes before it writes — so this module
implements the minimal form of the pattern every transactional table
format (Iceberg, Delta, Hudi) is built on:

- data files are immutable and uniquely named under ``root/data/``;
- a MANIFEST (``root/manifests/m-NNNNNNNN.json``) lists the live files
  of one table version;
- ``root/CURRENT`` names the current manifest and is replaced with
  ``os.replace`` — an atomic POSIX rename, so every reader resolves to
  a complete, existing file set: either wholly before or wholly after
  any append/compaction, never between.

Appends ADD files and flip the pointer; compaction rewrites the live
set into ~``target_bytes`` files (``coalesce`` — a narrow rewrite, no
shuffle) and flips the pointer to the replacement set. Superseded
files stay on disk until ``vacuum`` so an in-flight reader holding the
previous manifest still resolves every file (snapshot isolation);
vacuum is safe once no reader can hold a pre-compaction manifest
(at 100 TB: a retention horizon, exactly Delta's ``VACUUM``).

Multi-writer safety (optimistic concurrency): the commit point is the
O_EXCL creation of the manifest file itself — two writers that both
read version N race on the single filename ``m-(N+1).json`` and
exactly one wins; the loser raises :class:`CommitConflict`. Blind
appends retry internally (they conflict with nothing logically);
rewrites (compact / merge / delete) surface the conflict because the
file set they rewrote may no longer be live — Delta's commit
protocol. ``CURRENT`` is a monotonic cache, not the commit: readers
probe forward past it, so a writer crash between manifest creation
and cache refresh loses nothing.

Scale notes: one manifest listing every file is the TOY form — at
100 TB manifests shard per partition/day and the pointer flip moves to
a metastore/log, but the invariant carried by this module (readers
resolve an immutable file LIST, never a mutable directory) is the one
that matters, and the compaction itself stays a per-partition narrow
rewrite behind the ingest.
"""

from __future__ import annotations

import json
import math
import os
import pathlib
import shutil
import threading
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another writer committed the sequence number this commit was
    about to take: the loser's view of the table is stale. Blind
    appends recompute their file union and retry (:func:`append_batch`
    does this internally — an append conflicts with nothing
    logically); rewrites (:func:`compact`, :func:`merge_upsert`,
    :func:`delete_where`) surface the conflict because the file set
    they rewrote may no longer be live — the caller re-reads and
    re-runs, exactly Delta's optimistic-concurrency protocol."""


def _seq_of(name: str) -> int:
    return int(name.split("-")[1].split(".")[0])


def _manifest_name(seq: int) -> str:
    return f"m-{seq:08d}.json"


def read_manifest(root: str) -> tuple[str | None, list[str]]:
    """Resolve the current (manifest name, live data-file names).
    ``(None, [])`` for a table with no committed version yet.

    The COMMIT POINT is the O_EXCL creation of the manifest file
    itself (see :func:`_flip`); ``CURRENT`` is a monotonic cache of
    the latest known manifest, so resolution probes FORWARD from the
    cached name until the next sequence number is absent — a commit
    whose writer crashed (or lost a cache-update race) before
    refreshing ``CURRENT`` is still visible, exactly as a Delta log
    listing sees past ``_last_checkpoint``."""
    cur = pathlib.Path(root, "CURRENT")
    mdir = pathlib.Path(root, "manifests")
    try:
        seq = _seq_of(cur.read_text().strip())
    except FileNotFoundError:
        if not (mdir / _manifest_name(0)).exists():
            return None, []
        seq = 0
    while (mdir / _manifest_name(seq + 1)).exists():
        seq += 1
    name = _manifest_name(seq)
    doc = json.loads((mdir / name).read_text())
    return name, list(doc["files"])


def list_manifests(root: str) -> list[tuple[str, str]]:
    """Table history: every committed version as (manifest name, note),
    oldest first. Historical manifests stay READABLE as long as every
    file they reference is still live (``vacuum`` keeps exactly the
    CURRENT set, so a post-compaction snapshot whose files are a subset
    of later versions survives; pre-compaction snapshots die at vacuum
    — the retention trade every table format documents)."""
    mdir = pathlib.Path(root, "manifests")
    if not mdir.is_dir():
        return []
    out = []
    for p in sorted(mdir.iterdir()):
        if p.name.startswith("m-") and p.suffix == ".json":
            out.append((p.name, json.loads(p.read_text()).get("note", "")))
    return out


def manifest_files(root: str, name: str) -> list[str]:
    """The file list of a SPECIFIC manifest (a reader's held snapshot)."""
    return list(json.loads(
        pathlib.Path(root, "manifests", name).read_text()
    )["files"])


def resolve_as_of(root: str, ts: float) -> str:
    """TIMESTAMP AS OF: the manifest name of the LATEST version
    committed at or before wall-clock ``ts`` (each manifest records
    its commit time — the Delta/Iceberg timestamp-travel contract:
    a timestamp between commits N and N+1 resolves to N). Raises
    ``ValueError`` when ``ts`` precedes the first commit — there is
    no table to read at that time. Manifests written before commit
    timestamps existed (no ``ts`` field) are treated as time 0, i.e.
    always at-or-before any requested timestamp."""
    mdir = pathlib.Path(root, "manifests")
    best: tuple[int, str] | None = None
    for name, _ in list_manifests(root):
        committed = json.loads((mdir / name).read_text()).get("ts", 0.0)
        if committed <= ts:
            cand = (_seq_of(name), name)
            if best is None or cand > best:
                best = cand
    if best is None:
        raise ValueError(
            f"no version of {root} existed at or before timestamp {ts}"
        )
    return best[1]


_UNREAD = object()  # sentinel: _flip re-reads CURRENT itself


def _manifest_doc(root: str, name: str) -> dict:
    return json.loads(pathlib.Path(root, "manifests", name).read_text())


def _flip(
    root: str,
    files: list[str],
    note: str,
    stats: dict | None = None,
    *,
    base=_UNREAD,
    extra: dict | None = None,
) -> str:
    """Commit a new version against ``base`` (the manifest name the
    caller's read of the table resolved to; ``None`` = the caller saw
    an empty table). The manifest for sequence ``base+1`` is created
    with ``open(..., "x")`` (O_EXCL) — creation IS the commit point,
    so two writers that both derived the same base race on one
    filename and exactly one wins; the loser gets
    :class:`CommitConflict` instead of silently clobbering the
    winner's manifest (the lost-update race optimistic concurrency
    exists to prevent). ``CURRENT`` is then advanced as a monotonic
    best-effort cache — a crash between commit and cache refresh is
    healed by :func:`read_manifest`'s forward probe.

    ``stats`` maps file name -> {column -> [min, max]} (only entries
    for files in this version are kept). ``extra`` merges additional
    manifest fields (e.g. the evolved-schema ``columns``/``colmap``).
    Every manifest records ``ts`` (wall-clock seconds at commit) for
    TIMESTAMP AS OF resolution (:func:`resolve_as_of`)."""
    mdir = pathlib.Path(root, "manifests")
    mdir.mkdir(parents=True, exist_ok=True)
    if base is _UNREAD:
        base, _ = read_manifest(root)
    seq = _seq_of(base) + 1 if base else 0
    name = _manifest_name(seq)
    doc = {"files": sorted(files), "note": note, "ts": time.time()}
    if stats:
        doc["stats"] = {f: stats[f] for f in doc["files"] if f in stats}
    # Schema tracking rides every commit once it exists: ``columns``
    # (the logical schema — field id, name, type) carries forward from
    # the base unless the commit overrides it (the evolution verbs),
    # and ``colmap`` (per-file {id: [physical name, physical type]},
    # pinned at the commit that adopted the file) is pruned to the new
    # file list, with unmapped files — this commit's adoptions, always
    # written under the then-current logical schema — getting the
    # identity mapping. This is Iceberg's field-id indirection in its
    # minimal form: renames/widenings change ``columns`` only, and
    # every file remains readable through its own pinned mapping.
    base_doc = _manifest_doc(root, base) if base else {}
    columns = (extra or {}).get("columns", base_doc.get("columns"))
    if columns is not None:
        doc["columns"] = columns
        # next_field_id is monotone for the table's LIFETIME (Iceberg's
        # last-column-id): a dropped field's id is never handed to a
        # later add, so a re-added name can't resurrect dropped bytes
        doc["next_field_id"] = (extra or {}).get(
            "next_field_id",
            base_doc.get(
                "next_field_id", max(c["id"] for c in columns) + 1
            ),
        )
        base_colmap = base_doc.get("colmap", {})
        ident = {
            str(c["id"]): [c["name"], c["type"]] for c in columns
        }
        doc["colmap"] = {
            f: base_colmap.get(f, ident) for f in doc["files"]
        }
    if extra:
        doc.update({
            k: v for k, v in extra.items()
            if k not in ("columns", "next_field_id")
        })
    # Two-step atomic create-exclusive: the manifest must appear with
    # its FULL content (a concurrent reader probes forward and may read
    # it the instant it exists) AND creation must fail on an existing
    # name (the conflict detection). open(..., "x") alone creates an
    # empty file first; os.link publishes the completed temp file under
    # the final name atomically and raises FileExistsError on a
    # sequence collision — the local-fs analog of HDFS
    # create-no-overwrite / an object store's if-none-match PUT.
    tmp = mdir / f".{name}.tmp.{os.getpid()}.{threading.get_ident()}"
    tmp.write_text(json.dumps(doc))
    try:
        os.link(tmp, mdir / name)  # atomic publish + EXCL: the commit
    except FileExistsError:
        raise CommitConflict(
            f"version {name} was committed by another writer while this "
            f"commit (note={note!r}) was computed against {base}"
        ) from None
    finally:
        tmp.unlink(missing_ok=True)
    _advance_current(root, name)
    return name


def _advance_current(root: str, name: str) -> None:
    """Move the ``CURRENT`` cache forward to ``name`` unless it
    already names a later sequence (a slower writer must never regress
    the cache past a faster one's refresh; readers probe forward from
    the cache, so a stale-but-behind cache is only a longer probe,
    never a wrong answer)."""
    cur = pathlib.Path(root, "CURRENT")
    try:
        if _seq_of(cur.read_text().strip()) >= _seq_of(name):
            return
    except FileNotFoundError:
        pass
    tmp = pathlib.Path(root, f".CURRENT.tmp.{_seq_of(name)}")
    tmp.write_text(name)
    os.replace(tmp, cur)  # atomic POSIX rename


def manifest_stats(root: str, name: str) -> dict:
    """The per-file stats map of a specific manifest: file name →
    {column → [min, max]} (empty for tables written without stats
    columns). Stats are keyed BY COLUMN so a range read on column A
    can never be pruned with column B's range — a file whose entry
    lacks the queried column is conservatively kept."""
    return json.loads(
        pathlib.Path(root, "manifests", name).read_text()
    ).get("stats", {})


def _norm_stats_cols(stats_col) -> tuple[str, ...]:
    """Accept a single column name or a sequence of them."""
    if stats_col is None:
        return ()
    if isinstance(stats_col, str):
        return (stats_col,)
    return tuple(stats_col)


def _record_stats(
    data: pathlib.Path, files: list[str], stats_cols: tuple[str, ...]
) -> dict:
    """Column-keyed footer stats for newly adopted files: {file →
    {col → [min, max]}}; columns whose footers lack min/max are simply
    absent (the file is then never pruned on that column)."""
    out: dict = {}
    for f in files:
        ent = {}
        for col in stats_cols:
            mm = _file_minmax(data / f, col)
            if mm is not None:
                ent[col] = mm
        if ent:
            out[f] = ent
    return out


def _file_minmax(path: pathlib.Path, col: str) -> list | None:
    """Footer-only min/max of ``col`` across a parquet file's row
    groups (pyarrow metadata read — no data pages touched). None when
    any row group lacks stats (the file is then never pruned). At
    scale this collection happens in the WRITE tasks (Iceberg's
    per-file stats); here the commit point reads the local footers,
    which is the same metadata-sized work."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(str(path)).metadata
    idx = next(
        (i for i in range(md.num_columns)
         if md.schema.column(i).name == col),
        None,
    )
    if idx is None:
        return None
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return None if lo is None else [lo, hi]


def _adopt(staging: pathlib.Path, data: pathlib.Path, prefix: str) -> list[str]:
    """Move a Spark job's part-files out of its staging dir into
    ``data/`` under unique immutable names (same filesystem →
    ``os.replace`` is a metadata move, not a copy)."""
    data.mkdir(parents=True, exist_ok=True)
    adopted: list[str] = []
    parts = sorted(
        p for p in staging.iterdir()
        if p.name.startswith("part-") and not p.name.endswith(".crc")
    )
    for i, p in enumerate(parts):
        tgt = data / f"{prefix}-{i:05d}{''.join(p.suffixes)}"
        os.replace(p, tgt)
        adopted.append(tgt.name)
    shutil.rmtree(staging)
    return adopted


def append_batch(
    df: DataFrame,
    root: str,
    batch_id: int,
    *,
    stats_col: str | None = None,
    track_schema: bool = False,
) -> str:
    """Append one micro-batch: write to staging, adopt the files,
    flip CURRENT to (live + new). The ``batch_id`` keys the file names,
    so a foreachBatch RETRY of the same epoch overwrites its own
    staging rather than double-adopting. With ``stats_col`` the new
    manifest also records each adopted file's [min, max] of that
    column (footer-only read), enabling file-level data skipping in
    :func:`read_table` — give every commit of a table the SAME
    stats_col or range reads lose pruning on the uncovered files.

    ``track_schema=True`` on a table's FIRST commit initializes schema
    tracking: field ids are assigned by position at that commit
    (Iceberg's resolve-by-position-at-commit), enabling the evolution
    verbs (:func:`widen_column` / :func:`rename_column` /
    :func:`drop_column` / :func:`add_column`) and :func:`read_evolved`.
    Once a table tracks its schema, every later append is validated
    against the CURRENT logical schema — exact names and types; the
    writer casts, the table never guesses."""
    root_p = pathlib.Path(root)
    staging = root_p / f".staging-{batch_id}"
    df.write.mode("overwrite").parquet(str(staging))
    data = root_p / "data"
    adopted = _adopt(staging, data, f"b{batch_id:08d}")
    new_stats = _record_stats(data, adopted, _norm_stats_cols(stats_col))
    # Appends are BLIND (Delta's AddFile-only commit): they conflict
    # with no concurrent commit logically, so a CommitConflict just
    # means the base moved — re-read, re-union, retry. The bound is a
    # livelock guard, not a correctness limit.
    df_fields = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    for _ in range(64):
        # one manifest parse per attempt: the doc carries files, stats,
        # and columns together (it grows with table size — re-parsing
        # it three times per retry is the expensive way to read it)
        cur, _live = read_manifest(root)
        doc = _manifest_doc(root, cur) if cur else {}
        live = doc.get("files", [])
        stats = dict(doc.get("stats", {}))
        stats.update(new_stats)
        columns = doc.get("columns")
        extra = None
        if columns is not None:
            want = {(c["name"], c["type"]) for c in columns}
            if set(df_fields) != want:
                raise ValueError(
                    f"append batch {batch_id} schema {sorted(df_fields)} "
                    f"does not match the table's current logical schema "
                    f"{sorted(want)}; evolve the table or cast the batch"
                )
        elif track_schema:
            extra = {"columns": [
                {"id": i, "name": n, "type": t}
                for i, (n, t) in enumerate(df_fields)
            ]}
        try:
            # set-union, not concatenation: a foreachBatch RETRY that
            # already flipped re-adopts the same deterministic names —
            # the manifest must list each file once or readers
            # double-count the batch
            return _flip(
                root, sorted(set(live) | set(adopted)),
                f"append batch {batch_id}", stats, base=cur, extra=extra,
            )
        except CommitConflict:
            continue
    raise CommitConflict(
        f"append batch {batch_id} lost 64 consecutive commit races"
    )


def compact(
    spark: SparkSession,
    root: str,
    schema,
    *,
    target_bytes: int = 96 << 20,
    target_files: int | None = None,
    stats_col=None,
    cluster: bool = False,
    cluster_expr=None,
) -> int:
    """Rewrite the live set into ``ceil(total/target_bytes)`` files
    (floor 1; ``target_files`` overrides) and flip the pointer.
    Returns the file-count reduction (0 = nothing to do). Superseded
    files are left for :func:`vacuum`. ``stats_col`` re-records
    [min, max] for the replacement files.

    Two rewrite shapes, the real compactor trade:

    - default: ``coalesce`` — NARROW, no shuffle; compaction never pays
      a corpus exchange just to glue files. But coalesce merges
      arbitrary inputs, so a compacted file's stats range is the union
      of its inputs' — on a clustered table this widens ranges and
      DEGRADES data skipping.
    - ``cluster=True`` (requires ``stats_col`` or ``cluster_expr``):
      ``repartitionByRange`` + ``sortWithinPartitions`` on the cluster
      key — pays one range shuffle of the rewritten slice, and in
      exchange the replacement files carry tight disjoint ranges, so
      pruning SURVIVES compaction. This is why production compactors
      sort/cluster as they rewrite; at 100 TB the slice is a
      partition/day, not the corpus, so the shuffle is bounded by the
      same unit the compactor already rewrites.

    ``cluster_expr`` (a Column) overrides the cluster key while
    ``stats_col`` (one name or a sequence) still names the RECORDED
    stats — the Z-ORDER hook: cluster on an interleaved-bits
    expression of several columns (see :func:`zorder32`), record
    per-file stats for each source column, and range reads prune on
    ANY of them (multi-dimensional data skipping, Delta's ``OPTIMIZE
    ZORDER BY``).
    """
    stats_cols = _norm_stats_cols(stats_col)
    if cluster and not stats_cols and cluster_expr is None:
        raise ValueError("cluster=True requires stats_col or cluster_expr")
    cur, live = read_manifest(root)
    if len(live) <= 1:
        return 0
    data = pathlib.Path(root, "data")
    total = sum((data / f).stat().st_size for f in live)
    target = target_files or max(1, math.ceil(total / target_bytes))
    if target >= len(live):
        return 0
    # WRITER-UNIQUE staging dir and adopted names: two rewriters that
    # derived the same base must never share an output location — a
    # deterministic name would let the conflict LOSER overwrite the
    # winner's already-committed immutable files via mode("overwrite")
    # + os.replace before its own flip even gets to raise. The loser's
    # uniquely-named orphans are unreferenced and vacuumed. (Appends
    # keep deterministic per-batch_id names on purpose: retry
    # idempotency of the SAME epoch; distinct writers use distinct
    # batch-id namespaces.)
    seq = _seq_of(cur) + 1
    nonce = uuid.uuid4().hex[:8]
    staging = pathlib.Path(root, f".compact-{seq}.{nonce}")
    doc = _manifest_doc(root, cur)
    if doc.get("columns") is not None:
        # schema-tracked table: the rewrite must resolve each file
        # through its pinned field-id mapping (post-widen/rename the
        # caller's flat schema cannot read the older files), and the
        # replacement files — written under the CURRENT logical schema
        # — get the identity colmap at commit, which also COALESCES
        # historical schema groups into one: compaction doubles as
        # physical schema migration, exactly Iceberg's rewrite action
        scan = _scan_files_evolved(spark, root, doc, live)
    else:
        scan = spark.read.schema(schema).parquet(
            *[str(data / f) for f in live]
        )
    if cluster:
        from pyspark.sql import functions as F

        key = cluster_expr if cluster_expr is not None \
            else F.col(stats_cols[0])
        rewritten = scan.repartitionByRange(
            target, key
        ).sortWithinPartitions(key)
    else:
        rewritten = scan.coalesce(target)
    rewritten.write.mode("overwrite").parquet(str(staging))
    adopted = _adopt(staging, data, f"c{seq:08d}-{nonce}")
    stats = _record_stats(data, adopted, stats_cols)
    # base=cur: a concurrent commit (even a blind append) invalidates
    # this rewrite — its output omits the newly appended files — so the
    # conflict must surface; the caller re-reads and re-compacts.
    _flip(
        root, adopted, f"compact {len(live)} -> {len(adopted)} files", stats,
        base=cur,
    )
    return len(live) - len(adopted)


def merge_upsert(
    spark: SparkSession,
    root: str,
    schema,
    updates: DataFrame,
    key: str,
    *,
    stats_col: str | None = None,
) -> tuple[str, int, int]:
    """Copy-on-write MERGE (upsert by ``key``): rows in ``updates``
    REPLACE same-key rows in the table; update keys matching no row
    are INSERTED. Returns (new manifest name, files rewritten, live
    files before).

    The Delta/Iceberg ``MERGE INTO`` core: only files that can contain
    an update key are rewritten — with ``stats_col == key``, manifest
    min/max stats prune the rewrite set to files overlapping the
    updates' key range (a contiguous update band touches only its
    band's files; this is why mutable tables want their key
    clustered). Touched files are read once, anti-joined on key, and
    the survivors + updates are written as replacement files; the
    commit flips to (untouched + replacements) atomically. Untouched
    files are correct by the same conservative stats rule as reads: a
    file is only skipped when its exact footer range cannot contain
    any update key. At 100 TB the rewrite unit is the files of one
    update band, not the table — the copy-on-write cost model every
    production MERGE documents.
    """
    from pyspark.sql import functions as F

    cur, live = read_manifest(root)
    if not live:
        return append_batch(updates, root, 0, stats_col=stats_col), 0, 0
    bounds = updates.agg(F.min(key), F.max(key)).first()  # 1 row
    lo, hi = bounds[0], bounds[1]
    if lo is None:  # empty updates: nothing to do
        return cur, 0, len(live)
    if stats_col == key:
        touched, _ = pruned_files(root, cur, key, lo, hi)
    else:
        touched = list(live)  # no usable stats: rewrite everything
    untouched = [f for f in live if f not in set(touched)]
    data = pathlib.Path(root, "data")
    seq = _seq_of(cur) + 1
    nonce = uuid.uuid4().hex[:8]  # writer-unique: see compact()
    staging = pathlib.Path(root, f".merge-{seq}.{nonce}")
    doc = _manifest_doc(root, cur)
    if doc.get("columns") is not None:
        # schema-tracked: resolve touched files via their pinned
        # mappings; ``updates`` must arrive under the CURRENT logical
        # schema (unionByName below is loud on a mismatch)
        base = _scan_files_evolved(spark, root, doc, touched)
    else:
        base = (
            spark.read.schema(schema).parquet(
                *[str(data / f) for f in touched]
            )
            if touched
            else spark.createDataFrame([], schema)
        )
    (
        base.join(updates.select(key), key, "left_anti")
        .unionByName(updates)
        .coalesce(max(1, len(touched)))
        .write.mode("overwrite")
        .parquet(str(staging))
    )
    adopted = _adopt(staging, data, f"u{seq:08d}-{nonce}")
    stats = dict(manifest_stats(root, cur))
    stats.update(_record_stats(data, adopted, _norm_stats_cols(stats_col)))
    name = _flip(
        root, untouched + adopted,
        f"merge upsert: rewrote {len(touched)} of {len(live)} files",
        stats, base=cur,
    )
    return name, len(touched), len(live)


def delete_where(
    spark: SparkSession,
    root: str,
    schema,
    col: str,
    lo,
    hi,
    *,
    stats_col: str | None = None,
) -> tuple[str, int, int]:
    """Copy-on-write DELETE of rows with ``col`` BETWEEN lo AND hi:
    the write-path mirror of :func:`read_table`'s data skipping, and
    the third mutation verb next to append and merge (Delta/Iceberg
    ``DELETE FROM ... WHERE``). Returns (new manifest name, files
    rewritten, live files before).

    With ``stats_col == col`` manifest min/max stats prune the rewrite
    set to files whose range can contain a victim row — a bounded
    range-delete on a clustered table rewrites its band's files, not
    the table (the GDPR/retention-delete cost model). Survivor rows
    are rewritten, the commit flips to (untouched + replacements).
    Rows with a NULL ``col`` never match BETWEEN and are always kept.
    """
    from pyspark.sql import functions as F

    cur, live = read_manifest(root)
    if not live:
        return cur, 0, 0
    if stats_col == col:
        touched, _ = pruned_files(root, cur, col, lo, hi)
    else:
        touched = list(live)  # no usable stats: rewrite everything
    if not touched:  # no file can contain a victim: no-op commit-wise
        return cur, 0, len(live)
    untouched = [f for f in live if f not in set(touched)]
    data = pathlib.Path(root, "data")
    seq = _seq_of(cur) + 1
    nonce = uuid.uuid4().hex[:8]  # writer-unique: see compact()
    staging = pathlib.Path(root, f".delete-{seq}.{nonce}")
    doc = _manifest_doc(root, cur)
    if doc.get("columns") is not None:
        base = _scan_files_evolved(spark, root, doc, touched)
    else:
        base = spark.read.schema(schema).parquet(
            *[str(data / f) for f in touched]
        )
    survivors = base.filter(
        ~F.coalesce(F.col(col).between(lo, hi), F.lit(False))
    )
    survivors.coalesce(max(1, len(touched))).write.mode("overwrite").parquet(
        str(staging)
    )
    adopted = _adopt(staging, data, f"d{seq:08d}-{nonce}")
    stats = dict(manifest_stats(root, cur))
    stats.update(_record_stats(data, adopted, _norm_stats_cols(stats_col)))
    name = _flip(
        root, untouched + adopted,
        f"delete {col} in [{lo}, {hi}]: rewrote {len(touched)} of "
        f"{len(live)} files",
        stats, base=cur,
    )
    return name, len(touched), len(live)


def changes(
    spark: SparkSession,
    root: str,
    schema,
    key: str,
    from_name: str,
    to_name: str | None = None,
    *,
    update_preimages: bool = False,
) -> DataFrame:
    """Change data feed: the row-level diff between two committed
    versions (Delta CDF / Iceberg incremental read), computed WITHOUT
    replaying a log — manifest diff names the files each commit added
    or removed, and a key-level reconciliation over JUST those files
    separates real changes from copy-on-write ballast (rows a rewrite
    carried verbatim because they shared a file with a change).

    Returns the table columns plus ``_change``: ``insert`` and
    ``update_post`` rows carry the post-image, ``delete`` rows the
    pre-image. With ``update_preimages=True`` each updated key ALSO
    emits an ``update_pre`` row carrying the old image (Delta CDF's
    preimage/postimage pair) — what downstream LINEAR consumers need:
    an incremental aggregate subtracts the pre-image and adds the
    post-image. ``key`` must be unique per version (the same contract
    as :func:`merge_upsert`). ``to_name=None`` reads CURRENT.

    Scale contract: both join sides are bounded by the files the
    window's commits touched — an incremental consumer pays for the
    churn, never the table. The flip side is RETENTION: the old
    versions' files must still exist (this raises loudly if vacuum
    already removed one — exactly Delta's CDF-vs-VACUUM horizon).
    The retention check runs at CONSTRUCTION time only — the returned
    DataFrame is lazy, so a vacuum racing between construction and
    the consuming action surfaces as the scan's file-not-found, not
    this RuntimeError; hold the feed's versions in the vacuum horizon
    until the action completes (the same reader-lease discipline every
    table format demands of CDF consumers).

    NULL keys: rows whose ``key`` is NULL are matched null-safely
    (``<=>``), so a NULL-key row carried verbatim through a
    copy-on-write rewrite reconciles with itself and is correctly
    dropped as ballast rather than emitted as a phantom delete+insert
    pair (reachable: :func:`delete_where` deliberately preserves
    NULL-key rows). Like the non-null contract, at most ONE NULL-key
    row per version — uniqueness-of-key is this feed's precondition.
    """
    from pyspark.sql import functions as F

    if to_name is None:
        to_name, _ = read_manifest(root)
        if to_name is None:
            raise ValueError("table has no committed version")
    from_files = set(manifest_files(root, from_name))
    to_files = set(manifest_files(root, to_name))
    removed = sorted(from_files - to_files)
    added = sorted(to_files - from_files)
    data = pathlib.Path(root, "data")
    missing = [f for f in (*removed, *added) if not (data / f).exists()]
    if missing:
        raise RuntimeError(
            f"change feed {from_name}..{to_name} needs vacuumed files "
            f"{missing}: the retention horizon must outlive CDF readers"
        )
    out_schema = spark.createDataFrame([], schema).schema
    cols = [f.name for f in out_schema.fields]
    empty = spark.createDataFrame(
        [], out_schema.add("_change", "string", False)
    )
    if not removed and not added:
        return empty

    def _side(files: list[str], tag: str) -> DataFrame:
        if not files:
            return empty.select(
                F.col(key).alias(f"__k_{tag}"),
                F.struct(*cols).alias(f"__row_{tag}"),
                F.lit("").alias(f"__h_{tag}"),
            )
        df = spark.read.schema(out_schema).parquet(
            *[str(data / f) for f in files]
        )
        # null-safe payload fingerprint: to_json is deterministic for
        # identical values and both sides hash through the same code
        return df.select(
            F.col(key).alias(f"__k_{tag}"),
            F.struct(*cols).alias(f"__row_{tag}"),
            F.md5(F.to_json(F.struct(*cols))).alias(f"__h_{tag}"),
        )

    old = _side(removed, "old")
    new = _side(added, "new")
    # `<=>` (EqualNullSafe) is still an equi-join key for the planner
    # (sort-merge/shuffled-hash, never BNLJ) and lets a NULL-key row
    # reconcile with itself across a copy-on-write rewrite
    j = old.join(new, old["__k_old"].eqNullSafe(new["__k_new"]), "full_outer")
    change = (
        F.when(F.col("__row_old").isNull(), F.lit("insert"))
        .when(F.col("__row_new").isNull(), F.lit("delete"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("update_post"))
        # equal hashes: carried-over copy-on-write ballast, not a change
    )
    post = F.struct(
        F.lit("update_post").alias("c"), F.col("__row_new").alias("r")
    )
    pre = F.struct(
        F.lit("update_pre").alias("c"), F.col("__row_old").alias("r")
    )
    plain = F.struct(
        change.alias("c"),
        F.coalesce(F.col("__row_new"), F.col("__row_old")).alias("r"),
    )
    emitted = (
        F.when(change == "update_post", F.array(pre, post))
        .otherwise(F.array(plain))
        if update_preimages
        else F.array(plain)
    )
    return (
        j.filter(change.isNotNull())
        .select(F.explode(emitted).alias("__e"))
        .select([F.col(f"__e.r.{c}").alias(c) for c in cols]
                + [F.col("__e.c").alias("_change")])
    )


def vacuum(root: str, *, keep_last: int = 1) -> int:
    """Delete data files referenced by none of the ``keep_last`` most
    recent manifests (default 1: only CURRENT survives). Returns the
    number of files removed.

    ``keep_last`` IS the retention horizon: every snapshot read or
    change-feed window over the protected versions stays serviceable
    after the vacuum, anything older fails loudly (:func:`changes`
    checks). Production formats express the same knob in time
    (``VACUUM ... RETAIN n HOURS``); version count is the
    deterministic equivalent for a fixture-driven engine."""
    protected = [n for n, _ in list_manifests(root)][-max(keep_last, 1):]
    keep: set[str] = set()
    for name in protected:
        keep.update(manifest_files(root, name))
    data = pathlib.Path(root, "data")
    removed = 0
    if data.is_dir():
        for p in list(data.iterdir()):
            if p.name not in keep and not p.name.startswith("."):
                p.unlink()
                removed += 1
    return removed


def pruned_files(
    root: str, name: str, col: str, lo, hi
) -> tuple[list[str], int]:
    """Data skipping: the subset of manifest ``name``'s files whose
    [min, max] stats for ``col`` overlap [lo, hi] (files without stats
    are conservatively kept), plus the total live count. Pruning is an
    OPTIMIZATION only — callers still apply the row predicate, so a
    stats bug can cost speed, never correctness... except a too-narrow
    stat, which parquet footers cannot produce (they are exact)."""
    files = manifest_files(root, name)
    stats = manifest_stats(root, name)

    def _keep(f: str) -> bool:
        rng = stats.get(f, {}).get(col)
        # column-keyed lookup: a file with stats for OTHER columns only
        # is conservatively kept — column A's range must never prune on
        # column B (this is why stats carry their column name)
        return rng is None or not (rng[1] < lo or rng[0] > hi)

    kept = [f for f in files if _keep(f)]
    return kept, len(files)


def zorder32(xcol, ycol, x_range: tuple, y_range: tuple):
    """Z-order (Morton) cluster key over two columns for
    :func:`compact`'s ``cluster_expr``: each value is linearly mapped
    onto a 16-bit grid over its [lo, hi] range (driver-known, one
    cheap min/max agg), and the two grid coordinates' bits are
    interleaved into one 32-bit integer — points close in BOTH
    dimensions land close on the curve, so range-clustered files carry
    TIGHT ranges on BOTH columns and data skipping works on either
    (Delta's ``OPTIMIZE ZORDER BY``; single-column range clustering
    gives perfect skipping on one column and none on the other).

    Built-ins only (casts, shifts, masks — whole-stage codegen); NULL
    or out-of-range values clamp to the grid edge, which affects only
    placement, never correctness (stats are recorded from the actual
    parquet footers afterwards).
    """
    from pyspark.sql import functions as F

    def grid(c, rng):
        lo, hi = rng
        span = max(int(hi) - int(lo), 1)
        v = F.coalesce(c.cast("long"), F.lit(int(lo)))
        scaled = ((v - F.lit(int(lo))) * 65535) / F.lit(span)
        return F.greatest(
            F.lit(0), F.least(F.lit(65535), scaled.cast("long"))
        )

    x, y = grid(xcol, x_range), grid(ycol, y_range)
    z = F.lit(0).cast("long")
    for i in range(16):
        xbit = F.shiftright(x, i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(y, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(xbit, 2 * i + 1)).bitwiseOR(
            F.shiftleft(ybit, 2 * i)
        )
    return z


# --- Schema evolution (VERDICT r11 task 6) --------------------------
#
# Iceberg's model in minimal form: the manifest's ``columns`` list is
# the logical schema (stable field ids, assigned by position at the
# commit that introduced each field), and each data file carries a
# pinned ``colmap`` {id: [physical name, physical type]} from its own
# commit. Evolution verbs are METADATA-ONLY commits — no file is
# rewritten for a widen/rename/drop/add — and the read path resolves
# every file through its own mapping: rename is an alias, widen is a
# lossless cast, drop hides an id from the projection (the bytes stay,
# so TIME TRAVEL to a pre-drop version still reads them), add is a
# NULL fill for files that predate the field.

_WIDENINGS = {("int", "bigint"), ("float", "double")}


def _evolve_commit(root: str, note: str, mutate, rekey_stats=None) -> str:
    """Shared optimistic-concurrency loop for the evolution verbs:
    metadata-only, conflict-checked, retried — the verb composes with
    concurrent appends the way an ALTER TABLE must (``mutate`` re-runs
    against the fresh schema on every retry, so a lost race never
    applies the change to a stale column list). ``rekey_stats``
    transforms the carried per-file stats map (rename uses it to move
    entries to the new column name so data skipping survives the
    rename — stats are name-keyed, and a stale key would silently
    degrade every later range read to a full scan)."""
    for _ in range(64):
        cur, files = read_manifest(root)
        if cur is None:
            raise ValueError(f"{root} has no committed version to evolve")
        doc = _manifest_doc(root, cur)
        columns = doc.get("columns")
        if columns is None:
            raise ValueError(
                f"{root} does not track its schema; initialize the table "
                "with append_batch(track_schema=True)"
            )
        next_id = doc.get(
            "next_field_id", max(c["id"] for c in columns) + 1
        )
        new_columns, new_next_id = mutate([dict(c) for c in columns],
                                          next_id)
        stats = doc.get("stats")
        if stats is not None and rekey_stats is not None:
            stats = rekey_stats(stats)
        try:
            return _flip(
                root, files, note, stats,
                base=cur,
                extra={"columns": new_columns,
                       "next_field_id": new_next_id},
            )
        except CommitConflict:
            continue
    raise CommitConflict(f"evolution {note!r} lost 64 consecutive races")


def widen_column(root: str, name: str, new_type: str) -> str:
    """Lossless type widening (int→bigint, float→double) as a
    metadata-only commit: existing files keep their narrow physical
    type and are CAST at read; new appends must write the wide type."""

    def mutate(columns, next_id):
        for c in columns:
            if c["name"] == name:
                if (c["type"], new_type) not in _WIDENINGS:
                    raise ValueError(
                        f"cannot widen {name!r} {c['type']} -> {new_type}; "
                        f"lossless widenings are {sorted(_WIDENINGS)}"
                    )
                c["type"] = new_type
                return columns, next_id
        raise ValueError(f"no column {name!r} to widen")

    return _evolve_commit(root, f"widen {name} -> {new_type}", mutate)


def rename_column(root: str, old: str, new: str) -> str:
    """Rename as a metadata-only commit: the field id is stable, so
    files written under the old name keep resolving through their
    pinned colmap — no NULL-out, no rewrite (the by-name resolution
    failure mode renames exist to avoid)."""

    def mutate(columns, next_id):
        if any(c["name"] == new for c in columns):
            raise ValueError(f"column {new!r} already exists")
        for c in columns:
            if c["name"] == old:
                c["name"] = new
                return columns, next_id
        raise ValueError(f"no column {old!r} to rename")

    def rekey(stats):
        # carry each file's [min, max] to the new name: data skipping
        # must survive a rename (the entries are name-keyed). Any
        # stale entry already sitting under ``new`` is DISCARDED first
        # — it can only belong to a dead column (``new`` is not in the
        # live schema), and letting it win the key collision would
        # prune the renamed column's range reads with the dead
        # column's numbers (silent wrong results, not a crash)
        out = {}
        for f, ent in stats.items():
            kept = {c: mm for c, mm in ent.items() if c != new}
            if old in kept:
                kept[new] = kept.pop(old)
            out[f] = kept
        return out

    return _evolve_commit(root, f"rename {old} -> {new}", mutate, rekey)


def drop_column(root: str, name: str) -> str:
    """Drop as a metadata-only commit: the id leaves the logical
    schema (current reads never see it) but every file keeps its
    bytes, so a snapshot read of a pre-drop version still returns the
    column — the time-travel contract. Ids are never reused: a later
    add_column of the same NAME is a NEW field, NULL for old files."""

    def mutate(columns, next_id):
        kept = [c for c in columns if c["name"] != name]
        if len(kept) == len(columns):
            raise ValueError(f"no column {name!r} to drop")
        if not kept:
            raise ValueError("cannot drop the last column")
        return kept, next_id

    def rekey(stats):
        # purge the dropped column's name-keyed stats: a later rename
        # onto this name must not inherit a DEAD column's [min, max]
        # (that collision silently mis-prunes range reads — it would
        # assign the dropped column's range to the renamed one)
        return {
            f: {c: mm for c, mm in ent.items() if c != name}
            for f, ent in stats.items()
        }

    return _evolve_commit(root, f"drop {name}", mutate, rekey)


def add_column(root: str, name: str, dtype: str) -> str:
    """Add a column as a metadata-only commit: the new field takes
    the table's monotone ``next_field_id`` (Iceberg's last-column-id —
    NEVER a reused one, so a name re-added after a drop cannot
    resurrect the dropped column's bytes); files that predate it read
    NULL."""

    def mutate(columns, next_id):
        if any(c["name"] == name for c in columns):
            raise ValueError(f"column {name!r} already exists")
        return (
            columns + [{"id": next_id, "name": name, "type": dtype}],
            next_id + 1,
        )

    return _evolve_commit(root, f"add {name} {dtype}", mutate)


def table_columns(root: str, name: str | None = None) -> list[dict] | None:
    """The logical schema of a committed version (CURRENT by default):
    a list of {id, name, type}, or None for untracked tables."""
    if name is None:
        name, _ = read_manifest(root)
        if name is None:
            return None
    return _manifest_doc(root, name).get("columns")


def read_evolved(
    spark: SparkSession,
    root: str,
    name: str | None = None,
    *,
    where_between=None,
) -> DataFrame:
    """Read a schema-tracked table under the LOGICAL schema of version
    ``name`` (CURRENT by default). Files are grouped by their pinned
    physical mapping and each group is scanned with its own physical
    schema (exact names and types — column-pruned to the live fields),
    then cast/aliased/NULL-filled onto the logical schema and unioned
    by name: old files stay readable after a widen, a renamed column
    carries its data, a dropped column vanishes from current reads but
    survives in snapshot reads of pre-drop versions. The group count
    is bounded by the number of schema versions that ever committed a
    file — a handful — never by file count.

    ``where_between=(col, lo, hi)`` range-reads with the same manifest
    data skipping as :func:`read_table`: ``col`` is the CURRENT
    logical name (rename rekeys the stats, so pruning survives
    evolution), files whose recorded range cannot overlap are dropped
    before the scan plans, and the row predicate applies on top so
    results never depend on stats coverage."""
    from pyspark.sql import functions as F

    if name is None:
        name, _ = read_manifest(root)
        if name is None:
            raise ValueError(f"{root} has no committed version")
    doc = _manifest_doc(root, name)
    if doc.get("columns") is None:
        raise ValueError(
            f"{root}@{name} does not track its schema; use read_table"
        )
    files = doc["files"]
    if where_between is not None:
        col, lo, hi = where_between
        files, _ = pruned_files(root, name, col, lo, hi)
    out = _scan_files_evolved(spark, root, doc, files)
    if where_between is not None:
        out = out.filter(F.col(col).between(lo, hi))
    return out


def _scan_files_evolved(
    spark: SparkSession, root: str, doc: dict, files: list[str]
) -> DataFrame:
    """Field-id-resolved scan of a FILE SUBSET under a manifest doc's
    logical schema — the shared core of :func:`read_evolved` and the
    evolution-aware rewrite verbs (which scan only their touched
    files)."""
    from pyspark.sql import functions as F

    columns = doc["columns"]
    ddl = ", ".join(f"`{c['name']}` {c['type']}" for c in columns)
    if not files:
        return spark.createDataFrame([], ddl)
    colmap = doc.get("colmap", {})
    missing = [f for f in files if f not in colmap]
    if missing:
        raise ValueError(f"files predate schema tracking: {missing}")
    groups: dict[tuple, list[str]] = {}
    for f in files:
        sig = tuple(sorted((i, tuple(m)) for i, m in colmap[f].items()))
        groups.setdefault(sig, []).append(f)
    data = pathlib.Path(root, "data")
    parts = []
    for sig, fs in sorted(groups.items()):
        mapping = dict(sig)  # str(id) -> (physical name, physical type)
        phys = [
            mapping[str(c["id"])]
            for c in columns
            if str(c["id"]) in mapping
        ]
        sel = [
            (
                F.col(f"`{mapping[str(c['id'])][0]}`")
                .cast(c["type"])
                .alias(c["name"])
                if str(c["id"]) in mapping
                else F.lit(None).cast(c["type"]).alias(c["name"])
            )
            for c in columns
        ]
        paths = [str(data / f) for f in sorted(fs)]
        if phys:
            scan = spark.read.schema(
                ", ".join(f"`{n}` {t}" for n, t in phys)
            ).parquet(*paths)
        else:
            # a file sharing NO live field ids with the current schema
            # (every column it carries was dropped) still contributes
            # its ROWS, all-NULL-filled: read with the file's own
            # schema and let Catalyst prune to a count-style scan —
            # an empty explicit schema would be a ParseException
            scan = spark.read.parquet(*paths)
        parts.append(scan.select(*sel))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_table(
    spark: SparkSession,
    root: str,
    schema,
    *,
    where_between=None,
) -> DataFrame:
    """Read the CURRENT version — resolve the pointer once, then scan
    an immutable file list (never the mutable directory).
    ``where_between=(col, lo, hi)`` range-reads: manifest stats prune
    non-overlapping FILES before the scan plans (the manifest-level
    data skipping a mutable-directory layout cannot offer), and the
    row predicate is applied on top, so results never depend on stats
    coverage."""
    name, live = read_manifest(root)
    if not live:
        return spark.createDataFrame([], schema)
    return _scan(spark, root, name, live, schema, where_between)


def read_snapshot(
    spark: SparkSession,
    root: str,
    name: str,
    schema,
    *,
    where_between=None,
) -> DataFrame:
    """Read a SPECIFIC manifest — what an in-flight reader that
    resolved CURRENT before a concurrent compaction effectively does."""
    files = manifest_files(root, name)
    if not files:
        return spark.createDataFrame([], schema)
    return _scan(spark, root, name, files, schema, where_between)


def _scan(spark, root, name, files, schema, where_between) -> DataFrame:
    from pyspark.sql import functions as F

    if where_between is not None:
        col, lo, hi = where_between
        files, _ = pruned_files(root, name, col, lo, hi)
        if not files:
            return spark.createDataFrame([], schema)
    df = spark.read.schema(schema).parquet(
        *[f"{root}/data/{f}" for f in files]
    )
    if where_between is not None:
        df = df.filter(F.col(col).between(lo, hi))
    return df
