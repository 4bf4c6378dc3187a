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

from pyspark.sql import DataFrame, SparkSession


def read_manifest(root: str) -> tuple[str | None, list[str]]:
    """Resolve the current (manifest name, live data-file names).
    ``(None, [])`` for a table with no committed version yet."""
    cur = pathlib.Path(root, "CURRENT")
    try:
        name = cur.read_text().strip()
    except FileNotFoundError:
        return None, []
    doc = json.loads(pathlib.Path(root, "manifests", name).read_text())
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


def _flip(
    root: str, files: list[str], note: str, stats: dict | None = None
) -> str:
    """Commit a new version: write manifest m-(seq+1), atomically
    replace CURRENT. The rename is the commit point — a crash before
    it leaves the previous version intact and current. ``stats`` maps
    file name -> [min, max] of the table's stats column (only entries
    for files in this version are kept)."""
    mdir = pathlib.Path(root, "manifests")
    mdir.mkdir(parents=True, exist_ok=True)
    cur, _ = read_manifest(root)
    seq = int(cur.split("-")[1].split(".")[0]) + 1 if cur else 0
    name = f"m-{seq:08d}.json"
    doc = {"files": sorted(files), "note": note}
    if stats:
        doc["stats"] = {f: stats[f] for f in doc["files"] if f in stats}
    (mdir / name).write_text(json.dumps(doc))
    tmp = pathlib.Path(root, f".CURRENT.tmp.{seq}")
    tmp.write_text(name)
    os.replace(tmp, pathlib.Path(root, "CURRENT"))  # atomic POSIX rename
    return name


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
) -> str:
    """Append one micro-batch: write to staging, adopt the files,
    flip CURRENT to (live + new). The ``batch_id`` keys the file names,
    so a foreachBatch RETRY of the same epoch overwrites its own
    staging rather than double-adopting. With ``stats_col`` the new
    manifest also records each adopted file's [min, max] of that
    column (footer-only read), enabling file-level data skipping in
    :func:`read_table` — give every commit of a table the SAME
    stats_col or range reads lose pruning on the uncovered files."""
    root_p = pathlib.Path(root)
    staging = root_p / f".staging-{batch_id}"
    df.write.mode("overwrite").parquet(str(staging))
    data = root_p / "data"
    adopted = _adopt(staging, data, f"b{batch_id:08d}")
    cur, live = read_manifest(root)
    stats = dict(manifest_stats(root, cur)) if cur else {}
    stats.update(_record_stats(data, adopted, _norm_stats_cols(stats_col)))
    # set-union, not concatenation: a foreachBatch RETRY that already
    # flipped re-adopts the same deterministic names — the manifest
    # must list each file once or readers double-count the batch
    return _flip(
        root, sorted(set(live) | set(adopted)),
        f"append batch {batch_id}", stats,
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
    seq = int(cur.split("-")[1].split(".")[0]) + 1
    staging = pathlib.Path(root, f".compact-{seq}")
    scan = spark.read.schema(schema).parquet(*[str(data / f) for f in live])
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
    adopted = _adopt(staging, data, f"c{seq:08d}")
    stats = _record_stats(data, adopted, stats_cols)
    _flip(
        root, adopted, f"compact {len(live)} -> {len(adopted)} files", stats
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
    seq = int(cur.split("-")[1].split(".")[0]) + 1
    staging = pathlib.Path(root, f".merge-{seq}")
    base = (
        spark.read.schema(schema).parquet(*[str(data / f) for f in touched])
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
    adopted = _adopt(staging, data, f"u{seq:08d}")
    stats = dict(manifest_stats(root, cur))
    stats.update(_record_stats(data, adopted, _norm_stats_cols(stats_col)))
    name = _flip(
        root, untouched + adopted,
        f"merge upsert: rewrote {len(touched)} of {len(live)} files",
        stats,
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
    seq = int(cur.split("-")[1].split(".")[0]) + 1
    staging = pathlib.Path(root, f".delete-{seq}")
    base = spark.read.schema(schema).parquet(
        *[str(data / f) for f in touched]
    )
    survivors = base.filter(
        ~F.coalesce(F.col(col).between(lo, hi), F.lit(False))
    )
    survivors.coalesce(max(1, len(touched))).write.mode("overwrite").parquet(
        str(staging)
    )
    adopted = _adopt(staging, data, f"d{seq:08d}")
    stats = dict(manifest_stats(root, cur))
    stats.update(_record_stats(data, adopted, _norm_stats_cols(stats_col)))
    name = _flip(
        root, untouched + adopted,
        f"delete {col} in [{lo}, {hi}]: rewrote {len(touched)} of "
        f"{len(live)} files",
        stats,
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
                F.col(key),
                F.struct(*cols).alias(f"__row_{tag}"),
                F.lit("").alias(f"__h_{tag}"),
            )
        df = spark.read.schema(out_schema).parquet(
            *[str(data / f) for f in files]
        )
        # null-safe payload fingerprint: to_json is deterministic for
        # identical values and both sides hash through the same code
        return df.select(
            F.col(key),
            F.struct(*cols).alias(f"__row_{tag}"),
            F.md5(F.to_json(F.struct(*cols))).alias(f"__h_{tag}"),
        )

    old = _side(removed, "old")
    new = _side(added, "new")
    j = old.join(new, key, "full_outer")
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
