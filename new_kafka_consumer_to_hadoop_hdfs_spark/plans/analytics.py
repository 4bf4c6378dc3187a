"""Round-6/7 capability extensions: storage, warehouse-history, graph,
vector, skew-join, curriculum, runtime-filter, sequence-pattern,
data-quality, and entropy queries.

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

Round 7 adds:

- ``join_bloom_prefilter``       — the runtime-filter technique: a
  deterministic Bloom bitmap from the dim side's qualifying keys
  dropped into the fact scan, verified against the plain-join oracle.
- ``event_path_regex``           — MATCH_RECOGNIZE-style sequence
  pattern matching (sessionize → fold ordered path → regex).
- ``pipeline_expectations_report`` — the Great-Expectations/dbt-test
  family: referential, range, enum, uniqueness, non-emptiness checks
  as one audited report.
- ``sink_parquet_hive_partitioned`` — partitionBy write + directory-
  pruned read-back under the checksum gate (the lake-table layout).
- ``text_char_entropy``          — character-level Shannon entropy +
  distinct-char ratio, the gibberish/binary-junk quality gate.
- ``join_interval_overlap``      — interval-overlap join with NO equi
  key, made hash-joinable by temporal binning (explode to hour bins).
- ``sink_parquet_schema_evolution`` — mergeSchema read across parquet
  file generations that disagree on columns (the lake-table reality).
- ``event_ewma_smoothing``      — recursive sequential aggregation
  (EWMA) as an ordered-list fold, bit-identical across engines.
- ``sim_topk_pq_stored`` lives in plans/llm.py with the other
  similarity queries (train/encode once, score from stored codes).

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
from ._registry import dsum, make_register, persist_bounded

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


@_register("sink_compacted_roundtrip", _orc_roundtrip_oracle())
def sink_compacted_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file COMPACTION under the sink-roundtrip checksum gate —
    the storage-maintenance operator every streaming ingest needs:
    micro-batch appends (the Kafka sink path this engine mirrors, and
    literally what the IVF-PQ index-add test produces) leave hundreds
    of KB-sized files whose per-file open/footer cost eventually
    dominates scans. The build writes the documents table deliberately
    FRAGMENTED (64 shuffle-spread parquet files — the streaming-append
    shape), then compacts to a byte-budgeted file count (~96 MB
    targets, floor 1) with ``coalesce`` — a NARROW rewrite, no
    shuffle: compaction must never pay a corpus exchange just to glue
    files (use AQE ``rebalance`` only when output SKEW, not count, is
    the problem). The build refuses to install an index where
    compaction didn't actually reduce the file count, and the read
    side passes the same per-(lang, source) checksum oracle as the
    other sinks — compaction is byte-invisible to readers, or it
    doesn't ship. At 100 TB this runs per partition/day behind the
    ingest, bounding file counts forever.
    """
    import math
    import pathlib

    from ..sources.cache import cached_materialization
    from .corpus import _DOC_COLS, _DOC_SCHEMA, _roundtrip_checksums

    docs = load_table(spark, sf_dir, "documents").select(*_DOC_COLS)

    def _part_files(d: str) -> list[pathlib.Path]:
        return [
            p for p in pathlib.Path(d).iterdir()
            if p.name.startswith("part-") and p.suffix == ".parquet"
        ]

    def build(tmp: str) -> None:
        frag = tmp + "/frag"
        compact = tmp + "/compact"
        # the streaming-append shape: many small files (repartition is
        # the fixture's fragmenter; production arrives pre-fragmented)
        docs.repartition(64).write.mode("overwrite").parquet(frag)
        frag_files = _part_files(frag)
        total_bytes = sum(p.stat().st_size for p in frag_files)
        target = max(1, math.ceil(total_bytes / (96 << 20)))
        if target >= len(frag_files):  # loud, not silent: the fixture
            raise RuntimeError(  # pragma: no cover - 64-way split of
                # the docs table is always far below 96 MB/file
                f"compaction target {target} >= {len(frag_files)} source files"
            )
        spark.read.schema(_DOC_SCHEMA).parquet(frag).coalesce(target).write.mode(
            "overwrite"
        ).parquet(compact)
        n_after = len(_part_files(compact))
        if n_after > target:
            raise RuntimeError(
                f"compaction produced {n_after} files > target {target}"
            )
        pathlib.Path(tmp, "_SUCCESS").touch()

    dest = cached_materialization(
        pathlib.Path(sf_dir) / "documents.parquet", "documents_compacted", build
    )
    back = spark.read.schema(_DOC_SCHEMA).parquet(f"{dest}/compact")
    return _roundtrip_checksums(back)


@_register("sink_versioned_compaction", _orc_roundtrip_oracle())
def sink_versioned_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-isolated APPEND + ONLINE COMPACTION under the sink
    checksum gate — `sink_compacted_roundtrip`'s missing half. That
    query proves a one-shot rewrite is byte-invisible; this one proves
    the TABLE FORMAT around it: the documents table arrives as 8
    separate appends into a manifest-pointer versioned table
    (`sources/maintenance.py` — immutable data files, a JSON manifest
    per version, CURRENT flipped by atomic rename: the minimal
    Iceberg/Delta commit protocol), compaction runs TWICE between
    appends exactly as it would behind a streaming ingest, superseded
    files are vacuumed, and the read side — resolving the pointer, then
    scanning an immutable file list — must pass the same per-(lang,
    source) checksum oracle as every other sink. Readers never see a
    partial-file window at any interleaving: the mid-stream invariant
    is asserted per-epoch in `test_streaming_append_online_compaction`.

    At 100 TB the manifest shards per partition/day and the pointer
    flip lives in a metastore, but the commit protocol (readers
    resolve an immutable file LIST, never a mutable directory) and the
    narrow no-shuffle compaction are exactly these.
    """
    from ..sources.maintenance import read_table
    from .corpus import _DOC_SCHEMA, _roundtrip_checksums

    dest = _versioned_docs_dest(spark, sf_dir)
    return _roundtrip_checksums(read_table(spark, f"{dest}/table", _DOC_SCHEMA))


def _versioned_docs_dest(spark: SparkSession, sf_dir: str) -> str:
    """Shared build for the versioned-table queries: 8 modulus-sliced
    appends (deterministic membership — batch i holds doc_id % 8 == i)
    with online compactions after appends 3 and 6, then vacuum.
    Cached per sf_dir like every other sink materialization."""
    import pathlib

    from ..sources.cache import cached_materialization
    from ..sources.maintenance import append_batch, compact, vacuum
    from .corpus import _DOC_COLS, _DOC_SCHEMA

    docs = load_table(spark, sf_dir, "documents").select(*_DOC_COLS)

    def build(tmp: str) -> None:
        root = tmp + "/table"
        for i in range(8):
            append_batch(
                docs.filter(F.col("doc_id") % 8 == i).repartition(4),
                root, i,
            )
            if i in (3, 6):  # compact between appends, like the ingest
                reduced = compact(
                    spark, root, _DOC_SCHEMA, target_bytes=8 << 20
                )
                if reduced <= 0:
                    raise RuntimeError(
                        f"online compaction after append {i} was a no-op"
                    )
        if vacuum(root) <= 0:
            raise RuntimeError("vacuum found no superseded files")
        pathlib.Path(tmp, "_SUCCESS").touch()

    return cached_materialization(
        pathlib.Path(sf_dir) / "documents.parquet", "documents_versioned", build
    )


_TIME_TRAVEL_ORACLE = """
SELECT lang, source,
       COUNT(*) AS n_docs,
       SUM(n_chars)::BIGINT AS total_chars,
       bit_xor(doc_id) AS id_checksum,
       bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS text_checksum
FROM documents WHERE doc_id % 8 <= 6 GROUP BY lang, source
"""


@_register("sink_versioned_time_travel", _TIME_TRAVEL_ORACLE)
def sink_versioned_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL on the versioned table: read a HISTORICAL version —
    the snapshot committed by the second online compaction, i.e. the
    table as of append 6 — from the same vacuumed table
    `sink_versioned_compaction` reads at HEAD, and checksum it against
    the oracle's restatement of that point in time (`doc_id % 8 <= 6`:
    append i carries exactly the doc_id % 8 == i slice, so version
    membership is a pure predicate DuckDB can state). A hash match
    proves three things at once: manifests pin immutable file LISTS
    (the 8th append changed CURRENT, not history), the post-compaction
    snapshot's files survived vacuum because they are a subset of the
    live set (the retention rule `list_manifests` documents), and the
    rewrite-then-flip compaction was byte-invisible at the version
    where it happened — Delta/Iceberg `VERSION AS OF`, reduced to its
    commit-protocol core.
    """
    from ..sources.maintenance import list_manifests, read_snapshot
    from .corpus import _DOC_SCHEMA, _roundtrip_checksums

    dest = _versioned_docs_dest(spark, sf_dir)
    root = f"{dest}/table"
    compactions = [n for n, note in list_manifests(root)
                   if note.startswith("compact")]
    if len(compactions) != 2:  # the build commits exactly two
        raise RuntimeError(f"expected 2 compaction commits, got {compactions}")
    return _roundtrip_checksums(
        read_snapshot(spark, root, compactions[-1], _DOC_SCHEMA)
    )


_PRUNED_READ_ORACLE = """
WITH m AS (SELECT MAX(doc_id) + 1 AS h FROM documents)
SELECT lang, source,
       COUNT(*) AS n_docs,
       SUM(n_chars)::BIGINT AS total_chars,
       bit_xor(doc_id) AS id_checksum,
       bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS text_checksum
FROM documents, m
WHERE doc_id * 8 >= 2 * h AND doc_id * 8 < 4 * h
GROUP BY lang, source
"""


@_register("sink_versioned_pruned_read", _PRUNED_READ_ORACLE)
def sink_versioned_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILE-LEVEL DATA SKIPPING through manifest stats — the reason
    table formats carry per-file min/max (Iceberg manifest entries,
    Delta file stats): a range read should OPEN only the files whose
    range overlaps, not scan-and-discard. The documents table arrives
    as 8 RANGE-sliced appends (batch i holds ``doc_id·8 ∈ [i·h,
    (i+1)·h)`` with h = max(doc_id)+1 — the id-clustered shape a
    time-ordered ingest produces naturally on an event-time key), each
    commit recording per-file [min, max] from the parquet footers.
    The table then goes through a CLUSTERED compaction (16 append
    files → 4 range-partitioned files: ``compact(cluster=True)`` pays
    one range shuffle of the rewritten slice so the replacement files
    carry tight disjoint ranges — the range-aware rewrite production
    compactors do, where a naive coalesce would union the ranges and
    destroy pruning). The registered read asks for batches 2-3's id
    range via ``where_between`` and REFUSES to answer if the manifest
    failed to prune (kept must be < live: pruning is load-bearing
    here, not best-effort); the row predicate still applies on top, so
    the checksum oracle — DuckDB restating the same data-derived range
    — proves the pruned post-compaction scan returns exactly the full
    scan's answer.

    h comes from one 1-row max() collect (the q11 data-derived-
    threshold pattern). At 100 TB: pruning granularity is ingest/
    rewrite clustering — this table skips files on an id range because
    appends arrived id-clustered AND the compactor preserved that
    clustering.
    """
    import pathlib

    from ..sources.cache import cached_materialization
    from ..sources.maintenance import (
        append_batch,
        compact,
        pruned_files,
        read_manifest,
        read_table,
        vacuum,
    )
    from .corpus import _DOC_COLS, _DOC_SCHEMA, _roundtrip_checksums

    docs = load_table(spark, sf_dir, "documents").select(*_DOC_COLS)
    h = docs.agg(F.max("doc_id")).first()[0] + 1  # 1-row, data-derived

    def build(tmp: str) -> None:
        _build_range_table(spark, docs, tmp + "/table", h)
        pathlib.Path(tmp, "_SUCCESS").touch()

    dest = cached_materialization(
        pathlib.Path(sf_dir) / "documents.parquet",
        "documents_rangetable_c4s2", build,
    )
    root = f"{dest}/table"
    # batches 2-3 as inclusive id bounds: doc_id*8 in [2h, 4h) ⟺
    # doc_id in [ceil(2h/8), ceil(4h/8) - 1] for integer ids
    lo, hi = (2 * h + 7) // 8, (4 * h + 7) // 8 - 1
    name, live = read_manifest(root)
    kept, total = pruned_files(root, name, "doc_id", lo, hi)
    if not kept or len(kept) >= total:
        raise RuntimeError(
            f"manifest stats failed to prune: kept {len(kept)} of {total}"
        )
    return _roundtrip_checksums(
        read_table(spark, root, _DOC_SCHEMA,
                   where_between=("doc_id", lo, hi))
    )


def _build_range_table(spark: SparkSession, docs: DataFrame, root: str,
                       h: int) -> None:
    """The id-clustered versioned table both range-table queries build
    on: 8 range-sliced appends (batch i = doc_id·8 ∈ [i·h, (i+1)·h))
    with per-file doc_id stats, clustered-compacted 16 → 4 disjoint
    range files, vacuumed."""
    from ..sources.maintenance import append_batch, compact, vacuum
    from .corpus import _DOC_SCHEMA

    for i in range(8):
        append_batch(
            docs.filter(
                (F.col("doc_id") * 8 >= i * h)
                & (F.col("doc_id") * 8 < (i + 1) * h)
            ).repartition(2),
            root, i, stats_col="doc_id",
        )
    reduced = compact(
        spark, root, _DOC_SCHEMA,
        target_files=4, stats_col="doc_id", cluster=True,
    )
    if reduced <= 0:
        raise RuntimeError("clustered compaction was a no-op")
    vacuum(root)


_UPSERT_ORACLE = """
WITH m AS (SELECT MAX(doc_id) + 1 AS h FROM documents),
merged AS (
  SELECT doc_id,
         CASE WHEN doc_id * 8 >= h AND doc_id * 8 < 2 * h
              THEN text || '!' ELSE text END AS text,
         lang, source, n_chars
  FROM documents, m
)
SELECT lang, source,
       COUNT(*) AS n_docs,
       SUM(n_chars)::BIGINT AS total_chars,
       bit_xor(doc_id) AS id_checksum,
       bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS text_checksum
FROM merged GROUP BY lang, source
"""


@_register("sink_versioned_upsert", _UPSERT_ORACLE)
def sink_versioned_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write MERGE under the checksum oracle — Delta/Iceberg
    ``MERGE INTO`` reduced to its commit-protocol core on the same
    clustered table as `sink_versioned_pruned_read`: the update batch
    (batch 1's id band with ``'!'`` appended to each text) must
    rewrite ONLY the files whose stats range can contain its keys —
    the build refuses to install if the merge rewrote every file
    (stats pruning of the WRITE path is load-bearing, the mirror of
    the pruned READ) — and the post-merge table, read through the
    flipped manifest, must checksum-match DuckDB's restatement of the
    merged state over the raw table. Update keys live in one
    contiguous band precisely because the table is key-clustered:
    that is the layout contract that makes copy-on-write affordable,
    and why mutable tables cluster on their merge key. The INSERT arm
    of the upsert (keys matching no file) is pinned separately in
    `test_versioned_merge_upsert_semantics` — a deterministic oracle
    needs an update set DuckDB can restate, and inserts from nowhere
    aren't that.
    """
    import pathlib

    from ..sources.cache import cached_materialization
    from ..sources.maintenance import merge_upsert, read_table
    from .corpus import _DOC_COLS, _DOC_SCHEMA, _roundtrip_checksums

    docs = load_table(spark, sf_dir, "documents").select(*_DOC_COLS)
    h = docs.agg(F.max("doc_id")).first()[0] + 1  # 1-row, data-derived

    def build(tmp: str) -> None:
        root = tmp + "/table"
        _build_range_table(spark, docs, root, h)
        updates = docs.filter(
            (F.col("doc_id") * 8 >= h) & (F.col("doc_id") * 8 < 2 * h)
        ).withColumn("text", F.concat(F.col("text"), F.lit("!")))
        _, rewrote, live = merge_upsert(
            spark, root, _DOC_SCHEMA, updates, "doc_id", stats_col="doc_id"
        )
        if rewrote == 0 or rewrote >= live:
            raise RuntimeError(
                f"merge rewrote {rewrote} of {live} files — stats pruning "
                "of the copy-on-write set failed"
            )
        pathlib.Path(tmp, "_SUCCESS").touch()

    dest = cached_materialization(
        pathlib.Path(sf_dir) / "documents.parquet",
        "documents_rangetable_m1s2", build,
    )
    return _roundtrip_checksums(
        read_table(spark, f"{dest}/table", _DOC_SCHEMA)
    )


@_register("sink_versioned_upsert_mor", _UPSERT_ORACLE)
def sink_versioned_upsert_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ UPSERT under the checksum gate (round 13 — the
    Iceberg v2 delete-file MERGE shape): the EXACT update
    `sink_versioned_upsert` applies by copy-on-write (batch 1's id
    band with ``'!'`` appended) is applied instead as ONE
    position-delete file masking the old images plus the update rows
    appended as new data files — the build REFUSES to install if the
    commit removed or rewrote any data file — and the read, which
    anti-joins the mask and unions the new files, must hash-match the
    SAME oracle as the copy-on-write query. Two strategies, one
    contract: a reader (and the change feed) cannot tell which MERGE
    ran, which is precisely the merge-on-read promise. Cost model at
    100 TB: copy-on-write pays the containing files' bytes at write
    time and nothing at read; merge-on-read pays the victim scan plus
    one anti-join per read until compaction folds the mask — the
    write-heavy/read-heavy trade every production table format
    exposes as a knob.
    """
    import json as _json
    import pathlib

    from ..sources.cache import cached_materialization
    from ..sources.maintenance import (
        merge_upsert_merge_on_read,
        read_table,
    )
    from .corpus import _DOC_COLS, _DOC_SCHEMA, _roundtrip_checksums

    docs = load_table(spark, sf_dir, "documents").select(*_DOC_COLS)
    h = docs.agg(F.max("doc_id")).first()[0] + 1  # 1-row, data-derived

    def build(tmp: str) -> None:
        root = tmp + "/table"
        _build_range_table(spark, docs, root, h)
        updates = docs.filter(
            (F.col("doc_id") * 8 >= h) & (F.col("doc_id") * 8 < 2 * h)
        ).withColumn("text", F.concat(F.col("text"), F.lit("!")))
        name, masked = merge_upsert_merge_on_read(
            spark, root, _DOC_SCHEMA, updates, "doc_id",
            stats_col="doc_id",
        )
        if masked <= 0:
            raise RuntimeError("merge-on-read upsert masked no rows")
        doc = _json.loads(
            pathlib.Path(root, "manifests", name).read_text()
        )
        if "removes" in doc or not doc.get("delete_adds"):
            raise RuntimeError(
                f"merge-on-read upsert rewrote data files: {doc}"
            )
        pathlib.Path(tmp, "_SUCCESS").touch()

    dest = cached_materialization(
        pathlib.Path(sf_dir) / "documents.parquet",
        "documents_rangetable_um1", build,
    )
    return _roundtrip_checksums(
        read_table(spark, f"{dest}/table", _DOC_SCHEMA)
    )


_DELETE_VECTORS_ORACLE = """
WITH m AS (SELECT MAX(doc_id) + 1 AS h FROM documents)
SELECT lang, source,
       COUNT(*) AS n_docs,
       SUM(n_chars)::BIGINT AS total_chars,
       bit_xor(doc_id) AS id_checksum,
       bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS text_checksum
FROM documents, m
WHERE NOT (doc_id * 8 >= h AND doc_id * 8 < 2 * h)
GROUP BY lang, source
"""


@_register("sink_versioned_delete_vectors", _DELETE_VECTORS_ORACLE)
def sink_versioned_delete_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ DELETE under the checksum gate (round 13, VERDICT
    r12 task 2 — Iceberg v2 position deletes / Delta deletion vectors):
    on the same clustered table as `sink_versioned_pruned_read`, batch
    1's id band is deleted by committing a POSITION-DELETE FILE —
    (data file, row position) pairs — instead of rewriting the files
    that contain the victims. The build REFUSES to install unless the
    delete commit's manifest rewrote ZERO data files (the whole point
    of the technique: a delete whose cost is the victim count, not the
    containing files' bytes), and the registered read — which subtracts
    the positions with an anti-join — must checksum-match DuckDB's
    restatement of the surviving rows over the raw table.

    At 100 TB this is the retention/GDPR workhorse: frequent small
    deletes commit in metadata time and fold into the next compaction
    (`test_compact_materializes_mor_deletes` pins that half); the read
    overhead is one broadcast-sized anti-join until then.
    """
    import json as _json
    import pathlib

    from ..sources.cache import cached_materialization
    from ..sources.maintenance import (
        delete_where_merge_on_read,
        read_table,
    )
    from .corpus import _DOC_COLS, _DOC_SCHEMA, _roundtrip_checksums

    docs = load_table(spark, sf_dir, "documents").select(*_DOC_COLS)
    h = docs.agg(F.max("doc_id")).first()[0] + 1  # 1-row, data-derived

    def build(tmp: str) -> None:
        root = tmp + "/table"
        _build_range_table(spark, docs, root, h)
        lo, hi = (h + 7) // 8, (2 * h + 7) // 8 - 1  # batch 1's band
        name, n = delete_where_merge_on_read(
            spark, root, _DOC_SCHEMA, "doc_id", lo, hi, stats_col="doc_id"
        )
        if n <= 0:
            raise RuntimeError("merge-on-read delete found no victims")
        doc = _json.loads(
            pathlib.Path(root, "manifests", name).read_text()
        )
        if "adds" in doc or "removes" in doc or not doc.get("delete_adds"):
            raise RuntimeError(
                f"merge-on-read delete commit rewrote data files: {doc}"
            )
        pathlib.Path(tmp, "_SUCCESS").touch()

    dest = cached_materialization(
        pathlib.Path(sf_dir) / "documents.parquet",
        "documents_rangetable_dv1", build,
    )
    return _roundtrip_checksums(
        read_table(spark, f"{dest}/table", _DOC_SCHEMA)
    )


_POINT_READ_BLOOM_ORACLE = """
WITH probe AS (SELECT (2 * (MAX(doc_id) + 1)) // 3 AS pid FROM documents)
SELECT doc_id, lang, source, n_chars, text
FROM documents, probe
WHERE doc_id = pid
"""


@_register("sink_versioned_point_read_bloom", _POINT_READ_BLOOM_ORACLE)
def sink_versioned_point_read_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOOM-FILTER FILE SKIPPING for point lookups (round 14, VERDICT
    r13 task 7): the documents table is ingested as 8 ROUND-ROBIN
    appends (``doc_id % 8``), so every file's [min, max] range spans
    essentially the whole id domain — range stats are structurally
    USELESS for an equality probe, the layout that defeats
    `sink_versioned_pruned_read`'s mechanism. Each commit also records
    a ~1 KiB per-file Bloom sketch of its doc_ids; the registered
    point read REFUSES to install unless (a) min/max kept every file
    (proving ranges could not prune here) AND (b) the bloom pruned the
    read to a strict subset — pruning evidence, not best-effort. The
    probed row must hash-match DuckDB's restatement of the same
    data-derived id over the raw table; bloom false positives cost a
    scan, never a wrong answer (the row predicate rides on top).

    At 100 TB this is the merge-on-read point-lookup path: a keyed
    CDC reconcile or GDPR subject read probes one key against a table
    whose clustering serves a DIFFERENT dimension — the membership
    sketch is what turns that from a full scan into one file.
    """
    import pathlib

    from ..sources.cache import cached_materialization
    from ..sources.maintenance import (
        append_batch,
        point_pruned_files,
        read_manifest,
        read_point,
    )
    from .corpus import _DOC_COLS, _DOC_SCHEMA

    docs = load_table(spark, sf_dir, "documents").select(*_DOC_COLS)
    h = docs.agg(F.max("doc_id")).first()[0] + 1  # 1-row, data-derived

    def build(tmp: str) -> None:
        root = tmp + "/table"
        for i in range(8):  # round-robin: every file spans the domain
            append_batch(
                docs.filter(F.col("doc_id") % 8 == i).coalesce(1),
                root, i, stats_col="doc_id", bloom_col="doc_id",
            )
        pathlib.Path(tmp, "_SUCCESS").touch()

    dest = cached_materialization(
        pathlib.Path(sf_dir) / "documents.parquet",
        "documents_roundrobin_bloom8", build,
    )
    root = f"{dest}/table"
    probe = (2 * h) // 3
    name, _live = read_manifest(root)
    kept, mm_kept, total = point_pruned_files(root, name, "doc_id", probe)
    if mm_kept < total:
        raise RuntimeError(
            f"round-robin layout leaked range pruning: min/max kept "
            f"{mm_kept} of {total}"
        )
    if not kept or len(kept) >= total:
        raise RuntimeError(
            f"bloom failed to prune where ranges could not: kept "
            f"{len(kept)} of {total}"
        )
    # the evidence pass above already decompressed every sketch: hand
    # its kept list to the read so the prune runs once per query
    return read_point(
        spark, root, _DOC_SCHEMA, "doc_id", probe, kept=kept
    ).select("doc_id", "lang", "source", "n_chars", "text")


_DELETE_EQUALITY_ORACLE = """
WITH m AS (SELECT MAX(doc_id) + 1 AS h FROM documents),
survivors AS (
  SELECT doc_id, text, lang, source, n_chars
  FROM documents, m
  WHERE NOT (doc_id * 8 >= h AND doc_id * 8 < 2 * h)
  UNION ALL
  SELECT doc_id, text || '~' AS text, lang, source, n_chars
  FROM documents, m
  WHERE doc_id * 8 >= h AND doc_id * 8 < 2 * h AND doc_id % 3 = 0
)
SELECT lang, source,
       COUNT(*) AS n_docs,
       SUM(n_chars)::BIGINT AS total_chars,
       bit_xor(doc_id) AS id_checksum,
       bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS text_checksum
FROM survivors
GROUP BY lang, source
"""


@_register("sink_versioned_delete_equality", _DELETE_EQUALITY_ORACLE)
def sink_versioned_delete_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUALITY DELETE under the checksum gate (round 14, VERDICT r13
    task 3 — Iceberg v2 equality delete files): batch 1's id band is
    deleted by committing the KEY VALUES themselves — the build
    REFUSES to install unless the delete commit's manifest touched
    ZERO data files AND resolved zero positions (no adds, removes, or
    position-delete files: where `sink_versioned_delete_vectors` still
    pays a victim scan, this is the no-read-before-write shape a
    streaming CDC upsert needs). A third of the band's keys are then
    RE-APPENDED with ``'~'`` marking their text, and the registered
    read must hash-match DuckDB restating (survivors ∪ restored):
    the data-sequence-number rule — an equality delete masks only
    files STRICTLY OLDER than itself — is load-bearing in the hash
    from both directions (mask too much and the restored rows vanish;
    mask too little and the band resurrects).

    At 100 TB this is the Flink→Iceberg upsert-sink cost model: a
    keyed delete commits in O(its own bytes) wherever the victims
    live; every read pays one broadcast anti-join (keys × older files)
    until compaction folds the mask — pinned by the compact/vacuum
    interplay tests in test_metadata_scale.py.
    """
    import json as _json
    import pathlib

    from ..sources.cache import cached_materialization
    from ..sources.maintenance import (
        append_batch,
        delete_by_key,
        read_table,
    )
    from .corpus import _DOC_COLS, _DOC_SCHEMA, _roundtrip_checksums

    docs = load_table(spark, sf_dir, "documents").select(*_DOC_COLS)
    h = docs.agg(F.max("doc_id")).first()[0] + 1  # 1-row, data-derived

    def build(tmp: str) -> None:
        root = tmp + "/table"
        _build_range_table(spark, docs, root, h)
        band = docs.filter(
            (F.col("doc_id") * 8 >= h) & (F.col("doc_id") * 8 < 2 * h)
        )
        name, n = delete_by_key(
            spark, root, _DOC_SCHEMA, "doc_id", band.select("doc_id")
        )
        if n <= 0:
            raise RuntimeError("equality delete committed no keys")
        doc = _json.loads(
            pathlib.Path(root, "manifests", name).read_text()
        )
        if (
            "adds" in doc
            or "removes" in doc
            or doc.get("delete_adds")
            or not doc.get("eq_delete_adds")
        ):
            raise RuntimeError(
                f"equality delete touched data files or positions: {doc}"
            )
        restored = band.filter(F.col("doc_id") % 3 == 0).withColumn(
            "text", F.concat(F.col("text"), F.lit("~"))
        )
        append_batch(restored.coalesce(1), root, 100, stats_col="doc_id")
        pathlib.Path(tmp, "_SUCCESS").touch()

    dest = cached_materialization(
        pathlib.Path(sf_dir) / "documents.parquet",
        "documents_rangetable_eq1", build,
    )
    return _roundtrip_checksums(
        read_table(spark, f"{dest}/table", _DOC_SCHEMA)
    )


_PARTITIONED_READ_ORACLE = """
SELECT lang, source,
       COUNT(*) AS n_docs,
       SUM(n_chars)::BIGINT AS total_chars,
       bit_xor(doc_id) AS id_checksum,
       bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS text_checksum
FROM documents
WHERE lang = 'en'
GROUP BY lang, source
"""


@_register("sink_versioned_partitioned_read", _PARTITIONED_READ_ORACLE)
def sink_versioned_partitioned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIVE PARTITION COLUMNS in the versioned table (round 13, VERDICT
    r12 task 5): the documents table arrives as two appends
    partitioned by ``lang`` — each adopted file's partition tuple
    lands in the manifest (Iceberg's partition spec in minimal form),
    the physical files do NOT repeat the column (the read re-attaches
    it as a typed literal, how hive/Iceberg serve identity-partition
    columns) — and the registered read asks for one language via
    ``where_partition`` and REFUSES to answer unless partition pruning
    actually dropped files (kept < live: pruning is load-bearing, not
    best-effort; same pattern as `sink_versioned_pruned_read`). The
    checksum oracle — DuckDB restating ``lang = 'en'`` over the raw
    table — proves the pruned, literal-reattached scan returns exactly
    the full predicate's answer.

    At 100 TB a corpus table partitions by (source, language, date);
    partition pruning cuts the file list BEFORE stats pruning, which
    is why both compose in `read_table` in that order.
    """
    import pathlib

    from ..sources.cache import cached_materialization
    from ..sources.maintenance import (
        append_batch,
        partition_pruned_files,
        read_manifest,
        read_table,
    )
    from .corpus import _DOC_COLS, _DOC_SCHEMA, _roundtrip_checksums

    docs = load_table(spark, sf_dir, "documents").select(*_DOC_COLS)

    def build(tmp: str) -> None:
        root = tmp + "/table"
        for i in range(2):  # two partitioned appends, like an ingest
            append_batch(
                docs.filter(F.col("doc_id") % 2 == i).repartition(2),
                root, i, partition_by=("lang",),
            )
        pathlib.Path(tmp, "_SUCCESS").touch()

    dest = cached_materialization(
        pathlib.Path(sf_dir) / "documents.parquet",
        "documents_partitioned_lang2", build,
    )
    root = f"{dest}/table"
    name, _live = read_manifest(root)
    kept, total = partition_pruned_files(root, name, {"lang": "en"})
    if not kept or len(kept) >= total:
        raise RuntimeError(
            f"partition pruning failed: kept {len(kept)} of {total}"
        )
    return _roundtrip_checksums(
        read_table(spark, root, _DOC_SCHEMA,
                   where_partition={"lang": "en"})
    )


_EXPORT_HIVE_ORACLE = """
SELECT lang, source,
       COUNT(*) AS n_docs,
       SUM(n_chars)::BIGINT AS total_chars,
       bit_xor(doc_id) AS id_checksum,
       bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS text_checksum
FROM documents GROUP BY lang, source
"""


@_register("sink_versioned_export_hive", _EXPORT_HIVE_ORACLE)
def sink_versioned_export_hive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZERO-COPY HIVE-LAYOUT RELEASE BUNDLE under the checksum gate
    (round 14, VERDICT r13 task 5 — the export path partitioned
    tables previously lacked): a lang-partitioned versioned table is
    exported with `export_hive_bundle` — every live file HARDLINKED
    into ``lang=<value>/`` directories derived from its manifest
    partition tuple, zero bytes rewritten — and the bundle is re-read
    by a PLAIN Spark parquet scan with hive partition discovery (no
    table-format code on the read side: the point of a release
    bundle). The checksums must match DuckDB restating the whole raw
    documents table, so the path-encoded partition column carries
    exactly the manifest's tuples and no row was dropped, duplicated,
    or mis-partitioned. The flat `export_manifest` still refuses this
    table (pinned in tests) — the bundle IS the prescribed path.

    At 100 TB: a release is one hardlink per file plus the directory
    tree — metadata cost, same as the manifest export for flat tables.
    """
    import pathlib

    from ..sources.cache import cached_materialization
    from ..sources.maintenance import (
        append_batch,
        export_hive_bundle,
    )
    from .corpus import _DOC_COLS, _roundtrip_checksums

    docs = load_table(spark, sf_dir, "documents").select(*_DOC_COLS)

    def build(tmp: str) -> None:
        root = tmp + "/table"
        for i in range(2):
            append_batch(
                docs.filter(F.col("doc_id") % 2 == i).repartition(2),
                root, i, partition_by=("lang",),
            )
        made = export_hive_bundle(root, tmp + "/bundle")
        if not made or not any("lang=" in p for p in made):
            raise RuntimeError(f"bundle export produced no hive dirs: {made}")
        pathlib.Path(tmp, "_SUCCESS").touch()

    dest = cached_materialization(
        pathlib.Path(sf_dir) / "documents.parquet",
        "documents_partitioned_hivebundle1", build,
    )
    back = (
        spark.read.option("basePath", f"{dest}/bundle")
        .parquet(f"{dest}/bundle")
        .select(*_DOC_COLS)
    )
    return _roundtrip_checksums(back)


_CLONE_READ_ORACLE = """
WITH m AS (SELECT MAX(doc_id) + 1 AS h FROM documents)
SELECT lang, source,
       COUNT(*) AS n_docs,
       SUM(n_chars)::BIGINT AS total_chars,
       bit_xor(doc_id) AS id_checksum,
       bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS text_checksum
FROM documents, m
WHERE NOT (doc_id * 8 >= 6 * h AND doc_id * 8 < 7 * h)
GROUP BY lang, source
"""


@_register("sink_versioned_clone_read", _CLONE_READ_ORACLE)
def sink_versioned_clone_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZERO-COPY SHALLOW CLONE under the checksum gate (round 13,
    VERDICT r12 task 6 — Delta ``SHALLOW CLONE``, the dataset-release
    reproducibility primitive): the clustered documents table is
    cloned at HEAD — a metadata-only commit referencing the source's
    immutable files by absolute path; the build REFUSES to install if
    the clone copied any data byte (its ``data/`` must hold exactly
    the one position-delete file the NEXT step commits) — then batch
    6's id band is merge-on-read-deleted ON THE CLONE, and the build
    further refuses if the divergence touched the SOURCE (its live
    set and row count must be unchanged). The registered read scans
    the diverged clone and must checksum-match DuckDB's restatement;
    the source's integrity is pinned by the build guard rather than a
    second registered read (one oracle, two invariants).
    """
    import pathlib

    from ..sources.cache import cached_materialization
    from ..sources.maintenance import (
        clone_table,
        delete_where_merge_on_read,
        read_manifest,
        read_table,
    )
    from .corpus import _DOC_COLS, _DOC_SCHEMA, _roundtrip_checksums

    docs = load_table(spark, sf_dir, "documents").select(*_DOC_COLS)
    h = docs.agg(F.max("doc_id")).first()[0] + 1  # 1-row, data-derived

    def build(tmp: str) -> None:
        src = tmp + "/src"
        dst = tmp + "/clone"
        _build_range_table(spark, docs, src, h)
        _, src_live_before = read_manifest(src)
        # relative refs: source and clone ship as ONE bundle that the
        # cache install renames wholesale (the relocatable shape)
        clone_table(src, dst, paths="relative")
        if pathlib.Path(dst, "data").exists():
            raise RuntimeError("shallow clone copied data files")
        lo, hi = (6 * h + 7) // 8, (7 * h + 7) // 8 - 1  # batch 6's band
        _, n = delete_where_merge_on_read(
            spark, dst, _DOC_SCHEMA, "doc_id", lo, hi, stats_col="doc_id"
        )
        if n <= 0:
            raise RuntimeError("clone divergence deleted no rows")
        clone_data = [
            p.name for p in pathlib.Path(dst, "data").iterdir()
        ]
        if len(clone_data) != 1 or not clone_data[0].startswith("pd"):
            raise RuntimeError(
                f"clone data dir must hold exactly the position-delete "
                f"file, got {clone_data}"
            )
        _, src_live_after = read_manifest(src)
        if src_live_after != src_live_before:
            raise RuntimeError("writing to the clone mutated the source")
        if read_table(spark, src, _DOC_SCHEMA).count() != docs.count():
            raise RuntimeError("the source lost rows to the clone's delete")
        pathlib.Path(tmp, "_SUCCESS").touch()

    dest = cached_materialization(
        pathlib.Path(sf_dir) / "documents.parquet",
        "documents_rangetable_clone1", build,
    )
    return _roundtrip_checksums(
        read_table(spark, f"{dest}/clone", _DOC_SCHEMA)
    )


_CHECKPOINT_READ_ORACLE = """
WITH m AS (SELECT MAX(doc_id) + 1 AS h FROM documents)
SELECT lang, source,
       COUNT(*) AS n_docs,
       SUM(n_chars)::BIGINT AS total_chars,
       bit_xor(doc_id) AS id_checksum,
       bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS text_checksum
FROM documents, m
WHERE doc_id * 12 >= 3 * h AND doc_id * 12 < 5 * h
GROUP BY lang, source
"""


@_register("sink_versioned_checkpoint_read", _CHECKPOINT_READ_ORACLE)
def sink_versioned_checkpoint_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECKPOINT-RELATION DATA SKIPPING (round 13, VERDICT r12 task 1
    — the Delta `_last_checkpoint` / Iceberg manifest-list pattern):
    the documents table arrives as 12 range-sliced appends, each an
    O(delta) manifest; the auto-checkpoint cadence materializes the
    live file/stats relation as a parquet CHECKPOINT at commit 8, and
    the registered range read REFUSES to answer unless (a) the
    checkpoint-backed SPARK pruning path actually ran — a columnar
    filter over typed per-file [min, max] columns plus an O(delta)
    tail replay, not the driver-side Python loop — (b) it pruned
    (kept < live), and (c) its answer equals the Python loop's (the
    two implementations must agree file-for-file). The query band
    deliberately straddles the checkpoint boundary: batch 3 is
    checkpoint-resident, batch 4's files arrive in the replay tail, so
    BOTH halves of the protocol are load-bearing under the oracle.

    At 10⁵-10⁶ files this is the difference between metadata planning
    that scales with the cluster and a driver bottleneck — the one
    remaining scale-killer VERDICT r12 named.
    """
    import pathlib

    from ..sources.cache import cached_materialization
    from ..sources.maintenance import (
        append_batch,
        latest_checkpoint_seq,
        pruned_files,
        pruned_files_spark,
        read_manifest,
        read_table,
    )
    from .corpus import _DOC_COLS, _DOC_SCHEMA, _roundtrip_checksums

    docs = load_table(spark, sf_dir, "documents").select(*_DOC_COLS)
    h = docs.agg(F.max("doc_id")).first()[0] + 1  # 1-row, data-derived

    def build(tmp: str) -> None:
        root = tmp + "/table"
        for i in range(12):
            append_batch(
                docs.filter(
                    (F.col("doc_id") * 12 >= i * h)
                    & (F.col("doc_id") * 12 < (i + 1) * h)
                ).coalesce(1),
                root, i, stats_col="doc_id",
            )
        pathlib.Path(tmp, "_SUCCESS").touch()

    dest = cached_materialization(
        pathlib.Path(sf_dir) / "documents.parquet",
        "documents_rangetable_ckpt12", build,
    )
    root = f"{dest}/table"
    name, live = read_manifest(root)
    from ..sources.maintenance import _seq_of

    if latest_checkpoint_seq(root, _seq_of(name)) is None:
        raise RuntimeError("auto-checkpoint never materialized")
    # batches 3-4 as inclusive id bounds: doc_id*12 in [3h, 5h)
    lo, hi = (3 * h + 11) // 12, (5 * h + 11) // 12 - 1
    via_spark = pruned_files_spark(spark, root, name, "doc_id", lo, hi)
    if via_spark is None:
        raise RuntimeError("checkpoint pruning path declined to run")
    kept, total = via_spark
    if not kept or len(kept) >= total:
        raise RuntimeError(
            f"checkpoint pruning failed: kept {len(kept)} of {total}"
        )
    if via_spark != pruned_files(root, name, "doc_id", lo, hi):
        raise RuntimeError(
            "Spark checkpoint pruning disagrees with the Python loop"
        )
    return _roundtrip_checksums(
        read_table(spark, root, _DOC_SCHEMA,
                   where_between=("doc_id", lo, hi))
    )


_SCHEMA_WIDEN_ORACLE = """
WITH t AS (
  SELECT doc_id,
         CAST(n_chars AS BIGINT) AS n_chars,
         lang AS language,
         CASE WHEN doc_id % 2 = 1 THEN 'b' END AS src_half
  FROM documents
)
SELECT language, src_half,
       COUNT(*) AS n_docs,
       SUM(n_chars)::BIGINT AS total_chars,
       bit_xor(doc_id) AS id_checksum
FROM t GROUP BY language, src_half
"""


@_register("sink_versioned_schema_widen", _SCHEMA_WIDEN_ORACLE)
def sink_versioned_schema_widen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA EVOLUTION on the versioned table under the checksum gate
    (round 12, VERDICT r11 task 6): the documents table arrives in two
    halves across an evolving schema — half A committed under
    (doc_id bigint, n_chars INT, lang) with schema tracking on, then
    three METADATA-ONLY commits (widen n_chars→bigint, rename
    lang→language, add src_half) with no file rewritten, then half B
    appended under the evolved schema. The read resolves every file
    through its pinned field-id mapping (`sources/maintenance.py`
    ``read_evolved``): half A's int32 bytes must surface as bigint,
    its `lang` bytes under the `language` name, and NULL `src_half` —
    the oracle restates the final logical state straight off the raw
    parquet (it knows nothing about field ids), so a by-name
    resolution bug (NULLed rename), a lost cast, or a leaked dropped
    id diverges the checksums. Guards in the build refuse to install
    if the evolution rewrote any data file (metadata-only is the
    contract that makes ALTER TABLE affordable at 100 TB).

    Iceberg semantics pinned by tests (tests/test_schema_evolution.py):
    ids assigned by position at commit, never reused; drop hides ids
    from current reads but time travel still sees the bytes.
    """
    import pathlib

    from ..sources.cache import cached_materialization
    from ..sources.maintenance import (
        add_column,
        append_batch,
        read_evolved,
        read_manifest,
        rename_column,
        table_columns,
        widen_column,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", "lang"
    )

    def build(tmp: str) -> None:
        root = tmp + "/table"
        half_a = docs.filter(F.col("doc_id") % 2 == 0).select(
            "doc_id", F.col("n_chars").cast("int").alias("n_chars"), "lang"
        )
        append_batch(half_a.repartition(3), root, 0, track_schema=True)
        _, files_before = read_manifest(root)
        widen_column(root, "n_chars", "bigint")
        rename_column(root, "lang", "language")
        add_column(root, "src_half", "string")
        _, files_after = read_manifest(root)
        if files_after != files_before:
            raise RuntimeError(
                "schema evolution rewrote data files — must be "
                "metadata-only commits"
            )
        half_b = docs.filter(F.col("doc_id") % 2 == 1).select(
            "doc_id", "n_chars",
            F.col("lang").alias("language"),
            F.lit("b").alias("src_half"),
        )
        append_batch(half_b.repartition(3), root, 1)
        got = [(c["name"], c["type"]) for c in table_columns(root)]
        want = [("doc_id", "bigint"), ("n_chars", "bigint"),
                ("language", "string"), ("src_half", "string")]
        if got != want:
            raise RuntimeError(f"evolved schema drifted: {got}")
        pathlib.Path(tmp, "_SUCCESS").touch()

    dest = cached_materialization(
        pathlib.Path(sf_dir) / "documents.parquet",
        "documents_schema_widen", build,
    )
    return read_evolved(spark, f"{dest}/table").groupBy(
        "language", "src_half"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.expr("bit_xor(doc_id)").alias("id_checksum"),
    )


_ZORDER_ORACLE = """
WITH m AS (
  SELECT MIN(n_chars) + ((MAX(n_chars) - MIN(n_chars)) * 7) // 10 AS lo,
         MAX(n_chars) AS hi
  FROM documents
)
SELECT lang, source,
       COUNT(*) AS n_docs,
       SUM(n_chars)::BIGINT AS total_chars,
       bit_xor(doc_id) AS id_checksum,
       bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS text_checksum
FROM documents, m
WHERE n_chars BETWEEN lo AND hi
GROUP BY lang, source
"""


@_register("sink_versioned_zorder_read", _ZORDER_ORACLE)
def sink_versioned_zorder_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-DIMENSIONAL data skipping via Z-ORDER clustering — Delta's
    ``OPTIMIZE ZORDER BY`` reduced to its core: `sink_versioned_pruned_read`
    proves single-column range clustering (perfect skipping on doc_id,
    none on anything else); here the compactor clusters on the
    INTERLEAVED-BITS Morton key of (doc_id, n_chars) and the manifest
    records per-file [min, max] FOR BOTH columns (column-keyed stats —
    a range on column A can never be pruned by column B's numbers), so
    range reads skip files on EITHER dimension of one physical layout.
    The registered read asks for the top n_chars band through
    ``where_between`` and REFUSES to answer unless the manifest pruned
    on n_chars — and the build refuses to install unless a doc_id band
    ALSO prunes on the same files, the property single-column
    clustering cannot deliver. The checksum oracle (DuckDB restating
    the data-derived n_chars band over the raw table) proves the
    doubly-pruned scan equals the full scan.

    The z-key is pure built-ins (grid-scale, shift, mask, OR — whole-
    stage codegen); ranges come from one 2×min/max agg (the q11
    data-derived-threshold pattern). At 100 TB: the curve trades a
    little per-dimension tightness for coverage of every clustered
    dimension — the standard multi-dim layout when reads filter on
    more than one key; the compaction still pays only one bounded
    range shuffle of the rewritten slice.
    """
    import pathlib

    from ..sources.cache import cached_materialization
    from ..sources.maintenance import (
        append_batch,
        compact,
        pruned_files,
        read_manifest,
        read_table,
        vacuum,
        zorder32,
    )
    from .corpus import _DOC_COLS, _DOC_SCHEMA, _roundtrip_checksums

    docs = load_table(spark, sf_dir, "documents").select(*_DOC_COLS)
    r = docs.agg(
        F.min("doc_id"), F.max("doc_id"), F.min("n_chars"), F.max("n_chars")
    ).first()  # 1 row, data-derived grid ranges
    dlo, dhi, nlo, nhi = int(r[0]), int(r[1]), int(r[2]), int(r[3])

    def band_top30(lo: int, hi: int) -> tuple[int, int]:
        return lo + ((hi - lo) * 7) // 10, hi

    def build(tmp: str) -> None:
        root = tmp + "/table"
        append_batch(docs.repartition(16), root, 0)  # fragmented arrival
        reduced = compact(
            spark, root, _DOC_SCHEMA,
            target_files=8,
            cluster=True,
            cluster_expr=zorder32(
                F.col("doc_id"), F.col("n_chars"), (dlo, dhi), (nlo, nhi)
            ),
            stats_col=("doc_id", "n_chars"),
        )
        if reduced <= 0:
            raise RuntimeError("z-order compaction was a no-op")
        vacuum(root)
        # the multi-dimensional property: the SAME layout must prune on
        # the doc_id dimension too, or it's just n_chars clustering
        name, live = read_manifest(root)
        dkept, dtotal = pruned_files(
            root, name, "doc_id", *band_top30(dlo, dhi)
        )
        if not dkept or len(dkept) >= dtotal:
            raise RuntimeError(
                f"z-order failed to prune on doc_id: kept {len(dkept)} of "
                f"{dtotal}"
            )
        pathlib.Path(tmp, "_SUCCESS").touch()

    dest = cached_materialization(
        pathlib.Path(sf_dir) / "documents.parquet",
        "documents_zorder8", build,
    )
    root = f"{dest}/table"
    lo, hi = band_top30(nlo, nhi)
    name, _ = read_manifest(root)
    kept, total = pruned_files(root, name, "n_chars", lo, hi)
    if not kept or len(kept) >= total:
        raise RuntimeError(
            f"manifest stats failed to prune on n_chars: kept {len(kept)} "
            f"of {total}"
        )
    return _roundtrip_checksums(
        read_table(spark, root, _DOC_SCHEMA,
                   where_between=("n_chars", lo, hi))
    )


def _cdf_table(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Shared build for the change-data-feed queries: the id-clustered
    range table (`_build_range_table`: 8 appends, clustered compaction,
    vacuum) followed by a three-commit change window — a copy-on-write
    UPDATE of band 1 ('!' post-images), a pure INSERT (band 2 shifted
    past max id), and a stats-pruned range DELETE of band 6 — with NO
    vacuum afterwards (the CDF reads the superseded files: the
    retention horizon). Returns (table root, the pre-window manifest
    name). Every commit's write-path pruning is gated, so the cached
    table can't install with a degenerate layout."""
    import pathlib

    from ..sources.cache import cached_materialization
    from ..sources.maintenance import (
        delete_where,
        list_manifests,
        merge_upsert,
    )
    from .corpus import _DOC_COLS, _DOC_SCHEMA

    docs = load_table(spark, sf_dir, "documents").select(*_DOC_COLS)
    h = docs.agg(F.max("doc_id")).first()[0] + 1  # 1-row, data-derived

    def build(tmp: str) -> None:
        root = tmp + "/table"
        _build_range_table(spark, docs, root, h)  # appends+cluster+vacuum

        # commit 1: copy-on-write UPDATE of band 1 ('!' post-images)
        updates = docs.filter(
            (F.col("doc_id") * 8 >= h) & (F.col("doc_id") * 8 < 2 * h)
        ).withColumn("text", F.concat(F.col("text"), F.lit("!")))
        _, rewrote, live = merge_upsert(
            spark, root, _DOC_SCHEMA, updates, "doc_id", stats_col="doc_id"
        )
        if rewrote == 0 or rewrote >= live:
            raise RuntimeError(
                f"update merge rewrote {rewrote} of {live} files — write-"
                "path stats pruning failed"
            )
        # commit 2: pure INSERT (band 2 shifted past max id — no file
        # can contain these keys, so the merge must rewrite nothing)
        inserts = docs.filter(
            (F.col("doc_id") * 8 >= 2 * h) & (F.col("doc_id") * 8 < 3 * h)
        ).withColumn("doc_id", F.col("doc_id") + F.lit(h))
        _, rewrote, _ = merge_upsert(
            spark, root, _DOC_SCHEMA, inserts, "doc_id", stats_col="doc_id"
        )
        if rewrote != 0:
            raise RuntimeError(
                f"insert merge rewrote {rewrote} files — stats said keys "
                "beyond every range could match"
            )
        # commit 3: stats-pruned range DELETE of band 6 (pre-images)
        lo6 = (6 * h + 7) // 8
        hi6 = (7 * h + 7) // 8 - 1
        _, rewrote, live = delete_where(
            spark, root, _DOC_SCHEMA, "doc_id", lo6, hi6,
            stats_col="doc_id",
        )
        if rewrote == 0 or rewrote >= live:
            raise RuntimeError(
                f"range delete rewrote {rewrote} of {live} files — write-"
                "path stats pruning failed"
            )
        # NO vacuum here: the CDF window below still reads the removed
        # files (the retention horizon the docstring documents)
        pathlib.Path(tmp, "_SUCCESS").touch()

    dest = cached_materialization(
        pathlib.Path(sf_dir) / "documents.parquet",
        "documents_rangetable_cdfs2", build,
    )
    root = f"{dest}/table"
    compactions = [n for n, note in list_manifests(root)
                   if note.startswith("compact")]
    if len(compactions) != 1:  # the build commits exactly one
        raise RuntimeError(f"expected 1 compaction commit, got {compactions}")
    return root, compactions[-1]


_CHANGES_ORACLE = """
WITH m AS (SELECT MAX(doc_id) + 1 AS h FROM documents),
ch AS (
  SELECT doc_id, text || '!' AS text, lang, source, n_chars,
         'update_post' AS _change
  FROM documents, m WHERE doc_id * 8 >= h AND doc_id * 8 < 2 * h
  UNION ALL
  SELECT doc_id + h AS doc_id, text, lang, source, n_chars,
         'insert' AS _change
  FROM documents, m WHERE doc_id * 8 >= 2 * h AND doc_id * 8 < 3 * h
  UNION ALL
  SELECT doc_id, text, lang, source, n_chars, 'delete' AS _change
  FROM documents, m WHERE doc_id * 8 >= 6 * h AND doc_id * 8 < 7 * h
)
SELECT _change, lang, source,
       COUNT(*) AS n_docs,
       SUM(n_chars)::BIGINT AS total_chars,
       bit_xor(doc_id) AS id_checksum,
       bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS text_checksum
FROM ch GROUP BY _change, lang, source
"""


@_register("sink_versioned_changes", _CHANGES_ORACLE)
def sink_versioned_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED on the versioned table — Delta CDF / Iceberg
    incremental read reduced to its commit-protocol core: consume the
    row-level diff of a three-commit window (a copy-on-write UPDATE
    merge, a pure-INSERT merge, and a stats-pruned range DELETE — the
    new `delete_where` verb) on the same id-clustered table as
    `sink_versioned_pruned_read`, without replaying any log. The feed
    is a manifest DIFF (files removed vs added across the window) plus
    a key-level reconciliation over JUST those files, so rows a
    rewrite carried verbatim (same-file neighbors of the changed
    bands — most of each rewritten file) are ballast the feed must
    DROP, while band-1 keys surface as ``update_post`` post-images,
    shifted new keys as ``insert``, and band-6 pre-images as
    ``delete``. Every arm is a deterministic id-band predicate, so
    DuckDB restates the exact change set from the raw table and the
    checksum oracle pins all three classifications at once.

    Scale contract: the diff join is bounded by the window's churn
    (the files three commits touched), never the table — an
    incremental consumer pays for what changed. The build deliberately
    does NOT vacuum after the window opens: CDF is exactly the reason
    retention horizons exist, and `changes` raises loudly if vacuum
    beat the reader to a file (pinned in
    `test_versioned_changes_semantics`).
    """
    from ..sources.maintenance import changes
    from .corpus import _DOC_SCHEMA

    root, from_name = _cdf_table(spark, sf_dir)
    feed = changes(spark, root, _DOC_SCHEMA, "doc_id", from_name)
    return feed.groupBy("_change", "lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.expr("bit_xor(doc_id)").alias("id_checksum"),
        F.expr(
            "bit_xor(cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint))"
        ).alias("text_checksum"),
    )


_IVM_ORACLE = """
WITH m AS (SELECT MAX(doc_id) + 1 AS h FROM documents),
post AS (
  SELECT doc_id,
         CASE WHEN doc_id * 8 >= h AND doc_id * 8 < 2 * h
              THEN text || '!' ELSE text END AS text,
         lang, source, n_chars
  FROM documents, m
  WHERE NOT (doc_id * 8 >= 6 * h AND doc_id * 8 < 7 * h)
  UNION ALL
  SELECT doc_id + h AS doc_id, text, lang, source, n_chars
  FROM documents, m WHERE doc_id * 8 >= 2 * h AND doc_id * 8 < 3 * h
)
SELECT lang, source,
       COUNT(*) AS n_docs,
       SUM(n_chars)::BIGINT AS total_chars,
       bit_xor(doc_id) AS id_checksum,
       bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS text_checksum
FROM post GROUP BY lang, source
"""


@_register("sink_versioned_incremental_agg", _IVM_ORACLE)
def sink_versioned_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL VIEW MAINTENANCE through the change feed: refresh a
    materialized per-(lang, source) aggregate by applying the CDF
    deltas of `sink_versioned_changes`' three-commit window to the
    aggregate of the OLD snapshot — never rescanning the table. The
    feed runs with ``update_preimages=True`` (Delta CDF's preimage/
    postimage pair): linear measures ADD the insert/update_post rows
    and SUBTRACT the update_pre/delete rows (count via ±1, sums via
    ±n_chars), and the XOR checksums fold in every delta row unsigned
    — xor is its own inverse, so retracting a pre-image IS xoring it
    back out, which lets even the md5-xor fingerprint be maintained
    incrementally. Groups whose maintained count reaches zero drop out
    (a fully-deleted group must vanish, not linger at 0). The oracle
    restates the POST-state aggregate from the raw table, so a hash
    match proves old-aggregate + deltas ≡ recompute-from-scratch —
    the IVM contract.

    At 100 TB this is the point of a CDF: the refresh costs
    O(churn) + O(|view|) (the delta aggregation and the outer join on
    the view key), while recompute costs O(table). The view-key join
    broadcasts when the view is small; both inputs partition on the
    same key otherwise.
    """
    from ..sources.maintenance import changes, read_snapshot
    from .corpus import _DOC_SCHEMA, _roundtrip_checksums

    root, from_name = _cdf_table(spark, sf_dir)
    base = _roundtrip_checksums(
        read_snapshot(spark, root, from_name, _DOC_SCHEMA)
    )
    feed = changes(
        spark, root, _DOC_SCHEMA, "doc_id", from_name,
        update_preimages=True,
    )
    sign = F.when(
        F.col("_change").isin("insert", "update_post"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = feed.groupBy("lang", "source").agg(
        F.sum(sign).alias("__dn"),
        F.sum(sign * F.col("n_chars")).alias("__dchars"),
        F.expr("bit_xor(doc_id)").alias("__dxid"),
        F.expr(
            "bit_xor(cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint))"
        ).alias("__dxtext"),
    )
    z = F.lit(0).cast("long")
    merged = base.join(delta, ["lang", "source"], "full_outer").select(
        "lang",
        "source",
        (F.coalesce(F.col("n_docs"), z) + F.coalesce(F.col("__dn"), z))
        .alias("n_docs"),
        (F.coalesce(F.col("total_chars"), z)
         + F.coalesce(F.col("__dchars"), z)).alias("total_chars"),
        F.coalesce(F.col("id_checksum"), z)
        .bitwiseXOR(F.coalesce(F.col("__dxid"), z)).alias("id_checksum"),
        F.coalesce(F.col("text_checksum"), z)
        .bitwiseXOR(F.coalesce(F.col("__dxtext"), z)).alias("text_checksum"),
    )
    return merged.filter(F.col("n_docs") > 0)


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
    chg = F.when(
        ~F.col("event_type").eqNullSafe(F.lag("event_type").over(w)), 1
    ).otherwise(0)
    flagged = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.sum(chg)
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
    relation under degree-ordered orientation (see
    `operators.graph.triangle_counts` for the O(m^1.5) wedge bound).
    Durability matches the other graph queries: set
    SPARK_GRAFT_CHECKPOINT_DIR for reliable checkpoints on a cluster.
    """
    import os

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
    return triangle_counts(
        edges,
        checkpoint_dir=os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR") or None,
    ).select(F.col("node").alias("node"), "n_triangles")


# ---------------------------------------------------------------------------
# Multi-source BFS reachability over the near-dup graph
# ---------------------------------------------------------------------------

_BFS_HOPS = 4


def _bfs_oracle() -> str:
    """Unrolled multi-source BFS in DuckDB over the SAME exact Jaccard
    ≥ 0.6 edge set as the other graph queries: d0 = the seed layer,
    d_{i} = min-dist after expanding one more hop (UNION ALL + GROUP
    BY MIN — monotone, so extra rounds past the eccentricity are
    no-ops, matching the Spark side's early exit)."""
    from .llm import _SQL_JACCARD, _SQL_TOKENS, _SQL_WORD_SHINGLES

    sql = f"""
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
edges AS (
  SELECT da AS src, db AS dst FROM pairs
  UNION ALL
  SELECT db AS src, da AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
d0 AS (SELECT node, 0 AS dist FROM nodes WHERE node % 2 = 0)"""
    for i in range(1, _BFS_HOPS + 1):
        sql += f""",
d{i} AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d{i - 1}
    UNION ALL
    SELECT e.dst AS node, r.dist + 1 AS dist
    FROM edges e JOIN d{i - 1} r ON e.src = r.node
  ) GROUP BY node
)"""
    sql += f"""
SELECT node AS doc_id, dist FROM d{_BFS_HOPS}
"""
    return sql


@_register("pipeline_graph_bfs_reach", _bfs_oracle())
def pipeline_graph_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS reachability over the EXACT near-dup graph
    (word-3-gram Jaccard ≥ 0.6, symmetrized — the shared edge set of
    the graph family): minimum hop distance from the even-doc_id seed
    set, capped at 4 hops. This is the BLAST-RADIUS question a corpus
    pipeline asks when a contaminated/benchmark document is found —
    "every document within k near-dup hops inherits suspicion" — and
    the fourth graph primitive next to connected components, PageRank,
    and triangles: those compute global structure, BFS computes
    DISTANCE FROM A QUERY SET, which closure-based components cannot
    express (a component says reachable, not how far).

    Plan: edge generation is the bucketed prefix-filter join (no
    cartesian); each BFS round joins only the NEWLY-discovered
    frontier against the pair-graph-sized edge relation and early-
    exits when a round finds nothing (near-dup components have
    diameter 1-2, so the 4-hop cap is slack, not cost — the oracle's
    extra unrolled rounds are no-ops by min-monotonicity). Rounds are
    checkpointed; integer output, so the hash gate is exact with no
    float caveat. Set SPARK_GRAFT_CHECKPOINT_DIR for reliable
    checkpoints on a cluster.
    """
    import os

    from ..operators.graph import bfs_distances
    from ..operators.text import (
        jaccard_verify_elements,
        prefix_filter_candidate_pairs,
        shingle_elements,
    )

    d = load_table(spark, sf_dir, "documents")
    ex = persist_bounded(shingle_elements(d, "doc_id", "text", n=3))
    cands = prefix_filter_candidate_pairs(ex, "doc_id", threshold=0.6)
    pairs = jaccard_verify_elements(cands, ex, "doc_id", threshold=0.6).select(
        "doc_id_a", "doc_id_b"
    )
    edges = pairs.select(
        F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst")
    ).union(
        pairs.select(
            F.col("doc_id_b").alias("src"), F.col("doc_id_a").alias("dst")
        )
    )
    # seeds derive from the operator's checkpointed edges (callable
    # form): the LSH candidate + verify pipeline is computed exactly
    # once — a DataFrame seed here would re-run it for the seed scan
    reach = bfs_distances(
        edges,
        lambda e: e.select(F.col("src").alias("node"))
        .distinct()
        .filter(F.col("node") % 2 == 0),
        max_hops=_BFS_HOPS,
        checkpoint_dir=os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR") or None,
    )
    return reach.select(F.col("node").alias("doc_id"), "dist")


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
    # 64-row offset table, fully distributed (r15): cumulative counts
    # via a global-order window over the (stage, shard) aggregate —
    # 64 rows at ANY corpus size, so the single-partition window is
    # free — instead of an eager driver collect + Python running sum.
    # Same integers, one fewer job boundary: the offset aggregation now
    # rides the main query's execution (as the broadcast build side)
    # rather than running as its own construct-time job. A/B at sf0.1
    # (min of 5, in-session): 0.76 → 0.67 s.
    counts = keyed.groupBy("stage", "shard").agg(F.count(F.lit(1)).alias("__n"))
    wbase = Window.orderBy("stage", "shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    base_df = counts.select(
        "stage",
        "shard",
        F.coalesce(F.sum("__n").over(wbase), F.lit(0)).alias("base"),
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
    # BOTH percentiles from ONE aggregate (r15): percentile over an
    # array of fractions buffers/serializes each group's values once —
    # two scalar percentile calls each carried their own full-group
    # buffer through the partial-agg exchange and merge (Spark's
    # percentile is a TypedImperativeAggregate: the buffer IS the value
    # multiset). Identical interpolation, identical doubles, half the
    # buffer traffic; in-session interleaved A/B at sf0.1 (min of 7):
    # 1.23 → 0.99 s.
    agg = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(
            F.sum("__gap_us").cast("double")
            / (F.count(F.lit(1)) * F.lit(1000000.0)),
            6,
        ).alias("avg_gap_sec"),
        F.expr("percentile(__gap_us / 1000000.0, array(0.5, 0.95))").alias(
            "__p"
        ),
    )
    return agg.select(
        "event_type",
        "n_gaps",
        "avg_gap_sec",
        F.round(F.col("__p")[0], 6).alias("p50_gap_sec"),
        F.round(F.col("__p")[1], 6).alias("p95_gap_sec"),
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


# ===========================================================================
# Round-7 capability extensions: runtime-filter join, sequence pattern
# matching, data-quality expectations, hive-partitioned storage layout,
# and character-entropy quality scoring.
# ===========================================================================


_BLOOM_JOIN_ORACLE = """
SELECT s_suppkey, s_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
GROUP BY s_suppkey, s_name
"""


@_register("join_bloom_prefilter", _BLOOM_JOIN_ORACLE)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per NATION_3 supplier with the fact side pre-filtered by a
    BLOOM FILTER built from the qualifying supplier keys — the
    runtime-filter technique (Spark's adaptive
    `runtime.bloomFilter` rule injects the same shape automatically
    when statistics allow; here it is explicit and deterministic so
    the plain-join oracle can gate it).

    Semantics are exact by construction: the Bloom filter only ever
    PASSES a superset of matching keys (false positives, never false
    negatives), and the exact join downstream removes the strays — so
    the oracle is the unfiltered 3-table join. What the filter buys at
    100 TB: lineitem rows whose l_suppkey cannot match are dropped in
    the SCAN stage, before the join exchange — with a selective dim
    predicate (1 nation of 25) that is ~96% of the fact table never
    shuffled, for an 8 KB bitmap shipped in the plan. Honest caveat at
    fixture scale: the supplier side is broadcast anyway, so the bloom
    is pure overhead here; the query exists to put the
    small-side-too-big-to-broadcast technique under the oracle gate
    (`join_salted_skew`'s evidence pattern).
    """
    from ..operators.skew import bloom_prefilter

    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    pre = bloom_prefilter(li, s, "l_suppkey", "s_suppkey")
    return (
        pre.join(F.broadcast(s), pre.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# Shared 30-minute-gap sessionization (lag + running-sum islands),
# used by BOTH `event_path_regex` and `join_interval_overlap` — one
# definition per engine so a gap or tie-break change cannot
# desynchronize the two queries or their oracles (ADVICE r7).
_SESSIONIZE_SQL = """seq AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
ids AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM seq
)"""


def _sessionized_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, ts, event_id, event_type, session_id) under the
    30-minute inactivity gap — the Spark twin of ``_SESSIONIZE_SQL``.
    ONE user_id shuffle shared by the lag window and the island sum;
    downstream projections prune the unused columns."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    is_new = F.when(
        F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES"),
        1,
    ).otherwise(0)
    return ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )


_PATH_REGEX_ORACLE = f"""
WITH {_SESSIONIZE_SQL},
paths AS (
  SELECT user_id, session_id,
         MIN(ts) AS session_start,
         COUNT(*)::BIGINT AS n_events,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM ids GROUP BY user_id, session_id
)
SELECT user_id, session_start, n_events, path
FROM paths
WHERE regexp_matches('>' || path || '>',
                     '>view>(.*>)?purchase>')
"""


@_register("event_path_regex", _PATH_REGEX_ORACLE)
def event_path_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessions whose ordered event path matches the funnel pattern
    view → purchase (any events interleaved; the three-stage
    view→click→purchase variant matches zero sessions in the synthetic
    data, and a vacuously-empty result would gate nothing) — the
    MATCH_RECOGNIZE / sequence-pattern family, built from primitives
    Spark has: sessionize (30-min gap, lag+running-sum islands), fold
    each session's ordered types into one '>'-joined path string, and
    regex-match the wrapped path. Unlike `event_funnel_stages` (which
    counts users reaching each stage) this returns the matching
    SESSIONS with their full paths — the audit view a growth team
    reads.

    Determinism: the path is built from `array_sort` over collected
    (ts, event_id, type) structs — the (ts, event_id) total order both
    engines agree on — and the pattern is wrapped in '>' delimiters so
    token boundaries are explicit (adjacent stages still match via the
    optional `(.*>)?` groups).

    Scale: ONE shuffle of the event stream on user_id shared by the
    lag window, the island sum, and the per-session fold; per-session
    state is bounded by session length (collect_list of a session, not
    a user history). The regex runs on the folded path — one string op
    per session, not per event.
    """
    sess = _sessionized_events(spark, sf_dir)
    paths = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path"),
    )
    return paths.filter(
        F.concat(F.lit(">"), F.col("path"), F.lit(">")).rlike(
            ">view>(.*>)?purchase>"
        )
    ).select("user_id", "session_start", "n_events", "path")


_EXPECTATIONS_ORACLE = """
SELECT 'orders_custkey_in_customer' AS expectation,
       (SELECT COUNT(*) FROM orders)::BIGINT AS n_checked,
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))::BIGINT AS n_failed
UNION ALL
SELECT 'lineitem_quantity_in_1_50',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem
        WHERE l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50)
UNION ALL
SELECT 'orders_status_enum',
       (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(*) FROM orders
        WHERE o_orderstatus IS NULL OR o_orderstatus NOT IN ('O', 'F', 'P'))
UNION ALL
SELECT 'events_event_id_unique',
       (SELECT COUNT(*) FROM events),
       (SELECT COUNT(*) - COUNT(DISTINCT event_id) FROM events)
UNION ALL
SELECT 'documents_text_nonempty',
       (SELECT COUNT(*) FROM documents),
       (SELECT COUNT(*) FROM documents
        WHERE text IS NULL OR length(text) = 0)
UNION ALL
SELECT 'customer_acctbal_nonnegative',
       (SELECT COUNT(*) FROM customer),
       (SELECT COUNT(*) FROM customer
        WHERE c_acctbal IS NULL OR c_acctbal < 0)
"""


@_register("pipeline_expectations_report", _EXPECTATIONS_ORACLE)
def pipeline_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations audit (the Great-Expectations /
    dbt-test family): one row per declared expectation with checked
    and failed counts — referential integrity (orders→customer), range
    (quantity ∈ [1, 50]), enum membership (order status), uniqueness
    (event_id), non-emptiness (document text), and one expectation
    that legitimately FAILS on TPC-H data (acctbal ≥ 0 — customers can
    carry debt), so the report demonstrably reports failures instead
    of rubber-stamping.

    A training-data pipeline runs exactly this before every ingest:
    the report is the contract between upstream landing and downstream
    consumption. NULLs count as failures everywhere (an unknown value
    cannot satisfy a constraint — the dbt-test convention).

    Scale: each expectation is one scan + count aggregate over its own
    table (map-side combinable, no shuffle beyond the 1-row partials);
    the referential check is a broadcast-able anti-join on the key
    column only; uniqueness is count vs count-distinct, no join. The
    union of six 1-row aggregates is driver-trivial.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    documents = load_table(spark, sf_dir, "documents")

    def expect(name: str, df: DataFrame, fail: F.Column) -> DataFrame:
        return df.agg(
            F.lit(name).alias("expectation"),
            F.count(F.lit(1)).alias("n_checked"),
            F.sum(F.when(fail, 1).otherwise(0)).alias("n_failed"),
        )

    orphans = orders.join(
        customer.select(F.col("c_custkey").alias("o_custkey")),
        "o_custkey",
        "left_anti",
    )
    referential = orphans.agg(F.count(F.lit(1)).alias("__orphans")).crossJoin(
        orders.agg(F.count(F.lit(1)).alias("__total"))
    ).select(
        F.lit("orders_custkey_in_customer").alias("expectation"),
        F.col("__total").alias("n_checked"),
        F.col("__orphans").alias("n_failed"),
    )
    q = F.col("l_quantity")
    st = F.col("o_orderstatus")
    tx = F.col("text")
    ab = F.col("c_acctbal")
    uniqueness = events.agg(
        F.lit("events_event_id_unique").alias("expectation"),
        F.count(F.lit(1)).alias("n_checked"),
        (F.count(F.lit(1)) - F.countDistinct("event_id")).alias("n_failed"),
    )
    return (
        referential
        .unionByName(
            expect("lineitem_quantity_in_1_50", lineitem,
                   q.isNull() | (q < 1) | (q > 50))
        )
        .unionByName(
            expect("orders_status_enum", orders,
                   st.isNull() | ~st.isin("O", "F", "P"))
        )
        .unionByName(uniqueness)
        .unionByName(
            expect("documents_text_nonempty", documents,
                   tx.isNull() | (F.length(tx) == 0))
        )
        .unionByName(
            expect("customer_acctbal_nonnegative", customer,
                   ab.isNull() | (ab < 0))
        )
    )


def _hive_partitioned_oracle() -> str:
    from .corpus import _ROUNDTRIP_ORACLE

    filtered = _ROUNDTRIP_ORACLE.replace(
        "FROM documents GROUP BY lang, source",
        "FROM documents WHERE lang IN ('en', 'de') GROUP BY lang, source",
    )
    # a silent no-op replace (after a rewording of the base oracle)
    # would quietly compare the PRUNED read against the UNFILTERED
    # table — fail here, at the dependency, not at a hash mismatch
    assert filtered != _ROUNDTRIP_ORACLE, (
        "_ROUNDTRIP_ORACLE reworded: update the WHERE-variant anchor"
    )
    return filtered


@_register("sink_parquet_hive_partitioned", _hive_partitioned_oracle())
def sink_parquet_hive_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-layout partitioned parquet: write documents with
    ``partitionBy("lang")`` (one ``lang=<v>/`` directory per value —
    the layout every lake table uses for its coarse filter column),
    read back, and checksum ONLY two languages — so the read is
    directory-PRUNED: Spark's scan lists lang=en/ and lang=de/ and
    never opens the other three partitions' files
    (tests/test_plan_shapes.py pins PartitionFilters on the scan).
    The oracle computes the same checksums from the original table
    WHERE lang IN ('en','de'), so a hash match proves both write
    fidelity AND that pruning did not drop or duplicate rows.

    Completes the sink matrix: jsonl/csv (text), ORC (columnar), and
    now partitioned parquet (layout). At 100 TB partition pruning IS
    the first-order scan optimization — a 5-value partition column
    cuts this read by 3/5 before a single row group is touched; the
    same layout written per day/source keeps incremental consumers
    from ever scanning history.
    """
    import pathlib

    from ..sources.cache import cached_materialization
    from .corpus import _DOC_COLS, _DOC_SCHEMA, _roundtrip_checksums

    docs = load_table(spark, sf_dir, "documents").select(*_DOC_COLS)

    def build(tmp: str) -> None:
        docs.write.mode("overwrite").partitionBy("lang").parquet(tmp)

    dest = cached_materialization(
        pathlib.Path(sf_dir) / "documents.parquet", "documents_hivepart", build
    )
    back = spark.read.schema(_DOC_SCHEMA).parquet(dest)
    return _roundtrip_checksums(back.filter(F.col("lang").isin("en", "de")))


_CHAR_ENTROPY_ORACLE = """
WITH chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
),
counts AS (
  SELECT doc_id, ch, COUNT(*)::DOUBLE AS c
  FROM chars WHERE len(ch) > 0 GROUP BY doc_id, ch
),
per_doc AS (
  SELECT doc_id, SUM(c) AS n, SUM(c * ln(c)) AS clc,
         COUNT(*)::BIGINT AS n_distinct
  FROM counts GROUP BY doc_id
)
SELECT doc_id,
       ROUND(ln(n) - clc / n, 6) AS char_entropy_nats,
       ROUND(n_distinct / n, 6) AS distinct_char_ratio,
       n::BIGINT AS n_chars_counted
FROM per_doc
"""


@_register("text_char_entropy", _CHAR_ENTROPY_ORACLE)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-level Shannon entropy (nats) plus
    distinct-character ratio — the classic gibberish/binary-junk gate
    (CCNet/RefinedWeb-style pipelines drop both tails: near-zero
    entropy = one character repeated, i.e. padding or corrupt decode;
    abnormally high = base64 blobs, minified code, random bytes).
    Completes the quality-signal set next to the token-level
    (`text_quality_score`, Gopher rules) and n-gram-level
    (`text_repetition_stats`) gates.

    Entropy is computed as ln(n) − Σc·ln(c)/n over per-character
    counts — the algebraic form whose inputs are INTEGER counts, so
    both engines take ln of the same exact values and the only
    cross-engine drift is float summation order, absorbed by the
    round-6 output (the `text_bigram_surprisal` determinism pattern).

    Scale: explode-to-characters is the corpus's one heavy map-side
    op (rows × chars), but the (doc_id, ch) partial aggregation
    combines map-side — the shuffle carries ≤ |alphabet| rows per doc,
    not one per character; the second aggregation reuses the doc_id
    clustering. No windows, no joins.
    """
    d = load_table(spark, sf_dir, "documents")
    chars = d.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch")
    ).filter(F.length("ch") > 0)
    counts = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.log("c")).alias("clc"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    return per_doc.select(
        "doc_id",
        F.round(F.log("n") - F.col("clc") / F.col("n"), 6).alias(
            "char_entropy_nats"
        ),
        F.round(F.col("n_distinct") / F.col("n"), 6).alias(
            "distinct_char_ratio"
        ),
        F.col("n").cast("long").alias("n_chars_counted"),
    )


_INTERVAL_OVERLAP_ORACLE = f"""
WITH {_SESSIONIZE_SQL},
sessions AS (
  SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end
  FROM ids GROUP BY user_id, session_id
),
incidents AS (
  SELECT date_trunc('hour', ts) AS incident_hour, COUNT(*) AS n_errors
  FROM events WHERE event_type = 'error'
  GROUP BY date_trunc('hour', ts)
  HAVING COUNT(*) >= 3
)
SELECT s.user_id, s.session_start, s.session_end,
       i.incident_hour, i.n_errors
FROM sessions s
JOIN incidents i
  ON s.session_start < i.incident_hour + INTERVAL '1 hour'
 AND s.session_end >= i.incident_hour
"""


@_register("join_interval_overlap", _INTERVAL_OVERLAP_ORACLE)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join WITHOUT an equi key, made shuffle-joinable
    by TEMPORAL BINNING: which user sessions overlap site-wide error
    incidents (hours with ≥ 3 error events)? There is no key linking a
    session to an incident — the naive plan is a BroadcastNestedLoopJoin
    over the overlap predicate, O(|sessions|·|incidents|) and the
    canonical way temporal joins die at scale.

    The binning rewrite (`operators/temporal.binned_interval_join`):
    each session explodes into the sequence of bins it spans, incidents
    carry their single bin, and the join becomes an EQUI join on the
    bin id followed by the exact overlap predicate — the standard
    interval-join strategy in streaming/temporal engines. Replication
    factor = interval length / bin width; `bin_width_hours` is the
    exposed skew knob (a pathological days-long session explodes into
    hundreds of 1-hour bins but a handful of daily ones — volume
    arithmetic and result-invariance pinned in
    tests/test_analytics_queries.py). Because every incident occupies
    exactly one bin, each overlapping pair meets in exactly one bin
    and needs NO post-join dedup — that invariant is what makes the
    rewrite exchange-minimal (one session-shuffle, one bin-hash join;
    plan-tested cartesian-free).

    Overlap convention: closed session [start, end] vs half-open
    incident hour [h, h+1h): start < h+1h AND end >= h — the same
    half-open-bucket convention as the tumbling-window queries.
    """
    from ..operators.temporal import binned_interval_join

    ev = load_table(spark, sf_dir, "events")
    sessions = (
        _sessionized_events(spark, sf_dir)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )
    incidents = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", "ts").alias("incident_hour"))
        .agg(F.count(F.lit(1)).alias("n_errors"))
        .filter(F.col("n_errors") >= 3)
    )
    return binned_interval_join(
        sessions,
        incidents,
        start_col="session_start",
        end_col="session_end",
        point_col="incident_hour",
        bin_width_hours=1,
    ).select(
        "user_id", "session_start", "session_end",
        "incident_hour", "n_errors",
    )


def _schema_evolution_oracle() -> str:
    return """
SELECT lang,
       COUNT(*) AS n_docs,
       SUM(n_chars)::BIGINT AS total_chars,
       COUNT(quality) AS n_with_quality,
       CAST(SUM(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) AS total_quality
FROM (
  SELECT lang, n_chars, NULL::DOUBLE AS quality
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT lang, n_chars, ROUND(n_chars / 100.0, 6) AS quality
  FROM documents WHERE doc_id % 2 = 1
)
GROUP BY lang
"""


@_register("sink_parquet_schema_evolution", _schema_evolution_oracle())
def sink_parquet_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet generations: generation 1 wrote
    documents WITHOUT a quality column (even doc_ids), generation 2
    added one (odd doc_ids, quality = n_chars/100 rounded) — the
    read-back with ``mergeSchema`` must union the file schemas, fill
    the missing column with nulls for old files, and aggregate across
    both generations. Every long-lived lake table lives this way:
    columns get added mid-stream and history is never rewritten.

    This is the ONE read in the repo without an explicit schema — the
    point under test IS Spark's footer-schema merge (explicit-schema
    reads, the default discipline here, would mask a silently-dropped
    new column). mergeSchema costs one footer read per FILE, not a
    data scan; at 100 TB you pay it once per planning pass or pin the
    merged schema in a metastore after the first read.

    The checksum gate: per-lang counts, char totals, non-null quality
    counts, and decimal-summed quality — computed from the two-
    generation directory by Spark, recomputed from the ORIGINAL table
    by DuckDB — prove no row and no quality value was lost or
    duplicated by the merge.
    """
    import pathlib

    from ..sources.cache import cached_materialization

    docs = load_table(spark, sf_dir, "documents")

    def build(tmp: str) -> None:
        gen1 = docs.filter(F.col("doc_id") % 2 == 0).select(
            "doc_id", "lang", "n_chars"
        )
        gen2 = docs.filter(F.col("doc_id") % 2 == 1).select(
            "doc_id",
            "lang",
            "n_chars",
            F.round(F.col("n_chars") / 100.0, 6).alias("quality"),
        )
        gen1.write.mode("overwrite").parquet(tmp)
        gen2.write.mode("append").parquet(tmp)

    dest = cached_materialization(
        pathlib.Path(sf_dir) / "documents.parquet",
        "documents_schema_evo",
        build,
    )
    back = spark.read.option("mergeSchema", "true").parquet(dest)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.count("quality").alias("n_with_quality"),
        F.sum(F.col("quality").cast("decimal(18,6)"))
        .cast("double")
        .alias("total_quality"),
    )


_EWMA_ORACLE = """
SELECT user_id,
       COUNT(*)::BIGINT AS n_events,
       ROUND(list_reduce(list(value::DOUBLE ORDER BY ts, event_id),
                         (acc, x) -> acc * 0.7 + x * 0.3), 6) AS ewma_last
FROM events
WHERE value IS NOT NULL
GROUP BY user_id
"""


@_register("event_ewma_smoothing", _EWMA_ORACLE)
def event_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's event
    values (α = 0.3, s₀ = x₀, sₜ = 0.7·sₜ₋₁ + 0.3·xₜ) — the RECURSIVE
    sequential aggregation family: unlike every window frame in the
    registry, EWMA's step t depends on the ACCUMULATED state, not on a
    frame of raw rows, so no built-in window function expresses it.
    It is the standard smoothing primitive behind anomaly baselines
    (`event_anomaly_zscore`'s static mean/stddev, made adaptive).

    Expressed as an ordered-list FOLD, all JVM-side: per user,
    ``array_sort(collect_list(struct(ts, event_id, value)))`` fixes
    the (ts, event_id) total order, then ``F.aggregate`` folds with
    the first element as init — the exact same left fold DuckDB's
    ``list_reduce`` performs over ``list(value ORDER BY ts,
    event_id)``, so per-step arithmetic is bit-identical between
    engines and the round-6 output is hash-stable (no float-sum
    reordering exists in a sequential fold by construction).

    Scale: ONE shuffle on user_id; per-user state is the collected
    history array — bounded by per-user event counts here, and for a
    pathological mega-user the fold COMPOSES: an EWMA segment is the
    affine map s_out = 0.7ⁿ·s_in + Σ 0.7^(n-i)·0.3·xᵢ, so segments
    reduce associatively as (decay, offset) pairs. That two-level path
    is IMPLEMENTED as `operators/stats.ewma_segmented` (segment folds
    sized by a caller-chosen time granularity, affine compose per key)
    — an opt-in, because pow+compose reorders the sequential fold's
    rounding (~1e-12 relative drift; property-tested to 1e-9 against
    this query, tests/test_analytics_queries.py); the hash oracle
    keeps the bit-exact sequential form here.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vals = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda x: x["value"].cast("double"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), vals.alias("__vals")
    )
    ewma = F.aggregate(
        F.slice(
            F.col("__vals"), F.lit(2), F.greatest(F.size("__vals") - 1, F.lit(0))
        ),
        F.element_at(F.col("__vals"), 1),
        lambda acc, x: acc * F.lit(0.7) + x * F.lit(0.3),
    )
    return per_user.select(
        "user_id", "n_events", F.round(ewma, 6).alias("ewma_last")
    )


# ---------------------------------------------------------------------------
# Seasonal decomposition of the hourly event series
# ---------------------------------------------------------------------------

_SEASONAL_ORACLE = """
WITH b AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_start,
         COUNT(*) AS n FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, bucket_start, n,
         SUM(n) OVER (PARTITION BY event_type ORDER BY bucket_start
                      ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING) AS s,
         COUNT(*) OVER (PARTITION BY event_type ORDER BY bucket_start
                        ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING) AS c
  FROM b
),
d AS (
  SELECT event_type, bucket_start, n,
         EXTRACT(HOUR FROM bucket_start)::BIGINT AS hod,
         24 * n - s AS dt24
  FROM w WHERE c = 24
),
seas AS (
  SELECT event_type, hod,
         (CAST(SUM(dt24) AS DOUBLE) / COUNT(*)) / 24.0 AS seasonal
  FROM d GROUP BY event_type, hod
)
SELECT d.event_type, d.bucket_start, d.n AS n_events,
       ROUND((24.0 * d.n - d.dt24) / 24.0, 6) AS trend,
       ROUND(s.seasonal, 6) AS seasonal,
       ROUND(CAST(d.dt24 AS DOUBLE) / 24.0 - s.seasonal, 6) AS residual
FROM d JOIN seas s ON d.event_type = s.event_type AND d.hod = s.hod
"""


@_register("event_seasonal_decompose", _SEASONAL_ORACLE)
def event_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition of the hourly event volume —
    trend (centered 24-bucket moving average), daily seasonal profile
    (mean detrended value per hour-of-day), residual (what anomaly
    detectors should actually look at: `event_anomaly_zscore` flags
    raw spikes, which conflates "3 AM is always quiet" with "this 3 AM
    is wrong"; subtracting trend and season isolates the genuinely
    unusual). The additive decompose every monitoring/forecast
    pipeline runs before modeling.

    Determinism (the float-oracle discipline): only FULL 24-bucket
    windows qualify (c = 24), so the detrended value is the exact
    INTEGER 24·n − Σwindow — trend, seasonal, and residual are then
    single divisions of exact integer sums, evaluated as the identical
    expression tree in both engines, with ROUND(…, 6) on top. No
    order-dependent double accumulation anywhere.

    Plan: one corpus shuffle (the hourly aggregate); the moving-sum
    window and the hour-of-day aggregation run on the bucket-grid
    relation (|types| × |hours|, calendar-bounded); the seasonal join
    is |types| × 24 rows — broadcast. Identical shape at 100 TB.
    """
    ev = load_table(spark, sf_dir, "events")
    b = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_start")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_start")
        .rowsBetween(-11, 12)
    )
    # persisted: the seasonal profile and the final join both consume
    # d — unpersisted, the hourly corpus aggregate would run twice
    d = persist_bounded(
        b.select(
            "event_type",
            "bucket_start",
            "n",
            F.sum("n").over(w).alias("s"),
            F.count(F.lit(1)).over(w).alias("c"),
        )
        .filter(F.col("c") == 24)
        .select(
            "event_type",
            "bucket_start",
            "n",
            F.hour("bucket_start").cast("bigint").alias("hod"),
            (F.lit(24) * F.col("n") - F.col("s")).alias("dt24"),
        )
    )
    seas = d.groupBy("event_type", "hod").agg(
        (
            (F.sum("dt24").cast("double") / F.count(F.lit(1))) / F.lit(24.0)
        ).alias("seasonal")
    )
    return (
        d.join(F.broadcast(seas), ["event_type", "hod"])
        .select(
            "event_type",
            "bucket_start",
            F.col("n").alias("n_events"),
            F.round(
                (F.lit(24.0) * F.col("n") - F.col("dt24")) / F.lit(24.0), 6
            ).alias("trend"),
            F.round(F.col("seasonal"), 6).alias("seasonal"),
            F.round(
                F.col("dt24").cast("double") / F.lit(24.0) - F.col("seasonal"),
                6,
            ).alias("residual"),
        )
    )


# ---------------------------------------------------------------------------
# Session transition matrix (first-order Markov estimate)
# ---------------------------------------------------------------------------

_TRANSITION_ORACLE = f"""
WITH {_SESSIONIZE_SQL},
tr AS (
  SELECT event_type AS src,
         LEAD(event_type) OVER (PARTITION BY user_id, session_id
                                ORDER BY ts, event_id) AS dst
  FROM ids
),
c AS (
  SELECT src, dst, COUNT(*)::BIGINT AS n_transitions
  FROM tr WHERE dst IS NOT NULL GROUP BY src, dst
),
t AS (SELECT src, CAST(SUM(n_transitions) AS BIGINT) AS n_from FROM c GROUP BY src)
SELECT c.src, c.dst, c.n_transitions, t.n_from,
       ROUND(CAST(c.n_transitions AS DOUBLE) / t.n_from, 6) AS p
FROM c JOIN t USING (src)
"""


@_register("event_transition_matrix", _TRANSITION_ORACLE)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of in-session behavior:
    for every consecutive event pair inside a 30-minute-gap session,
    the transition count and conditional probability P(next | current)
    — the sequence-analytics primitive behind next-action prediction
    baselines, funnel-leak ranking ("where do sessions go after
    search?"), and bot detection (bot transition rows are near-
    deterministic). Session boundaries matter: `event_user_paths`
    folds whole paths, this estimates the edge weights, and a LEAD
    never crosses sessions (the last event of a session emits no
    transition).

    Determinism: counts are exact integers; p is one double division
    of exact integers, identical expression both engines, ROUND 6.

    Plan: ONE user_id shuffle (the shared sessionize window — lag,
    island sum, and the per-session LEAD all run on it; the LEAD's
    (user_id, session_id) partition is a refinement of user_id, so no
    second exchange), then a |types|²-bounded count; the per-src
    totals ride a WINDOW over that tiny relation rather than a second
    aggregate branch (a derived-aggregate self-join would recompute
    the whole sessionize pipeline — the corpus would be scanned
    twice). Identical shape at 100 TB.
    """
    sess = _sessionized_events(spark, sf_dir)
    lead_w = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id"
    )
    tr = sess.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(lead_w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    c = tr.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    n_from = F.sum("n_transitions").over(Window.partitionBy("src"))
    return c.select(
        "src",
        "dst",
        "n_transitions",
        n_from.alias("n_from"),
        F.round(
            F.col("n_transitions").cast("double") / n_from, 6
        ).alias("p"),
    )


# ---------------------------------------------------------------------------
# Population stability index (distribution drift metric)
# ---------------------------------------------------------------------------

_PSI_ORACLE = """
WITH m AS (
  SELECT MIN(n_chars) AS lo, MAX(n_chars) - MIN(n_chars) + 1 AS span
  FROM documents
),
b AS (
  SELECT ((n_chars - lo) * 10) // span AS bucket, doc_id % 2 AS half
  FROM documents, m
),
c AS (
  SELECT bucket,
         SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END)::BIGINT AS ref_n,
         SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS cur_n
  FROM b GROUP BY bucket
),
t AS (
  SELECT CAST(SUM(ref_n) AS DOUBLE) AS tr, CAST(SUM(cur_n) AS DOUBLE) AS tc
  FROM c
)
SELECT bucket, ref_n, cur_n,
       ROUND(((ref_n + 1.0) / (tr + 10.0) - (cur_n + 1.0) / (tc + 10.0))
             * ln(((ref_n + 1.0) / (tr + 10.0))
                  / ((cur_n + 1.0) / (tc + 10.0))), 6) AS psi_term
FROM c, t
"""


@_register("pipeline_drift_psi", _PSI_ORACLE)
def pipeline_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between two corpus snapshots (the
    even/odd doc_id halves standing in for yesterday/today): n_chars
    deciled on a data-derived integer grid, per-bucket PSI term
    (p−q)·ln(p/q) with +1 Laplace smoothing — THE drift gate run
    between every training-data refresh before the new snapshot is
    allowed to ship (PSI > 0.2 is the classic "distribution moved,
    investigate" threshold; `pipeline_corpus_diff` says WHICH rows
    changed, PSI says whether the SHAPE changed). Bucket ids are exact
    integer arithmetic (((v − lo)·10) div span), counts exact, each
    probability a single smoothed division, the term the identical
    double expression in both engines, ROUND 6 on top.

    Plan: one map-side-combinable aggregation to 10 bucket rows (the
    conditional counts collapse both halves in one pass), a 1-row
    totals relation broadcast back. At 100 TB: a word-count-shaped
    pass; nothing scales with anything but the bucket grid.
    """
    d = load_table(spark, sf_dir, "documents")
    m = d.agg(
        F.min("n_chars").alias("lo"),
        (F.max("n_chars") - F.min("n_chars") + 1).alias("span"),
    )
    b = d.crossJoin(F.broadcast(m)).select(
        F.expr("((n_chars - lo) * 10) div span").alias("bucket"),
        (F.col("doc_id") % 2).alias("half"),
    )
    c = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("bigint").alias("ref_n"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("bigint").alias("cur_n"),
    )
    # global totals as an unpartitioned window over the ≤10-bucket
    # relation: a separate aggregate branch crossJoined back would
    # recompute c's subtree and scan documents twice
    gw = Window.partitionBy()
    tr = F.sum("ref_n").over(gw).cast("double")
    tc = F.sum("cur_n").over(gw).cast("double")
    p = (F.col("ref_n") + F.lit(1.0)) / (tr + F.lit(10.0))
    q = (F.col("cur_n") + F.lit(1.0)) / (tc + F.lit(10.0))
    return c.select(
        "bucket",
        "ref_n",
        "cur_n",
        F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
    )


# ---------------------------------------------------------------------------
# First/last-touch revenue attribution within sessions
# ---------------------------------------------------------------------------

_ATTRIBUTION_ORACLE = """
WITH seq AS (
  SELECT user_id, ts, event_id, event_type, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
ids AS (
  SELECT user_id, ts, event_id, event_type, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM seq
),
tagged AS (
  SELECT user_id, session_id, ts, event_id, event_type, value,
         COALESCE(first_value(CASE WHEN event_type IN ('click', 'view')
                                   THEN event_type END IGNORE NULLS)
                  OVER (PARTITION BY user_id, session_id
                        ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING), 'direct') AS first_touch,
         COALESCE(last_value(CASE WHEN event_type IN ('click', 'view')
                                  THEN event_type END IGNORE NULLS)
                  OVER (PARTITION BY user_id, session_id
                        ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING), 'direct') AS last_touch
  FROM ids
)
SELECT first_touch, last_touch,
       COUNT(*)::BIGINT AS n_purchases,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM tagged WHERE event_type = 'purchase'
GROUP BY first_touch, last_touch
"""


@_register("event_attribution", _ATTRIBUTION_ORACLE)
def event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch revenue attribution: every purchase in
    a 30-minute-gap session is credited to the first and the most
    recent preceding touchpoint (click or view) of that session,
    'direct' when none preceded — the marketing-analytics staple that
    decides channel budgets, and the IGNORE-NULLS running first/last
    window shape the registry's LOCF gap-fill uses on values, here on
    CATEGORICAL carry-forward. Purchases never credit touches from
    other sessions (the carry-forward window is bounded by the
    session partition) nor later touches (frame ends at CURRENT ROW;
    the purchase itself is not a touch, so including it is safe).

    Determinism: counts exact; revenue is the decimal-cast
    order-independent sum (`dsum` convention). Plan: the shared ONE
    user_id shuffle of the sessionize family — the session-scoped
    windows are partition refinements — then a ≤9-row aggregate.
    """
    sess = _sessionized_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id", "session_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    touch = F.when(
        F.col("event_type").isin("click", "view"), F.col("event_type")
    )
    tagged = sess.select(
        "event_type",
        "value",
        F.coalesce(F.first(touch, ignorenulls=True).over(w), F.lit("direct"))
        .alias("first_touch"),
        F.coalesce(F.last(touch, ignorenulls=True).over(w), F.lit("direct"))
        .alias("last_touch"),
    )
    return (
        tagged.filter(F.col("event_type") == "purchase")
        .groupBy("first_touch", "last_touch")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            dsum(F.col("value"), 6).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# CUSUM change-point statistic over the hourly series
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH b AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         COUNT(*)::DOUBLE AS x
  FROM events GROUP BY 1, 2
),
g AS (
  SELECT event_type,
         COUNT(*)::BIGINT AS n_buckets,
         SUM(x) / COUNT(*) AS mu,
         list(x ORDER BY bucket) AS xs
  FROM b GROUP BY event_type
),
f AS (
  SELECT event_type, n_buckets, mu,
         list_reduce(
           [[0.0, 0.0]] || list_transform(xs, v -> [v - mu, v - mu]),
           (acc, e) -> [GREATEST(0.0, acc[1] + e[1]),
                        GREATEST(acc[2], GREATEST(0.0, acc[1] + e[1]))]
         ) AS s
  FROM g
)
SELECT event_type, n_buckets, ROUND(mu, 6) AS mu,
       ROUND(s[1], 6) AS cusum_final,
       ROUND(s[2], 6) AS cusum_max
FROM f
"""


@_register("event_changepoint_cusum", _CUSUM_ORACLE)
def event_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point statistic per event type: over the
    hourly count series, sᵢ = max(0, sᵢ₋₁ + (xᵢ − μ)) accumulates
    sustained upward drift from the series mean and resets on
    evidence against it — the sequential-detection primitive that
    catches SLOW level shifts `event_anomaly_zscore`'s pointwise
    z-test misses and `event_ewma_smoothing` only smooths (Page's
    test; the registry's monitoring family: pointwise z, EWMA,
    seasonal residual, now change-point). Emits the final statistic
    and the running MAXIMUM (the value a threshold alarm compares).

    Like EWMA, the recursion depends on accumulated state, so no
    window frame expresses it: both engines fold the SAME ordered
    per-type list — Spark `F.aggregate` with a [s, s_max] pair
    accumulator, DuckDB `list_reduce` with a prepended [0, 0]
    init-element (its fold seeds from the first element) — making
    per-step arithmetic bit-identical; counts are integer-valued, so
    Σx is exact in any order and μ is one division.

    Scale: ONE shuffle; per-type state is the calendar-bounded hourly
    list (same contract as the gap-fill grid). The max-fold does NOT
    decompose associatively like EWMA's affine segments — a
    year-of-hours list is ~9k doubles, still a trivial array.
    """
    ev = load_table(spark, sf_dir, "events")
    b = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    g = b.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("x").alias("__sx"),
        F.array_sort(F.collect_list(F.struct("bucket", "x"))).alias("__rows"),
    )
    mu = F.col("__sx") / F.col("n_buckets")
    ds = F.transform(F.col("__rows"), lambda r: r["x"] - mu)
    fold = F.aggregate(
        ds,
        F.array(F.lit(0.0), F.lit(0.0)),
        lambda acc, d: F.array(
            F.greatest(F.lit(0.0), F.element_at(acc, 1) + d),
            F.greatest(
                F.element_at(acc, 2),
                F.greatest(F.lit(0.0), F.element_at(acc, 1) + d),
            ),
        ),
    )
    return g.select(
        "event_type",
        "n_buckets",
        F.round(mu, 6).alias("mu"),
        F.round(F.element_at(fold, 1), 6).alias("cusum_final"),
        F.round(F.element_at(fold, 2), 6).alias("cusum_max"),
    )
