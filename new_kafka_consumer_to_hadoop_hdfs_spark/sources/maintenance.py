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
- a MANIFEST (``root/manifests/m-NNNNNNNN.json``) records one commit;
- ``root/CURRENT`` names the current manifest and is replaced with
  ``os.replace`` — an atomic POSIX rename, so every reader resolves to
  a complete, existing file set: either wholly before or wholly after
  any append/compaction, never between.

Metadata at scale (round 13, VERDICT r12 task 1): each manifest is an
INCREMENTAL DELTA — the files this commit added and removed, the stats
of the adds, and O(schema) bookkeeping — never the full file list, so
a table's lifetime metadata is O(total churn), not O(files²) bytes
(the Delta-log commit shape). Readers reconstruct a version's state by
replaying deltas forward from the nearest RESTART POINT:

- a parquet CHECKPOINT (``root/checkpoints/ck-NNNNNNNN.parquet``) —
  the live file/stats/colmap relation materialized every
  ``CHECKPOINT_EVERY`` commits (Delta's ``_last_checkpoint`` /
  Iceberg's manifest-list role), written atomically and best-effort
  (a missed checkpoint only lengthens the replay, never loses data);
- or a FULL-SNAPSHOT manifest (the pre-round-13 v1 layout, still read
  for backward compatibility; :func:`clone_table` also writes one).

File-level data skipping reads the checkpoint THROUGH SPARK
(:func:`pruned_files_spark`): per-column [min, max] land as typed
parquet columns, so pruning a million-file table is a columnar filter
plus an O(delta) tail replay — not a driver-side Python loop over
every entry (that loop remains as :func:`pruned_files` for tables too
young to have a checkpoint, where it is O(small)).

Appends ADD files and commit a delta; compaction rewrites the live
set into ~``target_bytes`` files (``coalesce`` — a narrow rewrite, no
shuffle) and commits the replacement set. Superseded files stay on
disk until ``vacuum`` so an in-flight reader holding the previous
manifest still resolves every file (snapshot isolation); vacuum is
safe once no reader can hold a pre-compaction manifest (at 100 TB: a
retention horizon, exactly Delta's ``VACUUM``).

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
import zlib

from pyspark.sql import DataFrame, SparkSession

# A parquet checkpoint of the live-file relation is written after every
# N-th commit (best-effort, atomic): the replay window a reader pays is
# bounded by N manifest JSONs, each O(that commit's churn).
CHECKPOINT_EVERY = 8


class CommitConflict(RuntimeError):
    """Another writer committed the sequence number this commit was
    about to take: the loser's view of the table is stale. Blind
    appends recompute their delta and retry (:func:`append_batch`
    does this internally — an append conflicts with nothing
    logically); rewrites (:func:`compact`, :func:`merge_upsert`,
    :func:`delete_where`) surface the conflict because the file set
    they rewrote may no longer be live — the caller re-reads and
    re-runs, exactly Delta's optimistic-concurrency protocol."""


def _seq_of(name: str) -> int:
    return int(name.split("-")[1].split(".")[0])


def _manifest_name(seq: int) -> str:
    return f"m-{seq:08d}.json"


def _manifest_doc(root: str, name: str) -> dict:
    return json.loads(pathlib.Path(root, "manifests", name).read_text())


# --- Table state reconstruction --------------------------------------
#
# A version's STATE is the accumulated result of its commit chain:
#
#   files    sorted live data-file names
#   stats    {file -> {column -> [min, max]}} footer stats
#   colmap   {file -> {field_id -> [physical name, physical type]}}
#            (None for tables that don't track their schema)
#   columns  the logical schema [{id, name, type}] or None
#   next_field_id  Iceberg's last-column-id (monotone for the table's
#            lifetime) or None
#   deletes  sorted live position-delete file names (merge-on-read)
#   eq_deletes {delete file -> {"key": column, "seq": commit seq}}
#            equality-delete files (merge-on-read, Iceberg v2): each
#            masks rows whose key column matches one of its values IN
#            DATA FILES OLDER THAN IT (seq_added < its seq)
#   seq_added {file -> commit seq that added it} — the data sequence
#            number equality-delete applicability is decided by
#   parts    {file -> {partition key -> string value}} partition tuples
#            (key is str(field_id) when schema-tracked, else the
#            column name)
#   external {file -> absolute path} for files referenced outside
#            root/data (shallow clones)
#
# Reconstruction walks BACKWARD from the requested version to the
# nearest restart point (checkpoint or full-snapshot manifest), then
# replays the collected deltas forward — the Delta log read protocol.
# States are cached per (root, version): manifests are immutable by
# protocol (O_EXCL creation, never rewritten), so a cached state can
# never go stale.

_STATE_CACHE: dict[tuple, dict] = {}
_STATE_CACHE_MAX = 128
_STATE_LOCK = threading.Lock()


def _empty_state() -> dict:
    return {
        "files": [],
        "stats": {},
        "colmap": None,
        "columns": None,
        "next_field_id": None,
        "deletes": [],
        "eq_deletes": {},
        "seq_added": {},
        "parts": {},
        "external": {},
    }


def _state_from_full(doc: dict, seq: int) -> dict:
    """State carried wholesale by a v1 / full-snapshot manifest.
    ``seq_added`` defaults every file to the snapshot's own sequence
    unless the doc carries explicit values (a shallow clone preserves
    the source's relative file/eq-delete ordering — flattening it
    would wrongly mask files added after an equality delete)."""
    files = sorted(doc["files"])
    seq_added = doc.get("seq_added")
    return {
        "files": files,
        "stats": {k: dict(v) for k, v in doc.get("stats", {}).items()},
        "colmap": (
            {k: dict(v) for k, v in doc["colmap"].items()}
            if doc.get("colmap") is not None
            else None
        ),
        "columns": doc.get("columns"),
        "next_field_id": doc.get("next_field_id"),
        "deletes": sorted(doc.get("deletes", [])),
        "eq_deletes": {
            k: dict(v) for k, v in doc.get("eq_deletes", {}).items()
        },
        "seq_added": (
            {f: int(seq_added[f]) for f in files}
            if seq_added is not None
            else {f: seq for f in files}
        ),
        "parts": {k: dict(v) for k, v in doc.get("parts", {}).items()},
        "external": dict(doc.get("external", {})),
    }


def _identity_colmap(columns: list[dict]) -> dict:
    return {str(c["id"]): [c["name"], c["type"]] for c in columns}


def _apply_delta(state: dict, doc: dict, seq: int) -> None:
    """Replay one delta manifest (committed at sequence ``seq``) onto
    ``state`` in place."""
    removes = set(doc.get("removes", ()))
    adds = [f for f in doc.get("adds", ()) if f not in removes]
    if removes or adds:
        files = set(state["files"]) - removes
        files.update(adds)
        state["files"] = sorted(files)
        for f in adds:
            # setdefault: a retry re-adding a still-live name (same
            # epoch, same content) keeps the ORIGINAL sequence — the
            # row data dates from the first commit, and bumping it
            # would un-apply equality deletes that landed in between
            state["seq_added"].setdefault(f, seq)
        for f in removes:
            state["stats"].pop(f, None)
            state["parts"].pop(f, None)
            state["external"].pop(f, None)
            state["seq_added"].pop(f, None)
            if state["colmap"] is not None:
                state["colmap"].pop(f, None)
    state["stats"].update(doc.get("stats_adds", {}))
    # schema bookkeeping rides every delta in full — it is O(schema),
    # never O(files)
    columns = doc.get("columns", state["columns"])
    if columns is not None:
        ident = _identity_colmap(columns)
        cadds = doc.get("colmap_adds", {})
        if state["colmap"] is None:
            # schema tracking initialized at this commit: every live
            # file was written under this logical schema — except
            # files with an explicit mapping (this commit's
            # hive-partitioned adopts), and PRE-EXISTING partitioned
            # files, which physically lack their partition columns:
            # their pinned mapping must exclude those (or the column
            # silently reads NULL — review-found r13) and their
            # name-keyed tuples re-key to the now-stable field ids
            name_to_id = {c["name"]: str(c["id"]) for c in columns}
            state["colmap"] = {}
            for f in state["files"]:
                if f in cadds:
                    state["colmap"][f] = cadds[f]
                    continue
                tup = state["parts"].get(f)
                if tup:
                    state["parts"][f] = {
                        name_to_id.get(k, k): v for k, v in tup.items()
                    }
                    state["colmap"][f] = {
                        i: m for i, m in ident.items() if m[0] not in tup
                    }
                else:
                    state["colmap"][f] = ident
        else:
            for f in adds:
                state["colmap"][f] = cadds.get(f, ident)
    state["columns"] = columns
    state["next_field_id"] = doc.get(
        "next_field_id", state["next_field_id"]
    )
    # column-stats ops (the evolution verbs): a rename REKEYS each
    # file's entry so data skipping survives it, a drop PURGES the dead
    # name so a later rename onto it can't inherit dead ranges
    rekey = doc.get("stats_rekey")
    if rekey:
        # bloom entries follow their column through the rename too
        full_rekey = dict(rekey)
        for old, new in rekey.items():
            full_rekey[_BLOOM_KEY + old] = _BLOOM_KEY + new
        for f, ent in state["stats"].items():
            out = {
                c: mm for c, mm in ent.items()
                if c not in full_rekey.values()
            }
            for old, new in full_rekey.items():
                if old in out:
                    out[new] = out.pop(old)
            state["stats"][f] = out
    for dead in doc.get("stats_drop", ()):
        for ent in state["stats"].values():
            ent.pop(dead, None)
            ent.pop(_BLOOM_KEY + dead, None)
    del_removes = set(doc.get("delete_removes", ()))
    if del_removes or doc.get("delete_adds"):
        dels = set(state["deletes"]) - del_removes
        dels.update(doc.get("delete_adds", ()))
        state["deletes"] = sorted(dels)
    for d in doc.get("eq_delete_removes", ()):
        state["eq_deletes"].pop(d, None)
    for d, meta in doc.get("eq_delete_adds", {}).items():
        state["eq_deletes"][d] = {"key": meta["key"], "seq": seq}
    state["parts"].update(doc.get("parts_adds", {}))
    state["external"].update(doc.get("external_adds", {}))


def _copy_state(state: dict) -> dict:
    out = dict(state)
    out["files"] = list(state["files"])
    out["stats"] = {k: dict(v) for k, v in state["stats"].items()}
    if state["colmap"] is not None:
        out["colmap"] = {k: dict(v) for k, v in state["colmap"].items()}
    out["deletes"] = list(state["deletes"])
    out["eq_deletes"] = {
        k: dict(v) for k, v in state["eq_deletes"].items()
    }
    out["seq_added"] = dict(state["seq_added"])
    out["parts"] = {k: dict(v) for k, v in state["parts"].items()}
    out["external"] = dict(state["external"])
    return out


def _table_state(root: str, name: str) -> dict:
    """The reconstructed state of version ``name`` (cached; the
    returned dict is SHARED — treat as read-only, copy before
    mutating). Replay cost is bounded by the checkpoint cadence:
    at most ``CHECKPOINT_EVERY`` delta docs, each O(its own churn)."""
    key = (os.path.realpath(root), name)
    with _STATE_LOCK:
        cached = _STATE_CACHE.get(key)
    if cached is not None:
        return cached
    tail: list[tuple[int, dict]] = []
    state = None
    s = _seq_of(name)
    while s >= 0:
        ckpt = _checkpoint_path(root, s)
        if ckpt.exists():
            state = _load_checkpoint(root, s)
            # columns/next_field_id are O(schema) and ride every
            # manifest doc — read them from the restart commit itself
            doc = _manifest_doc(root, _manifest_name(s))
            state["columns"] = doc.get("columns")
            state["next_field_id"] = doc.get("next_field_id")
            break
        doc = _manifest_doc(root, _manifest_name(s))
        if "files" in doc:  # v1 / full-snapshot manifest: a restart point
            state = _state_from_full(doc, s)
            break
        tail.append((s, doc))
        s -= 1
    if state is None:
        state = _empty_state()
    for s, doc in reversed(tail):
        _apply_delta(state, doc, s)
    with _STATE_LOCK:
        if len(_STATE_CACHE) >= _STATE_CACHE_MAX:
            _STATE_CACHE.pop(next(iter(_STATE_CACHE)))
        _STATE_CACHE[key] = state
    return state


def table_state(root: str, name: str | None = None) -> dict:
    """Public accessor: a DEFENSIVE COPY of a version's reconstructed
    state (CURRENT by default) — files, stats, colmap, columns,
    deletes, partition tuples, external refs."""
    if name is None:
        name, _ = read_manifest(root)
        if name is None:
            return _empty_state()
    return _copy_state(_table_state(root, name))


def read_manifest(root: str) -> tuple[str | None, list[str]]:
    """Resolve the current (manifest name, live data-file names).
    ``(None, [])`` for a table with no committed version yet.

    The COMMIT POINT is the O_EXCL creation of the manifest file
    itself (see :func:`_commit_delta`); ``CURRENT`` is a monotonic
    cache of the latest known manifest, so resolution probes FORWARD
    from the cached name until the next sequence number is absent — a
    commit whose writer crashed (or lost a cache-update race) before
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
    return name, list(_table_state(root, name)["files"])


def list_manifests(root: str) -> list[tuple[str, str]]:
    """Table history: every committed version as (manifest name, note),
    oldest first. Historical manifests stay READABLE as long as every
    file they reference is still live (``vacuum`` keeps exactly the
    protected manifests' sets, so a post-compaction snapshot whose
    files are a subset of later versions survives; pre-compaction
    snapshots die at vacuum — the retention trade every table format
    documents)."""
    mdir = pathlib.Path(root, "manifests")
    if not mdir.is_dir():
        return []
    out = []
    for p in sorted(mdir.iterdir()):
        if p.name.startswith("m-") and p.suffix == ".json":
            out.append((p.name, json.loads(p.read_text()).get("note", "")))
    return out


def manifest_files(root: str, name: str) -> list[str]:
    """The live data-file list of a SPECIFIC version (a reader's held
    snapshot), reconstructed from its commit chain."""
    return list(_table_state(root, name)["files"])


def manifest_stats(root: str, name: str) -> dict:
    """The per-file stats map of a specific version: file name →
    {column → [min, max]} (empty for tables written without stats
    columns). Stats are keyed BY COLUMN so a range read on column A
    can never be pruned with column B's range — a file whose entry
    lacks the queried column is conservatively kept."""
    return {
        k: dict(v) for k, v in _table_state(root, name)["stats"].items()
    }


def resolve_as_of(root: str, ts: float) -> str:
    """TIMESTAMP AS OF: the manifest name of the LATEST version
    committed at or before wall-clock ``ts`` (each manifest records
    its commit time — the Delta/Iceberg timestamp-travel contract:
    a timestamp between commits N and N+1 resolves to N). Raises
    ``ValueError`` when ``ts`` precedes the first commit — there is
    no table to read at that time. Commit timestamps are clamped
    monotone with sequence at commit time (:func:`_commit_delta`), so
    resolution is consistent with commit order even across writers
    with skewed clocks. Manifests written before commit timestamps
    existed (no ``ts`` field) are treated as time 0, i.e. always
    at-or-before any requested timestamp."""
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


def _commit_delta(
    root: str,
    base: str | None,
    note: str,
    *,
    adds: list[str] = (),
    removes: list[str] = (),
    stats_adds: dict | None = None,
    colmap_adds: dict | None = None,
    delete_adds: list[str] = (),
    delete_removes: list[str] = (),
    eq_delete_adds: dict | None = None,
    eq_delete_removes: list[str] = (),
    parts_adds: dict | None = None,
    external_adds: dict | None = None,
    stats_rekey: dict | None = None,
    stats_drop: list[str] = (),
    columns: list[dict] | None = None,
    next_field_id: int | None = None,
) -> str:
    """Commit one DELTA against ``base`` (the manifest name the
    caller's read of the table resolved to; ``None`` = the caller saw
    an empty table). The manifest for sequence ``base+1`` is created
    with an O_EXCL publish — creation IS the commit point, so two
    writers that both derived the same base race on one filename and
    exactly one wins; the loser gets :class:`CommitConflict` instead
    of silently clobbering the winner's manifest (the lost-update race
    optimistic concurrency exists to prevent). ``CURRENT`` is then
    advanced as a monotonic best-effort cache — a crash between commit
    and cache refresh is healed by :func:`read_manifest`'s forward
    probe.

    The doc records O(this commit's churn) bytes: adds/removes and
    the adds' stats/partition/colmap entries, plus O(schema)
    bookkeeping (``columns``/``next_field_id`` ride every commit so a
    reader never replays for the schema). Every manifest records
    ``ts`` — wall-clock seconds clamped monotone against the base
    (Delta's in-commit-timestamp rule) — for TIMESTAMP AS OF."""
    mdir = pathlib.Path(root, "manifests")
    mdir.mkdir(parents=True, exist_ok=True)
    seq = _seq_of(base) + 1 if base else 0
    name = _manifest_name(seq)
    base_doc = _manifest_doc(root, base) if base else {}
    doc: dict = {
        "note": note,
        "ts": max(time.time(), base_doc.get("ts", 0.0) + 1e-6),
    }
    if adds:
        doc["adds"] = sorted(adds)
    if removes:
        doc["removes"] = sorted(removes)
    if stats_adds:
        doc["stats_adds"] = {
            f: stats_adds[f] for f in sorted(stats_adds)
        }
    if colmap_adds:
        doc["colmap_adds"] = colmap_adds
    if delete_adds:
        doc["delete_adds"] = sorted(delete_adds)
    if delete_removes:
        doc["delete_removes"] = sorted(delete_removes)
    if eq_delete_adds:
        # {file -> {"key": column}}: the seq is stamped at replay from
        # the committing manifest's own sequence number
        doc["eq_delete_adds"] = {
            f: {"key": eq_delete_adds[f]["key"]}
            for f in sorted(eq_delete_adds)
        }
    if eq_delete_removes:
        doc["eq_delete_removes"] = sorted(eq_delete_removes)
    if parts_adds:
        doc["parts_adds"] = parts_adds
    if external_adds:
        doc["external_adds"] = external_adds
    if stats_rekey:
        doc["stats_rekey"] = stats_rekey
    if stats_drop:
        doc["stats_drop"] = list(stats_drop)
    # schema bookkeeping: explicit override (the evolution verbs /
    # tracking initialization) or carried forward from the base doc
    cols = columns if columns is not None else base_doc.get("columns")
    if cols is not None:
        doc["columns"] = cols
        doc["next_field_id"] = (
            next_field_id
            if next_field_id is not None
            else base_doc.get(
                "next_field_id", max(c["id"] for c in cols) + 1
            )
        )
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
    if seq > 0 and seq % CHECKPOINT_EVERY == 0:
        # best-effort: the commit is already durable; a failed
        # checkpoint only lengthens later readers' replay windows
        try:
            write_checkpoint(root, name)
        except Exception:  # noqa: BLE001 - checkpoint loss is benign
            pass
    return name


def _flip(
    root: str,
    files: list[str],
    note: str,
    stats: dict | None = None,
    *,
    base=_UNREAD,
    extra: dict | None = None,
) -> str:
    """Commit a new version whose live set is exactly ``files`` —
    the full-list convenience form over :func:`_commit_delta` (the
    on-disk manifest still records only the delta vs ``base``).
    ``stats`` entries are kept for files this commit ADDS (carried
    files keep their accumulated entries through replay). ``extra``
    may carry ``columns``/``next_field_id`` overrides."""
    if base is _UNREAD:
        base, _ = read_manifest(root)
    live = _table_state(root, base)["files"] if base else []
    adds = sorted(set(files) - set(live))
    removes = sorted(set(live) - set(files))
    return _commit_delta(
        root, base, note,
        adds=adds,
        removes=removes,
        stats_adds={f: stats[f] for f in adds if f in stats}
        if stats else None,
        columns=(extra or {}).get("columns"),
        next_field_id=(extra or {}).get("next_field_id"),
    )


def _advance_current(root: str, name: str) -> None:
    """Move the ``CURRENT`` cache forward to ``name`` unless it
    already names a later sequence. The read/compare/replace is
    retried a few times because two winners of successive sequences
    can interleave so the lower one's ``os.replace`` lands last; the
    retry makes that window much smaller, but a regression slipping
    through the final check is still HARMLESS — readers probe forward
    from the cache (:func:`read_manifest`), so a behind cache is only
    a longer probe, never a wrong answer. The cache is best-effort
    monotone, not guaranteed monotone."""
    cur = pathlib.Path(root, "CURRENT")
    for _ in range(4):
        try:
            if _seq_of(cur.read_text().strip()) >= _seq_of(name):
                return
        except FileNotFoundError:
            pass
        tmp = pathlib.Path(
            root, f".CURRENT.tmp.{os.getpid()}.{threading.get_ident()}"
        )
        tmp.write_text(name)
        os.replace(tmp, cur)  # atomic POSIX rename
        try:
            # re-check: if a slower writer regressed the cache between
            # our compare and replace, one more round heals it
            if _seq_of(cur.read_text().strip()) >= _seq_of(name):
                return
        except FileNotFoundError:
            pass


# --- Checkpoints ------------------------------------------------------


def _checkpoint_path(root: str, seq: int) -> pathlib.Path:
    return pathlib.Path(root, "checkpoints", f"ck-{seq:08d}.parquet")


def write_checkpoint(root: str, name: str | None = None) -> str:
    """Materialize version ``name``'s (CURRENT by default) live
    file/stats relation as one parquet file under
    ``root/checkpoints/`` — the restart point that bounds every later
    reader's manifest-replay window (Delta checkpoint / Iceberg
    manifest list). Written atomically (temp + ``os.replace``);
    concurrent writers of the same sequence produce identical content,
    so last-write-wins is harmless.

    Layout: one row per live file (data AND position-delete files,
    disambiguated by ``kind``), with stats/colmap/partition/external
    entries as JSON columns, PLUS per-stats-column typed
    ``smin_{col}`` / ``smax_{col}`` columns so data skipping can run
    as a columnar Spark filter (:func:`pruned_files_spark`) instead of
    a driver-side loop."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if name is None:
        name, _ = read_manifest(root)
        if name is None:
            raise ValueError(f"{root} has no committed version")
    state = _table_state(root, name)
    eq_files = sorted(state["eq_deletes"])
    rows_files = list(state["files"]) + list(state["deletes"]) + eq_files
    kinds = (
        ["data"] * len(state["files"])
        + ["delete"] * len(state["deletes"])
        + ["eqdelete"] * len(eq_files)
    )
    cols: dict[str, list] = {
        "file": rows_files,
        "kind": kinds,
        # data rows: the commit sequence that added the file; eqdelete
        # rows: the delete's own sequence (applicability is decided by
        # seq_added < delete seq); position-delete rows: None
        "seq_added": [
            state["seq_added"].get(f)
            if k == "data"
            else (state["eq_deletes"][f]["seq"] if k == "eqdelete" else None)
            for f, k in zip(rows_files, kinds)
        ],
        "eq_key": [
            state["eq_deletes"][f]["key"] if k == "eqdelete" else None
            for f, k in zip(rows_files, kinds)
        ],
        "stats": [
            json.dumps(state["stats"][f]) if f in state["stats"] else None
            for f in rows_files
        ],
        "colmap": [
            json.dumps(state["colmap"][f])
            if state["colmap"] is not None and f in state["colmap"]
            else None
            for f in rows_files
        ],
        "parts": [
            json.dumps(state["parts"][f]) if f in state["parts"] else None
            for f in rows_files
        ],
        "external": [state["external"].get(f) for f in rows_files],
    }
    stat_cols = sorted(
        {
            c
            for ent in state["stats"].values()
            for c in ent
            # bloom sketches are dict-valued and only consulted by the
            # driver-side point-pruning path; they ride the JSON stats
            # column, not the typed smin/smax pair
            if not c.startswith(_BLOOM_KEY)
        }
    )
    table = pa.table(cols)
    for c in stat_cols:
        mins = [
            state["stats"].get(f, {}).get(c, [None, None])[0]
            for f in rows_files
        ]
        maxs = [
            state["stats"].get(f, {}).get(c, [None, None])[1]
            for f in rows_files
        ]
        try:
            table = table.append_column(f"smin_{c}", pa.array(mins))
            table = table.append_column(f"smax_{c}", pa.array(maxs))
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            # heterogeneous stat types for one column (possible only
            # through exotic evolution): the JSON column still carries
            # the exact values; Spark pruning falls back per-column
            pass
    ckpt = _checkpoint_path(root, _seq_of(name))
    ckpt.parent.mkdir(parents=True, exist_ok=True)
    tmp = ckpt.with_name(
        f".{ckpt.name}.tmp.{os.getpid()}.{threading.get_ident()}"
    )
    pq.write_table(table, tmp)
    os.replace(tmp, ckpt)
    return str(ckpt)


def _load_checkpoint(root: str, seq: int) -> dict:
    """State (sans columns/next_field_id — those ride the manifest
    doc) from a parquet checkpoint."""
    import pyarrow.parquet as pq

    path = str(_checkpoint_path(root, seq))
    want = ["file", "kind", "stats", "colmap", "parts", "external",
            "seq_added", "eq_key"]
    have = set(pq.ParquetFile(path).schema_arrow.names)
    t = pq.read_table(path, columns=[c for c in want if c in have])
    state = _empty_state()
    files, deletes = [], []
    stats, colmap, parts, external = {}, {}, {}, {}
    eq_deletes, seq_added = {}, {}
    any_colmap = False
    for row in t.to_pylist():
        f = row["file"]
        kind = row["kind"]
        if kind == "delete":
            deletes.append(f)
        elif kind == "eqdelete":
            eq_deletes[f] = {
                "key": row["eq_key"], "seq": int(row["seq_added"])
            }
        else:
            files.append(f)
            # pre-eq-delete checkpoints lack seq_added: default to the
            # checkpoint's own sequence — every equality delete
            # postdates such checkpoints, so the default stays correct
            # (seq_added <= ckpt seq < any eq-delete seq)
            s_add = row.get("seq_added")
            seq_added[f] = int(s_add) if s_add is not None else seq
        if row["stats"] is not None:
            stats[f] = json.loads(row["stats"])
        if row["colmap"] is not None:
            colmap[f] = json.loads(row["colmap"])
            any_colmap = True
        if row["parts"] is not None:
            parts[f] = json.loads(row["parts"])
        if row["external"] is not None:
            external[f] = row["external"]
    state["files"] = sorted(files)
    state["deletes"] = sorted(deletes)
    state["eq_deletes"] = eq_deletes
    state["seq_added"] = seq_added
    state["stats"] = stats
    state["colmap"] = colmap if any_colmap else None
    state["parts"] = parts
    state["external"] = external
    return state


def latest_checkpoint_seq(root: str, upto: int) -> int | None:
    """The largest checkpoint sequence ≤ ``upto``, or None."""
    cdir = pathlib.Path(root, "checkpoints")
    if not cdir.is_dir():
        return None
    best = None
    for p in cdir.iterdir():
        if p.name.startswith("ck-") and p.suffix == ".parquet":
            s = _seq_of(p.name)
            if s <= upto and (best is None or s > best):
                best = s
    return best


def _norm_stats_cols(stats_col) -> tuple[str, ...]:
    """Accept a single column name or a sequence of them."""
    if stats_col is None:
        return ()
    if isinstance(stats_col, str):
        return (stats_col,)
    return tuple(stats_col)


# Reserved stats-entry key prefix for per-file Bloom filters: a
# bloom for column `c` lives in the same {file -> {key -> ...}}
# relation as the [min, max] ranges, under key `__bloom__c` — it rides
# every manifest/checkpoint/rekey path the ranges already ride.
_BLOOM_KEY = "__bloom__"
_BLOOM_M_BITS = 8192  # 1 KiB of bits per (file, column)
_BLOOM_K = 6


def _bloom_canon(value) -> str:
    """Type-stable canonical form of a bloom key: SQL-equal values must
    hash identically whatever Python type carried them, or an
    equal-but-differently-typed probe (int column probed with 2.0, a
    numpy scalar from user code) becomes a bloom FALSE NEGATIVE and
    point pruning silently drops the containing file (review-found
    r14 — the one bug class a membership sketch must not have; false
    POSITIVES from canonical collisions only cost a scan). Numerics
    collapse to their integer repr when integral; numpy scalars unbox
    via .item(); everything else keeps repr()."""
    if hasattr(value, "item"):  # numpy scalar: unbox to the Python type
        try:
            value = value.item()
        except Exception:  # noqa: BLE001 - non-numpy .item()
            pass
    if isinstance(value, bool):
        return repr(int(value))
    if isinstance(value, (int, float)):
        f = float(value)
        if f.is_integer() and abs(f) < 2**53:
            return repr(int(f))
        return repr(f)
    return repr(value)


def _bloom_hashes(value, m: int, k: int) -> list[int]:
    # double hashing (Kirsch-Mitzenmacher): two keyed blake2b digests
    # of the value's canonical form drive all k probe positions.
    import hashlib

    s = _bloom_canon(value).encode()
    h1 = int.from_bytes(
        hashlib.blake2b(s, digest_size=8, person=b"nkchblm1").digest(),
        "big",
    )
    h2 = int.from_bytes(
        hashlib.blake2b(s, digest_size=8, person=b"nkchblm2").digest(),
        "big",
    ) | 1
    return [(h1 + i * h2) % m for i in range(k)]


def _bloom_build(values, m_bits: int = _BLOOM_M_BITS,
                 k: int = _BLOOM_K) -> dict:
    import base64

    bits = bytearray(m_bits // 8)
    for v in values:
        if v is None:
            continue
        for pos in _bloom_hashes(v, m_bits, k):
            bits[pos >> 3] |= 1 << (pos & 7)
    return {
        "m": m_bits,
        "k": k,
        "z": base64.b64encode(zlib.compress(bytes(bits), 6)).decode(),
    }


def _bloom_contains(bloom: dict, value) -> bool:
    import base64

    bits = zlib.decompress(base64.b64decode(bloom["z"]))
    return all(
        bits[pos >> 3] & (1 << (pos & 7))
        for pos in _bloom_hashes(value, bloom["m"], bloom["k"])
    )


def _file_column_values(path: pathlib.Path, col: str) -> list | None:
    """One column of one parquet file (the bloom build's input). None
    when the column is physically absent."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(str(path))
    if col not in pf.schema_arrow.names:
        return None
    return pf.read(columns=[col]).column(col).to_pylist()


def _record_stats(
    data: pathlib.Path,
    files: list[str],
    stats_cols: tuple[str, ...],
    bloom_cols: tuple[str, ...] = (),
) -> dict:
    """Column-keyed footer stats for newly adopted files: {file →
    {col → [min, max]}}; columns whose footers lack min/max are simply
    absent (the file is then never pruned on that column).

    ``bloom_cols`` additionally records a per-file BLOOM FILTER under
    the reserved ``__bloom__{col}`` key — the point-lookup complement
    to ranges: min/max cannot prune an equality probe on a
    high-cardinality key whose values interleave across files (every
    range overlaps), a membership sketch can. Building it reads the
    column once from the writer's OWN just-written file (production
    formats compute it inline in the write task — same bytes, earlier);
    the sketch itself is ~1 KiB compressed per (file, column), the
    same O(files) metadata class as the ranges."""
    out: dict = {}
    for f in files:
        ent = {}
        for col in stats_cols:
            mm = _file_minmax(data / f, col)
            if mm is not None:
                ent[col] = mm
        for col in bloom_cols:
            vals = _file_column_values(data / f, col)
            if vals is not None:
                ent[_BLOOM_KEY + col] = _bloom_build(vals)
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


_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _part_lit(val: str, dtype):
    """A partition tuple value as a typed literal column (NULL for
    hive's default-partition token)."""
    from pyspark.sql import functions as F

    if val == _HIVE_NULL:
        return F.lit(None).cast(dtype)
    return F.lit(val).cast(dtype)


def partition_pruned_files(
    root: str, name: str, filters: dict
) -> tuple[list[str], int]:
    """Partition pruning: the subset of version ``name``'s files whose
    partition tuple matches ``filters`` ({current logical column name
    → value}), plus the total live count. Files without a recorded
    tuple (pre-partitioning commits, copy-on-write replacements) are
    conservatively kept — like stats pruning, this is an OPTIMIZATION;
    callers still apply the row predicate on top. On schema-tracked
    tables the tuple is field-id-keyed, so the filter resolves the
    CURRENT name through the logical schema and a renamed partition
    column keeps pruning (the spicy case partition specs exist for).
    Values compare by their hive string form (``str(value)``; None
    matches hive's default-partition token)."""
    state = _table_state(root, name)
    want = _partition_want(state, filters)
    kept = []
    for f in state["files"]:
        tup = state["parts"].get(f, {})
        if all(tup.get(k, want_v) == want_v for k, want_v in want.items()):
            kept.append(f)
    return kept, len(state["files"])


def _partition_want(state: dict, filters: dict) -> dict:
    """Normalize a user partition filter ({current logical column name
    → value}) into manifest-tuple keys and hive string values — the
    ONE place the field-id resolution and hive-value rendering
    (``str(value)``, ``_HIVE_NULL`` for None) live, shared by
    :func:`partition_pruned_files` and :func:`compact`'s partition
    scoping so the two can never disagree on partition membership."""
    keymap = (
        {c["name"]: str(c["id"]) for c in state["columns"]}
        if state["columns"] is not None
        else {}
    )
    return {
        keymap.get(col, col): (_HIVE_NULL if v is None else str(v))
        for col, v in filters.items()
    }


def _adopt_partitioned(
    staging: pathlib.Path, data: pathlib.Path, prefix: str,
    partition_by: tuple[str, ...],
) -> tuple[list[str], dict]:
    """Adopt a ``partitionBy`` staging tree: walk the hive directories
    (``col=value/.../part-*.parquet``), flatten every leaf file into
    ``data/`` under a unique immutable name, and return (adopted
    names, {name → {column → hive string value}}). The directory
    encoding is Spark's hive layout (URL-escaped values,
    ``__HIVE_DEFAULT_PARTITION__`` for NULL); the manifest stores the
    DECODED string — Iceberg's partition tuple in its minimal form."""
    from urllib.parse import unquote

    data.mkdir(parents=True, exist_ok=True)
    adopted: list[str] = []
    parts_map: dict = {}
    leaves = sorted(
        p for p in staging.rglob("part-*")
        if p.is_file() and not p.name.endswith(".crc")
    )
    for i, p in enumerate(leaves):
        tup: dict = {}
        for comp in p.relative_to(staging).parts[:-1]:
            k, _, v = comp.partition("=")
            if k in partition_by:
                tup[k] = unquote(v)
        missing = set(partition_by) - set(tup)
        if missing:
            raise ValueError(
                f"staging leaf {p} lacks partition dirs for {missing}"
            )
        tgt = data / f"{prefix}-{i:05d}{''.join(p.suffixes)}"
        os.replace(p, tgt)
        adopted.append(tgt.name)
        parts_map[tgt.name] = tup
    shutil.rmtree(staging)
    return adopted, parts_map


def append_batch(
    df: DataFrame,
    root: str,
    batch_id: int,
    *,
    stats_col: str | None = None,
    bloom_col: str | None = None,
    track_schema: bool = False,
    partition_by: tuple[str, ...] = (),
) -> str:
    """Append one micro-batch: write to staging, adopt the files,
    commit the adds as one delta. The ``batch_id`` keys the file
    names, so a foreachBatch RETRY of the same epoch overwrites its
    own staging rather than double-adopting (and a retry whose earlier
    attempt already committed re-adds the same names — replay dedupes,
    so readers never double-count the batch). With ``stats_col`` the
    commit also records each adopted file's [min, max] of that column
    (footer-only read), enabling file-level data skipping in
    :func:`read_table` — give every commit of a table the SAME
    stats_col or range reads lose pruning on the uncovered files.

    ``track_schema=True`` on a table's FIRST commit initializes schema
    tracking: field ids are assigned by position at that commit
    (Iceberg's resolve-by-position-at-commit), enabling the evolution
    verbs (:func:`widen_column` / :func:`rename_column` /
    :func:`drop_column` / :func:`add_column`) and :func:`read_evolved`.
    Once a table tracks its schema, every later append is validated
    against the CURRENT logical schema — exact names and types; the
    writer casts, the table never guesses.

    ``partition_by`` hive-partitions the batch (VERDICT r12 task 5):
    the write partitions on the named columns, each adopted file's
    partition tuple lands in the manifest, and reads prune on it
    (:func:`read_table`'s ``where_partition``) BEFORE stats pruning —
    the (source, language, date) layout a real corpus table uses. On a
    schema-tracked table the tuple is keyed by FIELD ID, so renaming a
    partition column keeps pruning intact. The partition columns stay
    part of the logical schema; the physical files just don't repeat
    them (the read path re-attaches the tuple values as literals,
    exactly how hive/Iceberg serve identity-partition columns)."""
    root_p = pathlib.Path(root)
    staging = root_p / f".staging-{batch_id}"
    writer = df.write.mode("overwrite")
    if partition_by:
        missing = set(partition_by) - set(df.columns)
        if missing:
            raise ValueError(f"partition_by columns not in batch: {missing}")
        writer = writer.partitionBy(*partition_by)
    writer.parquet(str(staging))
    data = root_p / "data"
    if partition_by:
        adopted, name_parts = _adopt_partitioned(
            staging, data, f"b{batch_id:08d}", tuple(partition_by)
        )
    else:
        adopted = _adopt(staging, data, f"b{batch_id:08d}")
        name_parts = {}
    # ``bloom_col`` records a per-file membership sketch next to the
    # ranges (see _record_stats) — the point-lookup complement for a
    # high-cardinality key whose values interleave across files
    new_stats = _record_stats(
        data, adopted, _norm_stats_cols(stats_col),
        bloom_cols=_norm_stats_cols(bloom_col),
    )
    # Appends are BLIND (Delta's AddFile-only commit): they conflict
    # with no concurrent commit logically, so a CommitConflict just
    # means the base moved — re-read, retry. The bound is a livelock
    # guard, not a correctness limit. The retry is O(schema), never
    # O(files): the delta doc carries only this batch's adds.
    df_fields = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    for _ in range(64):
        cur, _live = read_manifest(root)
        if cur is not None:
            # batch-id collision with a shallow clone's CARRIED file:
            # the deterministic per-epoch names exist for retry
            # idempotency WITHIN one table's history, but a clone
            # inherits its source's names by external reference — an
            # append reusing one of those batch ids would silently
            # shadow its own data behind the external mapping. Refuse
            # loudly (a genuine retry never collides with an external:
            # its first attempt adopted locally).
            ext = _table_state(root, cur)["external"]
            shadowed = [f for f in adopted if f in ext]
            if shadowed:
                # unwind the adopt before refusing: the local bytes
                # share a live external name, so they would be both
                # unreadable (_data_path resolves external first) and
                # unvacuumable (the name is in the keep set) —
                # permanent orphans (review-found r14)
                for f in adopted:
                    (data / f).unlink(missing_ok=True)
                raise ValueError(
                    f"append batch {batch_id} adopts file name(s) "
                    f"{shadowed} already carried by this table as "
                    "external (shallow-clone) references; use a batch "
                    "id the clone's source never used"
                )
        columns = _manifest_doc(root, cur).get("columns") if cur else None
        init_columns = None
        if columns is not None:
            want = {(c["name"], c["type"]) for c in columns}
            if set(df_fields) != want:
                raise ValueError(
                    f"append batch {batch_id} schema {sorted(df_fields)} "
                    f"does not match the table's current logical schema "
                    f"{sorted(want)}; evolve the table or cast the batch"
                )
        elif track_schema:
            init_columns = [
                {"id": i, "name": n, "type": t}
                for i, (n, t) in enumerate(df_fields)
            ]
        parts_adds = None
        colmap_adds = None
        if partition_by:
            effective = columns if columns is not None else init_columns
            if effective is not None:
                # field-id-keyed partition tuple: a later RENAME of the
                # partition column is metadata-only and pruning keeps
                # working (the Iceberg partition-spec indirection)
                key_of = {c["name"]: str(c["id"]) for c in effective}
                parts_adds = {
                    f: {key_of[k]: v for k, v in tup.items()}
                    for f, tup in name_parts.items()
                }
                # the adopted files physically LACK the partition
                # columns (hive layout): their pinned mapping must say
                # so, or the evolved scan would ask parquet for a
                # column that isn't there
                part_ids = {key_of[k] for k in partition_by}
                ident = {
                    str(c["id"]): [c["name"], c["type"]]
                    for c in effective
                    if str(c["id"]) not in part_ids
                }
                colmap_adds = {f: ident for f in adopted}
            else:
                parts_adds = name_parts
        try:
            return _commit_delta(
                root, cur, f"append batch {batch_id}",
                adds=adopted,
                stats_adds=new_stats or None,
                columns=init_columns,
                parts_adds=parts_adds,
                colmap_adds=colmap_adds,
            )
        except CommitConflict:
            continue
    raise CommitConflict(
        f"append batch {batch_id} lost 64 consecutive commit races"
    )


def _data_path(root: str, state: dict, f: str) -> str:
    """Resolve a manifest entry to its on-disk path: local files live
    under ``root/data/``, shallow-clone entries carry their source's
    path in ``state['external']`` — absolute (tables that move
    independently) or relative to this table's root (a clone bundled
    WITH its source under one movable directory)."""
    ext = state["external"].get(f)
    if ext is None:
        return str(pathlib.Path(root, "data", f))
    return ext if os.path.isabs(ext) else str(pathlib.Path(root, ext))


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
    partition: dict | None = None,
    force: bool = False,
) -> int:
    """Rewrite the live set into ``ceil(total/target_bytes)`` files
    (floor 1; ``target_files`` overrides) and commit the replacement
    set. Returns the file-count reduction — 0 when there was nothing
    to do, and ALSO 0 when the rewrite only materialized pending
    merge-on-read masks without shrinking the file count (check
    ``table_state(root)['deletes']`` for that distinction).
    Superseded files are left for :func:`vacuum`. ``stats_col``
    re-records [min, max] for the replacement files. Pending
    merge-on-read delete files are APPLIED and CONSUMED: the rewrite
    materializes the deletes, so the replacement version carries none
    (Iceberg's rewrite-data-files action).

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

    On a hive-partitioned table (files carrying partition tuples) the
    rewrite runs PER PARTITION GROUP — the unit a production compactor
    rewrites — and the replacement files inherit their group's
    partition tuple, so partition pruning survives compaction.

    ``partition`` ({current logical column name → value}) SCOPES the
    compaction to groups whose tuple matches exactly (files without a
    tuple are out of scope) — the one-partition-at-a-time unit a
    production compactor schedules. Two scoped compactions of DISJOINT
    partitions are serializable: a loser whose interleave rewrote only
    files outside its own rewrite set auto-rebases and commits
    (:func:`_rewrite_interleave_ok`); overlapping rewrites still
    surface :class:`CommitConflict`.

    ``force=True`` rewrites every (scoped) group even when it already
    meets its file target — the rewrite-everything action (Iceberg's
    ``rewrite-data-files`` with a min-input threshold of 1) that
    materializes schema evolution into the files themselves, which is
    what :func:`export_hive_bundle`'s pre-evolution refusal
    prescribes.
    """
    stats_cols = _norm_stats_cols(stats_col)
    if cluster and not stats_cols and cluster_expr is None:
        raise ValueError("cluster=True requires stats_col or cluster_expr")
    cur, live = read_manifest(root)
    if not live:
        return 0
    state = _table_state(root, cur)
    # files referenced by a pending merge-on-read mask must be
    # rewritten even when their group already meets its file target —
    # compact is the MATERIALIZATION point (export_manifest and the
    # read-path anti-join both rely on "compact clears the masks"),
    # and a size-only early-out would strand a mask forever
    # (review-found r13). Only LIVE refs count: a mask may also carry
    # dead refs to files a prior rewrite already consumed (ADVICE r13).
    masked: set[str] = set()
    live_set = set(live)
    for d in state["deletes"]:
        masked |= _delete_file_refs(root, state, d) & live_set
    for d in state["eq_deletes"]:
        masked |= _eq_affected(state, d)
    if len(live) <= 1 and not masked and not force:
        if state["deletes"] or state["eq_deletes"]:
            # every pending mask is dead weight (all refs consumed by
            # prior rewrites): clear them with a metadata-only commit
            # so reads stop paying the anti-join and export_manifest's
            # "compact first" prescription actually works
            _commit_delta(
                root, cur,
                f"compact: cleared "
                f"{len(state['deletes']) + len(state['eq_deletes'])} "
                "dead delete file(s)",
                delete_removes=list(state["deletes"]),
                eq_delete_removes=list(state["eq_deletes"]),
            )
        return 0
    data = pathlib.Path(root, "data")
    # one rewrite group per partition tuple (a single group for
    # unpartitioned tables); file counts and byte targets are computed
    # per group so a small partition never inflates a big one's files
    groups: dict[tuple, list[str]] = {}
    for f in live:
        sig = tuple(sorted(state["parts"].get(f, {}).items()))
        groups.setdefault(sig, []).append(f)
    if partition is not None:
        # strict membership (files without a tuple are OUT of scope):
        # a scoped compaction is a disjointness unit, unlike read-path
        # pruning's conservative keep-the-unknown
        want = _partition_want(state, partition)
        groups = {
            sig: fs
            for sig, fs in groups.items()
            if all(dict(sig).get(k) == v for k, v in want.items())
        }
        if not groups:
            return 0
    total_before = len(live)
    adopted_all: list[str] = []
    removed: list[str] = []
    parts_adds: dict = {}
    seq = _seq_of(cur) + 1
    nonce = uuid.uuid4().hex[:8]
    for gi, (sig, gfiles) in enumerate(sorted(groups.items())):
        total = sum(
            os.stat(_data_path(root, state, f)).st_size for f in gfiles
        )
        target = target_files or max(1, math.ceil(total / target_bytes))
        if target >= len(gfiles) and not force:
            if not (masked & set(gfiles)):
                # nothing to do for this group: keep its files as-is
                continue
            # a mask references this group: rewrite it at its current
            # file count purely to materialize the deletes
            target = len(gfiles)
        # WRITER-UNIQUE staging dir and adopted names: two rewriters
        # that derived the same base must never share an output
        # location — a deterministic name would let the conflict LOSER
        # overwrite the winner's already-committed immutable files via
        # mode("overwrite") + os.replace before its own commit even
        # gets to raise. The loser's uniquely-named orphans are
        # unreferenced and vacuumed. (Appends keep deterministic
        # per-batch_id names on purpose: retry idempotency of the SAME
        # epoch; distinct writers use distinct batch-id namespaces.)
        staging = pathlib.Path(root, f".compact-{seq}.{nonce}.{gi}")
        scan = _scan_files_state(
            spark, root, state, gfiles, schema, apply_deletes=True
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
        adopted = _adopt(staging, data, f"c{seq:08d}-{nonce}-{gi}")
        adopted_all.extend(adopted)
        removed.extend(gfiles)
        if sig:
            # the replacement files physically CONTAIN the partition
            # columns (the group scan re-attached them); the recorded
            # tuple keeps partition pruning alive post-compaction
            for f in adopted:
                parts_adds[f] = dict(sig)
    if not adopted_all:
        dead = _consumed_deletes(spark, root, state, [])
        dead_eq = _consumed_eq_deletes(state, [])
        if dead or dead_eq:  # all-dead masks, no group to rewrite
            _commit_delta(
                root, cur,
                f"compact: cleared {len(dead) + len(dead_eq)} dead "
                "delete file(s)",
                delete_removes=dead,
                eq_delete_removes=dead_eq,
            )
        return 0
    stats = _record_stats(data, adopted_all, stats_cols)
    # base=cur, with DISJOINT-REWRITE auto-rebase: a concurrent commit
    # that touched none of this rewrite's inputs (a blind append, a
    # compaction of a disjoint partition group) composes — the loser
    # re-commits the same delta on the new head. Anything overlapping
    # (shared removes, masks on our inputs, schema ops) still
    # surfaces; the caller re-reads and re-compacts.
    # Position-delete files whose every entry referenced a rewritten
    # file are CONSUMED (the rewrite applied them); entries referencing
    # a skipped group's files must survive.
    _commit_rewrite(
        root, cur,
        f"compact {total_before} -> "
        f"{total_before - len(removed) + len(adopted_all)} files",
        removed,
        adds=adopted_all,
        stats_adds=stats or None,
        parts_adds=parts_adds or None,
        delete_removes=_consumed_deletes(spark, root, state, removed),
        eq_delete_removes=_consumed_eq_deletes(state, removed),
    )
    return len(removed) - len(adopted_all)


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
        touched, _ = pruned_files(root, cur, key, lo, hi, spark=spark)
    else:
        touched = list(live)  # no usable stats: rewrite everything
    state = _table_state(root, cur)
    data = pathlib.Path(root, "data")
    seq = _seq_of(cur) + 1
    nonce = uuid.uuid4().hex[:8]  # writer-unique: see compact()
    staging = pathlib.Path(root, f".merge-{seq}.{nonce}")
    # apply_deletes: pending merge-on-read masks MUST ride the rewrite
    # — scanning touched files raw would resurrect masked rows into the
    # replacement files (review-found r13; compact had this right)
    base = _scan_files_state(
        spark, root, state, touched, schema, apply_deletes=True
    )
    (
        base.join(updates.select(key), key, "left_anti")
        .unionByName(updates)
        .coalesce(max(1, len(touched)))
        .write.mode("overwrite")
        .parquet(str(staging))
    )
    adopted = _adopt(staging, data, f"u{seq:08d}-{nonce}")
    stats = _record_stats(data, adopted, _norm_stats_cols(stats_col))
    # disjoint-rewrite auto-rebase (same rule as compact): a blind
    # append or a rewrite of OTHER files composes with this merge —
    # rows appended after the snapshot are not subject to the update
    # set (Delta's write-serializable MERGE-across-appends rule) —
    # while anything touching this merge's inputs still conflicts
    name = _commit_rewrite(
        root, cur,
        f"merge upsert: rewrote {len(touched)} of {len(live)} files",
        touched,
        adds=adopted,
        stats_adds=stats or None,
        delete_removes=_consumed_deletes(spark, root, state, touched),
        eq_delete_removes=_consumed_eq_deletes(state, touched),
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
    rewritten, live files before). For the merge-on-read form that
    rewrites NO data files, see :func:`delete_where_merge_on_read`.

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
        touched, _ = pruned_files(root, cur, col, lo, hi, spark=spark)
    else:
        touched = list(live)  # no usable stats: rewrite everything
    if not touched:  # no file can contain a victim: no-op commit-wise
        return cur, 0, len(live)
    state = _table_state(root, cur)
    data = pathlib.Path(root, "data")
    seq = _seq_of(cur) + 1
    nonce = uuid.uuid4().hex[:8]  # writer-unique: see compact()
    staging = pathlib.Path(root, f".delete-{seq}.{nonce}")
    # apply_deletes: pending merge-on-read masks MUST ride the rewrite
    # — scanning touched files raw would resurrect masked rows into the
    # replacement files (review-found r13; compact had this right)
    base = _scan_files_state(
        spark, root, state, touched, schema, apply_deletes=True
    )
    survivors = base.filter(
        ~F.coalesce(F.col(col).between(lo, hi), F.lit(False))
    )
    survivors.coalesce(max(1, len(touched))).write.mode("overwrite").parquet(
        str(staging)
    )
    adopted = _adopt(staging, data, f"d{seq:08d}-{nonce}")
    stats = _record_stats(data, adopted, _norm_stats_cols(stats_col))
    # disjoint-rewrite auto-rebase (same rule as compact): retention
    # deletes and ingest appends run concurrently in production — a
    # blind append composes (rows appended after the snapshot are not
    # subject to the predicate, write-serializable semantics), as does
    # a rewrite of other files; overlap still conflicts
    name = _commit_rewrite(
        root, cur,
        f"delete {col} in [{lo}, {hi}]: rewrote {len(touched)} of "
        f"{len(live)} files",
        touched,
        adds=adopted,
        stats_adds=stats or None,
        delete_removes=_consumed_deletes(spark, root, state, touched),
        eq_delete_removes=_consumed_eq_deletes(state, touched),
    )
    return name, len(touched), len(live)


def _consumed_deletes(
    spark: SparkSession, root: str, state: dict, rewritten: list[str]
) -> list[str]:
    """Position-delete files FULLY consumed by rewriting ``rewritten``
    data files: a delete file whose every LIVE entry references a
    rewritten file carries no live information afterwards and leaves
    the manifest. Delete files that also reference surviving data
    files stay (their surviving entries still apply).

    The subset test runs on ``refs ∩ live``: entries referencing
    already-removed files are dead weight (a prior rewrite consumed
    and dropped their data file but kept this mask for its then-live
    refs) and must not veto consumption — otherwise a partially
    consumed mask is stranded FOREVER (its dead ref can never appear
    in a later commit's rewritten set; ADVICE r13). By the same rule a
    mask whose live intersection is EMPTY — all refs dead, or an
    empty delete file — is consumed by whatever commit looks next."""
    if not state["deletes"]:
        return []
    rewritten_set = set(rewritten)
    live_set = set(state["files"])
    consumed = []
    for d in state["deletes"]:
        live_refs = _delete_file_refs(root, state, d) & live_set
        if live_refs <= rewritten_set:
            consumed.append(d)
    return consumed


def _eq_affected(state: dict, eq_file: str) -> set[str]:
    """Live data files an equality-delete file can still mask: every
    live file STRICTLY OLDER than the delete (``seq_added < seq``).
    Conservative — key presence is not consulted (that would need the
    scan merge-on-read exists to avoid)."""
    s = state["eq_deletes"][eq_file]["seq"]
    return {
        f for f in state["files"] if state["seq_added"].get(f, 0) < s
    }


def _consumed_eq_deletes(state: dict, rewritten: list[str]) -> list[str]:
    """Equality-delete files FULLY consumed by rewriting ``rewritten``:
    once every live file older than the delete is rewritten (the
    replacements carry a NEWER sequence), the delete can never mask
    another row and leaves the manifest. A delete no live file is
    older than is dead weight and consumed by whatever commit looks
    next — same rule as :func:`_consumed_deletes`."""
    if not state["eq_deletes"]:
        return []
    rewritten_set = set(rewritten)
    return [
        d for d in state["eq_deletes"]
        if _eq_affected(state, d) <= rewritten_set
    ]


def _delete_file_refs(root: str, state: dict, delete_file: str) -> set[str]:
    """The distinct data-file names a position-delete file references
    (footer+column read of a metadata-sized file)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        _data_path(root, state, delete_file), columns=["file"]
    )
    return set(t.column("file").to_pylist())


def _additive_interleave(root: str, base: str | None, head: str) -> bool:
    """True when every commit in (base, head] is ADDITIVE-ONLY — new
    data files, no removes, no delete-file churn, no schema/stats ops,
    no full-snapshot restart. Against such an interleave a
    merge-on-read commit's delta stays valid verbatim: its position
    entries reference files nobody rewrote, and the interleaved adds
    are untouched by it — so the loser can REBASE (re-commit the same
    delta on the new head) instead of surfacing the conflict. This is
    the logical conflict detection optimistic table formats run (Delta
    allows DELETE/MERGE to commit across concurrent blind appends
    under write-serializable isolation, with exactly this snapshot
    semantics: rows appended AFTER the verb's snapshot are not subject
    to its predicate)."""
    base_cols = _manifest_doc(root, base).get("columns") if base else None
    start = _seq_of(base) + 1 if base else 0
    for s in range(start, _seq_of(head) + 1):
        doc = _manifest_doc(root, _manifest_name(s))
        if "files" in doc:  # full-snapshot restart: can't reason, bail
            return False
        if any(
            doc.get(k)
            for k in (
                "removes", "delete_adds", "delete_removes",
                "eq_delete_adds", "eq_delete_removes",
                "stats_rekey", "stats_drop",
            )
        ):
            return False
        # schema evolution is NOT additive (ADVICE r13): widen/rename/
        # add commits carry only columns/next_field_id deltas, but a
        # rebased merge-on-read commit would adopt its post-image data
        # files (written under the PRE-evolution schema) with the
        # post-evolution identity colmap, pinning the wrong physical
        # type onto them and corrupting the evolved scan. columns ride
        # every commit once tracking starts, so compare against the
        # base's — any difference means an evolution interleaved.
        if doc.get("columns") != base_cols:
            return False
    return True


def _rewrite_interleave_ok(
    root: str, base: str | None, head: str, removes: set[str]
) -> bool:
    """True when every commit in (base, head] composes with a REWRITE
    whose read-and-remove set is ``removes`` — the disjoint-rewrite
    serializability check (VERDICT r13 task 4). Two compactions of
    disjoint partition groups (or disjoint file sets) are serializable:
    the loser's output was derived only from files the interleave
    never touched, so re-committing the same delta on the new head is
    the serial schedule. The interleave must NOT:

    - be a full-snapshot restart (can't reason about it);
    - remove any file in ``removes`` (double-rewrite: the loser would
      re-add rows the winner already rewrote);
    - add a position-delete mask referencing ``removes`` (the loser's
      replacement files did not apply it — committing would resurrect
      masked rows);
    - add an equality delete (the loser's replacements carry a NEWER
      sequence than the interleaved delete, so rows that should be
      masked would escape it);
    - change the schema or rekey/drop stats (the loser's recorded
      stats/colmap entries speak the base's schema).

    Blind appends and disjoint rewrites pass; everything else
    surfaces :class:`CommitConflict` to the caller."""
    base_cols = _manifest_doc(root, base).get("columns") if base else None
    head_state = _table_state(root, head)
    start = _seq_of(base) + 1 if base else 0
    for s in range(start, _seq_of(head) + 1):
        doc = _manifest_doc(root, _manifest_name(s))
        if "files" in doc:
            return False
        if any(
            doc.get(k)
            for k in ("eq_delete_adds", "stats_rekey", "stats_drop")
        ):
            return False
        if set(doc.get("removes", ())) & removes:
            return False
        if doc.get("columns") != base_cols:
            return False
        for d in doc.get("delete_adds", ()):
            if d in head_state["deletes"] or d in head_state["external"]:
                refs = _delete_file_refs(root, head_state, d)
            else:
                # the mask was already consumed later in the interleave
                # — its surviving refs are whatever that consumer
                # rewrote, which the remove-disjointness check covers
                continue
            if refs & removes:
                return False
    return True


def _commit_rewrite(
    root: str, base: str | None, note: str, removes: list[str], **delta
) -> str:
    """Commit a rewrite delta with AUTO-REBASE across interleaves that
    :func:`_rewrite_interleave_ok` proves disjoint — the compactor
    sibling of :func:`_commit_mor`. A 1000-partition table compacted
    by independent per-partition jobs must not serialize them through
    commit-retry storms; disjointness makes the rebase a no-op
    logically, so the loser just re-commits on the new head."""
    removes_set = set(removes)
    for _ in range(64):
        try:
            return _commit_delta(root, base, note, removes=removes,
                                 **delta)
        except CommitConflict:
            head, _ = read_manifest(root)
            if not _rewrite_interleave_ok(root, base, head, removes_set):
                raise
            base = head
    raise CommitConflict(f"{note!r} lost 64 consecutive commit races")


def delete_where_merge_on_read(
    spark: SparkSession,
    root: str,
    schema,
    col: str,
    lo,
    hi,
    *,
    stats_col: str | None = None,
) -> tuple[str, int]:
    """MERGE-ON-READ DELETE (Iceberg v2 position deletes / Delta
    deletion vectors): instead of rewriting every file that contains a
    victim row (:func:`delete_where`'s copy-on-write), commit a small
    POSITION-DELETE FILE of (data file, row position) pairs; reads
    subtract it with an anti-join, and :func:`compact` materializes it
    later. Returns (new manifest name, victim row count). A 1-row
    delete in a 1 GB file costs a few metadata bytes now and folds
    into the next compaction — the at-scale answer to frequent small
    deletes that copy-on-write cannot afford.

    With ``stats_col == col`` the victim SCAN is stats-pruned to the
    files whose range can contain a victim; the commit itself rewrites
    ZERO data files regardless. Rows with a NULL ``col`` never match
    BETWEEN and are never deleted. Supported on tables whose live
    files all carry the queried column physically (schema-tracked
    tables with renamed/widened history included — the scan resolves
    each file through its pinned mapping)."""
    from pyspark.sql import functions as F

    cur, live = read_manifest(root)
    if not live:
        raise ValueError(f"{root} has no committed version")
    if stats_col == col:
        touched, _ = pruned_files(root, cur, col, lo, hi, spark=spark)
    else:
        touched = list(live)
    state = _table_state(root, cur)
    if not touched:
        return cur, 0
    # victim positions: scan ONLY the touched files, with file identity
    # and row position from the parquet reader's metadata columns; the
    # position-delete entries key by BASENAME so a shallow clone (whose
    # external paths differ) still resolves them
    scan = _scan_files_state(
        spark, root, state, touched, schema,
        with_meta=True, apply_deletes=True,
    )
    victims = (
        scan.filter(F.coalesce(F.col(col).between(lo, hi), F.lit(False)))
        .select(
            F.col("__mor_file").alias("file"),
            F.col("__mor_pos").alias("pos"),
        )
    )
    seq = _seq_of(cur) + 1
    nonce = uuid.uuid4().hex[:8]
    staging = pathlib.Path(root, f".mordelete-{seq}.{nonce}")
    victims.coalesce(1).write.mode("overwrite").parquet(str(staging))
    data = pathlib.Path(root, "data")
    adopted = _adopt(staging, data, f"pd{seq:08d}-{nonce}")
    n = _count_rows(data / adopted[0])
    if n == 0:
        # no victim row: drop the empty delete file, no commit
        (data / adopted[0]).unlink()
        return cur, 0
    name = _commit_mor(
        root, cur,
        f"merge-on-read delete {col} in [{lo}, {hi}]: {n} positions, "
        f"0 data files rewritten",
        delete_adds=adopted,
    )
    return name, n


def _commit_mor(root: str, base: str | None, note: str, **delta) -> str:
    """Commit a merge-on-read delta with AUTO-REBASE across additive
    interleaves: a blind append racing this commit bumps the sequence
    and O_EXCL rejects us, but the delta itself is still valid (its
    position entries reference files nobody rewrote), so re-commit it
    on the new head — the ingest-vs-retention pairing every production
    table runs concurrently. Anything non-additive in the interleave
    (a rewrite, another mask, a schema op) surfaces
    :class:`CommitConflict` to the caller, whose snapshot-derived
    delta may now be wrong — recompute and re-run, exactly the
    copy-on-write verbs' contract."""
    for _ in range(64):
        try:
            return _commit_delta(root, base, note, **delta)
        except CommitConflict:
            head, _ = read_manifest(root)
            if not _additive_interleave(root, base, head):
                raise
            base = head
    raise CommitConflict(f"{note!r} lost 64 consecutive commit races")


def _count_rows(path: pathlib.Path) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(str(path)).metadata.num_rows


def merge_upsert_merge_on_read(
    spark: SparkSession,
    root: str,
    schema,
    updates: DataFrame,
    key: str,
    *,
    stats_col: str | None = None,
) -> tuple[str, int]:
    """MERGE-ON-READ UPSERT (Iceberg v2's delete-file MERGE shape):
    where :func:`merge_upsert` REWRITES every file that can contain an
    update key, this commits (a) one position-delete file masking the
    matched rows' old images and (b) the update rows as NEW data files
    — zero data files rewritten, so the commit cost is the victim
    scan plus the update bytes, not the containing files' bytes.
    Returns (new manifest name, masked row count). Keys matching no
    row are plain inserts (their mask scan matches nothing). ``key``
    must be unique per version and per update batch — the same MERGE
    precondition as the copy-on-write form. :func:`compact`
    materializes the mask later; the change feed reports the upsert
    as updates/inserts exactly like the copy-on-write form (the
    consumer cannot tell which strategy ran — the point).

    With ``stats_col == key`` the victim scan is stats-pruned to the
    update band's files; pass the same ``stats_col`` as every other
    commit so the new update files carry range stats too."""
    from pyspark.sql import functions as F

    cur, live = read_manifest(root)
    if not live:
        return append_batch(updates, root, 0, stats_col=stats_col), 0
    bounds = updates.agg(F.min(key), F.max(key)).first()  # 1 row
    lo, hi = bounds[0], bounds[1]
    if lo is None:
        return cur, 0
    if stats_col == key:
        touched, _ = pruned_files(root, cur, key, lo, hi, spark=spark)
    else:
        touched = list(live)
    state = _table_state(root, cur)
    seq = _seq_of(cur) + 1
    nonce = uuid.uuid4().hex[:8]
    data = pathlib.Path(root, "data")
    # 1) the mask: positions of rows whose key matches an update
    delete_adds: list[str] = []
    n_masked = 0
    if touched:
        scan = _scan_files_state(
            spark, root, state, touched, schema,
            with_meta=True, apply_deletes=True,
        )
        victims = scan.join(updates.select(key), key, "left_semi").select(
            F.col("__mor_file").alias("file"),
            F.col("__mor_pos").alias("pos"),
        )
        dstaging = pathlib.Path(root, f".morupsert-{seq}.{nonce}.d")
        victims.coalesce(1).write.mode("overwrite").parquet(str(dstaging))
        delete_adds = _adopt(dstaging, data, f"pu{seq:08d}-{nonce}")
        n_masked = _count_rows(data / delete_adds[0])
        if n_masked == 0:
            (data / delete_adds[0]).unlink()
            delete_adds = []
    # 2) the post-images: update rows appended as new data files
    astaging = pathlib.Path(root, f".morupsert-{seq}.{nonce}.a")
    updates.coalesce(1).write.mode("overwrite").parquet(str(astaging))
    adopted = _adopt(astaging, data, f"v{seq:08d}-{nonce}")
    stats = _record_stats(data, adopted, _norm_stats_cols(stats_col))
    name = _commit_mor(
        root, cur,
        f"merge-on-read upsert: masked {n_masked} rows, "
        f"0 data files rewritten",
        adds=adopted,
        stats_adds=stats or None,
        delete_adds=delete_adds,
    )
    return name, n_masked


def _stage_eq_keys(
    root: str, df: DataFrame, key: str, seq: int, nonce: str, prefix: str
) -> tuple[list[str], int]:
    """Write the DISTINCT NON-NULL values of ``df[key]`` as one
    equality-delete parquet and adopt it under ``prefix``; returns
    (adopted names, key count) — ``([], 0)`` when nothing survives
    (the empty file is unlinked). One implementation shared by
    :func:`delete_by_key` and :func:`merge_upsert_equality` so the
    NULL-filter / distinct / empty-unlink contract cannot drift."""
    from pyspark.sql import functions as F

    staging = pathlib.Path(root, f".{prefix}stage-{seq}.{nonce}")
    df.select(F.col(key)).filter(
        F.col(key).isNotNull()
    ).distinct().coalesce(1).write.mode("overwrite").parquet(str(staging))
    data = pathlib.Path(root, "data")
    adopted = _adopt(staging, data, f"{prefix}{seq:08d}-{nonce}")
    n = _count_rows(data / adopted[0])
    if n == 0:
        (data / adopted[0]).unlink()
        return [], 0
    return adopted, n


def delete_by_key(
    spark: SparkSession,
    root: str,
    schema,
    key: str,
    keys_df: DataFrame,
) -> tuple[str, int]:
    """EQUALITY DELETE (Iceberg v2 equality delete files): commit a
    keyed delete WITHOUT scanning a single data file — where
    :func:`delete_where_merge_on_read` still pays a victim SCAN to
    resolve (file, position) pairs, this writes the key VALUES
    themselves as the delete file and lets every read (and the next
    compaction) subtract matching rows. Returns (new manifest name,
    distinct key count). The at-scale shape for streaming CDC: a
    delete/upsert event commits in O(its own bytes) regardless of
    where the victim rows live — no read-before-write, which is
    exactly why Flink→Iceberg upsert pipelines emit equality deletes.

    Applicability is decided by DATA SEQUENCE NUMBER: the delete masks
    rows only in files committed BEFORE it (``seq_added < delete
    seq``), so keys re-inserted afterwards are visible — and an upsert
    can ship its post-images in the very same commit unmasked. NULL
    keys never match (write a position delete for those). ``keys_df``
    must carry the key under the column name ``key`` with the table's
    own type.

    Concurrency: commits through the additive auto-rebase. NOTE the
    deliberately different contract vs position deletes — a rebased
    equality delete also masks matching rows of blind appends that
    interleaved (its re-commit bumps its sequence past theirs). That
    is keyed last-writer-wins, the semantics a CDC stream applying
    ordered events wants; position deletes pin their snapshot instead.
    """
    cur, live = read_manifest(root)
    if not live:
        raise ValueError(f"{root} has no committed version")
    seq = _seq_of(cur) + 1
    nonce = uuid.uuid4().hex[:8]
    adopted, n = _stage_eq_keys(root, keys_df, key, seq, nonce, "ed")
    if n == 0:
        return cur, 0
    name = _commit_mor(
        root, cur,
        f"equality delete on {key}: {n} keys, 0 files scanned",
        eq_delete_adds={adopted[0]: {"key": key}},
    )
    return name, n


def merge_upsert_equality(
    spark: SparkSession,
    root: str,
    schema,
    updates: DataFrame,
    key: str,
    *,
    stats_col: str | None = None,
) -> tuple[str, int]:
    """EQUALITY-DELETE UPSERT: one commit carrying (a) an
    equality-delete file of the update keys and (b) the update rows as
    new data files — ZERO reads of the base table. This is the third
    point on the MERGE cost spectrum: copy-on-write
    (:func:`merge_upsert`) rewrites the touched files, position-delete
    merge-on-read (:func:`merge_upsert_merge_on_read`) still scans
    them to resolve victim positions, and this form touches nothing —
    commit cost is exactly the update bytes, the shape a
    high-frequency streaming CDC upsert needs (Flink's Iceberg upsert
    sink emits precisely this pair).

    The same-commit post-images stay visible because equality deletes
    apply only to STRICTLY OLDER files (``seq_added < delete seq``);
    masked old images surface in the change feed as deletes/updates
    like every other strategy. Returns (new manifest name, update row
    count — matched rows are unknowable without the scan this verb
    exists to avoid; :func:`compact` materializes the mask later).
    ``key`` must be unique per version and per update batch. Rows with
    a NULL key are appended but never mask anything."""
    cur, live = read_manifest(root)
    if not live:
        return append_batch(updates, root, 0, stats_col=stats_col), 0
    seq = _seq_of(cur) + 1
    nonce = uuid.uuid4().hex[:8]
    data = pathlib.Path(root, "data")
    eq_adds, _n_keys = _stage_eq_keys(root, updates, key, seq, nonce, "eu")
    astaging = pathlib.Path(root, f".equpsert-{seq}.{nonce}.a")
    updates.coalesce(1).write.mode("overwrite").parquet(str(astaging))
    adopted = _adopt(astaging, data, f"w{seq:08d}-{nonce}")
    n_rows = sum(_count_rows(data / f) for f in adopted)
    if n_rows == 0:
        for f in adopted:
            (data / f).unlink()
        for f in eq_adds:
            (data / f).unlink()
        return cur, 0
    stats = _record_stats(data, adopted, _norm_stats_cols(stats_col))
    name = _commit_mor(
        root, cur,
        f"equality-delete upsert: {n_rows} rows, 0 files scanned",
        adds=adopted,
        stats_adds=stats or None,
        eq_delete_adds=(
            {eq_adds[0]: {"key": key}} if eq_adds else None
        ),
    )
    return name, n_rows


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
    replaying a log — the state diff names the data files each commit
    added or removed (and the position-delete files it added), and a
    key-level reconciliation over JUST those files separates real
    changes from copy-on-write ballast (rows a rewrite carried
    verbatim because they shared a file with a change).

    Returns the table columns plus ``_change``: ``insert`` and
    ``update_post`` rows carry the post-image, ``delete`` rows the
    pre-image. With ``update_preimages=True`` each updated key ALSO
    emits an ``update_pre`` row carrying the old image (Delta CDF's
    preimage/postimage pair) — what downstream LINEAR consumers need:
    an incremental aggregate subtracts the pre-image and adds the
    post-image. ``key`` must be unique per version (the same contract
    as :func:`merge_upsert`). ``to_name=None`` reads CURRENT.

    Merge-on-read deletes in the window surface as ``delete`` rows:
    a data file untouched on disk whose rows were position-deleted
    contributes those rows to the old side only, so the reconcile
    emits them — the reader of the feed cannot tell (and must not
    care) whether a delete was copy-on-write or merge-on-read.

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
    st_from = _table_state(root, from_name)
    st_to = _table_state(root, to_name)
    from_files = set(st_from["files"])
    to_files = set(st_to["files"])
    removed = sorted(from_files - to_files)
    added = sorted(to_files - from_files)
    # position-delete churn: data files live at BOTH versions whose
    # visible rows may differ because a delete file was added (or,
    # conservatively, removed) in the window
    dels_from = set(st_from["deletes"])
    dels_to = set(st_to["deletes"])
    affected: set[str] = set()
    for d in (dels_to - dels_from) | (dels_from - dels_to):
        st_ref = st_to if d in dels_to else st_from
        affected.update(_delete_file_refs(root, st_ref, d))
    # equality-delete churn: a both-live file's visible rows change
    # when a delete that can mask it (file older than the delete)
    # appeared or disappeared in the window
    eq_from = set(st_from["eq_deletes"])
    eq_to = set(st_to["eq_deletes"])
    for d in (eq_to - eq_from) | (eq_from - eq_to):
        st_ref = st_to if d in eq_to else st_from
        affected.update(_eq_affected(st_ref, d))
    affected &= from_files & to_files  # only both-live files reconcile
    old_files = sorted(set(removed) | affected)
    new_files = sorted(set(added) | affected)
    missing = [
        f
        for f in {*old_files, *new_files}
        if not pathlib.Path(
            _data_path(root, st_to if f in to_files else st_from, f)
        ).exists()
    ] + [
        d
        for d in dels_from | dels_to
        if not pathlib.Path(
            _data_path(root, st_to if d in dels_to else st_from, d)
        ).exists()
    ] + [
        d
        for d in eq_from | eq_to
        if not pathlib.Path(
            _data_path(root, st_to if d in eq_to else st_from, d)
        ).exists()
    ]
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
    if not old_files and not new_files:
        return empty

    def _side(files: list[str], state: dict, tag: str) -> DataFrame:
        if not files:
            return empty.select(
                F.col(key).alias(f"__k_{tag}"),
                F.struct(*cols).alias(f"__row_{tag}"),
                F.lit("").alias(f"__h_{tag}"),
            )
        df = _scan_files_state(
            spark, root, state, files, out_schema, apply_deletes=True
        )
        # null-safe payload fingerprint: to_json is deterministic for
        # identical values and both sides hash through the same code
        return df.select(
            F.col(key).alias(f"__k_{tag}"),
            F.struct(*cols).alias(f"__row_{tag}"),
            F.md5(F.to_json(F.struct(*cols))).alias(f"__h_{tag}"),
        )

    old = _side(old_files, st_from, "old")
    new = _side(new_files, st_to, "new")
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


def vacuum(root: str, *, keep_last: int = 1, grace_seconds: float = 0.0) -> int:
    """Delete data files referenced by none of the ``keep_last`` most
    recent manifests (default 1: only CURRENT survives). Returns the
    number of files removed. Position-delete files referenced by a
    protected manifest are kept like data files. Shallow-clone
    EXTERNAL references live in the source table's directory and are
    never this table's to delete (and conversely, vacuum here never
    consults other tables' clones — see :func:`clone_table` for the
    retention contract).

    ``keep_last`` IS the retention horizon: every snapshot read or
    change-feed window over the protected versions stays serviceable
    after the vacuum, anything older fails loudly (:func:`changes`
    checks). Production formats express the same knob in time
    (``VACUUM ... RETAIN n HOURS``); version count is the
    deterministic equivalent for a fixture-driven engine.

    Multi-writer contract: a CONCURRENT writer between its adopt and
    its commit has files on disk that no manifest references yet —
    vacuum would delete them and the writer's later commit would
    publish a manifest pointing at missing files (a corrupt table, not
    a :class:`CommitConflict`). ``grace_seconds`` is the protection:
    files younger than it (by mtime) are never deleted, so set it
    longer than any in-flight commit's adopt→flip window (Delta's
    time-based retention serves the same purpose). The default 0 keeps
    vacuum exact for single-writer use; with concurrent writers a
    zero-grace vacuum requires external exclusion."""
    protected = [n for n, _ in list_manifests(root)][-max(keep_last, 1):]
    keep: set[str] = set()
    for name in protected:
        st = _table_state(root, name)
        keep.update(st["files"])
        keep.update(st["deletes"])
        keep.update(st["eq_deletes"])
    data = pathlib.Path(root, "data")
    removed = 0
    horizon = time.time() - grace_seconds
    if data.is_dir():
        for p in list(data.iterdir()):
            if p.name in keep or p.name.startswith("."):
                continue
            if grace_seconds > 0 and p.stat().st_mtime > horizon:
                continue  # possibly an in-flight writer's adopted file
            p.unlink()
            removed += 1
    return removed


def clone_table(
    src_root: str,
    dst_root: str,
    name: str | None = None,
    *,
    paths: str = "absolute",
) -> str:
    """ZERO-COPY SHALLOW CLONE of version ``name`` (CURRENT by
    default) into a fresh table at ``dst_root`` (Delta's ``CREATE
    TABLE ... SHALLOW CLONE``): the clone's first manifest is a
    full-snapshot doc whose entries reference the SOURCE's immutable
    files by absolute path — no byte is copied, so cloning a 100 TB
    corpus at a version is a metadata write. This is the cheap
    reproducibility primitive for dataset releases: pin the training
    snapshot, keep curating the source.

    Independence: writes to the clone adopt files into its OWN
    ``data/`` and never touch the source; rewrite verbs replace
    external references with local files, so a full :func:`compact`
    SELF-CONTAINS the clone (the documented escape hatch from the
    retention coupling below). Vacuum on the clone only ever scans its
    own ``data/`` directory, so shared source files are structurally
    out of its reach.

    Retention contract (the documented choice between refcounting and
    copy-on-vacuum): the source's :func:`vacuum` consults ONLY its own
    manifests — it does not know about clones. Keep the source's
    retention horizon covering the cloned version for as long as the
    clone must stay shallow, or compact the clone to make it
    self-contained. A vacuumed-away shared file fails the clone's
    reads LOUDLY (missing path), never silently.

    ``paths``: ``"absolute"`` (default — the tables move
    independently) or ``"relative"`` (references stored relative to
    the CLONE's root, so a directory holding both tables stays
    readable after being moved/renamed wholesale — the relocatable
    release-bundle shape).
    """
    if paths not in ("absolute", "relative"):
        raise ValueError(f"paths must be absolute|relative, got {paths!r}")
    if name is None:
        name, _ = read_manifest(src_root)
        if name is None:
            raise ValueError(f"{src_root} has no committed version to clone")
    src_state = _table_state(src_root, name)
    dst = pathlib.Path(dst_root)
    if (dst / "manifests").exists():
        raise ValueError(f"{dst_root} already has a table")

    def _ref(f: str) -> str:
        ap = os.path.abspath(_data_path(src_root, src_state, f))
        if paths == "relative":
            return os.path.relpath(ap, os.path.abspath(dst_root))
        return ap

    external = {
        f: _ref(f)
        for f in (
            *src_state["files"],
            *src_state["deletes"],
            *src_state["eq_deletes"],
        )
    }
    # preserve the source's RELATIVE file/eq-delete sequence order but
    # shift it to <= 0: the clone's own commits restart at sequence 1,
    # and a carried equality delete must never outrank them (it would
    # mask clone-committed files) — nor may it be flattened level with
    # the carried files (it would mask files the source added after it)
    all_seqs = [
        *src_state["seq_added"].values(),
        *(m["seq"] for m in src_state["eq_deletes"].values()),
    ]
    shift = max(all_seqs) if all_seqs else 0
    doc = {
        "files": list(src_state["files"]),
        "stats": src_state["stats"],
        "deletes": list(src_state["deletes"]),
        "eq_deletes": {
            d: {"key": m["key"], "seq": m["seq"] - shift}
            for d, m in src_state["eq_deletes"].items()
        },
        "seq_added": {
            f: s - shift for f, s in src_state["seq_added"].items()
        },
        "parts": src_state["parts"],
        "external": external,
        "note": f"shallow clone of {src_root}",
        "ts": time.time(),
    }
    if src_state["columns"] is not None:
        doc["columns"] = src_state["columns"]
        doc["next_field_id"] = src_state["next_field_id"]
        doc["colmap"] = src_state["colmap"]
    mdir = dst / "manifests"
    mdir.mkdir(parents=True)
    cname = _manifest_name(0)
    tmp = mdir / f".{cname}.tmp.{os.getpid()}.{threading.get_ident()}"
    tmp.write_text(json.dumps(doc))
    try:
        os.link(tmp, mdir / cname)  # O_EXCL publish, like every commit
    except FileExistsError:
        raise CommitConflict(
            f"{dst_root} version 0 was committed concurrently"
        ) from None
    finally:
        tmp.unlink(missing_ok=True)
    _advance_current(dst_root, cname)
    return cname


def export_manifest(root: str, name: str | None = None) -> list[str]:
    """The ABSOLUTE paths of a version's live data files — the
    portable snapshot manifest an external reader (another engine, a
    release tarball builder) consumes; pairs with
    :func:`clone_table` for dataset releases. Raises when the version
    carries pending merge-on-read deletes: a flat file list cannot
    express them, and exporting it would resurrect deleted rows —
    compact first (which materializes the deletes), then export."""
    if name is None:
        name, _ = read_manifest(root)
        if name is None:
            raise ValueError(f"{root} has no committed version")
    state = _table_state(root, name)
    if state["deletes"] or state["eq_deletes"]:
        raise ValueError(
            f"{root}@{name} has pending merge-on-read deletes "
            f"{state['deletes'] + sorted(state['eq_deletes'])}: a flat "
            "export would resurrect deleted rows; compact to "
            "materialize them, then export"
        )
    if state["parts"]:
        raise ValueError(
            f"{root}@{name} carries partition tuples: they are MANIFEST "
            "metadata, and hive-adopted files do not physically repeat "
            "the partition columns — a flat export would silently drop "
            "those columns for the consumer; use export_hive_bundle "
            "(zero-copy hive layout) or materialize with a full "
            "read+write before exporting"
        )
    return [
        str(pathlib.Path(_data_path(root, state, f)).resolve())
        for f in state["files"]
    ]


def export_hive_bundle(
    root: str, dest: str, name: str | None = None
) -> list[str]:
    """ZERO-COPY RELEASE BUNDLE of a version in hive layout (VERDICT
    r13 task 5 — the partitioned-table export path `export_manifest`
    refuses): each live data file is HARDLINKED (copy fallback) into
    ``dest/<col>=<value>/...`` directories built from its manifest
    partition tuple, so any hive-aware reader (Spark partition
    discovery, DuckDB ``hive_partitioning``) recovers the partition
    columns from the paths — no byte rewritten, which is what makes a
    100 TB release bundle a metadata operation. Unpartitioned files
    land at the bundle root; partition directory nesting is by sorted
    column name (deterministic; tuples record no order). Returns the
    created file paths.

    Preconditions, each with the compact prescription: pending
    merge-on-read deletes refuse (links cannot express masks); a file
    carrying pre-evolution physical column names refuses (a raw link
    would expose them); and a MIXED layout refuses — some files
    physically complete (compaction rewrites partition literals back
    into its outputs) while others lack their partition columns is not
    a structure hive discovery can read, so the bundle must be
    uniformly hive-adopted (columns in paths) or uniformly complete
    (columns in files, exported flat). Every file is classified by its
    own parquet FOOTER — metadata-only reads, so the gate costs
    O(files), never O(bytes)."""
    import pyarrow.parquet as pq

    if name is None:
        name, _ = read_manifest(root)
        if name is None:
            raise ValueError(f"{root} has no committed version")
    state = _table_state(root, name)
    if state["deletes"] or state["eq_deletes"]:
        raise ValueError(
            f"{root}@{name} has pending merge-on-read deletes: a "
            "linked bundle would resurrect deleted rows; compact to "
            "materialize them, then export"
        )
    id_to_name = (
        {str(c["id"]): c["name"] for c in state["columns"]}
        if state["columns"] is not None
        else {}
    )
    logical = (
        {c["name"] for c in state["columns"]}
        if state["columns"] is not None
        else None
    )
    # the current logical (name, type) per field id: a file may only be
    # linked raw if every column it physically carries matches BOTH —
    # a widen_column changes only the TYPE, and a bundle mixing int32
    # and int64 physical encodings of one column breaks the plain
    # hive-aware reader this export exists for (review-found r14)
    ident = (
        _identity_colmap(state["columns"])
        if state["columns"] is not None
        else None
    )
    hive_files: list[tuple[str, dict]] = []
    flat_files: list[str] = []
    for f in state["files"]:
        tup = state["parts"].get(f, {})
        pcols = {id_to_name.get(k, k) for k in tup}
        phys = set(
            pq.ParquetFile(_data_path(root, state, f)).schema_arrow.names
        )
        if logical is not None and not phys <= logical:
            raise ValueError(
                f"{f} was written under a pre-evolution schema "
                f"(physical columns {sorted(phys - logical)} are not in "
                "the current logical schema); compact (rewriting it "
                "under the current schema) before exporting"
            )
        if ident is not None and state["colmap"] is not None:
            stale = {
                cid: m
                for cid, m in state["colmap"].get(f, {}).items()
                if cid in ident and list(m) != list(ident[cid])
            }
            if stale:
                raise ValueError(
                    f"{f} was written under a pre-evolution schema "
                    f"(pinned mapping {stale} differs from the current "
                    "logical name/type); compact (force=True rewrites "
                    "at-target groups) before exporting"
                )
        if pcols and not (pcols & phys):
            hive_files.append((f, tup))
        elif pcols <= phys:
            flat_files.append(f)
        else:
            raise ValueError(
                f"{f} carries only part of its partition tuple "
                f"physically ({sorted(pcols & phys)} of {sorted(pcols)}); "
                "compact before exporting"
            )
    if hive_files and flat_files:
        raise ValueError(
            f"{root}@{name} mixes hive-adopted files (partition columns "
            "in paths) with physically-complete files (columns in the "
            "parquet): no uniform bundle layout exists — compact "
            "(which rewrites everything complete) before exporting"
        )
    from urllib.parse import quote

    dest_p = pathlib.Path(dest)

    def _link(src: pathlib.Path, tgt: pathlib.Path) -> None:
        if tgt.exists():
            raise ValueError(f"bundle target {tgt} already exists")
        try:
            os.link(src, tgt)
        except OSError:
            shutil.copy2(src, tgt)

    out: list[str] = []
    for f, tup in hive_files:
        comps = [
            f"{id_to_name.get(k, k)}={quote(str(v), safe='')}"
            for k, v in sorted(
                tup.items(), key=lambda kv: id_to_name.get(kv[0], kv[0])
            )
        ]
        d = dest_p.joinpath(*comps)
        d.mkdir(parents=True, exist_ok=True)
        _link(pathlib.Path(_data_path(root, state, f)).resolve(), d / f)
        out.append(str(d / f))
    for f in flat_files:
        dest_p.mkdir(parents=True, exist_ok=True)
        _link(pathlib.Path(_data_path(root, state, f)).resolve(),
              dest_p / f)
        out.append(str(dest_p / f))
    return out


def _range_keep(rng, lo, hi) -> bool:
    # column-keyed lookup upstream guarantees rng is the queried
    # column's range; a file without stats is conservatively kept
    return rng is None or not (rng[1] < lo or rng[0] > hi)


def pruned_files(
    root: str, name: str, col: str, lo, hi, *, spark=None
) -> tuple[list[str], int]:
    """Data skipping: the subset of version ``name``'s files whose
    [min, max] stats for ``col`` overlap [lo, hi] (files without stats
    are conservatively kept), plus the total live count. Pruning is an
    OPTIMIZATION only — callers still apply the row predicate, so a
    stats bug can cost speed, never correctness... except a too-narrow
    stat, which parquet footers cannot produce (they are exact).

    With ``spark`` given and a parquet checkpoint present, the filter
    runs through :func:`pruned_files_spark` — a columnar DataFrame
    filter over the checkpoint relation plus an O(delta) tail replay —
    instead of this driver-side Python loop, which at 10⁵-10⁶ files
    would make every range read a driver bottleneck."""
    if spark is not None:
        got = pruned_files_spark(spark, root, name, col, lo, hi)
        if got is not None:
            return got
    state = _table_state(root, name)
    stats = state["stats"]
    kept = [
        f
        for f in state["files"]
        if _range_keep(stats.get(f, {}).get(col), lo, hi)
    ]
    return kept, len(state["files"])


def point_pruned_files(
    root: str, name: str, col: str, value
) -> tuple[list[str], int, int]:
    """Point-lookup data skipping (VERDICT r13 task 7): the subset of
    version ``name``'s files that can contain ``col == value``, plus
    (min/max-surviving count, total live count) so callers can see
    WHICH sketch did the pruning. Two stages compose:

    1. the [min, max] range test — free, but useless against a
       high-cardinality key whose values interleave across files
       (every file's range covers the probe);
    2. the per-file BLOOM FILTER recorded by ``bloom_col`` commits —
       a membership sketch with no false negatives, so dropping a
       file on a bloom miss is exact; a hit keeps the file and the
       row predicate decides (false positives cost a scan, never a
       wrong answer). Files without a sketch are conservatively kept.

    This is the MoR point-lookup path: under merge-on-read a keyed
    read (CDC reconcile, GDPR subject lookup) probes doc_id equality
    against a table min/max cannot help — the bloom cuts it from
    "scan every file" to "scan the containing file (+ ~1% false
    positives)". State comes from the checkpoint relation when one
    covers the version (the sketches ride the stats JSON column), so
    the compose-with-checkpoint contract holds by construction."""
    state = _table_state(root, name)
    total = len(state["files"])
    kept: list[str] = []
    mm_kept = 0
    for f in state["files"]:
        ent = state["stats"].get(f, {})
        rng = ent.get(col)
        if rng is not None and not (rng[0] <= value <= rng[1]):
            continue
        mm_kept += 1
        bloom = ent.get(_BLOOM_KEY + col)
        if bloom is not None and not _bloom_contains(bloom, value):
            continue
        kept.append(f)
    return kept, mm_kept, total


def read_point(
    spark: SparkSession, root: str, schema, col: str, value,
    *, kept: list[str] | None = None,
) -> DataFrame:
    """Keyed point read of the CURRENT version: bloom+range file
    pruning (:func:`point_pruned_files`), then the pruned scan with
    merge-on-read masks applied, then the exact row predicate on top —
    pruning remains an optimization, never the answer. ``kept``
    injects a precomputed prune result (same version/col/value!) so a
    caller that already ran :func:`point_pruned_files` for its own
    evidence doesn't decompress every bloom sketch a second time."""
    from pyspark.sql import functions as F

    name, live = read_manifest(root)
    if not live:
        return spark.createDataFrame([], schema)
    if kept is None:
        kept, _mm, _total = point_pruned_files(root, name, col, value)
    if not kept:
        return spark.createDataFrame([], schema)
    state = _table_state(root, name)
    df = _scan_files_state(
        spark, root, state, kept, schema, apply_deletes=True
    )
    return df.filter(F.col(col) == F.lit(value))


def pruned_files_spark(
    spark: SparkSession, root: str, name: str, col: str, lo, hi
) -> tuple[list[str], int] | None:
    """Checkpoint-relation data skipping (VERDICT r12 task 1): evaluate
    the [min, max] overlap test as a SPARK FILTER over the typed
    ``smin_{col}`` / ``smax_{col}`` columns of the nearest checkpoint
    ≤ ``name``, then replay the manifest tail (O(delta) docs) on the
    driver — adds are tested from their own ``stats_adds``, removes
    drop out. Returns None when no checkpoint covers the version (the
    caller falls back to the Python loop, which is O(small) exactly
    then) or when a tail commit REKEYED/DROPPED stats columns (a
    rename/drop between checkpoint and head re-keys what the
    checkpoint's typed columns mean — rare, metadata-only, and the
    next checkpoint heals it; correctness over cleverness).

    The collected result is the KEPT file list — the same driver
    memory any scan planner needs to enumerate its input split."""
    from pyspark.sql import functions as F

    seq = _seq_of(name)
    ck = latest_checkpoint_seq(root, seq)
    if ck is None:
        return None
    tail_docs = [
        _manifest_doc(root, _manifest_name(s))
        for s in range(ck + 1, seq + 1)
    ]
    if any(
        d.get("stats_rekey") or d.get("stats_drop") or "files" in d
        for d in tail_docs
    ):
        return None  # stats keys moved after the checkpoint: fall back
    ckdf = spark.read.parquet(str(_checkpoint_path(root, ck))).filter(
        F.col("kind") == "data"
    )
    smin, smax = f"smin_{col}", f"smax_{col}"
    if smin in ckdf.columns:
        ckdf = ckdf.filter(
            F.col(smin).isNull()
            | ((F.col(smax) >= F.lit(lo)) & (F.col(smin) <= F.lit(hi)))
        )
    # else: the checkpoint has no typed range for this column — every
    # checkpointed file is conservatively kept
    kept = {r[0] for r in ckdf.select("file").collect()}
    for d in tail_docs:
        for f in d.get("removes", ()):
            kept.discard(f)
        for f in d.get("adds", ()):
            rng = d.get("stats_adds", {}).get(f, {}).get(col)
            if _range_keep(rng, lo, hi):
                kept.add(f)
            else:
                kept.discard(f)
    state = _table_state(root, name)
    files_now = state["files"]
    ordered = [f for f in files_now if f in kept]
    return ordered, len(files_now)


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


def _evolve_commit(
    root: str, note: str, mutate, *, stats_rekey=None, stats_drop=(),
) -> str:
    """Shared optimistic-concurrency loop for the evolution verbs:
    metadata-only, conflict-checked, retried — the verb composes with
    concurrent appends the way an ALTER TABLE must (``mutate`` re-runs
    against the fresh schema on every retry, so a lost race never
    applies the change to a stale column list). ``stats_rekey`` /
    ``stats_drop`` ride the delta doc as REPLAYABLE ops — rename moves
    each file's [min, max] entry to the new column name so data
    skipping survives the rename, drop purges the dead name so a later
    rename onto it can't inherit dead ranges; the ops are O(1) bytes
    in the manifest no matter how many files the table holds."""
    for _ in range(64):
        cur, _files = read_manifest(root)
        if cur is None:
            raise ValueError(f"{root} has no committed version to evolve")
        # a rename/drop of a pending equality delete's KEY column would
        # break the read-path anti-join (the delete file's physical
        # column keeps the old name; the scan's logical side moves):
        # refuse with the same "compact first" prescription as export
        if stats_rekey or stats_drop:
            touched_names = set(stats_drop) | set(stats_rekey or {})
            pend = {
                m["key"]
                for m in _table_state(root, cur)["eq_deletes"].values()
            }
            if pend & touched_names:
                raise ValueError(
                    f"column(s) {sorted(pend & touched_names)} key "
                    "pending equality deletes; compact to materialize "
                    "them before renaming/dropping"
                )
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
        try:
            return _commit_delta(
                root, cur, note,
                columns=new_columns,
                next_field_id=new_next_id,
                stats_rekey=stats_rekey,
                stats_drop=stats_drop,
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
    failure mode renames exist to avoid). The delta doc carries a
    ``stats_rekey`` op so each file's [min, max] follows the name at
    replay — data skipping survives the rename, and any stale entry
    already under the target name is DISCARDED first (it can only
    belong to a dead column, and letting it win the key collision
    would prune the renamed column's range reads with the dead
    column's numbers — silent wrong results, not a crash)."""

    def mutate(columns, next_id):
        if any(c["name"] == new for c in columns):
            raise ValueError(f"column {new!r} already exists")
        for c in columns:
            if c["name"] == old:
                c["name"] = new
                return columns, next_id
        raise ValueError(f"no column {old!r} to rename")

    return _evolve_commit(
        root, f"rename {old} -> {new}", mutate, stats_rekey={old: new},
    )


def drop_column(root: str, name: str) -> str:
    """Drop as a metadata-only commit: the id leaves the logical
    schema (current reads never see it) but every file keeps its
    bytes, so a snapshot read of a pre-drop version still returns the
    column — the time-travel contract. Ids are never reused: a later
    add_column of the same NAME is a NEW field, NULL for old files.
    The delta doc carries a ``stats_drop`` op purging the dead name's
    stats at replay (a later rename onto this name must not inherit a
    dead column's [min, max] — that collision silently mis-prunes)."""

    def mutate(columns, next_id):
        kept = [c for c in columns if c["name"] != name]
        if len(kept) == len(columns):
            raise ValueError(f"no column {name!r} to drop")
        if not kept:
            raise ValueError("cannot drop the last column")
        return kept, next_id

    return _evolve_commit(
        root, f"drop {name}", mutate, stats_drop=[name],
    )


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
    where_partition=None,
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
    state = _table_state(root, name)
    if state["columns"] is None:
        raise ValueError(
            f"{root}@{name} does not track its schema; use read_table"
        )
    files = state["files"]
    keep = set(files)
    if where_partition:
        pkept, _ = partition_pruned_files(root, name, where_partition)
        keep &= set(pkept)
    if where_between is not None:
        col, lo, hi = where_between
        skept, _ = pruned_files(root, name, col, lo, hi, spark=spark)
        keep &= set(skept)
    files = [f for f in files if f in keep]
    out = _scan_files_state(
        spark, root, state, files, None, apply_deletes=True
    )
    if where_partition:
        for pcol, v in where_partition.items():
            out = out.filter(
                F.col(pcol).isNull() if v is None
                else F.col(pcol) == F.lit(v)
            )
    if where_between is not None:
        out = out.filter(F.col(col).between(lo, hi))
    return out


def _scan_files_state(
    spark: SparkSession,
    root: str,
    state: dict,
    files: list[str],
    schema,
    *,
    with_meta: bool = False,
    apply_deletes: bool = False,
) -> DataFrame:
    """Scan a FILE SUBSET of one version — the shared core of every
    read path and rewrite verb. Resolves, in order:

    - schema evolution: files group by their pinned field-id mapping
      and each group scans with its own physical schema, cast/aliased/
      NULL-filled onto the logical schema (``state['columns']``; for
      untracked tables ``schema`` is the caller's explicit schema);
    - external references (shallow clones) via :func:`_data_path`;
    - merge-on-read position deletes (``apply_deletes=True``): an
      anti-join on (file basename, row position) against the version's
      delete files, then the bookkeeping columns drop out;
    - merge-on-read EQUALITY deletes (``apply_deletes=True``): per key
      column, a broadcast anti-join of the key values against rows
      whose file is OLDER than the delete (``seq_added < delete seq``
      — Iceberg v2's data-sequence-number rule, which is what lets an
      upsert commit its own post-images unmasked in the same commit);
      NULL keys never match (same as Iceberg);
    - hive partition tuples: a partitioned file doesn't physically
      carry its partition columns — the scan re-attaches them as typed
      LITERALS from the manifest tuple (how hive/Iceberg serve
      identity-partition columns; files group by tuple, so each group
      is one homogeneous scan);
    - ``with_meta=True`` keeps ``__mor_file``/``__mor_pos`` in the
      output (the victim-scan path of
      :func:`delete_where_merge_on_read`).
    """
    from pyspark.sql import functions as F

    columns = state["columns"]
    need_meta = with_meta or (
        apply_deletes
        and bool(state["deletes"] or state["eq_deletes"])
    )

    def _attach_meta(df):
        if not need_meta:
            return df
        return df.withColumns(
            {
                "__mor_file": F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1
                ),
                "__mor_pos": F.col("_metadata.row_index"),
            }
        )

    def _part_sig(f: str) -> tuple:
        return tuple(sorted(state["parts"].get(f, {}).items()))

    if columns is not None:
        ddl = ", ".join(f"`{c['name']}` {c['type']}" for c in columns)
        logical_cols = [c["name"] for c in columns]
        if not files:
            return spark.createDataFrame([], ddl)
        colmap = state["colmap"] or {}
        missing = [f for f in files if f not in colmap]
        if missing:
            raise ValueError(f"files predate schema tracking: {missing}")
        groups: dict[tuple, list[str]] = {}
        for f in files:
            sig = (
                tuple(sorted((i, tuple(m)) for i, m in colmap[f].items())),
                _part_sig(f),
            )
            groups.setdefault(sig, []).append(f)
        parts = []
        for (csig, psig), fs in sorted(groups.items()):
            mapping = dict(csig)  # str(id) -> (phys name, phys type)
            pdict = dict(psig)  # str(id) -> hive string value
            phys = [
                mapping[str(c["id"])]
                for c in columns
                if str(c["id"]) in mapping
            ]
            sel = []
            for c in columns:
                cid = str(c["id"])
                if cid in mapping:
                    sel.append(
                        F.col(f"`{mapping[cid][0]}`")
                        .cast(c["type"])
                        .alias(c["name"])
                    )
                elif cid in pdict:
                    sel.append(
                        _part_lit(pdict[cid], c["type"]).alias(c["name"])
                    )
                else:
                    sel.append(
                        F.lit(None).cast(c["type"]).alias(c["name"])
                    )
            paths = [_data_path(root, state, f) for f in sorted(fs)]
            if phys:
                scan = spark.read.schema(
                    ", ".join(f"`{n}` {t}" for n, t in phys)
                ).parquet(*paths)
            else:
                # a file sharing NO live field ids with the current
                # schema (every column it carries was dropped) still
                # contributes its ROWS, all-NULL-filled: read with the
                # file's own schema and let Catalyst prune to a
                # count-style scan — an empty explicit schema would be
                # a ParseException
                scan = spark.read.parquet(*paths)
            scan = _attach_meta(scan)
            keep = sel + (
                [F.col("__mor_file"), F.col("__mor_pos")] if need_meta else []
            )
            parts.append(scan.select(*keep))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
    else:
        if not files:
            out = spark.createDataFrame([], schema)
            logical_cols = [f.name for f in out.schema.fields]
            return out
        full = spark.createDataFrame([], schema).schema
        logical_cols = [f.name for f in full.fields]
        groups = {}
        for f in files:
            groups.setdefault(_part_sig(f), []).append(f)
        parts = []
        for psig, fs in sorted(groups.items()):
            pdict = dict(psig)  # column name -> hive string value
            paths = [_data_path(root, state, f) for f in sorted(fs)]
            if pdict:
                from pyspark.sql.types import StructType

                phys_fields = [
                    fld for fld in full.fields if fld.name not in pdict
                ]
                scan = _attach_meta(
                    spark.read.schema(StructType(phys_fields)).parquet(
                        *paths
                    )
                )
                sel = [
                    _part_lit(pdict[fld.name], fld.dataType).alias(fld.name)
                    if fld.name in pdict
                    else F.col(fld.name)
                    for fld in full.fields
                ]
                keep = sel + (
                    [F.col("__mor_file"), F.col("__mor_pos")]
                    if need_meta else []
                )
                parts.append(scan.select(*keep))
            else:
                parts.append(
                    _attach_meta(spark.read.schema(full).parquet(*paths))
                )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
    if apply_deletes and state["deletes"]:
        dels = spark.read.parquet(
            *[_data_path(root, state, d) for d in state["deletes"]]
        ).select(
            F.col("file").alias("__mor_file"),
            F.col("pos").alias("__mor_pos"),
        )
        out = out.join(dels, ["__mor_file", "__mor_pos"], "left_anti")
    if apply_deletes and state["eq_deletes"]:
        # per-file data sequence numbers ride in as a broadcast join on
        # the file basename (metadata-sized: one row per scanned file)
        seq_df = spark.createDataFrame(
            [(f, state["seq_added"].get(f, 0)) for f in files],
            "__mor_file string, __seq_added long",
        )
        out = out.join(F.broadcast(seq_df), "__mor_file", "left")
        by_key: dict[str, list[tuple[str, int]]] = {}
        for d, meta in state["eq_deletes"].items():
            by_key.setdefault(meta["key"], []).append((d, meta["seq"]))
        for k, dels_k in sorted(by_key.items()):
            sides = []
            for d, s in sorted(dels_k):
                sides.append(
                    spark.read.parquet(_data_path(root, state, d)).select(
                        F.col(f"`{k}`").alias("__eq_val"),
                        F.lit(s).alias("__eq_seq"),
                    )
                )
            eq = sides[0]
            for p in sides[1:]:
                eq = eq.unionByName(p)
            # equality-delete files are metadata-sized (the keys one
            # commit deleted), so the anti-join broadcasts; `==` makes
            # NULL keys unmatched by construction
            out = out.join(
                F.broadcast(eq),
                (F.col(f"`{k}`") == F.col("__eq_val"))
                & (F.col("__seq_added") < F.col("__eq_seq")),
                "left_anti",
            )
        out = out.drop("__seq_added")
    if need_meta and not with_meta:
        out = out.select(*logical_cols)
    return out


def read_table(
    spark: SparkSession,
    root: str,
    schema,
    *,
    where_between=None,
    where_partition=None,
) -> DataFrame:
    """Read the CURRENT version — resolve the pointer once, then scan
    an immutable file list (never the mutable directory).
    ``where_between=(col, lo, hi)`` range-reads: manifest stats prune
    non-overlapping FILES before the scan plans (through the parquet
    checkpoint relation when one exists — :func:`pruned_files_spark`),
    and the row predicate is applied on top, so results never depend
    on stats coverage. ``where_partition={col: value}`` prunes on the
    manifest partition tuples first (composable with the range read —
    partition dimensions cut before stats dimensions, the hive/Iceberg
    planning order). Merge-on-read position deletes are applied."""
    name, live = read_manifest(root)
    if not live:
        return spark.createDataFrame([], schema)
    return _scan(spark, root, name, live, schema, where_between,
                 where_partition)


def read_snapshot(
    spark: SparkSession,
    root: str,
    name: str,
    schema,
    *,
    where_between=None,
    where_partition=None,
) -> DataFrame:
    """Read a SPECIFIC version — what an in-flight reader that
    resolved CURRENT before a concurrent compaction effectively does."""
    files = manifest_files(root, name)
    if not files:
        return spark.createDataFrame([], schema)
    return _scan(spark, root, name, files, schema, where_between,
                 where_partition)


def _scan(spark, root, name, files, schema, where_between,
          where_partition=None) -> DataFrame:
    from pyspark.sql import functions as F

    state = _table_state(root, name)
    keep = set(files)
    if where_partition:
        pkept, _ = partition_pruned_files(root, name, where_partition)
        keep &= set(pkept)
    if where_between is not None:
        col, lo, hi = where_between
        skept, _ = pruned_files(root, name, col, lo, hi, spark=spark)
        keep &= set(skept)
    files = [f for f in files if f in keep]
    if not files:
        return spark.createDataFrame([], schema)
    df = _scan_files_state(
        spark, root, state, files, schema, apply_deletes=True
    )
    if where_partition:
        for pcol, v in where_partition.items():
            df = df.filter(
                F.col(pcol).isNull() if v is None
                else F.col(pcol) == F.lit(v)
            )
    if where_between is not None:
        df = df.filter(F.col(col).between(lo, hi))
    return df
