"""Atomic cached materializations keyed on a source fingerprint.

Several registered queries exercise a STORAGE layout rather than a
plan shape (pre-quantized int8 vectors; the reference's JSON-lines
sink read back; CSV roundtrip). Each needs a one-time Spark write
whose output is then served on every later invocation — from any
number of concurrent sessions (parallel pytest workers, bench +
driver).

This module is the single implementation of the install protocol the
int8 cache pioneered (plans/llm.py, ADVICE r4):

- validity is explicit, not mtime-guessed: a cache dir counts only
  when Spark's ``_SUCCESS`` marker exists AND an in-directory sidecar
  (``_SRC_FINGERPRINT.json`` — underscore prefix, hidden from Spark's
  file index) equals the source's (mtime_ns, size) fingerprint;
- the dir is only ever created by an ATOMIC ``os.rename`` of a
  fully-written temp dir whose sidecar was written BEFORE the rename,
  so a reader can never observe a half-written directory or a
  ``_SUCCESS``-present / sidecar-missing window;
- losing the install race is fine: the winner installed an
  identical-fingerprint cache, which is served instead.
"""

from __future__ import annotations

import hashlib
import json
import os
import pathlib
import shutil
import uuid
from collections.abc import Callable

_SIDECAR = "_SRC_FINGERPRINT.json"


def cached_materialization(
    src: str | pathlib.Path,
    cache_name: str,
    build: Callable[[str], None],
) -> str:
    """Return the path of a valid cached materialization of ``src``,
    building it via ``build(tmp_dir)`` (which must finish with Spark's
    ``_SUCCESS`` marker present, i.e. be a Spark write) if absent or
    stale. Safe under concurrent callers.
    """
    src = pathlib.Path(src)
    st = src.stat()
    fingerprint = json.dumps({"mtime_ns": st.st_mtime_ns, "size": st.st_size})
    key = hashlib.md5(str(src.resolve()).encode()).hexdigest()[:10]
    cache_root = pathlib.Path(__file__).resolve().parents[2] / ".bench_cache"
    dest = cache_root / f"{cache_name}_{key}"

    def _valid(d: pathlib.Path) -> bool:
        try:
            return (d / "_SUCCESS").exists() and (
                d / _SIDECAR
            ).read_text() == fingerprint
        except OSError:
            return False

    if not _valid(dest):
        nonce = uuid.uuid4().hex[:8]
        tmp = cache_root / f"{cache_name}_{key}.tmp.{nonce}"
        build(str(tmp))
        # Fingerprint BEFORE the rename: once dest exists it is always
        # complete-with-sidecar.
        (tmp / _SIDECAR).write_text(fingerprint)
        # RE-validate before retiring dest: if a concurrent builder
        # installed an identical-fingerprint cache while we were
        # building, destroying it would delete part files under its
        # active readers (a fresh install has different part-file
        # names). Serve the winner's cache and discard our tmp.
        if _valid(dest):
            shutil.rmtree(tmp, ignore_errors=True)
            return str(dest)
        # Retire a STALE dest first (rename is atomic; readers of the
        # old path hold open fds, never a half state).
        if dest.exists():
            trash = cache_root / f"{cache_name}_{key}.trash.{nonce}"
            try:
                os.rename(dest, trash)
                shutil.rmtree(trash, ignore_errors=True)
            except OSError:
                pass  # another process already retired it
        try:
            os.rename(tmp, dest)
        except OSError:
            # Lost the install race — serve the winner's identical cache.
            shutil.rmtree(tmp, ignore_errors=True)
            if not _valid(dest):
                raise
    return str(dest)
