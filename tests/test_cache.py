"""Unit tests for sources/cache.py — the atomic fingerprinted install
protocol shared by the int8 store, sink roundtrips, bucketed tables,
and the partitioned-events copy.

The cache root is module-anchored (repo/.bench_cache), so these tests
use reserved ``unit_test_*`` names and remove what they install.
"""

from __future__ import annotations

import os
import pathlib
import shutil

import pytest

from new_kafka_consumer_to_hadoop_hdfs_spark.sources import cache as cache_mod
from new_kafka_consumer_to_hadoop_hdfs_spark.sources.cache import (
    cached_materialization,
)

_CACHE_ROOT = pathlib.Path(cache_mod.__file__).resolve().parents[2] / ".bench_cache"


@pytest.fixture(autouse=True)
def _cleanup_unit_caches():
    yield
    for d in _CACHE_ROOT.glob("unit_test_*"):
        shutil.rmtree(d, ignore_errors=True)


def _spark_like_build(calls):
    """A build fn that mimics a Spark write: creates the dir and the
    _SUCCESS marker, and counts invocations."""

    def build(tmp: str) -> None:
        calls.append(tmp)
        p = pathlib.Path(tmp)
        p.mkdir(parents=True, exist_ok=True)
        (p / "part-00000").write_text("data")
        (p / "_SUCCESS").write_text("")

    return build


def test_build_once_then_served_from_cache(tmp_path):
    src = tmp_path / "src.parquet"
    src.write_bytes(b"v1")
    calls: list[str] = []
    d1 = cached_materialization(src, "unit_test_a", _spark_like_build(calls))
    d2 = cached_materialization(src, "unit_test_a", _spark_like_build(calls))
    assert d1 == d2
    assert len(calls) == 1, "second call must serve the installed cache"
    assert (pathlib.Path(d1) / "_SUCCESS").exists()
    assert (pathlib.Path(d1) / "_SRC_FINGERPRINT.json").exists()


def test_source_change_invalidates(tmp_path):
    src = tmp_path / "src.parquet"
    src.write_bytes(b"v1")
    calls: list[str] = []
    d1 = cached_materialization(src, "unit_test_b", _spark_like_build(calls))
    # same size, different mtime → fingerprint changes → rebuild
    src.write_bytes(b"v2")
    os.utime(src, ns=(src.stat().st_atime_ns, src.stat().st_mtime_ns + 10**9))
    d2 = cached_materialization(src, "unit_test_b", _spark_like_build(calls))
    assert d1 == d2, "dest path is stable across rebuilds"
    assert len(calls) == 2, "fingerprint change must trigger a rebuild"


def test_missing_success_marker_rebuilds(tmp_path):
    src = tmp_path / "src.parquet"
    src.write_bytes(b"v1")
    calls: list[str] = []
    d1 = cached_materialization(src, "unit_test_c", _spark_like_build(calls))
    (pathlib.Path(d1) / "_SUCCESS").unlink()
    cached_materialization(src, "unit_test_c", _spark_like_build(calls))
    assert len(calls) == 2, "a cache without _SUCCESS is not a cache"


def test_distinct_sources_do_not_collide(tmp_path):
    a = tmp_path / "a" / "src.parquet"
    b = tmp_path / "b" / "src.parquet"
    a.parent.mkdir()
    b.parent.mkdir()
    a.write_bytes(b"same")
    b.write_bytes(b"same")
    calls: list[str] = []
    da = cached_materialization(a, "unit_test_d", _spark_like_build(calls))
    db = cached_materialization(b, "unit_test_d", _spark_like_build(calls))
    assert da != db, "cache key must include the resolved source path"
    assert len(calls) == 2
