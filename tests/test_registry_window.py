"""Registry iteration-order contract.

The driver's correctness harness oracle-checks only the FIRST 50
entries of ``merged_registry()`` per round, so iteration order decides
which queries earn hard driver evidence. Rounds 2-3 checked the same
50 (``DRIVER_CHECKED_R2_R3``); those hold banked green rows, so the
registry now leads with the never-driver-checked queries —
oracle-backed ones first so the window spends its slots on hash
checks, not run-only checks. These tests lock that ordering so a
refactor can't silently rotate coverage back.
"""

from __future__ import annotations

WINDOW = 50


def _registry():
    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import (
        DRIVER_CHECKED_R2_R3,
        merged_registry,
    )

    queries, oracles = merged_registry()
    return list(queries), oracles, DRIVER_CHECKED_R2_R3


def test_banked_names_exist():
    names, _, banked = _registry()
    missing = banked - set(names)
    assert not missing, f"DRIVER_CHECKED_R2_R3 names not in registry: {missing}"


def test_never_checked_oracle_queries_lead_the_window():
    names, oracles, banked = _registry()
    unchecked_oracle = [n for n in names if n not in banked and n in oracles]
    window = set(names[:WINDOW])
    missed = [n for n in unchecked_oracle[:WINDOW] if n not in window]
    assert not missed, (
        f"oracle-backed never-driver-checked queries outside the first "
        f"{WINDOW}: {missed}"
    )


def test_window_wastes_no_slot_on_banked_queries():
    names, _, banked = _registry()
    unchecked = [n for n in names if n not in banked]
    if len(unchecked) >= WINDOW:
        overlap = [n for n in names[:WINDOW] if n in banked]
        assert not overlap, (
            f"banked queries occupy window slots while {len(unchecked)} "
            f"unchecked queries exist: {overlap}"
        )
