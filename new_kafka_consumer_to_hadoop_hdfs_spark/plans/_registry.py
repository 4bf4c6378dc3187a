"""Shared query-registration machinery for the plan modules.

One definition instead of a copy per module: ``make_register`` returns
the decorator each plan module uses to publish (query, oracle) pairs,
and ``dsum`` is the shared order-independent money-sum helper (decimal
accumulate, double out — see plans/relational.py's float determinism
contract). ``functools.wraps`` matters here: it keeps
``inspect.getsource``/introspection pointed at the real query body
(the plan-shape tests read query sources to enforce design rules).
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_conf


def make_register(queries: dict, oracles: dict):
    """Build a ``@register(name, oracle_sql=None)`` decorator bound to a
    module's QUERIES/ORACLES dicts. Registered callables take
    (spark, sf_dir), apply the runtime confs, and return a DataFrame."""

    def register(name: str, oracle: str | None = None):
        def deco(fn):
            @functools.wraps(fn)
            def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
                apply_runtime_conf(spark)
                return fn(spark, sf_dir)

            queries[name] = wrapped
            if oracle is not None:
                oracles[name] = oracle
            return wrapped

        return deco

    return register


# Bounded persist shared by plan modules: queries that cache a relation
# feeding several DAG branches can't unpersist eagerly (the returned
# DataFrame executes after the builder returns), so each new persist
# evicts every previously cached relation — Spark recomputes if one is
# somehow still needed — bounding a bench/driver session's cache
# footprint to one relation instead of leaking one per invocation.
_PERSISTED: list = []


def persist_bounded(df: DataFrame, *, stack: bool = False) -> DataFrame:
    """``stack=True`` ADDS a persist without evicting the previous one —
    for a query that legitimately caches two relations (e.g.
    sim_recall_report's slim embeddings + the exact reference ranking).
    Both still land in ``_PERSISTED``, so the NEXT query's first
    (non-stacked) persist evicts the whole group: the session-wide
    bound becomes "one query's persists", not strictly one relation."""
    if not stack:
        while _PERSISTED:
            try:
                _PERSISTED.pop().unpersist()
            except Exception:
                pass
    df = df.persist()
    _PERSISTED.append(df)
    return df


def dsum(col: Column, scale: int = 2) -> Column:
    """Order-independent exact sum: decimal-cast inputs, double output.

    Pass ``scale`` explicitly when the column carries more than 2
    decimal places (e.g. event values use 6) — the oracle SQL must use
    the same scale or the value hash diverges.
    """
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")
