"""Named query registry.

Each plan module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB-runnable ANSI SQL over the
testdata views). ``__spark_entry__.py`` re-exports the merged registry
for the driver's correctness harness; tests run the same comparison
locally.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def merged_registry() -> tuple[dict[str, QueryFn], dict[str, str]]:
    from . import llm, multimodal, reference, relational, tpch_deep, windows

    modules = [reference, relational, tpch_deep, llm, windows, multimodal]

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for m in modules:
        for name, fn in getattr(m, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r}")
            queries[name] = fn
        oracles.update(getattr(m, "ORACLES", {}))
    unknown = set(oracles) - set(queries)
    if unknown:
        raise ValueError(f"oracles without queries: {unknown}")
    return queries, oracles
