"""Streaming corpus hygiene: incremental decontamination.

Batch decontamination (`operators.text.contamination_hits`) sweeps the
whole corpus against a benchmark gram set. At ingest time the natural
form is incremental: the benchmark index is FIXED (an evaluation suite
changes rarely), so each arriving micro-batch of documents is probed
against the same precomputed, persisted gram relation — the
probe-vs-index asymmetry of `pipeline_incremental_dedup`, applied to
leakage checking. No state store is needed: per-document gram hits
don't cross documents, so micro-batch results are exactly the batch
result restricted to that batch's docs (asserted stream-equals-batch
in tests/test_streaming.py).

At 100 TB-ingest scale the index side is broadcast (benchmarks are
small by construction) and each micro-batch runs one narrow
shingle→probe pass plus a per-doc count keyed on doc id — the same
plan `pipeline_decontaminate` locks in via its plan-shape test.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from ..operators.text import contamination_hits


def benchmark_gram_index(
    benchmark: DataFrame, text_col: str, *, n: int = 4
) -> DataFrame:
    """Precompute + persist the benchmark's distinct-gram relation once;
    reuse it across every micro-batch (re-shingling the benchmark per
    trigger would repeat the index build at each batch). Gram
    construction is `operators.text.doc_grams` — the same code the
    batch probe uses, so index and probe cannot drift."""
    from ..operators.text import doc_grams

    return doc_grams(benchmark, None, text_col, n=n).distinct().persist()


def decontaminate_batch_fn(
    benchmark: DataFrame,
    sink: Callable[[DataFrame, int], None],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function: probe each micro-batch against
    the (precomputed) benchmark gram index and hand the per-doc hit
    counts to ``sink``. ``benchmark`` is shingled once here, not per
    trigger. The persisted index is exposed as ``fn.bench_grams`` so a
    caller that restarts streams in one long-lived application can
    ``fn.bench_grams.unpersist()`` when done — otherwise each build
    would pin another cached relation for the SparkContext lifetime."""
    bench = benchmark_gram_index(benchmark, text_col, n=n)

    def _probe(batch_df: DataFrame, epoch_id: int) -> None:
        hits = contamination_hits(
            batch_df, benchmark, id_col, text_col, n=n, bench_grams=bench
        )
        sink(hits, epoch_id)

    _probe.bench_grams = bench  # unpersist handle for stream restarts
    return _probe


def quality_score_batch_fn(
    reference: DataFrame,
    sink: Callable[[DataFrame, int], None],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function that scores each arriving
    micro-batch of documents against a FIXED bigram LM built once from
    ``reference`` — the streaming form of the CCNet/KenLM perplexity
    gate (the external-LM variant of
    ``operators.text.bigram_surprisal_scores``). Same probe-vs-index
    asymmetry as ``decontaminate_batch_fn``: the LM index and its
    total-bigram constant are computed here, NOT per trigger; each
    micro-batch costs one narrow gram pass + one hash-join + a per-doc
    rollup, and results never cross documents, so stream == batch
    (asserted in tests/test_streaming.py). The persisted index is
    exposed as ``fn.lm_index`` for callers to unpersist."""
    from pyspark.sql import functions as F

    from ..operators.text import bigram_count_index, score_against_bigram_index

    index = bigram_count_index(reference, text_col).persist()
    n_total = index.agg(F.sum("__c2")).first()[0] or 0
    if n_total <= 0:
        # Fail at stream-construction time, not at the first trigger:
        # an empty reference LM would score every OOV bigram 0 (see
        # score_against_bigram_index's guard).
        index.unpersist()
        raise ValueError(
            "reference corpus yields an empty bigram LM (no document "
            "with >= 2 tokens)"
        )

    def _score(batch_df: DataFrame, epoch_id: int) -> None:
        scores = score_against_bigram_index(
            batch_df, id_col, text_col, index, n_index_bigrams=int(n_total)
        )
        sink(scores, epoch_id)

    _score.lm_index = index  # type: ignore[attr-defined]
    return _score
