"""LLM-data-pipeline query surface (SURVEY.md §2.5 / M4, north star).

The reference repo is a Kafka→HDFS dedup ETL with no text or vector
operators; this module is the training-data-pipeline extension layer:
text analysis, exact + near-duplicate detection, and embedding
similarity search over the ``documents`` / ``embeddings`` tables.

Shared determinism contract with the DuckDB oracles:
- tokenization = split on single space, empty tokens dropped;
- similarity scores are double-precision with sequential accumulation
  and ROUND(·, 6) in both engines;
- every ranking carries an explicit deterministic tie-break.

Scale design (100 TB): all per-document work is narrow/zero-shuffle;
candidate generation for near-dup is bucketed (MinHash bands, SimHash
chunks, Jaccard prefix filtering) so no operator materializes the
all-pairs product except the two explicitly documented
correctness-baseline queries (`dedup_embedding_cosine` brute force,
and the oracle side of near-dup, which runs only in DuckDB at sf0.01).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import dedup_last_write_wins
from ..operators.similarity import (
    cosine_pairs,
    ivf_assign,
    ivf_search,
    ivf_topk_cosine,
    ivfpq_topk,
    lsh_cosine_pairs,
    lsh_topk_cosine,
    lsh_topk_cosine_mapside,
    pq_topk_cosine,
    quantize_int8,
    to_double,
    topk_cosine,
    topk_cosine_arrow,
    topk_cosine_int8,
    topk_cosine_mapside,
)
from ..operators.text import (
    contamination_hits,
    bpe_ish_tokens,
    containment_candidate_pairs,
    jaccard_verify_elements,
    minhash_candidate_pairs,
    overlap_verify_elements,
    prefix_filter_candidate_pairs,
    shingle_elements,
    simhash_near_pairs,
    simhash_signatures,
    whitespace_tokens,
    word_grams,
)
from ..sources.cache import cached_materialization
from ..sources.files import load_table
from ._registry import make_register, persist_bounded

QUERIES = {}
ORACLES = {}
_register = make_register(QUERIES, ORACLES)


# DuckDB equivalents of the shared token/shingle builders. Kept as
# format fragments so the Spark builders and oracles can never drift
# on delimiter or empty-token semantics.
_SQL_TOKENS = "list_filter(string_split(text, ' '), x -> x != '')"
# word 3-gram shingles over the token list t (1-based inclusive slices)
_SQL_WORD_SHINGLES = (
    "list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)])"
)
_SQL_JACCARD = (
    "len(list_intersect(a.sh, b.sh))::DOUBLE"
    " / len(list_distinct(list_concat(a.sh, b.sh)))::DOUBLE"
)

# Language-ID marker words (function words per language). Shared
# between the Spark plan and the oracle SQL via this single constant.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "is", "of", "and"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "que", "los", "es"),
    "fr": ("le", "les", "des", "est", "et"),
    "zh": ("的", "是", "了", "在", "和"),
}
_LANG_ORDER = tuple(_LANG_MARKERS)  # deterministic argmax priority

_STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")


def _sql_in_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


# Bounded persist now lives in plans/_registry.py (shared by the
# tpch_deep module too); keep the local alias for this module's many
# call sites.
_persist_bounded = persist_bounded

# Shared IVF contract constants (ADVICE r8): the oracle f-strings AND
# the registered ivf_topk_cosine calls read the SAME values, so the SQL
# restatement and the operator configuration cannot drift independently.
# _EMB_DIM pins the fixture's embedding width — the operator derives its
# dim from data, but an oracle only ever runs on the fixtures, and the
# seed CTE must apply the same wrong-width drop the operator applies.
_EMB_DIM = 64
_IVF_CELLS = 16
_IVF_PROBE = 4
# IVF-PQ probes WIDER than plain IVF (6 of 16 cells vs 4): the
# composite has TWO recall-loss sources (unprobed true neighbor +
# quantization rank inversion), and at probe 4 their product measured
# recall@10 ≈ 0.34-0.42 vs the ≥ 0.5 the single-error siblings hold.
# Probe 6 restores 0.50/0.52 at sf0.001/sf0.01 (pinned by the recall
# anchor test) while still pruning 10/16 of the corpus — exactly the
# n_probe-vs-recall dial FAISS documents for IndexIVFPQ.
_IVFPQ_PROBE = 6




# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_TEXT_STATS_ORACLE = f"""
WITH d AS (SELECT lang, source, n_chars, {_SQL_TOKENS} AS t FROM documents)
SELECT lang, source,
       COUNT(*) AS n_docs,
       SUM(n_chars)::BIGINT AS total_chars,
       ROUND(SUM(n_chars)::DOUBLE / COUNT(*), 6) AS avg_chars,
       SUM(len(t))::BIGINT AS total_tokens,
       ROUND(SUM(len(t))::DOUBLE / COUNT(*), 6) AS avg_tokens,
       MIN(len(t)) AS min_tokens,
       MAX(len(t)) AS max_tokens
FROM d GROUP BY lang, source
"""


@_register("text_stats", _TEXT_STATS_ORACLE)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics per (lang, source): doc/char/token counts.

    Zero-UDF: split + size are codegen'd; one shuffle on the
    (lang, source) grouping keys (100 groups — partial agg does the
    heavy lifting map-side at any scale).
    """
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(whitespace_tokens(F.col("text")))
    return (
        d.select("lang", "source", "n_chars", n_tok.alias("n_tok"))
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.sum("n_chars").cast("double") / F.count("*"), 6).alias(
                "avg_chars"
            ),
            F.sum("n_tok").alias("total_tokens"),
            F.round(F.sum("n_tok").cast("double") / F.count("*"), 6).alias(
                "avg_tokens"
            ),
            F.min("n_tok").alias("min_tokens"),
            F.max("n_tok").alias("max_tokens"),
        )
    )


_TOKEN_HIST_ORACLE = f"""
WITH tok AS (SELECT unnest({_SQL_TOKENS}) AS token FROM documents)
SELECT token, COUNT(*) AS n_occurrences,
       ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS freq_rank
FROM tok GROUP BY token
"""


@_register("text_token_histogram", _TOKEN_HIST_ORACLE)
def text_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global token frequency table with a deterministic rank.

    explode → two-phase count aggregation (map-side partial combine
    keeps the shuffle at |vocab| rows per task, not |corpus| — the
    canonical wordcount shape). The rank window runs over the
    aggregated vocabulary (tiny), so its single-partition sort is fine
    at any corpus scale.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(whitespace_tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token"))
    return counts.withColumn("freq_rank", F.row_number().over(w))


def _lang_score_sql(lang: str) -> str:
    return (
        f"len(list_filter(t, x -> x IN ({_sql_in_list(_LANG_MARKERS[lang])})))"
    )


_LANG_PRED_SQL = "CASE " + " ".join(
    f"WHEN s_{lang} >= GREATEST({', '.join('s_' + o for o in _LANG_ORDER[i + 1:] or ('0',))}) THEN '{lang}'"
    for i, lang in enumerate(_LANG_ORDER[:-1])
) + f" ELSE '{_LANG_ORDER[-1]}' END"

_LANG_ID_ORACLE = f"""
WITH scored AS (
  SELECT lang,
         {", ".join(f"{_lang_score_sql(lang)} AS s_{lang}" for lang in _LANG_ORDER)}
  FROM (SELECT lang, {_SQL_TOKENS} AS t FROM documents)
)
SELECT lang, {_LANG_PRED_SQL} AS pred_lang, COUNT(*) AS n_docs
FROM scored GROUP BY lang, pred_lang
"""


@_register("text_language_id", _LANG_ID_ORACLE)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language identification → confusion matrix vs labels.

    The scorer counts per-language function-word occurrences in the
    token stream and argmaxes with a fixed language priority (ties go
    to the earlier language — fully deterministic). Per-doc work is a
    narrow array pass; the confusion-matrix aggregation shuffles ≤
    |langs|² rows. (On this synthetic corpus the labels are random, so
    the matrix shows heuristic bias, not accuracy — the operator's
    contract is determinism, which the oracle checks.)
    """
    d = load_table(spark, sf_dir, "documents")
    toks = whitespace_tokens(F.col("text"))
    def marker_hits(words: tuple[str, ...]):
        # closure factory: a 2-arg lambda in F.filter means (elem, index)
        return lambda t: t.isin(*words)

    scored = d.select(
        "lang",
        *[
            F.size(F.filter(toks, marker_hits(_LANG_MARKERS[lang]))).alias(f"s_{lang}")
            for lang in _LANG_ORDER
        ],
    )
    pred = None
    for i, lang in enumerate(_LANG_ORDER[:-1]):
        cond = F.lit(True)
        for other in _LANG_ORDER[i + 1:]:
            cond = cond & (F.col(f"s_{lang}") >= F.col(f"s_{other}"))
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    pred = pred.otherwise(_LANG_ORDER[-1])
    return (
        scored.withColumn("pred_lang", pred)
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
    )


_QUALITY_ORACLE = f"""
WITH d AS (
  SELECT doc_id, n_chars, {_SQL_TOKENS} AS t,
         len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_punct
  FROM documents
)
SELECT doc_id,
       len(t) AS n_tokens,
       ROUND(list_sum(list_transform(t, x -> len(x)))::DOUBLE / len(t), 6) AS avg_token_len,
       ROUND(n_punct::DOUBLE / n_chars, 6) AS punct_ratio,
       ROUND(len(list_filter(t, x -> x IN ({_sql_in_list(_STOPWORDS)})))::DOUBLE / len(t), 6) AS stopword_ratio,
       CASE WHEN len(t) >= 20
              AND len(list_filter(t, x -> x IN ({_sql_in_list(_STOPWORDS)})))::DOUBLE / len(t) <= 0.5
              AND n_punct::DOUBLE / n_chars <= 0.1
            THEN 'good'
            WHEN len(t) >= 5 THEN 'fair'
            ELSE 'low' END AS quality_band
FROM d WHERE len(t) > 0
"""


@_register("text_quality_score", _QUALITY_ORACLE)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: token count, mean token length,
    punctuation ratio, stopword ratio, and a banded quality verdict —
    the standard pretraining-corpus filter stack (Gopher/C4-style
    heuristics), all as codegen'd array expressions, zero shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = whitespace_tokens(F.col("text"))
    base = d.select(
        "doc_id",
        "n_chars",
        toks.alias("t"),
        F.regexp_count(F.col("text"), F.lit("[^a-z0-9 ]")).alias("n_punct"),
    ).filter(F.size("t") > 0)
    n_tokens = F.size("t")
    sum_len = F.aggregate(
        F.transform(F.col("t"), F.length), F.lit(0).cast("long"), lambda a, x: a + x
    )
    n_stop = F.size(F.filter(F.col("t"), lambda x: x.isin(*_STOPWORDS)))
    punct_ratio = F.col("n_punct").cast("double") / F.col("n_chars")
    stop_ratio = n_stop.cast("double") / n_tokens
    return base.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(sum_len.cast("double") / n_tokens, 6).alias("avg_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.when(
            (n_tokens >= 20) & (stop_ratio <= 0.5) & (punct_ratio <= 0.1), "good"
        )
        .when(n_tokens >= 5, "fair")
        .otherwise("low")
        .alias("quality_band"),
    )


_TOKEN_COUNT_ORACLE = r"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x != '') AS ws,
         regexp_extract_all(text, '\w+|[^\w\s]') AS bpe
  FROM documents
)
SELECT doc_id,
       len(ws) AS n_ws_tokens,
       len(bpe) AS n_pretokens,
       COALESCE(list_sum(list_transform(bpe, w -> GREATEST(1, CEIL(len(w) / 4.0)::BIGINT))), 0)::BIGINT AS est_bpe_tokens
FROM d
"""


@_register("text_token_count", _TOKEN_COUNT_ORACLE)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace tokens, BPE-style
    pre-tokens (``\\w+|[^\\w\\s]``), and an estimated BPE token count
    (≈ 4 chars per merged token, the usual budget heuristic). Narrow
    per-row expressions — the shape used to cost a 100 TB corpus in
    tokens without running a real tokenizer.
    """
    d = load_table(spark, sf_dir, "documents")
    ws = whitespace_tokens(F.col("text"))
    bpe = bpe_ish_tokens(F.col("text"))
    est = F.aggregate(
        F.transform(
            bpe,
            lambda w: F.greatest(
                F.lit(1).cast("long"), F.ceil(F.length(w) / F.lit(4.0))
            ),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return d.select(
        "doc_id",
        F.size(ws).alias("n_ws_tokens"),
        F.size(bpe).alias("n_pretokens"),
        F.coalesce(est, F.lit(0)).alias("est_bpe_tokens"),
    )


_FINGERPRINT_ORACLE = f"""
WITH d AS (SELECT doc_id, text, {_SQL_TOKENS} AS t FROM documents)
SELECT doc_id,
       md5(text) AS content_md5,
       md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS bag_md5
FROM d
"""


@_register("text_fingerprint", _FINGERPRINT_ORACLE)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: exact content hash + order-insensitive
    bag-of-tokens hash (catches token-reordered duplicates). Hash
    column keys are the join/dedup currency of a 100 TB pipeline —
    computed once, narrow, then reused by every dedup pass.
    """
    d = load_table(spark, sf_dir, "documents")
    t = whitespace_tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.md5(F.col("text")).alias("content_md5"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(t)))).alias("bag_md5"),
    )


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

_DEDUP_EXACT_DOCS_ORACLE = f"""
WITH d AS (
  SELECT doc_id, lang, source,
         md5(array_to_string(list_sort(list_distinct({_SQL_TOKENS})), ' ')) AS bag_md5
  FROM documents
)
SELECT doc_id, lang, source, bag_md5 FROM d
QUALIFY ROW_NUMBER() OVER (PARTITION BY bag_md5 ORDER BY doc_id) = 1
"""


@_register("dedup_exact_docs", _DEDUP_EXACT_DOCS_ORACLE)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact document dedup on the bag-of-tokens fingerprint, keeping
    the lowest doc_id per group (deterministic survivor).

    Reuses the reference's dedup core (operators.dedup, from
    HadoopKafkaConsumer.java:47-103 semantics) with fingerprint keys:
    one hash-partitioned shuffle on the fingerprint, spill-safe
    row_number — the canonical exact-dedup plan at any corpus size.
    """
    d = load_table(spark, sf_dir, "documents")
    t = whitespace_tokens(F.col("text"))
    with_fp = d.select(
        "doc_id",
        "lang",
        "source",
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(t)))).alias("bag_md5"),
    )
    return dedup_last_write_wins(with_fp, ["bag_md5"], [F.col("doc_id").asc()])


_DEDUP_EXACT_EVENTS_ORACLE = """
SELECT user_id, event_id, ts, event_type
FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id) = 1
"""


@_register("dedup_exact_events", _DEDUP_EXACT_EVENTS_ORACLE)
def dedup_exact_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-event-per-user via the generalized LWW dedup operator —
    the reference's argmax-by-offset semantics (strict '>', first-seen
    tie-keep) applied to event time with an id tie-break."""
    ev = load_table(spark, sf_dir, "events")
    deduped = dedup_last_write_wins(
        ev.select("user_id", "event_id", "ts", "event_type"),
        ["user_id"],
        [F.col("ts").desc(), F.col("event_id").asc()],
    )
    return deduped


# ---------------------------------------------------------------------------
# Near-duplicate detection
# ---------------------------------------------------------------------------

_NEAR_MINHASH_ORACLE = f"""
WITH s AS (
  SELECT doc_id, {_SQL_WORD_SHINGLES} AS sh
  FROM (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents)
  WHERE len(t) >= 3
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       ROUND({_SQL_JACCARD}, 6) AS jaccard
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE {_SQL_JACCARD} >= 0.8
"""


@_register("dedup_near_minhash", _NEAR_MINHASH_ORACLE)
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs (word-3-gram-shingle Jaccard ≥ 0.8) via
    MinHash LSH banding + exact verification.

    Pipeline: shingle (narrow) → 16-hash MinHash signature (narrow) →
    8 bands of 2 exploded → self equi-join on band buckets (the ONLY
    shuffle over candidates; never all-pairs) → exact Jaccard verify on
    candidates. Banding recall at j=0.9 is 1-(1-0.81)^8 ≈ 1-2e-6, so
    against this corpus (true pairs all ≥ 0.9, next cluster ≤ 0.2) the
    output equals the brute-force oracle. At 100 TB the same plan holds:
    bucket sizes stay bounded because signatures of non-dups collide at
    the j^rows_per_band rate.
    """
    d = load_table(spark, sf_dir, "documents")
    # persist: the hashed-element relation feeds the signature branch
    # and the verification branch of the DAG; without it Spark
    # recomputes the shingling per branch (at scale: write it once)
    ex = _persist_bounded(shingle_elements(d, "doc_id", "text", n=3))
    cands = minhash_candidate_pairs(ex, "doc_id", num_hashes=16, rows_per_band=2)
    return jaccard_verify_elements(cands, ex, "doc_id", threshold=0.8)


_NGRAM_JACCARD_ORACLE = f"""
WITH s AS (
  SELECT doc_id, {_SQL_WORD_SHINGLES} AS sh
  FROM (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents)
  WHERE len(t) >= 3
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       ROUND({_SQL_JACCARD}, 6) AS jaccard
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE {_SQL_JACCARD} >= 0.6
"""


@_register("dedup_ngram_jaccard", _NGRAM_JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs (word-3-gram Jaccard ≥ 0.6) via EXACT
    prefix-filter set-similarity join (Bayardo et al., WWW'07) — the
    deterministic counterpart to `dedup_near_minhash`'s probabilistic
    banding, at a looser threshold.

    Unlike LSH this has zero recall loss: any pair with Jaccard ≥ t
    must share a shingle within both frequency-ordered prefixes of
    length |s|-⌈t·|s|⌉+1, so the equi-join on prefix shingles finds
    every qualifying pair, then exact Jaccard filters. The shuffle key
    is the shingle — candidates are bucketed by shared RARE content
    (document-frequency order), not compared all-pairs.

    Shingle-choice note: word n-grams, not char n-grams — prefix
    filtering prunes by rare elements, and char-5-grams over this
    corpus' 31-token vocabulary are all common (every "rare" gram
    appears in hundreds of documents), degrading candidates toward
    all-pairs (measured: 10.7M candidate pairs at sf0.1 vs ~10³ with
    word trigrams). The same reasoning applies at 100 TB: pick the
    shingle space sparse enough that document frequency discriminates.
    """
    d = load_table(spark, sf_dir, "documents")
    # reused by prefix, frequency, and verify branches
    ex = _persist_bounded(shingle_elements(d, "doc_id", "text", n=3))
    cands = prefix_filter_candidate_pairs(ex, "doc_id", threshold=0.6)
    return jaccard_verify_elements(cands, ex, "doc_id", threshold=0.6)


# SimHash restated in SQL: token hash = first 15 hex chars of md5
# (60 bits, matching operators.text.md5_token_hash60); bit b of the
# hash is bit (b % 4) of hex digit (15 - b // 4) recovered via a
# strpos lookup; per-bit ±1 votes summed per document; signature =
# Σ (vote_b > 0) · 2^b; pairs = all (a < b) with popcount(xor) ≤ 3.
# The oracle brute-forces the pair scan (500 docs at sf0.01) — the
# pigeonhole bucketing is a pure-recall optimization with zero loss,
# so the result sets are identical by construction.
_SIMHASH_ORACLE = """
WITH t AS (SELECT doc_id, {tokens} AS ts FROM documents),
h AS (SELECT doc_id, substr(md5(unnest(ts)), 1, 15) AS hx
      FROM t WHERE len(ts) > 0),
bv AS (
  SELECT doc_id, b,
         SUM(CASE WHEN (strpos('0123456789abcdef',
                               substr(hx, 15 - b // 4, 1)) - 1)
                       & (1 << (b % 4)) != 0
             THEN 1 ELSE -1 END) AS vote
  FROM h, (SELECT unnest(range(0, 60)) AS b) bits
  GROUP BY doc_id, b
),
sig AS (SELECT doc_id,
               SUM(CASE WHEN vote > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS s
        FROM bv GROUP BY doc_id)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       bit_count(xor(a.s, b.s))::INT AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.s, b.s)) <= 3
ORDER BY doc_id_a, doc_id_b
""".format(tokens=_SQL_TOKENS)


@_register("dedup_simhash", _SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by 60-bit SimHash Hamming distance ≤ 3,
    FULLY ORACLE-CHECKED (upgraded from rows-only in round 8).

    Signature is a single zero-shuffle Arrow pass per document
    (operators.text.simhash_signatures); candidate pairs come from the
    4-chunk pigeonhole equi-join (no recall loss for the Hamming
    budget, no all-pairs scan — plan-shape-tested cartesian-free).
    The token hash is the md5-prefix form (md5_token_hash60) instead
    of xxhash64 PRECISELY so DuckDB can recompute every signature bit
    in SQL — the same portability trade text_winnow_fingerprint made.
    The oracle skips the pigeonhole (brute-force pair scan is fine at
    oracle scale); identical results because the bucketing loses no
    recall within the Hamming budget.
    """
    from ..operators.text import md5_token_hash60

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", whitespace_tokens(F.col("text")).alias("t"))
    sigs = simhash_signatures(
        toks, "doc_id", "t", n_bits=60, hash_expr=md5_token_hash60
    )
    return simhash_near_pairs(
        sigs, "doc_id", "simhash", max_hamming=3, n_bits=60
    ).orderBy("doc_id_a", "doc_id_b")


_TFIDF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKENS}) AS token, len({_SQL_TOKENS}) AS doc_len
  FROM documents
),
tf AS (
  SELECT doc_id, token, doc_len, COUNT(*) AS n_occ
  FROM toks GROUP BY doc_id, token, doc_len
),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS n_docs FROM toks GROUP BY token),
n AS (SELECT COUNT(DISTINCT doc_id) AS total_docs FROM documents),
w AS (
  SELECT tf.doc_id, tf.token,
         ROUND((tf.n_occ::DOUBLE / tf.doc_len)
               * ln((n.total_docs + 1.0) / (df.n_docs + 1.0)), 6) AS tfidf
  FROM tf JOIN df USING (token) CROSS JOIN n
)
SELECT doc_id, token, tfidf,
       ROW_NUMBER() OVER (
         PARTITION BY doc_id ORDER BY tfidf DESC, token
       ) AS rank
FROM w
QUALIFY rank <= 3
"""


@_register("text_tfidf_keywords", _TFIDF_ORACLE)
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF keywords — the classic
    term-importance extraction (topic tagging / retrieval weighting)
    over the corpus vocabulary.

    tf = occurrences / doc length; idf = ln((N+1)/(df+1)) (smoothed,
    always finite). Plan (r14): one explode pass → per-(doc, token)
    counts (partial-agg shuffle keyed on doc+token) → document
    frequency as a COUNT WINDOW over the token partition of the tf
    OUTPUT: tf rows are distinct (doc, token) by construction, so the
    per-token row count IS COUNT(DISTINCT doc_id) — the earlier
    separate countDistinct aggregate re-shuffled the full exploded
    token stream a second time (distinct partials barely collapse)
    and joined the vocab relation back on. The window computes the
    identical integer on the already-aggregated tf relation in one
    token-keyed exchange, with no join — and the exploded relation now
    has ONE consumer, so the persist is gone too (in-session A/B at
    sf0.1: 1.05 → 0.77 s; results identical at sf0.01/sf0.1). Ranking
    then uses the ROUNDED weight (both engines round identically; raw
    ln() may differ in the last ulp between libm and the JVM) with the
    token as tie-break, so the result is deterministic and
    hash-checkable cross-engine.

    At 100 TB: the corpus-sized relations only ever shuffle on
    (doc_id, token), token, and doc_id — all uniform (the token window
    is bounded by a term's posting count, the same skew bound the old
    df aggregate had). No all-pairs term matrix is ever materialized.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", whitespace_tokens(F.col("text")).alias("__t")
    ).select(  # bind the token array once; split text ONE time per doc
        "doc_id",
        F.explode("__t").alias("token"),
        F.size("__t").alias("doc_len"),
    )
    tf = toks.groupBy("doc_id", "token", "doc_len").agg(
        F.count(F.lit(1)).alias("n_occ")
    )
    total_docs = d.select(F.countDistinct("doc_id").alias("total_docs"))
    wdf = Window.partitionBy("token")
    w = (
        tf.withColumn("n_docs", F.count(F.lit(1)).over(wdf))
        .crossJoin(F.broadcast(total_docs))
        .select(
            "doc_id",
            "token",
            F.round(
                (F.col("n_occ").cast("double") / F.col("doc_len"))
                * F.log(
                    (F.col("total_docs") + 1.0) / (F.col("n_docs") + 1.0)
                ),
                6,
            ).alias("tfidf"),
        )
    )
    rank_w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token")
    )
    return (
        w.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "token", "tfidf", "rank")
    )


_QUALITY_FILTER_ORACLE = f"""
WITH g AS (
  SELECT doc_id, lang, {_SQL_TOKENS} AS t,
         [array_to_string(x, ' ') FOR x IN [t[i:i+1] FOR i IN range(1, len({_SQL_TOKENS}))]] AS bg
  FROM documents
),
m AS (
  SELECT doc_id, lang, len(t) AS n_tokens,
         CASE WHEN len(bg) > 0
              THEN (len(bg) - len(list_distinct(bg)))::DOUBLE / len(bg)
              ELSE 0.0 END AS excess_bigram_frac
  FROM g
)
SELECT doc_id, lang, n_tokens, ROUND(excess_bigram_frac, 6) AS excess_bigram_frac
FROM m
WHERE n_tokens BETWEEN 20 AND 90 AND excess_bigram_frac < 0.2
"""


@_register("pipeline_quality_filter", _QUALITY_FILTER_ORACLE)
def pipeline_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY step of corpus cleaning: keep documents passing the
    length window (20–90 tokens) AND the repetition gate (duplicated
    bigram occurrences < 20%) — the composite filter the per-signal
    queries (`text_stats`, `text_repetition_stats`) feed in a real
    recipe.

    Everything is computed WITHIN the row, so the whole filter is one
    narrow projection + predicate: zero shuffles, trivially parallel
    at any scale — quality gating must never cost an exchange.
    """
    d = load_table(spark, sf_dir, "documents")
    # The NON-distinct bigram count is just n_tokens-1, so only the
    # DISTINCT count needs grams — extracted with ONE codegen regex
    # pass: an earlier HOF formulation re-evaluated the tokenizer per
    # gram through CollapseProject inlining, 6.1 s → 1.0 s at sf0.1.
    # The regex runs over concat_ws(' ', tokens) — the NORMALIZED text
    # (empty tokens dropped, single spaces) — with token class [^ ]
    # (not \S: a token may contain \n/\t, which \S+ would split), so
    # the grams are EXACTLY the split-tokenizer's bigrams for any
    # whitespace shape, not only single-space corpora; equivalence to
    # the oracle's split+filter tokenization holds by construction.
    bigram_pat = r"(?:^|(?<= ))(?=([^ ]+ [^ ]+))"
    normalized = F.concat_ws(" ", whitespace_tokens(F.col("text")))
    m = d.select(
        "doc_id", "lang",
        F.size(whitespace_tokens(F.col("text"))).alias("n_tokens"),
        F.size(
            F.array_distinct(F.regexp_extract_all(normalized, F.lit(bigram_pat), 1))
        ).alias("__nd"),
    ).select(
        "doc_id", "lang", "n_tokens",
        F.when(
            F.col("n_tokens") >= 2,
            (F.col("n_tokens") - 1 - F.col("__nd")).cast("double")
            / (F.col("n_tokens") - 1),
        ).otherwise(F.lit(0.0)).alias("__dup"),
    )
    return m.filter(
        F.col("n_tokens").between(20, 90) & (F.col("__dup") < 0.2)
    ).select(
        "doc_id", "lang", "n_tokens", F.round("__dup", 6).alias("excess_bigram_frac")
    )


_SIMILAR_DOCS_REPORT_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
     q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0),
     scored AS (
       SELECT q.query_id, e.vec_id AS neighbor_id,
              list_dot_product(e.v, q.qv)
              / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS c
       FROM e JOIN q ON e.vec_id != q.query_id
     ),
     topk AS (
       SELECT query_id, neighbor_id, ROUND(c, 6) AS cos_sim,
              ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rank
       FROM scored QUALIFY rank <= 3
     )
SELECT t.query_id, t.neighbor_id, t.cos_sim, t.rank,
       nd.lang AS neighbor_lang, nd.source AS neighbor_source,
       (nd.lang = qd.lang) AS same_lang
FROM topk t
JOIN documents nd ON nd.doc_id = t.neighbor_id
JOIN documents qd ON qd.doc_id = t.query_id
"""


@_register("pipeline_similar_docs_report", _SIMILAR_DOCS_REPORT_ORACLE)
def pipeline_similar_docs_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search joined back to document metadata — the
    composite query an actual corpus investigation runs: top-3 cosine
    neighbors per query vector, enriched with each neighbor's
    lang/source and a same-language flag against the query's own doc
    (vec_id and doc_id align 1:1 in the fixture corpus).

    Plan shape: the exact-kNN broadcast/score/rank core
    (`topk_cosine`) produces k·|queries| rows, then TWO equi-joins
    against `documents` on doc id — both probe-sided (the top-k
    relation is tiny; documents is the big side scanned once per
    join). At 100 TB this is the right order of operations: similarity
    first on the slim (id, vector) projection, metadata joined onto
    the k-sized result — never the reverse (joining metadata onto the
    corpus BEFORE scoring would drag text columns through the score
    shuffle).
    """
    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents")
    q = e.filter(F.col("vec_id") % 100 == 0)
    topk = topk_cosine(e, q, id_col="vec_id", vec_col="embedding", k=3)
    nd = d.select(
        F.col("doc_id").alias("neighbor_id"),
        F.col("lang").alias("neighbor_lang"),
        F.col("source").alias("neighbor_source"),
    )
    qd = d.select(
        F.col("doc_id").alias("query_id"), F.col("lang").alias("__qlang")
    )
    return (
        topk.join(nd, "neighbor_id")
        .join(qd, "query_id")
        .select(
            "query_id", "neighbor_id", "cos_sim", "rank",
            "neighbor_lang", "neighbor_source",
            (F.col("neighbor_lang") == F.col("__qlang")).alias("same_lang"),
        )
    )


_MIX_LANGUAGES_ORACLE = """
WITH c AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang),
     t AS (SELECT SUM(n_l)::DOUBLE / COUNT(*) AS target FROM c)
SELECT d.lang, d.doc_id
FROM documents d JOIN c USING (lang) CROSS JOIN t
WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 4))::BIGINT / 65536.0
      < least(1.0, t.target / c.n_l)
"""


@_register("pipeline_mix_languages", _MIX_LANGUAGES_ORACLE)
def pipeline_mix_languages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture rebalancing: downsample over-represented
    languages to an equal per-language share (the corpus is ~44% en)
    by deterministic rate-based hash sampling — the mixture-weighting
    step of a pretraining data recipe.

    Acceptance is a pure function of doc_id (md5-prefix fraction <
    per-lang rate), so the sample is re-run-stable and incremental-
    ingest-stable, like `pipeline_train_val_split`. The plan is the
    scale-correct shape for mixing: per-lang counts (one partial-agg
    pass over a table that is tiny after aggregation) → rates
    BROADCAST back → a NARROW accept/reject filter. No corpus shuffle,
    no per-group window — a rank-based "keep first n_target" would
    serialize each language through one reducer at 100 TB; the rate
    filter touches every row exactly once, embarrassingly parallel.
    Expected (not exact) per-lang share equality is the trade, which
    is what production mixing does.
    """
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    t = c.agg(
        (F.sum("n_l").cast("double") / F.count(F.lit(1))).alias("target")
    )
    rates = c.crossJoin(F.broadcast(t)).select(
        "lang", F.least(F.lit(1.0), F.col("target") / F.col("n_l")).alias("__rate")
    )
    frac = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("bigint") / F.lit(65536.0)
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(frac < F.col("__rate"))
        .select("lang", "doc_id")
    )


_PACK_SEQUENCES_ORACLE = f"""
WITH d AS (
  SELECT source, substr(md5(doc_id::VARCHAR), 1, 1) AS shard, doc_id,
         len({_SQL_TOKENS}) AS n_tokens
  FROM documents
),
o AS (
  SELECT source, shard, doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (
           PARTITION BY source, shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - n_tokens AS BIGINT) AS start_offset
  FROM d
)
SELECT source, shard, doc_id, n_tokens, start_offset,
       CAST(FLOOR(start_offset / 128.0) AS BIGINT) AS chunk_id,
       (CAST(FLOOR(start_offset / 128.0) AS BIGINT)
        != CAST(FLOOR((start_offset + greatest(n_tokens, 1) - 1) / 128.0) AS BIGINT))
       AS spans_boundary
FROM o
"""


@_register("pipeline_pack_sequences", _PACK_SEQUENCES_ORACLE)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: assign every document a
    deterministic token offset in its shard's concatenation stream
    and the 128-token training chunk that offset lands in —
    the standard "concatenate docs, slice fixed-length sequences"
    step before tokenized training data is written.

    Sharding is (source, md5-hex-prefix-of-doc_id): 16 deterministic
    buckets per source, so one hot source never serializes into a
    single window partition (the classic skew trap — a bare
    `PARTITION BY source` would put all of a 100 TB crawl's docs in
    one reducer). Within a shard the layout is a running-sum window
    over doc_id order: one shuffle keyed (source, shard), each
    partition a sequential prefix scan — the distributed form closest
    to the sequential packer; docs crossing a chunk edge are flagged
    (`spans_boundary`) for the trainer's attention-mask logic.
    """
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "source",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("shard"),
        "doc_id",
        F.size(whitespace_tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    o = base.withColumn(
        "start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    chunk = F.floor(F.col("start_offset") / 128.0).cast("long")
    # greatest(n,1): a zero-token doc's "last token" would otherwise sit
    # at offset-1 — one chunk EARLIER when the doc lands exactly on a
    # chunk edge, flagging an empty doc as boundary-spanning
    last_chunk = F.floor(
        (F.col("start_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
        / 128.0
    ).cast("long")
    return o.select(
        "source", "shard", "doc_id", "n_tokens", "start_offset",
        chunk.alias("chunk_id"),
        (chunk != last_chunk).alias("spans_boundary"),
    )


_REPETITION_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
     g AS (
       SELECT doc_id, len(t) AS n_tokens,
              unnest([array_to_string(t[i:i+1], ' ') FOR i IN range(1, len(t))]) AS gram
       FROM toks WHERE len(t) >= 2
     ),
     c AS (SELECT doc_id, n_tokens, gram, COUNT(*) AS cnt FROM g GROUP BY ALL)
SELECT doc_id, n_tokens,
       ROUND(COUNT(*)::DOUBLE / (n_tokens - 1), 6) AS distinct_bigram_ratio,
       ROUND(MAX(cnt)::DOUBLE / (n_tokens - 1), 6) AS top_bigram_frac,
       ROUND(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)::DOUBLE
             / (n_tokens - 1), 6) AS dup_bigram_frac
FROM c GROUP BY doc_id, n_tokens
"""


@_register("text_repetition_stats", _REPETITION_ORACLE)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition quality signals over word bigrams —
    the Gopher-rules family (Rae et al. 2021: excess duplicate n-grams
    mark low-quality/boilerplate text, filtered before training):
    distinct-bigram ratio, most-common-bigram fraction, and the
    fraction of bigram occurrences belonging to a repeated bigram.

    Plan (r14): one narrow pass extracts non-distinct bigrams from the
    MATERIALIZED token array (bound-column transform — no outer-expr
    re-evaluation on the interpreted HOF path), and the per-document
    multiset statistics fold INSIDE the row via
    ``gram_multiset_counts`` (an Arrow-batched Counter): every signal
    here is a function of one document's grams, so the earlier two
    corpus-wide partial-agg shuffles — (doc_id, gram) then doc_id —
    were pure waste (per-document work never shuffles, the
    `simhash_signatures` argument). ZERO exchanges end to end; the
    divisions and round(…, 6) stay JVM-side on the exact integer
    outputs, so results are bit-identical to the grouped-agg form
    (in-session A/B at sf0.1: 1.07 → 0.67 s, result sets equal at
    sf0.01/sf0.1).
    """
    from ..operators.text import gram_multiset_counts

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", whitespace_tokens(F.col("text")).alias("__t")
    ).filter(F.size("__t") >= 2)
    g = toks.select(
        "doc_id",
        F.size("__t").alias("n_tokens"),
        gram_multiset_counts(word_grams(F.col("__t"), n=2)).alias("__s"),
    )
    denom = (F.col("n_tokens") - 1).cast("double")
    return g.select(
        "doc_id",
        "n_tokens",
        F.round(F.col("__s.nd") / denom, 6).alias("distinct_bigram_ratio"),
        F.round(F.col("__s.mx") / denom, 6).alias("top_bigram_frac"),
        F.round(F.col("__s.dup") / denom, 6).alias("dup_bigram_frac"),
    )


_DECONTAMINATE_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
     sh AS (
       SELECT doc_id,
              unnest(list_distinct(
                [array_to_string(t[i:i+3], ' ') FOR i IN range(1, len(t) - 2)]
              )) AS gram
       FROM toks WHERE len(t) >= 4
     ),
     bench AS (SELECT DISTINCT gram FROM sh WHERE doc_id % 97 = 0),
     corpus AS (SELECT doc_id, gram FROM sh WHERE doc_id % 97 != 0)
SELECT c.doc_id, COUNT(*) AS n_benchmark_grams
FROM corpus c JOIN bench b USING (gram)
GROUP BY c.doc_id
"""


@_register("pipeline_decontaminate", _DECONTAMINATE_ORACLE)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test decontamination: corpus documents sharing any word
    4-gram with the held-out benchmark slice (doc_id % 97 = 0), with
    the count of distinct leaked grams per document.

    The data-hygiene op every pretraining pipeline runs before
    training: exact n-gram membership against the evaluation suite's
    gram set. The benchmark side is distinct-collapsed and BROADCAST
    (a benchmark is small by construction), so at 100 TB the corpus
    undergoes one narrow shingle→probe pass with the per-doc count as
    the only shuffle — the corpus is never shuffled by gram content and
    never self-joined. Anti-join the output against the corpus to get
    the clean training set.
    """
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    return contamination_hits(corpus, bench, "doc_id", "text", n=4)


_EMB_COSINE_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
p AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         -- round-9 before the threshold compare: the Spark kernel is a
         -- numpy matmul whose summation order differs from DuckDB's
         -- sequential list_dot_product in the last ulp; both engines
         -- compare (and then 6-round) the identical round-9 value, so
         -- a threshold-adjacent pair can't survive in just one engine
         round(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))), 9) AS cs
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT ia AS vec_id_a, ib AS vec_id_b, ROUND(cs, 6) AS cos_sim
FROM p WHERE cs >= 0.4
"""


@_register("dedup_embedding_cosine", _EMB_COSINE_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level near-dup: all pairs with cosine ≥ 0.4.

    CORRECTNESS BASELINE ONLY: this is the documented O(n²)
    brute-force pair scan (Arrow-batched matmul against the
    closure-shipped corpus matrix — see `cosine_pairs`), runnable
    because the fixture corpus is small; the synthetic vectors have no
    true near-dups (max pairwise cos ≈ 0.51) so the threshold is set to
    exercise the operator. The 100 TB path for the same predicate is
    LSH bucketing — see `dedup_embedding_lsh` — or MinHash over
    quantized vectors; an all-pairs product is never shipped at scale.
    """
    e = load_table(spark, sf_dir, "embeddings")
    return cosine_pairs(e, id_col="vec_id", vec_col="embedding", threshold=0.4)


def _lsh_g_values_sql(dim: int, num_hash_tables: int, seed: int) -> str:
    """The seeded LSH unit directions as a SQL VALUES body: the matrix
    is NOT random at verification time — it is the deterministic output
    of `operators.similarity.seeded_unit_directions` (called here, so
    there is exactly ONE construction in the codebase), embedded as
    full-precision literals (repr round-trips doubles exactly; DuckDB
    parses decimal literals to the nearest double = the same bits).
    """
    from ..operators.similarity import seeded_unit_directions

    G = seeded_unit_directions(dim, num_hash_tables, seed)
    return ",\n  ".join(
        "({t}, [{xs}]::DOUBLE[])".format(
            t=t, xs=", ".join(repr(float(x)) for x in G[:, t])
        )
        for t in range(num_hash_tables)
    )


def _lsh_bucket_ctes_sql(
    *,
    dim: int = 64,
    num_hash_tables: int = 4,
    seed: int = 42,
    bucket_length: float = 0.5,
) -> str:
    """The bucketing half of every seeded-LSH restatement, built ONCE
    so the cross-engine contract — seeded unit directions as SQL
    literals (`_lsh_g_values_sql`), bucket id = floor(round-9 of
    v̂·g_t / w) exactly as `_bucket_ids_udf` computes it — lives in a
    single SQL builder, mirroring the single Python construction in
    `operators.similarity`. Requires a preceding CTE `e AS (SELECT
    vec_id, embedding::DOUBLE[] AS v FROM embeddings)`; exposes
    `lshb(vec_id, t, bkt)`. ``dim`` is pinned to the fixture's
    embedding width (the operators probe it from data; an oracle is
    only ever run on the fixtures)."""
    tables = _lsh_g_values_sql(dim, num_hash_tables, seed)
    return f"""\
lshg(t, dir) AS (VALUES
  {tables}
),
lshn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
         WHERE v IS NOT NULL AND len(v) > 0),
lshnz AS (SELECT vec_id, v, [x / nrm FOR x IN v] AS u FROM lshn WHERE nrm > 0),
lshb AS (SELECT vec_id, t,
                floor(round(list_dot_product(u, dir) / {bucket_length!r}, 9)) AS bkt
         FROM lshnz, lshg)"""


def _lsh_pairs_oracle_sql(*, threshold: float = 0.4, **bucket_kw) -> str:
    """DuckDB restatement of `lsh_cosine_pairs`: shared bucketing CTEs
    (`_lsh_bucket_ctes_sql`), candidate pairs sharing any (table,
    bucket), survivors verified at exact cosine ROUNDED TO 9 DECIMALS
    before the threshold compare — the operator's verification kernel
    rounds identically, so a threshold-adjacent pair can't survive in
    exactly one engine (the same contract the bucket ids use)."""
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_lsh_bucket_ctes_sql(**bucket_kw)},
cand AS (SELECT DISTINCT a.vec_id AS ia, c.vec_id AS ib
         FROM lshb a JOIN lshb c ON a.t = c.t AND a.bkt = c.bkt
                                AND a.vec_id < c.vec_id),
p AS (SELECT ia, ib,
             round(list_dot_product(x.v, y.v)
                   / (sqrt(list_dot_product(x.v, x.v))
                      * sqrt(list_dot_product(y.v, y.v))), 9) AS cs
      FROM cand JOIN e x ON x.vec_id = ia
                JOIN e y ON y.vec_id = ib)
SELECT ia AS vec_id_a, ib AS vec_id_b, ROUND(cs, 6) AS cos_sim
FROM p WHERE cs >= {threshold!r}
"""


_LSH_PAIRS_ORACLE = _lsh_pairs_oracle_sql()


@_register("dedup_embedding_lsh", _LSH_PAIRS_ORACLE)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cosine ≥ 0.4) via LSH bucketing — the
    100 TB twin of `dedup_embedding_cosine`: the cost follows bucket
    occupancy instead of |corpus|². Exact cosine recomputed on
    surviving pairs. Recall < 1 vs the exact twin BY DESIGN, but the
    LSH result itself is deterministic (seeded unit directions, round-9
    projection contract), so since round 8 the DuckDB oracle restates
    the bucketing + verification exactly — upgraded from rows-only.

    Deliberately UNSORTED: the pair relation is unbounded
    (data-dependent output size), so a presentation ``orderBy`` would
    be a full range-shuffle of the largest intermediate at scale — the
    hash compare is order-insensitive.
    """
    e = load_table(spark, sf_dir, "embeddings")
    return lsh_cosine_pairs(
        e, id_col="vec_id", vec_col="embedding", threshold=0.4, seed=42
    )


_CORPUS_DEDUP_ORACLE = f"""
WITH RECURSIVE
t AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
s AS (SELECT doc_id, {_SQL_WORD_SHINGLES} AS sh FROM t WHERE len(t) >= 3),
p AS (SELECT a.doc_id AS u, b.doc_id AS v
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE {_SQL_JACCARD} >= 0.8),
edges AS (SELECT u, v FROM p UNION ALL SELECT v, u FROM p),
reach(a, b) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u WHERE e.v != r.a
)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT a FROM reach WHERE b < a)
"""


@_register("pipeline_corpus_dedup", _CORPUS_DEDUP_ORACLE)
def pipeline_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus near-dedup: the query a training-data pipeline
    actually runs. MinHash-LSH pair detection (Jaccard ≥ 0.8) →
    connected components over the pair graph (transitive closure: A≈B,
    B≈C removes C even if (A,C) is sub-threshold) → keep each
    cluster's minimum doc_id.

    Composes three scale-safe stages: bucketed candidate generation,
    exact verification, and iterative min-label propagation
    (operators/graph.py — one edge shuffle per round, O(diameter)
    rounds). Oracle: DuckDB recursive CTE over the brute-force pair
    relation.
    """
    from ..operators.graph import connected_components_min_label

    d = load_table(spark, sf_dir, "documents")
    ex = _persist_bounded(shingle_elements(d, "doc_id", "text", n=3))
    cands = minhash_candidate_pairs(ex, "doc_id", num_hashes=16, rows_per_band=2)
    pairs = jaccard_verify_elements(cands, ex, "doc_id", threshold=0.8)
    labels = connected_components_min_label(
        d.select("doc_id"),
        pairs.select(
            F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst")
        ),
        id_col="doc_id",
    )
    return labels.filter(F.col("node") == F.col("label")).select(
        F.col("node").alias("doc_id")
    )


_ARRAY_FUNCS_ORACLE = """
SELECT vec_id,
       len(embedding) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_elem,
       CAST(embedding[64] AS DOUBLE) AS last_elem,
       ROUND(CAST(list_sum(embedding[1:8]::DOUBLE[]) AS DOUBLE), 6) AS head_sum,
       CAST(list_max(embedding) AS DOUBLE) AS max_elem,
       len(list_filter(embedding, x -> x > 0)) AS n_positive
FROM embeddings
"""


@_register("scalar_array_functions", _ARRAY_FUNCS_ORACLE)
def scalar_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function battery over the embedding column: size, element
    access, slice-sum (higher-order aggregate), max, predicate count —
    the vector-column manipulation surface, all JVM expressions."""
    e = load_table(spark, sf_dir, "embeddings")
    head8 = F.transform(
        F.slice(F.col("embedding"), 1, 8), lambda x: x.cast("double")
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        F.element_at("embedding", 64).cast("double").alias("last_elem"),
        F.round(
            F.aggregate(head8, F.lit(0.0), lambda a, x: a + x), 6
        ).alias("head_sum"),
        F.array_max("embedding").cast("double").alias("max_elem"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_positive"),
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_TOPK_COSINE_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
     q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0),
     scored AS (
       SELECT q.query_id, e.vec_id AS neighbor_id,
              list_dot_product(e.v, q.qv)
              / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS c
       FROM e JOIN q ON e.vec_id != q.query_id
     )
SELECT query_id, neighbor_id, ROUND(c, 6) AS cos_sim,
       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rank
FROM scored
QUALIFY rank <= 10
"""


@_register("sim_topk_cosine", _TOPK_COSINE_ORACLE)
def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors for the query set vec_id % 100 = 0.

    Broadcast the query vectors, one narrow scoring pass over the
    corpus (higher-order array functions — JVM codegen, no UDF), then
    a per-query rank. Scales as |corpus|·|queries| dot products with
    NO corpus shuffle — the right exact-kNN plan whenever the query set
    is broadcastable; `sim_topk_lsh` is the corpus×corpus variant.
    Tie-break (cos DESC, neighbor_id) keeps results hash-stable.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return topk_cosine(e, q, id_col="vec_id", vec_col="embedding", k=10)


@_register("sim_topk_cosine_arrow", _TOPK_COSINE_ORACLE)
def sim_topk_cosine_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sim_topk_cosine`'s Arrow twin: identical query, scoring through
    the vectorized `pandas_udf` numpy path instead of JVM array
    expressions — the sanctioned pattern for scorers the built-ins
    can't express, oracle-checked against the very same SQL. Benched
    side-by-side with the JVM twin so the serialization-boundary cost
    stays measured, not assumed.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return topk_cosine_arrow(e, q, id_col="vec_id", vec_col="embedding", k=10)


_TOPK_COSINE_INT8_ORACLE = """
WITH e AS (
  SELECT vec_id,
         list_transform(
           embedding::DOUBLE[],
           x -> round(x * 127.0 / greatest(
                  list_max(list_transform(embedding::DOUBLE[], y -> abs(y))),
                  1e-300))
         ) AS v
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_dot_product(e.v, q.qv)
         / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS c
  FROM e JOIN q ON e.vec_id != q.query_id
)
SELECT query_id, neighbor_id, ROUND(c, 6) AS cos_sim,
       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rank
FROM scored
QUALIFY rank <= 10
"""


@_register("sim_topk_cosine_int8", _TOPK_COSINE_INT8_ORACLE)
def sim_topk_cosine_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 cosine neighbors over int8-QUANTIZED vectors, quantizing
    on the fly — the QUANTIZATION-COST half of the int8 story (same
    plan as `sim_topk_cosine`; vectors max-abs-quantized to 127 levels
    first).

    On its own this path is strictly slower than the float twin: it
    pays quantize + widen on every run while reading full-width floats
    (measured ~1.5× the float path at sf0.1). The BENEFIT lands in
    `sim_topk_cosine_int8_stored`, which scans vectors already stored
    as array<tinyint> — at 100 TB the embedding column IS the table's
    bytes, and that layout cuts scan/shuffle/cache traffic 4× vs
    float32. This on-the-fly variant exists as the ingest-side operator
    (what you run ONCE to produce the quantized table) and as the
    measured cost baseline for the stored twin.

    Scoring needs no dequantization (cosine is scale-invariant), and
    quantized dot products are exact integers — bit-reproducible
    across engines and partition orders — so unlike LSH/IVF this
    approximate path is fully hash-checkable: DuckDB reproduces the
    quantization (both engines round ties half-away-from-zero) and the
    integer arithmetic exactly. Accuracy loss vs the float path is
    bounded by rounding error, measured in
    tests/test_text_operators.py::test_int8_topk_tracks_exact_cosine.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return topk_cosine_int8(e, q, id_col="vec_id", vec_col="embedding", k=10)


def _int8_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize (once per sf_dir, refreshed when the source parquet
    changes) the embeddings table quantized to ``array<tinyint>`` and
    return a reader over the quantized file.

    This is the storage layout the int8 path's 4x bandwidth claim is
    about: at 100 TB you quantize at INGEST and every similarity sweep
    scans tinyint vectors. The cache directory stands in for that
    pre-quantized table; writing it is one narrow pass (no shuffle).

    Validity + concurrency: delegated to
    :func:`sources.cache.cached_materialization` — explicit
    (mtime_ns, size) source fingerprint, ``_SUCCESS``-gated, atomic
    temp-dir rename install (ADVICE r4; the protocol this cache
    pioneered now lives there, shared with the sink-roundtrip
    queries).
    """
    import pathlib

    def build(tmp: str) -> None:
        (
            load_table(spark, sf_dir, "embeddings")
            .select("vec_id", quantize_int8(F.col("embedding")).alias("embedding"))
            .write.mode("overwrite")
            .parquet(tmp)
        )

    dest = cached_materialization(
        pathlib.Path(sf_dir) / "embeddings.parquet", "embeddings_int8", build
    )
    # retire pre-refactor cache layouts (old '<key>.parquet' dir name
    # and the external '.src.json' sidecar) so multi-GB duplicates
    # don't linger in .bench_cache with nothing left to reclaim them
    import shutil

    dest_p = pathlib.Path(dest)
    for legacy in (
        dest_p.with_name(dest_p.name + ".parquet"),
        dest_p.with_name(dest_p.name + ".src.json"),
    ):
        if legacy.exists():
            if legacy.is_dir():
                shutil.rmtree(legacy, ignore_errors=True)
            else:
                legacy.unlink(missing_ok=True)
    return spark.read.parquet(dest)


@_register("sim_topk_cosine_int8_stored", _TOPK_COSINE_INT8_ORACLE)
def sim_topk_cosine_int8_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 cosine over PRE-QUANTIZED int8 storage — the path that
    actually banks the bandwidth win `sim_topk_cosine_int8` only pays
    for. Same results, same oracle: int8 scoring is deterministic
    integer arithmetic either way.

    `sim_topk_cosine_int8` quantizes float vectors on the fly, so its
    bench time = quantization cost + scoring, a strictly WORSE deal
    than the float path at read time (measured ~1.5× slower at sf0.1).
    Here the corpus is materialized once as ``array<tinyint>`` parquet
    (`_int8_embeddings`; at scale: quantize at ingest) and the query
    scans only that — the scan/shuffle/cache footprint is 4× smaller
    than float32, 8× than float64, which is the whole cost of a
    similarity sweep over an embedding-dominated table. bench.py's
    min-of-two-runs timing reports the steady-state scan path (run 1
    pays the one-time materialization).
    """
    e = _int8_embeddings(spark, sf_dir)
    q = e.filter(F.col("vec_id") % 100 == 0)
    return topk_cosine(e, q, id_col="vec_id", vec_col="embedding", k=10)


@_register("sim_topk_cosine_mapside", _TOPK_COSINE_ORACLE)
def sim_topk_cosine_mapside(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine with MAP-SIDE top-k pruning — the scale
    form of the brute-force plan, checked against the very same SQL
    as `sim_topk_cosine`.

    The window-rank twins shuffle every scored (query, neighbor) pair;
    this one keeps only each partition's top-k per query inside a
    `mapInPandas` pass (one numpy matmul per Arrow batch, bounded
    candidate pools), so the exchange carries k·|queries|·partitions
    rows — kilobytes where the window plan moves the corpus. At 10⁹+
    corpus rows this IS the runnable exact-kNN plan; the window twins
    remain as the all-JVM and simplest-Python baselines.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return topk_cosine_mapside(e, q, id_col="vec_id", vec_col="embedding", k=10)


def _lsh_topk_ctes_sql(**bucket_kw) -> str:
    """CTE block restating `lsh_topk_cosine` for the fixture query set
    (vec_id % 100 = 0): shared bucketing CTEs (`_lsh_bucket_ctes_sql` —
    the single home of the seeded-directions + round-9-before-floor
    contract), candidates = co-bucketed (query, corpus) pairs in ANY
    table, scored at exact cosine — UNROUNDED here, unlike the pairs
    oracle: the top-k operator scores with the JVM sequential fold,
    which is bit-identical to DuckDB's list_dot_product, and ranking
    needs the full-precision ordering `_TOPK_COSINE_ORACLE` also uses.
    Requires a preceding CTE `e AS (SELECT vec_id, embedding::DOUBLE[]
    AS v FROM embeddings)`; exposes `lsh_scored(query_id, neighbor_id,
    c)`. Used by BOTH the `sim_topk_lsh` ranking oracle and
    `sim_recall_report`'s lsh recall row.
    """
    return f"""\
{_lsh_bucket_ctes_sql(**bucket_kw)},
lshcand AS (SELECT DISTINCT qq.vec_id AS query_id, cc.vec_id AS neighbor_id
            FROM lshb qq JOIN lshb cc ON qq.t = cc.t AND qq.bkt = cc.bkt
                                     AND cc.vec_id != qq.vec_id
            WHERE qq.vec_id % 100 = 0),
lsh_scored AS (SELECT query_id, neighbor_id,
                      list_dot_product(x.v, y.v)
                      / (sqrt(list_dot_product(x.v, x.v))
                         * sqrt(list_dot_product(y.v, y.v))) AS c
               FROM lshcand JOIN e x ON x.vec_id = query_id
                            JOIN e y ON y.vec_id = neighbor_id)"""


_LSH_TOPK_CTES = _lsh_topk_ctes_sql()

_LSH_TOPK_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_LSH_TOPK_CTES}
SELECT query_id, neighbor_id, ROUND(c, 6) AS cos_sim,
       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rank
FROM lsh_scored
QUALIFY rank <= 10
"""


@_register("sim_topk_lsh", _LSH_TOPK_ORACLE)
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 cosine neighbors via native seeded
    random-projection LSH over L2-normalized vectors — FULLY
    ORACLE-CHECKED since round 8 (upgraded from rows-only when the
    MLlib form, whose internal Scala RNG no SQL can restate, was
    replaced by the repo's own seeded projections; same swap
    `dedup_embedding_lsh` runs on, same measured-cost rationale as
    round 5's `lsh_cosine_pairs` — see `operators/similarity.py`).

    The scale path for similarity: bucket corpus and queries with
    shared seeded projections, equi-join on (table, bucket) so each
    query scores only co-bucketed vectors, rank survivors. Recall < 1
    vs the exact twin (`sim_topk_cosine`) BY LSH DESIGN — that gap is
    itself hash-measured by `sim_recall_report`'s lsh row — but the
    result is deterministic, so the DuckDB oracle restates bucketing +
    scoring + ranking exactly.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    # round 9: the broadcast-query mapside twin — byte-identical rows
    # (equivalence-tested against the join form; same oracle), 4.3x
    # faster at sf0.1 (1.96 s -> 0.45 s) because the join form's stage
    # chain is fixed latency at broadcast-scale query cardinality
    return lsh_topk_cosine_mapside(
        e, q, id_col="vec_id", vec_col="embedding", k=10, seed=42
    ).orderBy("query_id", "rank")


# Shared SQL restatement of the FULL pq_topk_cosine pipeline
# (operators/similarity.py): quantile-stratified seeding -> 3 unrolled
# Lloyd rounds (means rounded to 9; distances rounded to 9 before
# argmin, ties -> lowest code) -> corpus encode -> ADC scores rounded
# to 9 -> ranked. Used by BOTH the sim_topk_pq / sim_topk_pq_stored
# ranking oracle and sim_recall_report's pq recall row. Requires a
# preceding CTE `e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM
# embeddings)`.
_PQ_SQL_CTES = """\
vn AS (
  SELECT vec_id,
         list_transform(v, x -> x / (CASE WHEN sqrt(list_dot_product(v, v)) = 0
                                     THEN 1.0 ELSE sqrt(list_dot_product(v, v)) END)) AS u
  FROM e WHERE v IS NOT NULL AND len(v) = 64
),
pq_train AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS tpos, u
  FROM (SELECT vec_id, u FROM vn ORDER BY vec_id LIMIT 16384)
),
subs AS (SELECT unnest(range(16)) AS sub),
tsub AS (
  SELECT t.tpos, s.sub, list_slice(t.u, s.sub * 4 + 1, s.sub * 4 + 4) AS sv
  FROM pq_train t CROSS JOIN subs s
),
tranked AS (
  SELECT sub, sv,
         row_number() OVER (PARTITION BY sub ORDER BY round(sv[1], 9), tpos) - 1 AS rnk,
         count(*) OVER (PARTITION BY sub) AS n
  FROM tsub
),
codes_dom AS (SELECT unnest(range(64)) AS code),
books0 AS (
  SELECT r.sub, c.code, r.sv
  FROM codes_dom c
  JOIN tranked r ON r.rnk = CAST(floor((c.code + 0.5) * r.n / 64.0) AS BIGINT)
),
asgn1 AS (
  SELECT tpos, sub, sv, code FROM (
    SELECT t.tpos, t.sub, t.sv, b.code,
      row_number() OVER (PARTITION BY t.tpos, t.sub ORDER BY
        round(list_dot_product(t.sv, t.sv) - 2 * list_dot_product(t.sv, b.sv)
              + list_dot_product(b.sv, b.sv), 9) ASC, b.code ASC) AS rk
    FROM tsub t JOIN books0 b USING (sub)) WHERE rk = 1
),
means1 AS (
  SELECT sub, code, [round(avg(sv[1]), 9), round(avg(sv[2]), 9),
                     round(avg(sv[3]), 9), round(avg(sv[4]), 9)] AS sv
  FROM asgn1 GROUP BY sub, code
),
books1 AS (
  SELECT b.sub, b.code, COALESCE(m.sv, b.sv) AS sv
  FROM books0 b LEFT JOIN means1 m ON m.sub = b.sub AND m.code = b.code
),
asgn2 AS (
  SELECT tpos, sub, sv, code FROM (
    SELECT t.tpos, t.sub, t.sv, b.code,
      row_number() OVER (PARTITION BY t.tpos, t.sub ORDER BY
        round(list_dot_product(t.sv, t.sv) - 2 * list_dot_product(t.sv, b.sv)
              + list_dot_product(b.sv, b.sv), 9) ASC, b.code ASC) AS rk
    FROM tsub t JOIN books1 b USING (sub)) WHERE rk = 1
),
means2 AS (
  SELECT sub, code, [round(avg(sv[1]), 9), round(avg(sv[2]), 9),
                     round(avg(sv[3]), 9), round(avg(sv[4]), 9)] AS sv
  FROM asgn2 GROUP BY sub, code
),
books2 AS (
  SELECT b.sub, b.code, COALESCE(m.sv, b.sv) AS sv
  FROM books1 b LEFT JOIN means2 m ON m.sub = b.sub AND m.code = b.code
),
asgn3 AS (
  SELECT tpos, sub, sv, code FROM (
    SELECT t.tpos, t.sub, t.sv, b.code,
      row_number() OVER (PARTITION BY t.tpos, t.sub ORDER BY
        round(list_dot_product(t.sv, t.sv) - 2 * list_dot_product(t.sv, b.sv)
              + list_dot_product(b.sv, b.sv), 9) ASC, b.code ASC) AS rk
    FROM tsub t JOIN books2 b USING (sub)) WHERE rk = 1
),
means3 AS (
  SELECT sub, code, [round(avg(sv[1]), 9), round(avg(sv[2]), 9),
                     round(avg(sv[3]), 9), round(avg(sv[4]), 9)] AS sv
  FROM asgn3 GROUP BY sub, code
),
books3 AS (
  SELECT b.sub, b.code, COALESCE(m.sv, b.sv) AS sv
  FROM books2 b LEFT JOIN means3 m ON m.sub = b.sub AND m.code = b.code
),
csub AS (
  SELECT vec_id, s.sub, list_slice(u, s.sub * 4 + 1, s.sub * 4 + 4) AS sv
  FROM vn CROSS JOIN subs s
),
cenc AS (
  SELECT vec_id, sub, code FROM (
    SELECT c.vec_id, c.sub, b.code,
      row_number() OVER (PARTITION BY c.vec_id, c.sub ORDER BY
        round(list_dot_product(c.sv, c.sv) - 2 * list_dot_product(c.sv, b.sv)
              + list_dot_product(b.sv, b.sv), 9) ASC, b.code ASC) AS rk
    FROM csub c JOIN books3 b USING (sub)) WHERE rk = 1
),
qsub AS (
  SELECT vec_id AS query_id, s.sub, list_slice(u, s.sub * 4 + 1, s.sub * 4 + 4) AS qv
  FROM vn CROSS JOIN subs s WHERE vec_id % 100 = 0
),
pq_scored AS (
  SELECT q.query_id, cn.vec_id AS neighbor_id,
         round(sum(list_dot_product(q.qv, b.sv)), 9) AS c
  FROM cenc cn
  JOIN books3 b ON b.sub = cn.sub AND b.code = cn.code
  JOIN qsub q ON q.sub = cn.sub
  WHERE cn.vec_id != q.query_id
  GROUP BY q.query_id, cn.vec_id
),
pq_ranked AS (
  SELECT query_id, neighbor_id, c,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY c DESC, neighbor_id) AS rnk
  FROM pq_scored
),
pq10 AS (
  SELECT query_id, neighbor_id FROM pq_ranked WHERE rnk <= 10
)
"""


_PQ_TOPK_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_PQ_SQL_CTES}
SELECT query_id, neighbor_id, ROUND(c, 6) AS cos_sim, rnk AS rank
FROM pq_ranked WHERE rnk <= 10
"""



@_register("sim_topk_pq", _PQ_TOPK_ORACLE)
def sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 cosine neighbors via PRODUCT QUANTIZATION +
    asymmetric distance (16 subspaces × 64 codes, quantile-stratified
    seeding, 3 Lloyd rounds on a bounded id-ordered sample) —
    completing the classic ANN trio: LSH buckets (`sim_topk_lsh`) and
    IVF cells (`sim_topk_ivf*`) shrink the candidate set; PQ shrinks
    bytes-per-vector (64-dim float32 → 16 uint8 codes, a 16× scan-
    bandwidth cut). Every vector is still SCORED (no candidate
    misses); recall < 1 comes from quantization error alone, so rank
    inversions near score ties are the failure mode — pinned by the
    recall@10 property test against the exact scorer
    (tests/test_analytics_queries.py). Unlike the LSH/IVF siblings
    this query IS fully oracle-checked: the pipeline is deterministic
    arithmetic end to end, so the DuckDB oracle recomputes training +
    encode + ADC and hash-matches the RANKED OUTPUT itself (round-7
    upgrade from rows-only; `sim_recall_report`'s pq row additionally
    hash-checks recall@10, and `sim_topk_pq_stored` is the
    train-once/score-from-stored-codes path under the same oracle).
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return pq_topk_cosine(
        e, q, id_col="vec_id", vec_col="embedding", k=10,
        n_subspaces=16, n_codes=64, refine_iterations=3,
    ).orderBy("query_id", "rank")


# Driver-side PQ codebooks, memoized per (cache dir, source fingerprint):
# the 1024-row collect that rebuilds the numpy codebook tensor is pure
# deserialization of an immutable stored index — re-running it on every
# invocation (bench repeats, the report's pq row after sim_topk_pq_stored)
# re-pays a fixed Spark job for bytes that cannot have changed, because
# the fingerprint in the key tracks the SOURCE parquet the index derives
# from. A stale source re-keys, so a stale codebook is never served.
_PQ_BOOKS_MEMO: dict[tuple[str, str], object] = {}


def _stored_pq_index(spark: SparkSession, sf_dir: str, e: DataFrame):
    """Build-or-load the stored PQ index for ``sf_dir``; returns
    (dest dir, codebook ndarray or None for an empty index). The
    memoized-collect half of :func:`_pq_stored_topk`, split out in
    round 10 so the recall report's ivfpq row can reuse the SAME
    trained codebooks (identical recipe over identical source ⇒
    identical books — the training collect happens once per source,
    not once per consumer)."""
    import pathlib

    import numpy as np

    from ..operators.similarity import encode_pq, train_pq_codebooks

    def build(tmp: str) -> None:
        books = train_pq_codebooks(e)  # defaults: 16 × 64 × 3, 16k sample
        if books is None:  # no valid vectors: install an EMPTY index
            spark.createDataFrame(
                [], "vec_id long, codes array<int>"
            ).write.mode("overwrite").parquet(tmp + "/codes")
            spark.createDataFrame(
                [], "sub int, code int, codeword array<double>"
            ).write.mode("overwrite").parquet(tmp + "/books")
            pathlib.Path(tmp, "_SUCCESS").touch()
            return
        n_subspaces, n_codes, sub_dim = books.shape
        encode_pq(e, books).select(
            F.col("__nid").alias("vec_id"), F.col("__codes").alias("codes")
        ).write.mode("overwrite").parquet(tmp + "/codes")
        spark.createDataFrame(
            [
                (s, c, [float(x) for x in books[s, c]])
                for s in range(n_subspaces)
                for c in range(n_codes)
            ],
            "sub int, code int, codeword array<double>",
        ).write.mode("overwrite").parquet(tmp + "/books")
        # two sub-tables → the per-table markers live one level down;
        # surface the install-complete marker where the cache expects it
        pathlib.Path(tmp, "_SUCCESS").touch()

    # the cache fingerprint tracks only the SOURCE parquet, so the
    # index parameters are baked into the cache NAME — changing the
    # config can never serve a stale index trained under the old one
    dest = cached_materialization(
        pathlib.Path(sf_dir) / "embeddings.parquet",
        "embeddings_pq16x64r3s16384",
        build,
    )
    memo_key = (dest, pathlib.Path(dest, "_SRC_FINGERPRINT.json").read_text())
    books = _PQ_BOOKS_MEMO.get(memo_key)
    if books is None:
        book_rows = spark.read.parquet(f"{dest}/books").collect()  # 1024 rows
        if not book_rows:  # empty index: the caller owns the empty contract
            return dest, None
        n_subspaces = 1 + max(r["sub"] for r in book_rows)
        n_codes = 1 + max(r["code"] for r in book_rows)
        sub_dim = len(book_rows[0]["codeword"])
        books = np.empty((n_subspaces, n_codes, sub_dim), dtype=np.float64)
        for r in book_rows:
            books[r["sub"], r["code"]] = r["codeword"]
        _PQ_BOOKS_MEMO.clear()  # bound: one live index per process
        _PQ_BOOKS_MEMO[memo_key] = books
    return dest, books


def _pq_stored_topk(
    spark: SparkSession,
    sf_dir: str,
    e: DataFrame | None = None,
    ordered: bool = True,
) -> DataFrame:
    """Score top-10 ADC from the cached on-disk PQ index (building it
    once per sf_dir if absent) — the shared engine behind
    `sim_topk_pq_stored` and `sim_recall_report`'s pq row (the report
    uses the CHEAPEST semantically-identical variant of each method,
    and the stored index skips the per-run train+encode).

    ``e`` lets a composite caller (the report) pass its already-cached
    (vec_id, double embedding) projection so the ADC query-side collect
    reads the cache instead of re-scanning parquet."""
    from ..operators.similarity import adc_topk

    if e is None:
        e = load_table(spark, sf_dir, "embeddings")
    dest, books = _stored_pq_index(spark, sf_dir, e)
    if books is None:  # empty index → the composed path's empty contract
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cos_sim double, rank int"
        )
    codes = spark.read.parquet(f"{dest}/codes").select(
        F.col("vec_id").alias("__nid"), F.col("codes").alias("__codes")
    )
    q = e.filter(F.col("vec_id") % 100 == 0)
    out = adc_topk(codes, books, q, id_col="vec_id", vec_col="embedding", k=10)
    # ``ordered=False`` lets a pair-set consumer (the report's recall
    # semi-join) skip the presentation sort the registered query wants
    return out.orderBy("query_id", "rank") if ordered else out


@_register("sim_topk_pq_stored", _PQ_TOPK_ORACLE)
def sim_topk_pq_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sim_topk_pq` scored from a STORED PQ index: codebooks are
    trained and the corpus encoded ONCE per sf_dir (cached,
    fingerprint-refreshed), persisted as two parquet tables — codes
    (vec_id, 16 int codes = 16 B/vector) and codebooks (1024 rows of
    (sub, code, codeword)) — and each query batch runs pure ADC over
    the codes table. This is how PQ is actually deployed: FAISS/Milvus
    separate `train`+`add` (ingest time) from `search` (query time);
    `sim_topk_cosine_int8_stored` plays the same role for scalar
    quantization at 4×, this banks the 16× end of the axis — the
    query-time scan touches 16-byte codes, never the 256-byte float
    vectors, and the training collect disappears from the query path
    (measured 0.94 s → 0.57 s at sf0.1).

    Same oracle as `sim_topk_pq`: the stored index is the
    deterministic function of the raw table that the SQL restates, so
    the DuckDB recomputation from raw embeddings must hash-match the
    stored-index scoring exactly — which simultaneously proves the
    index files round-tripped losslessly.
    """
    return _pq_stored_topk(spark, sf_dir)


_RECALL_REPORT_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0),
ex_scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_dot_product(e.v, q.qv)
         / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS c
  FROM e JOIN q ON e.vec_id != q.query_id
),
ex10 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rnk
    FROM ex_scored) WHERE rnk <= 10
),
i8 AS (
  SELECT vec_id,
         list_transform(v, x -> round(x * 127.0 / greatest(
               list_max(list_transform(v, y -> abs(y))), 1e-300))) AS v
  FROM e
),
i8q AS (SELECT vec_id AS query_id, v AS qv FROM i8 WHERE vec_id % 100 = 0),
i8_scored AS (
  SELECT i8q.query_id, i8.vec_id AS neighbor_id,
         list_dot_product(i8.v, i8q.qv)
         / (sqrt(list_dot_product(i8.v, i8.v)) * sqrt(list_dot_product(i8q.qv, i8q.qv))) AS c
  FROM i8 JOIN i8q ON i8.vec_id != i8q.query_id
),
i810 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rnk
    FROM i8_scored) WHERE rnk <= 10
),
cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS cell, v
  FROM (SELECT vec_id, v FROM e
        WHERE v IS NOT NULL AND len(v) = {_EMB_DIM}
        ORDER BY vec_id LIMIT {_IVF_CELLS})
),
cellrank AS (
  -- affinity rounded to 9 decimals on BOTH engines (see
  -- operators/similarity.py _cell_ranks): near-tie centroid rankings
  -- must not flip between numpy matmul and sequential-fold arithmetic
  SELECT e.vec_id, cent.cell,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             ROUND(list_dot_product(e.v, cent.v)
             / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cent.v, cent.v))), 9) DESC,
             cent.cell ASC) AS rnk
  FROM e CROSS JOIN cent
),
inv AS (SELECT vec_id AS neighbor_id, cell FROM cellrank WHERE rnk = 1),
probes AS (
  SELECT vec_id AS query_id, cell FROM cellrank
  WHERE vec_id % 100 = 0 AND rnk <= {_IVF_PROBE}
),
ivf_scored AS (
  SELECT p.query_id, i.neighbor_id,
         list_dot_product(en.v, eq.v)
         / (sqrt(list_dot_product(en.v, en.v)) * sqrt(list_dot_product(eq.v, eq.v))) AS c
  FROM probes p
  JOIN inv i USING (cell)
  JOIN e en ON en.vec_id = i.neighbor_id
  JOIN e eq ON eq.vec_id = p.query_id
  WHERE i.neighbor_id != p.query_id
),
ivf10 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rnk
    FROM ivf_scored) WHERE rnk <= 10
),
{_PQ_SQL_CTES},
{_LSH_TOPK_CTES},
lsh10 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rnk
    FROM lsh_scored) WHERE rnk <= 10
),
ivfpq_probes AS (
  SELECT vec_id AS query_id, cell FROM cellrank
  WHERE vec_id % 100 = 0 AND rnk <= {_IVFPQ_PROBE}
),
ivfpq_scored AS (
  -- the composite (round 10): the SAME refine-0 cells as the ivf row
  -- (shared cellrank/inv CTEs, wider probe) ADC-scored over the SAME
  -- trained codes as the pq row (shared cenc/books3/qsub CTEs)
  SELECT p.query_id, i.neighbor_id,
         round(sum(list_dot_product(qs.qv, b.sv)), 9) AS c
  FROM ivfpq_probes p
  JOIN inv i USING (cell)
  JOIN cenc cn ON cn.vec_id = i.neighbor_id
  JOIN books3 b ON b.sub = cn.sub AND b.code = cn.code
  JOIN qsub qs ON qs.query_id = p.query_id AND qs.sub = cn.sub
  WHERE i.neighbor_id != p.query_id
  GROUP BY p.query_id, i.neighbor_id
),
ivfpq10 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rnk
    FROM ivfpq_scored) WHERE rnk <= 10
),
sel AS (
  SELECT 'exact' AS method, query_id, neighbor_id FROM ex10
  UNION ALL SELECT 'int8', query_id, neighbor_id FROM i810
  UNION ALL SELECT 'ivf', query_id, neighbor_id FROM ivf10
  UNION ALL SELECT 'ivfpq', query_id, neighbor_id FROM ivfpq10
  UNION ALL SELECT 'lsh', query_id, neighbor_id FROM lsh10
  UNION ALL SELECT 'pq', query_id, neighbor_id FROM pq10
),
matched AS (
  -- anchored on the VALUES method list so a method with zero matched
  -- (or zero produced) pairs still yields its row with n_matched = 0,
  -- mirroring the Spark side's always-one-row aggregate per method
  SELECT m.method, count(x.query_id) AS n_matched
  FROM (VALUES ('exact'), ('int8'), ('ivf'), ('ivfpq'), ('lsh'), ('pq')) AS m(method)
  LEFT JOIN sel s ON s.method = m.method
  LEFT JOIN ex10 x
    ON s.query_id = x.query_id AND s.neighbor_id = x.neighbor_id
  GROUP BY m.method
),
nq AS (SELECT count(DISTINCT query_id) AS n_q FROM ex10)
SELECT method, n_q AS n_queries,
       ROUND(n_matched / (10.0 * n_q), 4) AS avg_recall_at_10
FROM matched, nq
"""


@_register("sim_recall_report", _RECALL_REPORT_ORACLE)
def sim_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured ANN quality: recall@10 of each deterministic
    approximate method against the exact float top-10, as a registered
    oracle-checked query — "the index is good" as a hash-checked NUMBER
    instead of a ran-without-error row.

    Methods: ``exact`` (the float path joined against itself — a 1.0
    sanity row proving the recall arithmetic), ``int8`` (ranking
    fidelity of max-abs quantization), ``ivf`` (16 cells / 4 probes,
    deterministic first-N centroids), ``lsh`` (4 seeded
    random-projection tables, bucket width 0.5 — added late in round
    8 when the native seeded form replaced MLlib and made the path
    restatable), ``pq`` (16 subspaces × 64 codes; the oracle restates
    the ENTIRE training pipeline — quantile-stratified seeding, three
    unrolled Lloyd rounds with round-9 means/distances, corpus encode,
    ADC scoring — in SQL, so the codebook itself is hash-anchored, not
    just the final ranking), and — round 10 — ``ivfpq`` (the FAISS
    IndexIVFPQ composite: the ivf row's refine-0 cells at probe 6,
    ADC-scored over the pq row's trained codes; its oracle CTEs SHARE
    cellrank/inv and cenc/books3/qsub with the parent rows, so the
    composite can't drift from its parts). Each is independently
    recomputed by the DuckDB oracle — possible precisely because these
    paths are deterministic arithmetic; the classic ANN trio (LSH
    buckets / IVF cells / PQ codes) AND their deployed composite are
    recall-measured in one hash-checked relation.

    Scale note: recall evaluation IS a production operator (you run it
    on a sample after every index build); its cost here is three top-k
    sweeps + k-sized joins, all on the broadcast-query plan. Each
    sweep uses the CHEAPEST semantically-identical variant: the
    map-side-pruned plan for BOTH the exact reference set and the int8
    sweep (tie-rule-equal to the window plan — tests/
    test_text_operators.py
    ``test_mapside_topk_matches_window_with_boundary_ties``; on int8
    vectors the integer dot products make numpy and fold arithmetic
    engine-exact), over the pre-quantized stored int8 table (identical
    integer arithmetic to on-the-fly quantization, minus the per-run
    quantize+widen cost) — recall numbers are bit-identical to the
    expensive forms, and the oracle recomputes both independently.

    Round-9 restructure (VERDICT r8 task 3): one cached slim
    (vec_id, double-vector) projection feeds exact/ivf/lsh/pq; all
    five candidate sets are scored against the cached exact ranking in
    a single union job anchored on a 5-row method relation; the PQ
    codebook collect is memoized per stored-index fingerprint; lsh
    skips its redundant width-probe job via ``assume_dim``. Hash
    unchanged (same oracle); measured ≥1.5× faster at sf0.1.
    """
    # Shared slim projection, cached ONCE (round 9, VERDICT r8 task 3):
    # exact, ivf, and lsh all consume (vec_id, double-cast embedding) —
    # without the persist each method re-scans the parquet and re-casts.
    e = persist_bounded(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", to_double(F.col("embedding")).alias("embedding")
        )
    )
    q = e.filter(F.col("vec_id") % 100 == 0)

    # Index-construction jobs run CONCURRENTLY (round 9): each builder
    # below fires 1-2 small eager driver jobs (query-side collects, IVF
    # centroid training, the PQ codes read) that are mutually
    # independent — Spark's scheduler accepts jobs from multiple driver
    # threads by design, so their fixed latencies overlap instead of
    # summing (measured ~1.5 s → ~0.6 s of construction at sf0.1). The
    # returned plans are unchanged; only WHEN the builders' eager jobs
    # run moves. The slim projection is materialized eagerly first so
    # the threads read the cache instead of racing to fill it.
    from concurrent.futures import ThreadPoolExecutor

    e.count()

    def build_exact() -> DataFrame:
        return persist_bounded(
            topk_cosine_mapside(
                e, q, id_col="vec_id", vec_col="embedding", k=10
            ).select("query_id", "neighbor_id"),
            stack=True,
        )

    def build_int8() -> DataFrame:
        e8 = _int8_embeddings(spark, sf_dir)
        q8 = e8.filter(F.col("vec_id") % 100 == 0)
        # map-side-pruned plan for the int8 sweep too (round 9):
        # tie-rule-equal to the window form (the boundary-ties test),
        # and on int8 vectors even the SCORES are engine-exact —
        # integer dot products and norms are exact in double, so numpy
        # matmul == sequential fold bit-for-bit, with none of the
        # window plan's full-pair shuffle
        return topk_cosine_mapside(
            e8, q8, id_col="vec_id", vec_col="embedding", k=10
        )

    def build_ivf() -> DataFrame:
        return ivf_topk_cosine(
            e, q, id_col="vec_id", vec_col="embedding", k=10,
            n_cells=_IVF_CELLS, n_probe=_IVF_PROBE, dim=_EMB_DIM,
        )

    def build_lsh() -> DataFrame:
        # broadcast-query mapside twin (round 9): no probe job, no
        # bucket-UDF exchange — one Python pass over the cached slim
        # projection (byte-identical to the join form, same oracle)
        return lsh_topk_cosine_mapside(
            e, q, id_col="vec_id", vec_col="embedding", k=10, seed=42
        )

    def build_pq() -> DataFrame:
        # stored-index variant: identical output to the freshly-trained
        # path (the pipeline is deterministic; `sim_topk_pq_stored` is
        # hash-checked against the same SQL restatement), minus the
        # per-run train+encode cost — the int8 row's pre-quantized-
        # table doctrine applied to PQ; shares the cached projection
        # for its query-side collect
        return _pq_stored_topk(spark, sf_dir, e=e, ordered=False)

    def build_ivfpq() -> DataFrame:
        # the composite row (round 10): same refine-0 cells as the ivf
        # row, and the SAME codebooks as the pq row served from the
        # stored index's memoized collect (identical training recipe
        # over identical source ⇒ identical books; a fresh
        # train_pq_codebooks here measured +1.4 s of pure re-training).
        # Only the joint (cell, codes) encode pass and the masked ADC
        # sweep run per call, both over the cached slim projection.
        from ..operators.similarity import (
            encode_ivfpq,
            ivfpq_adc_topk,
            train_ivf_centroids,
        )

        _, books = _stored_pq_index(spark, sf_dir, e)
        cent = train_ivf_centroids(
            e, id_col="vec_id", vec_col="embedding",
            n_cells=_IVF_CELLS, refine_iterations=0, dim=_EMB_DIM,
        )
        if books is None or cent is None:
            return spark.createDataFrame(
                [], "query_id long, neighbor_id long, cos_sim double, rank int"
            )
        index = encode_ivfpq(e, books, cent, id_col="vec_id", vec_col="embedding")
        return ivfpq_adc_topk(
            index, books, cent, q, id_col="vec_id", vec_col="embedding",
            k=10, n_probe=_IVFPQ_PROBE,
        )

    with ThreadPoolExecutor(max_workers=6) as pool:
        futures = [
            pool.submit(b)
            for b in (
                build_exact, build_int8, build_ivf, build_lsh, build_pq,
                build_ivfpq,
            )
        ]
        exact_pairs, int8, ivf, lsh, pq, ivfpq = [f.result() for f in futures]
    n_q = exact_pairs.agg(F.countDistinct("query_id").alias("n_q"))

    # One union job scores every method against the single cached exact
    # ranking (previously: five independent semi-join→agg→crossJoin
    # subtrees). The 5-row method anchor keeps zero-candidate methods
    # present with recall 0.0, mirroring the oracle's VALUES anchor.
    def pairs(method: str, ann: DataFrame) -> DataFrame:
        return ann.select(
            F.lit(method).alias("method"), "query_id", "neighbor_id"
        )

    all_pairs = (
        pairs("exact", exact_pairs)
        .unionByName(pairs("int8", int8))
        .unionByName(pairs("ivf", ivf))
        .unionByName(pairs("ivfpq", ivfpq))
        .unionByName(pairs("lsh", lsh))
        .unionByName(pairs("pq", pq))
    )
    matched = (
        all_pairs.join(exact_pairs, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("method")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    methods = spark.createDataFrame(
        [("exact",), ("int8",), ("ivf",), ("ivfpq",), ("lsh",), ("pq",)],
        "method string",
    )
    return (
        methods.join(matched, "method", "left")
        .crossJoin(n_q)
        .select(
            "method",
            F.col("n_q").alias("n_queries"),
            F.round(
                F.coalesce(F.col("n_matched"), F.lit(0)) / (10.0 * F.col("n_q")), 4
            ).alias("avg_recall_at_10"),
        )
    )


# SQL restatement of the FULL ivf_topk_cosine pipeline
# (operators/similarity.py:673-) — the PQ-oracle treatment applied to
# the second ANN family (VERDICT r7 task 2). Deterministic end to end,
# so DuckDB can recompute it: centroid seeds are the first 16 corpus
# vectors by id (unit-normalized); each Lloyd round assigns every
# corpus vector to its nearest centroid by cell AFFINITY rounded to 9
# decimals (ties → lowest cell index — the same
# determinism-over-last-ulp contract as PQ's round-9 distances), then
# recomputes centroids as the per-(cell, component) RAW-vector mean
# rounded to 9, renormalized (empty / zero-norm cells keep their
# previous centroid); corpus rows live in their rank-1 cell, queries
# probe their 4 nearest cells; final cosine is the UNROUNDED exact
# expression over raw vectors (identical to _TOPK_COSINE_ORACLE's),
# ranked (cos DESC, neighbor_id), k=10.


def _ivf_lloyd_round_sql(i: int) -> str:
    """One Lloyd round as DuckDB CTEs: assign under cent{i-1} → cent{i}."""
    prev = f"cent{i - 1}"
    return f"""\
aff{i} AS (
  SELECT vv.vec_id, c.cell,
         row_number() OVER (PARTITION BY vv.vec_id
             ORDER BY round(list_dot_product(vv.u, c.cu), 9) DESC,
                      c.cell ASC) AS crk
  FROM vrows vv CROSS JOIN {prev} c
),
sums{i} AS (
  SELECT a.cell, p.pos, sum(vv.v[p.pos + 1]) AS s, count(*) AS n
  FROM (SELECT vec_id, cell FROM aff{i} WHERE crk = 1) a
  JOIN vrows vv USING (vec_id)
  CROSS JOIN (SELECT unnest(range(64)) AS pos) p
  GROUP BY a.cell, p.pos
),
cent{i} AS (
  SELECT c0.cell,
         CASE WHEN m.nrm > 0 THEN list_transform(m.mean, x -> x / m.nrm)
              ELSE c0.cu END AS cu
  FROM {prev} c0 LEFT JOIN (
    SELECT cell, mean, sqrt(list_dot_product(mean, mean)) AS nrm
    FROM (SELECT cell, list(round(s / n, 9) ORDER BY pos) AS mean
          FROM sums{i} GROUP BY cell)
  ) m USING (cell)
),
"""


def _ivf_topk_oracle(refine_iterations: int) -> str:
    """The full IVF ranking oracle with ``refine_iterations`` unrolled
    Lloyd rounds (0 = seed centroids as-is, matching
    `ivf_topk_cosine`'s default)."""
    rounds = "".join(
        _ivf_lloyd_round_sql(i) for i in range(1, refine_iterations + 1)
    )
    final = f"cent{refine_iterations}"
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
vrows AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
         list_transform(v, x -> x /
             (CASE WHEN sqrt(list_dot_product(v, v)) = 0
                   THEN 1.0 ELSE sqrt(list_dot_product(v, v)) END)) AS u
  FROM e WHERE v IS NOT NULL AND len(v) = {_EMB_DIM}
),
cent0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS cell,
         list_transform(v, x -> x /
             (CASE WHEN sqrt(list_dot_product(v, v)) = 0
                   THEN 1.0 ELSE sqrt(list_dot_product(v, v)) END)) AS cu
  FROM (SELECT vec_id, v FROM e
        WHERE v IS NOT NULL AND len(v) = {_EMB_DIM}
        ORDER BY vec_id LIMIT {_IVF_CELLS})
),
{rounds}afff AS (
  SELECT vv.vec_id, c.cell,
         row_number() OVER (PARTITION BY vv.vec_id
             ORDER BY round(list_dot_product(vv.u, c.cu), 9) DESC,
                      c.cell ASC) AS crk
  FROM vrows vv CROSS JOIN {final} c
),
inv AS (SELECT vec_id AS neighbor_id, cell FROM afff WHERE crk = 1),
probes AS (SELECT vec_id AS query_id, cell FROM afff
           WHERE crk <= {_IVF_PROBE} AND vec_id % 100 = 0),
scored AS (
  SELECT p.query_id, i.neighbor_id,
         list_dot_product(qq.v, nn.v) / (qq.nrm * nn.nrm) AS c
  FROM probes p JOIN inv i USING (cell)
  JOIN vrows qq ON qq.vec_id = p.query_id
  JOIN vrows nn ON nn.vec_id = i.neighbor_id
  WHERE i.neighbor_id != p.query_id
)
SELECT query_id, neighbor_id, ROUND(c, 6) AS cos_sim,
       ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY c DESC, neighbor_id) AS rank
FROM scored
QUALIFY rank <= 10
"""


_IVF_TOPK_ORACLE = _ivf_topk_oracle(0)
_IVF_KMEANS_TOPK_ORACLE = _ivf_topk_oracle(2)


@_register("sim_topk_ivf", _IVF_TOPK_ORACLE)
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 cosine neighbors via an IVF index: corpus
    vectors bucketed by nearest coarse centroid, queries probe their 4
    nearest of 16 cells. The partition-prune ANN path — at scale the
    cell id becomes the storage bucketing key and a probe touches
    n_probe/n_cells of the corpus. Deterministic (fixed centroid
    choice + round-9 cell affinities), so since round 8 the DuckDB
    oracle restates seed → assign → probe → score in SQL and
    hash-checks the full ranking (the PQ-oracle treatment); recall < 1
    vs the exact twin `sim_topk_cosine` is measured by
    `sim_recall_report`'s hash-checked ivf row.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return ivf_topk_cosine(
        e, q, id_col="vec_id", vec_col="embedding", k=10,
        n_cells=_IVF_CELLS, n_probe=_IVF_PROBE, dim=_EMB_DIM,
    ).orderBy("query_id", "rank")


@_register("sim_topk_ivf_kmeans", _IVF_KMEANS_TOPK_ORACLE)
def sim_topk_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sim_topk_ivf` with two Lloyd (k-means) refinement rounds before
    indexing — the index-quality/build-cost axis of ANN: each round is
    one assignment pass + one (cell, dim) partial-agg shuffle, and the
    refined centroids balance cell occupancy so probes waste less work
    on oversized cells. Deterministic (round-9 centroid means and cell
    affinities, empty cells keep their previous centroid), so the
    DuckDB oracle unrolls BOTH Lloyd rounds in SQL and hash-checks the
    full ranking — training included, like `sim_topk_pq`'s oracle.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return ivf_topk_cosine(
        e, q, id_col="vec_id", vec_col="embedding", k=10,
        n_cells=_IVF_CELLS, n_probe=_IVF_PROBE, refine_iterations=2,
        dim=_EMB_DIM,
    ).orderBy("query_id", "rank")


# Persisted-centroid memo, _PQ_BOOKS_MEMO-style: keyed on (dest dir,
# sidecar fingerprint) so a rebuilt index re-collects; bounded to one
# live index per process. A stale source re-keys, so a stale centroid
# matrix is never served.
_IVF_CENT_MEMO: dict[tuple[str, str], object] = {}


@_register("sim_topk_ivf_stored", _IVF_KMEANS_TOPK_ORACLE)
def sim_topk_ivf_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sim_topk_ivf_kmeans` scored from a STORED index: the coarse
    quantizer is trained (2 Lloyd rounds) ONCE per sf_dir (cached,
    fingerprint-refreshed) and persisted as two parquet tables —
    centroids (≤16 rows of (cell, unit vector)) and the inverted file
    (neighbor_id, vec, nrm) PARTITIONED BY cell — and each query batch
    runs pure :func:`ivf_search` over them. This is how IVF is
    actually deployed (FAISS/Milvus separate `train`+`add` at ingest
    from `search` at query time), and the cell-partitioned layout is
    the 100 TB story made literal: a probe of n_probe/n_cells cells
    reads only those hive partitions — storage-level pruning for
    vector search, the vector twin of `scan_partition_pruned`. The
    per-call Lloyd training (2 assignment passes + 2 (cell, dim)
    partial-agg shuffles + 3 driver collects) disappears from the
    query path — measured 1.81 s → 0.98 s min-of-3 at sf0.1
    (VERDICT r9 task 3: the training collect was the reproducing
    regression suspect).

    Same oracle as `sim_topk_ivf_kmeans`: the stored index is the
    deterministic function of the raw table that the SQL restates
    (seed → 2 unrolled Lloyd rounds → assign → probe → rank), so the
    DuckDB recomputation from raw embeddings must hash-match the
    stored-index scoring exactly — which simultaneously proves the
    centroid and inverted-file parquet round-tripped losslessly.
    """
    import pathlib

    import numpy as np

    from ..operators.similarity import train_ivf_centroids

    e = load_table(spark, sf_dir, "embeddings")

    def build(tmp: str) -> None:
        cent = train_ivf_centroids(
            e, id_col="vec_id", vec_col="embedding",
            n_cells=_IVF_CELLS, refine_iterations=2, dim=_EMB_DIM,
        )
        if cent is None:  # no valid vectors: install an EMPTY index
            spark.createDataFrame(
                [], "cell int, cu array<double>"
            ).write.mode("overwrite").parquet(tmp + "/centroids")
            spark.createDataFrame(
                [], "neighbor_id long, vec array<double>, nrm double, cell int"
            ).write.mode("overwrite").parquet(tmp + "/inv")
            pathlib.Path(tmp, "_SUCCESS").touch()
            return
        spark.createDataFrame(
            [(i + 1, [float(x) for x in cent[i]]) for i in range(cent.shape[0])],
            "cell int, cu array<double>",
        ).write.mode("overwrite").parquet(tmp + "/centroids")
        (
            ivf_assign(
                e, cent, id_col="vec_id", vec_col="embedding",
                out_id="neighbor_id", keep_vec="__cv", top_cells=1,
            )
            .select(
                "neighbor_id",
                F.col("__cv").alias("vec"),
                F.col("__cv_n").alias("nrm"),
                F.col("__cell").alias("cell"),
            )
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(tmp + "/inv")
        )
        # two sub-tables → the per-table markers live one level down;
        # surface the install-complete marker where the cache expects it
        pathlib.Path(tmp, "_SUCCESS").touch()

    # INDEX parameters are baked into the cache NAME (cells × refine
    # rounds), like the PQ cache — changing them can never serve a
    # stale index trained under the old config. n_probe is a
    # SEARCH-time knob (it shapes the probe join, not the persisted
    # centroids/inverted file), so it stays out of the name: widening
    # the probe must not rebuild an identical index.
    dest = cached_materialization(
        pathlib.Path(sf_dir) / "embeddings.parquet",
        f"embeddings_ivf{_IVF_CELLS}r2",
        build,
    )
    memo_key = (dest, pathlib.Path(dest, "_SRC_FINGERPRINT.json").read_text())
    cent = _IVF_CENT_MEMO.get(memo_key)
    if cent is None:
        rows = spark.read.parquet(f"{dest}/centroids").collect()  # ≤16 rows
        if not rows:  # empty index → the contract's empty schema
            return spark.createDataFrame(
                [], "query_id long, neighbor_id long, cos_sim double, rank int"
            )
        cent = np.empty((len(rows), len(rows[0]["cu"])), dtype=np.float64)
        for r in rows:
            cent[r["cell"] - 1] = r["cu"]
        _IVF_CENT_MEMO.clear()  # bound: one live index per process
        _IVF_CENT_MEMO[memo_key] = cent
    inv = spark.read.parquet(f"{dest}/inv").select(
        "neighbor_id",
        F.col("vec").alias("__cv"),
        F.col("nrm").alias("__cv_n"),
        F.col("cell").alias("__cell"),
    )
    q = e.filter(F.col("vec_id") % 100 == 0)
    return ivf_search(
        inv, cent, q, id_col="vec_id", vec_col="embedding",
        k=10, n_probe=_IVF_PROBE,
    ).orderBy("query_id", "rank")


# The IVF-PQ composite oracle: the PQ CTE block (train -> encode ->
# query subvectors) plus the IVF coarse-assignment CTEs (seed
# centroids, refine 0), joined cell-first — candidates are the probe
# equi-join of each query's 6 nearest cells with the single-assignment
# inverted file, and ONLY those pairs are ADC-scored (sum of per-sub
# codeword dots, round-9 before rank). The unused pq_scored/pq_ranked/
# pq10 CTEs from the shared block are dead and pruned by the engine.
_IVFPQ_TOPK_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_PQ_SQL_CTES},
vrows AS (
  SELECT vec_id, v,
         list_transform(v, x -> x /
             (CASE WHEN sqrt(list_dot_product(v, v)) = 0
                   THEN 1.0 ELSE sqrt(list_dot_product(v, v)) END)) AS u
  FROM e WHERE v IS NOT NULL AND len(v) = {_EMB_DIM}
),
cent0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS cell,
         list_transform(v, x -> x /
             (CASE WHEN sqrt(list_dot_product(v, v)) = 0
                   THEN 1.0 ELSE sqrt(list_dot_product(v, v)) END)) AS cu
  FROM (SELECT vec_id, v FROM e
        WHERE v IS NOT NULL AND len(v) = {_EMB_DIM}
        ORDER BY vec_id LIMIT {_IVF_CELLS})
),
afff AS (
  SELECT vv.vec_id, c.cell,
         row_number() OVER (PARTITION BY vv.vec_id
             ORDER BY round(list_dot_product(vv.u, c.cu), 9) DESC,
                      c.cell ASC) AS crk
  FROM vrows vv CROSS JOIN cent0 c
),
inv AS (SELECT vec_id AS neighbor_id, cell FROM afff WHERE crk = 1),
probes AS (SELECT vec_id AS query_id, cell FROM afff
           WHERE crk <= {_IVFPQ_PROBE} AND vec_id % 100 = 0),
ivfpq_scored AS (
  SELECT p.query_id, i.neighbor_id,
         round(sum(list_dot_product(q.qv, b.sv)), 9) AS c
  FROM probes p
  JOIN inv i USING (cell)
  JOIN cenc cn ON cn.vec_id = i.neighbor_id
  JOIN books3 b ON b.sub = cn.sub AND b.code = cn.code
  JOIN qsub q ON q.query_id = p.query_id AND q.sub = cn.sub
  WHERE i.neighbor_id != p.query_id
  GROUP BY p.query_id, i.neighbor_id
)
SELECT query_id, neighbor_id, ROUND(c, 6) AS cos_sim,
       ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY c DESC, neighbor_id) AS rank
FROM ivfpq_scored
QUALIFY rank <= 10
"""


@_register("sim_topk_ivfpq", _IVFPQ_TOPK_ORACLE)
def sim_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composite ANN — FAISS's ``IndexIVFPQ``, the shape
    production vector stores actually deploy: the coarse quantizer
    prunes WHICH vectors get scored (each query probes its 6 of 16
    cells → ~n_probe/n_cells of the corpus), PQ prunes WHAT a scored
    candidate costs (16-byte codes instead of 256-byte floats, scored
    by LUT gather). This engine banks each saving separately
    (`sim_topk_ivf*`, `sim_topk_pq*`); this query composes them —
    train both quantizers, ONE joint encode pass emitting
    (id, codes, cell), search as masked ADC
    (`operators/similarity.py:ivfpq_topk`). Recall < 1 now comes from
    two independent sources (an unprobed true neighbor; quantization
    rank inversion) — they COMPOUND, which is why this query probes 6
    cells where plain IVF probes 4 (see `_IVFPQ_PROBE`; recall@10
    anchored ≥ 0.4 in tests/test_analytics_queries.py). The trade at
    100 TB: the probe reads n_probe/n_cells of a 16×-smaller relation.
    Fully oracle-checked like both parents: the DuckDB SQL restates
    IVF seeding + assignment, PQ training + encode, the probe join,
    and the ADC ranking, and must hash-match the full ranked output.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return ivfpq_topk(
        e, q, id_col="vec_id", vec_col="embedding", k=10,
        n_cells=_IVF_CELLS, n_probe=_IVFPQ_PROBE,
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# Corpus management: deterministic splits and samples
# ---------------------------------------------------------------------------

_TRAIN_VAL_ORACLE = """
SELECT doc_id,
       CASE WHEN substr(md5(doc_id::VARCHAR), 1, 2) < 'e6'
            THEN 'train' ELSE 'val' END AS split
FROM documents
"""


@_register("pipeline_train_val_split", _TRAIN_VAL_ORACLE)
def pipeline_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~90/10 train/val split by content-independent key
    hash — the split every training pipeline needs, done the way that
    survives re-runs and incremental ingest: membership is a pure
    function of doc_id (md5 prefix < 0xe6 ≈ 230/256 ≈ 90%), never of
    ordering, partitioning, or a random seed. Zero shuffle: one narrow
    projection; at 100 TB the split is a pushed-down filter on either
    side, not a materialized assignment table.
    """
    d = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return d.select(
        "doc_id",
        F.when(bucket < "e6", F.lit("train")).otherwise(F.lit("val")).alias("split"),
    )


_STRATIFIED_ORACLE = """
SELECT lang, doc_id
FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5(doc_id::VARCHAR), doc_id
         ) AS rn
  FROM documents
) ranked
WHERE rn % 10 = 1
"""


@_register("pipeline_stratified_sample", _STRATIFIED_ORACLE)
def pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 10% systematic sample: within each language stratum,
    order documents by a deterministic key hash and keep every 10th —
    exact per-stratum proportions (vs. the variance of Bernoulli
    `sampleBy`) and fully reproducible, so it oracle-checks exactly.

    Scale note: the window partitions by `lang`, a LOW-cardinality key
    — at 100 TB a hot language would funnel into one task. The scale
    variant swaps exactness of the per-stratum rank for the hash-bucket
    filter used in `pipeline_train_val_split` computed per-stratum
    (`md5 < quantile(lang)`), which is shuffle-free; this query keeps
    the rank form because it is the one with an exact oracle.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("lang", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") % 10 == 1)
        .select("lang", "doc_id")
    )


_INCREMENTAL_DEDUP_ORACLE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
s AS (SELECT doc_id, {_SQL_WORD_SHINGLES} AS sh FROM t WHERE len(t) >= 3),
dup AS (
  SELECT DISTINCT a.doc_id AS incoming
  FROM s a JOIN s b ON a.doc_id % 10 = 0 AND b.doc_id % 10 != 0
  WHERE {_SQL_JACCARD} >= 0.8
)
SELECT doc_id FROM documents
WHERE doc_id % 10 = 0 AND doc_id NOT IN (SELECT incoming FROM dup)
"""


@_register("pipeline_incremental_dedup", _INCREMENTAL_DEDUP_ORACLE)
def pipeline_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: keep only the incoming docs
    (doc_id % 10 = 0 stands in for today's batch) that have NO
    near-duplicate (word-3-gram Jaccard ≥ 0.8) in the existing base
    corpus — the query a training pipeline runs on every ingest, and a
    different join shape from `pipeline_corpus_dedup`: an ASYMMETRIC
    probe-vs-index LSH join (operators.text
    minhash_candidate_pairs_between) that never touches the base×base
    quadrant, followed by exact verification and an anti join.

    At 100 TB the base band relation is a persisted index computed once
    per corpus version; per-batch cost is |batch| signatures + the
    bucket join. Banding recall on this corpus's planted dups (J ≥ 0.9)
    is ≈1, so the oracle is the exact brute force.
    """
    from ..operators.text import minhash_candidate_pairs_between

    d = load_table(spark, sf_dir, "documents")
    ex = _persist_bounded(shingle_elements(d, "doc_id", "text", n=3))
    is_incoming = F.col("doc_id") % 10 == 0
    cands = minhash_candidate_pairs_between(
        ex.filter(is_incoming), ex.filter(~is_incoming), "doc_id"
    )
    dup_pairs = jaccard_verify_elements(cands, ex, "doc_id", threshold=0.8)
    incoming = d.filter(is_incoming).select("doc_id")
    return incoming.join(
        dup_pairs.select(F.col("doc_id_a").alias("doc_id")),
        "doc_id",
        "left_anti",
    )


_WINNOW_ORACLE = """
WITH g AS (
  SELECT doc_id,
         [substr(md5(substr(text, i, 8)), 1, 8)
          for i in range(1, length(text) - 6)] AS h
  FROM documents WHERE length(text) >= 8
)
SELECT DISTINCT doc_id, fp AS fingerprint
FROM (
  SELECT doc_id,
         unnest([list_min(h[i:i+3]) for i in range(1, len(h) - 2)]) AS fp
  FROM g WHERE len(h) >= 4
)
"""


@_register("text_winnow_fingerprint", _WINNOW_ORACLE)
def text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprints per document: k=8 char-gram md5
    prefixes, window w=4 minima, distinct survivors — the
    guaranteed-local-sampling fingerprint family next to the
    probabilistic ones (MinHash/SimHash), fully oracle-checked because
    md5 is computable in both engines. Shared substrings ≥ 11 chars
    always collide on ≥ 1 fingerprint, so a fingerprint equi-join is a
    plagiarism/quote detector with NO recall loss at that granularity.

    Round 9: runs the Arrow memoized twin (`winnow_fingerprints_arrow`)
    — byte-identical fingerprints, each distinct gram md5-hashed once
    per partition instead of once per occurrence (measured 3.15 s →
    1.22 s at sf0.1; VERDICT r8 task 4). Same oracle.
    """
    from ..operators.text import winnow_fingerprints_arrow

    d = load_table(spark, sf_dir, "documents")
    return winnow_fingerprints_arrow(d, "doc_id", "text", k=8, w=4)


_SPAN_DUP_ORACLE = """
WITH g AS (
  SELECT doc_id,
         [substr(md5(substr(text, i, 8)), 1, 8)
          for i in range(1, length(text) - 6)] AS h
  FROM documents WHERE length(text) >= 8
),
fp AS (
  SELECT DISTINCT doc_id, fpr
  FROM (
    SELECT doc_id,
           unnest([list_min(h[i:i+3]) for i in range(1, len(h) - 2)]) AS fpr
    FROM g WHERE len(h) >= 4
  )
),
c AS (SELECT doc_id, fpr, COUNT(*) OVER (PARTITION BY fpr) AS nd FROM fp)
SELECT doc_id,
       COUNT(*) AS n_fingerprints,
       COUNT(CASE WHEN nd >= 2 THEN 1 END) AS n_shared,
       ROUND(COUNT(CASE WHEN nd >= 2 THEN 1 END) / COUNT(*), 6) AS dup_fraction
FROM c GROUP BY doc_id
"""


@_register("dedup_span_duplication", _SPAN_DUP_ORACLE)
def dedup_span_duplication(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-SPAN fraction: of each doc's winnowing
    fingerprints (k=8, w=4 — every shared substring ≥ 11 chars is
    guaranteed to collide on ≥ 1 fingerprint), what share also appears
    in at least one OTHER document. The Spark-shaped counterpart of
    suffix-array substring dedup (Lee et al., "Deduplicating Training
    Data Makes Language Models Better", ACL'22): rank docs by
    cross-corpus copied-text fraction, then gate or strip the worst —
    finer-grained than whole-doc near-dup (MinHash/Jaccard find
    mostly-identical DOCS; this finds boilerplate and quoted SPANS
    inside otherwise-distinct docs). The reference's surface has no
    text analysis at all (650-line Kafka→HDFS relay,
    HadoopKafkaConsumer.java:1-650); this extends SURVEY §2.5's
    dedup family.

    Scale shape: the fingerprint relation is winnowed map-side (zero
    shuffle, see winnow_fingerprints), the sharing count is a window
    over fingerprint hash partitions (content-uniform md5 keys — no
    skew), and the per-doc rollup shuffles one row per (doc,
    fingerprint). Nothing is ever self-joined; cost is two bounded
    shuffles of the fingerprint relation.
    """
    from ..operators.text import winnow_fingerprints_arrow

    d = load_table(spark, sf_dir, "documents")
    fps = winnow_fingerprints_arrow(d, "doc_id", "text", k=8, w=4)
    shared = F.count(F.when(F.col("__nd") >= 2, 1))
    return (
        fps.withColumn(
            "__nd", F.count("*").over(Window.partitionBy("fingerprint"))
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_fingerprints"),
            shared.alias("n_shared"),
            F.round(shared.cast("double") / F.count("*"), 6).alias(
                "dup_fraction"
            ),
        )
    )


_SPAN_DEDUP_ORACLE = """
WITH g AS (
  SELECT doc_id,
         [substr(md5(substr(text, i, 8)), 1, 8)
          for i in range(1, length(text) - 6)] AS h
  FROM documents WHERE length(text) >= 8
),
win AS (
  SELECT doc_id,
         [{'j': i, 'fp': list_min(h[i:i+3])}
          for i in range(1, len(h) - 2)] AS wins
  FROM g WHERE len(h) >= 4
),
wx AS (
  SELECT doc_id, u.j AS j, u.fp AS fp
  FROM (SELECT doc_id, unnest(wins) AS u FROM win)
),
shared AS (
  SELECT fp FROM (SELECT DISTINCT doc_id, fp FROM wx)
  GROUP BY fp HAVING COUNT(*) >= 2
),
covered AS (
  SELECT DISTINCT w.doc_id, w.j + o.off AS p
  FROM (SELECT wx.doc_id, wx.j FROM wx JOIN shared USING (fp)) w,
       (SELECT unnest(range(0, 11)) AS off) o
),
chars AS (
  SELECT doc_id, p, substr(text, p::INT, 1) AS ch
  FROM (SELECT doc_id, text,
               unnest(range(1, length(text) + 1)) AS p
        FROM documents)
),
kept AS (
  SELECT c.doc_id,
         COALESCE(string_agg(c.ch, '' ORDER BY c.p), '') AS clean_text
  FROM chars c ANTI JOIN covered v ON c.doc_id = v.doc_id AND c.p = v.p
  GROUP BY c.doc_id
)
SELECT d.doc_id,
       COALESCE(k.clean_text, '') AS clean_text,
       (length(d.text) - length(COALESCE(k.clean_text, '')))::BIGINT
         AS n_cut
FROM documents d LEFT JOIN kept k USING (doc_id)
"""


@_register("pipeline_span_dedup", _SPAN_DEDUP_ORACLE)
def pipeline_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUBSTRING-DEDUP SPAN REMOVAL (round 14, VERDICT r13 task 8 —
    the ACTION `dedup_span_duplication` only ranks): every character
    covered by a winnow window (k=8, w=4) whose fingerprint appears in
    ≥ 2 distinct documents is cut, and the document is re-emitted with
    the surviving characters joined in order — RefinedWeb / Lee et
    al. ACL'22's "remove the duplicated span, keep the document". The
    full CLEANED TEXT is hash-gated: DuckDB restates winnowing, the
    shared-fingerprint set, and the cut by the CHAR-COVERAGE rule
    directly — explode every covered position, anti-join the
    character sequence, reassemble with an ordered string_agg — so
    every span boundary must match to the character. (The oracle
    deliberately avoids DuckDB lambdas here: a list_reduce whose
    lambda referenced the outer text column returned row-misaligned
    results under the harness connection — the relational restatement
    is engine-bug-proof, and at oracle scale the char explosion is
    cheap. Spark keeps the O(dup-windows) fold.)

    Scale: winnowing is map-side, the shared-fp set is one
    md5-key-uniform shuffle, and the cut is an O(dup windows) per-doc
    fold — no per-character explosion anywhere (the formulation a
    100 TB corpus requires; see `excise_duplicated_spans`). The window
    relation is the GROUPED Arrow memoized winnow twin (r14 —
    equivalence-tested against the flat/expression forms), consumed
    twice (shared-fp set + dup starts) as parallel recompute passes of
    one job; the cheap Arrow winnow made recompute faster than the
    cache-fill + job barrier a persist costs (the expression-md5 form
    this replaced was the opposite trade). Idempotence on the corpus
    (a second pass cuts ~nothing) is pinned in
    tests/test_text_operators.py.
    """
    from ..operators.text import (
        excise_duplicated_spans,
        winnow_window_groups_arrow,
    )

    d = load_table(spark, sf_dir, "documents")
    # r14: the GROUPED window relation — one row per (doc, fp) with the
    # starts array, built in the Arrow worker. ~2.5× fewer rows cross
    # the Python boundary and the shared-fp distinct() pass disappears
    # (plan: 1 Exchange less; see OPTIMIZATION_r14.md). Deliberately
    # NOT persisted: the two consumers' winnow passes run as parallel
    # stages of one job, and the A/B measured recompute FASTER than
    # cache-fill + barrier (3.0 s vs 3.6 s at sf0.1) — at 100 TB the
    # same trade holds (two streaming corpus passes vs materializing a
    # corpus-sized intermediate to memory/disk).
    wins = winnow_window_groups_arrow(d, "doc_id", "text", k=8, w=4)
    return excise_duplicated_spans(
        d, "doc_id", "text", k=8, w=4, win_groups=wins, cut="arrow"
    )


_ZIPF_ORACLE = f"""
WITH tok AS (SELECT lang, unnest({_SQL_TOKENS}) AS token FROM documents),
cnt AS (SELECT lang, token, COUNT(*) AS c FROM tok GROUP BY lang, token),
ranked AS (
  SELECT lang, c,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, token) AS r
  FROM cnt
)
SELECT lang, COUNT(*) AS n_types,
       ROUND(regr_slope(ln(c), ln(r)), 6) AS zipf_slope
FROM ranked GROUP BY lang
"""


@_register("text_zipf_slope", _ZIPF_ORACLE)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit per language: regression slope of log(frequency)
    on log(rank) over the token frequency table (natural text ≈ −1;
    templated/boilerplate corpora flatten toward 0, a corpus-health
    number next to text_quality_score's per-doc gates). Exercises the
    regr_* aggregate family (Spark ≥ 3.4 and DuckDB share the
    definition) — covered nowhere else in the registry.

    Scale shape: wordcount (map-side partial agg, shuffle of |vocab|
    rows keyed by (lang, token)), rank window partitioned BY LANGUAGE
    (each partition sorts one language's vocabulary — bounded by
    |vocab|, not |corpus|), single-row-per-lang regression aggregate.
    Slope rounded to 6 decimals so cross-engine float-sum ordering in
    the covariance sums can't leak into the hash.
    """
    d = load_table(spark, sf_dir, "documents")
    cnt = (
        d.select("lang", F.explode(whitespace_tokens(F.col("text"))).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("c").desc(), F.col("token"))
    return (
        cnt.withColumn("r", F.row_number().over(w))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_types"),
            F.round(
                F.regr_slope(F.log(F.col("c")), F.log(F.col("r"))), 6
            ).alias("zipf_slope"),
        )
    )


_CONTAINMENT_ORACLE = f"""
WITH s AS (
  SELECT doc_id, {_SQL_WORD_SHINGLES} AS sh
  FROM (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents)
  WHERE len(t) >= 3
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       ROUND(len(list_intersect(a.sh, b.sh))::DOUBLE
             / least(len(a.sh), len(b.sh))::DOUBLE, 6) AS containment
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
      / least(len(a.sh), len(b.sh))::DOUBLE >= 0.9
"""


@_register("dedup_containment", _CONTAINMENT_ORACLE)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-CONTAINMENT near-dup pairs: overlap coefficient
    |A∩B| / min(|A|,|B|) ≥ 0.9 over word-3-gram shingles — the dedup
    predicate Jaccard structurally misses: a paragraph pasted whole
    into a much longer document has containment ≈ 1 but Jaccard
    ≈ |A|/|B| → 0, so no Jaccard threshold finds it. Quote/boilerplate
    inclusion is the dominant dup mode in scraped training corpora
    (the doc-level complement of `dedup_span_duplication`'s span
    ranking). The reference has no text analysis (650-line Kafka→HDFS
    relay, HadoopKafkaConsumer.java); this extends SURVEY §2.5 dedup.

    Exact recall via the ASYMMETRIC prefix filter (probe-prefix ×
    full-index, smaller→larger orientation — see
    containment_candidate_pairs): unlike MinHash-LSH there is no
    probabilistic miss, so the brute-force DuckDB oracle must match
    hash-exactly. Scale shape: shuffle keyed on rare-shingle hashes,
    verification touches only candidates, nothing all-pairs.
    """
    d = load_table(spark, sf_dir, "documents")
    ex = _persist_bounded(shingle_elements(d, "doc_id", "text", n=3))
    cands = containment_candidate_pairs(ex, "doc_id", threshold=0.9)
    return overlap_verify_elements(cands, ex, "doc_id", threshold=0.9)


_OUTLIER_ORACLE = """
WITH med AS (
  SELECT lang, median(n_chars)::DOUBLE AS med
  FROM documents GROUP BY lang
),
dev AS (
  SELECT d.doc_id, d.lang, d.n_chars, abs(d.n_chars - m.med) AS adev, m.med
  FROM documents d JOIN med m USING (lang)
),
mad AS (SELECT lang, median(adev)::DOUBLE AS mad FROM dev GROUP BY lang)
SELECT v.doc_id, v.lang, v.n_chars,
       ROUND((v.n_chars - v.med) / NULLIF(x.mad, 0), 6) AS mad_score
FROM dev v JOIN mad x USING (lang)
WHERE abs(v.n_chars - v.med) > 2 * x.mad
"""


@_register("pipeline_outlier_filter", _OUTLIER_ORACLE)
def pipeline_outlier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-language length-outlier gate: flag documents whose
    |n_chars − median| exceeds 2 MAD (median absolute deviation) for
    their language — the standard robust alternative to mean/stddev
    z-scores (one pathological 100 MB doc drags a mean, not a
    median). Truncation-artifact and concatenation-blob detection is a
    stock corpus-hygiene gate next to `pipeline_quality_filter`'s
    content heuristics. (k=2 rather than the textbook 3 because the
    fixture's length distribution is tight — max |dev|/MAD ≈ 2.4-3.0
    across SFs; a 3-MAD gate would be an always-empty no-op query.)

    Scale shape and the MAD=0 degenerate contract: see
    operators.stats.mad_outliers (two |langs|-row aggregates broadcast
    back; the corpus is only ever scanned narrowly).
    """
    from ..operators.stats import mad_outliers

    d = load_table(spark, sf_dir, "documents")
    return mad_outliers(
        d.select("doc_id", "lang", "n_chars"),
        group_col="lang",
        value_col="n_chars",
        k=2.0,
    ).select("doc_id", "lang", "n_chars", "mad_score")


_WEIGHTED_SAMPLE_ORACLE = """
SELECT doc_id, lang,
       ROUND(least(1.0, n_chars / 400.0), 6) AS keep_prob
FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT / 65536.0
      < least(1.0, n_chars / 400.0)
"""


@_register("pipeline_weighted_sample", _WEIGHTED_SAMPLE_ORACLE)
def pipeline_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED document sampling: keep each doc with
    probability proportional to a quality weight (here length-derived,
    capped at 1) — the "sample 10% but prefer substantive documents"
    step of corpus assembly, done re-run-stably: membership is a pure
    function of doc_id (md5-prefix uniform vs the weight), never of
    partitioning, ordering, or an RNG seed, so incremental ingest and
    retries keep/drop the SAME documents (the property
    `pipeline_train_val_split` establishes for unweighted splits).

    Scale shape: one narrow projection+filter, zero shuffle,
    embarrassingly parallel; the weight needs no global statistics
    (contrast `pipeline_mix_languages`, which broadcasts per-group
    rates). `F.sample` cannot express per-row probabilities and is
    partition-layout-dependent; rand(seed) is re-run-unstable under
    repartitioning — the hash-uniform is the production answer.
    """
    d = load_table(spark, sf_dir, "documents")
    frac = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("bigint") / F.lit(65536.0)
    )
    keep_prob = F.least(F.lit(1.0), F.col("n_chars") / F.lit(400.0))
    return (
        d.filter(frac < keep_prob)
        .select("doc_id", "lang", F.round(keep_prob, 6).alias("keep_prob"))
    )


# The fixture corpus contains no PII (no digits at all), so the scrub
# query PLANTS deterministic markers derived from doc_id before
# scrubbing — same trade as dedup_embedding_cosine's lowered
# threshold: exercise the operator for real on data that lacks the
# phenomenon. Both engines build byte-identical input, so detection
# counts and the md5 of the scrubbed text are hash-comparable.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_PII_SCRUB_ORACLE = rf"""
WITH planted AS (
  SELECT doc_id,
         text || ' contact doc' || CAST(doc_id AS VARCHAR)
              || '@example.com from 10.0.'
              || CAST(doc_id % 256 AS VARCHAR) || '.7' AS t
  FROM documents
),
scrubbed AS (
  SELECT doc_id,
         len(regexp_extract_all(t, '{_PII_EMAIL}')) AS n_emails,
         regexp_replace(t, '{_PII_EMAIL}', '[EMAIL]', 'g') AS t1
  FROM planted
)
SELECT doc_id, n_emails,
       len(regexp_extract_all(t1, '{_PII_IPV4}')) AS n_ips,
       md5(regexp_replace(t1, '{_PII_IPV4}', '[IP]', 'g')) AS scrub_hash
FROM scrubbed
"""


@_register("pipeline_pii_scrub", _PII_SCRUB_ORACLE)
def pipeline_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction: count and replace email addresses
    and IPv4 literals with typed placeholders, emitting the scrubbed
    text's md5 so the oracle verifies the REDACTED BYTES, not just the
    counts. The mandatory compliance pass of any shipped training
    corpus; patterns are deliberately alternation-free so Java regex
    (leftmost-first) and RE2 (leftmost-longest) agree on every match.

    Scale shape: pure codegen string expressions (regexp_count /
    regexp_replace / md5), one narrow pass, zero shuffle — at 100 TB
    this runs at scan speed next to `pipeline_quality_filter` in the
    same stage. Emails scrub before IPs so placeholder text can't
    shift later match offsets across engines.
    """
    d = load_table(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact doc"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7"),
        ).alias("t"),
    )
    scrubbed = planted.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(_PII_EMAIL)).alias("n_emails"),
        F.regexp_replace(F.col("t"), _PII_EMAIL, "[EMAIL]").alias("t1"),
    )
    return scrubbed.select(
        "doc_id",
        "n_emails",
        F.regexp_count(F.col("t1"), F.lit(_PII_IPV4)).alias("n_ips"),
        F.md5(F.regexp_replace(F.col("t1"), _PII_IPV4, "[IP]")).alias(
            "scrub_hash"
        ),
    )


# Shared quality weight for the token-budget pair: type-token ratio
# (distinct tokens / tokens — templated boilerplate repeats itself, so
# low TTR ≈ low information density). Rounded to 6 decimals BEFORE
# ordering so cross-engine float noise can't reorder the greedy rank.
_SQL_TTR_TOK = f"""
  SELECT doc_id, lang, len(t) AS n_tokens,
         ROUND(len(list_distinct(t))::DOUBLE / len(t), 6) AS ttr
  FROM (SELECT doc_id, lang, {_SQL_TOKENS} AS t FROM documents)
  WHERE len(t) > 0
"""

_TOKEN_BUDGET_ORACLE = f"""
WITH tok AS ({_SQL_TTR_TOK}),
b AS (SELECT lang, 0.5 * SUM(n_tokens) AS budget FROM tok GROUP BY lang),
r AS (
  SELECT tok.*,
         SUM(n_tokens) OVER (
           PARTITION BY lang ORDER BY ttr DESC, doc_id
         ) AS cum
  FROM tok
)
SELECT doc_id, lang, n_tokens, ttr
FROM r JOIN b USING (lang)
WHERE cum <= budget
"""


def _ttr_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared (doc_id, lang, n_tokens, ttr) projection for the two
    token-budget twins — ONE definition, mirroring the oracle side's
    shared _SQL fragment, so the documented subset relationship between
    `pipeline_token_budget_select` and `pipeline_token_budget_threshold`
    cannot drift on tokenization or rounding."""
    d = load_table(spark, sf_dir, "documents")
    toks = whitespace_tokens(F.col("text"))
    return d.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
        ).alias("ttr"),
    ).filter(F.col("n_tokens") > 0)


@_register("pipeline_token_budget_select", _TOKEN_BUDGET_ORACLE)
def pipeline_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection, EXACT greedy form: per language,
    keep the highest-quality documents (quality = type-token ratio,
    ties → doc_id) until the running token count reaches the budget
    (here 50% of that language's tokens — scale-free, so the query
    means the same thing at every SF). "Give me the best N-token
    corpus" is the final assembly step of every training-data
    pipeline; this is its deterministic knapsack-greedy.

    Scale shape: like `pipeline_stratified_sample`, the rank-and-cumsum
    window is partitioned by a LOW-cardinality stratum (lang), so each
    partition sorts one language's documents — the documented limit for
    hot groups. The scale twin that never sorts the corpus is
    `pipeline_token_budget_threshold` (binned two-phase, same greedy
    direction); this exact form is its oracle-anchored reference.
    """
    tok = _ttr_tokens(spark, sf_dir)
    budget = tok.groupBy("lang").agg(
        (F.lit(0.5) * F.sum("n_tokens")).alias("__budget")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("ttr").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tok.withColumn("__cum", F.sum("n_tokens").over(w))
        .join(F.broadcast(budget), "lang")
        .filter(F.col("__cum") <= F.col("__budget"))
        .select("doc_id", "lang", "n_tokens", "ttr")
    )


_TOKEN_BUDGET_THRESHOLD_ORACLE = f"""
WITH tok AS ({_SQL_TTR_TOK}),
b AS (SELECT lang, 0.5 * SUM(n_tokens) AS budget FROM tok GROUP BY lang),
binned AS (
  SELECT lang, CAST(floor(ttr * 100) AS BIGINT) AS bin,
         SUM(n_tokens) AS bin_tokens
  FROM tok GROUP BY lang, bin
),
cum AS (
  SELECT lang, bin,
         SUM(bin_tokens) OVER (
           PARTITION BY lang ORDER BY bin DESC
         ) AS cum_tokens
  FROM binned
),
keep AS (
  SELECT lang, bin FROM cum JOIN b USING (lang)
  WHERE cum_tokens <= budget
)
SELECT t.doc_id, t.lang, t.n_tokens, t.ttr
FROM tok t JOIN keep k
  ON t.lang = k.lang AND CAST(floor(t.ttr * 100) AS BIGINT) = k.bin
"""


@_register("pipeline_token_budget_threshold", _TOKEN_BUDGET_THRESHOLD_ORACLE)
def pipeline_token_budget_threshold(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Token-budget corpus selection, BINNED two-phase form — the
    100 TB twin of `pipeline_token_budget_select` that never sorts the
    corpus: quantize quality to 101 bins (floor(ttr·100)), aggregate
    tokens per (lang, bin) — map-side partial agg collapsing to
    |langs|·101 rows — take the top-down cumulative sum over that TINY
    relation, keep every bin that fits entirely inside the budget, and
    BROADCAST the kept-bin set back as a semi-join. The corpus is
    scanned narrowly twice; no window or sort ever touches it. The
    trade (documented, deterministic) is budget UNDERSHOOT by at most
    one boundary bin's tokens — the standard histogram answer to
    weighted-quantile selection; tighten with narrower bins.
    """
    tok = _ttr_tokens(spark, sf_dir)
    tok = tok.withColumn("__bin", F.floor(F.col("ttr") * 100).cast("bigint"))
    budget = tok.groupBy("lang").agg(
        (F.lit(0.5) * F.sum("n_tokens")).alias("__budget")
    )
    binned = tok.groupBy("lang", "__bin").agg(
        F.sum("n_tokens").alias("__bin_tokens")
    )
    wbin = (
        Window.partitionBy("lang")
        .orderBy(F.col("__bin").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    keep = (
        binned.withColumn("__cum", F.sum("__bin_tokens").over(wbin))
        .join(F.broadcast(budget), "lang")
        .filter(F.col("__cum") <= F.col("__budget"))
        .select("lang", "__bin")
    )
    return tok.join(F.broadcast(keep), ["lang", "__bin"], "left_semi").select(
        "doc_id", "lang", "n_tokens", "ttr"
    )


# Bigram-LM surprisal CTE chain, shared by text_bigram_surprisal and
# pipeline_quality_buckets so the two oracles can never drift on
# tokenization, count semantics, or the -ln(c2/c1) expression.
_SQL_SURPRISAL_CTES = f"""
toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
g AS (
  SELECT doc_id,
         unnest([array_to_string(t[i:i+1], ' ') FOR i IN range(1, len(t))]) AS gram
  FROM toks WHERE len(t) >= 2
),
cb AS (SELECT gram, COUNT(*) AS c2 FROM g GROUP BY gram),
cw AS (SELECT string_split(gram, ' ')[1] AS w1, SUM(c2) AS c1 FROM cb GROUP BY w1),
scored AS (
  SELECT g.doc_id, -ln(cb.c2::DOUBLE / cw.c1::DOUBLE) AS s
  FROM g JOIN cb USING (gram)
         JOIN cw ON string_split(g.gram, ' ')[1] = cw.w1
)
"""

_BIGRAM_SURPRISAL_ORACLE = f"""
WITH {_SQL_SURPRISAL_CTES}
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(AVG(s), 6) AS avg_surprisal,
       ROUND(MAX(s), 6) AS max_surprisal
FROM scored GROUP BY doc_id
"""


@_register("text_bigram_surprisal", _BIGRAM_SURPRISAL_ORACLE)
def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document self-surprisal under the corpus's own bigram LM —
    the statistical quality score the heuristic gates
    (text_quality_score, text_repetition_stats) approximate: train
    P(w2|w1) = C(w1 w2)/C(w1·) by counting the corpus itself, then
    score each doc by its mean (and max) token surprisal −ln P. Low
    mean ⇒ templated/boilerplate text; high mean ⇒ rare-junk — both
    tails get gated before training (the CCNet/KenLM perplexity
    filter, Wenzek et al. 2020, with the corpus itself standing in
    for the external LM; swapping in a reference count table is the
    same join). No smoothing needed: every scored bigram has count
    ≥ 1 by construction. The reference has no text surface at all
    (650-line Kafka→HDFS relay, HadoopKafkaConsumer.java); this
    extends SURVEY §2.5's quality-scoring family.

    Scale shape: see ``operators.text.bigram_surprisal_scores`` — one
    vocab-sized wordcount shuffle, one gram-stream hash-join, one
    per-doc rollup. Both engines compute the identical −ln(c2/c1)
    expression so only ulp-level libm noise reaches the ROUND(·, 6).
    """
    from ..operators.text import bigram_surprisal_scores

    d = load_table(spark, sf_dir, "documents")
    return bigram_surprisal_scores(
        d, "doc_id", "text", persist=_persist_bounded
    )


_KEEP_BEST_ORACLE = f"""
WITH RECURSIVE
t AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
s AS (SELECT doc_id, {_SQL_WORD_SHINGLES} AS sh FROM t WHERE len(t) >= 3),
p AS (SELECT a.doc_id AS u, b.doc_id AS v
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE {_SQL_JACCARD} >= 0.8),
edges AS (SELECT u, v FROM p UNION ALL SELECT v, u FROM p),
reach(a, b) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u WHERE e.v != r.a
),
comp AS (
  SELECT d.doc_id,
         LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS label
  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
  GROUP BY d.doc_id
),
ranked AS (
  SELECT c.label, d.doc_id, d.n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY c.label ORDER BY d.n_chars DESC, d.doc_id
         ) AS rn
  FROM comp c JOIN documents d ON c.doc_id = d.doc_id
)
SELECT n_chars, doc_id, label AS cluster_id FROM ranked WHERE rn = 1
"""


@_register("pipeline_dedup_keep_best", _KEEP_BEST_ORACLE)
def pipeline_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus near-dedup keeping the BEST doc per duplicate cluster —
    what production pipelines actually keep (the longest / highest-
    quality variant), where `pipeline_corpus_dedup` keeps the min-id
    representative. Same scale-safe composition (MinHash-LSH pairs →
    exact Jaccard ≥ 0.8 verify → min-label connected components), then
    an argmax by (n_chars DESC, doc_id ASC) per component.

    The argmax is a lexicographic struct MAX — a map-side-combinable
    aggregate, NOT a row_number window — so a pathological mega-cluster
    (shared boilerplate collapsing millions of docs into one component)
    costs a partial-agg merge instead of a single-task sort; ties on
    n_chars break deterministically to the smallest doc_id via the
    negated-id struct field (Spark's max_by leaves ties arbitrary,
    SURVEY §7 hazard 1).
    """
    from ..operators.graph import connected_components_min_label

    d = load_table(spark, sf_dir, "documents")
    ex = _persist_bounded(shingle_elements(d, "doc_id", "text", n=3))
    cands = minhash_candidate_pairs(ex, "doc_id", num_hashes=16, rows_per_band=2)
    pairs = jaccard_verify_elements(cands, ex, "doc_id", threshold=0.8)
    labels = connected_components_min_label(
        d.select("doc_id"),
        pairs.select(
            F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst")
        ),
        id_col="doc_id",
    )
    joined = labels.join(
        d.select(F.col("doc_id").alias("node"), "n_chars"), "node"
    )
    best = joined.groupBy("label").agg(
        F.max(
            F.struct(F.col("n_chars"), (-F.col("node")).alias("__neg"))
        ).alias("__b")
    )
    return best.select(
        F.col("__b.n_chars").alias("n_chars"),
        (-F.col("__b.__neg")).alias("doc_id"),
        F.col("label").alias("cluster_id"),
    )


_QUALITY_BUCKETS_ORACLE = f"""
WITH {_SQL_SURPRISAL_CTES},
sc AS (SELECT doc_id, ROUND(AVG(s), 6) AS avg_surprisal
       FROM scored GROUP BY doc_id),
d AS (
  SELECT sc.doc_id, dd.lang, sc.avg_surprisal,
         CAST(floor(sc.avg_surprisal * 100) AS BIGINT) AS bin
  FROM sc JOIN documents dd ON sc.doc_id = dd.doc_id
),
hist AS (SELECT lang, bin, COUNT(*) AS c FROM d GROUP BY lang, bin),
cum AS (
  SELECT lang, bin,
         SUM(c) OVER (PARTITION BY lang ORDER BY bin) AS cumc
  FROM hist
),
tot AS (SELECT lang, COUNT(*) AS n FROM d GROUP BY lang),
buck AS (
  SELECT lang, bin,
         CASE WHEN cumc <= n / 3.0 THEN 'head'
              WHEN cumc <= 2 * n / 3.0 THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM cum JOIN tot USING (lang)
)
SELECT d.doc_id, d.lang, d.avg_surprisal, b.bucket
FROM d JOIN buck b ON d.lang = b.lang AND d.bin = b.bin
"""


@_register("pipeline_quality_buckets", _QUALITY_BUCKETS_ORACLE)
def pipeline_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail quality buckets per language
    (Wenzek et al. 2020: partition each language's corpus into
    perplexity terciles; train preferentially on the head). Scores
    come from the shared bigram-LM self-surprisal
    (`operators.text.bigram_surprisal_scores`); tercile boundaries are
    assigned at BIN granularity with the same histogram-quantile
    pattern as `pipeline_token_budget_threshold`: quantize the score
    to centinat bins (floor(avg_surprisal·100) over 6dp-rounded
    values, so both engines bin identically), build the tiny
    (lang, bin) histogram map-side, cumulative-sum over that ~100-row
    relation, and broadcast the bin→bucket map back. The corpus is
    never sorted and no window ever touches it; whole-bin assignment
    makes the tercile split deterministic (bin boundaries shift a
    bucket by at most one bin's docs — the documented histogram
    trade, same as the token-budget twin; tighten with finer bins).

    100 TB note: exact per-language percentile of a score column
    would buffer each language's scores in one aggregation buffer;
    the bin histogram is the mergeable, bounded-memory form of the
    same quantile question.
    """
    from ..operators.text import bigram_surprisal_scores

    d = load_table(spark, sf_dir, "documents")
    # Persist the PER-DOC score relation (one slim row per doc): it is
    # referenced twice (histogram build + final bucket join), and each
    # un-cached reference would re-run the whole LM build + gram probe
    # — the dominant cost. The gram relation inside the operator is
    # left un-persisted (the bounded-persist slot is better spent on
    # the smaller, more-reused relation).
    sc = _persist_bounded(
        bigram_surprisal_scores(d, "doc_id", "text").select(
            "doc_id", "avg_surprisal"
        )
    )
    scored = sc.join(d.select("doc_id", "lang"), "doc_id").withColumn(
        "__bin", F.floor(F.col("avg_surprisal") * 100).cast("bigint")
    )
    hist = scored.groupBy("lang", "__bin").agg(F.count(F.lit(1)).alias("__c"))
    # per-lang totals derive from the tiny histogram, not the corpus
    tot = hist.groupBy("lang").agg(F.sum("__c").alias("__n"))
    wbin = (
        Window.partitionBy("lang")
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    buck = (
        hist.withColumn("__cum", F.sum("__c").over(wbin))
        .join(F.broadcast(tot), "lang")
        .select(
            "lang",
            "__bin",
            F.when(F.col("__cum") <= F.col("__n") / 3.0, "head")
            .when(F.col("__cum") <= 2 * F.col("__n") / 3.0, "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
    )
    return scored.join(F.broadcast(buck), ["lang", "__bin"]).select(
        "doc_id", "lang", "avg_surprisal", "bucket"
    )


_CORPUS_DIFF_ORACLE = """
WITH base AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 7 = 0
                  THEN substr(text, 1, greatest(length(text) - 1, 0))
                  ELSE text END) AS fp
  FROM documents WHERE doc_id % 10 != 0
),
cur AS (
  SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 9 != 0
)
SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
       CASE WHEN b.doc_id IS NULL THEN 'added'
            WHEN c.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM base b FULL OUTER JOIN cur c ON b.doc_id = c.doc_id
WHERE b.doc_id IS NULL OR c.doc_id IS NULL
   OR (b.fp IS DISTINCT FROM c.fp)
"""


@_register("pipeline_corpus_diff", _CORPUS_DIFF_ORACLE)
def pipeline_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot corpus diff: the added / removed / changed
    report a dataset-versioning pipeline runs between crawls before
    deciding what to re-process (re-embed, re-dedup, re-score only the
    delta — the input to `pipeline_incremental_dedup`'s probe side).
    Two snapshots are derived deterministically from the one documents
    table (base = doc_id % 10 != 0 with a simulated trailing-char edit
    on % 7 == 0 docs; current = % 9 != 0), then compared by content
    fingerprint (md5 — engine-portable) under a FULL OUTER join on the
    id: left-absent ⇒ added, right-absent ⇒ removed, fingerprint
    mismatch ⇒ changed; unchanged rows are filtered out before any
    rollup. Presence is tracked with explicit marker columns and the
    fingerprint compare is NULL-safe (`eqNullSafe` / IS DISTINCT
    FROM), so a NULL-text document — whose md5 is NULL — still
    classifies by row presence, not by fingerprint nullness.

    Scale shape: fingerprints are narrow per-row projections computed
    at scan; the diff is ONE co-partitioned equi-join on doc_id — the
    canonical snapshot-diff plan — and with both snapshots bucketed by
    id (sources/bucketed.py) it is exchange-free. The reference's only
    versioning behavior is blind output overwrite
    (HadoopKafkaConsumer.java:55-76, delete-then-write); this gives
    the delta view that makes incremental runs possible.
    """
    d = load_table(spark, sf_dir, "documents")
    base = d.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 7 == 0,
                F.substring(
                    F.col("text"),
                    1,
                    F.greatest(F.length("text") - 1, F.lit(0)),
                ),
            ).otherwise(F.col("text"))
        ).alias("__fp_b"),
        F.lit(True).alias("__in_b"),
    )
    cur = d.filter(F.col("doc_id") % 9 != 0).select(
        "doc_id",
        F.md5(F.col("text")).alias("__fp_c"),
        F.lit(True).alias("__in_c"),
    )
    joined = base.join(cur, "doc_id", "full_outer")
    status = (
        F.when(F.col("__in_b").isNull(), "added")
        .when(F.col("__in_c").isNull(), "removed")
        .otherwise("changed")
    )
    return (
        joined.filter(
            F.col("__in_b").isNull()
            | F.col("__in_c").isNull()
            | ~F.col("__fp_b").eqNullSafe(F.col("__fp_c"))
        )
        .select("doc_id", status.alias("status"))
    )


# ---------------------------------------------------------------------------
# Collocation mining: bigram PMI
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_TOP_K = 100

_PMI_ORACLE = f"""
WITH tok AS (SELECT {_SQL_TOKENS} AS t FROM documents),
uni AS (SELECT unnest(t) AS w FROM tok),
ucnt AS (SELECT w, COUNT(*)::BIGINT AS c FROM uni GROUP BY w),
tot AS (SELECT (SELECT COUNT(*) FROM uni)::DOUBLE AS n1,
               (SELECT SUM(CASE WHEN len(t) >= 2 THEN len(t) - 1
                                ELSE 0 END) FROM tok)::DOUBLE AS n2),
big AS (SELECT t[i] AS w1, t[i + 1] AS w2
        FROM tok, UNNEST(range(1, len(t))) AS r(i)),
bcnt AS (SELECT w1, w2, COUNT(*)::BIGINT AS c_xy
         FROM big GROUP BY w1, w2)
SELECT w1, w2, c_xy,
       ROUND(ln((c_xy::DOUBLE * n1 * n1)
                / (n2 * a.c::DOUBLE * b.c::DOUBLE)), 6) AS pmi
FROM bcnt JOIN ucnt a ON w1 = a.w JOIN ucnt b ON w2 = b.w, tot
WHERE c_xy >= {_PMI_MIN_COUNT}
ORDER BY pmi DESC, w1, w2 LIMIT {_PMI_TOP_K}
"""


@_register("text_collocations_pmi", _PMI_ORACLE)
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: the corpus's top bigrams by pointwise
    mutual information, PMI = ln(p(w1,w2) / (p(w1)·p(w2))) with a
    min-support floor — the classic phrase detector (word2vec's
    phrase pass, tokenizer-vocabulary curation, stopword-vs-term
    diagnosis): high-PMI pairs co-occur far beyond chance, so they
    behave as single lexical units.

    Plan: one explode for unigram counts, one bounded-length
    transform+explode for bigram counts (positions, not distinct —
    PMI needs occurrence probabilities), then the bigram relation
    joins the unigram counts on w1 and on w2 — VOCABULARY-sized
    shuffles, corpus-sized only in the two counting map phases, which
    are map-side-combinable. N1/N2 ride a broadcast 1-row relation.
    The top-k is ordered on the ROUNDED pmi with a (w1, w2) tiebreak
    — the unique total key both engines cut identically — and Spark
    plans orderBy+limit as TakeOrdered (top-k heap per partition +
    k-row merge), never a full sort. Determinism: every count is an
    exact integer; both engines evaluate the identical double
    expression (products round IEEE-identically once > 2^53), with
    ln's sub-ulp spread absorbed by ROUND(…, 6) — the
    `text_bigram_surprisal` contract.

    At 100 TB: unigram/bigram counting is word-count — the canonical
    scale-out aggregation; the vocabulary joins broadcast if the
    vocabulary is small, shuffle-hash otherwise; no driver-side state.
    """
    d = load_table(spark, sf_dir, "documents")
    # persisted: the unigram counts, the N1/N2 totals, and the bigram
    # pass all consume the token relation — unpersisted, the
    # tokenization would run three times (and ucnt feeds BOTH sides of
    # the vocabulary join, so it stacks its own persist)
    tok = persist_bounded(
        d.select(whitespace_tokens(F.col("text")).alias("t"))
    )
    uni = tok.select(F.explode("t").alias("w"))
    ucnt = persist_bounded(
        uni.groupBy("w").agg(F.count(F.lit(1)).alias("c")), stack=True
    )
    tot = tok.agg(
        F.sum(F.size("t")).cast("double").alias("n1"),
        F.sum(F.greatest(F.size("t") - 1, F.lit(0)))
        .cast("double").alias("n2"),
    )
    big = tok.filter(F.size("t") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2),"
                " i -> struct(t[i] AS w1, t[i + 1] AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    bcnt = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= _PMI_MIN_COUNT)
    )
    a = ucnt.select(F.col("w").alias("w1"), F.col("c").alias("__ca"))
    b = ucnt.select(F.col("w").alias("w2"), F.col("c").alias("__cb"))
    joined = bcnt.join(a, "w1").join(b, "w2").crossJoin(F.broadcast(tot))
    pmi = F.round(
        F.log(
            (F.col("c_xy").cast("double") * F.col("n1") * F.col("n1"))
            / (
                F.col("n2")
                * F.col("__ca").cast("double")
                * F.col("__cb").cast("double")
            )
        ),
        6,
    )
    return (
        joined.select("w1", "w2", "c_xy", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(_PMI_TOP_K)
    )


# ---------------------------------------------------------------------------
# MMR diversified top-k (maximal marginal relevance re-rank)
# ---------------------------------------------------------------------------

_MMR_LAMBDA = 0.7
_MMR_POOL = 20
_MMR_K = 8

_SQL_COS_CS = (
    "list_dot_product(c.v, s.v)"
    " / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(s.v, s.v)))"
)


def _mmr_oracle() -> str:
    """Unrolled greedy MMR in DuckDB: cand = the exact top-{pool} by
    cosine to query vec 0; step i picks argmax of λ·rel − (1−λ)·max
    similarity to the already-selected set (ties → min vec_id), the
    literal greedy both engines must walk identically. λ appears as
    the expression (1 - 0.7), not the literal 0.3 — the PageRank
    teleport-constant discipline (both engines COMPUTE the same
    subtraction)."""
    sql = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
cand AS MATERIALIZED (
  SELECT e.vec_id, e.v,
         list_dot_product(e.v, q.qv)
         / (sqrt(list_dot_product(e.v, e.v))
            * sqrt(list_dot_product(q.qv, q.qv))) AS rel
  FROM e, q WHERE e.vec_id != 0
  ORDER BY rel DESC, e.vec_id LIMIT {_MMR_POOL}
),
s1 AS MATERIALIZED (
  SELECT vec_id, v, rel, {_MMR_LAMBDA} * rel AS mmr
  FROM cand ORDER BY rel DESC, vec_id LIMIT 1
),
sel1 AS MATERIALIZED (SELECT vec_id, v FROM s1)"""
    for i in range(2, _MMR_K + 1):
        sql += f""",
p{i} AS (
  SELECT c.vec_id, c.v, c.rel,
         {_MMR_LAMBDA} * c.rel - (1 - {_MMR_LAMBDA}) * (
           SELECT MAX({_SQL_COS_CS}) FROM sel{i - 1} s) AS mmr
  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
),
s{i} AS MATERIALIZED (SELECT vec_id, v, rel, mmr FROM p{i}
         ORDER BY mmr DESC, vec_id LIMIT 1),
sel{i} AS MATERIALIZED (SELECT vec_id, v FROM sel{i - 1}
           UNION ALL SELECT vec_id, v FROM s{i})"""
    picks = "\nUNION ALL ".join(
        f"SELECT {i} AS selection_rank, vec_id, ROUND(rel, 6) AS rel, "
        f"ROUND(mmr, 6) AS mmr_score FROM s{i}"
        for i in range(1, _MMR_K + 1)
    )
    return sql + "\n" + picks


@_register("sim_topk_mmr", _mmr_oracle())
def sim_topk_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMAL MARGINAL RELEVANCE re-rank: the top-{pool} cosine
    candidates of query vector 0, greedily re-ranked so each pick
    maximizes λ·relevance − (1−λ)·max-similarity-to-already-picked —
    diversified retrieval, the standard fix for near-duplicate-saturated
    neighbor lists (a dedup corpus's top-k is often one template ×
    k), and the diverse-sampling primitive a curation pipeline uses to
    pick exemplars. The registry's ANN family ranks by pure
    relevance; this is the re-rank stage on top.

    Plan: candidate generation is the DISTRIBUTED exact kNN
    (broadcast query, one corpus pass, no corpus shuffle — the
    `sim_topk_cosine` machinery at k={pool}); the greedy then runs on
    the ≤{pool}-vector pool DRIVER-SIDE (pool²·dim ≈ 25k multiply-adds
    — re-ranking k rows is driver-scale BY DEFINITION, the same
    bounded-collect contract as IVF training, and loudly fails if the
    pool exceeds its bound). Determinism: every dot product is the
    identical left-to-right fold both engines use (`operators.
    similarity.dot`'s contract), λ enters as the computed (1 − 0.7),
    ties break on min vec_id, and the emitted values round through
    BigDecimal HALF_UP — exactly F.round's semantics — so the oracle's
    unrolled greedy must walk the same 8 picks.
    """
    from ..operators.similarity import mmr_rerank

    e = load_table(spark, sf_dir, "embeddings")
    qdf = e.filter(F.col("vec_id") == 0)
    top = topk_cosine(e, qdf, id_col="vec_id", vec_col="embedding",
                      k=_MMR_POOL)
    cand_ids = [int(r.neighbor_id)
                for r in top.select("neighbor_id").collect()]
    if not (0 < len(cand_ids) <= _MMR_POOL):
        raise RuntimeError(f"MMR pool bound violated: {len(cand_ids)}")
    rows = e.filter(F.col("vec_id").isin(cand_ids + [0])).select(
        "vec_id", "embedding"
    ).collect()  # ≤ pool+1 vectors — bounded driver-side re-rank input
    vecs = {int(r.vec_id): [float(x) for x in r.embedding] for r in rows}
    out = mmr_rerank(vecs, 0, cand_ids, lam=_MMR_LAMBDA, k=_MMR_K)
    return spark.createDataFrame(
        out, "selection_rank int, vec_id long, rel double, mmr_score double"
    )
