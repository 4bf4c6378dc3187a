"""Distributed byte-pair-encoding (BPE) tokenizer training.

SURVEY.md §2.5's text-analysis mandate, upgraded from word/char count
proxies to a REAL learned subword vocabulary (VERDICT r12 task 7): the
classic BPE procedure (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — public) trained
distributedly, with FIXED deterministic merge rounds so a DuckDB
oracle can restate every step.

Distributed shape — the part that matters at 100 TB:

- the corpus is touched ONCE, to build the (word, freq) vocabulary
  relation (one corpus-sized shuffle on the word key, fully partial-
  agg-friendly); every merge round after that is vocabulary-sized —
  one pair-count aggregation (map-side combinable) plus a 1-row argmax
  collect. This is exactly how production BPE trainers scale: merge
  rounds never re-read the corpus.
- encoding applies the learned merges as a chain of LITERAL string
  replaces — whole-stage-codegen JVM expressions, no Python.

Determinism contract (what makes the oracle possible):

- symbols are encoded as a SPACE-WRAPPED string: each symbol ``x``
  contributes ``" x "``, so a word's representation is
  ``" c1  c2  ...  cn "`` (two spaces between symbols, one at each
  end). Symbols can never contain spaces (words come from whitespace
  splitting), so the encoding is unambiguous.
- merging pair (l, r) is ``replace(sym, " l  r ", " lr ")`` — and
  because every occurrence of the pair is flanked by the wrap spaces,
  a plain non-overlapping left-to-right literal replace (identical
  semantics in Spark's ``replace`` and DuckDB's ``replace``)
  implements EXACTLY the greedy left-to-right merge BPE specifies:
  in `` a  a  a `` only the first ``(a, a)`` merges, because the
  match consumes the shared wrap spaces.
- each round's winning pair is the (count DESC, left ASC, right ASC)
  argmax — a total order both engines cut identically on ASCII.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def symbolize(word: Column) -> Column:
    """The space-wrapped initial (character-level) symbol string of a
    word: ``"abc"`` → ``" a  b  c "``. One global regexp_replace —
    each character becomes ``" c "``; concatenation yields the
    two-space separators the merge encoding requires."""
    return F.regexp_replace(word, "(.)", " $1 ")


def merge_expr(sym: Column, left: str, right: str) -> Column:
    """Apply one learned merge to a symbol string: a LITERAL
    non-overlapping replace, which on the space-wrapped encoding is
    exactly BPE's greedy left-to-right merge (module docstring).
    ``F.replace`` with literal columns — no regex, no escaping
    hazards from corpus punctuation."""
    return F.replace(
        sym,
        F.lit(f" {left}  {right} "),
        F.lit(f" {left}{right} "),
    )


def token_count(sym: Column) -> Column:
    """Number of symbols in a space-wrapped symbol string: tokens are
    separated by exactly two spaces, so count = separators + 1."""
    return F.size(F.split(F.trim(sym), "  "))


def word_frequencies(docs: DataFrame, *, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """The (word, freq) vocabulary relation — the ONE corpus-sized
    pass (whitespace split, empty-token filter, one shuffle on the
    word key with map-side partial counts). ``extra_cols`` ride the
    grouping (e.g. ``("lang",)`` for per-language encode stats)."""
    words = docs.select(
        *extra_cols,
        F.explode(F.split(F.col("text"), r"\s+")).alias("w"),
    ).filter(F.length("w") > 0)
    return words.groupBy(*extra_cols, "w").agg(
        F.count(F.lit(1)).alias("freq")
    )


def train_bpe(
    word_freq: DataFrame, rounds: int
) -> list[tuple[str, str, int, int]]:
    """Run ``rounds`` deterministic merge rounds over the vocabulary
    relation and return ``[(left, right, pair_count,
    corpus_tokens_after), ...]`` in merge order.

    Every round is vocabulary-sized work: adjacent-pair counts from
    the current symbol strings (explode + map-side-combinable sum),
    a 1-row argmax collect (count DESC, left ASC, right ASC — the
    deterministic tie-break the oracle replays), then the merge
    applied as a literal replace. The vocabulary is cached once —
    merge rounds never touch the corpus. Raises when a round finds no
    pair at all (every word is a single symbol — vocabulary exhausted
    before ``rounds``; loud, not silent)."""
    vocab = word_freq.select(
        symbolize(F.col("w")).alias("sym"), F.col("freq")
    ).cache()
    try:
        return _train_rounds(vocab, rounds)
    finally:
        # release the cached vocabulary even when a round raises
        # (vocabulary-exhausted, or any Spark failure mid-round)
        vocab.unpersist()


def _train_rounds(vocab, rounds: int) -> list[tuple[str, str, int, int]]:
    merges: list[tuple[str, str, int, int]] = []
    cur = vocab
    for _ in range(rounds):
        pairs = (
            cur.select(
                F.split(F.trim(F.col("sym")), "  ").alias("syms"),
                F.col("freq"),
            )
            # single-symbol words contribute no pairs; the filter also
            # guards Spark's sequence(1, 0), which DESCENDS instead of
            # yielding an empty array
            .filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(syms[i-1] AS l, syms[i] AS r))"
                    )
                ).alias("p"),
                F.col("freq"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(
            F.desc("cnt"), F.asc("l"), F.asc("r")
        ).first()  # 1 row: the argmax is the only driver-side datum
        if top is None:
            raise ValueError(
                f"vocabulary exhausted after {len(merges)} merges; "
                f"asked for {rounds}"
            )
        left, right, cnt = top["l"], top["r"], int(top["cnt"])
        cur = cur.select(
            merge_expr(F.col("sym"), left, right).alias("sym"),
            F.col("freq"),
        )
        tokens_after = int(
            cur.agg(
                F.sum(F.col("freq") * token_count(F.col("sym")))
            ).first()[0]
        )
        merges.append((left, right, cnt, tokens_after))
    return merges


def encode_tokens(word: Column, merges: list[tuple]) -> Column:
    """Token count of ``word`` under the learned merge list: symbolize,
    apply every merge in order (chained JVM literal replaces — one
    whole-stage-codegen projection), count symbols. Merges MUST be
    applied in training order: later merges can consume earlier
    merges' outputs (that is the whole point of BPE)."""
    sym = symbolize(word)
    for left, right, *_ in merges:
        sym = merge_expr(sym, left, right)
    return token_count(sym)


# Above this merge count the chained-replace expression tree stops
# being codegen-friendly (Catalyst's generated projection splits /
# falls back to interpreted mode long before a production 32k-merge
# vocabulary) and the encode path switches to the Arrow encoder. The
# value is deliberately conservative: far below Janino's 64KB method
# limit, far above any oracle-checked test vocabulary (6 merges), so
# the dispatch never changes an existing query's physical plan.
CODEGEN_MERGE_LIMIT = 96


def _greedy_token_count(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Token count of one word under a learned merge table, by the
    classic rank-greedy BPE apply (the GPT-2/HF `bpe()` loop): find
    the LOWEST-RANK adjacent pair present, merge every non-overlapping
    occurrence left-to-right, repeat until no learned pair remains.

    Equivalent to applying the merges sequentially in training order
    (the chained-replace form): merging pair k can only create new
    adjacencies that involve its output token, and every learned pair
    containing that token has rank > k (it could only be learned after
    the token existed) — so after the minimum-rank pair is exhausted no
    lower-rank pair can appear, and the two application orders produce
    identical symbol sequences. This property holds for any merge list
    produced by :func:`train_bpe`; the differential test in
    tests/test_text_operators.py pins it against the chained form."""
    syms = list(word)
    while len(syms) >= 2:
        best_rank = None
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, (syms[i], syms[i + 1])
        if best is None:
            break
        left, right = best
        out: list[str] = []
        i = 0
        n = len(syms)
        while i < n:
            if i < n - 1 and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


def encode_tokens_arrow(word: Column, merges: list[tuple]) -> Column:
    """Arrow-batched twin of :func:`encode_tokens` for vocabularies
    past the codegen-friendly size (VERDICT r13 item 2): a
    ``pandas_udf`` running the rank-greedy BPE apply, whose per-word
    cost scales with the MERGES THAT FIRE on that word, not with the
    vocabulary size — a 32k-merge production vocabulary costs the same
    per word as a 100-merge one, where the chained-replace expression
    walks all 32k literals per row. Repeated words inside an Arrow
    batch hit a per-batch memo (the encode input is usually the
    deduplicated (word, freq) relation anyway)."""
    ranks = {
        (left, right): i for i, (left, right, *_) in enumerate(merges)
    }

    @F.pandas_udf("int")
    def _count(s: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}

        def one(w) -> int | None:
            # parity with the chained form on the edge inputs
            # (review-found r14): a NULL word yields NULL (the codegen
            # expressions propagate it), and the empty string yields 1
            # (split("", "  ") == [""] — one empty symbol), where the
            # raw greedy walk would crash / return 0.
            if w is None or (not isinstance(w, str) and pd.isna(w)):
                return None
            if w == "":
                return 1
            got = memo.get(w)
            if got is None:
                got = memo[w] = _greedy_token_count(w, ranks)
            return got

        return s.map(one)

    return _count(word)


def encode_tokens_auto(
    word: Column,
    merges: list[tuple],
    *,
    codegen_limit: int = CODEGEN_MERGE_LIMIT,
) -> Column:
    """Dispatch the encode path by vocabulary size: small merge lists
    stay whole-stage-codegen JVM literal replaces (zero Python in the
    hot path), large ones switch to the Arrow encoder before the
    expression tree explodes past the codegen limit. Both paths are
    differentially tested to produce identical counts."""
    if len(merges) <= codegen_limit:
        return encode_tokens(word, merges)
    return encode_tokens_arrow(word, merges)


def decode_sym(sym: str) -> str:
    """Inverse of the symbol encoding for a FULLY-MERGED or partially
    merged symbol string: strip the wrap and remove separators.
    Encoding then decoding any word is the identity regardless of how
    many merges applied — the property test's contract."""
    return sym.strip().replace("  ", "")
