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


def decode_sym(sym: str) -> str:
    """Inverse of the symbol encoding for a FULLY-MERGED or partially
    merged symbol string: strip the wrap and remove separators.
    Encoding then decoding any word is the identity regardless of how
    many merges applied — the property test's contract."""
    return sym.strip().replace("  ", "")
