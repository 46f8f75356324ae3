"""Sub-word (WordPiece-style) tokenization for token accounting.

Every curation kernel defaults to whitespace token counts, with a
``tokens_expr`` seam for real tokenizers (``operators/curation.py``).
This module provides that real tokenizer: greedy longest-match-first
WordPiece (the BERT scheme — continuation pieces prefixed ``##``,
whole word → ``[UNK]`` when no prefix piece matches), because at
100 TB the budget math (:func:`..operators.curation.budget_fill`,
``pack_sequences``, ``mixture_allocation``) is only as good as its
token counts, and LM budgets are sub-word counts, not whitespace
counts.

Scale shape:

- **vocab learning** (:func:`build_subword_vocab`) is two distributed
  one-pass aggregations over the corpus (word frequencies → piece
  frequencies); the result is vocabulary-sized.
- **counting** (:func:`register_wordpiece_count`) is an Arrow-batched
  pandas UDF over a broadcast vocab — a sanctioned Python boundary
  (like the multimodal decode path): greedy longest-match is
  inherently iterative per word, which no built-in SQL function
  expresses.  Registered as a SQL function, it plugs straight into
  the ``tokens_expr`` seam: ``tokens_expr="wordpiece_count(text)"``.
- **cross-engine**: the counting core is ONE pure-Python function;
  the DuckDB oracle registers the same function (tests pin equality),
  so there is no dual-implementation drift surface.
"""

from __future__ import annotations

from typing import Iterator  # module-level: pandas_udf resolves hints here

import pandas as pd  # module-level: pandas_udf resolves type hints here
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

UNK = "[UNK]"
MAX_PIECE_LEN = 16  # longest piece ever tried (BERT uses ~100; 16 caps scans)


def wordpiece_tokenize(
    word: str, vocab: frozenset[str] | set[str], max_piece_len: int = MAX_PIECE_LEN
) -> list[str]:
    """Greedy longest-match-first WordPiece split of ONE word.
    Continuation pieces carry the ``##`` prefix; a word with no
    matching first piece (or a dead-end tail) collapses to ``[UNK]``,
    exactly the BERT convention."""
    pieces: list[str] = []
    i, n = 0, len(word)
    while i < n:
        j = min(n, i + max_piece_len)
        hit = None
        while j > i:
            piece = word[i:j] if i == 0 else "##" + word[i:j]
            if piece in vocab:
                hit = piece
                break
            j -= 1
        if hit is None:
            return [UNK]
        pieces.append(hit)
        i = j
    return pieces


def wordpiece_count(
    text: str | None,
    vocab: frozenset[str] | set[str],
    max_piece_len: int = MAX_PIECE_LEN,
) -> int:
    """Sub-word token count of a document: sum of piece counts over
    lowercased whitespace-split words.  Pure Python — the SAME
    callable backs the Spark UDF and the DuckDB oracle function, so
    the two engines cannot drift."""
    if text is None:
        return 0
    total = 0
    for word in text.lower().split():
        total += len(wordpiece_tokenize(word, vocab, max_piece_len))
    return total


def build_subword_vocab(
    df: DataFrame,
    text_col: str = "text",
    n_words: int = 2000,
    n_suffixes: int = 2000,
    max_suffix_len: int = 4,
    max_piece_len: int = MAX_PIECE_LEN,
) -> list[str]:
    """Learn a deterministic WordPiece-style vocabulary from a corpus:
    every single character seen word-initially ANYWHERE in the corpus
    (so no word is UNK for want of a first piece unless its leading
    char is genuinely unseen), all single-char continuations, the
    ``n_words`` most frequent whole words no longer than
    ``max_piece_len`` (a longer word can never match as one piece —
    the tokenizer's scan is bounded), and the ``n_suffixes`` most
    frequent continuation pieces of length 2..``max_suffix_len``.

    This is the frequency-driven flavor of vocab construction (a
    full BPE merge loop is sequential by nature; frequency-ranked
    pieces give the same budget-accounting behavior).  The corpus is
    scanned ONCE: the word-count relation is persisted and every
    further aggregate (top words, first chars, pieces) runs over that
    vocabulary-sized frame.  Ties rank lexicographically so the
    vocabulary is reproducible across runs and engines.
    """
    words = (
        df.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda x: x != "",
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .persist()
    )
    try:
        top_words = [
            r["w"]
            for r in words.filter(F.length("w") <= max_piece_len)
            .orderBy(F.desc("c"), "w")
            .limit(n_words)
            .collect()
        ]
        # word-initial characters from the FULL word relation, not just
        # the frequent words — a rare leading char would otherwise send
        # every word bearing it to [UNK]
        first_chars = [
            r["ch"]
            for r in words.select(F.substring("w", 1, 1).alias("ch"))
            .distinct()
            .collect()
        ]
        # continuation pieces: every in-word substring starting past 0,
        # of length 1..max_suffix_len, weighted by word frequency — one
        # row-local explode over the vocabulary-sized word relation
        pieces = (
            words.select(
                "c",
                F.explode(
                    F.expr(
                        f"""flatten(transform(sequence(2, greatest(length(w), 2)),
                              s -> transform(
                                     sequence(1, least({max_suffix_len},
                                                       length(w) - s + 1)),
                                     l -> substring(w, s, l))))"""
                    )
                ).alias("p"),
            )
            .filter(F.length("p") > 0)
            .groupBy("p")
            .agg(F.sum("c").alias("c"))
            .persist()
        )
        try:
            top_suffixes = [
                "##" + r["p"]
                for r in pieces.filter(F.length("p") >= 2)
                .orderBy(F.desc("c"), "p")
                .limit(n_suffixes)
                .collect()
            ]
            char_rows = [
                r["p"]
                for r in pieces.filter(F.length("p") == 1).select("p").collect()
            ]
        finally:
            pieces.unpersist()
    finally:
        words.unpersist()
    vocab = (
        sorted(set(first_chars))
        + ["##" + c for c in sorted(set(char_rows))]
        + top_words
        + top_suffixes
    )
    # dedupe, order-preserving (determinism pinned by tests)
    seen: set[str] = set()
    return [v for v in vocab if not (v in seen or seen.add(v))]


def register_wordpiece_count(
    spark: SparkSession,
    vocab: list[str] | set[str],
    name: str = "wordpiece_count",
    max_piece_len: int = MAX_PIECE_LEN,
) -> str:
    """Register the sub-word counter as a SQL function and return the
    ``tokens_expr`` string to feed the curation kernels.

    The vocab ships to executors once via a Spark broadcast; counting
    runs as an Arrow-batched pandas UDF (the sanctioned Python
    boundary — greedy longest-match is iterative per word).  Usage::

        expr = register_wordpiece_count(spark, vocab)
        budget_fill(df, target, tokens_expr=expr)
    """
    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(frozenset(vocab))

    @pandas_udf("long")
    def _count(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # per-TASK distinct-word memo (guide §4.5) — same move as the
        # BPE applier: wordpiece_tokenize is pure per word and word
        # frequency is Zipfian, so memoizing the per-word piece count
        # turns O(total words) greedy scans into O(distinct words);
        # results unchanged by construction.
        v = bc.value
        memo: dict[str, int] = {}

        def doc_count(t: str | None) -> int:
            if t is None:
                return 0
            total = 0
            for w in t.lower().split():
                c = memo.get(w)
                if c is None:
                    c = len(wordpiece_tokenize(w, v, max_piece_len))
                    memo[w] = c
                total += c
            return total

        for texts in batches:
            yield texts.map(doc_count)

    spark.udf.register(name, _count)
    return f"{name}(text)"
