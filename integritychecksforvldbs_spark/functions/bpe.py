"""Byte-pair-encoding: distributed vocabulary TRAINING plus the
counting applier for the curation kernels' ``tokens_expr`` seam.

:mod:`.subword` ships the frequency-ranked WordPiece flavor; this
module adds the real merge-loop trainer (Sennrich et al. 2016, the
construction behind GPT-2/RoBERTa vocabularies), with the split every
production BPE trainer uses:

- **corpus pass (distributed)**: ONE map-side-combined word-count
  aggregation over the corpus — the only stage that scales with the
  data.  The distinct-word relation is vocabulary-sized (Heaps' law),
  and a ``max_words`` frequency cut bounds the driver transfer; at
  100 TB the cut drops only hapax noise, which a frequency-thresholded
  merge loop could never rank anyway.
- **merge loop (driver)**: BPE merges operate on the word→count
  table, not the corpus — metadata-sized work by construction, so
  distributing it would only add 2·n_merges shuffle barriers.  The
  loop keeps a pair→words inverted index and recounts only the words
  a merge touched.

The applier mirrors :mod:`.subword`'s cross-engine contract: ONE pure
Python ``bpe_count`` backs the Arrow-batched Spark UDF and the DuckDB
oracle function (tests register it via ``duckdb.create_function``),
so the two engines cannot drift.

Scheme: word → characters + a terminal end-of-word symbol; a merge
joins one adjacent symbol pair.  Training ties break on (count desc,
pair lexicographic) so the merge list is reproducible bit-for-bit
across runs, partition counts, and engines.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from typing import Iterator

import pandas as pd  # module-level: pandas_udf resolves type hints here
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EOW = "</w>"


def corpus_word_counts(
    df: DataFrame, text_col: str = "text", max_words: int = 1_000_000
) -> list[tuple[str, int]]:
    """The distributed stage: (word, count) for the ``max_words`` most
    frequent lowercased whitespace words, ties broken lexicographically
    (deterministic across partitionings)."""
    rows = (
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
        .orderBy(F.desc("c"), "w")
        .limit(max_words)
        .collect()
    )
    return [(r["w"], r["c"]) for r in rows]


def train_bpe_from_counts(
    counts: list[tuple[str, int]] | dict[str, int],
    n_merges: int = 200,
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """The driver-side merge loop over a word→count table: repeatedly
    merge the most frequent adjacent symbol pair (ties lexicographic),
    stopping at ``n_merges`` or when the best pair drops under
    ``min_pair_freq``.  Incremental: a pair→words index limits each
    round's recount to the words the merge touched."""
    if isinstance(counts, dict):
        counts = list(counts.items())
    words: list[tuple[list[str], int]] = [
        (list(w) + [EOW], c) for w, c in counts if w
    ]

    def pairs_of(syms: list[str]) -> Counter:
        return Counter(zip(syms, syms[1:]))

    pair_freq: Counter = Counter()
    index: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for i, (syms, c) in enumerate(words):
        for p, k in pairs_of(syms).items():
            pair_freq[p] += k * c
            index[p].add(i)

    def merge_word(syms: list[str], a: str, b: str) -> list[str]:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    # lazy max-heap: (-count, pair) entries, stale ones skipped on pop
    # by re-checking against pair_freq — O(log P) per update instead of
    # an O(P) scan per round.  Heap order (-count, pair) IS the
    # deterministic tie-break: count desc, then pair lexicographic.
    import heapq

    heap = [(-n, p) for p, n in pair_freq.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        neg, best = heapq.heappop(heap)
        if pair_freq.get(best, 0) != -neg:
            continue  # stale entry superseded by an update
        if -neg < min_pair_freq:
            break
        merges.append(best)
        for i in sorted(index[best]):
            syms, c = words[i]
            old = pairs_of(syms)
            new_syms = merge_word(syms, *best)
            new = pairs_of(new_syms)
            words[i] = (new_syms, c)
            for p in old.keys() | new.keys():
                d = new.get(p, 0) - old.get(p, 0)
                if d:
                    pair_freq[p] += d * c
                    if pair_freq[p] <= 0:
                        del pair_freq[p]
                    else:
                        heapq.heappush(heap, (-pair_freq[p], p))
                if new.get(p, 0):
                    index[p].add(i)
                elif p in index:
                    index[p].discard(i)
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    min_pair_freq: int = 2,
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Distributed corpus pass + driver merge loop; see module doc."""
    return train_bpe_from_counts(
        corpus_word_counts(df, text_col, max_words),
        n_merges=n_merges,
        min_pair_freq=min_pair_freq,
    )


def bpe_encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply trained merges to ONE word, lowest-rank-first (the GPT-2
    application order, which reproduces the training segmentation):
    each round merges every occurrence of the best-ranked adjacent
    pair until no ranked pair remains."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best = None, None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, p
        if best is None:
            break
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_count(text: str | None, ranks: dict[tuple[str, str], int]) -> int:
    """BPE token count of a document (sum of per-word piece counts
    over lowercased whitespace words).  Pure Python — the SAME
    callable backs the Spark UDF and the DuckDB oracle function."""
    if text is None:
        return 0
    return sum(len(bpe_encode(w, ranks)) for w in text.lower().split())


def merge_ranks(merges: list[tuple[str, str]]) -> dict[tuple[str, str], int]:
    return {tuple(p): i for i, p in enumerate(merges)}


def register_bpe_count(
    spark: SparkSession,
    merges: list[tuple[str, str]],
    name: str = "bpe_count",
) -> str:
    """Register the BPE counter as a SQL function and return the
    ``tokens_expr`` string for the curation kernels.  The merge table
    ships once via broadcast; counting is an Arrow-batched pandas UDF
    (the sanctioned Python boundary — merge application is inherently
    iterative per word)."""
    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(merge_ranks(merges))

    @pandas_udf("long")
    def _count(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # Iterator form so the per-word piece-count memo lives once per
        # TASK (guide §4.5): bpe_encode is pure per word, and corpus
        # word frequency is Zipfian, so the distinct-word working set
        # is vocabulary-sized (Heaps' law) while the merge loop is the
        # per-word cost — memoizing it turns O(total words) encode
        # loops into O(distinct words).  Results are unchanged by
        # construction (same bpe_encode, same ranks).
        r = bc.value
        memo: dict[str, int] = {}

        def doc_count(t: str | None) -> int:
            if t is None:
                return 0
            total = 0
            for w in t.lower().split():
                c = memo.get(w)
                if c is None:
                    c = len(bpe_encode(w, r))
                    memo[w] = c
                total += c
            return total

        for texts in batches:
            yield texts.map(doc_count)

    spark.udf.register(name, _count)
    return f"{name}(text)"
