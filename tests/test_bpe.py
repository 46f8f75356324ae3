"""BPE vocabulary training (functions/bpe.py): the merge-loop trainer
(distributed word-count pass + driver merge loop), the GPT-2-style
applier, and the cross-engine counting contract through the curation
kernels' ``tokens_expr`` seam."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.functions import bpe
from integritychecksforvldbs_spark.operators import curation


def naive_train(counts: dict[str, int], n_merges: int, min_pair_freq: int = 2):
    """Recompute-from-scratch reference trainer: per round, recount
    every adjacent pair over every word and take (count desc, pair
    lexicographic).  O(rounds x corpus) — correct by inspection."""
    words = {w: list(w) + [bpe.EOW] for w in counts}
    merges = []
    for _ in range(n_merges):
        freq: Counter = Counter()
        for w, syms in words.items():
            for p in zip(syms, syms[1:]):
                freq[p] += counts[w]
        if not freq:
            break
        best = min(freq, key=lambda p: (-freq[p], p))
        if freq[best] < min_pair_freq:
            break
        merges.append(best)
        a, b = best
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_trainer_matches_naive_reference():
    for counts in (
        SENNRICH,
        {"aaa": 3, "aab": 2, "ba": 4},
        {"x": 1},
        {},
        {"ab": 7, "abab": 2, "bb": 5, "bab": 1},
    ):
        for n in (1, 3, 10, 50):
            assert bpe.train_bpe_from_counts(
                counts, n_merges=n
            ) == naive_train(counts, n), (counts, n)


def test_trainer_first_merges_pinned():
    merges = bpe.train_bpe_from_counts(SENNRICH, n_merges=4)
    # 'es' appears in newest(6)+widest(3)=9 times — the classic
    # Sennrich first merge; then 'est', then 'est</w>'
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", bpe.EOW)


def test_encode_reconstructs_and_respects_ranks():
    merges = bpe.train_bpe_from_counts(SENNRICH, n_merges=50, min_pair_freq=1)
    ranks = bpe.merge_ranks(merges)
    for w in SENNRICH:
        pieces = bpe.bpe_encode(w, ranks)
        assert "".join(pieces) == w + bpe.EOW  # lossless segmentation
    # a fully-trained frequent word collapses to one piece
    assert bpe.bpe_encode("newest", ranks) == ["newest" + bpe.EOW]
    # unseen word falls back to finer pieces, still lossless
    assert "".join(bpe.bpe_encode("lowest", ranks)) == "lowest" + bpe.EOW


def test_count_pinned_and_null_safe():
    ranks = bpe.merge_ranks(bpe.train_bpe_from_counts(SENNRICH, 50, 1))
    assert bpe.bpe_count(None, ranks) == 0
    assert bpe.bpe_count("", ranks) == 0
    assert bpe.bpe_count("newest newest", ranks) == 2
    # no ranks at all: every char + EOW
    assert bpe.bpe_count("abc", {}) == 4


def test_distributed_train_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, "low lower newest newest widest") for i in range(7)],
        "doc_id long, text string",
    ).repartition(5)
    m1 = bpe.train_bpe(docs, n_merges=8)
    m2 = bpe.train_bpe(docs, n_merges=8)
    assert m1 == m2 and len(m1) == 8
    # the distributed pass feeds the same loop as the local dict
    local = bpe.train_bpe_from_counts(
        {"low": 7, "lower": 7, "newest": 14, "widest": 7}, n_merges=8
    )
    assert m1 == local


def test_spark_udf_matches_pure_python_and_duckdb(spark, tables, duck):
    """ONE counting function backs the Spark UDF and the DuckDB
    oracle function — equality across all three on real documents."""
    docs = tables["documents"].select("doc_id", "text").limit(200)
    merges = bpe.train_bpe(docs, n_merges=60, max_words=500)
    ranks = bpe.merge_ranks(merges)
    expr = bpe.register_bpe_count(spark, merges, name="bpe_count_t")
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", F.expr(expr).alias("n")).collect()
    }
    pure = {
        r["doc_id"]: bpe.bpe_count(r["text"], ranks) for r in docs.collect()
    }
    assert got == pure
    duck.create_function(
        "bpe_count_t", lambda t: bpe.bpe_count(t, ranks), ["VARCHAR"], "BIGINT"
    )
    dk = dict(
        duck.execute(
            "SELECT doc_id, bpe_count_t(text) FROM documents "
            "WHERE doc_id IN (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 50)"
        ).fetchall()
    )
    for k, v in dk.items():
        assert pure[k] == v
    # sub-word counts genuinely differ from whitespace counts
    ws = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id",
            F.expr(
                "CAST(size(filter(split(text, ' '), x -> x <> '')) AS BIGINT)"
            ).alias("n"),
        ).collect()
    }
    assert any(got[k] != ws[k] for k in got)


def test_tokens_expr_integration_budget_balances(spark, tables):
    docs = tables["documents"].select("doc_id", "source", "text").limit(300)
    merges = bpe.train_bpe(docs, n_merges=40, max_words=400)
    expr = bpe.register_bpe_count(spark, merges, name="bpe_count_i")
    alloc = curation.mixture_allocation(
        docs, target_tokens=10_000, tokens_expr=expr
    ).collect()
    assert sum(r["alloc_tokens"] for r in alloc) <= 10_000
    assert all(r["src_tokens"] > 0 for r in alloc)
