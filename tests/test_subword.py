"""Sub-word tokenization (functions/subword.py) and its integration
with the curation kernels' ``tokens_expr`` seam — the round-5 punch
item: budget math with token counts that are NOT whitespace counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.functions import subword
from integritychecksforvldbs_spark.operators import curation

VOCAB = [
    "the", "un", "##break", "##able", "##s", "a", "b", "c",
    "##a", "##b", "##c", "data", "##base",
]


def test_wordpiece_greedy_longest_match():
    v = frozenset(VOCAB)
    assert subword.wordpiece_tokenize("unbreakable", v) == [
        "un", "##break", "##able"
    ]
    assert subword.wordpiece_tokenize("databases", v) == [
        "data", "##base", "##s"
    ]
    assert subword.wordpiece_tokenize("the", v) == ["the"]
    assert subword.wordpiece_tokenize("xyz", v) == ["[UNK]"]  # no first piece
    assert subword.wordpiece_tokenize("ax", v) == ["[UNK]"]  # dead-end tail


def test_wordpiece_count_pinned_values():
    v = frozenset(VOCAB)
    # 1 + 3 + 3 pieces; whitespace count would be 3
    assert subword.wordpiece_count("the unbreakable databases", v) == 7
    assert subword.wordpiece_count("THE Unbreakable", v) == 4  # lowercased
    assert subword.wordpiece_count(None, v) == 0
    assert subword.wordpiece_count("", v) == 0


def test_vocab_build_deterministic_and_useful(spark):
    docs = spark.createDataFrame(
        [(i, "the quick quick databases run") for i in range(20)]
        + [(100 + i, "unbreakable data") for i in range(5)],
        "doc_id long, text string",
    )
    v1 = subword.build_subword_vocab(docs, n_words=4, n_suffixes=8)
    v2 = subword.build_subword_vocab(docs, n_words=4, n_suffixes=8)
    assert v1 == v2  # reproducible
    assert "quick" in v1 and "the" in v1  # frequent whole words
    assert any(p.startswith("##") for p in v1)  # continuation pieces
    # every corpus word tokenizes without UNK except genuinely-unseen
    fv = frozenset(v1)
    for w in ("the", "quick", "databases"):
        assert subword.wordpiece_tokenize(w, fv) != ["[UNK]"]


def test_spark_udf_matches_pure_python_and_duckdb(spark, tables):
    """ONE counting function backs the Spark UDF and the DuckDB
    oracle function — equality across all three on real documents."""
    import duckdb

    docs = tables["documents"].select("doc_id", "text").limit(200)
    vocab = subword.build_subword_vocab(docs, n_words=10, n_suffixes=300)
    expr = subword.register_wordpiece_count(spark, vocab, name="wp_r6_test")
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.expr("wp_r6_test(text)").alias("n")
        ).collect()
    }
    fv = frozenset(vocab)
    pdf = docs.toPandas()
    want_py = {
        row.doc_id: subword.wordpiece_count(row.text, fv)
        for row in pdf.itertuples()
    }
    assert got == want_py
    con = duckdb.connect()
    con.create_function(
        "wp", lambda t: subword.wordpiece_count(t, fv), ["VARCHAR"], "BIGINT"
    )
    con.register("documents", pdf)
    want_duck = dict(
        con.execute("SELECT doc_id, wp(text) FROM documents").fetchall()
    )
    assert got == want_duck
    # and the counts genuinely differ from whitespace counts
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


def test_budget_fill_with_subword_counts_balances(spark, tables):
    """The punch-item contract: drive budget_fill through tokens_expr
    with sub-word counts — budgets still balance (every source's kept
    docs start within its allocation; overshoot ≤ one document)."""
    docs = tables["documents"].select("doc_id", "source", "text")
    vocab = subword.build_subword_vocab(docs, n_words=10, n_suffixes=300)
    expr = subword.register_wordpiece_count(spark, vocab, name="wp_r6_fill")
    target = 50_000
    out = curation.budget_fill(docs, target, tokens_expr=expr).cache()
    alloc = {
        r["source"]: r["alloc_tokens"]
        for r in curation.mixture_allocation(
            docs, target, tokens_expr=expr
        ).collect()
    }
    rows = out.collect()
    out.unpersist()
    # n_tokens really are sub-word counts
    fv = frozenset(vocab)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in rows[:50]:
        assert r["n_tokens"] == subword.wordpiece_count(texts[r["doc_id"]], fv)
    # budget balance per source: kept docs START within the allocation,
    # and dropping a kept doc's tokens re-opens the budget (maximality)
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    assert sum(alloc.values()) <= target
    for src, rs in by_source.items():
        kept = [r for r in rs if r["kept"]]
        for r in kept:
            assert r["cum_tokens"] - r["n_tokens"] < alloc[src]
        dropped = [r for r in rs if not r["kept"]]
        for r in dropped:
            assert r["cum_tokens"] - r["n_tokens"] >= alloc[src]


def test_pack_sequences_with_subword_counts_conserves_tokens(spark, tables):
    docs = tables["documents"].select("doc_id", "source", "text").limit(300)
    vocab = subword.build_subword_vocab(docs, n_words=10, n_suffixes=300)
    expr = subword.register_wordpiece_count(spark, vocab, name="wp_r6_pack")
    L = 128
    bins = curation.pack_sequences(docs, seq_len=L, tokens_expr=expr).collect()
    total_binned = sum(r["n_tokens"] for r in bins)
    total_docs = docs.select(
        F.sum(F.expr("wp_r6_pack(text)")).alias("s")
    ).collect()[0]["s"]
    assert total_binned == total_docs  # conservation
    # every non-final bin is exactly full
    last_bin = {}
    for r in bins:
        last_bin[r["source"]] = max(last_bin.get(r["source"], -1), r["bin_idx"])
    for r in bins:
        if r["bin_idx"] < last_bin[r["source"]]:
            assert r["n_tokens"] == L


def test_wordpiece_reconstruction_property():
    """Property: for any word over the vocab's alphabet, joining the
    pieces (strip ##) reconstructs the word exactly — or the word is
    [UNK]; and the piece count never exceeds the word length."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    vocab = frozenset(
        ["a", "b", "c", "ab", "abc", "##a", "##b", "##c", "##bc", "##ab"]
    )

    @settings(max_examples=200, deadline=None)
    @given(word=st.text(alphabet="abcx", min_size=1, max_size=12))
    def check(word):
        pieces = subword.wordpiece_tokenize(word, vocab)
        if pieces == ["[UNK]"]:
            assert "x" in word  # only the out-of-alphabet char UNKs
        else:
            joined = pieces[0] + "".join(p[2:] for p in pieces[1:])
            assert joined == word
            assert 1 <= len(pieces) <= len(word)
            assert all(p.startswith("##") for p in pieces[1:])
            assert not pieces[0].startswith("##")
        assert subword.wordpiece_count(word, vocab) == len(pieces)

    check()
