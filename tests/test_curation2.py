"""Round-4 curation kernels (operators/curation.py + text.gopher_filter):
PII scrub, corpus-level chunk dedup, incremental dedup, sequence
packing, Gopher composite filter — semantics pinned on toy frames,
invariants asserted on the fixture corpus."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.operators import curation, text

from conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    from integritychecksforvldbs_spark.sources.loader import load_table

    df = load_table(spark, f"{SF_DIR}/documents.parquet").cache()
    yield df
    # The SparkSession is session-scoped: a cache left behind here is
    # silently substituted into later modules' plans (InMemoryTableScan
    # prints its cached tree, inflating the plan-shape probes).
    df.unpersist()


# ---------------------------------------------------------------------------
# pii_scrub
# ---------------------------------------------------------------------------


def test_pii_scrub_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b-c@sub.example.org and x_9@y.io now"),
            (2, "call 555-123-4567 or 555-999-0000"),
            (3, "host 192.168.1.254 gateway 10.0.0.1"),
            (4, "clean text with no identifiers at all"),
            (5, "mix u@d.com 555-123-4567 10.0.0.1 done"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in curation.pii_scrub(df).collect()}
    assert (rows[1]["n_emails"], rows[1]["n_phones"], rows[1]["n_ips"]) == (2, 0, 0)
    assert (rows[2]["n_emails"], rows[2]["n_phones"], rows[2]["n_ips"]) == (0, 2, 0)
    assert (rows[3]["n_emails"], rows[3]["n_phones"], rows[3]["n_ips"]) == (0, 0, 2)
    assert (rows[4]["n_emails"], rows[4]["n_phones"], rows[4]["n_ips"]) == (0, 0, 0)
    assert (rows[5]["n_emails"], rows[5]["n_phones"], rows[5]["n_ips"]) == (1, 1, 1)
    # the digest pins every replaced byte
    expected = "mix <EMAIL> <PHONE> <IP> done"
    assert rows[5]["redacted_md5"] == hashlib.md5(expected.encode()).hexdigest()
    clean = "clean text with no identifiers at all"
    assert rows[4]["redacted_md5"] == hashlib.md5(clean.encode()).hexdigest()


def test_pii_scrub_fixture_clean(docs):
    """The raw fixture corpus carries no PII-shaped spans: the kernel
    must find nothing and leave every byte alone."""
    out = curation.pii_scrub(docs)
    assert out.filter("n_emails + n_phones + n_ips > 0").count() == 0


# ---------------------------------------------------------------------------
# chunk_dedup
# ---------------------------------------------------------------------------


def test_chunk_dedup_first_occurrence_wins(spark):
    """doc 1 and doc 2 are identical → doc 1 keeps everything, doc 2
    keeps nothing; doc 3 is unique → keeps everything."""
    t = "a b c d e f"  # 6 tokens → 2 chunks at chunk_size=3
    df = spark.createDataFrame(
        [(1, t), (2, t), (3, "g h i j")],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in curation.chunk_dedup(df, chunk_size=3).collect()}
    assert rows[1]["n_chunks"] == 2 and rows[1]["n_kept"] == 2
    assert rows[1]["kept_tokens"] == 6
    assert rows[2]["n_chunks"] == 2 and rows[2]["n_kept"] == 0
    assert rows[2]["kept_tokens"] == 0
    assert rows[3]["n_chunks"] == 2 and rows[3]["n_kept"] == 2
    assert rows[3]["kept_tokens"] == 4


def test_chunk_dedup_within_doc_repeat(spark):
    """A chunk repeated INSIDE one document dedups to its first
    position too (chunk_idx breaks the tie)."""
    df = spark.createDataFrame(
        [(7, "x y z x y z")], "doc_id bigint, text string"
    )
    r = curation.chunk_dedup(df, chunk_size=3).collect()[0]
    assert r["n_chunks"] == 2 and r["n_kept"] == 1 and r["kept_tokens"] == 3


def test_chunk_dedup_empty_doc_excluded(spark):
    df = spark.createDataFrame(
        [(1, "some real tokens here"), (2, ""), (3, "   ")],
        "doc_id bigint, text string",
    )
    ids = {r["doc_id"] for r in curation.chunk_dedup(df, chunk_size=2).collect()}
    assert ids == {1}


def test_chunk_dedup_fixture_conservation(docs):
    """Per-doc kept ≤ total, and global kept chunks = distinct chunk
    texts (each distinct chunk keeps exactly one copy)."""
    out = curation.chunk_dedup(docs, chunk_size=16).cache()
    try:
        assert out.filter("n_kept > n_chunks OR kept_tokens < 0").count() == 0
        total_kept = out.agg(F.sum("n_kept")).collect()[0][0]
        n_distinct = (
            curation.token_chunks(docs, chunk_size=16)
            .select("chunk_text")
            .distinct()
            .count()
        )
        assert total_kept == n_distinct
    finally:
        out.unpersist()


# ---------------------------------------------------------------------------
# dedup_increment
# ---------------------------------------------------------------------------


def _inc_fixture(spark):
    base = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "epsilon zeta")],
        "doc_id bigint, text string",
    )
    inc = spark.createDataFrame(
        [
            (10, "alpha beta"),  # dup_of_base
            (11, "brand new text"),  # new
            (12, "brand new text"),  # dup_in_increment (11 is first)
            (13, "other fresh words"),  # new
        ],
        "doc_id bigint, text string",
    )
    return base, inc


def test_dedup_increment_statuses(spark):
    base, inc = _inc_fixture(spark)
    rows = {r["doc_id"]: r["status"] for r in curation.dedup_increment(base, inc).collect()}
    assert rows == {
        10: "dup_of_base",
        11: "new",
        12: "dup_in_increment",
        13: "new",
    }


def test_dedup_increment_shuffled_semi_join_equal(spark):
    """broadcast_increment=False runs the same logic as a shuffled
    semi-join — identical output."""
    base, inc = _inc_fixture(spark)
    a = sorted(curation.dedup_increment(base, inc).collect())
    b = sorted(
        curation.dedup_increment(base, inc, broadcast_increment=False).collect()
    )
    assert a == b


def test_dedup_increment_exactly_once_append(spark):
    """Appending only status='new' rows to the base keeps the corpus
    exactly-once by content hash."""
    base, inc = _inc_fixture(spark)
    res = curation.dedup_increment(base, inc)
    new_ids = [r["doc_id"] for r in res.filter("status = 'new'").collect()]
    appended = base.select("text").unionByName(
        inc.filter(F.col("doc_id").isin(new_ids)).select("text")
    )
    assert (
        appended.groupBy(F.md5("text")).count().filter("count > 1").count() == 0
    )


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------


def test_pack_sequences_full_bins_invariant(docs):
    """Every bin except each source's last holds exactly seq_len
    tokens; token totals are conserved; every bin has ≥1 doc."""
    L = 256
    out = curation.pack_sequences(docs, seq_len=L).cache()
    try:
        last = out.groupBy("source").agg(F.max("bin_idx").alias("last_bin"))
        not_last = out.join(last, "source").filter(
            F.col("bin_idx") < F.col("last_bin")
        )
        assert not_last.filter(F.col("n_tokens") != L).count() == 0
        assert (
            out.filter("n_docs < 1 OR n_tokens < 1 OR n_tokens > %d" % L).count()
            == 0
        )
        total_packed = out.agg(F.sum("n_tokens")).collect()[0][0]
        total_tokens = docs.select(
            F.expr("size(filter(split(text, ' '), x -> x <> ''))").alias("n")
        ).agg(F.sum("n")).collect()[0][0]
        assert total_packed == total_tokens
    finally:
        out.unpersist()


def test_pack_sequences_single_long_doc_spans_bins(spark):
    """One 10-token doc at seq_len=4 spans bins 0,1,2 with 4+4+2
    tokens and n_docs=1 in each."""
    df = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9", "s")],
        "doc_id bigint, text string, source string",
    )
    rows = sorted(
        curation.pack_sequences(df, seq_len=4).collect(), key=lambda r: r["bin_idx"]
    )
    assert [(r["bin_idx"], r["n_docs"], r["n_tokens"]) for r in rows] == [
        (0, 1, 4),
        (1, 1, 4),
        (2, 1, 2),
    ]


# ---------------------------------------------------------------------------
# curate_funnel
# ---------------------------------------------------------------------------


def test_curate_funnel_monotone_and_consistent(docs):
    """Stage counts are monotone non-increasing, stage 1 equals the
    raw corpus, and the quality stage equals applying gopher_filter
    by hand."""
    rows = {
        r["stage"]: r for r in curation.curate_funnel(docs, n=5, cap_k=20).collect()
    }
    order = ["1_raw", "2_quality", "3_dedup", "4_decontaminated", "5_capped"]
    assert list(rows) and set(order) == set(rows)
    counts = [rows[s]["n_docs"] for s in order]
    tokens = [rows[s]["n_tokens"] for s in order]
    assert counts == sorted(counts, reverse=True)
    assert tokens == sorted(tokens, reverse=True)
    assert rows["1_raw"]["n_docs"] == docs.count()
    n_quality = docs.join(
        text.gopher_filter(docs).filter("keep = 1").select("doc_id"), "doc_id"
    ).count()
    assert rows["2_quality"]["n_docs"] == n_quality


def test_curate_funnel_benchmark_docs_dropped(spark):
    """Benchmark documents (doc_id % benchmark_mod == 0) never reach
    the decontaminated stage; a doc sharing an n-gram with one is
    dropped too — even though neither pair is a near-dup (the shared
    trigram keeps jaccard ≈ 0.39 < 0.5, so dedup keeps all three)."""
    stop = "the a and of to in is it that for"
    df = spark.createDataFrame(
        [
            (20, stop + " secret benchmark passage qq rr ss"),
            (1, stop + " mundane filler secret benchmark passage uu vv ww xx yy"),
            (2, "a the of and in to is that it for unrelated content entirely disjoint tokens"),
        ],
        "doc_id bigint, text string",
    ).withColumn("source", F.lit("s"))
    rows = {
        r["stage"]: r["n_docs"]
        for r in curation.curate_funnel(df, n=3, benchmark_mod=20).collect()
    }
    assert rows["1_raw"] == 3 and rows["2_quality"] == 3 and rows["3_dedup"] == 3
    # doc 20 is benchmark, doc 1 overlaps it -> only doc 2 survives
    assert rows["4_decontaminated"] == 1 and rows["5_capped"] == 1


def test_curate_funnel_bench_grams_survive_dedup_of_bench_doc(spark):
    """A benchmark doc removed by DEDUP (its identical twin has the
    smaller id) must still flag overlapping training docs: the
    benchmark split is computed from the RAW corpus, not the
    survivor pool."""
    stop = "the a and of to in is it that for"
    bench_text = stop + " secret benchmark passage qq rr ss"
    df = spark.createDataFrame(
        [
            (20, bench_text),
            (3, bench_text),  # identical twin, smaller id -> dedup keeper
            (1, stop + " mundane filler secret benchmark passage uu vv ww xx yy"),
            (2, "a the of and in to is that it for unrelated content entirely disjoint tokens"),
        ],
        "doc_id bigint, text string",
    ).withColumn("source", F.lit("s"))
    rows = {
        r["stage"]: r["n_docs"]
        for r in curation.curate_funnel(df, n=3, benchmark_mod=20).collect()
    }
    # dedup removes doc 20 (keeper = 3), yet its grams still kill docs
    # 3 and 1 at decontamination; only doc 2 survives
    assert rows["3_dedup"] == 3
    assert rows["4_decontaminated"] == 1 and rows["5_capped"] == 1


# ---------------------------------------------------------------------------
# gopher_filter
# ---------------------------------------------------------------------------


def test_gopher_filter_rule_boundaries(spark):
    stop_pad = "the a and of to in is it that for"  # 10 words, all stopwords
    df = spark.createDataFrame(
        [
            (1, stop_pad + " some regular words follow here"),  # keeps
            (2, "too short"),  # < 10 words
            (3, " ".join(["x"] * 20)),  # mean word len 1.0 < 1.5, no stopwords
            (4, " ".join(["the", "of"] + ["99"] * 28)),  # only 2/30 alpha words
            (5, stop_pad + " " + " ".join(["supercalifragilistic" * 3] * 10)),
        ],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in text.gopher_filter(df).collect()}
    assert rows[1]["keep"] == 1
    assert rows[1]["n_stopword_hits"] >= 10
    assert rows[2]["keep"] == 0  # length rule
    assert rows[3]["keep"] == 0  # mean-word-length + stopword rules
    assert rows[3]["mean_word_len_e2"] == 100
    assert rows[4]["keep"] == 0  # alpha-fraction rule
    assert rows[5]["keep"] == 0  # mean word length > 10
    assert rows[5]["mean_word_len_e2"] > 1000


def test_gopher_filter_empty_doc_total(spark):
    df = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id bigint, text string")
    rows = {r["doc_id"]: r for r in text.gopher_filter(df).collect()}
    for r in rows.values():
        assert r["keep"] == 0 and r["n_words"] == 0 and r["mean_word_len_e2"] == 0


# ---------------------------------------------------------------------------
# minhash_lsh_increment_pairs (cross-corpus near-dup tier)
# ---------------------------------------------------------------------------


def test_increment_near_pairs_cross_only(spark):
    """Only (inc, base) pairs appear — identical base-base twins and
    inc-inc twins must NOT pair; an exact inc copy of a base doc pairs
    at jaccard 1.0."""
    from integritychecksforvldbs_spark.operators import dedup

    t = "alpha beta gamma delta epsilon zeta eta theta"
    base = spark.createDataFrame(
        [(1, t), (2, t), (3, "totally different words entirely here now")],
        "doc_id bigint, text string",
    )
    inc = spark.createDataFrame(
        [(10, t), (11, t), (12, "fresh unrelated increment content words")],
        "doc_id bigint, text string",
    )
    rows = dedup.minhash_lsh_increment_pairs(base, inc).collect()
    got = {(r["inc_id"], r["base_id"]): r["jaccard"] for r in rows}
    # both identical inc docs pair with both identical base docs
    assert set(got) == {(10, 1), (10, 2), (11, 1), (11, 2)}
    assert all(j == 1.0 for j in got.values())


def test_increment_near_pairs_match_bruteforce(spark):
    """On a small corpus the LSH tier must find exactly the pairs the
    quadratic cross jaccard finds (gate-corpus pairs sit at j >= 0.9
    where band recall is ~1)."""
    from integritychecksforvldbs_spark.operators import dedup

    words = ["w%d" % i for i in range(12)]
    base_docs = [(i, " ".join(words[i % 3 :] + words[: i % 3])) for i in range(1, 4)]
    # inc doc 10 = rotation of base doc 1's text with one word changed
    t = base_docs[0][1].split()
    t[0] = "zz"
    inc_docs = [(10, " ".join(t)), (11, "aa bb cc dd ee ff gg hh")]
    base = spark.createDataFrame(base_docs, "doc_id bigint, text string")
    inc = spark.createDataFrame(inc_docs, "doc_id bigint, text string")

    def grams(s, n=3):
        toks = s.split()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    want = set()
    for bi, bt in base_docs:
        for ii, it in inc_docs:
            a, b = grams(it), grams(bt)
            if not a or not b:
                continue
            j = len(a & b) / len(a | b)
            if j >= 0.5:
                want.add((ii, bi))
    got = {
        (r["inc_id"], r["base_id"])
        for r in dedup.minhash_lsh_increment_pairs(base, inc).collect()
    }
    assert got == want and want  # non-degenerate: at least one pair


def test_tokens_expr_swaps_tokenization(docs):
    """The pluggable token count: a BPE-proxy (ceil(chars/4)) must flow
    through pack_sequences, mixture_allocation, and budget_fill in the
    same units, preserving each operator's invariants."""
    bpe = "CAST(ceil(length(text) / 4.0) AS BIGINT)"
    L = 256

    packed = curation.pack_sequences(docs, seq_len=L, tokens_expr=bpe).cache()
    # every non-final bin holds exactly seq_len tokens
    last = packed.groupBy("source").agg(F.max("bin_idx").alias("last_bin"))
    full = packed.join(
        last,
        (packed["source"] == last["source"])
        & (packed["bin_idx"] < last["last_bin"]),
    )
    assert full.filter(F.col("n_tokens") != L).count() == 0
    # totals equal the custom expression's corpus sum per source
    want = {
        r["source"]: r["n"]
        for r in docs.filter(F.expr(bpe) > 0)
        .groupBy("source")
        .agg(F.sum(F.expr(bpe)).alias("n"))
        .collect()
    }
    got = {
        r["source"]: r["n"]
        for r in packed.groupBy("source").agg(F.sum("n_tokens").alias("n")).collect()
    }
    assert got == want
    packed.unpersist()

    # budget_fill: allocation and fill share the custom units, so each
    # source's kept set starts within its alloc_tokens budget
    alloc = {
        r["source"]: r["alloc_tokens"]
        for r in curation.mixture_allocation(
            docs, 10_000, tokens_expr=bpe
        ).collect()
    }
    fill = curation.budget_fill(docs, 10_000, tokens_expr=bpe)
    kept = fill.filter("kept").groupBy("source").agg(
        F.max(F.col("cum_tokens") - F.col("n_tokens")).alias("max_start")
    )
    for r in kept.collect():
        assert r["max_start"] < alloc[r["source"]]
    # and the default (whitespace) selection genuinely differs
    default_kept = curation.budget_fill(docs, 10_000).filter("kept").count()
    custom_kept = fill.filter("kept").count()
    assert default_kept != custom_kept
