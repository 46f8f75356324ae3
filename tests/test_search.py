"""BM25 keyword retrieval (operators/search.py): brute-force value
parity, edge semantics, determinism, and the plan-shape contract
(broadcast statistics joins, TakeOrderedAndProject top-k)."""

from __future__ import annotations

import math
import re

import pytest

from integritychecksforvldbs_spark.operators import search
from integritychecksforvldbs_spark.sources.bucketing import plan_data_shuffles

CORPUS = [
    (1, "spark merges the window window window"),
    (2, "a tiny doc"),
    (3, "window merge spark spark spark merge window"),
    (4, "nothing relevant here at all in this one"),
    (5, "spark"),
    (6, "the window"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def _brute_bm25(query: str, k1=search.K1_DEFAULT, b=search.B_DEFAULT):
    """Reference implementation in plain Python."""
    tok = re.compile("[a-z]+|[0-9]|[^a-z0-9\\s]")
    corpus = {i: tok.findall(t.lower()) for i, t in CORPUS}
    n = len(corpus)
    avgdl = sum(len(v) for v in corpus.values()) / n
    terms = sorted(set(tok.findall(query.lower())))
    df_t = {
        t: sum(1 for v in corpus.values() if t in v) for t in terms
    }
    out = {}
    for i, toks in corpus.items():
        s, hit = 0.0, 0
        for t in terms:
            tf = toks.count(t)
            if tf == 0 or df_t[t] == 0:
                continue
            hit += 1
            idf = math.log(1 + (n - df_t[t] + 0.5) / (df_t[t] + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if hit:
            out[i] = (hit, round(s, 4))
    return out


def test_bm25_matches_bruteforce(docs):
    got = {
        r["doc_id"]: (r["n_terms_hit"], r["score"])
        for r in search.bm25_scores(docs, "spark window").collect()
    }
    assert got == _brute_bm25("spark window")


def test_bm25_topk_order_and_rank(docs):
    rows = search.bm25_topk(docs, "spark window", k=3).collect()
    want = sorted(
        _brute_bm25("spark window").items(),
        key=lambda kv: (-kv[1][1], kv[0]),
    )[:3]
    assert [(r["rank"], r["doc_id"], r["score"]) for r in rows] == [
        (i + 1, d, s) for i, (d, (_, s)) in enumerate(want)
    ]


def test_bm25_unknown_terms_ignored(docs):
    """A term absent from the corpus changes nothing — same rows, same
    scores (the df join simply never matches)."""
    a = sorted(map(tuple, search.bm25_scores(docs, "spark window").collect()))
    b = sorted(
        map(tuple, search.bm25_scores(docs, "spark window zzzzqqq").collect())
    )
    assert a == b


def test_bm25_empty_query_raises(docs):
    with pytest.raises(ValueError):
        search.bm25_scores(docs, "   ")


def test_bm25_no_match_is_empty(docs):
    assert search.bm25_scores(docs, "zzzzqqq").count() == 0


def test_bm25_plan_shape(docs):
    """With precomputed corpus stats, one query = ONE corpus scan and
    exactly the three candidate-sized shuffles ((doc,term) tf, the
    token-partitioned df window, the per-doc sum); top-k must ride
    TakeOrderedAndProject, never a global sort exchange."""
    stats = search.corpus_stats(docs)
    top = search.bm25_topk(docs, "spark window", k=3, stats=stats)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert plan_data_shuffles(top) == 3
    assert plan.count("Scan ExistingRDD") == 1  # corpus read once
    assert "TakeOrderedAndProject" in plan


def test_bm25_stats_reuse_matches_inline(docs):
    """Passing precomputed stats must not change a single score."""
    stats = search.corpus_stats(docs)
    a = sorted(map(tuple, search.bm25_scores(docs, "spark window").collect()))
    b = sorted(
        map(
            tuple,
            search.bm25_scores(docs, "spark window", stats=stats).collect(),
        )
    )
    assert a == b


def test_indexed_bm25_equals_direct(spark, tmp_path):
    """The materialized index answers identically to the direct scan."""
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    idx = str(tmp_path / "bm25_idx")
    search.build_bm25_index(spark, docs, idx)
    for q in ("spark window", "merge", "window tiny doc"):
        direct = [tuple(r) for r in search.bm25_topk(docs, q, k=4).collect()]
        indexed = [
            tuple(r)
            for r in search.bm25_topk_indexed(spark, idx, q, k=4).collect()
        ]
        assert direct == indexed


def test_indexed_bm25_pushes_token_filter(spark, tmp_path):
    """The query must never read the corpus: the plan scans postings
    with the token IN predicate pushed to the parquet reader."""
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    idx = str(tmp_path / "bm25_idx2")
    search.build_bm25_index(spark, docs, idx)
    top = search.bm25_topk_indexed(spark, idx, "spark window", k=3)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(token" in plan
    assert "text" not in top.columns
