"""Property tests for the round-4 fifth-wave curation kernels:
leakage-safe splits (near-dup clusters never straddle splits) and the
budget-filling mixture sampler (deterministic prefix selection)."""

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from integritychecksforvldbs_spark.operators import curation, dedup, sampling  # noqa: E402


@pytest.fixture(scope="module")
def docs_with_twins(spark):
    """A corpus with guaranteed near-dup pairs: ids 9000+i are copies
    of ids i (0..9) with one word appended, plus unpaired filler."""
    rows = []
    for i in range(30):
        text = " ".join(f"tok{i}w{j}" for j in range(30))
        rows.append((i, text, "web" if i % 2 == 0 else "books"))
    for i in range(10):
        text = " ".join(f"tok{i}w{j}" for j in range(30)) + " extra"
        rows.append((9000 + i, text, "web"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_twins_never_straddle_splits(docs_with_twins):
    pairs = dedup.minhash_lsh_pairs(docs_with_twins)
    assert pairs.count() >= 10  # the construction must actually pair up
    split = curation.leakage_safe_split(docs_with_twins, pairs=pairs)
    by_id = {r.doc_id: r.split for r in split.collect()}
    for p in pairs.collect():
        assert by_id[p.doc_id_a] == by_id[p.doc_id_b], (
            f"pair ({p.doc_id_a},{p.doc_id_b}) split "
            f"{by_id[p.doc_id_a]} vs {by_id[p.doc_id_b]}"
        )


def test_unpaired_docs_match_plain_split_assign(docs_with_twins):
    pairs = dedup.minhash_lsh_pairs(docs_with_twins)
    paired = {r.doc_id_a for r in pairs.collect()} | {
        r.doc_id_b for r in pairs.collect()
    }
    leak = {
        r.doc_id: r.split
        for r in curation.leakage_safe_split(docs_with_twins, pairs=pairs).collect()
    }
    plain = {
        r.doc_id: r.split
        for r in sampling.split_assign(
            docs_with_twins, val_per_mille=100, test_per_mille=100
        ).collect()
    }
    for doc_id, s in plain.items():
        if doc_id not in paired:
            assert leak[doc_id] == s


def test_budget_fill_is_a_deterministic_prefix(tables):
    docs = tables["documents"]
    out = curation.budget_fill(docs, target_tokens=10_000).collect()
    by_source = {}
    for r in out:
        by_source.setdefault(r.source, []).append(r)
    for source, rows in by_source.items():
        rows.sort(key=lambda r: r.cum_tokens)
        kept_flags = [r.kept for r in rows]
        # kept rows form a PREFIX of the md5 order (no gaps)
        first_drop = kept_flags.index(False) if False in kept_flags else len(rows)
        assert all(kept_flags[:first_drop])
        assert not any(kept_flags[first_drop:])
        # overshoot is at most one document
        kept = rows[:first_drop]
        if kept and first_drop < len(rows):
            total = sum(r.n_tokens for r in kept)
            assert total - kept[-1].n_tokens < total  # sanity
            # the budget was genuinely filled: dropping the last kept
            # doc goes under the allocation that admitted it
            assert kept[-1].cum_tokens - kept[-1].n_tokens < total


def test_budget_fill_stable_under_repartition(tables):
    docs = tables["documents"]
    a = {
        (r.doc_id, r.cum_tokens, r.kept)
        for r in curation.budget_fill(docs, target_tokens=10_000).collect()
    }
    b = {
        (r.doc_id, r.cum_tokens, r.kept)
        for r in curation.budget_fill(
            docs.repartition(7), target_tokens=10_000
        ).collect()
    }
    assert a == b


def test_budget_fill_kept_tokens_near_allocation(tables):
    docs = tables["documents"]
    target = 10_000
    alloc = {
        r.source: r.alloc_tokens
        for r in curation.mixture_allocation(docs, target_tokens=target).collect()
    }
    out = curation.budget_fill(docs, target_tokens=target).collect()
    per = {}
    for r in out:
        if r.kept:
            per.setdefault(r.source, []).append(r.n_tokens)
    for source, kept_tokens in per.items():
        total = sum(kept_tokens)
        # filled to at least the budget OR the source ran out of docs
        n_all = sum(1 for r in out if r.source == source)
        if len(kept_tokens) < n_all:
            assert total >= alloc[source]
        # overshoot bounded by the last document
        assert total - max(kept_tokens) < alloc[source]


def test_temperature_mixture_t1_is_proportional(tables):
    docs = tables["documents"]
    prop = {
        r.source: r.alloc_tokens
        for r in curation.mixture_allocation(docs, target_tokens=50_000).collect()
    }
    t1 = {
        r.source: r.alloc_tokens
        for r in curation.temperature_mixture(
            docs, target_tokens=50_000, temperature=1.0
        ).collect()
    }
    assert t1 == prop


def test_temperature_mixture_flattens_shares(tables):
    """T=2 lifts the smallest source's share and shrinks the largest's
    relative to proportional; allocations never exceed the target."""
    docs = tables["documents"]
    target = 100_000
    prop = curation.temperature_mixture(docs, target, temperature=1.0).collect()
    sq = curation.temperature_mixture(docs, target, temperature=2.0).collect()
    assert sum(r.alloc_tokens for r in sq) <= target
    by_tok = {r.source: r.src_tokens for r in prop}
    lo = min(by_tok, key=by_tok.get)
    hi = max(by_tok, key=by_tok.get)
    p = {r.source: r.alloc_tokens for r in prop}
    s = {r.source: r.alloc_tokens for r in sq}
    if by_tok[lo] < by_tok[hi]:  # non-degenerate corpus
        assert s[lo] >= p[lo]
        assert s[hi] <= p[hi]


def test_temperature_mixture_rejects_nonpositive_t(tables):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="temperature"):
        curation.temperature_mixture(tables["documents"], temperature=0.0)


def test_dedup_spans_window_equals_antijoin(spark):
    """min_dup_docs=2 dispatches to the one-window form; it must equal
    the aggregate+anti-join engine (still used for other thresholds)
    on NULL spans, NULL doc_ids, short spans, and within-doc repeats."""
    from pyspark.sql import functions as F

    from integritychecksforvldbs_spark.operators.curation import dedup_spans

    rows = [
        (1, "alpha beta"), (2, "alpha beta"),          # cross-doc dup
        (3, "gamma"), (3, "gamma"),                     # same-doc repeat
        (4, None), (5, None),                           # NULL spans
        (None, "delta"), (6, "delta"),                  # NULL doc id
        (7, ""), (8, ""),                               # short (min_chars)
        (9, "unique one"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, chunk_text string")
    key = lambda t: (t[0] is None, t[0], t[1] is None, t[1])
    fast = sorted(
        (
            (r["doc_id"], r["chunk_text"])
            for r in dedup_spans(df, min_dup_docs=2).collect()
        ),
        key=key,
    )
    # force the anti-join engine via an equivalent threshold-3 call on
    # a frame where every dup span is tripled: simpler — rebuild the
    # reference inline
    dup = (
        df.filter(F.length("chunk_text") >= 1)
        .groupBy("chunk_text")
        .agg(F.countDistinct("doc_id").alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("chunk_text")
    )
    ref = sorted(
        (
            (r["doc_id"], r["chunk_text"])
            for r in df.join(dup, on="chunk_text", how="left_anti").collect()
        ),
        key=key,
    )
    assert fast == ref
