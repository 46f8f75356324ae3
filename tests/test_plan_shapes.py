"""Plan-shape probes for the pipeline operators: the number of DATA
shuffles each plan is allowed is pinned, so a refactor that silently
adds a repartition of the corpus fails here long before it shows up as
a 100 TB incident."""

from __future__ import annotations

import pytest

from integritychecksforvldbs_spark.operators import sampling, text
from integritychecksforvldbs_spark.sources.bucketing import plan_data_shuffles
from integritychecksforvldbs_spark.sources.loader import load_table
from integritychecksforvldbs_spark.streaming import sessions

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    # Plan probes must measure the declarative plan: a cache leaked by
    # an earlier module would substitute InMemoryTableScan fragments
    # (whose printed tree carries the cached plan's exchanges) into
    # these plans and skew the shuffle counts.
    spark.catalog.clearCache()
    return load_table(spark, f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def events(spark):
    spark.catalog.clearCache()
    return load_table(spark, f"{SF_DIR}/events.parquet")


def test_sampling_is_shuffle_free(docs):
    """Deterministic sampling is a pure filter — zero shuffles, so it
    composes under any downstream op without a repartition tax."""
    assert plan_data_shuffles(sampling.deterministic_sample(docs, 16)) == 0
    assert (
        plan_data_shuffles(
            sampling.stratified_sample(docs, "lang", {"en": 500})
        )
        == 0
    )


def test_text_projections_are_shuffle_free(docs):
    """The per-document text kernels are projections over one scan."""
    assert plan_data_shuffles(text.token_stats(docs)) == 0
    assert plan_data_shuffles(text.quality_score(docs)) == 0
    assert plan_data_shuffles(text.lang_id(docs)) == 0
    assert plan_data_shuffles(text.fingerprint(docs)) == 0
    assert plan_data_shuffles(text.winnow_fingerprints(docs)) == 0
    assert plan_data_shuffles(text.repetition_stats(docs)) == 0


def test_sessionization_shuffles_once(events):
    """Session windows need exactly ONE hash shuffle (on the session
    key); a second would mean the window merge isn't running inside
    the aggregation."""
    assert plan_data_shuffles(sessions.session_counts(events)) == 1


def test_vocabulary_shuffle_budget(docs):
    """Vocabulary = exactly the 2 shuffles exact COUNT DISTINCT per
    group costs — dedupe on (token, doc_id), regroup on token — each
    preceded by a map-side partial aggregate, and the global top-k
    must ride TakeOrderedAndProject (distributed partial top-k), not
    a global sort exchange."""
    df = text.vocabulary(docs, k=50)
    assert plan_data_shuffles(df) == 2
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan  # map-side combine before exchange


def test_rarity_score_shuffle_budget(docs):
    """TF-IDF shape over the COLLAPSED (doc, token, cnt) stream:
    per-doc token-count agg, df agg, join-back, doc regroup.  Four
    key-shuffles is the declarative budget — the extra exchange vs
    the raw-stream form buys every later shuffle carrying one row per
    distinct (doc, token), and df_count degrades from a two-phase
    countDistinct to a plain count.  AQE may broadcast the df table
    at runtime, but the static plan must not exceed the budget."""
    assert plan_data_shuffles(text.rarity_score(docs)) <= 4


def test_pii_scrub_is_shuffle_free(docs):
    """Regex detection + redaction is a pure projection."""
    from integritychecksforvldbs_spark.operators import curation

    assert plan_data_shuffles(curation.pii_scrub(docs)) == 0


def test_pack_sequences_single_shuffle(docs):
    """Packing = ONE hash shuffle (the per-source window); the span
    explode is row-local and the per-bin aggregation reuses the
    window's partitioning (hash(source) satisfies the (source, bin)
    clustering requirement), so a second exchange of the corpus is a
    regression."""
    from integritychecksforvldbs_spark.operators import curation

    assert plan_data_shuffles(curation.pack_sequences(docs)) == 1


def test_chunk_dedup_shuffle_budget(docs):
    """Chunk dedup = the chunk-hash MIN (1), the first-owner join
    back (≤2 sides), and the per-doc summary (1) — anything more
    means the corpus is being repartitioned redundantly."""
    from integritychecksforvldbs_spark.operators import curation

    assert plan_data_shuffles(curation.chunk_dedup(docs)) <= 4


def test_dedup_increment_never_shuffles_base(docs):
    """The base corpus feeds a broadcast LeftSemi probe directly above
    its scan: no Exchange may sit between the base FileScan and the
    semi-join.  (At 100 TB the base side IS the job — shuffling it
    once costs more than the whole increment.)"""
    from pyspark.sql import functions as F

    from integritychecksforvldbs_spark.operators import curation

    base = docs.filter("doc_id % 10 <> 0").select("doc_id", "text")
    inc = docs.filter("doc_id % 10 = 0").select("doc_id", "text")
    plan = (
        curation.dedup_increment(base, inc)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # walk the plan: the LeftSemi join's streamed (base) side must be
    # exchange-free down to the scan
    semi_at = plan.index("LeftSemi")
    streamed = plan[semi_at : plan.index("BroadcastExchange", semi_at)]
    assert "Exchange hashpartitioning" not in streamed


def test_gopher_filter_is_shuffle_free(docs):
    assert plan_data_shuffles(text.gopher_filter(docs)) == 0


def test_lm_surprise_shuffle_budget(docs):
    """Bigram-LM scoring = model groupBy(gram) + per-doc regroup; the
    model probe is a broadcast join (never a shuffle of the gram
    stream) and the <2-token branch unions in shuffle-free."""
    assert plan_data_shuffles(text.lm_transition_surprise(docs)) == 2


def test_fuzzy_dup_pairs_shuffle_budget(docs):
    """Fuzzy join budget: occurrence-rank window (1), the (gram, occ)
    equi-join (2 sides), the pair-count aggregation (1), and the two
    string joins back for the levenshtein verify (bounded by candidate
    count; ≤2 more key exchanges + the short-band join).  Anything
    beyond 8 keyed exchanges means the gram stream is being
    repartitioned redundantly."""
    from integritychecksforvldbs_spark.operators import dedup

    titled = docs.selectExpr("doc_id", "substring(text, 1, 24) AS title")
    assert plan_data_shuffles(dedup.fuzzy_dup_pairs(titled)) <= 8
