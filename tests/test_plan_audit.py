"""Plan-audit tool: extracted properties agree with the pinned plan
shapes the dedicated tests assert."""

from __future__ import annotations

import pytest

from integritychecksforvldbs_spark.operators import text
from integritychecksforvldbs_spark.plans.audit import audit_frame, plan_audit
from integritychecksforvldbs_spark.sources.loader import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    spark.catalog.clearCache()
    return load_table(spark, f"{SF_DIR}/documents.parquet")


def test_projection_audit(docs):
    a = plan_audit(text.quality_score(docs))
    assert a.data_shuffles == 0
    assert a.broadcasts == 0
    assert a.scans == 1
    assert a.python_eval_nodes == 0
    assert a.codegen_spans >= 1


def test_lm_audit_sees_broadcast_and_shuffles(docs):
    a = plan_audit(text.lm_transition_surprise(docs))
    assert a.data_shuffles == 2
    assert a.broadcasts == 1
    assert a.python_eval_nodes == 0


def test_pushed_filter_detected(docs):
    a = plan_audit(docs.filter("doc_id > 100").select("doc_id"))
    assert a.scans_with_pushed_filters == 1
    a2 = plan_audit(docs.select("doc_id"))
    assert a2.scans_with_pushed_filters == 0


def test_partition_filter_detected(spark, docs, tmp_path):
    p = str(tmp_path / "bylang")
    docs.withColumn("l2", docs["lang"]).write.partitionBy("l2").mode(
        "overwrite"
    ).parquet(p)
    pruned = spark.read.parquet(p).filter("l2 = 'en'")
    assert plan_audit(pruned).scans_with_partition_filters == 1


def test_audit_frame_over_contract_queries(spark):
    import __spark_entry__ as mod

    qs = mod.queries()
    pick = ["checktable_documents", "text_winnow", "dedup_minhash_lsh"]
    out = {
        r["query"]: r
        for r in audit_frame(spark, qs, SF_DIR, names=pick).collect()
    }
    assert set(out) == set(pick)
    # the fused CHECKTABLE contract: no Python, bounded shuffles
    assert out["checktable_documents"]["python_eval_nodes"] == 0
    assert out["text_winnow"]["data_shuffles"] == 0


def test_roundrobin_counted_separately(docs):
    from integritychecksforvldbs_spark.plans.audit import plan_audit

    a = plan_audit(docs.repartition(8).select("doc_id"))
    assert a.roundrobin_repartitions == 1
    assert a.data_shuffles == 0
