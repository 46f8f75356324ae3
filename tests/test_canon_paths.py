"""The two file-path canonicalizers (Python listing side vs the
url_decode SQL side over input_file_name) must agree byte-for-byte —
the incremental-CHECKTABLE state joins on this key, and a silent
mismatch degrades every run to a full rescan."""

import sys

sys.path.insert(0, "/root/repo")

from integritychecksforvldbs_spark.expectations import expectations_for  # noqa: E402
from integritychecksforvldbs_spark.operators import kernels  # noqa: E402
from integritychecksforvldbs_spark.sources.catalog import list_parquet_files  # noqa: E402
from integritychecksforvldbs_spark.sources.loader import load_table  # noqa: E402
from tests.conftest import SF_DIR  # noqa: E402


def test_canonicalizers_agree_on_space_and_percent_paths(spark, tmp_path):
    # spaces AND a literal percent — input_file_name() URI-encodes both
    d = str(tmp_path / "docs dir 100% full")
    load_table(spark, f"{SF_DIR}/documents.parquet").limit(20).coalesce(
        1
    ).write.parquet(d)
    files = list_parquet_files(spark, d)
    canon_listing = {kernels._canon_file_path(f.path) for f in files}
    pdf = kernels.checktable_file_partials(
        spark, [f.path for f in files], expectations_for("documents")
    )
    canon_scan = {r["file_path"] for r in pdf.select("file_path").collect()}
    assert canon_listing == canon_scan


def test_non_local_schemes_pass_through_untouched():
    """hdfs:/s3a: URIs are NOT percent-decoded or scheme-stripped on
    the listing side; the SQL side's decode is gated on 'file:%' so
    both sides spell remote paths identically (a one-sided decode
    would make them never reconcile — every file re-scans forever)."""
    for p in (
        "hdfs://nn:8020/warehouse/a b/part-0.parquet",
        "hdfs://nn:8020/warehouse/enc%20oded/part-0.parquet",
        "s3a://bucket/prefix/100%25 full/part-0.parquet",
    ):
        assert kernels._canon_file_path(p) == p
