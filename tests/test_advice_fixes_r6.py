"""Regression pins for the round-5 ADVICE findings: each test fails
on the pre-fix code."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark import table_cli
from integritychecksforvldbs_spark.operators import search
from integritychecksforvldbs_spark.sources.catalog import rename_or_raise


def _run(capsys, *argv) -> dict:
    assert table_cli.main(list(argv)) == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


class _FakeFS:
    """Hadoop FileSystem stand-in whose rename() reports failure the
    Hadoop way: boolean false, no exception."""

    def __init__(self, ok: bool):
        self.ok = ok
        self.calls: list[tuple] = []

    def rename(self, src, dst):
        self.calls.append((src, dst))
        return self.ok


def test_rename_or_raise_surfaces_boolean_failure():
    """ADVICE (medium): a false return from FileSystem.rename() must
    abort the swap (before .bak delete / ledger append), not proceed."""
    rename_or_raise(_FakeFS(True), "a", "b")  # success: no raise
    with pytest.raises(IOError, match="rename failed"):
        rename_or_raise(_FakeFS(False), "a", "b")


def test_sink_swap_aborts_on_failed_rename(spark, tmp_path, monkeypatch):
    """A rename-in failure mid-swap must leave the .bak restorable and
    the batch NOT in the ledger, so the replay re-applies it."""
    from integritychecksforvldbs_spark.streaming import sink

    state = str(tmp_path / "state")
    w = sink.upsert_counts_sink(state, ["k"])
    w(spark.createDataFrame([(1, 10)], "k long, n long"), 0)
    assert {tuple(r) for r in spark.read.parquet(state).collect()} == {(1, 10)}

    import integritychecksforvldbs_spark.sources.catalog as catalog

    real = catalog._fs_and_path

    class _FailingRenameFS:
        def __init__(self, fs, fail_dst_suffix):
            self._fs = fs
            self._suffix = fail_dst_suffix

        def rename(self, src, dst):
            if str(dst).endswith(self._suffix):
                return False  # the Hadoop way: silent boolean failure
            return self._fs.rename(src, dst)

        def __getattr__(self, name):
            return getattr(self._fs, name)

    def patched(sp, path):
        fs, hp = real(sp, path)
        # fail only the rename INTO the live state path (tmp -> state)
        return _FailingRenameFS(fs, "/state"), hp

    monkeypatch.setattr(catalog, "_fs_and_path", patched)
    batch2 = spark.createDataFrame([(1, 20)], "k long, n long")
    with pytest.raises(IOError, match="rename failed"):
        w(batch2, 1)
    monkeypatch.undo()

    # the .bak still holds the installed copy; the ledger does NOT
    # contain batch 1 — a replay applies it for real
    raw = catalog.read_text_file(spark, state + "._batches.json")
    assert 1 not in set(json.loads(raw))
    w(batch2, 1)  # replay succeeds now that renames work again
    assert {tuple(r) for r in spark.read.parquet(state).collect()} == {(1, 20)}


def test_bloom_lookup_string_column_keeps_leading_zero(spark, tmp_path, capsys):
    """ADVICE (low): --value 0123 against a STRING column must probe
    '0123', not int 123 — the wrong hash silently skips files."""
    path = str(tmp_path / "codes")
    spark.createDataFrame(
        [("0123", 1), ("0456", 2), ("789", 3)], "code string, v long"
    ).coalesce(1).write.parquet(path)
    _run(capsys, "bloom-build", "--path", path, "--column", "code")
    s = _run(
        capsys, "bloom-lookup", "--path", path, "--column", "code",
        "--value", "0123",
    )
    assert s["rows"] == 1  # pre-fix: 0 (files wrongly skipped)


def test_zonemap_string_column_numeric_bounds(spark, tmp_path, capsys):
    """ADVICE (low): numeric-looking --lo/--hi on a STRING column must
    compare as strings, not raise TypeError against pyarrow stats."""
    path = str(tmp_path / "skeys")
    spark.createDataFrame(
        [("100",), ("200",), ("300",)], "k string"
    ).coalesce(1).write.parquet(path)
    s = _run(
        capsys, "zonemap", "--path", path, "--column", "k",
        "--lo", "100", "--hi", "150",
    )
    assert s["files_kept"] == 1


def test_query_terms_ascii_whitespace_matches_corpus_tokenizer(spark):
    """ADVICE (low): Java/DuckDB \\s is ASCII-only, so NBSP is a
    corpus TOKEN; the Python query tokenizer must produce it too."""
    text = "hello world"
    got = search.query_terms(text)
    assert " " in got  # pre-fix: swallowed by Python's Unicode \s
    corpus_side = spark.sql(
        "SELECT regexp_extract_all(lower('hello world'),"
        " '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\\\s]', 0) AS t"
    ).collect()[0]["t"]
    assert sorted(set(corpus_side)) == got
    # end-to-end: the NBSP-bearing doc scores on the NBSP term
    docs = spark.createDataFrame(
        [(1, text), (2, "hello world")], "doc_id long, text string"
    )
    scored = {
        r["doc_id"]: r["n_terms_hit"]
        for r in search.bm25_scores(docs, text).collect()
    }
    assert scored[1] == 3 and scored[2] == 2


@pytest.mark.parametrize(
    "case",
    ["equal", "nested_out_in_input", "nested_input_in_out"],
)
def test_scd2_apply_rejects_overlapping_out(spark, tmp_path, case):
    """ADVICE (low): overwrite to --out that overlaps an input would
    truncate the source mid-read; the CLI must refuse."""
    dim = str(tmp_path / "dim")
    snap = str(tmp_path / "snap")
    spark.createDataFrame(
        [(1, "a", "2020-01-01", None)],
        "k long, v string, valid_from string, valid_to string",
    ).write.parquet(dim)
    spark.createDataFrame([(1, "b")], "k long, v string").write.parquet(snap)
    out = {
        "equal": dim,
        "nested_out_in_input": dim + "/part",
        "nested_input_in_out": str(tmp_path),
    }[case]
    with pytest.raises(SystemExit) as ei:
        table_cli.main(
            ["scd2-apply", "--dim", dim, "--snapshot", snap,
             "--keys", "k", "--tracked", "v",
             "--as-of", "2021-01-01", "--out", out]
        )
    assert ei.value.code == 2


def test_repair_apply_rejects_overlapping_out(spark, tmp_path):
    rep = str(tmp_path / "rep")
    plan = str(tmp_path / "plan")
    spark.createDataFrame([(1, "a")], "k long, v string").write.parquet(rep)
    spark.createDataFrame(
        [(2, "b", "insert")], "k long, v string, op string"
    ).write.parquet(plan)
    with pytest.raises(SystemExit) as ei:
        table_cli.main(
            ["repair-apply", "--replica", rep, "--plan", plan,
             "--keys", "k", "--out", rep]
        )
    assert ei.value.code == 2
