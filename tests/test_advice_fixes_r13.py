"""Round-13 ADVICE fixes on the versioned predicate-profile pruning.

1. (high) A date-function atom over a STRING-typed column emits
   datetime bounds whose comparison against the column's string stats
   raised TypeError inside :func:`_prune_manifest_files` — so
   ``read_sql_where``/``explain_pruning``/EXPLAIN PRUNE crashed on a
   query that used to (correctly) read unpruned.  The fix routes the
   bounds comparison through the TypeError-guarded ``_stat_lt``:
   incomparable types never tighten, the file is kept, the residual
   filter decides truth (ADVICE r13 high, versioned.py
   _prune_manifest_files).
2. (low) The LIKE-prefix upper bound ``prefix[:-1] +
   chr(ord(prefix[-1]) + 1)`` could synthesize an unpaired surrogate
   (prefix ending in U+D7FF → U+D800) that ``F.lit`` cannot
   UTF-8-encode, erroring the query instead of reading unpruned.  The
   fix skips the surrogate block (→ U+E000), a looser but equally
   sound bound (ADVICE r13 low, versioned.py LIKE atom).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def str_date_tbl(spark, tmp_path):
    """A table whose date column is a plain STRING (ISO text) — the
    shape the date-fn atoms must survive, not prune."""
    path = str(tmp_path / "sdt")
    df = spark.createDataFrame(
        [
            (i, f"2024-01-{(i % 9) + 1:02d}", f"name-{i}")
            for i in range(40)
        ],
        "k int, s string, nm string",
    )
    versioned.commit(spark, df.repartitionByRange(4, "k"), path)
    return path


# ---------------------------------------------------------------------------
# 1. date-fn atom over a string column: unpruned read, never a crash
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "cond",
    [
        "to_date(s) = '2024-01-05'",
        "CAST(s AS DATE) >= '2024-01-03'",
        "year(s) = 2024",
    ],
)
def test_date_fn_atom_over_string_column_reads_unpruned(
    spark, str_date_tbl, cond
):
    got = versioned.read_sql_where(spark, str_date_tbl, cond)
    exp = versioned.read(spark, str_date_tbl).filter(F.expr(cond))
    assert _rows(got) == _rows(exp)
    assert got.count() > 0  # the predicate really selects rows


def test_date_fn_atom_over_string_column_explain_no_crash(
    spark, str_date_tbl
):
    info = versioned.explain_pruning(
        spark, str_date_tbl, "to_date(s) = '2024-01-05'"
    )
    # incomparable bound: every file kept (conservative), no raise
    assert info["files_after_stats"] == info["files_total"]


def test_stat_lt_guard_keeps_incomparable_file():
    """Unit pin on the exact comparison the crash used: datetime
    bound vs string stat must KEEP the file, not raise."""
    import datetime

    man = {
        "files": ["f1"],
        "stats": {
            "f1": {
                "n_rows": 5,
                "cols": {
                    "s": {
                        "ok": True,
                        "min": "2024-01-01",
                        "max": "2024-01-09",
                        "nulls": 0,
                        "nulls_ok": True,
                    }
                },
            }
        },
    }
    lo = datetime.date(2024, 1, 5)
    kept, skipped = versioned._prune_manifest_files(
        man, {"s": (lo, lo)}, None, None
    )
    assert kept == ["f1"] and skipped == []


# ---------------------------------------------------------------------------
# 2. LIKE prefix ending at the surrogate boundary
# ---------------------------------------------------------------------------


def test_like_prefix_surrogate_boundary_bound_is_encodable(spark, tmp_path):
    path = str(tmp_path / "sur")
    edge = "a" + chr(0xD7FF)  # next codepoint is the surrogate block
    df = spark.createDataFrame(
        [(1, edge + "x"), (2, "zzz"), (3, edge)], "k int, s string"
    )
    versioned.commit(spark, df, path)
    cond = f"s LIKE '{edge}%'"
    got = versioned.read_sql_where(spark, path, cond)
    assert sorted(r.k for r in got.collect()) == [1, 3]
    # and the profile's upper bound is not an unpaired surrogate
    bounds, _ = versioned._condition_profile(cond)
    lo, hi = bounds["s"]
    assert lo == edge
    assert not (0xD800 <= ord(hi[-1]) <= 0xDFFF)


def test_like_prefix_normal_case_unchanged():
    bounds, _ = versioned._condition_profile("nm LIKE 'name-1%'")
    assert bounds["nm"] == ("name-1", "name-2")
