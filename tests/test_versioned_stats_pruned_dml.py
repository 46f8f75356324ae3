"""Stats-pruned DML probes (round-10 item #6 — the explicit-no answer
to partition-column layout).

The versioned format keeps data files flat and prunes by manifest
min/max stats instead of a hive directory scheme (see versioned.py's
module docstring for the full rationale).  r9's gap: reads pruned
(``read_where``), but a DELETE/UPDATE probe still planned a scan of
EVERY file.  ``_dml_candidates`` now derives conservative range bounds
from the DML condition (top-level AND conjunctions of ``col <op>
literal``; anything else degrades to the unpruned probe, never a wrong
answer) and the probe plans only the stats-admitted files — on a
clustered 100 TB table a range DELETE probes the predicate's files,
not the snapshot.

Pinned here: the bounds extractor's algebra (atoms, reversed atoms,
strict-op soundness, OR/NOT/BETWEEN/IN disable, unknown atoms
ignored, type-mismatch degrades), the probe's restricted file list on
a range-clustered table (spy on ``_scan_live_pos``), a zero-candidate
fast path that scans NOTHING, and exact result equality with the
unpruned path in every case.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned


def _clustered(spark, tmp_path, n_files=5, rows_per=100):
    """n_files commits with disjoint k ranges → one file per range,
    manifest stats range-disjoint on k."""
    path = str(tmp_path / "tbl")
    for i in range(n_files):
        df = (
            spark.range(i * rows_per, (i + 1) * rows_per)
            .select(
                F.col("id").alias("k"),
                F.concat(F.lit("v"), F.col("id")).alias("v"),
            )
            .coalesce(1)
        )
        versioned.commit(spark, df, path)
    return path


@pytest.fixture()
def probe_spy(monkeypatch):
    """Record the ``files`` argument of every live-scan the DML probe
    plans (None = the whole snapshot)."""
    calls = []
    real = versioned._scan_live_pos

    def spy(spark, man, files=None):
        calls.append(files)
        return real(spark, man, files)

    monkeypatch.setattr(versioned, "_scan_live_pos", spy)
    return calls


# ---------------------------------------------------------------------------
# bounds extractor
# ---------------------------------------------------------------------------


def test_bounds_conjunction_and_reversed_atoms():
    b = versioned._bounds_from_condition(
        "k >= 100 AND k < 300 AND 7 <= g AND v = 'x'"
    )
    assert b == {"k": (100, 300), "g": (7, None), "v": ("x", "x")}


def test_bounds_equality_tightens_both_ends():
    assert versioned._bounds_from_condition("`k` = 42") == {"k": (42, 42)}


def test_bounds_disjunction_disables_pruning():
    assert versioned._bounds_from_condition("k >= 100 OR g = 1") == {}
    assert versioned._bounds_from_condition("NOT (k = 1)") == {}
    assert versioned._bounds_from_condition("k NOT IN (1, 2)") == {}


def test_bounds_between_and_in_bound_since_r12():
    assert versioned._bounds_from_condition("k BETWEEN 1 AND 2") == {
        "k": (1, 2)
    }
    assert versioned._bounds_from_condition("k IN (3, 1, 2)") == {
        "k": (1, 3)
    }
    # IN also yields a membership set the Bloom index can probe
    b, p = versioned._condition_profile("k IN (3, 1, 2) AND v = 'x'")
    assert b == {"k": (1, 3), "v": ("x", "x")}
    assert p == {"k": [3, 1, 2], "v": ["x"]}
    # a mixed-type list is incomparable: points only, no range
    assert versioned._condition_profile("k IN (1, 'a')") == (
        {},
        {"k": [1, "a"]},
    )
    # a subquery body is not a literal list: nothing
    assert versioned._condition_profile("k IN (SELECT x FROM t)") == (
        {},
        {},
    )


def test_bounds_alias_qualifiers_need_vouching():
    # unverified qualifier could be a struct-field access: skipped
    assert versioned._bounds_from_condition("o.k = 5") == {}
    # the caller vouches for the alias (case-insensitive): stripped
    assert versioned._bounds_from_condition("o.k = 5", ("O",)) == {
        "k": (5, 5)
    }
    b, p = versioned._condition_profile(
        "o.k BETWEEN 2 AND 9 AND o.k IN (3, 4)", ("o",)
    )
    assert b == {"k": (3, 4)} and p == {"k": [3, 4]}


def test_bounds_unknown_atoms_contribute_nothing():
    b = versioned._bounds_from_condition("k >= 100 AND length(v) > 2")
    assert b == {"k": (100, None)}
    assert versioned._bounds_from_condition("k % 10 = 3") == {}


def test_bounds_or_inside_string_literal_is_data():
    b = versioned._bounds_from_condition("v = 'a OR b' AND k <= 5")
    assert b == {"v": ("a OR b", "a OR b"), "k": (None, 5)}


# ---------------------------------------------------------------------------
# the pruned probe
# ---------------------------------------------------------------------------


def test_delete_probe_scans_only_admitted_files(spark, tmp_path, probe_spy):
    path = _clustered(spark, tmp_path)
    man = versioned._latest_committed(path)[1]
    assert len(man["files"]) == 5
    v, n = versioned.delete_where(spark, path, "k >= 250 and k < 260")
    assert n == 10
    # the probe's live scan saw ONE candidate file (the 200-299 range),
    # not the snapshot
    probe_files = [c for c in probe_spy if c is not None]
    assert probe_files and all(len(c) == 1 for c in probe_files)
    got = versioned.read(spark, path)
    assert got.count() == 490
    assert got.filter("k >= 250 and k < 260").count() == 0


def test_update_probe_scans_only_admitted_files(spark, tmp_path, probe_spy):
    path = _clustered(spark, tmp_path)
    v, n = versioned.update_where(
        spark, path, "k = 123", {"v": "'hit'"}
    )
    assert n == 1
    probe_files = [c for c in probe_spy if c is not None]
    assert probe_files and all(len(c) == 1 for c in probe_files)
    got = versioned.read(spark, path)
    assert got.filter("v = 'hit'").count() == 1
    assert got.count() == 500


def test_unprunable_condition_probes_everything(spark, tmp_path, probe_spy):
    path = _clustered(spark, tmp_path)
    v, n = versioned.delete_where(spark, path, "k % 100 = 7")
    assert n == 5
    # modulo yields no bounds: the probe saw the whole snapshot
    assert probe_spy and probe_spy[0] is None
    assert versioned.read(spark, path).count() == 495


def test_zero_candidates_scans_nothing(spark, tmp_path, probe_spy):
    path = _clustered(spark, tmp_path)
    v, n = versioned.delete_where(spark, path, "k >= 10000")
    assert n == 0
    # stats proved no file can match: no probe scan was even planned,
    # and the commit is a no-op audit version
    assert probe_spy == []
    raw = versioned._read_manifest(path, v)
    assert raw["data_change"] is False
    assert versioned.read(spark, path).count() == 500


def test_type_mismatch_degrades_to_unpruned(spark, tmp_path, probe_spy):
    path = _clustered(spark, tmp_path)
    # string literal against the long column: stats comparison would be
    # ill-typed — pruning must degrade, the answer must stay right
    v, n = versioned.delete_where(spark, path, "v = 'v7'")
    assert n == 1
    assert versioned.read(spark, path).count() == 499


def test_pruned_equals_unpruned(spark, tmp_path):
    a = _clustered(spark, tmp_path / "a")
    b = _clustered(spark, tmp_path / "b")
    versioned.delete_where(spark, a, "k >= 150 and k <= 420")
    # same delete with pruning disabled
    import unittest.mock as mock

    with mock.patch.object(
        versioned, "_dml_candidates", lambda man, cond, **kw: None
    ):
        versioned.delete_where(spark, b, "k >= 150 and k <= 420")
    ra = sorted(tuple(r) for r in versioned.read(spark, a).collect())
    rb = sorted(tuple(r) for r in versioned.read(spark, b).collect())
    assert ra == rb and len(ra) == 229


def test_or_disjunction_is_an_in_list_since_r12():
    """`k = 5 OR k = 7` is the other spelling of an IN-list: a pure
    SAME-COLUMN equality disjunction yields membership points and a
    range envelope, whole-condition or parenthesized-conjunct; any
    cross-column / non-equality / negated disjunct still disables."""
    assert versioned._condition_profile("k = 5 OR k = 7") == (
        {"k": (5, 7)},
        {"k": [5, 7]},
    )
    assert versioned._condition_profile(
        "p = 'a' OR p IN ('b', 'c')"
    ) == ({"p": ("a", "c")}, {"p": ["a", "b", "c"]})
    b, p = versioned._condition_profile(
        "(k = 5 OR k = 7) AND v >= 2"
    )
    assert b == {"k": (5, 7), "v": (2, None)} and p == {"k": [5, 7]}
    # conjunction narrows the membership set
    assert versioned._condition_profile(
        "(k = 5 OR k = 7) AND k IN (7, 9)"
    ) == ({"k": (7, 7)}, {"k": [7]})
    # wrapped plain atoms contribute their bounds now
    assert versioned._condition_profile("(k >= 5) AND (k <= 9)") == (
        {"k": (5, 9)},
        {},
    )
    # still conservative where the algebra cannot be sound
    assert versioned._condition_profile("k = 5 OR j = 7") == ({}, {})
    assert versioned._condition_profile("k = 5 OR k > 7") == ({}, {})
    assert versioned._condition_profile("k = 5 OR NOT (k = 7)") == (
        {},
        {},
    )
    b, p = versioned._condition_profile("(k = 5 OR v = 7) AND g = 1")
    assert b == {"g": (1, 1)} and p == {"g": [1]}
