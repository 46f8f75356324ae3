"""SQL SELECT file pruning (r11): a single-table ``SELECT ... FROM t
WHERE <cond>`` over a registered table binds the view to the
manifest-stats-PRUNED scan, so the SQL front door skips provably-dead
files like the Python read_where does.  Conservative by construction
— any JOIN/UNION, second FROM (subqueries included), second reference
to the table, or unboundable WHERE falls back to the full-snapshot
binding; the statement's own WHERE always re-evaluates, so answers
are exact either way (pinned against the unpruned run)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.sources import versioned
from integritychecksforvldbs_spark.sources.versioned_sql import (
    register_table,
    versioned_sql,
)


@pytest.fixture()
def stbl(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    versioned.commit(spark, df.repartitionByRange(10, "k"), path)
    register_table("sp11", path)
    yield path
    register_table("sp11", None)


@pytest.fixture()
def prune_spy(monkeypatch):
    calls = []
    real = versioned.read_where

    def spy(spark, path, bounds, version=None, points=None, nulls=None):
        calls.append((bounds, points))
        return real(
            spark, path, bounds, version, points=points, nulls=nulls
        )

    monkeypatch.setattr(versioned, "read_where", spy)
    return calls


@pytest.fixture()
def scan_spy(monkeypatch):
    """Records the exact file set every pruned scan plans."""
    calls = []
    real = versioned._scan_live

    def spy(spark, man, files=None):
        calls.append(sorted(files or []))
        return real(spark, man, files)

    monkeypatch.setattr(versioned, "_scan_live", spy)
    return calls


def test_simple_select_prunes_and_answers_exactly(
    spark, stbl, prune_spy
):
    got = versioned_sql(
        spark, "SELECT k, v FROM sp11 WHERE k >= 950 AND k < 960"
    )
    assert len(prune_spy) == 1 and set(prune_spy[0][0]) == {"k"}
    lo, hi = prune_spy[0][0]["k"]
    assert lo == 950 and hi is not None  # strict < bounds inclusively
    rows = sorted(tuple(r) for r in got.collect())
    assert rows == [(k, k * 3) for k in range(950, 960)]
    # aggregates and tails keep the shape simple enough to prune
    prune_spy.clear()
    got = versioned_sql(
        spark,
        "SELECT COUNT(*) AS n FROM sp11 WHERE k >= 990 "
        "GROUP BY v % 2 ORDER BY n LIMIT 5",
    )
    assert len(prune_spy) == 1
    assert sum(r.n for r in got.collect()) == 10


def test_unsafe_shapes_never_prune(spark, stbl, prune_spy):
    # a subquery's rows dodge the WHERE: second FROM bails
    versioned_sql(
        spark,
        "SELECT * FROM sp11 WHERE k = 5 "
        "AND v IN (SELECT v FROM sp11)",
    )
    # OR disables bounds entirely
    versioned_sql(spark, "SELECT * FROM sp11 WHERE k = 1 OR v = 6")
    # an UNVERIFIED qualifier (not this statement's alias) could be a
    # struct-field access: contributes nothing (Spark then rejects
    # the unresolvable name — but never over a pruned binding)
    with pytest.raises(Exception, match="y"):
        versioned_sql(spark, "SELECT k FROM sp11 x WHERE y.k = 1")
    assert prune_spy == []


def test_alias_qualified_where_prunes(spark, stbl, prune_spy):
    """r12 (VERDICT r11 #1): `FROM t a WHERE a.k = …` — the first
    thing a SQL user writes — prunes via the verified alias."""
    got = versioned_sql(
        spark, "SELECT a.k, a.v FROM sp11 a WHERE a.k = 7"
    )
    assert len(prune_spy) == 1
    bounds, points = prune_spy[0]
    assert bounds == {"k": (7, 7)} and points == {"k": [7]}
    assert [tuple(r) for r in got.collect()] == [(7, 21)]


def test_in_list_where_prunes_exact_file_set(
    spark, stbl, prune_spy, scan_spy
):
    """r12 (VERDICT r11 #1): an IN-list prunes to the files whose
    stats admit any listed literal — the planned file set is
    spy-pinned against an independent stats walk."""
    got = versioned_sql(
        spark,
        "SELECT SUM(v) AS s FROM sp11 WHERE k IN (12, 47)",
    )
    assert len(prune_spy) == 1
    bounds, points = prune_spy[0]
    assert bounds == {"k": (12, 47)} and points == {"k": [12, 47]}
    # the scan must plan exactly the stats-admitted set — on the
    # 10-range layout the [12, 47] envelope lives in the low range
    # file(s), so the planned set is strictly smaller than the table
    man = versioned._resolve_manifest(stbl, None)
    kept, _ = versioned._prune_manifest_files(man, bounds)
    assert scan_spy and scan_spy[-1] == sorted(kept)
    assert 0 < len(kept) < len(man["files"])
    assert got.collect()[0].s == 12 * 3 + 47 * 3


def test_pruned_equals_unpruned(spark, stbl, monkeypatch):
    q = "SELECT SUM(v) AS s FROM sp11 WHERE k >= 123 AND k <= 456"
    got = versioned_sql(spark, q).collect()[0].s
    from integritychecksforvldbs_spark.sources import versioned_sql as vs

    monkeypatch.setattr(
        vs, "_bind_pruned_single_table", lambda *a, **k: None
    )
    want = versioned_sql(spark, q).collect()[0].s
    monkeypatch.undo()
    assert got == want == sum(k * 3 for k in range(123, 457))


def test_like_prefix_prunes(spark, tmp_path, prune_spy, scan_spy):
    """r12: `name LIKE 'prefix%'` implies lexicographic bounds
    [prefix, prefix+1) — on a string-clustered table the SQL front
    door plans only the admitted files; answers pinned unpruned."""
    path = str(tmp_path / "lk")
    df = spark.range(1000).select(
        F.format_string("u%04d", F.col("id")).alias("name"),
        F.col("id").alias("k"),
    )
    versioned.commit(spark, df.repartitionByRange(10, "name"), path)
    register_table("sp12lk", path)
    try:
        got = versioned_sql(
            spark,
            "SELECT COUNT(*) AS n FROM sp12lk "
            "WHERE name LIKE 'u012%'",
        )
        assert len(prune_spy) == 1
        bounds, _points = prune_spy[0]
        assert bounds == {"name": ("u012", "u013")}
        man = versioned._resolve_manifest(path, None)
        kept, _ = versioned._prune_manifest_files(man, bounds)
        assert scan_spy[-1] == sorted(kept)
        assert 0 < len(kept) < len(man["files"])
        assert got.collect()[0].n == 10  # u0120..u0129
        # a wildcard-free LIKE is an equality (Bloom-probeable point)
        b, p = versioned._condition_profile("name LIKE 'u0500'")
        assert b == {"name": ("u0500", "u0500")}
        assert p == {"name": ["u0500"]}
    finally:
        register_table("sp12lk", None)


def test_time_travel_select_prunes_old_version(
    spark, tmp_path, prune_spy, scan_spy
):
    """r12: `FROM t VERSION AS OF n WHERE …` — the substituted
    snapshot view re-binds to the PRUNED scan of that very version
    (previously time travel always planned the full snapshot)."""
    path = str(tmp_path / "tt")
    v1 = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    versioned.commit(spark, v1.repartitionByRange(5, "k"), path)
    versioned.delete_where(spark, path, "k >= 50")  # v2 shrinks
    register_table("sp12tt", path)
    try:
        got = versioned_sql(
            spark,
            "SELECT SUM(v) AS s FROM sp12tt VERSION AS OF 1 "
            "WHERE k >= 90",
        )
        assert len(prune_spy) == 1
        assert prune_spy[0][0] == {"k": (90, None)}
        man1 = versioned._resolve_manifest(path, 1)
        kept, _ = versioned._prune_manifest_files(
            man1, {"k": (90, None)}
        )
        assert scan_spy[-1] == sorted(kept)
        assert 0 < len(kept) < len(man1["files"])
        # v1 still holds the rows v2 deleted — time travel + pruning
        assert got.collect()[0].s == sum(k * 3 for k in range(90, 100))
    finally:
        register_table("sp12tt", None)


def test_inner_join_prunes_both_sides(
    spark, tmp_path, prune_spy, scan_spy
):
    """r12: the fact⋈dim shape — each side of a single INNER JOIN
    binds to the pruned scan of its OWN conjuncts (ON AND WHERE,
    per-side verified aliases); answers pinned against the unpruned
    plan; any OUTER flavor never prunes."""
    fact = str(tmp_path / "fact")
    dim = str(tmp_path / "dim")
    fdf = spark.range(1000).select(
        F.col("id").alias("fk"),
        (F.col("id") % 100).alias("dk"),
        (F.col("id") * 2).alias("amount"),
    )
    ddf = spark.range(100).select(
        F.col("id").alias("dk"), (F.col("id") % 7).alias("grp")
    )
    versioned.commit(spark, fdf.repartitionByRange(10, "fk"), fact)
    versioned.commit(spark, ddf.repartitionByRange(5, "dk"), dim)
    register_table("sp12f", fact)
    register_table("sp12d", dim)
    try:
        q = (
            "SELECT f.fk, f.amount, d.grp FROM sp12f f "
            "JOIN sp12d d ON f.dk = d.dk "
            "WHERE f.fk >= 900 AND d.dk <= 20"
        )
        got = versioned_sql(spark, q)
        # both sides took the pruned binding with their own bounds
        assert len(prune_spy) == 2
        got_bounds = sorted(
            (sorted(b.items()) for b, _p in prune_spy)
        )
        assert got_bounds == sorted(
            [
                sorted({"fk": (900, None)}.items()),
                sorted({"dk": (None, 20)}.items()),
            ]
        )
        # and each planned scan is the stats-admitted strict subset
        manf = versioned._resolve_manifest(fact, None)
        mand = versioned._resolve_manifest(dim, None)
        keptf, _ = versioned._prune_manifest_files(
            manf, {"fk": (900, None)}
        )
        keptd, _ = versioned._prune_manifest_files(
            mand, {"dk": (None, 20)}
        )
        assert sorted(map(sorted, scan_spy)) == sorted(
            map(sorted, [keptf, keptd])
        )
        assert 0 < len(keptf) < len(manf["files"])
        assert 0 < len(keptd) < len(mand["files"])
        rows = sorted(map(tuple, got.collect()))
        want = [
            (k, k * 2, (k % 100) % 7)
            for k in range(900, 1000)
            if k % 100 <= 20
        ]
        assert rows == sorted(want)
        # OUTER flavors never prune
        prune_spy.clear()
        scan_spy.clear()
        versioned_sql(
            spark,
            "SELECT f.fk FROM sp12f f LEFT JOIN sp12d d "
            "ON f.dk = d.dk WHERE f.fk >= 900",
        )
        assert prune_spy == [] and scan_spy == []
        # the ON clause's own literal conjuncts prune too
        got2 = versioned_sql(
            spark,
            "SELECT COUNT(*) AS n FROM sp12f f JOIN sp12d d "
            "ON f.dk = d.dk AND d.dk = 5 WHERE f.amount >= 0",
        )
        assert any(
            p == {"dk": [5]} for _b, p in prune_spy
        )
        assert got2.collect()[0].n == 10
    finally:
        register_table("sp12f", None)
        register_table("sp12d", None)


def test_star_join_prunes_every_side(spark, tmp_path, prune_spy, scan_spy):
    """r13: the fact⋈dim⋈dim star — a left-deep chain of INNER
    joins binds EVERY base table to the pruned scan of its own
    conjuncts (all ONs + WHERE); per-side file sets asserted against
    the manifest; answers pinned against the unpruned plan."""
    fact = str(tmp_path / "sfact")
    d1 = str(tmp_path / "sd1")
    d2 = str(tmp_path / "sd2")
    fdf = spark.range(1000).select(
        F.col("id").alias("fk"),
        (F.col("id") % 50).alias("ck"),
        (F.col("id") % 10).alias("nk"),
        (F.col("id") * 2).alias("amount"),
    )
    cdf = spark.range(50).select(
        F.col("id").alias("ck"), (F.col("id") % 5).alias("seg")
    )
    ndf = spark.range(10).select(
        F.col("id").alias("nk"), F.concat(F.lit("n"), F.col("id")).alias("nm")
    )
    versioned.commit(spark, fdf.repartitionByRange(10, "fk"), fact)
    versioned.commit(spark, cdf.repartitionByRange(5, "ck"), d1)
    versioned.commit(spark, ndf.repartitionByRange(2, "nk"), d2)
    register_table("sp13f", fact)
    register_table("sp13c", d1)
    register_table("sp13n", d2)
    try:
        q = (
            "SELECT f.fk, c.seg, n.nm FROM sp13f f "
            "JOIN sp13c c ON f.ck = c.ck "
            "INNER JOIN sp13n n ON f.nk = n.nk "
            "WHERE f.fk >= 800 AND c.ck <= 20 AND n.nk >= 5 "
            "ORDER BY f.fk"
        )
        got = versioned_sql(spark, q)
        assert len(prune_spy) == 3
        got_bounds = sorted(sorted(b.items()) for b, _p in prune_spy)
        assert got_bounds == sorted(
            [
                sorted({"fk": (800, None)}.items()),
                sorted({"ck": (None, 20)}.items()),
                sorted({"nk": (5, None)}.items()),
            ]
        )
        # every planned scan is its side's stats-admitted subset
        kepts = []
        for path, bounds in [
            (fact, {"fk": (800, None)}),
            (d1, {"ck": (None, 20)}),
            (d2, {"nk": (5, None)}),
        ]:
            man = versioned._resolve_manifest(path, None)
            kept, _ = versioned._prune_manifest_files(man, bounds)
            assert 0 < len(kept) < len(man["files"])
            kepts.append(sorted(kept))
        assert sorted(map(sorted, scan_spy)) == sorted(kepts)
        rows = [tuple(r) for r in got.collect()]
        want = [
            (k, (k % 50) % 5, f"n{k % 10}")
            for k in range(800, 1000)
            if k % 50 <= 20 and k % 10 >= 5
        ]
        assert rows == sorted(want)
    finally:
        register_table("sp13f", None)
        register_table("sp13c", None)
        register_table("sp13n", None)


def test_star_join_guards_bail_conservatively(
    spark, tmp_path, prune_spy
):
    """Any OUTER flavor anywhere in the chain, a comma-list FROM, or
    a repeated table reference keeps the full-snapshot binding (and
    the answer stays exact)."""
    a = str(tmp_path / "ga")
    b = str(tmp_path / "gb")
    c = str(tmp_path / "gc")
    for p, n in [(a, "k"), (b, "k"), (c, "k")]:
        versioned.commit(
            spark,
            spark.range(100).select(F.col("id").alias(n)),
            p,
        )
    register_table("sp13ga", a)
    register_table("sp13gb", b)
    register_table("sp13gc", c)
    try:
        # LEFT at the tail of a 3-chain: NO side prunes
        got = versioned_sql(
            spark,
            "SELECT ga.k FROM sp13ga ga JOIN sp13gb gb ON ga.k = gb.k "
            "LEFT JOIN sp13gc gc ON ga.k = gc.k WHERE ga.k >= 90",
        )
        assert prune_spy == []
        assert got.count() == 10
        # comma-list FROM (implicit cross join): no pruning
        got2 = versioned_sql(
            spark,
            "SELECT ga.k FROM sp13ga ga, sp13gb gb "
            "WHERE ga.k = gb.k AND ga.k >= 95",
        )
        assert prune_spy == []
        assert got2.count() == 5
        # a comma INSIDE a string literal is not a comma-list FROM:
        # the qualified ga-side still binds pruned (gb's profile is
        # empty — every conjunct is ga-qualified or cross-column)
        got3 = versioned_sql(
            spark,
            "SELECT ga.k FROM sp13ga ga JOIN sp13gb gb "
            "ON ga.k = gb.k WHERE ga.k >= 98 AND 'a,b' = 'a,b'",
        )
        assert [b for b, _p in prune_spy] == [{"k": (98, None)}]
        assert got3.count() == 2
    finally:
        register_table("sp13ga", None)
        register_table("sp13gb", None)
        register_table("sp13gc", None)


def test_subquery_in_prunes_fact_scan(spark, tmp_path, prune_spy, scan_spy):
    """r13: ``WHERE dk IN (SELECT …)`` over a small dim evaluates the
    subquery at bind time and folds its exact keys into the fact
    profile — on an identity-partitioned fact the scan plans exactly
    the listed keys' partitions; answer pinned against the unpruned
    plan."""
    fact = str(tmp_path / "sqf")
    dim = str(tmp_path / "sqd")
    fdf = spark.range(1000).select(
        F.col("id").alias("fk"),
        (F.col("id") % 10).alias("dk"),
        (F.col("id") * 2).alias("amount"),
    )
    ddf = spark.range(10).select(
        F.col("id").alias("dk"), (F.col("id") % 3).alias("grp")
    )
    versioned.commit(spark, fdf, fact, partition_by=["dk"])
    versioned.commit(spark, ddf, dim)
    register_table("sq13f", fact)
    register_table("sq13d", dim)
    try:
        q = (
            "SELECT SUM(amount) AS s FROM sq13f "
            "WHERE dk IN (SELECT dk FROM sq13d WHERE grp = 0)"
        )
        got = versioned_sql(spark, q)
        # the outer bind carried the dim's exact keys as membership
        # points plus their min/max envelope
        keys = sorted(k for k in range(10) if k % 3 == 0)
        assert any(
            sorted(p.get("dk", [])) == keys for _b, p in prune_spy
        )
        # the planned fact scan is exactly the listed keys' partitions
        man = versioned._resolve_manifest(fact, None)
        kept, _ = versioned._prune_manifest_files(
            man, {"dk": (min(keys), max(keys))}, {"dk": keys}
        )
        assert sorted(kept) in [sorted(c) for c in scan_spy]
        assert 0 < len(kept) < len(man["files"])
        want = sum(k * 2 for k in range(1000) if (k % 10) % 3 == 0)
        assert got.collect()[0].s == want
        # AND-merge: a residual conjunct tightens the same profile
        prune_spy.clear()
        got2 = versioned_sql(
            spark,
            "SELECT COUNT(*) AS n FROM sq13f "
            "WHERE dk IN (SELECT dk FROM sq13d WHERE grp = 0) "
            "AND fk >= 500",
        )
        assert any(
            b.get("fk") == (500, None) and sorted(p.get("dk", [])) == keys
            for b, p in prune_spy
        )
        assert got2.collect()[0].n == sum(
            1 for k in range(500, 1000) if (k % 10) % 3 == 0
        )
    finally:
        register_table("sq13f", None)
        register_table("sq13d", None)


def test_subquery_in_big_dim_binds_unpruned(
    spark, tmp_path, prune_spy, monkeypatch
):
    """A subquery table over the probe-size gate never evaluates at
    bind time — the statement binds full-snapshot (exact answer, no
    double evaluation)."""
    from integritychecksforvldbs_spark.sources import versioned_sql as vs

    fact = str(tmp_path / "bqf")
    dim = str(tmp_path / "bqd")
    versioned.commit(
        spark,
        spark.range(200).select(
            F.col("id").alias("fk"), (F.col("id") % 10).alias("dk")
        ),
        fact,
    )
    versioned.commit(
        spark,
        spark.range(10).select(F.col("id").alias("dk")),
        dim,
    )
    monkeypatch.setattr(vs, "_SUBQ_PROBE_MAX_ROWS", 5)
    probe_reads = []
    real_rsw = versioned.read_sql_where
    monkeypatch.setattr(
        versioned,
        "read_sql_where",
        lambda *a, **k: probe_reads.append(a) or real_rsw(*a, **k),
    )
    register_table("bq13f", fact)
    register_table("bq13d", dim)
    try:
        got = versioned_sql(
            spark,
            "SELECT COUNT(*) AS n FROM bq13f "
            "WHERE dk IN (SELECT dk FROM bq13d WHERE dk >= 8)",
        )
        assert prune_spy == [] and probe_reads == []
        assert got.collect()[0].n == 40
        # NOT IN never prunes either
        got2 = versioned_sql(
            spark,
            "SELECT COUNT(*) AS n FROM bq13f "
            "WHERE dk NOT IN (SELECT dk FROM bq13d WHERE dk >= 8)",
        )
        assert prune_spy == []
        assert got2.collect()[0].n == 160
    finally:
        register_table("bq13f", None)
        register_table("bq13d", None)


def test_cte_bodies_prune_independently(
    spark, tmp_path, prune_spy, scan_spy
):
    """r13: each WITH body is the single-table shape scoped to the
    BODY — a two-CTE statement binds both bodies' tables to their own
    pruned scans (file sets asserted); answers pinned unpruned."""
    t1 = str(tmp_path / "c1")
    t2 = str(tmp_path / "c2")
    versioned.commit(
        spark,
        spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        ).repartitionByRange(10, "k"),
        t1,
    )
    versioned.commit(
        spark,
        spark.range(500).select(
            F.col("id").alias("j"), (F.col("id") % 7).alias("w")
        ).repartitionByRange(5, "j"),
        t2,
    )
    register_table("ct13a", t1)
    register_table("ct13b", t2)
    try:
        q = (
            "WITH hot AS (SELECT k, v FROM ct13a WHERE k >= 900), "
            "cold AS (SELECT j, w FROM ct13b b WHERE b.j < 100) "
            "SELECT (SELECT COUNT(*) FROM hot) AS nh, "
            "(SELECT COUNT(*) FROM cold) AS nc"
        )
        got = versioned_sql(spark, q)
        assert len(prune_spy) == 2
        got_bounds = sorted(sorted(b.items()) for b, _p in prune_spy)
        assert got_bounds == sorted(
            [
                sorted({"k": (900, None)}.items()),
                sorted({"j": (None, 100)}.items()),
            ]
        )
        kepts = []
        for path, bounds in [
            (t1, {"k": (900, None)}),
            (t2, {"j": (None, 100)}),
        ]:
            man = versioned._resolve_manifest(path, None)
            kept, _ = versioned._prune_manifest_files(man, bounds)
            assert 0 < len(kept) < len(man["files"])
            kepts.append(sorted(kept))
        assert sorted(map(sorted, scan_spy)) == sorted(kepts)
        row = got.collect()[0]
        assert (row.nh, row.nc) == (100, 100)
        # a table referenced BOTH in a body and the main query never
        # binds narrowed (the second consumer would see pruned rows)
        prune_spy.clear()
        got2 = versioned_sql(
            spark,
            "WITH hot AS (SELECT k FROM ct13a WHERE k >= 990) "
            "SELECT (SELECT COUNT(*) FROM hot) AS nh, "
            "(SELECT COUNT(*) FROM ct13a) AS nall",
        )
        assert prune_spy == []
        row2 = got2.collect()[0]
        assert (row2.nh, row2.nall) == (10, 1000)
    finally:
        register_table("ct13a", None)
        register_table("ct13b", None)
