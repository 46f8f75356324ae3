"""Fuzzy (edit-distance) duplicate pairs: q-gram count filtering +
levenshtein verify, exactness pinned against brute force and DuckDB."""

from __future__ import annotations

import itertools

import pytest

from integritychecksforvldbs_spark.operators import dedup

ROWS = [
    (1, "The Quick Brown Fox"),
    (2, "the quick brown fox"),   # ed 0 after normalization
    (3, "the quick brown fox"),  # ed 1 (doubled space collapses? no - raw)
    (4, "the quick brn fox"),
    (5, "completely different"),
    (6, "ab"),
    (7, "ac"),
    (8, "xyz"),
    (9, ""),
    (10, "a"),
]


def _lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    D = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        D[i][0] = i
    for j in range(lb + 1):
        D[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            D[i][j] = min(
                D[i - 1][j] + 1,
                D[i][j - 1] + 1,
                D[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return D[la][lb]


def _truth(rows, d):
    norm = {i: t.lower().strip() for i, t in rows}
    return sorted(
        (a, b, _lev(norm[a], norm[b]))
        for a, b in itertools.combinations(sorted(norm), 2)
        if _lev(norm[a], norm[b]) <= d
    )


@pytest.mark.parametrize("d", [1, 2])
def test_fuzzy_pairs_match_bruteforce(spark, d):
    df = spark.createDataFrame(ROWS, "doc_id bigint, title string")
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in dedup.fuzzy_dup_pairs(df, max_dist=d).collect()
    )
    assert got == _truth(ROWS, d)


def test_fuzzy_pairs_property(spark):
    """Random short strings over a tiny alphabet (dense near-dup
    structure): the blocked join must equal brute force exactly."""
    import random

    rng = random.Random(5)
    rows = [
        (
            i,
            "".join(rng.choice("abc ") for _ in range(rng.randint(0, 14))),
        )
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, title string")
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in dedup.fuzzy_dup_pairs(df, max_dist=1).collect()
    )
    assert got == _truth(rows, 1)


def test_fuzzy_pairs_matches_duckdb(spark, duck):
    import pandas as pd

    df = spark.createDataFrame(ROWS, "doc_id bigint, title string")
    duck.register("fuzzy_t", pd.DataFrame(ROWS, columns=["doc_id", "title"]))
    a = sorted(
        tuple(r) for r in dedup.fuzzy_dup_pairs(df, max_dist=1).collect()
    )
    b = sorted(duck.execute(dedup.fuzzy_dup_oracle("fuzzy_t")).fetchall())
    assert a == b


def test_fuzzy_deletion_path_equals_qgram_path(spark):
    """d=1 dispatches to the deletion-neighborhood candidates; the
    q-gram blocked path (still the d>1 engine) must produce the exact
    same verified pair set on the same input."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(11)
    rows = [
        (
            i,
            "".join(rng.choice("abcd ") for _ in range(rng.randint(0, 18))),
        )
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, title string")
    fast = sorted(
        tuple(r) for r in dedup.fuzzy_dup_pairs(df, max_dist=1).collect()
    )
    s_norm = F.lower(F.trim(F.col("title")))
    base = df.select(
        F.col("doc_id").alias("id"), s_norm.alias("s"), F.length(s_norm).alias("l")
    )
    assert fast == sorted(
        tuple(r) for r in dedup._fuzzy_pairs_deletion1(base).collect()
    )
    # cross-check against the q-gram engine by asking for d=2 and
    # post-filtering to d<=1: supersets must agree on the d=1 slice
    qgram_d2 = dedup.fuzzy_dup_pairs(df, max_dist=2).filter(F.col("dist") <= 1)
    assert fast == sorted(tuple(r) for r in qgram_d2.collect())
