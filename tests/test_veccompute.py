"""Bit-equality pins for functions/veccompute.py: the vectorized
kernels must reproduce the interpreted expression forms EXACTLY —
values bitwise equal, NULLs where the expressions yield NULL."""

import random

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.functions.veccompute import (
    argmax_cell,
    pair_dot,
    self_dot,
    srp_bucket_array,
)
from integritychecksforvldbs_spark.operators.dedup import (
    _dot_expr,
    _norm_expr,
)
from integritychecksforvldbs_spark.operators.similarity import (
    _bucket_expr,
    _cell_expr,
    srp_planes,
)


def _rand_rows(n, dim, seed, with_edges=True):
    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-2, 2) for _ in range(dim)],
         [rng.uniform(-2, 2) for _ in range(dim)])
        for i in range(n)
    ]
    if with_edges:
        rows += [
            (n + 1, None, [1.0] * dim),                    # NULL array
            (n + 2, [1.0] * (dim + 1), [1.0] * dim),       # ragged pair
            (n + 3, [float("nan")] + [1.0] * (dim - 1), [1.0] * dim),  # NaN
            (n + 4, [0.0] * dim, [1.0] * dim),             # zero vector
        ]
    return rows


@pytest.mark.parametrize("eltype", ["float", "double"])
def test_pair_dot_bit_equal(spark, eltype):
    df = spark.createDataFrame(
        _rand_rows(400, 19, seed=7),
        f"id long, a array<{eltype}>, b array<{eltype}>",
    )
    out = df.select(
        "id",
        _dot_expr("a", "b").alias("e"),
        pair_dot("a", "b").alias("k"),
    ).collect()
    import math

    for r in out:
        if r["e"] is None:
            assert r["k"] is None, r
        elif math.isnan(r["e"]):
            assert math.isnan(r["k"]), r
        else:
            assert r["e"] == r["k"], r  # bitwise via exact float equality


def test_self_dot_matches_norm_fold(spark):
    df = spark.createDataFrame(
        [(i, v) for i, v, _ in _rand_rows(300, 33, seed=11)],
        "id long, a array<float>",
    )
    out = df.select(
        _norm_expr("a").alias("e"), self_dot("a").alias("k")
    ).collect()
    import math

    for r in out:
        if r["e"] is None:
            assert r["k"] is None
        elif math.isnan(r["e"]):
            assert math.isnan(r["k"])
        else:
            assert r["e"] == r["k"]


def test_srp_buckets_bit_equal(spark):
    dim, n_bits, n_tables = 16, 8, 4
    tables = [srp_planes(dim, n_bits, seed=42 + t) for t in range(n_tables)]
    df = spark.createDataFrame(
        [(i, v) for i, v, _ in _rand_rows(300, dim, seed=13)],
        "id long, a array<float>",
    )
    expr_cols = [_bucket_expr("a", p).alias(f"e{t}") for t, p in enumerate(tables)]
    out = df.select(
        srp_bucket_array("a", tables).alias("k"), *expr_cols
    ).collect()
    for r in out:
        assert list(r["k"]) == [r[f"e{t}"] for t in range(n_tables)], r


def test_argmax_cell_bit_equal_and_ties(spark):
    dim, k = 12, 6
    rng = random.Random(3)
    centroids = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(k)]
    rows = [(i, v) for i, v, _ in _rand_rows(300, dim, seed=17)]
    # tie row: zero vector dots every centroid at exactly 0.0 — the
    # expression picks the FIRST position, argmax must too
    rows.append((9001, [0.0] * dim))
    df = spark.createDataFrame(rows, "id long, a array<float>")
    out = df.select(
        "id",
        _cell_expr("a", centroids).alias("e"),
        argmax_cell("a", centroids).alias("k"),
    ).collect()
    for r in out:
        assert r["e"] == r["k"], r


def test_pq_codes_bit_equal(spark):
    """Kernel PQ codes == the expression path (__nv normalization +
    _pq_code_expr) including NULL vectors and first-position ties."""
    from integritychecksforvldbs_spark.functions.veccompute import pq_codes
    from integritychecksforvldbs_spark.operators.similarity import (
        _pq_code_expr,
        pq_train,
    )

    dim, m = 16, 4
    rng = random.Random(23)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(256)
    ]
    rows.append((9001, None))
    rows.append((9002, [0.0] * dim))  # zero vector: norm floor + ties
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = pq_train(df, m=m, k=8, sample=128)
    norm = (
        "sqrt(aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), "
        "CAST(embedding AS ARRAY<DOUBLE>), (x, y) -> x * y), 0D, "
        "(acc, x) -> acc + x))"
    )
    ref = (
        df.withColumn(
            "__nv",
            F.expr(
                "transform(CAST(embedding AS ARRAY<DOUBLE>), "
                f"x -> x / greatest({norm}, 1e-12d))"
            ),
        )
        .select("vec_id", _pq_code_expr("__nv", books).alias("e"))
    )
    got = df.select("vec_id", pq_codes("embedding", books).alias("k"))
    e = {r["vec_id"]: r["e"] for r in ref.collect()}
    g = {r["vec_id"]: r["k"] for r in got.collect()}
    assert e.keys() == g.keys()
    for vid in e:
        assert list(e[vid] or []) == [
            x for x in (g[vid] or [])
        ] or e[vid] == g[vid], (vid, e[vid], g[vid])
